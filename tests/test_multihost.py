"""Real multi-PROCESS smoke test (SURVEY.md §2.10): two CPU processes of 4
virtual devices each form one 8-device users mesh via
``jax.distributed.initialize`` + gloo CPU collectives; the packed-wire PS
training step runs across the process boundary and both processes agree on
the loss — which must also match the single-process mesh run of the same
config (tests/test_mesh.py uses the identical cfg seed/size)."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "multihost_child.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_mesh_training():
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, coord, "2", str(i)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multihost child timed out")
        assert p.returncode == 0, f"child failed:\n{err[-3000:]}"
        outs.append(out)
    losses = []
    for out in outs:
        line = [l for l in out.splitlines() if l.startswith("LOSSES ")][-1]
        losses.append(json.loads(line[len("LOSSES "):]))
    # both processes compute the same global step -> identical losses
    assert losses[0] == pytest.approx(losses[1], rel=1e-6)
    assert all(l == l and l < 1e6 for l in losses[0])  # finite
