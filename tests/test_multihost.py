"""Real multi-PROCESS smoke tests (SURVEY.md §2.10): two CPU processes of 4
virtual devices each form one 8-device users mesh via
``jax.distributed.initialize`` + gloo CPU collectives.  All three wire paths
— packed-PS, chain ring, segmented ring (VERDICT r4 item 7) — run across the
process boundary; both processes must agree on the loss, which must also
match a SINGLE-process mesh run of the identical config on this test
process's own 8-virtual-device mesh."""

import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CHILD = os.path.join(REPO, "tests", "multihost_child.py")

# mode -> GQConfig extras; MUST mirror multihost_child.child_config (that
# module cannot be imported here: it calls jax.distributed.initialize at
# import time)
MODES = {
    "ps_packed": dict(mode="ps", wire="packed"),
    "ring_chain": dict(mode="ring", ring_mode="chain"),
    "ring_seg": dict(mode="ring", ring_mode="segmented"),
}


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _single_process_losses(mode: str, n_steps: int = 2):
    """The same config on this process's 8-virtual-device mesh."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gqx.config import GQConfig
    from gqx.data import Pipeline
    from gqx.models import create_model
    from gqx.parallel.collectives import make_mesh_train_step
    from gqx.train import create_train_state

    cfg = GQConfig(
        network="fcn", dataset="synthetic", quantizer="qsgd",
        c_dim=128, n_bit=4, random=False, num_users=8, batch_size=8,
        test_batch_size=64, seed=5, backend="mesh", **MODES[mode],
    )
    pipeline = Pipeline(cfg)
    model = create_model(cfg.network, cfg.num_classes)
    sample = jnp.zeros((cfg.batch_size,) + pipeline.image_shape, jnp.float32)
    state, plan, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    step_fn, state = make_mesh_train_step(cfg, model, plan, tx, state)
    losses = []
    it = pipeline.train_epoch(1)
    for i in range(n_steps):
        x, y = next(it)
        state, loss = step_fn(
            state, jnp.asarray(np.asarray(x)), jnp.asarray(np.asarray(y)),
            jnp.float32(1.0), jnp.float32(0.05), jnp.float32(5e-4),
            jax.random.PRNGKey(100 + i),
        )
        losses.append(float(loss))
    return losses


@pytest.mark.parametrize("mode", sorted(MODES))
def test_two_process_mesh_training(mode):
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, CHILD, coord, "2", str(i), mode],
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
    # ... and the cross-process run reproduces the single-process mesh
    # (gloo collectives vs in-process self-copies: same math, fp reduction
    # order may differ slightly)
    single = _single_process_losses(mode)
    assert losses[0] == pytest.approx(single, rel=1e-5)
