"""Child process for tests/test_multihost.py: one of two CPU processes
running the mesh training step over a cross-process users axis.

Usage: python tests/multihost_child.py <coordinator> <num_procs> <proc_id> [mode]
``mode``: ps_packed (default) | ring_chain | ring_seg — the three wire paths
(VERDICT r4 item 7 extended the original packed-PS-only test to the rings).
Prints "LOSSES <json list>" on success.
"""

import json
import os
import sys

# jax may be PRELOADED at interpreter start in this environment, so env vars
# are too late for platform selection — jax.config.update works as long as no
# backend has initialized yet (same pattern as tests/conftest.py).
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

coordinator, num_procs, proc_id = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
mode = sys.argv[4] if len(sys.argv) > 4 else "ps_packed"
jax.config.update("jax_cpu_collectives_implementation", "gloo")
jax.distributed.initialize(
    coordinator_address=coordinator, num_processes=num_procs, process_id=proc_id
)
assert jax.process_count() == num_procs
assert len(jax.devices()) == 4 * num_procs, jax.devices()

import jax.numpy as jnp
import numpy as np

from gqx.config import GQConfig
from gqx.data import Pipeline
from gqx.models import create_model
from gqx.parallel.collectives import make_mesh_train_step
from gqx.parallel.distributed import global_user_batch
from gqx.train import create_train_state


def child_config(mode: str) -> GQConfig:
    """The exact config the parent test replays single-process for the
    cross-check (tests/test_multihost.py)."""
    extra = {
        "ps_packed": dict(mode="ps", wire="packed"),
        "ring_chain": dict(mode="ring", ring_mode="chain"),
        "ring_seg": dict(mode="ring", ring_mode="segmented"),
    }[mode]
    return GQConfig(
        network="fcn", dataset="synthetic", quantizer="qsgd",
        c_dim=128, n_bit=4, random=False, num_users=8, batch_size=8,
        test_batch_size=64, seed=5, backend="mesh", **extra,
    )


def run_steps(n_steps: int = 2):
    cfg = child_config(mode)
    pipeline = Pipeline(cfg)
    model = create_model(cfg.network, cfg.num_classes)
    sample = jnp.zeros((cfg.batch_size,) + pipeline.image_shape, jnp.float32)
    state, plan, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    step_fn, state = make_mesh_train_step(cfg, model, plan, tx, state)
    mesh = step_fn.mesh
    assert mesh.devices.size == 8, mesh

    losses = []
    it = pipeline.train_epoch(1)
    for i in range(n_steps):
        x, y = next(it)
        state, loss = step_fn(
            state,
            global_user_batch(mesh, np.asarray(x)),
            global_user_batch(mesh, np.asarray(y)),
            jnp.float32(1.0), jnp.float32(0.05), jnp.float32(5e-4),
            jax.random.PRNGKey(100 + i),
        )
        losses.append(float(loss))
    return losses


print("LOSSES", json.dumps(run_steps()), flush=True)
