"""On-chip parity: mesh_packed (transposed wire) vs mesh_logical, world=1.

ef=False + 1 step: both paths are compress_batch -> decode_mean with the
same keys and kernels; the packed path adds only the bit-exact wire
roundtrip -> params must be bit-identical.
ef=True + 3 steps: logical computes the server mean as
mean(decompress_batch(.)) (per-user decode) while packed fuses decode_mean
-> float reassociation only; assert tight allclose."""
import sys
sys.path.insert(0, "/root/repo")
import jax, jax.numpy as jnp, numpy as np
from gqx.config import GQConfig
from gqx.data import Pipeline
from gqx.models import create_model
from gqx.parallel.collectives import make_mesh_train_step
from gqx.train import create_train_state
from gqx.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

def run(wire, ef, steps):
    cfg = GQConfig(network="resnet18", dataset="synthetic", num_users=8,
                   batch_size=4, seed=1, quantizer="hsq", c_dim=16, k_bit=8,
                   n_bit=6, compute_dtype="bfloat16", use_pallas=True,
                   backend="mesh", wire=wire, ef=ef)
    pipeline = Pipeline(cfg)
    model = create_model(cfg.network, cfg.num_classes, False,
                         dtype=cfg.compute_dtype)
    sample = jnp.zeros((cfg.batch_size,) + pipeline.image_shape, jnp.float32)
    state, plan, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    step, state = make_mesh_train_step(cfg, model, plan, tx, state)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((8, 4) + pipeline.image_shape), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, (8, 4)), jnp.int32)
    for i in range(steps):
        state, loss = step(state, x, y, jnp.float32(1.0), jnp.float32(0.05),
                           jnp.float32(5e-4), jax.random.PRNGKey(7 + i))
    return float(loss), [np.asarray(l) for l in jax.tree.leaves(state.params)]

l0, p0 = run("logical", False, 1)
l1, p1 = run("packed", False, 1)
assert l0 == l1, (l0, l1)
for a, b in zip(p0, p1):
    np.testing.assert_array_equal(a, b)
print(f"ef=False 1-step: {len(p0)} param leaves BIT-IDENTICAL, loss {l0}")

l0, p0 = run("logical", True, 3)
l1, p1 = run("packed", True, 3)
for a, b in zip(p0, p1):
    np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-3)
print(f"ef=True 3-step: tight-allclose OK (reassociated server mean), "
      f"loss {l0:.5f} vs {l1:.5f}")
