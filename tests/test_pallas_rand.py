"""On-chip PRNG uniforms (gqx.ops.pallas_rand).

The kernel uses the TPU hardware PRNG (`pltpu.prng_seed` has no CPU or
interpret-mode lowering), so these tests only run on a TPU backend — under
the CPU-forced test conftest they skip.  The statistical/determinism
validation also ran on the real chip via scripts (PERF.md round 4):
mean 0.50002, var 0.08330, deterministic per key, key-sensitive.
"""

import jax
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="TPU hardware PRNG only"
)


def test_uniform_stats_and_determinism():
    from gqx.ops.pallas_rand import pallas_uniform

    key = jax.random.PRNGKey(3)
    r = np.asarray(pallas_uniform(key, (1024, 513)))
    assert r.shape == (1024, 513)
    assert (r >= 0).all() and (r < 1).all()
    assert abs(r.mean() - 0.5) < 5e-3
    assert abs(r.var() - 1.0 / 12) < 5e-3
    r2 = np.asarray(pallas_uniform(key, (1024, 513)))
    np.testing.assert_array_equal(r, r2)
    r3 = np.asarray(pallas_uniform(jax.random.PRNGKey(4), (1024, 513)))
    assert not np.array_equal(r, r3)
