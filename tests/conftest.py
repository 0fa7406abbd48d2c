"""Test configuration: force an 8-virtual-device CPU platform so mesh /
shard_map tests exercise real multi-device code paths (SURVEY.md §4's
simulated-vs-real parity strategy).

NOTE: in this environment jax may already be imported at interpreter start,
so env vars alone are too late — use jax.config.update, which works as long
as no backend has been initialized yet.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Keep codebook training cheap in tests (generation parity is tested explicitly
# with small sizes; canonical-size codebooks are cached in the repo).
os.environ.setdefault("GQX_CODEBOOK_TRAIN_SIZE", "20000")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
