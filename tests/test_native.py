"""Native (C++) pipeline tests: bit-pack parity with the JAX packer, fused
augmentation distribution/shape, normalize parity with numpy."""

import numpy as np
import pytest

from gqx.data import native
from gqx.data.transforms import normalize

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib unavailable")


def test_native_pack_matches_jax(rng):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from gqx.ops.pack import pack_bits as jax_pack, unpack_bits as jax_unpack

    for bits in (1, 2, 4, 6, 8, 16):
        vals = rng.integers(0, 2 ** bits, size=777).astype(np.uint32)
        got = native.pack_bits(vals, bits)
        want = np.asarray(jax_pack(vals, bits))
        np.testing.assert_array_equal(got, want)
        back = native.unpack_bits(got, bits, len(vals))
        np.testing.assert_array_equal(back, vals)


def test_native_normalize_matches_numpy(rng):
    x = rng.integers(0, 256, size=(8, 32, 32, 3)).astype(np.uint8)
    got = native.normalize_batch(x, "cifar10")
    want = normalize(x, "cifar10")
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_native_augment_shape_and_range(rng):
    x = rng.integers(0, 256, size=(16, 32, 32, 3)).astype(np.uint8)
    out = native.augment_batch(x, "cifar10", rng)
    assert out.shape == (16, 32, 32, 3) and out.dtype == np.float32
    # normalized range sanity: (0..1 - mean)/std
    assert out.min() >= -3.0 and out.max() <= 3.5
    # no-augment dataset: must equal plain normalize exactly
    out2 = native.augment_batch(x, "synthetic", rng)
    np.testing.assert_allclose(out2, normalize(x, "synthetic"), rtol=1e-5, atol=1e-6)
