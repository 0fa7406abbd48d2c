"""Pallas kernel tests (interpret mode on CPU; the same kernels compile for
TPU — exercised by bench.py and the driver's compile check)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gqx.ops.pallas_hsq import hsq_decode, hsq_decode_xla, hsq_encode


def test_hsq_encode_matches_xla(rng):
    m, dim, k = 300, 16, 64  # deliberately not a tile multiple
    rows = jnp.asarray(rng.standard_normal((m, dim)), jnp.float32)
    cb = rng.standard_normal((k, dim)).astype(np.float32)
    cb /= np.linalg.norm(cb, axis=1, keepdims=True)
    cb = jnp.asarray(cb)

    u, codes = hsq_encode(rows, cb, tile_m=128, interpret=True)

    p = np.asarray(rows) @ np.asarray(cb).T
    want_codes = np.argmax(np.abs(p), axis=1)
    got_codes = np.asarray(codes)
    # accept fp near-ties: chosen |p| must equal the max |p|
    np.testing.assert_allclose(
        np.abs(p[np.arange(m), got_codes]), np.max(np.abs(p), axis=1), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(u), p[np.arange(m), got_codes], rtol=1e-5, atol=1e-6)
    # decode roundtrip against direct gather, for both decode paths
    manual = np.asarray(cb)[got_codes] * np.asarray(u)[:, None]
    dec = np.asarray(hsq_decode_xla(codes, u, cb))
    np.testing.assert_allclose(dec, manual, rtol=1e-5, atol=1e-6)
    dec_pl = np.asarray(hsq_decode(codes, u, cb, tile_m=128, interpret=True))
    np.testing.assert_allclose(dec_pl, manual, rtol=1e-5, atol=1e-6)


def test_hsq_encode_vmap(rng):
    # vmap over a users axis must batch the kernel
    rows = jnp.asarray(rng.standard_normal((4, 256, 16)), jnp.float32)
    cb = rng.standard_normal((32, 16)).astype(np.float32)
    cb /= np.linalg.norm(cb, axis=1, keepdims=True)
    cb = jnp.asarray(cb)
    u, codes = jax.vmap(lambda r: hsq_encode(r, cb, tile_m=128, interpret=True))(rows)
    assert u.shape == (4, 256) and codes.shape == (4, 256)
    for i in range(4):
        ui, ci = hsq_encode(rows[i], cb, tile_m=128, interpret=True)
        np.testing.assert_allclose(np.asarray(u[i]), np.asarray(ui), rtol=1e-6)
        np.testing.assert_array_equal(np.asarray(codes[i]), np.asarray(ci))
