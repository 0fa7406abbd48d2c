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


# ---------------------------------------------------------------------------
# shared flat-layout operand prep (gqx.ops.pallas_hsq2 helpers)
# ---------------------------------------------------------------------------

def _flat_refs(rng, dim, k, size):
    from gqx.ops.pallas_hsq2 import (
        bf16_exact_codebook, expand_codebook, split_hi_lo,
    )

    cb = rng.standard_normal((k, dim)).astype(np.float32)
    cb /= np.linalg.norm(cb, axis=1, keepdims=True)
    cb = bf16_exact_codebook(cb)
    eh, el = map(jnp.asarray, split_hi_lo(expand_codebook(cb)))
    flat = jnp.asarray(rng.standard_normal(size), jnp.float32)
    return cb, eh, el, flat


# ---------------------------------------------------------------------------
# v3 users-in-block transposed-signature kernels (gqx.ops.pallas_hsq3)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dim,k,size", [(16, 256, 16 * 403), (32, 64, 32 * 77), (8, 32, 8 * 513)])
def test_hsq3_encode_decode_match_reference_math(rng, dim, k, size):
    from gqx.ops.pallas_hsq3 import hsq_decode_flat, hsq_encode_flat

    cb, eh, el, flat = _flat_refs(rng, dim, k, size)
    u, codes = hsq_encode_flat(flat, eh, el, dim, tile_s=8, passes=2, interpret=True)

    rows = np.asarray(flat).reshape(-1, dim)
    p = rows @ cb.T
    want_codes = np.argmax(np.abs(p), axis=1)
    np.testing.assert_array_equal(np.asarray(codes), want_codes)
    want_u = np.take_along_axis(p, want_codes[:, None], axis=1)[:, 0]
    np.testing.assert_allclose(np.asarray(u), want_u, rtol=3e-5, atol=3e-5)

    dec = hsq_decode_flat(codes, u, eh, el, dim, tile_s=8, passes=2, interpret=True)
    manual = cb[want_codes] * np.asarray(u)[:, None]
    np.testing.assert_allclose(
        np.asarray(dec).reshape(-1, dim), manual, rtol=3e-5, atol=3e-5
    )


def test_hsq3_batched_matches_per_user(rng):
    """Batched (users-in-block) encode/decode/decode_mean == per-user runs."""
    from gqx.ops.pallas_hsq3 import (
        hsq_decode_flat, hsq_decode_mean, hsq_encode_flat,
    )

    dim, k, size, users = 16, 64, 16 * 200, 4
    cb, eh, el, _ = _flat_refs(rng, dim, k, size)
    flats = jnp.asarray(rng.standard_normal((users, size)), jnp.float32)
    u_b, codes_b = hsq_encode_flat(flats, eh, el, dim, tile_s=8, passes=2,
                                   interpret=True)
    for uu in range(users):
        u1, c1 = hsq_encode_flat(flats[uu], eh, el, dim, tile_s=8, passes=2,
                                 interpret=True)
        np.testing.assert_array_equal(np.asarray(codes_b[uu]), np.asarray(c1))
        np.testing.assert_allclose(np.asarray(u_b[uu]), np.asarray(u1),
                                   rtol=1e-6)

    dec_b = hsq_decode_flat(codes_b, u_b, eh, el, dim, tile_s=8, passes=2,
                            interpret=True)
    want = np.stack([
        (cb[np.asarray(codes_b[uu])] * np.asarray(u_b[uu])[:, None]).reshape(-1)
        for uu in range(users)
    ])
    np.testing.assert_allclose(np.asarray(dec_b), want, rtol=1e-4, atol=1e-5)

    got = hsq_decode_mean(codes_b, u_b, eh, el, dim, tile_s=8, passes=2,
                          interpret=True)
    np.testing.assert_allclose(np.asarray(got), want.mean(axis=0),
                               rtol=1e-4, atol=1e-5)


def test_hsq3_zero_rows_decode_to_zero(rng):
    from gqx.ops.pallas_hsq3 import hsq_decode_flat, hsq_encode_flat

    dim, k = 16, 64
    cb, eh, el, flat = _flat_refs(rng, dim, k, 16 * 32)
    flat = flat.at[: 16 * 5].set(0.0)
    u, codes = hsq_encode_flat(flat, eh, el, dim, tile_s=8, passes=2, interpret=True)
    assert np.all(np.asarray(u)[:5] == 0.0)
    dec = hsq_decode_flat(codes, u, eh, el, dim, tile_s=8, passes=2, interpret=True)
    assert np.all(np.asarray(dec)[: 16 * 5] == 0.0)


# ---------------------------------------------------------------------------
# v4 vectorized-selection kernels (gqx.ops.pallas_hsq4): bit-identical to v3
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("dim,k,size", [(16, 256, 16 * 403), (32, 64, 32 * 77), (8, 32, 8 * 513)])
def test_hsq4_bit_identical_to_v3(rng, dim, k, size):
    from gqx.ops import pallas_hsq3 as v3
    from gqx.ops import pallas_hsq4 as v4

    cb, eh, el, _ = _flat_refs(rng, dim, k, size)
    users = 3
    flats = jnp.asarray(rng.standard_normal((users, size)), jnp.float32)

    u3, c3 = v3.hsq_encode_flat(flats, eh, el, dim, tile_s=8, passes=2,
                                interpret=True)
    u4, c4 = v4.hsq_encode_flat(flats, eh, el, dim, tile_s=8, passes=2,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(c4), np.asarray(c3))
    np.testing.assert_array_equal(np.asarray(u4), np.asarray(u3))

    d3 = v3.hsq_decode_flat(c3, u3, eh, el, dim, tile_s=8, passes=2,
                            interpret=True)
    d4 = v4.hsq_decode_flat(c3, u3, eh, el, dim, tile_s=8, passes=2,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(d4), np.asarray(d3))

    m3 = v3.hsq_decode_mean(c3, u3, eh, el, dim, tile_s=8, passes=2,
                            interpret=True)
    m4 = v4.hsq_decode_mean(c3, u3, eh, el, dim, tile_s=8, passes=2,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(m4), np.asarray(m3), rtol=0, atol=0)


def test_hsq4_unbatched_matches_v3(rng):
    from gqx.ops import pallas_hsq3 as v3
    from gqx.ops import pallas_hsq4 as v4

    dim, k, size = 16, 64, 16 * 200
    cb, eh, el, flat = _flat_refs(rng, dim, k, size)
    u3, c3 = v3.hsq_encode_flat(flat, eh, el, dim, tile_s=8, passes=2,
                                interpret=True)
    u4, c4 = v4.hsq_encode_flat(flat, eh, el, dim, tile_s=8, passes=2,
                                interpret=True)
    np.testing.assert_array_equal(np.asarray(c4), np.asarray(c3))
    np.testing.assert_array_equal(np.asarray(u4), np.asarray(u3))


def test_hsq4_pipelined_encode_bit_identical(rng):
    from gqx.ops import pallas_hsq4 as v4

    dim, k, size, users = 16, 64, 16 * 200, 4
    cb, eh, el, _ = _flat_refs(rng, dim, k, size)
    flats = jnp.asarray(rng.standard_normal((users, size)), jnp.float32)
    u0, c0 = v4.hsq_encode_flat(flats, eh, el, dim, tile_s=8, passes=2,
                                interpret=True)
    u1, c1 = v4.hsq_encode_flat(flats, eh, el, dim, tile_s=8, passes=2,
                                interpret=True, pipeline=True)
    np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0))
    np.testing.assert_array_equal(np.asarray(u1), np.asarray(u0))


def test_hsq4_transposed_signature_roundtrip(rng):
    """transposed=True encode output is the exact (U, B, s_pad) relayout of
    the m-order signature, and the decode/decode_mean transposed inputs
    reproduce the m-order results bitwise (the production sim hot path,
    gqx/compress/vq.py sig_t)."""
    from gqx.ops import pallas_hsq4 as v4
    from gqx.ops.pallas_hsq3 import _geometry

    dim, k, size, users, tile_s = 16, 64, 16 * 200, 3, 8
    cb, eh, el, _ = _flat_refs(rng, dim, k, size)
    flats = jnp.asarray(rng.standard_normal((users, size)), jnp.float32)
    m = size // dim
    b, _, s_pad = _geometry(size, dim, tile_s)

    u0, c0 = v4.hsq_encode_flat(flats, eh, el, dim, tile_s=tile_s, passes=2,
                                interpret=True)
    ut, ct = v4.hsq_encode_flat(flats, eh, el, dim, tile_s=tile_s, passes=2,
                                interpret=True, transposed=True)
    assert ut.shape == ct.shape == (users, b, s_pad)
    # element (blk, s) holds m-order row s*b + blk
    got_u = np.swapaxes(np.asarray(ut), 1, 2).reshape(users, -1)[:, :m]
    got_c = np.swapaxes(np.asarray(ct), 1, 2).reshape(users, -1)[:, :m]
    np.testing.assert_array_equal(got_c, np.asarray(c0))
    np.testing.assert_array_equal(got_u, np.asarray(u0))

    d0 = v4.hsq_decode_flat(c0, u0, eh, el, dim, tile_s=tile_s, passes=2,
                            interpret=True)
    dt = v4.hsq_decode_flat(ct, ut, eh, el, dim, tile_s=tile_s, passes=2,
                            interpret=True, out_size=size)
    np.testing.assert_array_equal(np.asarray(dt), np.asarray(d0))

    m0 = v4.hsq_decode_mean(c0, u0, eh, el, dim, tile_s=tile_s, passes=2,
                            interpret=True)
    mt = v4.hsq_decode_mean(ct, ut, eh, el, dim, tile_s=tile_s, passes=2,
                            interpret=True, out_size=size)
    np.testing.assert_array_equal(np.asarray(mt), np.asarray(m0))
