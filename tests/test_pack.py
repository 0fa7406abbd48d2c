"""Wire-format tests: bit-exact pack/unpack inverses, byte accounting, and
compression-ratio verification against the SURVEY.md §6 logical table."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gqx.compress import make_compressor
from gqx.config import GQConfig
from gqx.ops.pack import (
    pack_bits,
    pack_uint,
    packed_words,
    unpack_bits,
    unpack_uint,
)
from gqx.ops.wire import pack_signature, unpack_signature, wire_bytes


@pytest.mark.parametrize("bits", [1, 2, 4, 6, 8, 12, 16, 32])
def test_pack_unpack_roundtrip(bits, rng):
    n = 1000
    vals = jnp.asarray(rng.integers(0, 2 ** min(bits, 31), size=n), jnp.uint32)
    words = pack_uint(vals, bits)
    assert words.dtype == jnp.uint32
    assert words.shape[0] == packed_words(n, bits)
    back = unpack_uint(words, bits, n)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vals))


def test_pack_bits_matches_aligned(rng):
    vals = jnp.asarray(rng.integers(0, 16, size=256), jnp.uint32)
    np.testing.assert_array_equal(
        np.asarray(pack_bits(vals, 4)), np.asarray(pack_uint(vals, 4))
    )
    np.testing.assert_array_equal(
        np.asarray(unpack_bits(pack_bits(vals, 4), 4, 256)), np.asarray(vals)
    )


def _bitstream_oracle(vals: np.ndarray, bits: int) -> np.ndarray:
    """Brute-force little-endian bitstream packer (the wire-format spec)."""
    n = len(vals)
    stream = np.zeros(-(-n * bits // 32) * 32, dtype=np.uint8)
    for i, v in enumerate(vals):
        for j in range(bits):
            stream[i * bits + j] = (int(v) >> j) & 1
    words = stream.reshape(-1, 32)
    return (words.astype(np.uint64) << np.arange(32, dtype=np.uint64)).sum(
        axis=1
    ).astype(np.uint32)


@pytest.mark.parametrize("bits", list(range(1, 18)) + [20, 24, 31, 32])
def test_pack_bits_matches_bitstream_oracle(bits, rng):
    # the periodic formulation must be BIT-EXACT vs the little-endian
    # bitstream spec for every width (incl. awkward n not on a period
    # boundary) — this pins the wire format across implementations
    # (native/gqx_native.cc implements the same layout host-side)
    for n in (1, 7, 64, 333):
        hi = 2 ** min(bits, 31)
        vals = np.asarray(rng.integers(0, hi, size=n), np.uint32)
        got = np.asarray(pack_uint(jnp.asarray(vals), bits))
        np.testing.assert_array_equal(
            got, _bitstream_oracle(vals, bits)[: len(got)]
        )
        back = np.asarray(unpack_uint(jnp.asarray(got), bits, n))
        np.testing.assert_array_equal(back, vals)


NAMES = ("sgd", "sign", "qsgd", "hsq", "pvq", "residual", "topk", "maurey")


@pytest.mark.parametrize("name", NAMES)
@pytest.mark.parametrize("k_bit", [0, 6, 8])
def test_signature_wire_roundtrip_bit_exact(name, k_bit, rng):
    # k_bit=0 is the K==dim orthonormal-codebook HSQ configuration
    # (reference nearest_neighbor_compressor.py:40-46); codes then span
    # [0, dim) and must be packed with ceil(log2(dim)) bits, not k_bit.
    if k_bit == 0 and name in ("pvq", "residual", "maurey"):
        pytest.skip("k_bit=0 is an HSQ-only configuration")
    cfg = GQConfig(quantizer=name, c_dim=16, k_bit=k_bit, n_bit=6, cr=64,
                   dataset="synthetic")
    v = jnp.asarray(rng.standard_normal((2048,)), jnp.float32)
    comp = make_compressor(name, v.size, v.shape, cfg)
    sig = comp.compress(v, jax.random.PRNGKey(0))
    wire = pack_signature(comp, sig)
    for k, w in wire.items():
        assert w.dtype == jnp.uint32, k
    back = unpack_signature(comp, wire)
    # decompressing the unpacked signature must be bit-identical
    np.testing.assert_array_equal(
        np.asarray(comp.decompress(sig)), np.asarray(comp.decompress(back))
    )
    # byte accounting matches the actual packed arrays
    actual_bytes = sum(4 * w.size for w in wire.values())
    assert actual_bytes == wire_bytes(comp)


def test_hsq_wire_ratio():
    # Logical (SURVEY.md §6): (8 + 6)/16 = 0.875 b/coord ~= 36.6x.
    # Physical: stochastic rounding makes the 6-bit norm level reach 2^6, so
    # the lossless wire uses 7 bits -> (8+7)/16 b/coord ~= 34.1x.
    cfg = GQConfig(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6, dataset="synthetic")
    size = 1 << 20
    comp = make_compressor("hsq", size, (size,), cfg)
    assert comp.wire_bits / size == pytest.approx(0.875 + 2 * 32 / size, rel=0.01)
    ratio = (4 * size) / wire_bytes(comp)
    assert 33.5 < ratio < 34.5, ratio
    # deterministic rounding keeps the logical 6-bit width exactly
    cfg_det = GQConfig(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6, random=False,
                       dataset="synthetic")
    comp_det = make_compressor("hsq", size, (size,), cfg_det)
    ratio_det = (4 * size) / wire_bytes(comp_det)
    assert 36.0 < ratio_det < 37.0, ratio_det


def test_qsgd_wire_ratio():
    # Logical: 1 + 2 + 32/128 = 3.25 b/coord ~= 9.8x; physical with the
    # stochastic-rounding overflow bit: 4.25 b/coord ~= 7.5x.
    cfg = GQConfig(quantizer="qsgd", c_dim=128, n_bit=2, dataset="synthetic")
    size = 1 << 20
    comp = make_compressor("qsgd", size, (size,), cfg)
    ratio = (4 * size) / wire_bytes(comp)
    assert 7.3 < ratio < 7.7, ratio
    cfg_det = GQConfig(quantizer="qsgd", c_dim=128, n_bit=2, random=False,
                       dataset="synthetic")
    comp_det = make_compressor("qsgd", size, (size,), cfg_det)
    ratio_det = (4 * size) / wire_bytes(comp_det)
    assert 9.5 < ratio_det < 10.0, ratio_det


def test_maurey_zero_coordinate_sign_wire_lossless(rng):
    # A vector with exact zeros: sampled signs must stay strictly +-1 so the
    # 1-bit packed sign roundtrips losslessly even at searchsorted clips.
    cfg = GQConfig(quantizer="maurey", c_dim=16, k_bit=6, n_bit=6, dataset="synthetic")
    v = jnp.asarray(rng.standard_normal((2048,)), jnp.float32)
    v = v.at[::2].set(0.0)
    comp = make_compressor("maurey", v.size, v.shape, cfg)
    sig = comp.compress(v, jax.random.PRNGKey(3))
    assert set(np.unique(np.asarray(sig["signs"]))) <= {-1.0, 1.0}
    back = unpack_signature(comp, pack_signature(comp, sig))
    np.testing.assert_array_equal(
        np.asarray(comp.decompress(sig)), np.asarray(comp.decompress(back))
    )


def test_pack_is_jittable(rng):
    cfg = GQConfig(quantizer="qsgd", c_dim=128, n_bit=2, dataset="synthetic")
    v = jnp.asarray(rng.standard_normal((4096,)), jnp.float32)
    comp = make_compressor("qsgd", v.size, v.shape, cfg)

    @jax.jit
    def roundtrip_wire(vec, key):
        sig = comp.compress(vec, key)
        wire = pack_signature(comp, sig)
        return comp.decompress(unpack_signature(comp, wire))

    out = roundtrip_wire(v, jax.random.PRNGKey(1))
    ref = comp.decompress(comp.compress(v, jax.random.PRNGKey(1)))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_maurey_wire_sign_zero_roundtrip():
    """Maurey signs are {-1, 0, +1} (reference maurey_sparsification.py:36
    torch.sign semantics — zero reachable via searchsorted boundary clips on
    an all-zero vector): the 2-bit trit wire must roundtrip all three values
    bit-exactly, including zeros."""
    cfg = GQConfig(quantizer="maurey", c_dim=32, k_bit=8, n_bit=8,
                   dataset="synthetic")
    comp = make_compressor("maurey", 2048, (2048,), cfg)
    # an all-zero vector samples clipped boundary indices -> sign(0) = 0
    sig0 = comp.compress(jnp.zeros((2048,), jnp.float32), jax.random.PRNGKey(0))
    assert np.all(np.asarray(sig0["signs"]) == 0.0)
    # synthetic signature exercising every trit value
    k = comp.k
    sig = dict(sig0)
    sig["signs"] = jnp.asarray(np.resize([-1.0, 0.0, 1.0], k), jnp.float32)
    for s in (sig0, sig):
        back = unpack_signature(comp, pack_signature(comp, s))
        np.testing.assert_array_equal(np.asarray(back["signs"]), np.asarray(s["signs"]))
        np.testing.assert_array_equal(np.asarray(back["codes"]), np.asarray(s["codes"]))
        # decompress of sign-0 entries contributes exactly 0
        dec = comp.decompress(back)
        assert dec.shape == (2048,)


@pytest.mark.parametrize("n_bit", [6, 32])
def test_transposed_wire_roundtrip(n_bit, rng):
    """The transposed HSQ wire (pack_signature transposed=True — the packed
    mesh path's TPU layout) is a bit-exact inverse pair over the kernels'
    native (B, s_pad) signature layout, for both quantized and raw norms."""
    from gqx.compress.vq import HSQCompressor
    from gqx.ops.wire import wire_bytes_transposed

    size = 16 * 4096
    comp = HSQCompressor(size, (size,), c_dim=16, k_bit=8, n_bit=n_bit,
                         use_pallas=True, passes=1,
                         norm_segment_sizes=(3000, size // 16 - 3000))
    assert comp.sig_t, "transposed layout must be available for this geometry"
    b, s_pad = comp._tgeom
    codes = jnp.asarray(rng.integers(0, 256, size=(b, s_pad)), jnp.uint8)
    if n_bit == 32:
        u = jnp.asarray(rng.standard_normal((b, s_pad)), jnp.float32)
    else:
        nt = comp.norm_compressor_t
        u = {
            "lower": jnp.asarray(rng.standard_normal(nt.n_segments), jnp.float32),
            "upper": jnp.asarray(rng.standard_normal(nt.n_segments), jnp.float32),
            "l": jnp.asarray(
                rng.integers(0, 2 ** n_bit + 1, size=(b, s_pad)), jnp.int32),
        }
    sig = {"codes": codes, "u": u}
    wire = pack_signature(comp, sig, transposed=True)
    assert all(w.dtype == jnp.uint32 for w in wire.values())
    assert sum(4 * w.size for w in wire.values()) == wire_bytes_transposed(comp)
    back = unpack_signature(comp, wire, transposed=True)
    np.testing.assert_array_equal(np.asarray(back["codes"]), np.asarray(codes))
    if n_bit == 32:
        np.testing.assert_array_equal(np.asarray(back["u"]), np.asarray(u))
    else:
        for k in ("lower", "upper", "l"):
            np.testing.assert_array_equal(np.asarray(back["u"][k]),
                                          np.asarray(u[k]))

    # batched (stacked-users) roundtrip, as the mesh path vmaps it
    sigs = jax.tree.map(lambda a: jnp.stack([a, a]), sig)
    wires = jax.vmap(lambda s: pack_signature(comp, s, transposed=True))(sigs)
    backs = jax.vmap(
        lambda w: unpack_signature(comp, w, transposed=True))(wires)
    for a, b_ in zip(jax.tree.leaves(sigs), jax.tree.leaves(backs)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))

    # non-sig_t compressors refuse the transposed layout
    qs = make_compressor("qsgd", 1024, (1024,), GQConfig(
        network="fcn", dataset="synthetic", quantizer="qsgd"))
    with pytest.raises(TypeError):
        pack_signature(qs, {}, transposed=True)
