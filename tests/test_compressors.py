"""Compressor unit tests against brute-force numpy oracles (SURVEY.md §4:
roundtrip shapes, QSGD/PVQ unbiasedness, HSQ code selection = nearest
centroid, dim-fixup semantics, the <=1000-element passthrough rule)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gqx.compress import (
    HSQCompressor,
    IdenticalCompressor,
    MaureySparsificationCompressor,
    ProbabilisticScalarCompressor,
    ProbabilisticVectorCompressor,
    QSGDCompressor,
    ResidualCompressor,
    SignSGDCompressor,
    TopKCompressor,
    build_leaf_compressors,
    make_compressor,
    subvector_dim,
)
from gqx.config import GQConfig


def key(i=0):
    return jax.random.PRNGKey(i)


# ---------------------------------------------------------------- dim fixup
def reference_dim_fixup(size, c_dim):
    """Oracle transcription of the reference loop semantics
    (reference qsgd_compressor.py:16-22)."""
    if c_dim == 0 or size < c_dim:
        return size
    dim = c_dim
    for _ in range(10):
        if size % dim != 0:
            dim = dim // 2 * 3
    return dim


@pytest.mark.parametrize(
    "size,c_dim",
    [(1024, 32), (1024, 0), (16, 32), (2304, 32), (1728, 32), (4096, 128), (1000, 16)],
)
def test_subvector_dim_matches_reference(size, c_dim):
    ref = reference_dim_fixup(size, c_dim)
    if size % ref == 0:
        assert subvector_dim(size, c_dim) == ref
    else:
        with pytest.raises(ValueError):
            subvector_dim(size, c_dim)


# ---------------------------------------------------------------- identity/sign
def test_identity_roundtrip(rng):
    v = jnp.asarray(rng.standard_normal((8, 16)), jnp.float32)
    c = IdenticalCompressor(v.size, v.shape)
    np.testing.assert_array_equal(c.roundtrip(v), v)


def test_sign_compressor(rng):
    v = jnp.asarray(rng.standard_normal((64,)), jnp.float32).at[3].set(0.0)
    c = SignSGDCompressor(v.size, v.shape)
    out = np.asarray(c.roundtrip(v))
    np.testing.assert_array_equal(out, np.sign(np.asarray(v)))
    assert out[3] == 0.0  # sign(0) = 0 preserved


# ---------------------------------------------------------------- qsgd
def test_qsgd_deterministic_matches_oracle(rng):
    v = rng.standard_normal((4, 32)).astype(np.float32)
    c = QSGDCompressor(v.size, v.shape, n_bit=4, c_dim=16, random=False)
    got = np.asarray(c.roundtrip(jnp.asarray(v)))

    s = 2 ** 4
    rows = v.reshape(-1, 16)
    norm = np.max(np.abs(rows), axis=1, keepdims=True)
    l = np.clip(np.abs(rows / norm) * s, 0, s - 1).astype(np.int32)
    signs = (rows > 0).astype(np.float32)
    want = (l * (2 * signs - 1) * norm / s).reshape(v.shape)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_qsgd_stochastic_unbiased(rng):
    v = jnp.asarray(rng.standard_normal((128,)), jnp.float32)
    c = QSGDCompressor(v.size, v.shape, n_bit=2, c_dim=0, random=True)
    rt = jax.jit(jax.vmap(lambda k: c.roundtrip(v, k)))
    keys = jax.random.split(key(1), 4096)
    mean = jnp.mean(rt(keys), axis=0)
    err = np.abs(np.asarray(mean - v))
    # stderr of a bounded quantizer over 4096 trials
    assert err.max() < 0.05 * float(jnp.max(jnp.abs(v)))


def test_qsgd_zero_vector_safe():
    v = jnp.zeros((64,), jnp.float32)
    c = QSGDCompressor(v.size, v.shape, n_bit=2, c_dim=16, random=True)
    out = np.asarray(c.roundtrip(v, key()))
    assert np.all(np.isfinite(out))
    np.testing.assert_array_equal(out, 0.0)


def test_terngrad_config(rng):
    # TernGrad = QSGD with n_bit=1, whole-tensor bucket (reference README.md:21-26)
    v = jnp.asarray(rng.standard_normal((2048,)), jnp.float32)
    c = QSGDCompressor(v.size, v.shape, n_bit=1, c_dim=0, random=True)
    assert c.dim == v.size and c.M == 1
    out = np.asarray(c.roundtrip(v, key()))
    vmax = float(jnp.max(jnp.abs(v)))
    levels = np.unique(np.round(np.abs(out) / (vmax / 2), 6))
    assert set(levels).issubset({0.0, 1.0, 2.0})


# ---------------------------------------------------------------- prob scalar
def test_probabilistic_scalar_range_and_degenerate(rng):
    v = jnp.asarray(rng.standard_normal((256,)) * 3, jnp.float32)
    c = ProbabilisticScalarCompressor(v.size, v.shape, n_bit=6, random=True)
    out = np.asarray(c.roundtrip(v, key()))
    span = float(jnp.max(v) - jnp.min(v))
    assert np.max(np.abs(out - np.asarray(v))) <= span / 2 ** 6 + 1e-6

    const = jnp.full((16,), 1.7, jnp.float32)
    out = np.asarray(c.roundtrip(const, key()))
    np.testing.assert_allclose(out, 1.7, rtol=1e-6)


# ---------------------------------------------------------------- hsq
def test_hsq_codes_match_bruteforce_nearest_centroid(rng):
    v = rng.standard_normal((64, 16)).astype(np.float32).reshape(-1)
    c = HSQCompressor(v.size, (64, 16), c_dim=16, k_bit=6, n_bit=32, random=False)
    sig = c.compress(jnp.asarray(v))
    cb = np.asarray(c.codewords)  # (64, 16) unit rows
    rows = v.reshape(-1, 16)
    p = rows @ cb.T
    got_codes = np.asarray(sig["codes"], dtype=np.int64)
    # fp near-ties between XLA and numpy accumulation orders are fine: the
    # chosen code must achieve the max |inner product| up to epsilon.
    best = np.max(np.abs(p), axis=1)
    chosen = np.abs(p[np.arange(64), got_codes])
    np.testing.assert_allclose(chosen, best, rtol=1e-5)
    # signed inner product as the scale (reference nearest_neighbor_compressor.py:73)
    np.testing.assert_allclose(
        np.asarray(sig["u"]), p[np.arange(64), got_codes], rtol=1e-4, atol=1e-5
    )
    # brute-force nearest-centroid-on-the-sphere check: max |cos| ==
    # min distance to ±centroid for unit codewords
    got = np.asarray(c.decompress(sig)).reshape(-1, 16)
    recon_err = np.linalg.norm(got - rows, axis=1)
    for j in range(cb.shape[0]):
        proj = (rows @ cb[j])[:, None] * cb[None, j]
        assert np.all(recon_err <= np.linalg.norm(proj - rows, axis=1) + 1e-5)


def test_hsq_orthonormal_case_roundtrip_exact():
    # K == dim -> random orthonormal codebook
    # (reference nearest_neighbor_compressor.py:45-46); a vector aligned with
    # a codeword reconstructs exactly (up to fp) with n_bit=32.
    c = HSQCompressor(256, (256,), c_dim=16, k_bit=0, n_bit=32, random=False)
    assert c.K == c.dim == 16
    cb = np.asarray(c.codewords)
    v = np.tile(3.0 * cb[5], 16).astype(np.float32)
    out = np.asarray(c.roundtrip(jnp.asarray(v)))
    np.testing.assert_allclose(out, v, atol=1e-4)


def test_hsq_norm_quantization_path(rng):
    v = jnp.asarray(rng.standard_normal((4096,)), jnp.float32)
    c = HSQCompressor(v.size, v.shape, c_dim=16, k_bit=6, n_bit=6, random=True)
    out = np.asarray(c.roundtrip(v, key()))
    assert out.shape == v.shape and np.all(np.isfinite(out))
    # wire accounting: 6-bit codes + 6-bit norms per 16-dim subvector
    assert c.wire_bits == 6 * 256 + 2 * 32 + 6 * 256


# ---------------------------------------------------------------- pvq
def test_pvq_unbiased(rng):
    dim = 8
    c = ProbabilisticVectorCompressor(64, (64,), c_dim=dim, k_bit=3, n_bit=32, random=False)
    assert c.K == 8 == c.dim  # orthonormal case
    v = jnp.asarray(rng.standard_normal((64,)), jnp.float32)
    rt = jax.jit(jax.vmap(lambda k: c.roundtrip(v, k)))
    keys = jax.random.split(key(7), 8192)
    mean = np.asarray(jnp.mean(rt(keys), axis=0))
    # E[sign(p_j) * ||p||_1 * c_j] = sum_j p_j c_j = v for orthonormal C
    np.testing.assert_allclose(mean, np.asarray(v), atol=0.15)


# ---------------------------------------------------------------- residual
def test_residual_two_stage_structure(rng):
    """decompress == stage1(v) + stage2(v - stage1(v)) with the same key split
    (reference residual_compressor.py:15-32).  (Note: stage 2 is the
    *stochastic* PVQ, which is unbiased but high-variance, so pointwise error
    reduction is not guaranteed — in the reference either.)"""
    v = jnp.asarray(rng.standard_normal((2048,)), jnp.float32)
    c = ResidualCompressor(v.size, v.shape, c_dim=16, k_bit=5, n_bit=32, random=False)
    k = key(9)
    out = np.asarray(c.roundtrip(v, k))
    k0, k1 = jax.random.split(k, 2)
    d1 = c.stages[0].decompress(c.stages[0].compress(v, k0))
    d2 = c.stages[1].decompress(c.stages[1].compress(v - d1, k1))
    np.testing.assert_allclose(out, np.asarray(d1 + d2), rtol=1e-5, atol=1e-6)
    # the residual's expected reconstruction is unbiased on top of stage 1:
    # averaging many stochastic stage-2 draws should beat stage 1 alone.
    rt = jax.jit(jax.vmap(lambda kk: c.roundtrip(v, kk)))
    mean = jnp.mean(rt(jax.random.split(k, 512)), axis=0)
    e1 = float(jnp.linalg.norm(d1 - v))
    e_mean = float(jnp.linalg.norm(mean - v))
    assert e_mean < e1


# ---------------------------------------------------------------- sparse
def test_topk_keeps_largest(rng):
    v = jnp.asarray(rng.standard_normal((512,)), jnp.float32)
    c = TopKCompressor(v.size, v.shape, cr=128)
    assert c.k == 4
    out = np.asarray(c.roundtrip(v))
    nz = np.nonzero(out)[0]
    assert len(nz) == 4
    want = np.argsort(-np.abs(np.asarray(v)))[:4]
    assert set(nz) == set(want)
    np.testing.assert_allclose(out[nz], np.asarray(v)[nz])


def test_maurey_unbiased(rng):
    v = jnp.asarray(rng.standard_normal((256,)), jnp.float32)
    c = MaureySparsificationCompressor(v.size, v.shape, c_dim=32, k_bit=4, n_bit=4)
    rt = jax.jit(jax.vmap(lambda k: c.roundtrip(v, k)))
    keys = jax.random.split(key(3), 8192)
    mean = np.asarray(jnp.mean(rt(keys), axis=0))
    # E[scatter(sign)*l1/k] = sum_i prob_i*sign_i*l1/k * k picks = v.
    # Per-coordinate sampling std is (l1/k)*sqrt(k*p_i) — bound the max
    # deviation at ~5 sigma of the largest coordinate over 8192 trials.
    l1 = float(jnp.sum(jnp.abs(v)))
    p_max = float(jnp.max(jnp.abs(v))) / l1
    se = (l1 / c.k) * np.sqrt(c.k * p_max) / np.sqrt(len(keys))
    np.testing.assert_allclose(mean, np.asarray(v), atol=5 * se)


# ---------------------------------------------------------------- chooser
def test_leaf_passthrough_rule(rng):
    params = {
        "big": jnp.zeros((64, 64)),     # 4096 > 1000 -> compressed
        "small": jnp.zeros((1000,)),    # == 1000 -> passthrough (strict >)
        "bias": jnp.zeros((10,)),
    }
    cfg = GQConfig(quantizer="qsgd", c_dim=16, n_bit=2, dataset="synthetic")
    comps = build_leaf_compressors(params, cfg)
    assert isinstance(comps["big"], QSGDCompressor)
    assert isinstance(comps["small"], IdenticalCompressor)
    assert isinstance(comps["bias"], IdenticalCompressor)


def test_make_compressor_all_names(rng):
    cfg = GQConfig(quantizer="sgd", c_dim=16, k_bit=4, n_bit=4, cr=64, dataset="synthetic")
    v = jnp.asarray(rng.standard_normal((2048,)), jnp.float32)
    for name in ("sgd", "sign", "qsgd", "hsq", "pvq", "residual", "topk", "maurey"):
        c = make_compressor(name, v.size, v.shape, cfg)
        out = c.roundtrip(v, key(11))
        assert out.shape == v.shape
        assert np.all(np.isfinite(np.asarray(out)))
        assert c.wire_bits > 0


def test_compress_is_jit_and_vmap_compatible(rng):
    v = jnp.asarray(rng.standard_normal((8, 2048)), jnp.float32)  # users axis
    c = QSGDCompressor(2048, (2048,), n_bit=2, c_dim=128, random=True)
    keys = jax.random.split(key(5), 8)
    out = jax.jit(jax.vmap(c.roundtrip))(v, keys)
    assert out.shape == v.shape


def test_hsq_passes_knob_threads_through():
    from gqx.compress import make_compressor
    from gqx.config import GQConfig

    cfg = GQConfig(quantizer="hsq", c_dim=16, k_bit=6, n_bit=6,
                   dataset="synthetic")
    cfg.hsq_passes = 1
    comp = make_compressor("hsq", 1024, (1024,), cfg)
    assert comp.passes == 1
    from gqx.cli import build_parser, config_from_args

    args = build_parser().parse_args(["--hsq-passes", "1"])
    assert config_from_args(args).hsq_passes == 1


def test_transposed_scalar_compressor_matches_m_order(rng):
    """TransposedScalarCompressor on the (B, s_pad) grid produces the same
    per-segment ranges and (with random=False) the same quantized values as
    the m-order ProbabilisticScalarCompressor on the same data."""
    import numpy as np
    from gqx.compress.scalar import (
        ProbabilisticScalarCompressor,
        TransposedScalarCompressor,
    )

    b, s_pad = 8, 40
    segs_m = (101, 150, 63)          # three "leaves"
    m = sum(segs_m)
    pad = b * s_pad - m
    segs_t = segs_m + (pad,)

    vec_m = rng.standard_normal(m).astype(np.float32)
    grid = np.zeros(b * s_pad, np.float32)
    grid[:m] = vec_m
    vec_t = jnp.asarray(grid.reshape(s_pad, b).T)   # (b, s_pad), m = s*b+blk

    ref = ProbabilisticScalarCompressor(m, (m,), 6, random=False,
                                        segment_sizes=segs_m)
    tt = TransposedScalarCompressor(b, s_pad, 6, random=False,
                                    segment_sizes=segs_t)

    sig_m = ref.compress(jnp.asarray(vec_m))
    sig_t = tt.compress(vec_t)
    np.testing.assert_array_equal(np.asarray(sig_t["lower"])[:3],
                                  np.asarray(sig_m["lower"]))
    np.testing.assert_array_equal(np.asarray(sig_t["upper"])[:3],
                                  np.asarray(sig_m["upper"]))

    dec_m = np.asarray(ref.decompress(sig_m))
    dec_t = np.asarray(tt.decompress(sig_t))       # (b, s_pad)
    got = dec_t.T.reshape(-1)[:m]
    np.testing.assert_array_equal(got, dec_m)
    # pad segment decodes to exact zeros
    np.testing.assert_array_equal(dec_t.T.reshape(-1)[m:], 0.0)
