"""Vector-quantization compressors: HSQ nearest-neighbor, probabilistic VQ,
and two-stage residual VQ.

Behavioral spec (math) from the reference:
  - NearestNeighborCompressor (HSQ) —
        reference compressors/nearest_neighbor_compressor.py:9-91
  - ProbabilisticVectorCompressor —
        reference compressors/probabilistic_vector_compressor.py:8-77
  - ResidualCompressor — reference compressors/residual_compressor.py:7-32

TPU-first notes: the encode hot spot is an (M, dim) x (dim, K) inner-product
matmul followed by an abs-argmax over K and a row gather — exactly the shape
the MXU wants; the fused single-pass Pallas kernel lives in
gqx.ops.pallas_hsq and is used automatically on TPU (``use_pallas``).
Decode is expressed as one-hot(codes) @ codebook so it also rides the MXU.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gqx.codebooks import get_codebook, orthonormal_codebook
from gqx.compress.api import Compressor, Sig, code_dtype, subvector_dim
from gqx.compress.scalar import (
    ProbabilisticScalarCompressor,
    TransposedScalarCompressor,
)


def _hsq_kernels():
    """Flat-layout kernel generation: v4 (vectorized selection/one-hot) is
    the default; GQX_HSQ_KGEN=3 selects the per-block-loop v3 bodies (same
    layout contract, bit-identical outputs — tests/test_pallas.py:190-244)
    for A/B measurement (PERF.md)."""
    if os.environ.get("GQX_HSQ_KGEN", "4") == "3":
        from gqx.ops import pallas_hsq3 as mod
    else:
        from gqx.ops import pallas_hsq4 as mod
    return mod


class HSQCompressor(Compressor):
    """Hyper-sphere (nearest-neighbor) vector quantization.

    compress (reference nearest_neighbor_compressor.py:63-78): view as
    (M, dim) rows; p = rows @ codebookᵀ; codes = argmax |p|; scale
    u = p[codes] (the *signed* inner product); when n_bit != 32 the scales
    are themselves quantized with the min/max probabilistic scalar
    compressor.  decompress (its :80-90): codebook[codes] * u.
    """

    stochastic = True

    def __init__(
        self,
        size: int,
        shape: Tuple[int, ...],
        c_dim: int,
        k_bit: int,
        n_bit: int,
        random: bool = True,
        codebook: Optional[np.ndarray] = None,
        codebook_seed: int = 1,
        use_pallas: bool = False,
        norm_segment_sizes: Optional[Tuple[int, ...]] = None,
        passes: int = 2,
    ):
        super().__init__(size, shape)
        self.passes = int(passes)
        assert c_dim > 0 and k_bit >= 0 and n_bit > 0
        self.dim = subvector_dim(size, c_dim)
        self.k_bit = int(k_bit)
        self.n_bit = int(n_bit)
        self.K = 2 ** self.k_bit if self.k_bit > 0 else self.dim
        self.M = size // self.dim
        self.random = bool(random)
        self.use_pallas = bool(use_pallas)

        if codebook is None:
            if self.K == self.dim:
                codebook = orthonormal_codebook(self.dim, seed=codebook_seed)
            else:
                codebook = get_codebook(self.dim, self.K)
        assert codebook.shape == (self.K, self.dim)
        self.codewords = jnp.asarray(codebook, dtype=jnp.float32)

        # v3 flat-layout kernels (gqx.ops.pallas_hsq3; operand prep shared
        # with pallas_hsq2): users-in-block grid + transposed signature
        # layout — see PERF.md for the measured progression v1 -> v2 -> v3.
        # The codebook is rounded to bf16-exact values so the 2-pass bf16
        # matmul split is fp32-exact (bf16_exact_codebook docstring).
        from gqx.ops import pallas_hsq2 as hsq2

        self.flat_ok = self.use_pallas and hsq2.supports_flat(self.dim, self.K)
        if self.flat_ok:
            cb = hsq2.bf16_exact_codebook(np.asarray(self.codewords))
            self.codewords = jnp.asarray(cb)
            self._eh, self._el = map(
                jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb))
            )

        self.compressed_norm = self.n_bit != 32
        self.norm_compressor = (
            ProbabilisticScalarCompressor(
                self.M, (self.M,), self.n_bit, random,
                segment_sizes=norm_segment_sizes,
            )
            if self.compressed_norm
            else None
        )

        # Transposed-signature fast path for the batched (stacked-users) API:
        # encode emits and decode_mean/decompress_batch consume the kernels'
        # native (U, B, s_pad) layout, skipping the m-order conversions that
        # measure ~6-7 ms (encode) + ~10 ms (decode-mean) per bench step —
        # more than the kernels themselves (PERF.md round 3, probe_dm).
        # Requires the v4 kernels; the norm quantizer runs directly on the
        # transposed grid with the kernel tail pad as its own segment
        # (TransposedScalarCompressor docstring).  The packed mesh path also
        # ships this layout on TPU (gqx.ops.wire pack_signature
        # transposed=True); CPU and cross-impl payloads use the canonical
        # m-order wire.
        self.sig_t = False
        self.norm_compressor_t = None
        if (
            self.flat_ok
            and os.environ.get("GQX_HSQ_SIG_T", "1") == "1"
            and os.environ.get("GQX_HSQ_KGEN", "4") != "3"
        ):
            from gqx.ops.pallas_hsq3 import _geometry

            b, _, s_pad = _geometry(size, self.dim, self._ENC_TILE_S)
            pad_rows = s_pad * b - self.M
            segs_m = tuple(norm_segment_sizes) if norm_segment_sizes \
                else (self.M,)
            segs_t = segs_m + ((pad_rows,) if pad_rows else ())
            try:
                if self.compressed_norm:
                    self.norm_compressor_t = TransposedScalarCompressor(
                        b, s_pad, self.n_bit, random, segment_sizes=segs_t,
                    )
                self.sig_t = True
                self._tgeom = (b, s_pad)
            except AssertionError:
                # a non-final segment narrower than one column: keep the
                # m-order path (correctness first)
                self.sig_t = False

    # v3 kernel tile sizes, swept honest-timed on the real chip (PERF.md);
    # v3 is tile-insensitive within VMEM bounds — these are the measured best
    _ENC_TILE_S = 512      # r4 bf16-input sweep: 8.84 @512 vs 9.17 @256
    _DEC_TILE_S = 128
    _DECMEAN_TILE_S = 512  # r4 sweep: 3.66 @512 vs 3.90 @256 (was 256)

    # -- encode -------------------------------------------------------------
    _XLA_CHUNK_ROWS = 1 << 16  # caps the (chunk, K) product matrix in HBM

    def _enc_input(self, vecs):
        """Encode-input dtype policy: passes>=2 needs fp32 (hi/lo split);
        passes==1 bf16-rounds the input inside the kernel, so a bf16 input
        (bf16 packed units, PERF.md round 4) is accepted as-is — the SAME
        values with half the DMA traffic."""
        if self.passes == 1 and vecs.dtype == jnp.bfloat16:
            return vecs
        return vecs.astype(jnp.float32)

    def _encode_chunk(self, rows: jax.Array):
        # HIGHEST precision: on TPU the default bf16 matmul can flip near-tie
        # argmax code choices; the encode matmul is bandwidth-bound anyway.
        p = jnp.dot(
            rows, self.codewords.T,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        codes = jnp.argmax(jnp.abs(p), axis=1)
        u = jnp.take_along_axis(p, codes[:, None], axis=1)[:, 0]
        return u, codes

    def _encode_xla(self, rows: jax.Array):
        # chunk over rows so the (M, K) product matrix never materializes in
        # HBM (a grouped ResNet-50 unit is 1.47M rows; x8 vmapped users the
        # full product would be 12 GB)
        m = rows.shape[0]
        ch = self._XLA_CHUNK_ROWS
        if m <= ch:
            return self._encode_chunk(rows)
        nc = -(-m // ch)
        pad = nc * ch - m
        if pad:
            rows = jnp.pad(rows, ((0, pad), (0, 0)))
        u, codes = jax.lax.map(self._encode_chunk, rows.reshape(nc, ch, self.dim))
        return u.reshape(-1)[:m], codes.reshape(-1)[:m]

    def compress(self, vec, key: Optional[jax.Array] = None) -> Sig:
        if self.flat_ok:
            hsq_encode_flat = _hsq_kernels().hsq_encode_flat

            u, codes = hsq_encode_flat(
                self._enc_input(vec.reshape(-1)), self._eh, self._el,
                self.dim, tile_s=self._ENC_TILE_S, passes=self.passes,
            )
        elif self.use_pallas:
            from gqx.ops.pallas_hsq import hsq_encode

            u, codes = hsq_encode(
                vec.reshape(-1, self.dim).astype(jnp.float32), self.codewords
            )
        else:
            # pure-XLA fallback: a bf16 input is upcast, reproducing the
            # kernel passes=1 semantics (bf16-rounded values, fp32 products)
            u, codes = self._encode_xla(
                vec.reshape(-1, self.dim).astype(jnp.float32)
            )
        sig: Sig = {"codes": codes.astype(code_dtype(self.code_bits))}
        if self.compressed_norm:
            sig["u"] = self.norm_compressor.compress(u, key)
        else:
            sig["u"] = u
        return sig

    # -- decode -------------------------------------------------------------
    def decompress(self, sig: Sig) -> jax.Array:
        codes = sig["codes"].astype(jnp.int32)
        if self.compressed_norm:
            u = self.norm_compressor.decompress(sig["u"])
        else:
            u = sig["u"]
        if self.flat_ok:
            hsq_decode_flat = _hsq_kernels().hsq_decode_flat

            return hsq_decode_flat(
                codes, u, self._eh, self._el, self.dim,
                tile_s=self._DEC_TILE_S, passes=self.passes,
            ).reshape(self.shape)
        if self.use_pallas:
            from gqx.ops.pallas_hsq import hsq_decode

            rows = hsq_decode(codes, u, self.codewords)
        else:
            from gqx.ops.pallas_hsq import hsq_decode_xla

            rows = hsq_decode_xla(codes, u, self.codewords)
        return rows.reshape(self.shape)

    # -- batched (stacked-users) API: users axis folded into the kernel grid
    def compress_batch(self, vecs, keys) -> Sig:
        if not self.flat_ok:
            return super().compress_batch(vecs, keys)
        hsq_encode_flat = _hsq_kernels().hsq_encode_flat

        users = vecs.shape[0]
        if self.sig_t:
            u, codes = hsq_encode_flat(
                self._enc_input(vecs.reshape(users, -1)), self._eh,
                self._el, self.dim, tile_s=self._ENC_TILE_S,
                passes=self.passes, transposed=True,
            )  # (U, B, s_pad) each
            norm = self.norm_compressor_t
        else:
            u, codes = hsq_encode_flat(
                self._enc_input(vecs.reshape(users, -1)), self._eh,
                self._el, self.dim, tile_s=self._ENC_TILE_S,
                passes=self.passes,
            )
            norm = self.norm_compressor
        sig: Sig = {"codes": codes.astype(code_dtype(self.code_bits))}
        if self.compressed_norm:
            sig["u"] = jax.vmap(norm.compress)(u, keys)
        else:
            sig["u"] = u
        return sig

    def compress_batch_m(self, vecs, keys) -> Sig:
        """Batched encode forced to the canonical m-order layout (the packed
        wire is defined over it); still one batched kernel call — only the
        compact signature is layout-converted, never the gradient."""
        if not self.flat_ok:
            return super().compress_batch(vecs, keys)
        hsq_encode_flat = _hsq_kernels().hsq_encode_flat

        users = vecs.shape[0]
        u, codes = hsq_encode_flat(
            self._enc_input(vecs.reshape(users, -1)), self._eh,
            self._el, self.dim, tile_s=self._ENC_TILE_S,
            passes=self.passes,
        )
        sig: Sig = {"codes": codes.astype(code_dtype(self.code_bits))}
        if self.compressed_norm:
            sig["u"] = jax.vmap(self.norm_compressor.compress)(u, keys)
        else:
            sig["u"] = u
        return sig

    def _batch_u(self, sig: Sig) -> jax.Array:
        """Dequantized scales for a batched sig (either layout)."""
        transposed = sig["codes"].ndim == 3
        norm = self.norm_compressor_t if transposed else self.norm_compressor
        if self.compressed_norm:
            return jax.vmap(norm.decompress)(sig["u"])
        return sig["u"]

    def decompress_batch(self, sig: Sig) -> jax.Array:
        if not self.flat_ok:
            return super().decompress_batch(sig)
        hsq_decode_flat = _hsq_kernels().hsq_decode_flat

        codes = sig["codes"].astype(jnp.int32)
        u = self._batch_u(sig)
        users = codes.shape[0]
        # out_size only exists on the v4 kernels; sig_t implies v4
        kw = {"out_size": self.size} if codes.ndim == 3 else {}
        return hsq_decode_flat(
            codes, u, self._eh, self._el, self.dim,
            tile_s=self._DEC_TILE_S, passes=self.passes, **kw,
        ).reshape((users,) + self.shape)

    def decode_mean(self, sig: Sig) -> jax.Array:
        """Fused PS server reduce: decode the U users' signatures ONCE via an
        accumulated scaled one-hot (reference ps_quantizer.py:48 decodes U
        times then means)."""
        if not self.flat_ok:
            return super().decode_mean(sig)
        hsq_decode_mean = _hsq_kernels().hsq_decode_mean

        codes = sig["codes"].astype(jnp.int32)
        u = self._batch_u(sig)
        kw = {"out_size": self.size} if codes.ndim == 3 else {}
        return hsq_decode_mean(
            codes, u, self._eh, self._el, self.dim,
            tile_s=self._DECMEAN_TILE_S, passes=self.passes, **kw,
        ).reshape(self.shape)

    @property
    def code_bits(self) -> int:
        """Physical bits per code = ceil(log2(K)).  Equals k_bit when
        k_bit > 0; for the k_bit == 0 orthonormal case (K == dim, reference
        nearest_neighbor_compressor.py:40-46) codes still span [0, dim)."""
        return max((self.K - 1).bit_length(), 1)

    @property
    def wire_bits(self) -> int:
        # 2 range scalars PER SEGMENT (= per original leaf in grouped units,
        # matching the reference's per-layer compressors)
        norm_bits = (
            (2 * 32 * self.norm_compressor.n_segments + self.n_bit * self.M)
            if self.compressed_norm else 32 * self.M
        )
        return self.code_bits * self.M + norm_bits


def _inverse_cdf_sample(prob: jax.Array, r: jax.Array, eps: float = 1e-5) -> jax.Array:
    """codes[i] = first index j with cumsum(prob[i])[j] >= r[i] - eps.

    This is the *intent* of the reference's cumsum/argmin construction
    (reference probabilistic_vector_compressor.py:48-58), which relied on
    old-torch last-occurrence argmin semantics; we implement the sampling
    directly and clip to a valid index.
    """
    cdf = jnp.cumsum(prob, axis=1)
    codes = jnp.sum(cdf < (r[:, None] - eps), axis=1)
    return jnp.clip(codes, 0, prob.shape[1] - 1)


class ProbabilisticVectorCompressor(Compressor):
    """Unbiased VQ: project with the codebook pseudo-inverse, sample the
    codeword index ∝ |p| / ||p||₁, scale by sign(p[code]) * ||p||₁
    (reference probabilistic_vector_compressor.py:42-65)."""

    stochastic = True

    def __init__(
        self,
        size: int,
        shape: Tuple[int, ...],
        c_dim: int,
        k_bit: int,
        n_bit: int,
        random: bool = True,
        codebook: Optional[np.ndarray] = None,
        codebook_seed: int = 1,
        norm_segment_sizes: Optional[Tuple[int, ...]] = None,
    ):
        super().__init__(size, shape)
        assert c_dim > 0 and k_bit > 0 and n_bit > 0
        # NB the reference uses a simple min(c_dim, size) here (its :22),
        # not the divisibility fixup; we use the fixup so ragged sizes work.
        self.dim = subvector_dim(size, c_dim)
        self.k_bit = int(k_bit)
        self.n_bit = int(n_bit)
        self.K = 2 ** self.k_bit
        self.M = size // self.dim

        if codebook is None:
            if self.K == self.dim:
                codebook = orthonormal_codebook(self.dim, seed=codebook_seed)
            else:
                codebook = get_codebook(self.dim, self.K)
        assert codebook.shape == (self.K, self.dim)
        self.codewords = jnp.asarray(codebook, dtype=jnp.float32)
        # c⁺ = pinv(Cᵀ): maps a subvector to codeword coefficients (its :28).
        self.c_dagger = jnp.asarray(
            np.linalg.pinv(np.asarray(codebook, dtype=np.float64).T).astype(np.float32)
        )
        self.compressed_norm = self.n_bit != 32
        self.norm_compressor = (
            ProbabilisticScalarCompressor(
                self.M, (self.M,), self.n_bit, random,
                segment_sizes=norm_segment_sizes,
            )
            if self.compressed_norm
            else None
        )

    def compress(self, vec, key: Optional[jax.Array] = None) -> Sig:
        assert key is not None
        k_sample, k_norm = jax.random.split(key)
        rows = vec.reshape(-1, self.dim).astype(jnp.float32)
        p = jnp.dot(
            rows, self.c_dagger.T,
            preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST,
        )
        l1 = jnp.sum(jnp.abs(p), axis=1)
        safe_l1 = jnp.where(l1 == 0.0, 1.0, l1)
        prob = jnp.abs(p) / safe_l1[:, None]
        r = jax.random.uniform(k_sample, (self.M,))
        codes = _inverse_cdf_sample(prob, r)
        selected = jnp.take_along_axis(p, codes[:, None], axis=1)[:, 0]
        u = jnp.sign(selected) * l1
        sig: Sig = {"codes": codes.astype(code_dtype(self.code_bits))}
        if self.compressed_norm:
            sig["u"] = self.norm_compressor.compress(u, k_norm)
        else:
            sig["u"] = u
        return sig

    def decompress(self, sig: Sig) -> jax.Array:
        codes = sig["codes"].astype(jnp.int32)
        if self.compressed_norm:
            u = self.norm_compressor.decompress(sig["u"])
        else:
            u = sig["u"]
        from gqx.ops.pallas_hsq import hsq_decode_xla

        return hsq_decode_xla(codes, u, self.codewords).reshape(self.shape)

    @property
    def code_bits(self) -> int:
        return max((self.K - 1).bit_length(), 1)

    @property
    def wire_bits(self) -> int:
        # 2 range scalars PER SEGMENT (= per original leaf in grouped units,
        # matching the reference's per-layer compressors)
        norm_bits = (
            (2 * 32 * self.norm_compressor.n_segments + self.n_bit * self.M)
            if self.compressed_norm else 32 * self.M
        )
        return self.code_bits * self.M + norm_bits


class ResidualCompressor(Compressor):
    """Two-stage residual VQ: HSQ on the gradient, probabilistic VQ on the
    residual; decompression sums the stages
    (reference residual_compressor.py:15-32)."""

    stochastic = True

    def __init__(self, size, shape, c_dim, k_bit, n_bit, random=True,
                 norm_segment_sizes=None, **kw):
        super().__init__(size, shape)
        self.stages = (
            HSQCompressor(size, shape, c_dim, k_bit, n_bit, random,
                          norm_segment_sizes=norm_segment_sizes, **kw),
            ProbabilisticVectorCompressor(size, shape, c_dim, k_bit, n_bit, random,
                                          norm_segment_sizes=norm_segment_sizes),
        )

    def compress(self, vec, key: Optional[jax.Array] = None) -> Sig:
        assert key is not None
        keys = jax.random.split(key, len(self.stages))
        residual = vec
        sig: Sig = {}
        for i, (stage, k) in enumerate(zip(self.stages, keys)):
            s = stage.compress(residual, k)
            residual = residual - stage.decompress(s)
            sig[f"stage{i}"] = s
        return sig

    def decompress(self, sig: Sig) -> jax.Array:
        out = self.stages[0].decompress(sig["stage0"])
        for i, stage in enumerate(self.stages[1:], start=1):
            out = out + stage.decompress(sig[f"stage{i}"])
        return out

    @property
    def wire_bits(self) -> int:
        return sum(s.wire_bits for s in self.stages)
