"""Scalar compressors: identity, SignSGD, QSGD, probabilistic min/max scalar.

Behavioral spec (math, not code) from the reference:
  - IdenticalCompressor   — reference compressors/identical_compressor.py:1-11
  - SignSGDCompressor     — reference compressors/signsgd_compressor.py:4-12
  - QSGDCompressor        — reference compressors/qsgd_compressor.py:4-71
  - ProbabilisticScalarCompressor —
        reference compressors/probabilistic_scalar_compressor.py:4-33

TernGrad is QSGD with n_bit=1 and a whole-tensor bucket (reference README.md:21-26).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gqx.compress.api import (
    Compressor,
    Sig,
    code_dtype,
    stochastic_increment,
    subvector_dim,
)


class IdenticalCompressor(Compressor):
    """No-op; also the passthrough for small (<=1000 element) leaves
    (reference ps_quantizer.py:17-20)."""

    stochastic = False

    def compress(self, vec, key=None) -> Sig:
        return {"vec": vec}

    def decompress(self, sig) -> jax.Array:
        return sig["vec"]

    @property
    def wire_bits(self) -> int:
        return 32 * self.size


class SignSGDCompressor(Compressor):
    """sign(v) with 0 preserved; decompress = identity
    (reference signsgd_compressor.py:8-12).  PS-mode averaging of signs across
    users is then a majority vote with ties preserved."""

    stochastic = False

    def compress(self, vec, key=None) -> Sig:
        return {"signs": jnp.sign(vec)}

    def decompress(self, sig) -> jax.Array:
        return sig["signs"]

    @property
    def wire_bits(self) -> int:
        return self.size  # 1 bit/coordinate


class ProbabilisticScalarCompressor(Compressor):
    """Min/max-range stochastic scalar quantizer used for HSQ/PVQ per-subvector
    norms (reference probabilistic_scalar_compressor.py:12-33).

    compress: lower=min(v), upper=max(v); scaled = |(v-lower)/(upper-lower)|*s;
    l = clamp(scaled, 0, s-1); stochastic round l += (scaled - l > U).
    Degenerate range (upper == lower) yields l = 0, which decompresses to
    ``lower`` exactly as the reference's early-out (its :15-16) does.
    decompress: l * (upper-lower)/s + lower.

    ``segment_sizes`` restores strict per-layer parity inside grouped
    compression units: the min/max range is computed per contiguous segment
    (= per original leaf) instead of over the whole group, exactly like the
    reference's one-compressor-per-layer setup (its ps_quantizer.py:15-20);
    the wire then carries 2 range scalars per segment, matching the
    reference's 2-per-tensor accounting.
    """

    stochastic = True

    def __init__(
        self,
        size: int,
        shape: Tuple[int, ...],
        n_bit: int,
        random: bool = True,
        segment_sizes: Optional[Tuple[int, ...]] = None,
    ):
        super().__init__(size, shape)
        self.n_bit = int(n_bit)
        self.s = 2 ** int(n_bit)
        self.random = bool(random)
        self.segment_sizes = tuple(segment_sizes) if segment_sizes else None
        if self.segment_sizes:
            assert sum(self.segment_sizes) == size, (self.segment_sizes, size)
            self.n_segments = len(self.segment_sizes)
        else:
            self.n_segments = 1

    def _bounds(self, vec):
        """(lower, upper) per segment, plus the per-element broadcasts.

        Segment boundaries are static (per-leaf sizes fixed at plan time), so
        the reduction is a static slice + min/max per segment — no
        scatter-based segment ops (slow on TPU) and the broadcast-back is a
        static repeat, all fusable by XLA."""
        if self.segment_sizes is None:
            lower, upper = jnp.min(vec), jnp.max(vec)
            return lower, upper, lower, upper
        los, ups, lo_parts, up_parts = [], [], [], []
        off = 0
        for n in self.segment_sizes:
            seg = jax.lax.slice_in_dim(vec, off, off + n, axis=0)
            lo, up = jnp.min(seg), jnp.max(seg)
            los.append(lo)
            ups.append(up)
            lo_parts.append(jnp.broadcast_to(lo, (n,)))
            up_parts.append(jnp.broadcast_to(up, (n,)))
            off += n
        lower = jnp.stack(los)
        upper = jnp.stack(ups)
        return lower, upper, jnp.concatenate(lo_parts), jnp.concatenate(up_parts)

    def compress(self, vec, key: Optional[jax.Array] = None) -> Sig:
        lower, upper, lo_e, up_e = self._bounds(vec)
        span = up_e - lo_e
        scaled = jnp.where(
            span == 0.0, 0.0, jnp.abs((vec - lo_e) / jnp.where(span == 0.0, 1.0, span)) * self.s
        )
        l = jnp.clip(scaled, 0, self.s - 1).astype(jnp.int32)
        if self.random:
            assert key is not None
            # norm-quantizer draw: on-chip PRNG pays off here (M = size/dim
            # values, consumed once; see stochastic_increment docstring)
            l = l + stochastic_increment(scaled, l, key, pallas_ok=True)
        return {"lower": lower, "upper": upper, "l": l}

    def _broadcast_segments(self, per_seg):
        return jnp.concatenate([
            jnp.broadcast_to(per_seg[i], (n,))
            for i, n in enumerate(self.segment_sizes)
        ])

    def decompress(self, sig) -> jax.Array:
        lower, upper = sig["lower"], sig["upper"]
        if self.segment_sizes is not None:
            lower = self._broadcast_segments(lower)
            upper = self._broadcast_segments(upper)
        span = upper - lower
        return sig["l"].astype(jnp.float32) * span / self.s + lower

    @property
    def wire_bits(self) -> int:
        return 2 * 32 * self.n_segments + self.n_bit * self.size


class TransposedScalarCompressor(ProbabilisticScalarCompressor):
    """ProbabilisticScalarCompressor over the HSQ kernels' transposed
    (B, s_pad) signature layout, where element (blk, s) is m-order subvector
    row ``s * B + blk`` (gqx.ops.pallas_hsq4.hsq_encode_flat transposed=True).

    Produces exactly the same per-segment (lower, upper) ranges and the same
    elementwise quantization as the m-order compressor on the same data —
    segment boundaries are static, so each m-order segment maps to a static
    run of full columns plus at most two partial boundary columns; nothing
    is ever transposed (the m-order<->transposed conversion of the compact
    signature was measured 8x off roofline, PERF.md round 3).  Only the
    stochastic-rounding uniforms are drawn in the transposed shape, which is
    distributional (not bitwise) parity with the m-order draw — the same
    class of freedom as the reference's unseeded torch.rand
    (qsgd_compressor.py:58).

    ``segment_sizes`` must cover the full padded grid (sum == b * s_pad,
    with the kernel tail pad as its own final segment) and every non-final
    segment must span at least one full column (size >= b) so no column is
    shared by three segments — true for every real leaf (>1000 elements,
    so >= 63 rows at dim 16 vs b = 8).
    """

    def __init__(
        self,
        b: int,
        s_pad: int,
        n_bit: int,
        random: bool = True,
        segment_sizes: Optional[Tuple[int, ...]] = None,
    ):
        super().__init__(b * s_pad, (b, s_pad), n_bit, random, segment_sizes)
        self.b, self.s_pad = int(b), int(s_pad)
        # segment_sizes is required: with no segments, a whole-grid min/max
        # would include the kernel tail pad's zeros and clamp real ranges
        # toward 0, diverging from the m-order compressor (ADVICE r3).  The
        # HSQ plan always makes the pad its own final segment.
        assert segment_sizes is not None, (
            "TransposedScalarCompressor requires segment_sizes (the kernel "
            "tail pad must be its own segment)")
        segs = self.segment_sizes
        assert all(n >= self.b for n in segs[:-1]), (
            "non-final norm segment smaller than one transposed column", segs)
        # static slicing plan: per segment, (row0, row1, col0, col1) parts
        plans = []
        off = 0
        for n in segs:
            end = off + n
            c0, r0 = divmod(off, self.b)
            c1, r1 = divmod(end, self.b)
            parts = []
            if c0 == c1:
                parts.append((r0, r1, c0, c0 + 1))
            else:
                if r0:
                    parts.append((r0, self.b, c0, c0 + 1))
                    c0 += 1
                if c1 > c0:
                    parts.append((0, self.b, c0, c1))
                if r1:
                    parts.append((0, r1, c1, c1 + 1))
            plans.append(tuple(parts))
            off = end
        assert off == self.size
        self._plans = tuple(plans)

    def _bounds(self, vec):
        los, ups = [], []
        for parts in self._plans:
            mn = mx = None
            for (ra, rb, ca, cb) in parts:
                sl = vec[ra:rb, ca:cb]
                smn, smx = jnp.min(sl), jnp.max(sl)
                mn = smn if mn is None else jnp.minimum(mn, smn)
                mx = smx if mx is None else jnp.maximum(mx, smx)
            los.append(mn)
            ups.append(mx)
        lower, upper = jnp.stack(los), jnp.stack(ups)
        return lower, upper, self._broadcast_segments(lower), \
            self._broadcast_segments(upper)

    def _broadcast_segments(self, per_seg):
        b = self.b
        iota_b = jnp.arange(b)[:, None]
        pieces, prev = [], None
        off = 0
        for i, n in enumerate(self.segment_sizes):
            cur = per_seg[i]
            end = off + n
            c0, r0 = divmod(off, b)
            c1, r1 = divmod(end, b)
            if r0:
                # boundary column shared with the previous segment
                pieces.append(jnp.where(iota_b < r0, prev, cur))
                c0 += 1
            if c1 > c0:
                pieces.append(jnp.broadcast_to(cur, (b, c1 - c0)))
            prev = cur
            off = end
        assert off % b == 0, "segments must close the padded grid"
        return jnp.concatenate(pieces, axis=1)


class QSGDCompressor(Compressor):
    """Bucketed stochastic scalar quantization (reference qsgd_compressor.py:42-71).

    Per bucket of ``dim`` coordinates: norm = max|v| (the L2 variant is
    commented out in the reference, its :48-49), normalize, scale by s=2^n_bit,
    floor+clamp to [0, s-1], stochastic round, keep signs (v > 0).
    decompress: l * (2*signs - 1) * norm / s.

    A zero bucket (norm = 0) produces NaN in the reference; we define 0/0 -> 0
    so all-zero gradients round-trip to zero.
    """

    stochastic = True

    def __init__(
        self,
        size: int,
        shape: Tuple[int, ...],
        n_bit: int,
        c_dim: int,
        random: bool = True,
    ):
        super().__init__(size, shape)
        self.n_bit = int(n_bit)
        self.s = 2 ** int(n_bit)
        self.random = bool(random)
        self.dim = subvector_dim(size, c_dim)
        self.M = size // self.dim

    def compress(self, vec, key: Optional[jax.Array] = None) -> Sig:
        rows = vec.reshape(-1, self.dim)
        # norm is a flat (M,) vector — a (M, 1) leaf would be lane-padded
        # 128x by the TPU tiled layout wherever XLA materializes it
        norm = jnp.max(jnp.abs(rows), axis=1)
        safe_norm = jnp.where(norm == 0.0, 1.0, norm)
        scaled = jnp.abs(rows / safe_norm[:, None]) * self.s
        l = jnp.clip(scaled, 0, self.s - 1).astype(jnp.int32)
        if self.random:
            assert key is not None
            l = l + stochastic_increment(scaled, l, key)
        signs = rows > 0
        return {
            "norm": norm,
            "signs": signs.reshape(self.shape),
            "l": l.reshape(self.shape),
        }

    def decompress(self, sig) -> jax.Array:
        signs = sig["signs"].astype(jnp.float32)
        scaled = sig["l"].astype(jnp.float32) * (2.0 * signs - 1.0)
        norm = sig["norm"].reshape(-1)  # accept legacy (M, 1) too
        out = scaled.reshape(-1, self.dim) * norm[:, None] / self.s
        return out.reshape(self.shape)

    @property
    def wire_bits(self) -> int:
        # 1 sign + n_bit level per coordinate + a 32-bit norm per bucket.
        return self.size * (1 + self.n_bit) + 32 * self.M
