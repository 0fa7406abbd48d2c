"""Sparsifying compressors: top-k and Maurey sampling.

Behavioral spec (math) from the reference:
  - TopKSparsificationCompressor —
        reference compressors/topk_sparsification_compressor.py:9-26
  - MaureySparsification — reference compressors/maurey_sparsification.py:4-50

TPU-first notes: unlike the reference (which keeps a dense masked tensor as
the "signature"), the signature here is the true sparse payload
(values + indices) so the packed wire format is physically real; decompress
scatters back to dense.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from gqx.compress.api import Compressor, Sig


class TopKCompressor(Compressor):
    """Keep the k = size // cr largest-|v| entries
    (reference topk_sparsification_compressor.py:15-16, default --cr 256)."""

    stochastic = False

    def __init__(self, size: int, shape: Tuple[int, ...], cr: int):
        super().__init__(size, shape)
        self.cr = int(cr)
        # Reference quirk (topk_sparsification_compressor.py:15): k is the
        # plain floor division, so a tensor smaller than cr gets k == 0 and
        # its gradient is dropped ENTIRELY (torch.topk(k=0) selects nothing).
        # We keep one slot on the wire (static shapes; empty arrays do not
        # pack) but zero its value, which decompresses to the same all-zeros
        # tensor.
        self.dropped = size // self.cr == 0
        self.k = max(1, size // self.cr)

    def compress(self, vec, key=None) -> Sig:
        flat = vec.reshape(-1)
        _, idx = jax.lax.top_k(jnp.abs(flat), self.k)
        values = flat[idx]
        if self.dropped:
            values = jnp.zeros_like(values)
        return {"values": values, "indices": idx.astype(jnp.int32)}

    def decompress(self, sig) -> jax.Array:
        out = jnp.zeros((self.size,), dtype=sig["values"].dtype)
        out = out.at[sig["indices"]].set(sig["values"])
        return out.reshape(self.shape)

    @property
    def wire_bits(self) -> int:
        return self.k * (32 + 32)  # fp32 value + int32 index per kept entry


class MaureySparsificationCompressor(Compressor):
    """Maurey-style sampling sparsifier (reference maurey_sparsification.py:4-50).

    Configuration (its :7-9): cr = 32*c_dim // (k_bit + n_bit); index width 16
    bits if size <= 65536 else 32; k = 32*size // ((idx_bits + 1) * cr),
    minimum 1.  compress: sample k i.i.d. indices ∝ |v|/||v||₁ (inverse-CDF
    with one uniform per sample — the reference's cumsum/argmax-over-comp/idx
    construction computes exactly the first index where cumsum >= r); keep
    signs of the sampled coordinates; scale = ||v||₁ / k.  decompress:
    scatter-add the signs (duplicate picks accumulate) and scale.
    """

    stochastic = True

    def __init__(
        self, size: int, shape: Tuple[int, ...], c_dim: int, k_bit: int, n_bit: int
    ):
        super().__init__(size, shape)
        self.cr = 32 * c_dim // (k_bit + n_bit)
        self.idx_bits = 32 if size > 65536 else 16
        self.k = max(1, 32 * size // ((self.idx_bits + 1) * self.cr))

    def compress(self, vec, key: Optional[jax.Array] = None) -> Sig:
        assert key is not None
        flat = vec.reshape(-1)
        l1 = jnp.sum(jnp.abs(flat))
        safe_l1 = jnp.where(l1 == 0.0, 1.0, l1)
        cdf = jnp.cumsum(jnp.abs(flat) / safe_l1)
        r = jax.random.uniform(key, (self.k,))
        codes = jnp.clip(jnp.searchsorted(cdf, r), 0, self.size - 1).astype(jnp.int32)
        # Reference-exact signs (maurey_sparsification.py:36 uses torch.sign):
        # a sampled zero coordinate — possible only via searchsorted boundary
        # clips (e.g. an all-zero vector) — keeps sign 0 and so decodes to 0.
        # The packed wire carries the sign as a 2-bit trit (gqx/ops/wire.py)
        # so the {-1, 0, +1} value roundtrips bit-exactly.
        signs = jnp.sign(flat[codes])
        return {"scale": l1 / self.k, "codes": codes, "signs": signs}

    def decompress(self, sig) -> jax.Array:
        out = jnp.zeros((self.size,), dtype=jnp.float32)
        out = out.at[sig["codes"]].add(sig["signs"])
        return (sig["scale"] * out).reshape(self.shape)

    @property
    def wire_bits(self) -> int:
        # 1 scale scalar + (idx + sign) per sample.
        return 32 + self.k * (self.idx_bits + 1)
