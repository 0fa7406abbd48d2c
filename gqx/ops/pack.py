"""Bit-packing: the real wire format.

The reference never packs anything — its "compressed" signatures are bool /
int32 tensors (reference qsgd_compressor.py:39,63,
nearest_neighbor_compressor.py:57), so its compression ratios are logical
only (SURVEY.md §2.5).  Here every signature can be packed into uint32 words
so bytes-on-wire is physically real and collectives ship packed payloads.

Two packers:
  - ``pack_aligned`` / ``unpack_aligned``: b ∈ {1,2,4,8,16} bits — a lane
    reshape + shift-or, no bit blowup (TPU-friendly).
  - ``pack_bits`` / ``unpack_bits``: any b (e.g. 6-bit norms) via bitstream
    expansion.
All functions are jittable with static shapes.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

WORD = 32


def _ceil_div(a: int, b: int) -> int:
    return -(-a // b)


def packed_words(n_values: int, bits: int) -> int:
    """Number of uint32 words needed for n_values of `bits` bits."""
    return _ceil_div(n_values * bits, WORD)


def pack_aligned(values: jax.Array, bits: int) -> jax.Array:
    """Pack (N,) unsigned ints of `bits` ∈ {1,2,4,8,16,32} into uint32 words."""
    assert WORD % bits == 0, bits
    per_word = WORD // bits
    n = values.shape[0]
    n_words = _ceil_div(n, per_word)
    v = values.astype(jnp.uint32) & jnp.uint32((1 << bits) - 1)
    pad = n_words * per_word - n
    if pad:
        v = jnp.pad(v, (0, pad))
    lanes = v.reshape(n_words, per_word)
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits)[None, :]
    return jnp.sum(lanes << shifts, axis=1, dtype=jnp.uint32)


def unpack_aligned(words: jax.Array, bits: int, n: int) -> jax.Array:
    assert WORD % bits == 0, bits
    per_word = WORD // bits
    shifts = (jnp.arange(per_word, dtype=jnp.uint32) * bits)[None, :]
    lanes = (words[:, None] >> shifts) & jnp.uint32((1 << bits) - 1)
    return lanes.reshape(-1)[:n]


def _period(bits: int) -> Tuple[int, int]:
    """(values, words) per bitstream period: lcm(bits, 32) stream bits."""
    g = math.gcd(bits, WORD)
    return WORD // g, bits // g


def pack_bits(values: jax.Array, bits: int) -> jax.Array:
    """Pack (N,) unsigned ints of arbitrary `bits` into a uint32 bitstream
    (little-endian: value i occupies stream bits [i*bits, (i+1)*bits)).

    Periodic formulation: every lcm(bits, 32) stream bits hold exactly
    ``vpp = 32/gcd`` values in ``wpp = bits/gcd`` words with a static
    value->(word, offset) map, so each output word is an OR of ~32/bits + 1
    shifted value columns — ~1.2 vector ops per value.  The previous
    bit-by-bit expansion materialized a 32x (n, bits) intermediate, which
    dominated the packed-wire mesh step on TPU (PERF.md round 4: +53 ms)."""
    n = values.shape[0]
    vpp, wpp = _period(bits)
    n_words = _ceil_div(n * bits, WORD)
    p = _ceil_div(n, vpp)
    mask = jnp.uint32((1 << bits) - 1) if bits < 32 else jnp.uint32(0xFFFFFFFF)
    v = values.astype(jnp.uint32) & mask
    pad = p * vpp - n
    if pad:
        v = jnp.pad(v, (0, pad))
    cols = v.reshape(p, vpp)
    words = []
    for k in range(wpp):
        acc = None
        for i in range(vpp):
            w0, off = divmod(i * bits, WORD)
            if w0 == k:
                term = cols[:, i] << jnp.uint32(off) if off else cols[:, i]
            elif w0 + 1 == k and off + bits > WORD:
                term = cols[:, i] >> jnp.uint32(WORD - off)
            else:
                continue
            acc = term if acc is None else acc | term
        words.append(acc)
    out = jnp.stack(words, axis=1).reshape(-1)
    return out[:n_words]


def unpack_bits(words: jax.Array, bits: int, n: int) -> jax.Array:
    """Inverse of :func:`pack_bits` (same periodic formulation: each value is
    rebuilt from at most two static word columns)."""
    vpp, wpp = _period(bits)
    p = _ceil_div(n, vpp)
    need = p * wpp
    if words.shape[0] < need:
        words = jnp.pad(words, (0, need - words.shape[0]))
    w = words[:need].reshape(p, wpp)
    mask = jnp.uint32((1 << bits) - 1) if bits < 32 else jnp.uint32(0xFFFFFFFF)
    vals = []
    for i in range(vpp):
        w0, off = divmod(i * bits, WORD)
        x = w[:, w0] >> jnp.uint32(off) if off else w[:, w0]
        if off + bits > WORD:
            x = x | (w[:, w0 + 1] << jnp.uint32(WORD - off))
        vals.append(x & mask)
    return jnp.stack(vals, axis=1).reshape(-1)[:n]


def pack_uint(values: jax.Array, bits: int) -> jax.Array:
    if bits == 32:
        return values.astype(jnp.uint32)
    if WORD % bits == 0:
        return pack_aligned(values, bits)
    return pack_bits(values, bits)


def unpack_uint(words: jax.Array, bits: int, n: int) -> jax.Array:
    if bits == 32:
        return words[:n]
    if WORD % bits == 0:
        return unpack_aligned(words, bits, n)
    return unpack_bits(words, bits, n)


def f32_to_words(x: jax.Array) -> jax.Array:
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint32).reshape(-1)


def words_to_f32(w: jax.Array, shape: Tuple[int, ...]) -> jax.Array:
    return jax.lax.bitcast_convert_type(w, jnp.float32).reshape(shape)
