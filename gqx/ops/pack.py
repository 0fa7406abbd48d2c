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


def pack_bits(values: jax.Array, bits: int) -> jax.Array:
    """Pack (N,) unsigned ints of arbitrary `bits` into a uint32 bitstream."""
    n = values.shape[0]
    v = values.astype(jnp.uint32)
    bit_idx = jnp.arange(bits, dtype=jnp.uint32)[None, :]
    bitstream = ((v[:, None] >> bit_idx) & 1).reshape(-1)  # (n*bits,)
    n_words = _ceil_div(n * bits, WORD)
    pad = n_words * WORD - n * bits
    if pad:
        bitstream = jnp.pad(bitstream, (0, pad))
    lanes = bitstream.reshape(n_words, WORD)
    shifts = jnp.arange(WORD, dtype=jnp.uint32)[None, :]
    return jnp.sum(lanes << shifts, axis=1, dtype=jnp.uint32)


def unpack_bits(words: jax.Array, bits: int, n: int) -> jax.Array:
    shifts = jnp.arange(WORD, dtype=jnp.uint32)[None, :]
    bitstream = ((words[:, None] >> shifts) & 1).reshape(-1)[: n * bits]
    lanes = bitstream.reshape(n, bits)
    bit_idx = jnp.arange(bits, dtype=jnp.uint32)[None, :]
    return jnp.sum(lanes << bit_idx, axis=1, dtype=jnp.uint32)


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
