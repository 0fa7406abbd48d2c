"""Compressor protocol.

Design (TPU-first, not a port): a compressor is an object whose *configuration*
(bucket dim, codebook, bit widths) is static Python data fixed at construction
time, and whose ``compress``/``decompress`` methods are pure jittable /
vmappable functions over jax arrays.  Randomness is explicit: ``compress``
takes a ``jax.random`` key (may be ``None`` for deterministic compressors).

Signatures ("sig") are dicts of arrays with static shapes, so they vmap over a
``users`` axis and cross ``shard_map`` boundaries unchanged.  The *packed*
wire format (real bits-on-wire, unlike the reference's logical-only
accounting — reference qsgd_compressor.py:39,63 ships bool/int32 tensors) is
provided by ``pack``/``unpack`` via gqx.ops.pack.

Reference interface being re-designed: ``Compressor(size, shape, args)`` with
``.compress(vec) -> signature`` / ``.decompress(signature) -> tensor``
(reference compressors/*.py, surveyed in SURVEY.md §2.5).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

Sig = Dict[str, Any]


class Compressor:
    """Base class: identity behavior, subclasses override."""

    #: True if ``compress`` consumes a PRNG key.
    stochastic: bool = False

    def __init__(self, size: int, shape: Tuple[int, ...]):
        self.size = int(size)
        self.shape = tuple(shape)

    # -- core API -----------------------------------------------------------
    def compress(self, vec: jax.Array, key: Optional[jax.Array] = None) -> Sig:
        raise NotImplementedError

    def decompress(self, sig: Sig) -> jax.Array:
        raise NotImplementedError

    def roundtrip(self, vec: jax.Array, key: Optional[jax.Array] = None) -> jax.Array:
        """compress → decompress (the value the aggregators actually use)."""
        return self.decompress(self.compress(vec, key))

    def decode_mean(self, sig: Sig) -> jax.Array:
        """Decode a stacked batch of signatures (leading ``users`` axis on
        every leaf) and return the mean decompressed tensor — the PS server
        reduce (reference ps_quantizer.py:48).  Subclasses may fuse this
        (HSQ decodes ONCE via an accumulated one-hot instead of per-user)."""
        return jnp.mean(self.decompress_batch(sig), axis=0)

    # -- batched (stacked-users) API -----------------------------------------
    # Subclasses with Pallas kernels override these to fold the users axis
    # into the kernel grid: jax.vmap of a pallas_call lowers to an XLA
    # while-loop with per-user dynamic-update-slices (measured ~8.5 ms pure
    # overhead per ResNet-50-unit encode x8 users).
    def compress_batch(self, vecs: jax.Array, keys) -> Sig:
        """vecs (U, *shape) -> signature with a leading U axis per leaf."""
        if self.stochastic:
            return jax.vmap(self.compress)(vecs, keys)
        return jax.vmap(lambda v: self.compress(v))(vecs)

    def decompress_batch(self, sig: Sig) -> jax.Array:
        """Signature with a leading U axis -> (U, *shape)."""
        return jax.vmap(self.decompress)(sig)

    def roundtrip_batch(self, vecs: jax.Array, keys) -> jax.Array:
        return self.decompress_batch(self.compress_batch(vecs, keys))

    def compress_batch_m(self, vecs: jax.Array, keys) -> Sig:
        """Like :meth:`compress_batch` but guaranteed to emit the canonical
        m-order signature layout (leaf shapes = one user's ``compress``
        output with a leading U axis) even when a subclass's batched fast
        path would otherwise use a kernel-native layout.  The packed wire
        format (gqx.ops.wire) is defined over m-order signatures, so
        cross-device payloads always use this entry point."""
        return self.compress_batch(vecs, keys)

    # -- wire accounting ----------------------------------------------------
    @property
    def wire_bits(self) -> int:
        """Logical payload size in bits for one tensor (SURVEY.md §6 table)."""
        raise NotImplementedError

    def pack(self, sig: Sig) -> Sig:
        """Bit-pack a signature into uint32 words (override where supported)."""
        return sig

    def unpack(self, wire: Sig) -> Sig:
        return wire


def subvector_dim(size: int, c_dim: int, max_tries: int = 10) -> int:
    """The reference's bucket-dimension fixup (reference qsgd_compressor.py:16-22
    and nearest_neighbor_compressor.py:23-34).

    If ``c_dim`` is 0 or larger than the tensor, the whole tensor is one
    bucket.  Otherwise repeatedly apply ``dim = dim // 2 * 3`` (up to 10
    times) until ``size % dim == 0``.
    """
    if c_dim == 0 or size < c_dim:
        return size
    dim = c_dim
    for _ in range(max_tries):
        if size % dim != 0:
            dim = dim // 2 * 3
    if size % dim != 0:
        raise ValueError(f"not divisible: size {size} c_dim {c_dim} dim {dim}")
    return dim


def flatten_rows(vec: jax.Array, dim: int) -> jax.Array:
    """View a tensor as (M, dim) rows of subvectors."""
    return vec.reshape(-1, dim)


def stochastic_increment(
    scaled: jax.Array, floored: jax.Array, key: jax.Array,
    pallas_ok: bool = False,
) -> jax.Array:
    """l += (scaled - l > U(0,1)) — the reference's stochastic rounding
    (reference qsgd_compressor.py:55-61).  Returns int32 increments.

    With ``pallas_ok`` (the VQ-family norm quantizer sets it) the TPU
    uniforms come from the on-chip Pallas PRNG (gqx.ops.pallas_rand)
    instead of a threefry pass — distributional parity, 1.38 -> 0.04
    ms/step on the bench config (PERF.md round 4).  QSGD/TernGrad keep
    threefry even on TPU: their full-gradient-sized draw is fused inline
    into the quantize loop by XLA, so a separate kernel + materialized
    uniforms LOSES there (qsgd measured 19.4 -> 18.2 steps/s).  CPU/XLA
    always keeps threefry (bitwise-stable for the sim-vs-mesh suite)."""
    probabilities = scaled - floored.astype(scaled.dtype)
    n = 1
    for d in floored.shape:
        n *= int(d)
    if pallas_ok and scaled.dtype == jnp.float32 and n >= 65536:
        from gqx.ops.pallas_rand import pallas_uniform, use_pallas_rand

        if use_pallas_rand():
            r = pallas_uniform(key, tuple(floored.shape))
            return (probabilities > r).astype(jnp.int32)
    r = jax.random.uniform(key, floored.shape, dtype=scaled.dtype)
    return (probabilities > r).astype(jnp.int32)


def code_dtype(k_bit: int):
    """uint8 codes for k_bit <= 8 else int32 (reference
    nearest_neighbor_compressor.py:57)."""
    return jnp.uint8 if k_bit <= 8 else jnp.int32


def logical_bits_per_coord(name: str, *, dim: int, k_bit: int, n_bit: int, cr: int) -> float:
    """Logical bits/coordinate for the SURVEY.md §6 table (for reporting)."""
    if name == "sgd":
        return 32.0
    if name == "sign":
        return 1.0
    if name == "qsgd":
        return 1.0 + n_bit + 32.0 / dim
    if name in ("hsq", "pvq"):
        return (k_bit + n_bit) / dim
    if name == "residual":
        return 2.0 * (k_bit + n_bit) / dim
    if name == "topk":
        return 64.0 / cr
    if name == "maurey":
        raise ValueError("maurey bits depend on tensor size; use compressor.wire_bits")
    raise ValueError(name)
