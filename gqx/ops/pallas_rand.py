"""On-chip uniform PRNG for stochastic rounding (TPU Pallas).

The stochastic-rounding draw ``U(0,1)`` (reference qsgd_compressor.py:55-61,
probabilistic_scalar_compressor.py:20-26) is the only PRNG consumer on the
hot path.  ``jax.random.uniform`` lowers to a threefry2x32 elementwise pass
— measured 1.38 ms/step of device time on the bench config (PERF.md round
4) just to produce ~12M uniforms that are consumed once by a fused
compare.  This kernel generates the uniforms with the TPU's native PRNG
(`pltpu.prng_random_bits`) seeded from the caller's JAX key, which is
~10x cheaper: one seed + one vectorized bits->float convert per block,
no counter-mode hashing.

Determinism: the stream is a pure function of (key, block index), so a
fixed key still reproduces a training run bit-for-bit on TPU.  The values
differ from the threefry stream, which is *distributional* (not bitwise)
parity — the same class of freedom as the reference's unseeded
``torch.rand`` (its runs are not reproducible at all); the CPU/XLA path
keeps threefry so CPU tests and the sim-vs-mesh parity suite are
unaffected.  Kill switch: ``GQX_PALLAS_RAND=0``.

Bits->float: ``(bits >> 8) * 2^-24`` — the top 24 bits as a uniform on
[0, 1) with full float32 resolution in the comparison range.
"""

from __future__ import annotations

import functools
import math
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BR, _BC = 512, 128  # 64K elements per grid block


def _uniform_kernel(key_ref, out_ref):
    # Mosaic accepts at most 2 seed scalars: mix the block index into BOTH
    # words (distinct odd multipliers, int32 wraparound) so every grid block
    # draws an independent stream even when two caller keys share one word.
    i = pl.program_id(0)
    mixed0 = key_ref[0] ^ (i * jnp.int32(-1640531527))  # 2^32/phi
    mixed1 = key_ref[1] + (i + jnp.int32(1)) * jnp.int32(-1028477379)  # fnv-ish odd
    pltpu.prng_seed(mixed0, mixed1)
    bits = pltpu.prng_random_bits(out_ref.shape)
    # bits -> [0,1): take the top 24 bits (float32 mantissa width).  Mosaic
    # has no uint32->f32 cast, so shift in int32 (logical, so the result is
    # a non-negative 24-bit value) and convert from int32.
    i32 = jax.lax.bitcast_convert_type(bits, jnp.int32)
    top = jax.lax.shift_right_logical(i32, jnp.int32(8))
    out_ref[...] = top.astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))


def _raw_uniform(kd, shape) -> jax.Array:
    n = math.prod(shape)
    if n % _BC == 0:
        # exact-shape fast path: emit (n/_BC, _BC) directly — Pallas masks
        # the final partial row-block, and the row-major reshape to ``shape``
        # is free (same linear order).  The generic path below pads to a
        # whole grid and slices, which materializes a full copy of the
        # stream (~0.45 ms/step on the bench config).  The kept values are
        # identical to the generic path's (same per-block stream).
        rows = n // _BC
        tiles = -(-rows // _BR)
        out = pl.pallas_call(
            _uniform_kernel,
            grid=(tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
            out_specs=pl.BlockSpec((_BR, _BC), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, _BC), jnp.float32),
        )(kd)
        return out.reshape(shape)
    per = _BR * _BC
    tiles = max(1, -(-n // per))
    out = pl.pallas_call(
        _uniform_kernel,
        grid=(tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((_BR, _BC), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((tiles * _BR, _BC), jnp.float32),
    )(kd)
    return out.reshape(-1)[:n].reshape(shape)


@functools.lru_cache(maxsize=None)
def _uniform_fn(shape):
    """Per-shape uniform sampler with a custom vmap rule: a vmapped draw
    (e.g. per-user keys inside ``jax.vmap(norm.compress)``) collapses to ONE
    kernel call of shape (batch, *shape) seeded by a position-weighted fold
    of ALL mapped keys — distinct positions in one stream are i.i.d., so
    per-user independence is preserved, and the draw stays a deterministic
    function of the full key batch.  (jax.vmap of the raw pallas_call would
    try to block the SMEM key operand per batch element, which Mosaic
    rejects.)

    NOTE: batched-vs-single BITWISE equivalence is intentionally dropped on
    TPU — row i of a vmapped draw is not the same stream as a single draw
    with keys[i] (threefry preserved that; the hardware PRNG cannot, since
    one kernel call has one seed).  This is distributional-only parity, the
    same freedom class as the reference's unseeded torch.rand; asserted in
    tests/test_pallas_rand.py."""

    @jax.custom_batching.custom_vmap
    def f(kd):
        return _raw_uniform(kd, shape)

    @f.def_vmap
    def _rule(axis_size, in_batched, kd):  # noqa: ANN001
        (kb,) = in_batched
        if kb:
            # Fold every mapped key into the seed (position-weighted sum with
            # int32 wraparound) so the batched stream depends on all of them,
            # not just keys[0].
            # golden-ratio odd multiplier, written as its int32 two's-
            # complement value (2654435769 - 2^32): a positive literal
            # > 2^31-1 overflows jnp.int32 at trace time
            w = (jnp.arange(axis_size, dtype=jnp.int32) * jnp.int32(-1640531527)
                 + jnp.int32(1))
            kd = jnp.sum(kd.astype(jnp.int32) * w[:, None], axis=0,
                         dtype=jnp.int32)
        out = _raw_uniform(kd, (axis_size,) + shape)
        return out, True

    return f


def pallas_uniform(key, shape) -> jax.Array:
    """Uniform [0,1) float32 of ``shape``, from the TPU-native PRNG seeded
    by the JAX ``key`` (any typed key or raw (2,) uint32 key data)."""
    kd = jax.random.key_data(key) if jnp.issubdtype(key.dtype, jax.dtypes.prng_key) else key
    kd = kd.reshape(-1)[:2].astype(jnp.int32)
    return _uniform_fn(tuple(shape))(kd)


def use_pallas_rand() -> bool:
    """Kill switch for the on-chip PRNG.  Read at TRACE time: set
    ``GQX_PALLAS_RAND=0`` before the process's first compress call —
    flipping it later has no effect on already-jitted functions (their
    choice is baked into the compiled module)."""
    return (
        os.environ.get("GQX_PALLAS_RAND", "1") != "0"
        and jax.default_backend() == "tpu"
    )
