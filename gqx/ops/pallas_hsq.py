"""Fused HSQ encode kernel (Pallas TPU).

The HSQ encode hot path (reference nearest_neighbor_compressor.py:63-78,
SURVEY.md §3.3) is: p = rows @ codebookᵀ; codes = argmax |p|; u = p[codes].
In pure XLA the (M, K) inner-product matrix is materialized in HBM
(ResNet-50 at d=16, K=256: 1.6M x 256 fp32 = 1.6 GB of traffic per
compression).  This kernel tiles M, keeps the (TILE_M, K) products in VMEM,
and emits only codes + signed scales — HBM traffic drops to reading the
gradient once and writing M codes/scales, which is the speed-of-light for
this op.

The matmul runs on the MXU per tile; abs-argmax + masked signed-select run
on the VPU over the in-register products.

Layout notes (TPU tiling rules): outputs are emitted as (TILE_M/128, 128)
blocks of an (M_pad/128, 128) array — both block dims satisfy the (8, 128)
tiling constraint, and a leading vmap batch dim lowers to an extra Squeezed
grid dimension, so the kernel batches cleanly over a ``users`` axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_M = 1024
LANES = 128


def _encode_kernel(rows_ref, cbt_ref, u_ref, codes_ref):
    rows = rows_ref[:]                      # (TM, dim)
    cbt = cbt_ref[:]                        # (dim, K)
    p = jax.lax.dot_general(
        rows, cbt,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )                                       # (TM, K) — stays in VMEM
    absp = jnp.abs(p)
    codes = jnp.argmax(absp, axis=1).astype(jnp.int32)          # (TM,)
    col_ids = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
    u = jnp.sum(jnp.where(col_ids == codes[:, None], p, 0.0), axis=1)
    tm = u.shape[0]
    u_ref[:] = u.reshape(tm // LANES, LANES)
    codes_ref[:] = codes.reshape(tm // LANES, LANES)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def hsq_encode(rows: jax.Array, codewords: jax.Array, tile_m: int = DEFAULT_TILE_M,
               interpret: bool = False):
    """rows: (M, dim) f32; codewords: (K, dim) f32 -> (u (M,) f32, codes (M,) i32)."""
    m, dim = rows.shape
    k = codewords.shape[0]
    tm = min(tile_m, -(-m // LANES) * LANES)
    if not interpret and -(-m // tm) > 1 and (tm // LANES) % 8 != 0:
        # multi-tile outputs need sublane-aligned (8x128) blocks on real TPU
        tm = -(-tm // (8 * LANES)) * (8 * LANES)
    # pad rows to a tile multiple (padded rows produce garbage codes that are
    # sliced away below)
    num_tiles = -(-m // tm)
    m_pad = num_tiles * tm
    if m_pad != m:
        rows = jnp.pad(rows, ((0, m_pad - m), (0, 0)))

    sub = tm // LANES  # sublane rows per tile in the (M_pad/128, 128) layout
    u, codes = pl.pallas_call(
        _encode_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tm, dim), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((dim, k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_pad // LANES, LANES), jnp.float32),
            jax.ShapeDtypeStruct((m_pad // LANES, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(rows, codewords.T)
    return u.reshape(-1)[:m], codes.reshape(-1)[:m]


def hsq_decode_xla(codes: jax.Array, u: jax.Array, codewords: jax.Array) -> jax.Array:
    """Decode as a table gather + row scale.  (A one-hot @ codebook matmul
    would materialize an (M, K) operand in HBM — 1.5 GB for a grouped
    ResNet-50 unit — so gather is the memory-safe XLA fallback; the Pallas
    kernel below builds the one-hot per tile in VMEM instead.)"""
    rows = jnp.take(codewords, codes.astype(jnp.int32), axis=0)
    return rows * u[:, None]


def _decode_kernel(codes_ref, u_ref, cb_ref, out_ref):
    # Stay in the (sub, 128, ·) layout end-to-end: Mosaic rejects reshapes
    # that change the lane dimension (e.g. (8,128)->(1024,1)), so the one-hot
    # is built 3-D and contracted with a batched MXU matmul.
    codes = codes_ref[:]            # (sub, 128) i32
    u = u_ref[:]                    # (sub, 128) f32
    k = cb_ref.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, codes.shape + (k,), 2)
    onehot = jnp.where(col == codes[:, :, None], u[:, :, None], 0.0)  # VMEM only
    out_ref[:] = jax.lax.dot_general(
        onehot, cb_ref[:],
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST: default bf16 MXU passes would round u and the codewords
        # (~0.4% relative error); decode must match the fp32 gather exactly.
        precision=jax.lax.Precision.HIGHEST,
    )                               # (sub, 128, dim)


@functools.partial(jax.jit, static_argnames=("tile_m", "interpret"))
def hsq_decode(codes: jax.Array, u: jax.Array, codewords: jax.Array,
               tile_m: int = DEFAULT_TILE_M, interpret: bool = False) -> jax.Array:
    """codes (M,) int, u (M,) f32, codewords (K, dim) -> rows (M, dim).

    Per tile: build the scaled one-hot in VMEM and hit the MXU — no (M, K)
    HBM materialization, no gather."""
    m = codes.shape[0]
    k, dim = codewords.shape
    tm = min(tile_m, -(-m // LANES) * LANES)
    if not interpret and -(-m // tm) > 1 and (tm // LANES) % 8 != 0:
        tm = -(-tm // (8 * LANES)) * (8 * LANES)
    num_tiles = -(-m // tm)
    m_pad = num_tiles * tm
    if m_pad != m:
        codes = jnp.pad(codes, (0, m_pad - m))
        u = jnp.pad(u, (0, m_pad - m))

    sub = tm // LANES
    out = pl.pallas_call(
        _decode_kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((sub, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (sub, LANES, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_pad // LANES, LANES, dim), jnp.float32),
        interpret=interpret,
    )(
        codes.astype(jnp.int32).reshape(m_pad // LANES, LANES),
        u.astype(jnp.float32).reshape(m_pad // LANES, LANES),
        codewords,
    )
    return out.reshape(m_pad, dim)[:m]
