"""Third-generation fused HSQ kernels — users-in-block, transposed signature
layout.  Supersedes gqx.ops.pallas_hsq2 on TPU (v2 kept for comparison).

Two measured bottlenecks of the v2 kernels (scripts/probe_*.py, xprof traces
on the real chip, ResNet-50 grouped unit = 8 users x 94 MB):

1. **Grid-step overhead.** One grid step per (user, 128-row tile) = 11,480
   steps x ~1.2 us fixed cost = 13.4 ms pure-IO floor (vs a ~1.2 ms HBM
   roofline).  v3 makes the users axis a BLOCK dimension: each grid step
   loads all 8 users' tiles (512 KB DMA) and loops over users in-VMEM —
   1,435 steps, ~1.7 ms of overhead.

2. **Lane-padded signatures.** v2 emitted u/codes as (rows, B=8) arrays; the
   TPU tiles the minor dimension to 128 lanes, so every (rows, 8) tensor is
   16x larger physically than logically — the kernel wrote ~1.5 GB for
   ~94 MB of signature, and the consumer reshape cost another ~9.6 ms.  v3
   computes the product TRANSPOSED — p_t = E^T-contraction -> (B*K, tile) —
   so per-block selection reduces over SUBLANES and emits natural
   (1, tile)-row results into (users, B, s_pad) outputs whose minor dim is
   128-aligned.  The public API stays subvector-major ((U, M) "m-order");
   the layout conversion is a cheap XLA transpose of the compact ~6 MB/user
   signature, never of the 94 MB gradient.

The decode(-mean) kernels consume the transposed signature and emit the
gradient TRANSPOSED as (128, s_pad); one fused XLA transpose+reshape
restores flat m-order.  ``hsq_decode_mean`` folds the PS server mean
(reference ps_quantizer.py:48) into the one-hot accumulation exactly like
v2: the matmul + HBM write run once for the aggregate.

Precision model is inherited from v2 (see pallas_hsq2 module docstring):
bf16 hi/lo pass-splitting against a bf16-exact codebook; passes=2 is
fp32-exact, passes=6 uses fp32 HIGHEST for oracle comparisons.

Math parity: reference nearest_neighbor_compressor.py:63-78 (argmax |p|
first-tie-wins, signed inner-product scale); decode its :80-90.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gqx.ops.pallas_hsq2 import (  # shared operand prep
    LANES,
    MAX_EXPANDED,
    bf16_exact_codebook,
    expand_codebook,
    split_hi_lo,
    supports_flat,
)

DEFAULT_TILE_S = 128


def _dot_t(eh_ref, el_ref, x, passes):
    """Transposed product: contraction of E (128, B*K) dim 0 with x
    (rows, 128) dim 1 -> p_t (B*K, rows), bf16 pass-split like v2."""
    dims = (((0,), (1,)), ((), ()))
    if passes >= 6:
        e = eh_ref[:].astype(jnp.float32) + el_ref[:].astype(jnp.float32)
        return jax.lax.dot_general(
            e, x, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def bdot(e, a):
        return jax.lax.dot_general(
            e, a, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    xh = x.astype(jnp.bfloat16)
    p = bdot(eh_ref[:], xh)
    if passes >= 2:
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        p = p + bdot(eh_ref[:], xl)
    if passes >= 3:
        p = p + bdot(el_ref[:], xh)
    return p


def _encode_kernel(x_ref, eh_ref, el_ref, u_ref, codes_ref, *, nblocks, k,
                   passes):
    users = x_ref.shape[0]
    tile_s = x_ref.shape[1]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, tile_s), 0)
    for uu in range(users):
        p = _dot_t(eh_ref, el_ref, x_ref[uu], passes)     # (B*K, tile)
        for j in range(nblocks):
            pj = p[j * k:(j + 1) * k, :]                  # sublane slice
            # signed value with max |.| via two tree-reductions; +v wins an
            # exact +v/-v tie (measure-zero deviation from torch argmax(|p|))
            pos = jnp.max(pj, axis=0, keepdims=True)
            neg = jnp.min(pj, axis=0, keepdims=True)
            uj = jnp.where(pos >= -neg, pos, neg)         # (1, tile)
            # first index attaining the value (torch first-tie semantics)
            idx = jnp.min(jnp.where(pj == uj, iota, k), axis=0, keepdims=True)
            u_ref[uu, j:j + 1, :] = uj
            codes_ref[uu, j:j + 1, :] = idx


def _geometry(size_or_m_times_dim: int, dim: int, tile_s: int):
    size = size_or_m_times_dim
    b = LANES // dim
    s = -(-size // LANES)
    num_tiles = -(-s // tile_s)
    return b, num_tiles, num_tiles * tile_s


@functools.partial(
    jax.jit, static_argnames=("dim", "tile_s", "passes", "interpret")
)
def hsq_encode_flat(
    flat: jax.Array,
    eh: jax.Array,
    el: jax.Array,
    dim: int,
    tile_s: int = DEFAULT_TILE_S,
    passes: int = 2,
    interpret: bool = False,
):
    """flat (U, size) or (size,) f32, size % dim == 0 -> (u, codes) in
    subvector-major order ((U, M) / (M,), M = size // dim)."""
    batched = flat.ndim == 2
    if not batched:
        flat = flat[None]
    users, size = flat.shape
    m = size // dim
    b, num_tiles, s_pad = _geometry(size, dim, tile_s)
    k = eh.shape[1] // b
    if s_pad * LANES != size:
        flat = jnp.pad(flat, ((0, 0), (0, s_pad * LANES - size)))
    x = flat.reshape(users, s_pad, LANES)

    u_t, codes_t = pl.pallas_call(
        functools.partial(_encode_kernel, nblocks=b, k=k, passes=passes),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((users, tile_s, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((users, b, s_pad), jnp.float32),
            jax.ShapeDtypeStruct((users, b, s_pad), jnp.int32),
        ],
        interpret=interpret,
    )(x, eh, el)
    # transposed (b, s_pad) -> m-order (s * B + j); compact ~6 MB/user copy
    u = jnp.swapaxes(u_t, 1, 2).reshape(users, -1)[:, :m]
    codes = jnp.swapaxes(codes_t, 1, 2).reshape(users, -1)[:, :m]
    if not batched:
        return u[0], codes[0]
    return u, codes


# --------------------------------------------------------------------------
# decode (per user) and fused decode-mean (PS server reduce)
# --------------------------------------------------------------------------

def _wt_block(codes_row, u_row, iota):
    """(1, tile) codes/u -> (K, tile) scaled one-hot (transposed)."""
    return jnp.where(iota == codes_row, u_row, 0.0)


def _dot_wt(eh_ref, el_ref, w_t, passes):
    """out_t (128, tile) = E (128, B*K) @ W_t (B*K, tile), bf16 split on W."""
    dims = (((1,), (0,)), ((), ()))
    if passes >= 6:
        e = eh_ref[:].astype(jnp.float32) + el_ref[:].astype(jnp.float32)
        return jax.lax.dot_general(
            e, w_t, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def bdot(e, a):
        return jax.lax.dot_general(
            e, a, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    wh = w_t.astype(jnp.bfloat16)
    out = bdot(eh_ref[:], wh)
    if passes >= 2:
        wl = (w_t - wh.astype(jnp.float32)).astype(jnp.bfloat16)
        out = out + bdot(eh_ref[:], wl)
    if passes >= 3:
        out = out + bdot(el_ref[:], wh)
    return out


def _decode_kernel(codes_ref, u_ref, eh_ref, el_ref, out_ref, *, nblocks, k,
                   passes):
    users = codes_ref.shape[0]
    tile_s = codes_ref.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, tile_s), 0)
    for uu in range(users):
        w_t = jnp.concatenate([
            _wt_block(codes_ref[uu, j:j + 1, :], u_ref[uu, j:j + 1, :], iota)
            for j in range(nblocks)
        ], axis=0)                                        # (B*K, tile)
        out_ref[uu] = _dot_wt(eh_ref, el_ref, w_t, passes)


def _decode_mean_kernel(codes_ref, u_ref, eh_ref, el_ref, out_ref, *,
                        nblocks, k, users, passes):
    tile_s = codes_ref.shape[2]
    iota = jax.lax.broadcasted_iota(jnp.int32, (k, tile_s), 0)
    blocks = []
    for j in range(nblocks):
        wj = _wt_block(codes_ref[0, j:j + 1, :], u_ref[0, j:j + 1, :], iota)
        for uu in range(1, users):
            wj = wj + _wt_block(
                codes_ref[uu, j:j + 1, :], u_ref[uu, j:j + 1, :], iota
            )
        blocks.append(wj)
    w_t = jnp.concatenate(blocks, axis=0) * (1.0 / users)
    out_ref[:] = _dot_wt(eh_ref, el_ref, w_t, passes)


def _sig_to_transposed(codes, u, b, s_pad):
    """m-order (U, M) -> transposed (U, B, s_pad) (compact XLA copy)."""
    users, m = codes.shape
    pad = s_pad * b - m
    if pad:
        codes = jnp.pad(codes, ((0, 0), (0, pad)))
        u = jnp.pad(u, ((0, 0), (0, pad)))
    codes_t = jnp.swapaxes(codes.reshape(users, s_pad, b), 1, 2)
    u_t = jnp.swapaxes(u.reshape(users, s_pad, b), 1, 2)
    return codes_t, u_t


@functools.partial(
    jax.jit, static_argnames=("dim", "tile_s", "passes", "interpret")
)
def hsq_decode_flat(
    codes: jax.Array,
    u: jax.Array,
    eh: jax.Array,
    el: jax.Array,
    dim: int,
    tile_s: int = DEFAULT_TILE_S,
    passes: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """codes/u (U, M) or (M,) m-order -> decoded flat (U, M*dim) / (M*dim,).

    NB: operands are the ENCODE expansion eh/el (128, B*K) — the decode
    contraction uses E itself, not its transpose."""
    batched = codes.ndim == 2
    if not batched:
        codes, u = codes[None], u[None]
    users, m = codes.shape
    b, num_tiles, s_pad = _geometry(m * dim, dim, tile_s)
    k = eh.shape[1] // b
    codes_t, u_t = _sig_to_transposed(
        codes.astype(jnp.int32), u.astype(jnp.float32), b, s_pad
    )
    out_t = pl.pallas_call(
        functools.partial(_decode_kernel, nblocks=b, k=k, passes=passes),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((users, LANES, tile_s), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((users, LANES, s_pad), jnp.float32),
        interpret=interpret,
    )(codes_t, u_t, eh, el)
    out = jnp.swapaxes(out_t, 1, 2).reshape(users, -1)[:, :m * dim]
    return out if batched else out[0]


@functools.partial(
    jax.jit, static_argnames=("dim", "tile_s", "passes", "interpret")
)
def hsq_decode_mean(
    codes: jax.Array,
    u: jax.Array,
    eh: jax.Array,
    el: jax.Array,
    dim: int,
    tile_s: int = DEFAULT_TILE_S,
    passes: int = 2,
    interpret: bool = False,
) -> jax.Array:
    """codes/u (U, M) m-order -> mean of the U decoded gradients, (M*dim,)."""
    users, m = codes.shape
    b, num_tiles, s_pad = _geometry(m * dim, dim, tile_s)
    k = eh.shape[1] // b
    codes_t, u_t = _sig_to_transposed(
        codes.astype(jnp.int32), u.astype(jnp.float32), b, s_pad
    )
    out_t = pl.pallas_call(
        functools.partial(_decode_mean_kernel, nblocks=b, k=k, users=users,
                          passes=passes),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, tile_s), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LANES, s_pad), jnp.float32),
        interpret=interpret,
    )(codes_t, u_t, eh, el)
    return jnp.swapaxes(out_t, 0, 1).reshape(-1)[:m * dim]
