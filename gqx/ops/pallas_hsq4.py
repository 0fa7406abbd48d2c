"""Fourth-generation HSQ kernels — vectorized selection / one-hot.

Same geometry, operand prep, grid, block specs, and signature layout as v3
(gqx.ops.pallas_hsq3); the only change is INSIDE the kernel bodies:

- v3 loops over the B codebook blocks in Python, emitting ~5 VPU passes per
  (K, tile) block and one (1, tile) row-store per block — 8 blocks x 8 users
  = 64 op groups + 16 narrow stores per grid step.
- v4 reshapes the transposed product (B*K, tile) -> (B, K, tile) (a free
  sublane-major split) and runs the selection — max / min / signed-pick /
  first-tie argmin — as single 3D ops reducing over axis 1, then stores the
  whole (B, tile) result once per user.  Decode builds the scaled one-hot
  (B, K, tile) with one compare+select instead of a per-block loop + concat.

Math is identical to v3 (argmax |p| first-tie-wins, signed inner-product
scale — reference nearest_neighbor_compressor.py:63-90); tests assert
bit-equality against v3 in interpret mode and the production path keeps
whichever generation measures faster (PERF.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gqx.ops.pallas_hsq2 import LANES
from gqx.ops.pallas_hsq3 import (  # shared geometry + transposed-layout prep
    DEFAULT_TILE_S,
    _dot_t,
    _dot_wt,
    _geometry,
    _sig_to_transposed,
)


def _select(p, iota3, nblocks, k, tile_s):
    """(B*K, tile) product -> (uj (B, tile) signed max-|.| value,
    idx (B, tile) first index attaining it)."""
    p3 = p.reshape(nblocks, k, tile_s)
    # signed value with max |.|; +v wins an exact +v/-v tie (measure-zero
    # deviation from torch argmax(|p|))
    pos = jnp.max(p3, axis=1)                             # (B, tile)
    neg = jnp.min(p3, axis=1)
    uj = jnp.where(pos >= -neg, pos, neg)
    # first index attaining the value (torch first-tie semantics)
    idx = jnp.min(jnp.where(p3 == uj[:, None, :], iota3, k), axis=1)
    return uj, idx


def _encode_kernel(x_ref, eh_ref, el_ref, u_ref, codes_ref, *, nblocks, k,
                   passes, pipeline=False):
    # x_ref block is (tile_s, users, LANES) — the users-interleaved view of
    # the packed 2D unit (see hsq_encode_flat): slicing user uu is a strided
    # VMEM read, and the HBM-side reshape becomes a tile-aware bitcast.
    users = x_ref.shape[1]
    tile_s = x_ref.shape[0]
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (nblocks, k, tile_s), 1)
    if not pipeline:
        for uu in range(users):
            p = _dot_t(eh_ref, el_ref, x_ref[:, uu, :], passes)  # (B*K, tile)
            uj, idx = _select(p, iota3, nblocks, k, tile_s)
            u_ref[uu] = uj
            codes_ref[uu] = idx
        return
    # software pipeline: issue user uu+1's MXU contraction before user uu's
    # VPU selection so the two units can overlap (probe; scripts/ab_kgen.py)
    p = _dot_t(eh_ref, el_ref, x_ref[:, 0, :], passes)
    for uu in range(users):
        p_cur, p = p, (
            _dot_t(eh_ref, el_ref, x_ref[:, uu + 1, :], passes)
            if uu + 1 < users else None
        )
        uj, idx = _select(p_cur, iota3, nblocks, k, tile_s)
        u_ref[uu] = uj
        codes_ref[uu] = idx


@functools.partial(
    jax.jit,
    static_argnames=("dim", "tile_s", "passes", "interpret", "pipeline",
                     "transposed"),
)
def hsq_encode_flat(
    flat: jax.Array,
    eh: jax.Array,
    el: jax.Array,
    dim: int,
    tile_s: int = DEFAULT_TILE_S,
    passes: int = 2,
    interpret: bool = False,
    pipeline: bool = False,
    transposed: bool = False,
):
    """Drop-in for pallas_hsq3.hsq_encode_flat (same layout contract).

    ``transposed=True`` returns the signature in the kernel's native
    (U, B, s_pad) layout, skipping the m-order conversion entirely — the
    conversion is ~6-7 ms/step on the bench unit (scripts/probe_dm.py,
    PERF.md round 3) vs a few-hundred-us HBM roofline, because XLA's
    (s_pad, B=8)->(B, s_pad) minor-dim transpose runs far off roofline.
    Transposed element (blk, s) holds subvector row m = s*B + blk."""
    batched = flat.ndim == 2
    if not batched:
        flat = flat[None]
    users, size = flat.shape
    m = size // dim
    b, num_tiles, s_pad = _geometry(size, dim, tile_s)
    k = eh.shape[1] // b
    if s_pad * LANES != size:
        flat = jnp.pad(flat, ((0, 0), (0, s_pad * LANES - size)))
    # (s_pad, users, LANES): for a (users, size) array in the TPU's T(8,128)
    # tiled layout the 8 users of each 128-lane group already sit in one
    # tile, so THIS transpose is a tile-aware bitcast (free) while the
    # per-user-planar (users, s_pad, LANES) reshape was a real re-layout
    # copy of the whole unit (753 MB -> 1.13 ms/step on the bench config,
    # trace fusion `copy_bitcast_fusion`, PERF.md round 4).
    x = jnp.transpose(flat.reshape(users, s_pad, LANES), (1, 0, 2))

    u_t, codes_t = pl.pallas_call(
        functools.partial(_encode_kernel, nblocks=b, k=k, passes=passes,
                          pipeline=pipeline),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_s, users, LANES), lambda i: (i, 0, 0),
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
    if transposed:
        assert batched, "transposed signature layout is batch-only"
        return u_t, codes_t
    u = jnp.swapaxes(u_t, 1, 2).reshape(users, -1)[:, :m]
    codes = jnp.swapaxes(codes_t, 1, 2).reshape(users, -1)[:, :m]
    if not batched:
        return u[0], codes[0]
    return u, codes


def _onehot3(codes_u, u_u, iota3):
    """codes/u (B, tile) -> scaled one-hot (B, K, tile)."""
    return jnp.where(
        iota3 == codes_u[:, None, :], u_u[:, None, :], 0.0
    )


def _decode_kernel(codes_ref, u_ref, eh_ref, el_ref, out_ref, *, nblocks, k,
                   passes):
    users = codes_ref.shape[0]
    tile_s = codes_ref.shape[2]
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (nblocks, k, tile_s), 1)
    for uu in range(users):
        w3 = _onehot3(codes_ref[uu], u_ref[uu], iota3)
        out_ref[uu] = _dot_wt(
            eh_ref, el_ref, w3.reshape(nblocks * k, tile_s), passes
        )


def _decode_mean_kernel(codes_ref, u_ref, eh_ref, el_ref, out_ref, *,
                        nblocks, k, users, passes):
    tile_s = codes_ref.shape[2]
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (nblocks, k, tile_s), 1)
    w3 = _onehot3(codes_ref[0], u_ref[0], iota3)
    for uu in range(1, users):
        w3 = w3 + _onehot3(codes_ref[uu], u_ref[uu], iota3)
    w_t = w3.reshape(nblocks * k, tile_s) * (1.0 / users)
    out_ref[:] = _dot_wt(eh_ref, el_ref, w_t, passes)


@functools.partial(
    jax.jit, static_argnames=("dim", "tile_s", "passes", "interpret",
                              "out_size")
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
    out_size: int | None = None,
) -> jax.Array:
    """Drop-in for pallas_hsq3.hsq_decode_flat.

    3-D codes/u = the transposed (U, B, s_pad) signature layout (see
    hsq_encode_flat transposed=True); ``out_size`` (elements per user) is
    then required to slice off the tail padding."""
    if codes.ndim == 3:
        users, b, s_pad = codes.shape
        assert out_size is not None and s_pad % tile_s == 0
        m = out_size // dim
        num_tiles = s_pad // tile_s
        k = eh.shape[1] // b
        codes_t = codes.astype(jnp.int32)
        u_t = u.astype(jnp.float32)
        batched = True
    else:
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
    jax.jit, static_argnames=("dim", "tile_s", "passes", "interpret",
                              "out_size")
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
    out_size: int | None = None,
) -> jax.Array:
    """Drop-in for pallas_hsq3.hsq_decode_mean.

    3-D codes/u = transposed (U, B, s_pad) signature layout; ``out_size``
    then slices the decoded flat gradient."""
    if codes.ndim == 3:
        users, b, s_pad = codes.shape
        assert out_size is not None and s_pad % tile_s == 0
        m = out_size // dim
        num_tiles = s_pad // tile_s
        k = eh.shape[1] // b
        codes_t = codes.astype(jnp.int32)
        u_t = u.astype(jnp.float32)
    else:
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
