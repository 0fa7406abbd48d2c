"""Second-generation fused HSQ kernels (Pallas TPU) — flat-layout encode and
fused decode(-mean) via a block-diagonal expanded codebook.

Why v2 (measured on real TPU, see scripts/sweep_tiles.py): the v1 kernels in
gqx.ops.pallas_hsq keep rows in ``(tile_m, dim)`` layout.  With dim=16 that
wastes 7/8 of the MXU contraction and — worse — lowers ``jnp.argmax`` over a
lane-dim of K plus several 1-D reshapes into slow Mosaic relayouts: ~80 ms to
encode 8x94 MB on one chip (~9 GB/s), nowhere near the HBM roofline.

v2 keeps the gradient in its NATURAL flat layout, viewed as (S, 128) where
each 128-lane row holds ``B = 128/dim`` subvectors, and hits the MXU with a
full-128 contraction against a block-diagonal "expanded" codebook

    E[j*dim + t, j*K + c] = codebook[c, t]        (128, B*K)

so ``p = X @ E`` computes all B blocks' inner products in one matmul with no
input relayout.  Code selection per K-block uses lane-tree reductions only
(max -> first-index min -> masked sum), never ``argmax``; outputs are (S, B)
blocks that flatten to exactly the (M,) subvector order.

Matmul precision: Mosaic supports only DEFAULT/HIGHEST dot precisions, and on
this hardware f32 x f32 at HIGHEST costs 6 MXU passes while DEFAULT on f32
operands is no faster (measured).  The kernels therefore do an explicit
3-pass bf16 split (``passes=3``, ~1e-7 relative error — fp32-equivalent for
gradient work): E is pre-split into hi/lo bf16 operands at init time, x is
split in-kernel, and  x@E ≈ xh@Eh + xh@El + xl@Eh  runs three native 1-pass
bf16 matmuls.  ``passes=1`` (xh@Eh only, ~0.4% error) is available for
speed; ``passes=6`` uses HIGHEST for exact-fp32 reference comparisons.

Decode contracts a scaled one-hot W (built per K-block with the same iota
compares) against E2 = the transposed expansion, again a single 128-wide MXU
matmul.  ``hsq_decode_mean`` additionally folds the server mean over a
``users`` axis (reference ps_quantizer.py:48) into the accumulation of W —
the expensive matmul + HBM write run ONCE for the aggregate instead of once
per user.

Math parity: encode reproduces reference nearest_neighbor_compressor.py:63-78
(argmax |p| with first-tie-wins, signed inner-product scale).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
DEFAULT_TILE_S = 1024      # sublane rows per tile: p/W tile = TILE_S*B*K*4 bytes
MAX_EXPANDED = 8192        # cap on B*K (VMEM for the expanded codebook / p tile)


def supports_flat(dim: int, k: int) -> bool:
    """The flat-layout kernels need whole subvectors per 128-lane row and a
    VMEM-resident expanded codebook."""
    return dim >= 1 and LANES % dim == 0 and (LANES // dim) * k <= MAX_EXPANDED


def expand_codebook(codebook: np.ndarray) -> np.ndarray:
    """(K, dim) -> block-diagonal (128, B*K) encode operand E."""
    k, dim = codebook.shape
    b = LANES // dim
    e = np.zeros((LANES, b * k), dtype=np.float32)
    for j in range(b):
        e[j * dim:(j + 1) * dim, j * k:(j + 1) * k] = codebook.T
    return e


def expand_codebook_t(codebook: np.ndarray) -> np.ndarray:
    """(K, dim) -> block-diagonal (B*K, 128) decode operand E2."""
    return expand_codebook(codebook).T.copy()


def split_hi_lo(a: np.ndarray):
    """f32 -> (hi, lo) bf16 pair with hi + lo ≈ a (~16 mantissa bits)."""
    import jax.numpy as _jnp

    hi = np.asarray(a, np.float32).astype(_jnp.bfloat16)
    lo = (np.asarray(a, np.float32) - np.asarray(hi, np.float32)).astype(_jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def bf16_exact_codebook(codebook: np.ndarray) -> np.ndarray:
    """Round codewords to bf16-representable f32 values.

    With a bf16-exact codebook, E's lo split is zero and the ``passes=2``
    matmul (xh@Eh + xl@Eh) is exact to fp32 — 2 MXU passes instead of 3/6.
    The ~0.4% perturbation of the (k-means-approximate) codewords is
    self-consistent: encode and decode use the same perturbed codebook, and
    u is the true signed inner product with the perturbed codeword."""
    import jax.numpy as _jnp

    return np.asarray(
        np.asarray(codebook, np.float32).astype(_jnp.bfloat16), np.float32
    )


def _split_dot(x, eh_ref, el_ref, passes):
    """x (f32) @ E via bf16 pass splitting; returns f32.

    passes=1: xh@Eh (~0.4% error).
    passes=2: xh@Eh + xl@Eh — exact-to-fp32 when E is bf16-representable
              (see bf16_exact_codebook).
    passes=3: + xh@El (error ~1e-5 relative for general f32 E).
    passes=6: fp32 HIGHEST (Mosaic 6-pass emulation) for reference checks.
    """
    dims = (((1,), (0,)), ((), ()))
    if passes >= 6:
        e = eh_ref[:].astype(jnp.float32) + el_ref[:].astype(jnp.float32)
        return jax.lax.dot_general(
            x, e, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def bdot(a, b_ref):
        return jax.lax.dot_general(
            a, b_ref[:], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    xh = x.astype(jnp.bfloat16)
    p = bdot(xh, eh_ref)
    if passes >= 2:
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        p = p + bdot(xl, eh_ref)
    if passes >= 3:
        p = p + bdot(xh, el_ref)
    return p


# --------------------------------------------------------------------------
# encode
# --------------------------------------------------------------------------

def _encode_kernel(x_ref, eh_ref, el_ref, u_ref, codes_ref, *, nblocks, k,
                   passes, chunk):
    """Full-width (rows, B*K) matmul + per-block lane-tree selection.  The
    ``chunk`` row loop keeps the product tile (chunk, B*K) small enough for
    the ~16 MB VMEM when the DMA block (tile_s) is larger.  (A column-walk
    variant — per-K-block matmuls — was measured 2x SLOWER: the MXU prefers
    one wide streaming contraction.)"""
    rows = x_ref.shape[0]
    for c in range(0, rows, chunk):
        p = _split_dot(x_ref[c:c + chunk, :], eh_ref, el_ref, passes)
        for j in range(nblocks):
            pj = p[:, j * k:(j + 1) * k]                 # static lane slice
            # signed value with max |.| via two tree-reductions (no abs pass,
            # no argmax lowering); on an exact +v/-v tie this picks +v, while
            # torch argmax(|p|) picks the first index — measure-zero deviation
            pos = jnp.max(pj, axis=1, keepdims=True)
            neg = jnp.min(pj, axis=1, keepdims=True)
            uj = jnp.where(pos >= -neg, pos, neg)
            iota = jax.lax.broadcasted_iota(jnp.int32, pj.shape, 1)
            # first index attaining that value (torch first-tie semantics)
            idx = jnp.min(jnp.where(pj == uj, iota, k), axis=1, keepdims=True)
            u_ref[c:c + chunk, j:j + 1] = uj
            codes_ref[c:c + chunk, j:j + 1] = idx


@functools.partial(
    jax.jit, static_argnames=("dim", "tile_s", "passes", "chunk", "interpret")
)
def hsq_encode_flat(
    flat: jax.Array,
    eh: jax.Array,
    el: jax.Array,
    dim: int,
    tile_s: int = DEFAULT_TILE_S,
    passes: int = 3,
    chunk: int = 256,
    interpret: bool = False,
):
    """flat: (size,) or (U, size) f32 gradient, size % dim == 0; eh/el: bf16
    hi/lo split of the expanded codebook (128, B*K).  Returns
    (u (..., M) f32, codes (..., M) i32), M = size // dim.

    A leading users axis is folded into the GRID (one pallas_call, grid
    U*num_tiles) — jax.vmap of a pallas_call lowers to an XLA while-loop with
    per-user dynamic-update-slices (measured ~8.5 ms of pure overhead per
    ResNet-50-unit encode x8 users on top of the 17 ms kernel)."""
    batched = flat.ndim == 2
    users = flat.shape[0] if batched else 1
    size = flat.shape[-1]
    m = size // dim
    b = LANES // dim
    k = eh.shape[1] // b
    s = -(-size // LANES)
    num_tiles = -(-s // tile_s)
    s_pad = num_tiles * tile_s
    if s_pad * LANES != size:
        widths = ((0, 0), (0, s_pad * LANES - size)) if batched else (
            (0, s_pad * LANES - size),)
        flat = jnp.pad(flat, widths)
    x = flat.reshape(users * s_pad, LANES)

    u, codes = pl.pallas_call(
        functools.partial(_encode_kernel, nblocks=b, k=k, passes=passes,
                          chunk=min(chunk, tile_s)),
        grid=(users * num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_s, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_s, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_s, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((users * s_pad, b), jnp.float32),
            jax.ShapeDtypeStruct((users * s_pad, b), jnp.int32),
        ],
        interpret=interpret,
    )(x, eh, el)
    # (s, B) flattens to subvector order: row s' holds subvectors s'*B..s'*B+B-1
    if batched:
        return (u.reshape(users, -1)[:, :m], codes.reshape(users, -1)[:, :m])
    return u.reshape(-1)[:m], codes.reshape(-1)[:m]


# --------------------------------------------------------------------------
# decode (per signature) and fused decode-mean (PS server reduce)
# --------------------------------------------------------------------------

def _scaled_onehot(codes, u, k):
    """(TS, B) codes/u -> (TS, B*K) W with W[:, j*K+c] = u[:,j]·[c==codes[:,j]]."""
    nblocks = codes.shape[1]
    parts = []
    for j in range(nblocks):
        iota = jax.lax.broadcasted_iota(jnp.int32, (codes.shape[0], k), 1)
        parts.append(
            jnp.where(iota == codes[:, j:j + 1], u[:, j:j + 1], 0.0)
        )
    return jnp.concatenate(parts, axis=1)


def _decode_kernel(codes_ref, u_ref, e2h_ref, e2l_ref, out_ref, *, k, passes,
                   chunk):
    rows = codes_ref.shape[0]
    for c in range(0, rows, chunk):
        w = _scaled_onehot(codes_ref[c:c + chunk, :], u_ref[c:c + chunk, :], k)
        out_ref[c:c + chunk, :] = _split_dot(w, e2h_ref, e2l_ref, passes)


def _decode_mean_kernel(
    codes_ref, u_ref, e2h_ref, e2l_ref, out_ref, *, k, users, passes, chunk
):
    """Fused server reduce: the scaled one-hots are accumulated across users
    in VMEM, then one matmul + HBM write run for the aggregate (reference
    ps_quantizer.py:48 does U decodes + a stack-mean)."""
    rows = codes_ref.shape[1]
    for c in range(0, rows, chunk):
        w = _scaled_onehot(codes_ref[0, c:c + chunk, :], u_ref[0, c:c + chunk, :], k)
        for uu in range(1, users):
            w = w + _scaled_onehot(
                codes_ref[uu, c:c + chunk, :], u_ref[uu, c:c + chunk, :], k
            )
        out_ref[c:c + chunk, :] = _split_dot(
            w * (1.0 / users), e2h_ref, e2l_ref, passes
        )


def _pad_sig(codes, u, dim, tile_s):
    """(…, M) codes/u -> (…, s_pad, B) blocks + geometry."""
    m = codes.shape[-1]
    b = LANES // dim
    s = -(-m // b)
    num_tiles = -(-s // tile_s)
    s_pad = num_tiles * tile_s
    pad = s_pad * b - m
    if pad:
        widths = [(0, 0)] * (codes.ndim - 1) + [(0, pad)]
        codes = jnp.pad(codes, widths)
        u = jnp.pad(u, widths)
    lead = codes.shape[:-1]
    return (
        codes.reshape(lead + (s_pad, b)),
        u.reshape(lead + (s_pad, b)),
        s_pad,
        num_tiles,
    )


@functools.partial(
    jax.jit, static_argnames=("dim", "tile_s", "passes", "chunk", "interpret")
)
def hsq_decode_flat(
    codes: jax.Array,
    u: jax.Array,
    e2h: jax.Array,
    e2l: jax.Array,
    dim: int,
    tile_s: int = DEFAULT_TILE_S,
    passes: int = 3,
    chunk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """codes (..., M) i32, u (..., M) f32, e2h/e2l bf16 (B*K, 128) ->
    flat (..., M*dim).  A leading users axis is folded into the grid
    (see hsq_encode_flat)."""
    batched = codes.ndim == 2
    users = codes.shape[0] if batched else 1
    m = codes.shape[-1]
    b = LANES // dim
    k = e2h.shape[0] // b
    codes_b, u_b, s_pad, num_tiles = _pad_sig(
        codes.astype(jnp.int32), u.astype(jnp.float32), dim, tile_s
    )
    codes_b = codes_b.reshape(users * s_pad, b)
    u_b = u_b.reshape(users * s_pad, b)
    out = pl.pallas_call(
        functools.partial(_decode_kernel, k=k, passes=passes,
                          chunk=min(chunk, tile_s)),
        grid=(users * num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_s, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_s, b), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * k, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * k, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_s, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((users * s_pad, LANES), jnp.float32),
        interpret=interpret,
    )(codes_b, u_b, e2h, e2l)
    if batched:
        return out.reshape(users, -1)[:, :m * dim]
    return out.reshape(-1)[:m * dim]


@functools.partial(
    jax.jit, static_argnames=("dim", "tile_s", "passes", "chunk", "interpret")
)
def hsq_decode_mean(
    codes: jax.Array,
    u: jax.Array,
    e2h: jax.Array,
    e2l: jax.Array,
    dim: int,
    tile_s: int = DEFAULT_TILE_S,
    passes: int = 3,
    chunk: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """codes (U, M) i32, u (U, M) f32 -> mean of the U decoded gradients,
    flat (M*dim,) f32.  The scaled one-hots are accumulated across users in
    VMEM so the matmul + HBM write run once (reference ps_quantizer.py:48
    does U decodes + a stack-mean)."""
    users, m = codes.shape
    b = LANES // dim
    k = e2h.shape[0] // b
    codes_b, u_b, s_pad, num_tiles = _pad_sig(
        codes.astype(jnp.int32), u.astype(jnp.float32), dim, tile_s
    )
    out = pl.pallas_call(
        functools.partial(_decode_mean_kernel, k=k, users=users, passes=passes,
                          chunk=min(chunk, tile_s)),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (users, tile_s, b), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (users, tile_s, b), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((b * k, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b * k, LANES), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_s, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s_pad, LANES), jnp.float32),
        interpret=interpret,
    )(codes_b, u_b, e2h, e2l)
    return out.reshape(-1)[:m * dim]
