"""Per-user conv weight-gradient (dW) Pallas kernel.

The folded-users backward (gqx/models/folded.py) needs ONE weight gradient
per user — reference semantics: each simulated worker compresses its own
micro-batch gradient (reference main.py:221-230).  XLA lowers the vmapped
per-user conv vjp to batch_group_count=U grouped convolutions, measured
~10 ms/step over the shared-dW floor on the bench config (PERF.md round 4:
probe_dw 38.9 ms shipped vs 28.8 ms floor).  Per-user dW is the SAME FLOPs
as shared dW (it merely skips the final sum over users), so the penalty is
pure scheduling/layout — this kernel computes it directly:

    dW[u, kh, kw, ci, co] = sum_{b in user u, oh, ow}
        xpad[b, oh + kh, ow + kw, ci] * dy[b, oh, ow, co]

Design (see /opt/skills/guides/pallas_guide.md):
  - grid (U, Co/cot, B/bc): user-major, cout-tile, batch-chunk minor.  The
    output block is indexed by (u, cot) only, so consecutive minor steps
    revisit the same VMEM block — a standard reduction-grid accumulation
    (zeroed at the first batch chunk).
  - x and dy arrive as (U*nb, bc, ...) views; each grid step DMAs one
    (bc, Hp, Wp, Ci) x-chunk and (bc, OH, OW, cot) dy-chunk into VMEM.
    Batch chunking keeps the blocks inside VMEM for the C=64 wide-spatial
    stage-1 geometry (lane padding of C<128 doubles the footprint); cout
    tiling bounds the f32 accumulator for the C=512 stage (9*512*512*4 =
    9.4 MB untiled).
  - per (kh, kw): a shifted in-VMEM slice of x (free compared to the 9
    strided HBM reads of the XLA einsum formulation, which loses — PERF.md
    round 4) feeds one MXU contraction over (b, oh, ow) accumulated in f32.

Used for stride-1 KxK convs with K > 1 (the batch-group outliers); 1x1
convs already have an efficient batched-einsum form, and strided convs are
rare (one per stage; Mosaic has no strided vector slice) — both stay on
their existing paths.  Whole-model A/B vs bgc/einsum: scripts/probe_dw.py
(standalone per-geometry timing is swamped by this platform's ~1 ms
dispatch floor — PERF.md round 4 microbenching note).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_ref, dy_ref, out_ref, *, kh, kw, ph, pw, h, w):
    """Roll-and-mask formulation, zero relayouts.

    x arrives UNPADDED; both operands are viewed as (bc*H*W, C) — a free
    reshape (row-major collapse of sublane dims).  For tap (i, j) with
    offsets (di, dj) = (i - ph, j - pw), the padded-conv contraction

        dW[i,j] = sum_{b,oh,ow} xpad[b, oh+i, ow+j, :] (x) dy[b, oh, ow, :]

    equals a full-length matmul of ``roll(x2, -(di*W + dj))`` against
    ``dy2 * mask_ij``, where mask_ij zeroes dy rows whose (oh+di, ow+dj)
    leaves the [0,H)x[0,W) window: any collapsed row where the roll wraps
    across a w-row, an h-edge, or a batch boundary is by construction a
    masked row, so the wrapped garbage multiplies zero.  Every operand is
    contiguous — no sliced reshapes (the v1 sliced formulation lost 3 ms
    at whole-model scale to in-VMEM relayouts)."""
    bi = pl.program_id(2)
    x = x_ref[0]    # (bc, H, W, Ci)
    dy = dy_ref[0]  # (bc, H, W, cot)

    @pl.when(bi == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    bc = x.shape[0]
    ci = x.shape[-1]
    cot = dy.shape[-1]
    n = bc * h * w
    x2 = x.reshape(n, ci)
    dy2 = dy.reshape(n, cot)
    ids = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    oh_id = (ids // w) % h
    ow_id = ids % w
    for i in range(kh):
        for j in range(kw):
            di, dj = i - ph, j - pw
            valid = (
                (oh_id + di >= 0) & (oh_id + di < h)
                & (ow_id + dj >= 0) & (ow_id + dj < w)
            )
            dym = jnp.where(valid, dy2, jnp.zeros_like(dy2))
            # static circular shift (pltpu.roll lowers to dynamic_rotate,
            # which Mosaic rejects for 16-bit data): two static slices + concat
            s = (di * w + dj) % n
            xr = x2 if s == 0 else jax.lax.concatenate(
                [jax.lax.slice(x2, (s, 0), (n, ci)),
                 jax.lax.slice(x2, (0, 0), (s, ci))], 0)
            out_ref[0, i * kw + j] += jax.lax.dot_general(
                xr, dym,
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _pad128(c: int) -> int:
    return -(-c // 128) * 128


def _pick_tiles(b, h, w, ci, co, kh, kw, budget=6 << 20):
    """(batch_chunk, cout_tile) keeping double-buffered blocks + accumulator
    + kernel temporaries (rolled x + masked dy copies) under a conservative
    VMEM budget."""
    cot = co
    while 9 * ci * cot * 4 > (budget // 2) and cot > 128:
        cot //= 2
    bc = b
    while bc > 1:
        blocks = 2 * 2 * bc * h * w * (_pad128(ci) + _pad128(cot))
        temps = 2 * 2 * bc * h * w * (_pad128(ci) + _pad128(cot))
        if blocks + temps + kh * kw * ci * cot * 4 <= budget and b % bc == 0:
            break
        bc -= 1
    return bc, cot


@functools.partial(
    jax.jit,
    static_argnames=("users", "kh", "kw", "ph", "pw", "batch_chunk",
                     "cout_tile"),
)
def per_user_dw(x, dy, users: int, kh: int, kw: int, ph: int, pw: int,
                batch_chunk: int = 0, cout_tile: int = 0):
    """Per-user conv weight grads for stride-1 SAME-size convolutions.

    x (U*B, H, W, Ci) — UNPADDED input; dy (U*B, H, W, Co) — same spatial
    grid (OH == H required, i.e. kh == ph_lo + ph_hi + 1); ph/pw = low-side
    padding.  batch_chunk/cout_tile 0 = auto (VMEM-budget heuristic).
    Returns (U, kh, kw, Ci, Co) float32.
    """
    ub, h, w, ci = x.shape
    _, oh, ow, co = dy.shape
    assert (oh, ow) == (h, w), "roll-and-mask dW needs a same-size conv"
    b = ub // users
    auto_bc, auto_cot = _pick_tiles(b, h, w, ci, co, kh, kw)
    bc = batch_chunk or auto_bc
    cot = cout_tile or auto_cot
    while b % bc:
        bc -= 1
    nb = b // bc
    nc = -(-co // cot)
    assert co % cot == 0, (co, cot)

    x5 = x.reshape(users * nb, bc, h, w, ci)
    dy5 = dy.reshape(users * nb, bc, h, w, co)

    out = pl.pallas_call(
        functools.partial(_dw_kernel, kh=kh, kw=kw, ph=ph, pw=pw, h=h, w=w),
        grid=(users, nc, nb),
        in_specs=[
            pl.BlockSpec((1, bc, h, w, ci),
                         lambda u, c, i: (u * nb + i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bc, h, w, cot),
                         lambda u, c, i: (u * nb + i, 0, 0, 0, c),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kh * kw, ci, cot),
                               lambda u, c, i: (u, 0, 0, c),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((users, kh * kw, ci, co), jnp.float32),
    )(x5, dy5)
    return out.reshape(users, kh, kw, ci, co)
