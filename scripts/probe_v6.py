"""Round-3 encode/decode probes: does a bf16 selection domain buy the 2x
VPU packing Mosaic supports for 16-bit vregs?

PERF.md round-3 established that with f32 selection math the encode floor is
~24 ms (DMA + 2-pass MXU + ~4-5 full-domain VPU passes, strictly serialized)
and that restructurings (stacked contraction, 2D grid, software pipeline,
key-packed selection) are all flat because the full-domain VPU pass count
does not change.  The remaining lever is making each pass cheaper: Mosaic
packs 16-bit types two-per-lane (vreg = (16, 128) for bf16/i16), so a
selection tree over a bf16 product and an i16 iota should halve VPU time.

Variants (all v4 grid/layout; small-case checked against v4 exact):

  A   v4 baseline (f32 p, 2-pass split, f32 selection)       [exact]
  G2  stacked contraction E2=[Eh;Eh], x2=[xh|xl] -> ONE MXU pass chain
      accumulating in f32 INSIDE the MXU, output bf16; selection trees in
      bf16, index math in i16                                 [p rounded bf16]
  G1  G2 with passes=1 (xh only, 128-deep contraction)        [+x rounded bf16]
  H   decode-mean with the scaled one-hot built/accumulated in bf16
      (vs f32 production decode-mean)                         [onehot bf16]

u is emitted f32 (upcast at the (B, tile) store — small domain); codes are
computed in i16 and widened at the store.  Both G variants deviate from the
reference math only through bf16 rounding of the inner products: argmax
ties within 2^-8 relative may resolve differently and u carries <=0.4%
relative rounding — vs the 6-bit norm quantizer's ~1.6%-of-range buckets.
Production adoption is gated on the convergence-parity study
(scripts/parity_study.py), like hsq_passes/folded before it.

Usage: python scripts/probe_v6.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from gqx.codebooks import get_codebook
from gqx.ops import pallas_hsq2 as hsq2
from gqx.ops import pallas_hsq4 as v4
from gqx.ops.pallas_hsq3 import _geometry, _sig_to_transposed
from gqx.utils.timing import timeit

LANES = 128


# ---------------------------------------------------------------------------
# encode: bf16 selection domain
# ---------------------------------------------------------------------------

def _dot_bf16(e_ref, x, passes):
    """E (C, B*K) contracted with x (tile, C) -> p (B*K, tile) in bf16.

    passes=2: C = 256, E2 = [Eh; Eh], x2 = [xh | xl] — the two bf16 passes
    accumulate in the MXU's f32 accumulator and round to bf16 ONCE at output.
    passes=1: C = 128, E = Eh, x = xh.
    """
    if passes >= 2:
        xh = x.astype(jnp.bfloat16)
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        x2 = jnp.concatenate([xh, xl], axis=1)
    else:
        x2 = x.astype(jnp.bfloat16)
    # Mosaic requires a 32-bit matmul accumulator; round to bf16 at output
    # (one convert pass over the product domain).
    return jax.lax.dot_general(
        e_ref[:], x2, dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    ).astype(jnp.bfloat16)


def _select_bf16(p, iota3_bf, nblocks, k, tile_s):
    """(B*K, tile) bf16 product -> (uj f32, idx i32), every pass bf16.

    Mosaic has no int16 reductions and mixing a bf16 compare mask into an
    i32 select forces an illegal relayout (probe findings) — but for
    k <= 256 every index is exactly representable in bf16, so the index
    min-tree runs in bf16 too and the whole selection stays 16-bit packed.
    """
    p3 = p.reshape(nblocks, k, tile_s)
    pos = jnp.max(p3, axis=1)                       # bf16 tree
    neg = jnp.min(p3, axis=1)                       # bf16 tree
    uj = jnp.where(pos >= -neg, pos, neg)           # (B, tile) bf16
    idx_bf = jnp.min(
        jnp.where(p3 == uj[:, None, :], iota3_bf, jnp.bfloat16(k)), axis=1
    )                                               # bf16 compare + tree
    return uj.astype(jnp.float32), idx_bf.astype(jnp.int32)


def _enc_kernel_g(x_ref, e_ref, u_ref, codes_ref, *, nblocks, k, passes):
    users, tile_s = x_ref.shape[0], x_ref.shape[1]
    iota3_bf = jax.lax.broadcasted_iota(
        jnp.int32, (nblocks, k, tile_s), 1).astype(jnp.bfloat16)
    for uu in range(users):
        p = _dot_bf16(e_ref, x_ref[uu], passes)
        uj, idx = _select_bf16(p, iota3_bf, nblocks, k, tile_s)
        u_ref[uu] = uj
        codes_ref[uu] = idx


def encode_g(flat, e2, dim, k, tile_s, passes=2, interpret=False):
    users, size = flat.shape
    m = size // dim
    b, num_tiles, s_pad = _geometry(size, dim, tile_s)
    if s_pad * LANES != size:
        flat = jnp.pad(flat, ((0, 0), (0, s_pad * LANES - size)))
    x = flat.reshape(users, s_pad, LANES)
    c = e2.shape[0]
    u_t, codes_t = pl.pallas_call(
        functools.partial(_enc_kernel_g, nblocks=b, k=k, passes=passes),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((users, tile_s, LANES), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c, b * k), lambda i: (0, 0),
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
    )(x, e2)
    u = jnp.swapaxes(u_t, 1, 2).reshape(users, -1)[:, :m]
    codes = jnp.swapaxes(codes_t, 1, 2).reshape(users, -1)[:, :m]
    return u, codes


# ---------------------------------------------------------------------------
# decode-mean: bf16 one-hot
# ---------------------------------------------------------------------------

def _decode_mean_kernel_h(codes_ref, u_ref, eh_ref, out_ref, *, nblocks, k,
                          users):
    tile_s = codes_ref.shape[2]
    iota3_16 = jax.lax.broadcasted_iota(jnp.int16, (nblocks, k, tile_s), 1)
    zero = jnp.bfloat16(0.0)
    w3 = None
    for uu in range(users):
        c16 = codes_ref[uu].astype(jnp.int16)
        ub = u_ref[uu].astype(jnp.bfloat16)
        oh = jnp.where(iota3_16 == c16[:, None, :], ub[:, None, :], zero)
        w3 = oh if w3 is None else w3 + oh
    w_t = (w3.reshape(nblocks * k, tile_s) * jnp.bfloat16(1.0 / users))
    out_ref[:] = jax.lax.dot_general(
        eh_ref[:], w_t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def decode_mean_h(codes, u, eh, dim, tile_s, interpret=False):
    users, m = codes.shape
    b, num_tiles, s_pad = _geometry(m * dim, dim, tile_s)
    k = eh.shape[1] // b
    codes_t, u_t = _sig_to_transposed(
        codes.astype(jnp.int32), u.astype(jnp.float32), b, s_pad)
    out_t = pl.pallas_call(
        functools.partial(_decode_mean_kernel_h, nblocks=b, k=k, users=users),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, tile_s), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LANES, s_pad), jnp.float32),
        interpret=interpret,
    )(codes_t, u_t, eh)
    return jnp.swapaxes(out_t, 0, 1).reshape(-1)[:m * dim]


def main():
    dim, K, users = 16, 256, 8
    size = 23498432 // dim * dim
    cb = hsq2.bf16_exact_codebook(np.asarray(get_codebook(dim, K)))
    eh, el = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb)))
    e2 = jnp.concatenate([eh, eh], axis=0)  # bf16 (256, B*K)
    rng = np.random.default_rng(0)
    flats = jnp.asarray(rng.standard_normal((users, size)), jnp.float32)
    print(f"backend={jax.default_backend()} size={size} users={users}")

    # fidelity vs v4-exact on a small case
    small = flats[:3, : 16 * 4096]
    u0, c0 = v4.hsq_encode_flat(small, eh, el, dim, tile_s=128, passes=2)
    for name, fn in (
        ("G2", lambda f: encode_g(f, e2, dim, K, 128, passes=2)),
        ("G1", lambda f: encode_g(f, eh, dim, K, 128, passes=1)),
    ):
        u1, c1 = fn(small)
        agree = float(np.mean(np.asarray(c1) == np.asarray(c0)))
        du = np.max(np.abs(np.asarray(u1) - np.asarray(u0))
                    / np.maximum(np.abs(np.asarray(u0)), 1e-9))
        print(f"{name}: code agreement {agree*100:.4f}%, "
              f"max rel u dev {du:.2e}")
    m0 = v4.hsq_decode_mean(c0, u0, eh, el, dim, tile_s=128, passes=2)
    mh = decode_mean_h(c0, u0, eh, dim, tile_s=128)
    dm = np.max(np.abs(np.asarray(mh) - np.asarray(m0))) / (
        np.max(np.abs(np.asarray(m0))) + 1e-12)
    print(f"H decode-mean: max rel dev {dm:.2e}")

    for tile_s in (128, 256, 512):
        row = [f"tile={tile_s:4d}"]
        dt, _ = timeit(jax.jit(lambda f: v4.hsq_encode_flat(
            f, eh, el, dim, tile_s=tile_s, passes=2)), flats, n=5)
        row.append(f"A(v4) {dt*1e3:6.2f}")
        dt, _ = timeit(jax.jit(lambda f: encode_g(
            f, e2, dim, K, tile_s, passes=2)), flats, n=5)
        row.append(f"G2 {dt*1e3:6.2f}")
        dt, _ = timeit(jax.jit(lambda f: encode_g(
            f, eh, dim, K, tile_s, passes=1)), flats, n=5)
        row.append(f"G1 {dt*1e3:6.2f}")
        print("  ".join(row), flush=True)

    # decode-mean timing on full-size signatures
    uF, cF = jax.block_until_ready(
        jax.jit(lambda f: v4.hsq_encode_flat(
            f, eh, el, dim, tile_s=512, passes=2))(flats))
    for tile_s in (128, 256, 512):
        row = [f"tile={tile_s:4d}"]
        dt, _ = timeit(jax.jit(lambda c, u: v4.hsq_decode_mean(
            c, u, eh, el, dim, tile_s=tile_s, passes=2)), cF, uF, n=5)
        row.append(f"dm(v4) {dt*1e3:6.2f}")
        dt, _ = timeit(jax.jit(lambda c, u: decode_mean_h(
            c, u, eh, dim, tile_s=tile_s)), cF, uF, n=5)
        row.append(f"dm(H) {dt*1e3:6.2f}")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
