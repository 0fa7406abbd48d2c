"""Encode-kernel experiments toward v5 (round-3 perf work, PERF.md):

  A  v4 baseline (2-pass split with VPU p-add)
  B  stacked-contraction: E2 = [Eh; Eh] (256, B*K), x2 = [xh | xl]
     (tile, 256) -> ONE dot_general accumulates both bf16 passes INSIDE the
     MXU (no (B*K, tile) f32 add pass, no second p materialization)
  C  B + 2D grid (users, tiles): per-step block = one user's (tile, 128)
     slab (contiguous DMA), 8x more grid steps to pipeline
  D  C + dimension_semantics=("parallel", "arbitrary")
  E  B + in-kernel 2-chunk software pipeline (matmul chunk c+1 while
     selecting chunk c)
  F  key-packed APPROXIMATE selection: key = (bits(p) & 0x7FFFFE00)
     | (sign << 8) | (255 - c) packs truncated |p|, the sign, and the
     first-tie-wins index into one sortable uint32 -> ONE max tree replaces
     v4's three (pos/neg/idx) trees and the u extraction entirely; u is
     reconstructed from the key's 14 high mantissa bits (relative error
     <= 2^-15, ~500x below the 6-bit norm-quantization step).  NOT
     bit-identical to v4: near-ties of |p| within 2^-15 relative may pick
     the smaller index.  Measures the ceiling of approximate selection.

Variants B/C/E emit bit-identical (u, codes) to v4 (same selection math);
asserted on a small case before timing.  F is checked for code-agreement
rate and max |u| deviation instead.

Usage: python scripts/probe_v5.py
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
from gqx.ops.pallas_hsq3 import _geometry
from gqx.ops.pallas_hsq4 import _select
from gqx.utils.timing import timeit

LANES = 128


def _x2(x):
    xh = x.astype(jnp.bfloat16)
    xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
    return jnp.concatenate([xh, xl], axis=1)  # (tile, 256)


def _dot_stacked(e2_ref, x, out_dtype=jnp.float32):
    # e2 (256, B*K) contracted dim0 with x2 (tile, 256) dim1 -> (B*K, tile)
    return jax.lax.dot_general(
        e2_ref[:], _x2(x), dimension_numbers=(((0,), (1,)), ((), ())),
        preferred_element_type=out_dtype,
        precision=jax.lax.Precision.DEFAULT,
    )


def _enc_kernel_b(x_ref, e2_ref, u_ref, codes_ref, *, nblocks, k):
    users, tile_s = x_ref.shape[0], x_ref.shape[1]
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (nblocks, k, tile_s), 1)
    for uu in range(users):
        p = _dot_stacked(e2_ref, x_ref[uu])
        uj, idx = _select(p, iota3, nblocks, k, tile_s)
        u_ref[uu] = uj
        codes_ref[uu] = idx


def _enc_kernel_c(x_ref, e2_ref, u_ref, codes_ref, *, nblocks, k):
    tile_s = x_ref.shape[1]
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (nblocks, k, tile_s), 1)
    p = _dot_stacked(e2_ref, x_ref[0])
    uj, idx = _select(p, iota3, nblocks, k, tile_s)
    u_ref[0] = uj
    codes_ref[0] = idx


def _select_key(p, iota_neg3, nblocks, k, tile_s):
    """Approximate selection via one sortable-uint32 key tree (variant F)."""
    bits = jax.lax.bitcast_convert_type(p, jnp.int32)
    mag = bits & jnp.int32(0x7FFFFE00)            # |p| high 14 mantissa bits
    # bit 8 set for POSITIVE p so +v wins an exact-magnitude tie (matches
    # v4's `pos >= -neg` rule); bits 0-7 carry (k-1-c) so the largest key
    # among magnitude ties has the smallest index (first-tie-wins)
    pos_bit = jax.lax.shift_right_logical(~bits, 23) & jnp.int32(0x100)
    key = (mag | pos_bit | iota_neg3).reshape(nblocks, k, tile_s)
    kmax = jnp.max(key, axis=1)                   # (B, tile) single tree
    idx = (k - 1) - (kmax & jnp.int32(0xFF))
    positive = (kmax & jnp.int32(0x100)) != 0
    umag = jax.lax.bitcast_convert_type(kmax & jnp.int32(0x7FFFFE00), jnp.float32)
    uj = jnp.where(positive, umag, -umag)
    return uj, idx


def _enc_kernel_f(x_ref, e2_ref, u_ref, codes_ref, *, nblocks, k):
    users, tile_s = x_ref.shape[0], x_ref.shape[1]
    iota_neg3 = (k - 1) - jax.lax.broadcasted_iota(
        jnp.int32, (nblocks * k, tile_s), 0) % k
    for uu in range(users):
        p = _dot_stacked(e2_ref, x_ref[uu])
        uj, idx = _select_key(p, iota_neg3, nblocks, k, tile_s)
        u_ref[uu] = uj
        codes_ref[uu] = idx


def _enc_kernel_e(x_ref, e2_ref, u_ref, codes_ref, *, nblocks, k, chunks):
    users, tile_s = x_ref.shape[0], x_ref.shape[1]
    cs = tile_s // chunks
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (nblocks, k, cs), 1)

    def mm(uu, ch):
        return _dot_stacked(e2_ref, x_ref[uu, ch * cs:(ch + 1) * cs, :])

    work = [(uu, ch) for uu in range(users) for ch in range(chunks)]
    p = mm(*work[0])
    for w, (uu, ch) in enumerate(work):
        p_cur, p = p, (mm(*work[w + 1]) if w + 1 < len(work) else None)
        uj, idx = _select(p_cur, iota3, nblocks, k, cs)
        u_ref[uu, :, ch * cs:(ch + 1) * cs] = uj
        codes_ref[uu, :, ch * cs:(ch + 1) * cs] = idx


def encode_v5(flat, e2, dim, k, tile_s, variant="B", interpret=False):
    users, size = flat.shape
    m = size // dim
    b, num_tiles, s_pad = _geometry(size, dim, tile_s)
    if s_pad * LANES != size:
        flat = jnp.pad(flat, ((0, 0), (0, s_pad * LANES - size)))
    x = flat.reshape(users, s_pad, LANES)
    e2_spec = pl.BlockSpec((2 * LANES, b * k), lambda *idx: (0,) * len(idx) and (0, 0),
                           memory_space=pltpu.VMEM)

    if variant in ("B", "E", "F"):
        kern = {
            "B": functools.partial(_enc_kernel_b, nblocks=b, k=k),
            "E": functools.partial(_enc_kernel_e, nblocks=b, k=k, chunks=2),
            "F": functools.partial(_enc_kernel_f, nblocks=b, k=k),
        }[variant]
        u_t, codes_t = pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((users, tile_s, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * LANES, b * k), lambda i: (0, 0),
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
    elif variant in ("C", "D"):
        params = {}
        if variant == "D":
            params["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("parallel", "arbitrary"))
        u_t, codes_t = pl.pallas_call(
            functools.partial(_enc_kernel_c, nblocks=b, k=k),
            grid=(users, num_tiles),
            in_specs=[
                pl.BlockSpec((1, tile_s, LANES), lambda uu, i: (uu, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((2 * LANES, b * k), lambda uu, i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, b, tile_s), lambda uu, i: (uu, 0, i),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, b, tile_s), lambda uu, i: (uu, 0, i),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((users, b, s_pad), jnp.float32),
                jax.ShapeDtypeStruct((users, b, s_pad), jnp.int32),
            ],
            interpret=interpret,
            **params,
        )(x, e2)
    else:
        raise ValueError(variant)
    u = jnp.swapaxes(u_t, 1, 2).reshape(users, -1)[:, :m]
    codes = jnp.swapaxes(codes_t, 1, 2).reshape(users, -1)[:, :m]
    return u, codes


def main():
    dim, K, users = 16, 256, 8
    size = 23498432 // dim * dim
    cb = hsq2.bf16_exact_codebook(np.asarray(get_codebook(dim, K)))
    eh, el = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb)))
    e2 = jnp.concatenate([eh, eh], axis=0)  # lo(E)=0 for bf16-exact codebook
    rng = np.random.default_rng(0)
    flats = jnp.asarray(rng.standard_normal((users, size)), jnp.float32)
    print(f"backend={jax.default_backend()} size={size} users={users}")

    # correctness vs v4 on a small case
    small = flats[:3, : 16 * 4096]
    u0, c0 = v4.hsq_encode_flat(small, eh, el, dim, tile_s=128, passes=2)
    for var in ("B", "C", "E"):
        u1, c1 = encode_v5(small, e2, dim, K, 128, variant=var)
        np.testing.assert_array_equal(np.asarray(c1), np.asarray(c0)), var
        np.testing.assert_array_equal(np.asarray(u1), np.asarray(u0)), var
    print("correctness vs v4: bit-identical (B, C, E)")
    uf, cf = encode_v5(small, e2, dim, K, 128, variant="F")
    agree = float(np.mean(np.asarray(cf) == np.asarray(c0)))
    du = np.max(np.abs(np.asarray(uf) - np.asarray(u0))
                / np.maximum(np.abs(np.asarray(u0)), 1e-9))
    print(f"F (approx): code agreement {agree*100:.4f}%, "
          f"max rel u deviation {du:.2e}")

    for tile_s in (128, 256, 512):
        row = [f"tile={tile_s:4d}"]
        dt, _ = timeit(jax.jit(lambda f: v4.hsq_encode_flat(
            f, eh, el, dim, tile_s=tile_s, passes=2)), flats, n=5)
        row.append(f"A(v4) {dt*1e3:6.2f}")
        for var in ("B", "C", "D", "E", "F"):
            try:
                dt, _ = timeit(
                    jax.jit(functools.partial(
                        encode_v5, e2=e2, dim=dim, k=K, tile_s=tile_s,
                        variant=var)), flats, n=5)
                row.append(f"{var} {dt*1e3:6.2f}")
            except Exception as e:  # noqa
                row.append(f"{var} FAIL({type(e).__name__})")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
