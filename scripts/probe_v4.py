"""Decompose v4 encode/decode-mean kernel time at the production geometry:
pure-DMA-in, matmul-only, matmul+selection (= full encode), and for
decode-mean: onehot-only vs full.  Identifies which unit (DMA stream, MXU,
VPU selection) binds at each tile size — the data behind the round-3 kernel
work (PERF.md).

Usage: python scripts/probe_v4.py [--size N] [--users U]
"""

from __future__ import annotations

import argparse
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
from gqx.ops.pallas_hsq3 import _dot_t, _geometry
from gqx.utils.timing import timeit

LANES = 128


def _io_kernel(x_ref, out_ref, *, nblocks):
    # touch every input element once, minimal compute: per-user row-sum
    users = x_ref.shape[0]
    for uu in range(users):
        out_ref[uu] = jnp.sum(x_ref[uu], axis=1, keepdims=True).T


def _mm_kernel(x_ref, eh_ref, el_ref, out_ref, *, nblocks, k, passes):
    # matmul only: reduce p to a (1, tile) checksum per user (no selection)
    users = x_ref.shape[0]
    for uu in range(users):
        p = _dot_t(eh_ref, el_ref, x_ref[uu], passes)
        out_ref[uu] = jnp.sum(p, axis=0, keepdims=True)


def run_variant(kind, x, eh, el, dim, tile_s, passes):
    users, s_pad, _ = x.shape
    b, num_tiles, _ = _geometry(s_pad * LANES, dim, tile_s)
    k = eh.shape[1] // b
    if kind == "io":
        f = pl.pallas_call(
            functools.partial(_io_kernel, nblocks=b),
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec((users, tile_s, LANES), lambda i: (0, i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((users, 1, tile_s), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((users, 1, s_pad), jnp.float32),
        )
        return jax.jit(lambda xx: f(xx)), (x,)
    if kind == "mm":
        f = pl.pallas_call(
            functools.partial(_mm_kernel, nblocks=b, k=k, passes=passes),
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((users, tile_s, LANES), lambda i: (0, i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((users, 1, tile_s), lambda i: (0, 0, i),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((users, 1, s_pad), jnp.float32),
        )
        return jax.jit(lambda xx: f(xx, eh, el)), (x,)
    raise ValueError(kind)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=23498432)
    ap.add_argument("--users", type=int, default=8)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--k", type=int, default=256)
    args = ap.parse_args()

    dim, K = args.dim, args.k
    size = args.size // dim * dim
    cb = hsq2.bf16_exact_codebook(np.asarray(get_codebook(dim, K)))
    eh, el = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb)))
    rng = np.random.default_rng(0)
    flats = jnp.asarray(rng.standard_normal((args.users, size)), jnp.float32)

    gb = args.users * size * 4 / 1e9
    print(f"backend={jax.default_backend()} size={size} users={args.users} "
          f"({gb:.2f} GB in)")

    for tile_s in (128, 256, 512):
        b, num_tiles, s_pad = _geometry(size, dim, tile_s)
        pad = s_pad * LANES - size
        x = jnp.pad(flats, ((0, 0), (0, pad))).reshape(args.users, s_pad, LANES)
        row = [f"tile={tile_s:4d} steps={num_tiles:5d}"]
        f, ops = run_variant("io", x, eh, el, dim, tile_s, 2)
        dt, _ = timeit(f, *ops, n=5)
        row.append(f"io {dt*1e3:6.2f} ms ({gb/dt:5.0f} GB/s)")
        for passes in (1, 2):
            f, ops = run_variant("mm", x, eh, el, dim, tile_s, passes)
            dt, _ = timeit(f, *ops, n=5)
            row.append(f"mm{passes} {dt*1e3:6.2f}")
        for passes in (1, 2):
            dt, _ = timeit(
                jax.jit(lambda xx: v4.hsq_encode_flat(
                    xx, eh, el, dim, tile_s=tile_s, passes=passes)), flats, n=5)
            row.append(f"enc{passes} {dt*1e3:6.2f}")
        print("  ".join(row), flush=True)

    # decode-mean decomposition at production tile
    u, codes = v4.hsq_encode_flat(flats, eh, el, dim, tile_s=256, passes=2)
    for tile_s in (128, 256, 512):
        dt, _ = timeit(
            jax.jit(lambda c, uu: v4.hsq_decode_mean(
                c, uu, eh, el, dim, tile_s=tile_s, passes=2)),
            codes.astype(jnp.int32), u, n=5)
        print(f"decode_mean tile={tile_s:4d}: {dt*1e3:6.2f} ms", flush=True)


if __name__ == "__main__":
    main()
