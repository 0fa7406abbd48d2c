"""Isolate the HSQ v2 encode kernel's cost: matmul vs selection vs IO.

Variants (all same tiling / operands as hsq_encode_flat):
  io        copy x tile -> row-sum (pure read bandwidth + grid overhead)
  matmul1   xh@Eh, write row-sum of p (1-pass matmul cost)
  matmul2   xh@Eh + xl@Eh, row-sum   (2-pass matmul cost)
  select    full encode minus matmul (p = broadcast of x cols; fake)
  full1/2   the real encode kernel at passes=1/2
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gqx.utils.timing import timeit
from gqx.ops import pallas_hsq2 as hsq2

LANES = 128


def run_variant(name, kernel, x, eh, el, tile_s, b, k, out_cols):
    s_pad = x.shape[1]
    num_tiles = s_pad // tile_s
    U = x.shape[0]

    f = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_s, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_s, out_cols), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, out_cols), jnp.float32),
    )
    g = jax.jit(jax.vmap(lambda xu: f(xu, eh, el)))
    dt, _ = timeit(g, x, n=20)
    gbs = x.size * 4 / dt / 1e9
    print(f"{name:10s} {dt*1e3:7.2f} ms ({gbs:6.1f} GB/s in)", flush=True)
    return dt


def main():
    from gqx.codebooks import get_codebook

    print(f"backend={jax.default_backend()}")
    dim, K, U = 16, 256, 8
    size = 23498432
    b = LANES // dim
    cb = hsq2.bf16_exact_codebook(np.asarray(get_codebook(dim, K)))
    eh, el = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb)))

    tile_s = 128
    s = -(-size // LANES)
    num_tiles = -(-s // tile_s)
    s_pad = num_tiles * tile_s
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((U, s_pad, LANES)), jnp.float32)

    def k_io(x_ref, eh_ref, el_ref, o_ref):
        xx = x_ref[:]
        for j in range(b):
            o_ref[:, j:j + 1] = jnp.sum(
                xx[:, j * dim:(j + 1) * dim], axis=1, keepdims=True
            )

    def k_matmul(passes):
        def k(x_ref, eh_ref, el_ref, o_ref):
            p = hsq2._split_dot(x_ref[:], eh_ref, el_ref, passes)
            o_ref[:] = jnp.sum(p.reshape(p.shape[0], b, K), axis=2)
        return k

    def k_select(x_ref, eh_ref, el_ref, o_ref):
        # fake p without a matmul: broadcast x columns to (tile, b*K)
        xx = x_ref[:]
        p = jnp.concatenate([
            xx[:, j * dim:(j + 1) * dim].repeat(K // dim, axis=1)
            for j in range(b)
        ], axis=1)
        for j in range(b):
            pj = p[:, j * K:(j + 1) * K]
            pos = jnp.max(pj, axis=1, keepdims=True)
            neg = jnp.min(pj, axis=1, keepdims=True)
            uj = jnp.where(pos >= -neg, pos, neg)
            iota = jax.lax.broadcasted_iota(jnp.int32, pj.shape, 1)
            idx = jnp.min(jnp.where(pj == uj, iota, K), axis=1, keepdims=True)
            o_ref[:, j:j + 1] = uj + idx.astype(jnp.float32)

    def k_full(passes):
        def k(x_ref, eh_ref, el_ref, o_ref):
            p = hsq2._split_dot(x_ref[:], eh_ref, el_ref, passes)
            for j in range(b):
                pj = p[:, j * K:(j + 1) * K]
                pos = jnp.max(pj, axis=1, keepdims=True)
                neg = jnp.min(pj, axis=1, keepdims=True)
                uj = jnp.where(pos >= -neg, pos, neg)
                iota = jax.lax.broadcasted_iota(jnp.int32, pj.shape, 1)
                idx = jnp.min(jnp.where(pj == uj, iota, K), axis=1, keepdims=True)
                o_ref[:, j:j + 1] = uj + idx.astype(jnp.float32)
        return k

    run_variant("io", k_io, x, eh, el, tile_s, b, K, b)
    run_variant("matmul1", k_matmul(1), x, eh, el, tile_s, b, K, b)
    run_variant("matmul2", k_matmul(2), x, eh, el, tile_s, b, K, b)
    run_variant("select", k_select, x, eh, el, tile_s, b, K, b)
    run_variant("full1", k_full(1), x, eh, el, tile_s, b, K, b)
    run_variant("full2", k_full(2), x, eh, el, tile_s, b, K, b)


if __name__ == "__main__":
    main()
