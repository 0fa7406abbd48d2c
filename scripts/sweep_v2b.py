"""Isolate encode cost components: matmul-only vs full selection, f32 vs
bf16 selection, pass counts.  Run on TPU."""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gqx.compress.vq import HSQCompressor
from gqx.ops.pallas_hsq2 import LANES, _split_dot


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def make_kernel(variant, nblocks, k, passes):
    def kern(x_ref, eh_ref, el_ref, u_ref, codes_ref):
        p = _split_dot(x_ref[:], eh_ref, el_ref, passes)
        if variant == "matmul_only":
            # cheap reduction so p isn't dead-code eliminated
            u_ref[:] = jnp.max(p.reshape(p.shape[0], nblocks, k), axis=2)
            codes_ref[:] = jnp.zeros_like(codes_ref)
            return
        if variant == "bf16_sel":
            p = p.astype(jnp.bfloat16)
        for j in range(nblocks):
            pj = p[:, j * k:(j + 1) * k]
            pos = jnp.max(pj, axis=1, keepdims=True)
            neg = jnp.min(pj, axis=1, keepdims=True)
            uj = jnp.where(pos >= -neg, pos, neg)
            iota = jax.lax.broadcasted_iota(jnp.int32, pj.shape, 1)
            idx = jnp.min(jnp.where(pj == uj, iota, k), axis=1, keepdims=True)
            u_ref[:, j:j + 1] = uj.astype(jnp.float32)
            codes_ref[:, j:j + 1] = idx
    return kern


def bench_variant(variant, g, comp, dim, tile_s, passes):
    b = LANES // dim
    k = comp._eh.shape[1] // b
    size = g.shape[1]
    s = size // LANES
    num_tiles = -(-s // tile_s)
    s_pad = num_tiles * tile_s

    def enc(flat):
        x = jnp.pad(flat, (0, s_pad * LANES - size)).reshape(s_pad, LANES)
        return pl.pallas_call(
            make_kernel(variant, b, k, passes),
            grid=(num_tiles,),
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
                jax.ShapeDtypeStruct((s_pad, b), jnp.float32),
                jax.ShapeDtypeStruct((s_pad, b), jnp.int32),
            ],
        )(x, comp._eh, comp._el)

    f = jax.jit(jax.vmap(enc))
    try:
        dt, _ = timeit(f, g)
        U = g.shape[0]
        print(f"{variant:12s} passes={passes} tile_s={tile_s}: {dt*1e3:7.2f} ms "
              f"({U*size*4/dt/1e9:6.1f} GB/s)")
    except Exception as e:
        print(f"{variant:12s} passes={passes} tile_s={tile_s}: FAIL {e!r}"[:140])


def main():
    print(f"backend={jax.default_backend()}")
    U, size, dim = 8, 23498432, 16
    comp = HSQCompressor(size, (size,), dim, 8, 6, use_pallas=True)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((U, size)), jnp.float32) * 1e-3
    for variant in ("matmul_only", "full", "bf16_sel"):
        for passes in (1, 2):
            for tile_s in (128, 256):
                bench_variant(variant, g, comp, dim, tile_s, passes)


if __name__ == "__main__":
    main()
