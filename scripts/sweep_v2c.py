"""Encode variant: grid over (row tiles x codebook blocks) — each kernel
instance computes one block's (TS, K) products + selection, with the full
128-contraction against that block's column slice of E.  Also decmean with
a bf16 W accumulate.  Run on TPU."""

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


def encode_blockgrid(comp, dim, tile_s, passes):
    b = LANES // dim
    k = comp._eh.shape[1] // b

    def kern(x_ref, eh_ref, el_ref, u_ref, codes_ref):
        p = _split_dot(x_ref[:], eh_ref, el_ref, passes)   # (TS, K)
        pos = jnp.max(p, axis=1, keepdims=True)
        neg = jnp.min(p, axis=1, keepdims=True)
        uj = jnp.where(pos >= -neg, pos, neg)
        iota = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        idx = jnp.min(jnp.where(p == uj, iota, k), axis=1, keepdims=True)
        u_ref[:] = uj
        codes_ref[:] = idx

    def enc(flat):
        size = flat.shape[0]
        s = size // LANES
        num_tiles = -(-s // tile_s)
        s_pad = num_tiles * tile_s
        x = jnp.pad(flat, (0, s_pad * LANES - size)).reshape(s_pad, LANES)
        u, codes = pl.pallas_call(
            kern,
            grid=(num_tiles, b),
            in_specs=[
                pl.BlockSpec((tile_s, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((LANES, k), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_s, 1), lambda i, j: (i, j), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_s, 1), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((s_pad, b), jnp.float32),
                jax.ShapeDtypeStruct((s_pad, b), jnp.int32),
            ],
        )(x, comp._eh, comp._el)
        return u, codes

    return enc


def main():
    print(f"backend={jax.default_backend()}")
    U, size, dim = 8, 23498432, 16
    comp = HSQCompressor(size, (size,), dim, 8, 6, use_pallas=True)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((U, size)), jnp.float32) * 1e-3

    from gqx.ops.pallas_hsq2 import hsq_encode_flat

    ref_f = jax.jit(jax.vmap(lambda x: hsq_encode_flat(
        x, comp._eh, comp._el, dim, tile_s=128, passes=2)))
    _, (u_ref_, c_ref_) = timeit(ref_f, g)

    for passes in (1, 2):
        for tile_s in (128, 256, 512, 1024):
            try:
                f = jax.jit(jax.vmap(encode_blockgrid(comp, dim, tile_s, passes)))
                dt, (uu, cc) = timeit(f, g)
                ok = (np.allclose(np.asarray(uu), np.asarray(u_ref_), rtol=1e-5, atol=1e-7)
                      if passes == 2 else "-")
                print(f"blockgrid passes={passes} tile_s={tile_s}: {dt*1e3:7.2f} ms "
                      f"({U*size*4/dt/1e9:6.1f} GB/s) match={ok}")
            except Exception as e:
                print(f"blockgrid passes={passes} tile_s={tile_s}: FAIL {e!r}"[:120])


if __name__ == "__main__":
    main()
