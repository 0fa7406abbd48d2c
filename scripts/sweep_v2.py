"""Sweep v2 kernel knobs (tile_s, passes, input dtype) at bench scale.
Run on TPU: python scripts/sweep_v2.py"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / n, out


def main():
    from gqx.compress.vq import HSQCompressor
    from gqx.ops.pallas_hsq2 import hsq_decode_mean, hsq_encode_flat

    print(f"backend={jax.default_backend()}")
    U, size, dim = 8, 23498432, 16
    comp = HSQCompressor(size, (size,), dim, 8, 6, use_pallas=True)
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((U, size)), jnp.float32) * 1e-3

    for passes in (1, 2):
        for tile_s in (128, 256, 512, 1024, 2048):
            f = jax.jit(jax.vmap(lambda x: hsq_encode_flat(
                x, comp._eh, comp._el, dim, tile_s=tile_s, passes=passes)))
            try:
                dt, (uu, codes) = timeit(f, g)
                print(f"encode passes={passes} tile_s={tile_s}: {dt*1e3:7.2f} ms "
                      f"({U*size*4/dt/1e9:6.1f} GB/s)")
            except Exception as e:
                print(f"encode passes={passes} tile_s={tile_s}: FAIL {type(e).__name__}")

    # encode from a bf16 gradient (the bwd already computes in bf16):
    gb = g.astype(jnp.bfloat16)
    for tile_s in (256, 512, 1024):
        f = jax.jit(jax.vmap(lambda x: hsq_encode_flat(
            x.astype(jnp.float32), comp._eh, comp._el, dim,
            tile_s=tile_s, passes=1)))
        dt, _ = timeit(f, gb)
        print(f"encode bf16-in passes=1 tile_s={tile_s}: {dt*1e3:7.2f} ms "
              f"({U*size*2/dt/1e9:6.1f} GB/s bf16)")

    f0 = jax.jit(jax.vmap(lambda x: hsq_encode_flat(
        x, comp._eh, comp._el, dim, tile_s=256, passes=2)))
    _, (uu, codes) = timeit(f0, g)
    for passes in (1, 2):
        for tile_s in (128, 256, 512, 1024):
            f = jax.jit(lambda c, u_: hsq_decode_mean(
                c, u_, comp._e2h, comp._e2l, dim, tile_s=tile_s, passes=passes))
            try:
                dt, _ = timeit(f, codes, uu)
                print(f"decmean passes={passes} tile_s={tile_s}: {dt*1e3:7.2f} ms "
                      f"({size*4/dt/1e9:6.1f} GB/s out)")
            except Exception as e:
                print(f"decmean passes={passes} tile_s={tile_s}: FAIL {type(e).__name__}")


if __name__ == "__main__":
    main()
