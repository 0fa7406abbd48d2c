"""Stage-level microbenchmark of the v2 HSQ path at bench scale, including
PRNG cost of the stochastic norm quantizer (the round-2 profiling follow-up
to scripts/microbench_hsq.py, whose encode/decode rows measure the retired
v1 kernels).  Run on TPU: python scripts/microbench_v2.py"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from gqx.utils.timing import timeit  # noqa: E402  (true device barrier)


def main():
    from gqx.compress.vq import HSQCompressor
    from gqx.ops.pallas_hsq2 import hsq_decode_mean, hsq_encode_flat

    print(f"backend={jax.default_backend()}")
    U, size, dim, K, n_bit = 8, 23498432, 16, 256, 6
    M = size // dim
    comp = HSQCompressor(size, (size,), dim, 8, n_bit, use_pallas=True)
    assert comp.flat_ok
    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((U, size)), jnp.float32) * 1e-3
    keys = jax.random.split(jax.random.PRNGKey(0), U)

    # v2 encode (per user, vmapped)
    encf = jax.jit(jax.vmap(lambda f: hsq_encode_flat(
        f, comp._eh, comp._el, dim, tile_s=comp._ENC_TILE_S, passes=2)))
    dt, (uu, codes) = timeit(encf, g)
    print(f"encode_v2:      {dt*1e3:8.2f} ms  ({U*size*4/dt/1e9:6.1f} GB/s)")

    # v2 decode_mean (all users fused)
    dmf = jax.jit(lambda c, u_: hsq_decode_mean(
        c, u_, comp._e2h, comp._e2l, dim, tile_s=comp._DECMEAN_TILE_S, passes=2))
    dt, _ = timeit(dmf, codes, uu)
    print(f"decode_mean_v2: {dt*1e3:8.2f} ms  ({size*4/dt/1e9:6.1f} GB/s out)")

    # norm quantizer parts (u: (U, M) = 8 x 1.47M)
    nc = comp.norm_compressor
    dt, _ = timeit(jax.jit(jax.vmap(lambda v: (jnp.min(v), jnp.max(v)))), uu)
    print(f"norm_minmax:    {dt*1e3:8.2f} ms")
    dt, _ = timeit(jax.jit(jax.vmap(lambda k: jax.random.uniform(k, (M,)))), keys)
    print(f"uniform_thfry:  {dt*1e3:8.2f} ms  ({U*M*4/dt/1e9:6.1f} GB/s)")
    try:
        rbg_keys = jax.vmap(lambda k: jax.random.key_data(
            jax.random.wrap_key_data(jax.random.key_data(
                jax.random.PRNGKey(0)), impl="rbg")))(keys)  # placeholder
    except Exception:
        pass
    rbg = jax.vmap(lambda s: jax.random.key_data(jax.random.key(s, impl="rbg")))(
        jnp.arange(U, dtype=jnp.uint32))
    def uni_rbg(kd):
        k = jax.random.wrap_key_data(kd, impl="rbg")
        return jax.random.uniform(k, (M,))
    dt, _ = timeit(jax.jit(jax.vmap(uni_rbg)), rbg)
    print(f"uniform_rbg:    {dt*1e3:8.2f} ms  ({U*M*4/dt/1e9:6.1f} GB/s)")
    dt, _ = timeit(jax.jit(jax.vmap(nc.compress)), uu, keys)
    print(f"norm_compress:  {dt*1e3:8.2f} ms")
    dt, sig = timeit(jax.jit(jax.vmap(lambda v, k: nc.decompress(nc.compress(v, k)))), uu, keys)
    print(f"norm_roundtrip: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
