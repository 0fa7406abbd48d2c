"""Sweep pallas HSQ kernel tile sizes at bench scale (M=1.47M x 8 users)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.codebooks import get_codebook
from gqx.ops.pallas_hsq import hsq_encode, hsq_decode


from gqx.utils.timing import timeit  # noqa: E402  (true device barrier)


def main():
    U, M, dim, K = 8, 1468652, 16, 256
    cb = jnp.asarray(get_codebook(dim, K))
    rng = np.random.default_rng(0)
    rows = jnp.asarray(rng.standard_normal((U, M, dim)), jnp.float32)
    rows_flat = rows.reshape(U * M, dim)
    nbytes = U * M * dim * 4

    for tm in (1024, 2048, 4096, 8192):
        try:
            f = jax.jit(jax.vmap(lambda r: hsq_encode(r, cb, tile_m=tm)))
            dt, (u, codes) = timeit(f, rows)
            print(f"encode vmap  tile_m={tm:6d}: {dt*1e3:8.2f} ms ({nbytes/dt/1e9:6.1f} GB/s)")
        except Exception as e:
            print(f"encode vmap  tile_m={tm}: FAIL {type(e).__name__}: {str(e)[:120]}")
    for tm in (1024, 8192, 16384):
        try:
            f = jax.jit(lambda r: hsq_encode(r, cb, tile_m=tm))
            dt, (u, codes) = timeit(f, rows_flat)
            print(f"encode flat  tile_m={tm:6d}: {dt*1e3:8.2f} ms ({nbytes/dt/1e9:6.1f} GB/s)")
        except Exception as e:
            print(f"encode flat  tile_m={tm}: FAIL {type(e).__name__}: {str(e)[:120]}")

    u, codes = jax.vmap(lambda r: hsq_encode(r, cb))(rows)
    for tm in (1024, 2048, 4096, 8192):
        try:
            f = jax.jit(jax.vmap(lambda c, uu: hsq_decode(c, uu, cb, tile_m=tm)))
            dt, _ = timeit(f, codes, u)
            print(f"decode vmap  tile_m={tm:6d}: {dt*1e3:8.2f} ms ({nbytes/dt/1e9:6.1f} GB/s)")
        except Exception as e:
            print(f"decode vmap  tile_m={tm}: FAIL {type(e).__name__}: {str(e)[:120]}")
    cf, uf = codes.reshape(-1), u.reshape(-1)
    for tm in (8192, 16384):
        try:
            f = jax.jit(lambda c, uu: hsq_decode(c, uu, cb, tile_m=tm))
            dt, _ = timeit(f, cf, uf)
            print(f"decode flat  tile_m={tm:6d}: {dt*1e3:8.2f} ms ({nbytes/dt/1e9:6.1f} GB/s)")
        except Exception as e:
            print(f"decode flat  tile_m={tm}: FAIL {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
