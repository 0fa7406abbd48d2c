"""Sweep the v3 chunked HSQ kernels (large DMA block x small compute chunk).

Rationale: the per-grid-step overhead is ~1.2 us on this chip (measured
13.4 ms pure-IO floor for 11.5k x 64 KB steps vs a 1.2 ms HBM roofline);
large blocks amortize it while the inner chunk keeps the (chunk, B*K)
product tile in VMEM.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.utils.timing import timeit
from gqx.ops import pallas_hsq2 as hsq2


def main():
    from gqx.codebooks import get_codebook

    print(f"backend={jax.default_backend()}")
    dim, K, U = 16, 256, 8
    size = 23498432
    M = size // dim
    cb = hsq2.bf16_exact_codebook(np.asarray(get_codebook(dim, K)))
    eh, el = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb)))
    e2h, e2l = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook_t(cb)))

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((U, size)), jnp.float32)
    gb = float(U * size * 4 / 1e9)

    best = None
    for tile_s in (128, 256, 512, 1024):
        for chunk in (128, 256):
            if chunk > tile_s:
                continue
            f = jax.jit(lambda r: hsq2.hsq_encode_flat(
                r, eh, el, dim, tile_s=tile_s, passes=2, chunk=chunk))
            try:
                dt, (u, codes) = timeit(f, g, n=20)
            except Exception as e:
                print(f"encode tile={tile_s} chunk={chunk}: FAIL {type(e).__name__}")
                continue
            print(f"encode tile={tile_s} chunk={chunk}: {dt*1e3:7.2f} ms "
                  f"({gb/dt:6.1f} GB/s in)", flush=True)
            if best is None or dt < best[0]:
                best = (dt, tile_s, chunk, u, codes)

    _, ts, ch, u, codes = best
    print(f"best encode: tile={ts} chunk={ch}")
    codes = codes.astype(jnp.int32)

    for tile_s in (128, 256, 512):
        for chunk in (128, 256):
            if chunk > tile_s:
                continue
            f = jax.jit(lambda c, x: hsq2.hsq_decode_mean(
                c, x, e2h, e2l, dim, tile_s=tile_s, passes=2, chunk=chunk))
            try:
                dt, _ = timeit(f, codes, u, n=20)
            except Exception as e:
                print(f"decmean tile={tile_s} chunk={chunk}: FAIL {type(e).__name__}")
                continue
            print(f"decmean tile={tile_s} chunk={chunk}: {dt*1e3:7.2f} ms "
                  f"({size*4/dt/1e9:6.1f} GB/s out)", flush=True)

    for tile_s in (1024, 2048, 4096):
        for chunk in (256, 512):
            f = jax.jit(lambda c, x: hsq2.hsq_decode_flat(
                c, x, e2h, e2l, dim, tile_s=tile_s, passes=2, chunk=chunk))
            try:
                dt, _ = timeit(f, codes, u, n=20)
            except Exception as e:
                print(f"decode tile={tile_s} chunk={chunk}: FAIL {type(e).__name__}")
                continue
            print(f"decode tile={tile_s} chunk={chunk}: {dt*1e3:7.2f} ms "
                  f"({gb/dt:6.1f} GB/s out)", flush=True)


if __name__ == "__main__":
    main()
