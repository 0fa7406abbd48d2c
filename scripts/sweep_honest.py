"""Honest (fetch-barrier) re-sweep of the v2 HSQ kernel tiles at bench scale.

The round-1 sweeps used jax.block_until_ready, which on this tunneled
platform can return before execution — their tile choices are suspect.
Re-measures encode / decode / decode_mean over tile_s, plus the norm
quantizer and pack, with gqx.utils.timing.timeit (device->host fetch).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.utils.timing import timeit


def main():
    from gqx.codebooks import get_codebook
    from gqx.ops import pallas_hsq2 as hsq2
    from gqx.compress.scalar import ProbabilisticScalarCompressor

    print(f"backend={jax.default_backend()}")
    dim, K, U = 16, 256, 8
    size = 23498432  # grouped ResNet-50 unit
    M = size // dim
    cb = hsq2.bf16_exact_codebook(np.asarray(get_codebook(dim, K)))
    eh, el = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb)))
    e2h, e2l = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook_t(cb)))

    rng = np.random.default_rng(0)
    g = jnp.asarray(rng.standard_normal((U, size)), jnp.float32)
    gb = float(U * size * 4 / 1e9)

    best_enc = None
    for tile_s in (128, 256, 512, 1024, 2048):
        for passes in (1, 2):
            f = jax.jit(jax.vmap(lambda r: hsq2.hsq_encode_flat(
                r, eh, el, dim, tile_s=tile_s, passes=passes)))
            try:
                dt, (u, codes) = timeit(f, g, n=20)
            except Exception as e:
                print(f"encode tile_s={tile_s} passes={passes}: FAIL {type(e).__name__}")
                continue
            print(f"encode tile_s={tile_s} passes={passes}: {dt*1e3:7.2f} ms "
                  f"({gb/dt:6.1f} GB/s in)", flush=True)
            if best_enc is None or dt < best_enc[0]:
                best_enc = (dt, tile_s, passes, u, codes)

    _, ts, ps, u, codes = best_enc
    print(f"best encode: tile_s={ts} passes={ps}")
    codes = codes.astype(jnp.int32)

    # norm quantizer (whole-unit range; segmented variant timed separately)
    nc = ProbabilisticScalarCompressor(M, (M,), 6, True)
    keys = jax.random.split(jax.random.PRNGKey(0), U)
    f = jax.jit(jax.vmap(lambda x, k: nc.decompress(nc.compress(x, k))))
    dt, uq = timeit(f, u, keys, n=20)
    print(f"norm roundtrip (1 segment): {dt*1e3:7.2f} ms ({U*M*4/dt/1e9:5.1f} GB/s)")

    segs = tuple([M // 54] * 53 + [M - (M // 54) * 53])
    ncs = ProbabilisticScalarCompressor(M, (M,), 6, True, segment_sizes=segs)
    f = jax.jit(jax.vmap(lambda x, k: ncs.decompress(ncs.compress(x, k))))
    dt, _ = timeit(f, u, keys, n=20)
    print(f"norm roundtrip (54 segments): {dt*1e3:7.2f} ms ({U*M*4/dt/1e9:5.1f} GB/s)")

    for tile_s in (128, 256, 512, 1024):
        f = jax.jit(lambda c, x: hsq2.hsq_decode_mean(
            c, x, e2h, e2l, dim, tile_s=tile_s, passes=2))
        try:
            dt, _ = timeit(f, codes, uq, n=20)
        except Exception as e:
            print(f"decmean tile_s={tile_s}: FAIL {type(e).__name__}")
            continue
        print(f"decmean tile_s={tile_s}: {dt*1e3:7.2f} ms "
              f"({size*4/dt/1e9:6.1f} GB/s out)", flush=True)

    for tile_s in (256, 512, 1024, 2048):
        f = jax.jit(jax.vmap(lambda c, x: hsq2.hsq_decode_flat(
            c, x, e2h, e2l, dim, tile_s=tile_s, passes=2)))
        try:
            dt, _ = timeit(f, codes, uq, n=20)
        except Exception as e:
            print(f"decode tile_s={tile_s}: FAIL {type(e).__name__}")
            continue
        print(f"decode tile_s={tile_s}: {dt*1e3:7.2f} ms "
              f"({gb/dt:6.1f} GB/s out)", flush=True)


if __name__ == "__main__":
    main()
