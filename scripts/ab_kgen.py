"""A/B the v3 vs v4 HSQ kernel generations at bench scale on the real chip.

Bench-scale operands: the grouped ResNet-50 unit (~23.5M elements), 8 users,
d=16, K=256.  Honest device barriers via gqx.utils.timing.timeit.

Usage: python scripts/ab_kgen.py [--passes 2]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.utils.timing import timeit  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--passes", type=int, default=2)
    p.add_argument("--size", type=int, default=23498432)
    p.add_argument("--users", type=int, default=8)
    p.add_argument("--enc-tile", type=int, default=256)
    p.add_argument("--dec-tile", type=int, default=128)
    args = p.parse_args()

    from gqx.codebooks import get_codebook
    from gqx.ops import pallas_hsq2 as hsq2
    from gqx.ops import pallas_hsq3 as v3
    from gqx.ops import pallas_hsq4 as v4

    dim, k = 16, 256
    size = args.size // dim * dim
    users = args.users
    cb = hsq2.bf16_exact_codebook(np.asarray(get_codebook(dim, k)))
    eh, el = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb)))

    rng = np.random.default_rng(0)
    flats = jnp.asarray(rng.standard_normal((users, size)), jnp.float32)

    print(f"backend={jax.default_backend()} size={size} users={users} "
          f"passes={args.passes}")

    results = {}
    for name, mod in (("v3", v3), ("v4", v4), ("v4p", v4)):
        enc = lambda f, _m=mod, _p=(name == "v4p"): _m.hsq_encode_flat(
            f, eh, el, dim, tile_s=args.enc_tile, passes=args.passes,
            **({"pipeline": True} if _p else {}))
        dt, (u, codes) = timeit(jax.jit(enc), flats, n=10)
        results[f"{name}/encode"] = dt * 1e3
        gbps = users * size * 4 / dt / 1e9
        print(f"{name} encode      {dt*1e3:7.2f} ms  ({gbps:6.1f} GB/s in)")

        if name == "v4p":
            continue  # encode-only variant
        dec = lambda c, uu, _m=mod: _m.hsq_decode_flat(
            c, uu, eh, el, dim, tile_s=args.dec_tile, passes=args.passes)
        dt, _ = timeit(jax.jit(dec), codes, u, n=10)
        results[f"{name}/decode"] = dt * 1e3
        print(f"{name} decode      {dt*1e3:7.2f} ms")

        dm = lambda c, uu, _m=mod: _m.hsq_decode_mean(
            c, uu, eh, el, dim, tile_s=args.dec_tile, passes=args.passes)
        dt, _ = timeit(jax.jit(dm), codes, u, n=10)
        results[f"{name}/decode_mean"] = dt * 1e3
        print(f"{name} decode_mean {dt*1e3:7.2f} ms")

    for stage in ("encode", "decode", "decode_mean"):
        a, b = results[f"v3/{stage}"], results[f"v4/{stage}"]
        print(f"{stage:12s} v3 {a:7.2f}  v4 {b:7.2f}  "
              f"({'v4' if b < a else 'v3'} wins, {abs(a-b)/max(a,b)*100:.0f}%)")


if __name__ == "__main__":
    main()
