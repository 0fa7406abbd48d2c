"""Generate the canonical angular codebooks used by HSQ/PVQ and cache them
under codebooks/learned_codebook/ (same artifact family as the reference's
codebook_generator.py: k-means over unit-normalized Gaussian samples).

Usage: python scripts/gen_codebooks.py [--dims 16,24,32,48] [--ks 32,64,256]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_ints(spec: str):
    out = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def main():
    p = argparse.ArgumentParser()
    # full reference-reachable family (reference codebook_generator.py:25-26:
    # dims 1..65 x Ks {32,64,256,512,1024}) + the dim-128 extras
    p.add_argument("--dims", default="1-65,128")
    p.add_argument("--ks", default="32,64,256,512,1024")
    p.add_argument("--train-size", type=int, default=1_000_000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gqx.codebooks import DEFAULT_CACHE_DIR, codebook_filename
    from gqx.codebooks.kmeans import train_codebook
    from gqx.utils.jax_cache import enable_compilation_cache
    from gqx.utils.vecs_io import fvecs_write, normalize_rows

    enable_compilation_cache()

    import time

    os.makedirs(DEFAULT_CACHE_DIR, exist_ok=True)
    t0 = time.time()
    for dim in parse_ints(args.dims):
        for k in parse_ints(args.ks):
            path = os.path.join(DEFAULT_CACHE_DIR, codebook_filename(dim, k))
            if os.path.exists(path):
                print("exists:", path)
                continue
            cb = train_codebook(dim, k, train_size=args.train_size)
            cb = normalize_rows(cb)[1]
            fvecs_write(path, cb)
            print(f"wrote: {path} {cb.shape} [{time.time()-t0:.0f}s]",
                  flush=True)


if __name__ == "__main__":
    main()
