"""Generate the kmeans_codebook artifact family (raw centroids).

The reference ships TWO codebook families: ``learned_codebook`` (unit-norm
rows — the one HSQ actually loads, reference
nearest_neighbor_compressor.py:50-52) and ``kmeans_codebook`` (raw
``kmeans2`` centroids of unit-normalized Gaussian samples, ~0.66 row norm
at dim 16 — written by reference codebook_generator.py:23-31 and loaded by
no code path; SURVEY.md §2.8).  gen_codebooks.py produces the former; this
script completes the artifact family with the latter: identical training
pipeline (same seed policy, jitted Lloyd, 1M samples, 20 iters), but the
centroids are written WITHOUT row normalization, to
``codebooks/kmeans_codebook/``.

Grid = the reference's shipped 328 files: dims 1..65 x Ks
{32,64,256,512,1024} plus dim 256 at Ks {256,512,1024}.

Usage: python scripts/gen_kmeans_codebooks.py [--dims 1-65] [--ks 32,64]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gen_codebooks import parse_ints  # noqa: E402


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dims", default="1-65")
    p.add_argument("--ks", default="32,64,256,512,1024")
    p.add_argument("--extra", default="256:256,256:512,256:1024",
                   help="extra dim:K pairs (reference ships dim 256 at "
                        "Ks 256/512/1024 only)")
    p.add_argument("--train-size", type=int, default=1_000_000)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from gqx.codebooks import codebook_filename
    from gqx.codebooks.kmeans import train_codebook
    from gqx.utils.jax_cache import enable_compilation_cache
    from gqx.utils.vecs_io import fvecs_write

    enable_compilation_cache()
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "codebooks", "kmeans_codebook")
    os.makedirs(out_dir, exist_ok=True)

    pairs = [(d, k) for d in parse_ints(args.dims) for k in parse_ints(args.ks)]
    for spec in filter(None, args.extra.split(",")):
        d, k = spec.split(":")
        pairs.append((int(d), int(k)))

    t0 = time.time()
    for dim, k in pairs:
        path = os.path.join(out_dir, codebook_filename(dim, k))
        if os.path.exists(path):
            continue
        dim_pad = 128 if dim <= 128 else 256
        cb = train_codebook(dim, k, train_size=args.train_size,
                            dim_pad=dim_pad)
        fvecs_write(path, cb)  # RAW centroids — no row normalization
        print(f"wrote: {path} {cb.shape} [{time.time()-t0:.0f}s]", flush=True)


if __name__ == "__main__":
    main()
