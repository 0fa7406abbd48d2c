"""Quant-layout quality study: torch vs outfirst subvector partitions.

Runs gqx HSQ (canonical d16/K256/n6) on the real digits dataset for N seeds
per layout and reports final top-1 mean +/- std.  The outfirst layout keeps
the output-unit-major property that the round-2 parity study identified as
the quality driver, but uses a 2D-collapsible permutation that packs 9x
faster (scripts/perf_probe.py).  This study checks the intra-subvector
order difference ((kh,kw,cin) vs torch's (cin,kh,kw) on KxK convs; FCN has
none — so also run --network cnn if you want conv coverage).

Usage: python scripts/layout_study.py [--seeds 10] [--network fcn]
       [--layouts torch,outfirst] [--quantizer hsq]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--network", default="fcn")
    p.add_argument("--layouts", default="torch,outfirst")
    p.add_argument("--quantizer", default="hsq")
    p.add_argument("--platform", default=None)
    args = p.parse_args()
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    from gqx.config import GQConfig
    from gqx.runner import run_training

    cfg_kw = dict(
        network=args.network, dataset="digits", num_users=8, batch_size=32,
        log_epoch=1,
    )
    if args.quantizer == "hsq":
        cfg_kw.update(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6)
    else:
        cfg_kw.update(quantizer=args.quantizer)

    results = {}
    for layout in args.layouts.split(","):
        accs = []
        for seed in range(1, args.seeds + 1):
            cfg = GQConfig(seed=seed, **cfg_kw)
            cfg.quant_layout = layout
            state, acc = run_training(cfg, progress=False)
            accs.append(acc * 100.0)
            print(f"{layout} seed {seed}: {acc*100:.2f}%", flush=True)
        results[layout] = np.asarray(accs)
        print(f"== {layout}: {results[layout].mean():.2f} "
              f"+/- {results[layout].std(ddof=1):.2f} (n={args.seeds})")
    for layout, a in results.items():
        print(f"FINAL {layout}: {a.mean():.2f} +/- {a.std(ddof=1):.2f}")


if __name__ == "__main__":
    main()
