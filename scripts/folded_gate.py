"""Folded-users convergence gate: multi-seed digits runs, folded vs vmap.

The folded-users fast path (gqx/models/folded.py, PERF.md) computes the
same per-user gradients through a different fp composition (folded U*B
batch + ghost-routed per-user weight grads).  tests/test_folded.py proves
gradient agreement to fp noise; this gate proves the *training dynamics*
are indistinguishable: FCN/digits (the PARITY_RESULTS.md setup — reference
MNIST schedule, 20+1 epochs), N seeds, final top-1 per arm.

Pass criterion (printed): |mean(folded) - mean(vmap)| <= max(0.3pp,
0.75 * pooled std) for every config.  On pass, flip the
``GQConfig.folded_users`` default.

Usage: python scripts/folded_gate.py [--seeds 10] [--configs hsq,sgd]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CONFIGS = {
    "sgd": dict(quantizer="sgd"),
    "hsq": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6),
}


def run_one(name, cfg, seed, folded):
    from gqx.config import GQConfig
    from gqx.runner import run_training

    logdir = os.path.join(
        REPO, "results", "folded_gate",
        f"tb_{name}_s{seed}_{'folded' if folded else 'vmap'}")
    gq = GQConfig(
        network="fcn", dataset="digits", num_users=8, batch_size=32,
        seed=seed, log_epoch=1, logdir=logdir, **cfg,
    )
    gq.quant_layout = "torch"
    gq.folded_users = folded
    _, acc = run_training(gq, progress=False)
    return float(acc)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--seeds", type=int, default=10)
    p.add_argument("--configs", default="hsq,sgd")
    args = p.parse_args()

    results = {}
    for name in args.configs.split(","):
        cfg = CONFIGS[name]
        for folded in (False, True):
            accs = []
            for seed in range(1, args.seeds + 1):
                t0 = time.time()
                acc = run_one(name, cfg, seed, folded)
                accs.append(acc)
                print(f"{name} folded={folded} seed={seed}: "
                      f"{100*acc:.2f}% ({time.time()-t0:.0f}s)", flush=True)
            arm = "folded" if folded else "vmap"
            results[f"{name}/{arm}"] = accs

    print()
    ok_all = True
    for name in args.configs.split(","):
        v = 100 * np.asarray(results[f"{name}/vmap"])
        f = 100 * np.asarray(results[f"{name}/folded"])
        pooled = float(np.sqrt((v.std(ddof=1) ** 2 + f.std(ddof=1) ** 2) / 2))
        delta = float(abs(f.mean() - v.mean()))
        tol = max(0.3, 0.75 * pooled)
        ok = delta <= tol
        ok_all &= ok
        print(f"{name}: vmap {v.mean():.2f}±{v.std(ddof=1):.2f}  "
              f"folded {f.mean():.2f}±{f.std(ddof=1):.2f}  "
              f"|Δ|={delta:.2f}pp tol={tol:.2f}pp -> {'PASS' if ok else 'FAIL'}",
              flush=True)

    out = os.path.join(REPO, "results", "folded_gate", "gate.json")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    with open(out, "w") as fjson:
        json.dump({"results": results, "pass": ok_all}, fjson, indent=1)
    print("wrote", out, "PASS" if ok_all else "FAIL")


if __name__ == "__main__":
    main()
