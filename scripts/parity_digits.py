"""Convergence-parity harness on REAL data: gqx vs the reference.

MNIST/CIFAR raw files are unavailable in this environment (zero network
egress), so the real-image stand-in is scikit-learn's bundled UCI
hand-written digits dataset (1797 genuine 8x8 digit scans, upscaled to
28x28 — see gqx/data/datasets.py load_digits_data).  The REFERENCE
IMPLEMENTATION ITSELF (torch CPU: its FCN, its PSQuantizer, its
compressors, loaded from /root/reference) is trained on the identical
arrays with the identical schedule (MNIST table: 20(+1) epochs, lr 0.1
flat — reference main.py:136-139,159), so the headline comparison —
top-1 Δ of each quantizer vs its own fp32-SGD baseline — is
apples-to-apples per implementation.

Outputs: logs/parity/{impl}_{config}.csv (epoch, loss, accuracy) and
PARITY_RESULTS.md at the repo root.

Usage: python scripts/parity_digits.py [--skip-reference] [--skip-gqx]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(REPO, "results", "parity")

# The five canonical configs (reference README.md:3-32, BASELINE.md).
CONFIGS = {
    "sgd": dict(quantizer="sgd"),
    "hsq": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6),
    "qsgd2bit": dict(quantizer="qsgd", c_dim=128, n_bit=2),
    "terngrad": dict(quantizer="terngrad"),  # == qsgd n_bit=1, c_dim=0
    "sign": dict(quantizer="sign"),
}

NUM_USERS = 8
BATCH = 32
EPOCHS = 20  # MNIST schedule; both sides run the reference's epochs+1 quirk


def digits_arrays():
    from gqx.data.datasets import load_digits_data
    from gqx.data.transforms import normalize

    (tr_x, tr_y), (te_x, te_y) = load_digits_data()
    return (
        normalize(tr_x, "digits"), tr_y.astype(np.int64),
        normalize(te_x, "digits"), te_y.astype(np.int64),
    )


def write_csv(path, rows):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["epoch", "loss", "accuracy"])
        w.writerows(rows)


# ---------------------------------------------------------------------------
# reference side (torch CPU, /root/reference modules)
# ---------------------------------------------------------------------------

def run_reference(name: str, cfg: dict, data, network: str = "fcn") -> list:
    import torch

    sys.path.insert(0, REFERENCE)
    cwd = os.getcwd()
    os.chdir(REFERENCE)  # HSQ loads ./codebooks/learned_codebook/...
    try:
        from compressors import (
            IdenticalCompressor,
            NearestNeighborCompressor,
            QSGDCompressor,
            SignSGDCompressor,
        )
        from models.cnn import CNN
        from models.fcn import FCN
        from quantizers.ps_quantizer import PSQuantizer

        comp_cls = {
            "sgd": IdenticalCompressor,
            "hsq": NearestNeighborCompressor,
            "qsgd": QSGDCompressor,
            "terngrad": QSGDCompressor,
            "sign": SignSGDCompressor,
        }[cfg["quantizer"]]
        c_dim = cfg.get("c_dim", 0 if cfg["quantizer"] == "terngrad" else 32)
        n_bit = cfg.get("n_bit", 1 if cfg["quantizer"] == "terngrad" else 8)
        args = types.SimpleNamespace(
            c_dim=c_dim, k_bit=cfg.get("k_bit", 8), n_bit=n_bit,
            no_cuda=True, random=True, num_users=NUM_USERS, ef=False,
            two_phase=False, scale="exp", cr=256, mode="ps",
        )
        torch.manual_seed(1)
        model = FCN(num_classes=10)
        quantizer = PSQuantizer(comp_cls, model.parameters(), args)
        if cfg["quantizer"] == "sign":
            lr, momentum, wd = 1e-3, 0.0, 0.1  # reference main.py:149-157
        else:
            lr, momentum, wd = 0.1, 0.9, 5e-4
        opt = torch.optim.SGD(model.parameters(), lr=lr, momentum=momentum,
                              weight_decay=wd)
        loss_fn = torch.nn.CrossEntropyLoss()

        tr_x, tr_y, te_x, te_y = data
        X = torch.from_numpy(np.ascontiguousarray(
            tr_x.transpose(0, 3, 1, 2), np.float32))
        Y = torch.from_numpy(tr_y)
        TX = torch.from_numpy(np.ascontiguousarray(
            te_x.transpose(0, 3, 1, 2), np.float32))
        TY = torch.from_numpy(te_y)

        g = torch.Generator().manual_seed(7)
        global_b = BATCH * NUM_USERS
        steps = len(X) // global_b
        rows = []
        for epoch in range(1, EPOCHS + 2):  # reference main.py:159 quirk
            perm = torch.randperm(len(X), generator=g)
            last_loss = 0.0
            for s in range(steps):
                idx = perm[s * global_b:(s + 1) * global_b]
                losses = []
                for u in range(NUM_USERS):
                    sl = idx[u * BATCH:(u + 1) * BATCH]
                    opt.zero_grad()
                    loss = loss_fn(model(X[sl]), Y[sl])
                    loss.backward()
                    quantizer.record(u, epoch)
                    losses.append(float(loss))
                quantizer.apply()
                opt.step()
                last_loss = float(np.mean(losses))
            with torch.no_grad():
                out = model(TX)
                acc = float((out.argmax(1) == TY).float().mean())
            rows.append((epoch, last_loss, acc))
        return rows
    finally:
        os.chdir(cwd)
        sys.path.remove(REFERENCE)


# ---------------------------------------------------------------------------
# gqx side
# ---------------------------------------------------------------------------

def run_gqx(name: str, cfg: dict) -> list:
    from gqx.config import GQConfig
    from gqx.runner import run_training

    logdir = os.path.join(OUT_DIR, f"tb_gqx_{name}")
    gq = GQConfig(
        network="fcn", dataset="digits", num_users=NUM_USERS,
        batch_size=BATCH, seed=1, log_epoch=1, logdir=logdir,
        **cfg,
    )
    # strict reference-partition parity (== the default 'outfirst' for FCN's
    # dense leaves, pinned for documentation)
    gq.quant_layout = "torch"
    state, acc = run_training(gq, progress=False)
    rows = []
    with open(os.path.join(logdir, "scalars.csv")) as f:
        loss_by_step, acc_by_step = {}, {}
        for rec in csv.DictReader(f):
            if rec["tag"] == "loss":
                loss_by_step[int(rec["step"])] = float(rec["value"])
            elif rec["tag"] == "accuracy(%)":
                acc_by_step[int(rec["step"])] = float(rec["value"]) / 100.0
    for i, step in enumerate(sorted(loss_by_step), start=1):
        rows.append((i, loss_by_step[step], acc_by_step.get(step, float("nan"))))
    return rows


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--skip-reference", action="store_true")
    p.add_argument("--skip-gqx", action="store_true")
    p.add_argument("--configs", default=",".join(CONFIGS))
    args = p.parse_args()
    names = args.configs.split(",")

    os.makedirs(OUT_DIR, exist_ok=True)
    data = digits_arrays()
    final = {}
    for name in names:
        cfg = dict(CONFIGS[name])
        if not args.skip_gqx:
            t0 = time.time()
            rows = run_gqx(name, cfg)
            write_csv(os.path.join(OUT_DIR, f"gqx_{name}.csv"), rows)
            final[("gqx", name)] = rows[-1]
            print(f"gqx {name}: final acc {rows[-1][2]:.4f} ({time.time()-t0:.0f}s)")
        if not args.skip_reference:
            t0 = time.time()
            rows = run_reference(name, cfg, data)
            write_csv(os.path.join(OUT_DIR, f"reference_{name}.csv"), rows)
            final[("reference", name)] = rows[-1]
            print(f"reference {name}: final acc {rows[-1][2]:.4f} ({time.time()-t0:.0f}s)")

    if final:
        summary_path = os.path.join(OUT_DIR, "summary.csv")
        with open(summary_path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["impl", "config", "final_loss", "final_accuracy"])
            for (impl, name), (ep, loss, acc) in sorted(final.items()):
                w.writerow([impl, name, loss, acc])
        print("wrote", summary_path)


if __name__ == "__main__":
    main()
