"""Multi-seed / k-fold convergence-parity studies: gqx vs the reference.

Generalizes scripts/parity_digits.py (round 2) along every axis VERDICT r2
asked for:

  - statistical power: k-fold cross-validation over the full 1,797 digits
    (``--folds k`` runs each seed on every fold, so every sample is tested
    exactly once per seed) and arbitrary seed lists — paired by (seed, fold)
    across configs so config deltas cancel seed/fold variance;
  - model families: fcn (digits/28x28x1), cnn (digits/28x28x1), and
    resnet18 (digits32/32x32x3) — the conv/BatchNorm convergence evidence the
    round-2 verdict flagged as missing;
  - aggregation modes: error feedback (hsq_ef), two-phase downlink
    recompression (hsq_2ph), ring chain (hsq_ring / sgd_ring), and the
    gqx-only segmented ring (hsq_ringseg, run under the 8-virtual-device CPU
    mesh: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8).

Reference side = the actual reference implementation (torch CPU, imported
from /root/reference: its models, its PS/Ring quantizers, its compressors,
its shipped codebooks), driven step-for-step like reference main.py:175-233.

Each run appends one JSON line to --out; --summarize renders the table.

Usage:
  python scripts/parity_study.py --side reference --network fcn \
      --configs sgd,hsq --seeds 1-5 --folds 6 --out results/study/power.jsonl
  python scripts/parity_study.py --summarize results/study/power.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REFERENCE = "/root/reference"

# config name -> (quantizer kwargs, run kwargs)
CONFIGS = {
    "sgd": dict(quantizer="sgd"),
    # strict-parity hsq configs pin hsq_passes=2 (fp32-exact encode): the
    # GQConfig default flipped to passes=1 in round 3, and without the pin
    # the hsq-vs-hsq_p1 gate would compare identical configs (ADVICE r3)
    "hsq": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6, hsq_passes=2),
    "qsgd2bit": dict(quantizer="qsgd", c_dim=128, n_bit=2),
    "terngrad": dict(quantizer="terngrad"),
    "sign": dict(quantizer="sign"),
    # CNN (LeNet) HSQ uses c_dim=8: the reference's own dim fixup
    # (nearest_neighbor_compressor.py:23-38, dim //2*3 walk) cannot make 16
    # divide its 25,000-element conv2 weight and asserts out — d=8 divides
    # every >1000 CNN leaf on both sides, so the comparison is runnable.
    "hsq8": dict(quantizer="hsq", c_dim=8, k_bit=8, n_bit=6, hsq_passes=2),
    # gqx-only approximation gates (no reference counterpart — compared
    # against gqx's own exact hsq, paired by seed):
    #   hsq_p1: passes=1 bf16-rounded encode input (PERF.md round-3)
    "hsq_p1": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6, hsq_passes=1),
    "hsq_ef": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6, ef=True),
    "hsq_2ph": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6, two_phase=True),
    "hsq_ring": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6, mode="ring"),
    "sgd_ring": dict(quantizer="sgd", mode="ring"),
    # gqx-only: bandwidth-optimal segmented compressed ring reduce-scatter
    # (no reference counterpart; needs backend=mesh on >=num_users devices)
    "hsq_ringseg": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6,
                        mode="ring", ring_mode="segmented", backend="mesh"),
    "sgd_ringseg": dict(quantizer="sgd", mode="ring", ring_mode="segmented",
                        backend="mesh"),
    # round-4 segmented-ring EF gate (VERDICT r3 item 4): ring modes output
    # a SUM over 8 users, so lr 0.1 collapses on this schedule (round-3
    # study); the gate runs at lr 0.0125 (= 0.1/8, the mean-equivalent) so
    # chain-EF vs segmented-EF convergence is comparable at a stable lr.
    "hsq_ring_ef_lr8": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6,
                            mode="ring", ef=True, lr=0.0125),
    "hsq_ringseg_ef_lr8": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6,
                               mode="ring", ring_mode="segmented", ef=True,
                               backend="mesh", lr=0.0125),
    "hsq_ringseg_lr8": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6,
                            mode="ring", ring_mode="segmented",
                            backend="mesh", lr=0.0125),
    "hsq_ring_lr8": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6,
                         mode="ring", lr=0.0125),
    "sgd_lr8": dict(quantizer="sgd", lr=0.0125),
    # round-5 EF-win gate (VERDICT r4 item 4): the textbook case where
    # aggressive compression alone degrades accuracy and error feedback is
    # the classic fix — top-k with cr=256 (0.4% of coordinates kept), PS
    # mode, CONSTANT scale 1 (no warmup, reference ps_quantizer.py:28-31
    # else-branch).  Run on both sides, paired by seed/fold; expect
    # topk_ef > topk with CI on both, ΔΔ ≈ 0.
    "topk": dict(quantizer="topk", cr=256, scale="1"),
    "topk_ef": dict(quantizer="topk", cr=256, ef=True, scale="1"),
    # secondary EF case: TernGrad (qsgd n_bit=1, whole-layer bucket)
    "terngrad_ef": dict(quantizer="terngrad", ef=True, scale="1"),
    "terngrad_s1": dict(quantizer="terngrad", scale="1"),
    # harsher sparsity (cr=4096: W1 keeps 49 of 200704 coords) and the exp
    # warmup scale — sweep to locate the regime where plain top-k collapses
    # and EF rescues it
    "topk_hi": dict(quantizer="topk", cr=4096, scale="1"),
    "topk_hi_ef": dict(quantizer="topk", cr=4096, ef=True, scale="1"),
    "topk_hi_ef_exp": dict(quantizer="topk", cr=4096, ef=True, scale="exp"),
    "topk_ef_exp": dict(quantizer="topk", cr=256, ef=True, scale="exp"),
}

NETWORK_DATASET = {"fcn": "digits", "cnn": "digits", "resnet18": "digits32",
                   "resnet34": "digits32", "vgg11": "digits32",
                   "dense": "digits32"}
NUM_USERS = 8
BATCH = 32
EPOCHS = 20  # MNIST-family schedule; both sides run the epochs+1 quirk


def fold_arg(folds, fold_idx):
    return None if folds in (0, None) else (folds, fold_idx)


def digits_arrays(dataset: str, fold):
    """The exact arrays both sides train/eval on (normalized float32 NHWC)."""
    from gqx.data.datasets import load_dataset
    from gqx.data.transforms import normalize

    kwargs = {"fold": fold} if fold is not None else {}
    (tr_x, tr_y), (te_x, te_y) = load_dataset(dataset, "", **kwargs)
    return (
        normalize(tr_x, dataset), tr_y.astype(np.int64),
        normalize(te_x, dataset), te_y.astype(np.int64),
    )


# ---------------------------------------------------------------------------
# reference side (torch CPU, /root/reference modules)
# ---------------------------------------------------------------------------

def run_reference(network: str, cfg: dict, data, seed: int) -> list:
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
            TopKSparsificationCompressor,
        )
        from models.cnn import CNN
        from models.fcn import FCN
        from models.resnet import ResNet18, ResNet34
        from quantizers.ps_quantizer import PSQuantizer
        from quantizers.ring_quantizer import RingQuantizer

        comp_cls = {
            "sgd": IdenticalCompressor,
            "hsq": NearestNeighborCompressor,
            "qsgd": QSGDCompressor,
            "terngrad": QSGDCompressor,
            "sign": SignSGDCompressor,
            "topk": TopKSparsificationCompressor,
        }[cfg["quantizer"]]
        c_dim = cfg.get("c_dim", 0 if cfg["quantizer"] == "terngrad" else 32)
        n_bit = cfg.get("n_bit", 1 if cfg["quantizer"] == "terngrad" else 8)
        args = types.SimpleNamespace(
            c_dim=c_dim, k_bit=cfg.get("k_bit", 8), n_bit=n_bit,
            no_cuda=True, random=True, num_users=NUM_USERS,
            ef=cfg.get("ef", False), two_phase=cfg.get("two_phase", False),
            scale=cfg.get("scale", "exp"), cr=cfg.get("cr", 256),
            mode=cfg.get("mode", "ps"),
        )
        if network == "cnn":
            # this torch-CPU build's oneDNN conv emits channels-last tensors,
            # which breaks the reference CNN's `x.view(-1, 4*4*50)`
            # (reference models/cnn.py:19, written for contiguous NCHW);
            # disable mkldnn so the unmodified reference code runs
            torch.backends.mkldnn.enabled = False
        torch.manual_seed(seed)
        model = {"fcn": lambda: FCN(num_classes=10),
                 "cnn": CNN,
                 "resnet18": lambda: ResNet18(num_classes=10),
                 "resnet34": lambda: ResNet34(num_classes=10)}[network]()
        q_cls = RingQuantizer if args.mode == "ring" else PSQuantizer
        quantizer = q_cls(comp_cls, model.parameters(), args)
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

        g = torch.Generator().manual_seed(7 + 1000 * seed)
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
            model.eval()
            with torch.no_grad():
                correct = 0
                for lo in range(0, len(TX), 512):
                    out = model(TX[lo:lo + 512])
                    correct += int((out.argmax(1) == TY[lo:lo + 512]).sum())
                acc = correct / len(TY)
            model.train()
            rows.append((epoch, last_loss, acc))
        return rows
    finally:
        os.chdir(cwd)
        sys.path.remove(REFERENCE)


# ---------------------------------------------------------------------------
# gqx side
# ---------------------------------------------------------------------------

def run_gqx(network: str, cfg: dict, seed: int, fold, out_dir: str,
            tag: str) -> list:
    import csv

    from gqx.config import GQConfig
    from gqx.runner import run_training

    cfg = dict(cfg)
    backend = cfg.pop("backend", "sim")
    logdir = os.path.join(out_dir, f"tb_gqx_{tag}")
    gq = GQConfig(
        network=network, dataset=NETWORK_DATASET[network],
        num_users=NUM_USERS, batch_size=BATCH, seed=seed, log_epoch=1,
        logdir=logdir, backend=backend,
        dataset_kwargs=({"fold": list(fold)} if fold is not None else None),
        **cfg,
    )
    gq.quant_layout = "torch"  # strict reference-partition parity
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


# ---------------------------------------------------------------------------
# driver + summary
# ---------------------------------------------------------------------------

def parse_seeds(spec: str):
    out = []
    for part in spec.split(","):
        if "-" in part:
            a, b = part.split("-")
            out.extend(range(int(a), int(b) + 1))
        else:
            out.append(int(part))
    return out


def summarize(paths):
    runs = []
    for p in paths:
        with open(p) as f:
            runs.extend(json.loads(l) for l in f if l.strip())
    keys = sorted({(r["side"], r["network"], r["config"]) for r in runs})
    by_key = {k: [r for r in runs
                  if (r["side"], r["network"], r["config"]) == k]
              for k in keys}

    def acc(r):
        return 100.0 * r["final_acc"]

    def paired_deltas(side, net, cfgname):
        """Per-(seed, fold) config-minus-sgd accuracy deltas (paired runs
        cancel seed/fold variance)."""
        rs = by_key.get((side, net, cfgname), [])
        base = by_key.get((side, net, "sgd"), [])
        base_map = {(r["seed"], tuple(r.get("fold") or ())): acc(r) for r in base}
        return np.array([
            acc(r) - base_map[(r["seed"], tuple(r.get("fold") or ()))]
            for r in rs
            if (r["seed"], tuple(r.get("fold") or ())) in base_map
        ])

    def mean_se(x):
        if len(x) < 2:
            return (x.mean() if len(x) else float("nan")), float("nan")
        return x.mean(), x.std(ddof=1) / np.sqrt(len(x))

    print(f"{'side':<10} {'network':<9} {'config':<12} {'n':>3}  "
          f"{'final acc %':>14}  {'Δ vs own sgd (paired)':>22}")
    for (side, net, cfgname) in keys:
        rs = by_key[(side, net, cfgname)]
        accs = np.array([acc(r) for r in rs])
        d = ""
        if cfgname != "sgd":
            deltas = paired_deltas(side, net, cfgname)
            if len(deltas):
                m, se = mean_se(deltas)
                d = f"{m:+6.2f} ± {1.96 * se:.2f} (95% CI)"
        print(f"{side:<10} {net:<9} {cfgname:<12} {len(rs):>3}  "
              f"{accs.mean():8.2f} ± {accs.std(ddof=1) if len(accs) > 1 else 0:.2f}  {d:>22}")

    # cross-side comparison: is gqx's delta-vs-its-own-sgd the same as the
    # reference's? (the round-3 headline parity statistic)
    nets_cfgs = sorted({(net, c) for (_, net, c) in keys if c != "sgd"})
    header = False
    for net, cfgname in nets_cfgs:
        dg, dr = (paired_deltas(s, net, cfgname) for s in ("gqx", "reference"))
        if not (len(dg) and len(dr)):
            continue
        if not header:
            print("\ngqx Δ − reference Δ (ΔΔ; 0 within CI = parity):")
            header = True
        mg, seg = mean_se(dg)
        mr, ser = mean_se(dr)
        se = float(np.sqrt(seg ** 2 + ser ** 2))
        dd = mg - mr
        verdict = "PARITY" if abs(dd) <= 1.96 * se else "DEVIATION"
        print(f"  {net:<9} {cfgname:<12} ΔΔ = {dd:+5.2f} ± {1.96 * se:.2f} pp "
              f"(gqx {mg:+5.2f}, ref {mr:+5.2f})  -> {verdict}")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--side", choices=("gqx", "reference"), default="gqx")
    p.add_argument("--network", default="fcn")
    p.add_argument("--configs", default="sgd,hsq")
    p.add_argument("--seeds", default="1-5")
    p.add_argument("--folds", type=int, default=0,
                   help="k-fold CV over all 1797 digits (0 = legacy fixed split)")
    p.add_argument("--out", default="results/study/study.jsonl")
    p.add_argument("--summarize", nargs="*", default=None)
    p.add_argument("--cpu-mesh", type=int, default=0,
                   help="run gqx on a virtual CPU mesh with N devices "
                        "(for the mesh-backend ring configs)")
    args = p.parse_args()

    if args.cpu_mesh:
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.cpu_mesh}"
        )
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.summarize is not None:
        summarize(args.summarize or [args.out])
        return

    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    seeds = parse_seeds(args.seeds)
    fold_ids = list(range(args.folds)) if args.folds else [None]
    dataset = NETWORK_DATASET[args.network]
    names = args.configs.split(",")

    for seed in seeds:
        for fi in fold_ids:
            fold = fold_arg(args.folds, fi) if fi is not None else None
            data = digits_arrays(dataset, fold) if args.side == "reference" else None
            for name in names:
                cfg = dict(CONFIGS[name])
                tag = f"{args.network}_{name}_s{seed}" + (f"_f{fi}" if fi is not None else "")
                t0 = time.time()
                if args.side == "reference":
                    rows = run_reference(args.network, cfg, data, seed)
                else:
                    rows = run_gqx(args.network, cfg, seed, fold,
                                   os.path.dirname(args.out), tag)
                rec = {
                    "side": args.side, "network": args.network, "config": name,
                    "seed": seed, "fold": list(fold) if fold else None,
                    "final_acc": rows[-1][2], "final_loss": rows[-1][1],
                    "epochs": len(rows), "secs": round(time.time() - t0, 1),
                    "curve": [[r[0], round(r[1], 5), round(r[2], 5)] for r in rows],
                }
                with open(args.out, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"[{args.side}] {tag}: final {rows[-1][2]*100:.2f}% "
                      f"({rec['secs']}s)", flush=True)


if __name__ == "__main__":
    main()
