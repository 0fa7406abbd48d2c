"""Benchmark: steps/sec on the canonical HSQ config (reference README.md:3-8 —
hsq c-dim 16, k-bit 8, n-bit 6, 8 users, batch 32) with CIFAR-10-shaped data,
single chip.

Prints ONE JSON line:
    {"metric": ..., "value": steps_per_sec, "unit": "steps/s", "vs_baseline": r}

Robustness: XLA compile of the fused ResNet-50 step takes many minutes on a
tunneled TPU, so the measurement runs in a budgeted subprocess and falls back
from resnet50 -> resnet18 -> HSQ-kernel-only throughput; whichever completes
is reported (the metric string names what was measured).

``vs_baseline`` compares against the *reference implementation running the
same config* (the reference publishes no numbers — BASELINE.md — so it must
be measured).  The measurement is cached in BASELINE_MEASURED.json; if the
reference checkout + torch are available and no cache exists, it is measured
once on this host (CPU — torch has no TPU backend, which is the point of a
TPU-native rebuild).
"""

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")

STEPS_TIMED = 50  # longer window: +-0.5 steps/s run-to-run noise at 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# child: measure one e2e config, print one JSON line
# --------------------------------------------------------------------------

# the five canonical comparison configs (BASELINE.md / reference README.md:3-32)
CANONICAL = {
    "hsq": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6),
    "sgd": dict(quantizer="sgd"),
    "qsgd2bit": dict(quantizer="qsgd", c_dim=128, n_bit=2),
    "terngrad": dict(quantizer="terngrad"),
    "sign": dict(quantizer="sign"),
}


def measure_e2e(network: str, use_pallas: bool, quant: str = "hsq") -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gqx.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    from gqx.config import GQConfig
    from gqx.models import create_model
    from gqx.train import create_train_state, make_train_step

    cfg = GQConfig(
        network=network, dataset="synthetic", num_users=8, batch_size=32, seed=1,
        **CANONICAL[quant],
    )
    cfg.use_pallas = use_pallas
    # folded-users fast path: same per-user gradient math through a faster
    # fp composition (tests/test_folded.py; PERF.md) — ~+28% on hsq
    cfg.folded_users = os.environ.get("GQX_BENCH_FOLDED", "1") == "1"
    # unscanned ResNet + pallas encode compiles in ~30s and runs ~20% faster
    # than scan_blocks (the historic 14-min compile was the chunked-XLA
    # encode, retired by the v2 kernels)
    cfg.scan_blocks = os.environ.get("GQX_BENCH_SCAN", "0") == "1"
    cfg.compute_dtype = os.environ.get("GQX_BENCH_DTYPE", "bfloat16")
    log(f"e2e: network={network} backend={jax.default_backend()} "
        f"use_pallas={use_pallas} scan_blocks={cfg.scan_blocks} "
        f"compute_dtype={cfg.compute_dtype}")

    model = create_model(cfg.network, cfg.num_classes, cfg.scan_blocks,
                         dtype=cfg.compute_dtype)
    sample = jnp.zeros((cfg.batch_size, 32, 32, 3), jnp.float32)
    state, plan, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    train_step = make_train_step(cfg, model, plan, tx)

    total_params = sum(int(p.size) for p in jax.tree.leaves(state.params))
    wire = plan.wire_bytes()

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((cfg.num_users, cfg.batch_size, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(cfg.num_users, cfg.batch_size)), jnp.int32)
    scale, lr, wd = jnp.float32(1.0), jnp.float32(0.1), jnp.float32(5e-4)

    key = jax.random.PRNGKey(1)
    t0 = time.time()
    key, k = jax.random.split(key)
    state, loss = train_step(state, x, y, scale, lr, wd, k)
    # NB: on the tunneled platform jax.block_until_ready can return before
    # the device has executed; fetching the (state-chained) loss to host is
    # the only reliable execution barrier.
    float(loss)
    log(f"[{quant}] compile+first step: {time.time()-t0:.1f}s")

    for _ in range(3):  # settle clocks/caches before the timed window
        key, k = jax.random.split(key)
        state, loss = train_step(state, x, y, scale, lr, wd, k)
    float(loss)

    t0 = time.time()
    for _ in range(STEPS_TIMED):
        key, k = jax.random.split(key)
        state, loss = train_step(state, x, y, scale, lr, wd, k)
    float(loss)
    dt = time.time() - t0
    sps = STEPS_TIMED / dt
    log(f"[{quant}] {network}: {STEPS_TIMED} steps in {dt:.2f}s -> {sps:.3f} steps/s, "
        f"loss={float(loss):.4f}, wire={wire/1e6:.3f} MB/user/step "
        f"({4.0*total_params/max(wire,1):.1f}x vs fp32)")
    return {
        "steps_per_sec": sps,
        "wire_bytes_per_user_step": wire,
        "compression_ratio_vs_fp32": 4.0 * total_params / max(wire, 1),
    }


def measure_kernel_throughput() -> float:
    """HSQ encode+decode roundtrip throughput on a grouped-ResNet-50-sized
    gradient (steps/s-equivalent is not meaningful here; value is GB/s)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gqx.codebooks import get_codebook
    from gqx.ops.pallas_hsq import hsq_decode, hsq_encode

    dim, k = 16, 256
    m = 23498432 // dim
    cb = jnp.asarray(get_codebook(dim, k))
    rows = jnp.asarray(np.random.default_rng(0).standard_normal((m, dim)), jnp.float32)

    @jax.jit
    def rt(r):
        u, codes = hsq_encode(r, cb)
        return hsq_decode(codes, u, cb)

    from gqx.utils.timing import timeit as _timeit

    dt, out = _timeit(rt, rows, n=10)
    gbps = m * dim * 4 / dt / 1e9
    log(f"kernel roundtrip: {dt*1e3:.2f} ms -> {gbps:.1f} GB/s")
    return gbps


def child_main(kind: str, network: str):
    if kind == "e2e":
        use_pallas = os.environ.get("GQX_BENCH_PALLAS", "1") == "1"
        quants = os.environ.get("GQX_BENCH_QUANT", ",".join(CANONICAL)).split(",")
        configs = {}
        for q in quants:
            configs[q] = measure_e2e(network, use_pallas, q)
        print(json.dumps({"kind": "e2e", "network": network, "configs": configs}))
    else:
        gbps = measure_kernel_throughput()
        print(json.dumps({"kind": "kernel", "gbps": gbps}))


# --------------------------------------------------------------------------
# parent: budgets + fallbacks + baseline
# --------------------------------------------------------------------------

def run_child(kind: str, network: str, budget: float):
    try:
        proc = subprocess.run(
            [sys.executable, "-u", os.path.abspath(__file__), "--child", kind, network],
            capture_output=True, timeout=budget, text=True, cwd=REPO,
        )
        sys.stderr.write(proc.stderr[-4000:])
        if proc.returncode != 0:
            log(f"child {kind}/{network} failed rc={proc.returncode}")
            return None
        for line in reversed(proc.stdout.strip().splitlines()):
            try:
                return json.loads(line)
            except json.JSONDecodeError:
                continue
        return None
    except subprocess.TimeoutExpired as e:
        if e.stderr:
            err = e.stderr if isinstance(e.stderr, str) else e.stderr.decode(errors="replace")
            sys.stderr.write(err[-2000:])
        log(f"child {kind}/{network} exceeded budget {budget}s")
        return None


def measure_reference() -> float:
    """Run the reference implementation's one_iter on the same config
    (imported from the read-only checkout; synthetic tensors, CPU torch)."""
    ref = "/root/reference"
    if not os.path.isdir(ref):
        raise RuntimeError("reference checkout not available")
    import types

    import torch

    sys.path.insert(0, ref)
    cwd = os.getcwd()
    os.chdir(ref)  # codebook relative paths
    try:
        from models.resnet import ResNet50
        from quantizers.ps_quantizer import PSQuantizer
        from compressors.nearest_neighbor_compressor import NearestNeighborCompressor

        args = types.SimpleNamespace(
            c_dim=16, k_bit=8, n_bit=6, no_cuda=True, random=True,
            num_users=8, ef=False, two_phase=False, scale="exp", cr=256,
        )
        torch.manual_seed(1)
        model = ResNet50(num_classes=10)
        quantizer = PSQuantizer(NearestNeighborCompressor, model.parameters(), args)
        opt = torch.optim.SGD(model.parameters(), lr=0.1, momentum=0.9, weight_decay=5e-4)
        loss_fn = torch.nn.CrossEntropyLoss()
        xs = torch.randn(8, 32, 3, 32, 32)
        ys = torch.randint(0, 10, (8, 32))

        def one_iter():
            for u in range(8):
                opt.zero_grad()
                loss = loss_fn(model(xs[u]), ys[u])
                loss.backward()
                quantizer.record(u, epoch=1)
            quantizer.apply()
            opt.step()

        one_iter()  # warmup
        n = 2
        t0 = time.time()
        for _ in range(n):
            one_iter()
        dt = time.time() - t0
        sps = n / dt
        log(f"reference (torch CPU): {n} steps in {dt:.1f}s -> {sps:.4f} steps/s")
        return sps
    finally:
        os.chdir(cwd)
        sys.path.remove(ref)


def get_baseline() -> dict:
    if os.path.exists(BASELINE_CACHE):
        with open(BASELINE_CACHE) as f:
            return json.load(f)
    try:
        sps = measure_reference()
        rec = {
            "metric": "reference steps/s, hsq(16,256,6) resnet50 8users b32",
            "steps_per_sec": sps,
            "hardware": "host CPU (torch; reference has no TPU path)",
        }
        with open(BASELINE_CACHE, "w") as f:
            json.dump(rec, f, indent=1)
        return rec
    except Exception as e:  # no reference available on this host
        log(f"baseline measurement unavailable: {e}")
        return {"steps_per_sec": None}


def main():
    budget_50 = float(os.environ.get("GQX_BENCH_BUDGET_50", "1800"))
    budget_18 = float(os.environ.get("GQX_BENCH_BUDGET_18", "700"))

    result = run_child("e2e", "resnet50", budget_50)
    if result is None:
        result = run_child("e2e", "resnet18", budget_18)

    base = get_baseline()
    ref_sps = base.get("steps_per_sec")

    if result is not None:
        net = result["network"]
        configs = result["configs"]
        # full per-config table (BASELINE.json "configs"): steps/s + packed
        # wire bytes + ratio; the sgd row is the fp32 (uncompressed
        # aggregation) step-time comparison point
        with open(os.path.join(REPO, "BENCH_DETAILS.json"), "w") as f:
            json.dump({"network": net, "hardware": "1 chip",
                       "users": 8, "batch_per_user": 32,
                       "configs": configs}, f, indent=1)
        for q, r in configs.items():
            log(f"  {q:10s} {r['steps_per_sec']:8.3f} steps/s  "
                f"wire {r['wire_bytes_per_user_step']/1e6:8.3f} MB "
                f"({r['compression_ratio_vs_fp32']:6.1f}x)")
        sps = configs.get("hsq", next(iter(configs.values())))["steps_per_sec"]
        vs = (sps / ref_sps) if (ref_sps and net == "resnet50") else None
        print(json.dumps({
            "metric": f"train steps/s, {net}/cifar10-shape, hsq(d16,K256,n6), 8 users, batch 32, 1 chip",
            "value": round(sps, 4),
            "unit": "steps/s",
            "vs_baseline": round(vs, 3) if vs else None,
            "vs_baseline_note": "CROSS-HARDWARE: gqx on 1 TPU v5e chip vs the "
                                "reference (torch, no TPU path) on this host's "
                                "2 CPUs — a framework-capability ratio, not a "
                                "like-for-like chip comparison",
        }))
        return

    result = run_child("kernel", "-", 600)
    gbps = result["gbps"] if result else 0.0
    print(json.dumps({
        "metric": "HSQ encode+decode roundtrip throughput, 94 MB gradient (d16,K256), 1 chip",
        "value": round(gbps, 2),
        "unit": "GB/s",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--child":
        child_main(sys.argv[2], sys.argv[3])
    else:
        main()
