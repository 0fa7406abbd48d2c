"""Benchmark: steps/sec on the canonical HSQ config (reference README.md:3-8 —
hsq c-dim 16, k-bit 8, n-bit 6, 8 users, batch 32) with CIFAR-10-shaped data
on ResNet-50, single chip.

Prints ONE JSON line:
    {"metric": ..., "value": steps_per_sec, "unit": "steps/s", "vs_baseline": r}

``vs_baseline`` compares against the *reference implementation running the
same config* (the reference publishes no numbers — BASELINE.md — so it must
be measured).  The measurement is cached in BASELINE_MEASURED.json; if the
reference checkout + torch are available and no cache exists, it is measured
once on this host (CPU — torch has no TPU backend, which is the point of a
TPU-native rebuild).
"""

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
BASELINE_CACHE = os.path.join(REPO, "BASELINE_MEASURED.json")

STEPS_WARMUP = 3
STEPS_TIMED = 20


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def measure_gqx() -> float:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gqx.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()

    from gqx.config import GQConfig
    from gqx.models import create_model
    from gqx.train import create_train_state, make_train_step

    cfg = GQConfig(
        network=os.environ.get("GQX_BENCH_NETWORK", "resnet50"),
        dataset="synthetic",
        quantizer="hsq",
        c_dim=16,
        k_bit=8,
        n_bit=6,
        num_users=8,
        batch_size=32,
        seed=1,
    )
    # Mosaic (Pallas) kernel compilation takes minutes per kernel on a
    # tunneled TPU and is not persistently cached, so the e2e bench uses the
    # XLA path by default; the Pallas kernels are benchmarked in isolation
    # below (GQX_BENCH_KERNELS).  Set GQX_BENCH_PALLAS=1 to include them.
    cfg.use_pallas = os.environ.get("GQX_BENCH_PALLAS", "0") == "1"
    log(f"backend={jax.default_backend()} use_pallas={cfg.use_pallas}")

    model = create_model(cfg.network, cfg.num_classes)
    sample = jnp.zeros((cfg.batch_size, 32, 32, 3), jnp.float32)
    state, comps, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    train_step = make_train_step(cfg, model, comps, tx)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((cfg.num_users, cfg.batch_size, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(cfg.num_users, cfg.batch_size)), jnp.int32)
    scale, lr = jnp.float32(1.0), jnp.float32(0.1)

    key = jax.random.PRNGKey(1)
    t_compile = time.time()
    for i in range(STEPS_WARMUP):
        key, k = jax.random.split(key)
        state, loss = train_step(state, x, y, scale, lr, k)
    jax.block_until_ready(loss)
    log(f"warmup+compile: {time.time()-t_compile:.1f}s")

    t0 = time.time()
    for i in range(STEPS_TIMED):
        key, k = jax.random.split(key)
        state, loss = train_step(state, x, y, scale, lr, k)
    jax.block_until_ready(loss)
    dt = time.time() - t0
    sps = STEPS_TIMED / dt
    log(f"gqx: {STEPS_TIMED} steps in {dt:.2f}s -> {sps:.3f} steps/s, loss={float(loss):.4f}")
    return sps


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


def measure_kernels():
    """Microbench: fused Pallas HSQ encode/decode vs the pure-XLA path, on a
    grouped-ResNet-50-sized gradient (reported to stderr only)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gqx.codebooks import get_codebook
    from gqx.ops.pallas_hsq import hsq_decode, hsq_decode_xla, hsq_encode

    dim, k = 16, 256
    m = 23498432 // dim
    cb = jnp.asarray(get_codebook(dim, k))
    rows = jnp.asarray(np.random.default_rng(0).standard_normal((m, dim)), jnp.float32)

    def timeit(fn, *a, n=10):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(n):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.time() - t0) / n

    enc_xla = jax.jit(
        lambda r: (lambda p: (jnp.take_along_axis(p, jnp.argmax(jnp.abs(p), 1)[:, None], 1)[:, 0],
                              jnp.argmax(jnp.abs(p), 1)))(
            jnp.dot(r, cb.T, preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.HIGHEST))
    )
    t_xla = timeit(enc_xla, rows)
    t_pl = timeit(lambda r: hsq_encode(r, cb), rows)
    gb = m * dim * 4 / 1e9
    log(f"hsq_encode {gb:.2f} GB: xla {t_xla*1e3:.2f} ms ({gb/t_xla:.0f} GB/s), "
        f"pallas {t_pl*1e3:.2f} ms ({gb/t_pl:.0f} GB/s), speedup {t_xla/t_pl:.2f}x")

    u, codes = hsq_encode(rows, cb)
    t_dx = timeit(lambda c, uu: hsq_decode_xla(c, uu, cb), codes, u)
    t_dp = timeit(lambda c, uu: hsq_decode(c, uu, cb), codes, u)
    log(f"hsq_decode: xla-gather {t_dx*1e3:.2f} ms ({gb/t_dx:.0f} GB/s), "
        f"pallas {t_dp*1e3:.2f} ms ({gb/t_dp:.0f} GB/s), speedup {t_dx/t_dp:.2f}x")


def main():
    if os.environ.get("GQX_BENCH_KERNELS", "0") == "1":
        measure_kernels()
    sps = measure_gqx()
    base = get_baseline()
    ref_sps = base.get("steps_per_sec")
    vs = (sps / ref_sps) if ref_sps else None
    print(json.dumps({
        "metric": "train steps/s, resnet50/cifar10-shape, hsq(d16,K256,n6), 8 users, batch 32, 1 chip",
        "value": round(sps, 4),
        "unit": "steps/s",
        "vs_baseline": round(vs, 3) if vs else None,
    }))


if __name__ == "__main__":
    main()
