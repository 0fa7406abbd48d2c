"""Full-train-step mesh-vs-sim timing on the real chip (VERDICT r3 item 6).

The mesh backend (shard_map collectives) had only ever been timed on the
CPU mesh; this measures, honest-barrier on the TPU with a 1-device mesh
hosting all 8 users locally:

  sim_folded    ship config (folded fwd/bwd + batched sim aggregation)
  sim_vmap      sim backend, vmap users (the mesh body's fwd/bwd shape)
  mesh_logical  shard_map step, pmean of decompressed fp32
  mesh_packed   shard_map step, all-gather of bit-packed payloads
                (pack/unpack kernels on the TPU hot path)

mesh_* vs sim_vmap isolates the mesh-machinery overhead (shard_map,
collective lowering at world=1, per-unit loop vs batched kernels);
mesh_packed vs mesh_logical isolates the TPU pack/unpack cost.

Usage: python scripts/bench_mesh_step_tpu.py [hsq|sgd|...] [network]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.utils.timing import timeit


def build(cfg_kwargs, network):
    from gqx.config import GQConfig
    from gqx.data import Pipeline
    from gqx.models import create_model
    from gqx.parallel.collectives import make_mesh_train_step
    from gqx.train import create_train_state, make_train_step

    cfg = GQConfig(network=network, dataset="synthetic", num_users=8,
                   batch_size=32, seed=1, compute_dtype="bfloat16",
                   use_pallas=jax.default_backend() == "tpu", **cfg_kwargs)
    pipeline = Pipeline(cfg)
    model = create_model(cfg.network, cfg.num_classes, cfg.scan_blocks,
                         dtype=cfg.compute_dtype)
    sample = jnp.zeros((cfg.batch_size,) + pipeline.image_shape, jnp.float32)
    state, plan, tx = create_train_state(cfg, model, sample,
                                         jax.random.PRNGKey(0))
    if cfg.backend == "mesh":
        step_fn, state = make_mesh_train_step(cfg, model, plan, tx, state)
    else:
        step_fn = make_train_step(cfg, model, plan, tx)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(
        (cfg.num_users, cfg.batch_size) + pipeline.image_shape), jnp.float32)
    y = jnp.asarray(rng.integers(0, cfg.num_classes,
                                 (cfg.num_users, cfg.batch_size)), jnp.int32)
    return step_fn, state, x, y


def main():
    from gqx.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    quant = sys.argv[1] if len(sys.argv) > 1 else "hsq"
    network = sys.argv[2] if len(sys.argv) > 2 else "resnet50"
    qkw = {"hsq": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6),
           "sgd": dict(quantizer="sgd"),
           "qsgd2bit": dict(quantizer="qsgd", c_dim=128, n_bit=2)}[quant]
    print(f"backend={jax.default_backend()} devices={len(jax.devices())} "
          f"quant={quant} network={network}")

    variants = {
        "sim_folded": dict(backend="sim", folded_users=True),
        "sim_vmap": dict(backend="sim", folded_users=False),
        "mesh_logical": dict(backend="mesh", wire="logical"),
        "mesh_packed": dict(backend="mesh", wire="packed"),
    }
    if len(sys.argv) > 3:  # optional comma-list of variants (partial reruns)
        keep = set(sys.argv[3].split(","))
        variants = {k: v for k, v in variants.items() if k in keep}
    out = {}
    for name, extra in variants.items():
        import time

        t0 = time.time()
        step_fn, state, x, y = build({**qkw, **extra}, network)
        args = (jnp.float32(1.0), jnp.float32(0.05), jnp.float32(5e-4))

        def run(st, key):
            st, loss = step_fn(st, x, y, *args, key)
            return st, loss

        state, _ = run(state, jax.random.PRNGKey(1))  # compile
        print(f"  [{name}] compiled in {time.time()-t0:.0f}s", flush=True)
        # state-chained timing (donated states require fresh ones per call)
        import time as _t

        from gqx.utils.timing import fetch_barrier

        n = 20
        st = state
        loss = None
        for _ in range(2):
            st, loss = run(st, jax.random.PRNGKey(2))
        fetch_barrier(loss)
        t0 = _t.time()
        for i in range(n):
            st, loss = run(st, jax.random.PRNGKey(3 + i))
        fetch_barrier(loss)
        dt = (_t.time() - t0) / n
        out[name] = round(dt * 1e3, 2)
        print(f"  {name:13s} {dt*1e3:8.2f} ms/step ({1/dt:.2f} steps/s)",
              flush=True)

    os.makedirs("results", exist_ok=True)
    path = os.path.join(
        "results", f"mesh_step_{jax.default_backend()}_{quant}_{network}.json")
    with open(path, "w") as f:
        json.dump({"quant": quant, "network": network,
                   "platform": jax.default_backend(), "ms_per_step": out}, f,
                  indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
