"""Step-time breakdown on the bench config (resnet50, 8 users, batch 32).

For each canonical quantizer config, times on the real chip:
  fwd_bwd    vmap-users value_and_grad only
  pack       plan.pack on the per-user gradient pytree
  aggregate  full quantized aggregation (pack+encode+decode_mean+unpack)
  update     wd + momentum trace + sgd apply
  full       the fused train_step (what bench.py measures)

Usage:  python scripts/step_breakdown.py [hsq,sgd,sign,...] [network]
Writes a markdown table to stdout; commit the result into PERF.md.
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

CANONICAL = {
    "hsq": dict(quantizer="hsq", c_dim=16, k_bit=8, n_bit=6),
    "sgd": dict(quantizer="sgd"),
    "qsgd2bit": dict(quantizer="qsgd", c_dim=128, n_bit=2),
    "terngrad": dict(quantizer="terngrad"),
    "sign": dict(quantizer="sign"),
}


from gqx.utils.timing import timeit  # noqa: E402  (true device barrier)


def breakdown(quant: str, network: str):
    from gqx.config import GQConfig
    from gqx.models import create_model
    from gqx.train import create_train_state, make_train_step, cross_entropy
    from gqx.parallel.aggregate import make_aggregator
    from gqx.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = GQConfig(network=network, dataset="synthetic", num_users=8,
                   batch_size=32, seed=1, **CANONICAL[quant])
    cfg.scan_blocks = False
    cfg.compute_dtype = "bfloat16"
    cfg.use_pallas = jax.default_backend() == "tpu"

    model = create_model(cfg.network, cfg.num_classes, cfg.scan_blocks,
                         dtype=cfg.compute_dtype)
    sample = jnp.zeros((cfg.batch_size, 32, 32, 3), jnp.float32)
    state, plan, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    train_step = make_train_step(cfg, model, plan, tx)

    rng = np.random.default_rng(0)
    U, B = cfg.num_users, cfg.batch_size
    x = jnp.asarray(rng.standard_normal((U, B, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(U, B)), jnp.int32)
    scale, lr, wd = jnp.float32(1.0), jnp.float32(0.1), jnp.float32(5e-4)
    key = jax.random.PRNGKey(1)

    # --- fwd/bwd only ---
    def user_grads(params, batch_stats, xu, yu):
        def loss_fn(p):
            out = model.apply({"params": p, "batch_stats": batch_stats},
                              xu, train=True, mutable=["batch_stats"])
            logits, mutated = out
            return cross_entropy(logits, yu), mutated["batch_stats"]
        (loss, st), gr = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, gr, st

    fb = jax.jit(lambda p, s, x_, y_: jax.vmap(
        lambda xu, yu: user_grads(p, s, xu, yu))(x_, y_))
    dt_fb, (losses, grads, _) = timeit(fb, state.params, state.batch_stats, x, y)

    # --- pack only ---
    packf = jax.jit(plan.pack)
    dt_pack, _ = timeit(packf, grads)

    # --- aggregate only ---
    aggregator = make_aggregator(cfg, plan)
    aggf = jax.jit(lambda g, st_, k: aggregator(g, st_, scale, k))
    dt_agg, _ = timeit(aggf, grads, state.agg_state, key)

    # --- update only ---
    def upd(params, opt_state, agg):
        decayed = jax.tree.map(lambda g, p: g + wd * p, agg, params)
        updates, opt_state = tx.update(decayed, opt_state, params)
        return jax.tree.map(lambda p, u: p - lr * u, params, updates), opt_state
    updf = jax.jit(upd)
    agg0 = jax.tree.map(lambda g: jnp.mean(g, axis=0), grads)
    dt_upd, _ = timeit(updf, state.params, state.opt_state, agg0)

    # --- full step ---
    def run_full(st_, k):
        return train_step(st_, x, y, scale, lr, wd, k)
    st2, _ = run_full(state, key)  # compile (donation: keep state fresh)
    st3, loss = run_full(st2, key)
    float(loss)
    n = 20
    t0 = time.time()
    st = st3
    for _ in range(n):
        st, loss = run_full(st, key)
    float(loss)  # true execution barrier (loss chains through the state)
    dt_full = (time.time() - t0) / n

    return dict(fwd_bwd=dt_fb, pack=dt_pack, aggregate=dt_agg,
                update=dt_upd, full=dt_full)


def main():
    quants = (sys.argv[1] if len(sys.argv) > 1 else ",".join(CANONICAL)).split(",")
    network = sys.argv[2] if len(sys.argv) > 2 else "resnet50"
    print(f"backend={jax.default_backend()} network={network}")
    print(f"| config | fwd_bwd | pack | aggregate | update | full (ms) | steps/s |")
    print(f"|---|---|---|---|---|---|---|")
    for q in quants:
        r = breakdown(q, network)
        print(f"| {q} | {r['fwd_bwd']*1e3:.1f} | {r['pack']*1e3:.1f} | "
              f"{r['aggregate']*1e3:.1f} | {r['update']*1e3:.1f} | "
              f"{r['full']*1e3:.1f} | {1.0/r['full']:.2f} |", flush=True)


if __name__ == "__main__":
    main()
