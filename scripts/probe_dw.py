"""Probe per-user dW strategies for the folded fwd/bwd (VERDICT r3 item 1).

The folded path's ~28 ms fwd/bwd is the largest hsq stage; its gap vs the
single-dW folded bound is the per-user weight-grad convolutions, which XLA
lowers as batch_group_count=8 grouped convs at ~2x the folded dW cost
(PERF.md round 3).  Measures, honest-barrier on the chip:

  bound    folded fwd/bwd, SINGLE shared dW (no ghosts) — the floor
  bgc      current: vmapped per-user conv vjp (batch_group_count lowering)
  einsum   per-user dW as kh*kw shifted-slice batched einsums (plain
           batched MXU matmuls; gqx/models/folded.py::_per_user_dw_einsum)

Usage: python scripts/probe_dw.py [network] [dtype]
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.utils.timing import timeit


def main():
    from gqx.models import create_model
    from gqx.models import folded
    from gqx.models.common import folded_users
    from gqx.train import cross_entropy
    from gqx.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    network = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    U, B = 8, 32
    print(f"backend={jax.default_backend()} network={network} dtype={dtype} "
          f"users={U} batch={B}")

    model = create_model(network, 10, False, dtype=dtype)
    with folded_users(U):
        variables = model.init(jax.random.PRNGKey(0),
                               jnp.zeros((U, 32, 32, 3)), train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]
    ghosts0 = jax.tree.map(lambda g: jnp.zeros(g.shape, g.dtype),
                           variables["ghosts"])

    rng = np.random.default_rng(0)
    xf = jnp.asarray(rng.standard_normal((U * B, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(U, B)), jnp.int32)

    def loss_fold(gh, p):
        with folded_users(U):
            out = model.apply(
                {"params": p, "ghosts": gh, "batch_stats": batch_stats},
                xf, train=True, mutable=["batch_stats"])
        logits = out[0].reshape(U, B, -1)
        return jnp.sum(jax.vmap(cross_entropy)(logits, y))

    def loss_plain(p):
        out = model.apply({"params": p, "batch_stats": batch_stats},
                          xf, train=True, mutable=["batch_stats"])
        return cross_entropy(out[0], y.reshape(-1))

    # bound: single shared dW on the folded batch
    f_bound = jax.jit(jax.grad(loss_plain))
    dt, _ = timeit(f_bound, params)
    print(f"bound (single dW):      {dt*1e3:7.2f} ms")

    impls = (sys.argv[3].split(",") if len(sys.argv) > 3
             else ("bgc", "hybrid"))
    for impl in impls:
        folded.DW_IMPL = impl
        f = jax.jit(jax.grad(loss_fold, argnums=(0, 1)))
        dt, _ = timeit(f, ghosts0, params)
        print(f"per-user dW [{impl:6s}]:  {dt*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
