"""Probe the fwd/bwd stage (55 ms of the 183 ms hsq step): where does it go?

Measures on the bench config (resnet50, 8 users x batch 32, bf16 compute):
  fwd vmap       vmapped per-user forward only
  fwd folded     single batch-256 forward (upper bound: users share params)
  fwd+bwd vmap   per-user value_and_grad (what the train step needs)
  fwd+bwd folded batch-256 grad of mean loss (NOT per-user; bound only)

If vmap ~= folded, XLA already batches the users axis optimally and the
fwd/bwd cost is the model's; if not, the per-user weight-grad convolutions
(batch_group_count lowering) are the gap.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.utils.timing import timeit


def main():
    from gqx.config import GQConfig
    from gqx.models import create_model
    from gqx.train import cross_entropy
    from gqx.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    network = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    print(f"backend={jax.default_backend()} network={network} dtype={dtype}")

    cfg = GQConfig(network=network, dataset="synthetic", quantizer="sgd",
                   num_users=8, batch_size=32, seed=1)
    model = create_model(network, 10, False, dtype=dtype)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((2, 32, 32, 3)),
                           train=True)
    params, batch_stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(0)
    U, B = 8, 32
    x = jnp.asarray(rng.standard_normal((U, B, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(U, B)), jnp.int32)
    xf = x.reshape(U * B, 32, 32, 3)
    yf = y.reshape(U * B)

    def fwd(p, xu, yu):
        out = model.apply({"params": p, "batch_stats": batch_stats},
                          xu, train=True, mutable=["batch_stats"])
        return cross_entropy(out[0], yu)

    # fwd only
    f = jax.jit(lambda p, x_, y_: jax.vmap(lambda a, b: fwd(p, a, b))(x_, y_))
    dt, _ = timeit(f, params, x, y)
    print(f"fwd vmap(8x32):    {dt*1e3:7.2f} ms")
    f = jax.jit(fwd)
    dt, _ = timeit(f, params, xf, yf)
    print(f"fwd folded(256):   {dt*1e3:7.2f} ms")

    # fwd+bwd
    f = jax.jit(lambda p, x_, y_: jax.vmap(
        lambda a, b: jax.value_and_grad(fwd)(p, a, b))(x_, y_))
    dt, _ = timeit(f, params, x, y)
    print(f"fwd+bwd vmap:      {dt*1e3:7.2f} ms")
    f = jax.jit(jax.value_and_grad(fwd))
    dt, _ = timeit(f, params, xf, yf)
    print(f"fwd+bwd folded:    {dt*1e3:7.2f} ms")

    flops = 2.85e9 * 3 * U * B  # fwd GF/img x (1 fwd + 2 bwd)
    print(f"(ResNet-50 scale: {flops/1e12:.2f} TF/step)")


if __name__ == "__main__":
    main()
