"""Reconstruction-error comparison of quant layouts on REAL conv gradients.

Computes a ResNet-18 gradient on real digits data (after a few warmup SGD
steps so the gradient isn't the init artifact), then for every conv leaf
measures the HSQ (d16/K256, exact norms) relative L2 reconstruction error
under the torch / outfirst / natural flattening orders.  This is the same
methodology that root-caused the round-2 subvector-orientation finding
(PARITY_RESULTS.md): lower error == more VQ-compressible partition.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_platforms", "cpu")
    from gqx.codebooks import get_codebook
    from gqx.config import GQConfig
    from gqx.data import Pipeline
    from gqx.models import create_model
    from gqx.parallel.packing import (
        outfirst_axis_order,
        torch_axis_order,
    )
    from gqx.train import create_train_state, make_train_step, cross_entropy

    cfg = GQConfig(network="resnet18", dataset="digits", quantizer="sgd",
                   num_users=8, batch_size=32, seed=1)
    pipeline = Pipeline(cfg)
    model = create_model(cfg.network, cfg.num_classes)
    sample = jnp.zeros((cfg.batch_size,) + pipeline.image_shape, jnp.float32)
    state, plan, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, plan, tx)

    batches = list(pipeline.train_epoch(1))
    sc, lr, wd = jnp.float32(1.0), jnp.float32(0.1), jnp.float32(5e-4)
    key = jax.random.PRNGKey(2)
    for i, (x, y) in enumerate(batches[:4]):  # warmup steps
        key, k = jax.random.split(key)
        state, _ = step(state, x, y, sc, lr, wd, k)

    # one per-user gradient (user 0)
    def loss_fn(p, x, y):
        out = model.apply({"params": p, "batch_stats": state.batch_stats},
                          x, train=True, mutable=["batch_stats"])
        return cross_entropy(out[0], y)

    x, y = batches[4]
    grads = jax.grad(loss_fn)(state.params, x[0], y[0])

    cb = np.asarray(get_codebook(16, 256), np.float32)

    def hsq_err(flat):
        rows = np.asarray(flat, np.float32).reshape(-1, 16)
        p = rows @ cb.T
        codes = np.argmax(np.abs(p), axis=1)
        u = p[np.arange(len(p)), codes]
        rec = cb[codes] * u[:, None]
        num = np.linalg.norm(rows - rec)
        den = np.linalg.norm(rows) + 1e-12
        return num / den

    leaves_with_path = jax.tree_util.tree_flatten_with_path(grads)[0]
    tot = {"torch": [0.0, 0.0], "outfirst": [0.0, 0.0], "natural": [0.0, 0.0]}
    print(f"{'leaf':40s} {'size':>9s}  torch  outfst  natural")
    for path, leaf in leaves_with_path:
        shape = leaf.shape
        if len(shape) < 4 or leaf.size % 16 or leaf.size <= 1000:
            continue
        name = "/".join(str(getattr(k, "key", k)) for k in path)[-40:]
        a = np.asarray(leaf)
        errs = {}
        for lay, perm in (
            ("torch", torch_axis_order(shape)),
            ("outfirst", outfirst_axis_order(shape)),
            ("natural", tuple(range(len(shape)))),
        ):
            e = hsq_err(np.transpose(a, perm).reshape(-1))
            errs[lay] = e
            n2 = float(np.linalg.norm(a)) ** 2
            tot[lay][0] += (e ** 2) * n2
            tot[lay][1] += n2
        print(f"{name:40s} {leaf.size:9d}  {errs['torch']:.4f} {errs['outfirst']:.4f} "
              f"{errs['natural']:.4f}")
    print("\ngradient-norm-weighted overall rel. L2 error:")
    for lay, (se, sn) in tot.items():
        print(f"  {lay:9s} {np.sqrt(se / sn):.4f}")


if __name__ == "__main__":
    main()
