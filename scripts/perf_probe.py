"""Probe pack-transpose strategies and fwd/bwd lowering on the real chip.

The torch-layout pack (gqx/parallel/packing.py) permutes every conv kernel
(U, kh, kw, cin, cout) -> (U, cout, cin, kh, kw) before flattening; measured
44.8 ms for a ResNet-50 gradient x8 users (~1.5 GB moved, ~10x off HBM
roofline).  Variants measured here:

  torch5d   current full permutation (cout, cin, kh, kw)
  coutfirst 2D collapse: (khkwcin, cout) -> (cout, khkwcin); same
            "one output unit per subvector" property, different intra-unit
            order than torch
  natural   no transpose (flax order; round-1 behavior)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


from gqx.utils.timing import timeit  # noqa: E402  (true device barrier)


def main():
    from gqx.config import GQConfig
    from gqx.models import create_model
    from gqx.parallel.packing import plan_units

    print(f"backend={jax.default_backend()}")
    cfg = GQConfig(network="resnet50", dataset="synthetic", quantizer="hsq",
                   c_dim=16, k_bit=8, n_bit=6, num_users=8, batch_size=32)
    model = create_model("resnet50", 10, scan_blocks=False)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    params = variables["params"]
    U = 8
    grads = jax.tree.map(
        lambda p: jnp.broadcast_to(p[None], (U,) + p.shape).astype(jnp.float32) + 1e-3,
        params)
    nbytes = sum(int(p.size) for p in jax.tree.leaves(params)) * U * 4

    # torch5d (current)
    plan_t = plan_units(params, cfg)
    dt, _ = timeit(jax.jit(plan_t.pack), grads)
    print(f"pack torch5d:   {dt*1e3:8.2f} ms ({2*nbytes/dt/1e9:6.1f} GB/s rw)")

    # natural
    cfg_n = GQConfig(network="resnet50", dataset="synthetic", quantizer="hsq",
                     c_dim=16, k_bit=8, n_bit=6, num_users=8, batch_size=32)
    cfg_n.quant_layout = "natural"
    plan_n = plan_units(params, cfg_n)
    dt, _ = timeit(jax.jit(plan_n.pack), grads)
    print(f"pack natural:   {dt*1e3:8.2f} ms ({2*nbytes/dt/1e9:6.1f} GB/s rw)")

    # coutfirst: collapse-to-2D transpose per leaf, then concat
    leaves = jax.tree.leaves(grads)

    def pack_coutfirst(leaves):
        flats = []
        for x in leaves:
            if x.ndim >= 3:
                lead = x.shape[0]
                rest = int(np.prod(x.shape[1:-1]))
                cout = x.shape[-1]
                x2 = x.reshape(lead, rest, cout)
                x2 = jnp.swapaxes(x2, 1, 2)
                flats.append(x2.reshape(lead, rest * cout))
            else:
                flats.append(x.reshape(x.shape[0], -1))
        return jnp.concatenate(flats, axis=-1)

    dt, _ = timeit(jax.jit(pack_coutfirst), leaves)
    print(f"pack coutfirst: {dt*1e3:8.2f} ms ({2*nbytes/dt/1e9:6.1f} GB/s rw)")

    # pure concat (no transpose, no per-leaf reshape beyond flatten)
    def pack_concat(leaves):
        return jnp.concatenate([x.reshape(x.shape[0], -1) for x in leaves], axis=-1)

    dt, _ = timeit(jax.jit(pack_concat), leaves)
    print(f"pack concat:    {dt*1e3:8.2f} ms ({2*nbytes/dt/1e9:6.1f} GB/s rw)")

    # single big 2D transpose at unit level for scale reference
    big = jnp.zeros((U, 1469, 16000), jnp.float32)
    dt, _ = timeit(jax.jit(lambda a: jnp.swapaxes(a, 1, 2)), big)
    nb = big.size * 4
    print(f"2d transpose:   {dt*1e3:8.2f} ms ({2*nb/dt/1e9:6.1f} GB/s rw)")


if __name__ == "__main__":
    main()
