"""Microbenchmark the HSQ aggregation pipeline stage by stage at bench scale
(ResNet-50 grouped unit: ~23.5M params, 8 users, d=16, K=256, n_bit=6).

Run on TPU:  python scripts/microbench_hsq.py
Each stage prints ms/call and effective GB/s so the pathological stage is
obvious.  Stages:
  pack        plan.pack on a ResNet-50-shaped gradient pytree (x8 users)
  encode      hsq_encode (pallas) / chunked XLA encode
  norms       ProbabilisticScalarCompressor roundtrip on u
  decode      hsq_decode (pallas) / gather decode
  mean        per-unit mean over users
  roundtrip   full compressor roundtrip under vmap(users)
  aggregate   full ps_aggregate
"""

import functools
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
    from gqx.parallel.aggregate import init_state, ps_aggregate
    from gqx.codebooks import get_codebook
    from gqx.ops.pallas_hsq import hsq_encode, hsq_decode, hsq_decode_xla
    from gqx.compress.scalar import ProbabilisticScalarCompressor

    on_tpu = jax.default_backend() == "tpu"
    print(f"backend={jax.default_backend()}")

    cfg = GQConfig(network="resnet50", dataset="synthetic", quantizer="hsq",
                   c_dim=16, k_bit=8, n_bit=6, num_users=8, batch_size=32)
    cfg.use_pallas = on_tpu

    model = create_model("resnet50", 10, scan_blocks=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)), train=False)
    params = variables["params"]
    plan = plan_units(params, cfg)
    for u in plan.units:
        print(f"unit: size={u.size} comp={type(u.compressor).__name__} "
              f"dim={getattr(u.compressor, 'dim', '-')}")

    U = cfg.num_users
    grads = jax.tree.map(
        lambda p: jnp.broadcast_to(p[None], (U,) + p.shape) + 1e-3, params
    )

    # --- pack ---
    packf = jax.jit(plan.pack)
    dt, units = timeit(packf, grads)
    nbytes = sum(int(u.size) for u in plan.units) * U * 4
    print(f"pack:      {dt*1e3:8.2f} ms  ({nbytes/dt/1e9:6.1f} GB/s)")

    big = max(range(len(plan.units)), key=lambda i: plan.units[i].size)
    comp = plan.units[big].compressor
    g = units[big]  # (U, size)
    dim, K = comp.dim, comp.K
    rows = g.reshape(U, -1, dim)
    M = rows.shape[1]
    cb = comp.codewords
    print(f"big unit: M={M} dim={dim} K={K} ({M*dim*4/1e6:.0f} MB/user)")

    # --- encode (the path the compressor actually uses: flat kernels on TPU,
    # current generation per GQX_HSQ_KGEN — gqx.compress.vq._hsq_kernels) ---
    if comp.flat_ok:
        from gqx.compress.vq import _hsq_kernels

        kmod = _hsq_kernels()
        encf = jax.jit(lambda r: kmod.hsq_encode_flat(
            r.reshape(U, -1), comp._eh, comp._el, comp.dim,
            tile_s=comp._ENC_TILE_S, passes=comp.passes))
    elif on_tpu:
        encf = jax.jit(jax.vmap(lambda r: hsq_encode(r, cb)))
    else:
        encf = jax.jit(jax.vmap(comp._encode_xla))
    dt, (uu, codes) = timeit(encf, rows)
    print(f"encode:    {dt*1e3:8.2f} ms  ({U*M*dim*4/dt/1e9:6.1f} GB/s)")

    # --- norm compressor roundtrip ---
    nc = comp.norm_compressor
    keys = jax.random.split(jax.random.PRNGKey(0), U)
    nrmf = jax.jit(jax.vmap(lambda u_, k: nc.decompress(nc.compress(u_, k))))
    dt, uq = timeit(nrmf, uu, keys)
    print(f"norms:     {dt*1e3:8.2f} ms  ({U*M*4/dt/1e9:6.1f} GB/s)")

    # --- decode (fused decode-mean is what PS aggregation uses) ---
    if comp.flat_ok:
        dmf = jax.jit(lambda c, u_: kmod.hsq_decode_mean(
            c, u_, comp._eh, comp._el, comp.dim,
            tile_s=comp._DECMEAN_TILE_S, passes=comp.passes))
        dt, _ = timeit(dmf, codes.astype(jnp.int32), uq)
        print(f"decmean:   {dt*1e3:8.2f} ms  ({M*dim*4/dt/1e9:6.1f} GB/s out)")
    if on_tpu:
        decf = jax.jit(jax.vmap(lambda c, u_: hsq_decode(c, u_, cb)))
    else:
        decf = jax.jit(jax.vmap(lambda c, u_: hsq_decode_xla(c, u_, cb)))
    dt, dec = timeit(decf, codes, uq)
    print(f"decode:    {dt*1e3:8.2f} ms  ({U*M*dim*4/dt/1e9:6.1f} GB/s)")

    # --- mean over users ---
    meanf = jax.jit(lambda d: jnp.mean(d, axis=0))
    dt, _ = timeit(meanf, dec)
    print(f"mean:      {dt*1e3:8.2f} ms  ({U*M*dim*4/dt/1e9:6.1f} GB/s)")

    # --- full roundtrip via compressor API ---
    comp.use_pallas = on_tpu
    rtf = jax.jit(jax.vmap(lambda g_, k: comp.roundtrip(g_, k)))
    dt, _ = timeit(rtf, g, keys)
    print(f"roundtrip: {dt*1e3:8.2f} ms  ({U*M*dim*4/dt/1e9:6.1f} GB/s)")

    # --- full aggregate ---
    state = init_state(plan, U, ef=False, two_phase=False)
    aggf = jax.jit(functools.partial(ps_aggregate, plan))
    dt, _ = timeit(aggf, grads, state, jnp.float32(1.0), jax.random.PRNGKey(1))
    print(f"aggregate: {dt*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
