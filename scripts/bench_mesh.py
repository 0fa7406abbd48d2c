"""Benchmark the real-collective aggregation paths (VERDICT r2 item 5).

Times the four mesh aggregation modes of gqx.parallel.collectives in
isolation (no model fwd/bwd — synthetic per-user gradients with the real
ResNet-50 unit plan):

  ps_logical   per-user encode/decode local, lax.pmean of fp32 gradients
  ps_packed    all-gather of bit-packed payloads, decode-all + mean
  ring_chain   reference-faithful sequential chain (D masked ppermute hops
               of the full fp32 unit)
  ring_seg     segmented compressed reduce-scatter + compressed all-gather

and reports per-device bytes-on-wire per step for each (packed payload
sizes from gqx.ops.wire; fp32 sizes where the algorithm sends fp32).

Default platform: 8-virtual-device CPU mesh (relative ranking; absolute
numbers are CPU). `--platform tpu` measures the 1-device-mesh overhead vs
the sim backend on the real chip.

Usage:
  python scripts/bench_mesh.py [--devices 8] [--network resnet50]
  python scripts/bench_mesh.py --platform tpu --devices 1
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--network", default="resnet50")
    ap.add_argument("--num-users", type=int, default=8)
    ap.add_argument("--platform", default="cpu", choices=("cpu", "tpu"))
    ap.add_argument("--modes", default="ps_logical,ps_packed,ring_chain,ring_seg")
    args = ap.parse_args()

    if args.platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + f" --xla_force_host_platform_device_count={args.devices}"
        )
    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    from gqx.config import GQConfig
    from gqx.models import create_model
    from gqx.ops.wire import wire_bytes
    from gqx.parallel.collectives import (
        _ps_unit_logical,
        _ps_unit_packed,
        _ring_unit,
        _ring_unit_segmented,
        make_user_mesh,
        segment_chunk_size,
    )
    from gqx.parallel.packing import plan_units
    from gqx.utils.timing import timeit

    cfg = GQConfig(
        network=args.network, dataset="synthetic", quantizer="hsq",
        c_dim=16, k_bit=8, n_bit=6, num_users=args.num_users,
        use_pallas=(args.platform == "tpu"), wire="packed",
    )
    model = create_model(cfg.network, 10, False, dtype="float32")
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 32, 32, 3)))["params"]
    plan = plan_units(params, cfg)
    axis = "users"
    mesh, local_users = make_user_mesh(cfg.num_users, axis)
    n_dev = mesh.devices.size
    total = sum(u.size for u in plan.units)
    wire_per_user = plan.wire_bytes()
    print(f"platform={jax.default_backend()} devices={n_dev} "
          f"local_users={local_users} grads={total*4/1e6:.1f} MB/user "
          f"packed wire={wire_per_user/1e6:.3f} MB/user")

    rng = np.random.default_rng(0)
    units_g = [
        jax.device_put(
            jnp.asarray(rng.standard_normal((cfg.num_users, u.size)), jnp.float32),
            NamedSharding(mesh, P(axis)),
        )
        for u in plan.units
    ]
    scale = jnp.float32(1.0)

    # per-device bytes-on-wire sent per step, by mode
    def mode_wire_bytes(mode):
        out = 0
        for u in plan.units:
            if mode == "ps_logical":
                out += u.size * 4  # pmean carries fp32 (one reduce's worth)
            elif mode == "ps_packed":
                out += local_users * wire_bytes(u.compressor)
            elif mode == "ring_chain":
                out += u.size * 4  # one full fp32 carry leaves each device
            elif mode == "ring_seg":
                align = max(int(getattr(u.compressor, "dim", 1)), 1)
                chunk = segment_chunk_size(u.size, n_dev, align)
                from gqx.compress import IdenticalCompressor, make_compressor

                cc = (IdenticalCompressor(chunk, (chunk,))
                      if type(u.compressor).__name__ == "IdenticalCompressor"
                      else make_compressor(cfg.quantizer, chunk, (chunk,), cfg))
                # D-1 reduce-scatter hops + 1 all-gather send, chunk-sized
                out += n_dev * wire_bytes(cc)
        return out

    import functools

    def build(mode):
        chunk_comps = []
        if mode == "ring_seg":
            from gqx.compress import IdenticalCompressor, make_compressor

            for u in plan.units:
                align = max(int(getattr(u.compressor, "dim", 1)), 1)
                chunk = segment_chunk_size(u.size, n_dev, align)
                cc = (IdenticalCompressor(chunk, (chunk,))
                      if type(u.compressor).__name__ == "IdenticalCompressor"
                      else make_compressor(cfg.quantizer, chunk, (chunk,), cfg))
                chunk_comps.append((cc, chunk))

        def body(key, *gs):
            outs = []
            my = jax.lax.axis_index(axis)
            for ui, (u, g) in enumerate(zip(plan.units, gs)):
                comp = u.compressor
                dev_key = jax.random.fold_in(jax.random.fold_in(key, ui), my)
                user_keys = jax.vmap(
                    lambda i: jax.random.fold_in(dev_key, i)
                )(jnp.arange(local_users))
                if mode == "ps_logical":
                    out, _ = _ps_unit_logical(comp, g, None, scale, user_keys, axis)
                elif mode == "ps_packed":
                    out, _ = _ps_unit_packed(comp, g, None, scale, user_keys, axis)
                elif mode == "ring_chain":
                    out, _ = _ring_unit(comp, g, None, scale, user_keys, axis, n_dev)
                elif mode == "ring_seg":
                    cc, chunk = chunk_comps[ui]
                    out, _ = _ring_unit_segmented(
                        cc, chunk, g, None, scale, jax.random.fold_in(key, ui),
                        axis, n_dev)
                outs.append(out)
            # chain everything into one scalar so timing fetches one value
            return sum(jnp.sum(o) for o in outs)

        sm = jax.shard_map(
            body, mesh=mesh,
            in_specs=(P(),) + tuple(P(axis) for _ in units_g),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(sm)

    results = {}
    for mode in args.modes.split(","):
        f = build(mode)
        key = jax.random.PRNGKey(1)
        try:
            dt, _ = timeit(f, key, *units_g, n=3)
        except Exception as e:  # noqa
            print(f"{mode:12s} FAILED: {type(e).__name__}: {e}")
            continue
        wb = mode_wire_bytes(mode)
        results[mode] = (dt, wb)
        print(f"{mode:12s} {dt*1e3:9.2f} ms/step   "
              f"{wb/1e6:8.3f} MB sent/device/step", flush=True)

    if results:
        import json

        out = {m: {"ms": round(dt * 1e3, 2), "wire_mb_per_device": round(wb / 1e6, 3)}
               for m, (dt, wb) in results.items()}
        path = os.path.join("results", f"mesh_bench_{jax.default_backend()}_{n_dev}dev.json")
        os.makedirs("results", exist_ok=True)
        with open(path, "w") as fjson:
            json.dump({"network": args.network, "devices": n_dev,
                       "modes": out}, fjson, indent=1)
        print("wrote", path)


if __name__ == "__main__":
    main()
