"""Per-conv-geometry breakdown of the per-user dW penalty (follow-up to
probe_dw.py: whole-model bound 28.8 / bgc 38.9 / einsum 44.8 ms).

Enumerates every shared_conv call in the folded model (shape, stride,
padding, count), then times the per-user dW computation for each geometry
standalone under both implementations:

  bgc     vmapped per-user conv vjp (batch_group_count lowering)
  einsum  shifted-slice batched einsums

to locate where the ~10 ms whole-model penalty concentrates (1x1 vs 3x3,
early wide-spatial vs late wide-channel), and whether a hybrid (einsum for
1x1, bgc for 3x3 — or vice versa) beats either pure strategy.

Usage: python scripts/probe_dw2.py [network] [dtype]
"""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.utils.timing import timeit


def main():
    from gqx.models import create_model, folded
    from gqx.models.common import folded_users
    from gqx.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    network = sys.argv[1] if len(sys.argv) > 1 else "resnet50"
    dtype = sys.argv[2] if len(sys.argv) > 2 else "bfloat16"
    U, B = 8, 32
    print(f"backend={jax.default_backend()} network={network} dtype={dtype}")

    # record every shared_conv geometry during one traced apply
    model = create_model(network, 10, False, dtype=dtype)
    with folded_users(U):
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0),
                               jnp.zeros((U * B, 32, 32, 3)), train=True))

    recs = []
    orig = folded.shared_conv

    def recorder(x, kernel, ghost, users, strides, padding):
        recs.append((tuple(x.shape), tuple(kernel.shape), strides,
                     padding if isinstance(padding, str) else tuple(padding)))
        return orig(x, kernel, ghost, users, strides, padding)

    folded.shared_conv = recorder
    try:
        with folded_users(U):
            jax.eval_shape(
                lambda v: model.apply(v, jnp.zeros((U * B, 32, 32, 3)),
                                      train=True, mutable=["batch_stats"]),
                variables)
    finally:
        folded.shared_conv = orig

    geoms = Counter(recs)
    rng = np.random.default_rng(0)
    cdt = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    rows = []
    for (xs, ks, strides, padding), count in sorted(geoms.items()):
        x = jnp.asarray(rng.standard_normal(xs), cdt)
        k = jnp.asarray(rng.standard_normal(ks), cdt)
        dys = jax.eval_shape(lambda a: folded._conv(a, k, strides, padding), x).shape
        dy = jnp.asarray(rng.standard_normal(dys), cdt)

        def dw_bgc(x_, dy_):
            xu = x_.reshape((U, -1) + x_.shape[1:])
            dyu = dy_.reshape((U, -1) + dy_.shape[1:])
            return jax.vmap(
                lambda a, b: jax.vjp(
                    lambda w: folded._conv(a, w, strides, padding), k)[1](b)[0]
            )(xu, dyu)

        def dw_einsum(x_, dy_):
            return folded._per_user_dw_einsum(x_, dy_, k, U, strides, padding)

        def dw_single(x_, dy_):
            # folded (summed-over-users) dW: the per-geometry floor
            return jax.vjp(
                lambda w: folded._conv(x_, w, strides, padding), k)[1](dy_)[0]

        t_s, _ = timeit(jax.jit(dw_single), x, dy, n=30)
        t_b, _ = timeit(jax.jit(dw_bgc), x, dy, n=30)
        # einsum only for 1x1 convs: the 3x3 shifted-slice einsum both loses
        # globally (probe_dw) and crashes XLA's fusion pass on small-spatial
        # geometries (TransformWindow check failure); for 1x1 it is a pure
        # batched matmul with no window ops
        t_e = float("nan")
        if ks[0] == 1 and ks[1] == 1:
            t_e, _ = timeit(jax.jit(dw_einsum), x, dy, n=30)
        rows.append((xs, ks, strides, count, t_s * 1e3, t_b * 1e3, t_e * 1e3))
        print(f"x{str(xs):>22s} k{str(ks):>18s} s{strides} x{count:2d}: "
              f"single {t_s*1e3:6.3f}  bgc {t_b*1e3:6.3f}  "
              f"einsum {t_e*1e3:6.3f} ms "
              f"(model bgc: {count*t_b*1e3:6.2f})", flush=True)

    tot_s = sum(c * t for _, _, _, c, t, _, _ in rows)
    tot_b = sum(c * t for _, _, _, c, _, t, _ in rows)
    tot_h = sum(c * (min(tb, te) if te == te else tb)
                for _, _, _, c, _, tb, te in rows)
    print(f"\nmodel dW totals: single(floor) {tot_s:.2f} ms, "
          f"bgc {tot_b:.2f} ms, hybrid(einsum-1x1) {tot_h:.2f} ms")


if __name__ == "__main__":
    main()
