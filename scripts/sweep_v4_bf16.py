"""Re-sweep v4 encode/decode-mean tile sizes for the bf16-unit input path
(round 4: input DMA halved — the round-3 tile choice may no longer be
optimal).  Bench geometry: grouped resnet50 unit, 8 users, d16/K256."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from gqx.utils.timing import timeit


def main():
    from gqx.compress.vq import HSQCompressor

    size = 23498752  # round-3 bench grouped unit (incl. kernel pad)
    U = 8
    comp = HSQCompressor(size, (size,), 16, 8, 6, random=True,
                         use_pallas=True, passes=1)
    assert comp.flat_ok and comp.sig_t
    rng = np.random.default_rng(0)
    g32 = jnp.asarray(rng.standard_normal((U, size)), jnp.float32)
    gbf = g32.astype(jnp.bfloat16)
    keys = jax.random.split(jax.random.PRNGKey(0), U)

    from gqx.ops import pallas_hsq4 as k4

    for dtype, g in (("bf16", gbf), ("f32", g32)):
        for tile in (128, 256, 512, 1024):
            try:
                f = jax.jit(lambda gg: k4.hsq_encode_flat(
                    gg, comp._eh, comp._el, comp.dim, tile_s=tile, passes=1,
                    transposed=True))
                dt, _ = timeit(f, g)
                print(f"encode {dtype} tile_s={tile:5d}: {dt*1e3:7.2f} ms",
                      flush=True)
            except Exception as e:
                print(f"encode {dtype} tile_s={tile}: FAIL "
                      f"{type(e).__name__}: {str(e)[:100]}", flush=True)

    sig = comp.compress_batch(gbf, keys)
    for tile in (128, 256, 512):
        try:
            f = jax.jit(lambda s: k4.hsq_decode_mean(
                s["codes"].astype(jnp.int32),
                jax.vmap(comp.norm_compressor_t.decompress)(s["u"]),
                comp._eh, comp._el, comp.dim, tile_s=tile, passes=1,
                out_size=comp.size))
            dt, _ = timeit(f, sig)
            print(f"decode_mean tile_s={tile:5d}: {dt*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"decode_mean tile_s={tile}: FAIL "
                  f"{type(e).__name__}: {str(e)[:100]}", flush=True)


if __name__ == "__main__":
    main()
