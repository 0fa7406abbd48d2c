"""Probe pallas grid pipelining knobs on the encode-shaped workload.

Variants of the pure-IO kernel (read (tile,128) f32, write (tile,8)):
  default              no compiler params (current kernels)
  parallel             dimension_semantics=(PARALLEL,)
  arbitrary            dimension_semantics=(ARBITRARY,)
  parallel+vmem128     PARALLEL + vmem_limit_bytes=128MB
across tile_s, plus the full encode kernel with the winning config.
"""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gqx.utils.timing import timeit
from gqx.ops import pallas_hsq2 as hsq2

LANES = 128
DIM = 16
B = LANES // DIM


def k_io(x_ref, o_ref):
    xx = x_ref[:]
    for j in range(B):
        o_ref[:, j:j + 1] = jnp.sum(
            xx[:, j * DIM:(j + 1) * DIM], axis=1, keepdims=True
        )


def main():
    print(f"backend={jax.default_backend()}")
    U, size = 8, 23498432
    s = size // LANES  # 183581.5 -> pad
    rng = np.random.default_rng(0)

    PAR = pltpu.GridDimensionSemantics.PARALLEL
    ARB = pltpu.GridDimensionSemantics.ARBITRARY
    cfgs = {
        "default": None,
        "parallel": pltpu.CompilerParams(dimension_semantics=(PAR,)),
        "arbitrary": pltpu.CompilerParams(dimension_semantics=(ARB,)),
        "par+vmem": pltpu.CompilerParams(dimension_semantics=(PAR,),
                                         vmem_limit_bytes=100 * 1024 * 1024),
    }
    for tile_s in (128, 512, 2048):
        num_tiles = -(-s // tile_s)
        s_pad = num_tiles * tile_s
        x = jnp.asarray(rng.standard_normal((U, s_pad, LANES)), jnp.float32)
        gb = x.size * 4 / 1e9
        for name, cp in cfgs.items():
            kw = dict(compiler_params=cp) if cp is not None else {}
            f = pl.pallas_call(
                k_io,
                grid=(num_tiles,),
                in_specs=[pl.BlockSpec((tile_s, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((tile_s, B), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((s_pad, B), jnp.float32),
                **kw,
            )
            g = jax.jit(jax.vmap(f))
            try:
                dt, _ = timeit(g, x, n=20)
            except Exception as e:
                print(f"io tile={tile_s} {name}: FAIL {type(e).__name__}")
                continue
            print(f"io tile={tile_s} {name:10s}: {dt*1e3:7.2f} ms "
                  f"({gb/dt:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
