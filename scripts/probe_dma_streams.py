"""Does splitting the input across N operands raise aggregate DMA throughput?

Pure-IO pallas kernel, total bytes fixed (752 MB), N input refs each fed by
its own BlockSpec stream; output = 1 lane-slice copy per ref (negligible).
If each operand stream gets its own DMA engine, time should drop ~1/N.
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

LANES = 128


def main():
    print(f"backend={jax.default_backend()}")
    total_rows = 8 * 183680  # = encode workload rows
    rng = np.random.default_rng(0)

    for nstreams in (1, 2, 4, 8):
        for tile_s in (128, 512):
            rows = total_rows // nstreams
            num_tiles = rows // tile_s
            xs = [jnp.asarray(rng.standard_normal((rows, LANES)), jnp.float32)
                  for _ in range(nstreams)]
            gb = sum(x.size for x in xs) * 4 / 1e9

            def kern(*refs):
                ins, outs = refs[:nstreams], refs[nstreams:]
                for i in range(nstreams):
                    outs[i][:] = jnp.max(ins[i][:], axis=1, keepdims=True)

            f = pl.pallas_call(
                kern,
                grid=(num_tiles,),
                in_specs=[pl.BlockSpec((tile_s, LANES), lambda i: (i, 0),
                                       memory_space=pltpu.VMEM)
                          for _ in range(nstreams)],
                out_specs=[pl.BlockSpec((tile_s, 1), lambda i: (i, 0),
                                        memory_space=pltpu.VMEM)
                           for _ in range(nstreams)],
                out_shape=[jax.ShapeDtypeStruct((rows, 1), jnp.float32)
                           for _ in range(nstreams)],
            )
            g = jax.jit(lambda *a: f(*a))
            try:
                dt, _ = timeit(g, *xs, n=20)
            except Exception as e:
                print(f"streams={nstreams} tile={tile_s}: FAIL {type(e).__name__}")
                continue
            print(f"streams={nstreams} tile={tile_s}: {dt*1e3:7.2f} ms "
                  f"({gb/dt:6.1f} GB/s)", flush=True)


if __name__ == "__main__":
    main()
