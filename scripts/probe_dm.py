"""Decode-mean variants probe (round 3, after probe_v6's findings that v5e
Mosaic supports neither bf16 vector compares nor int16 reductions):

  dm(v4)  production: f32 one-hot, 2-pass f32-split matmul      [exact]
  H2      f32 one-hot (identical passes), rounded to bf16 once,
          ONE bf16 matmul with Eh                               [w,E rounded bf16]
  H3      i16-compare bf16 one-hot + one bf16 matmul            [may not lower]

Usage: python scripts/probe_dm.py
"""

from __future__ import annotations

import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, ".")

from gqx.codebooks import get_codebook
from gqx.ops import pallas_hsq2 as hsq2
from gqx.ops import pallas_hsq4 as v4
from gqx.ops.pallas_hsq3 import _geometry, _sig_to_transposed
from gqx.utils.timing import timeit

LANES = 128


def _dm_kernel_h2(codes_ref, u_ref, eh_ref, out_ref, *, nblocks, k, users):
    tile_s = codes_ref.shape[2]
    iota3 = jax.lax.broadcasted_iota(jnp.int32, (nblocks, k, tile_s), 1)
    w3 = jnp.where(iota3 == codes_ref[0][:, None, :], u_ref[0][:, None, :], 0.0)
    for uu in range(1, users):
        w3 = w3 + jnp.where(
            iota3 == codes_ref[uu][:, None, :], u_ref[uu][:, None, :], 0.0)
    w_t = (w3.reshape(nblocks * k, tile_s) * (1.0 / users)).astype(jnp.bfloat16)
    out_ref[:] = jax.lax.dot_general(
        eh_ref[:], w_t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dm_kernel_h3(codes_ref, u_ref, eh_ref, out_ref, *, nblocks, k, users):
    tile_s = codes_ref.shape[2]
    iota3_16 = jax.lax.broadcasted_iota(jnp.int16, (nblocks, k, tile_s), 1)
    zero = jnp.bfloat16(0.0)
    w3 = None
    for uu in range(users):
        c16 = codes_ref[uu].astype(jnp.int16)
        ub = u_ref[uu].astype(jnp.bfloat16)
        oh = jnp.where(iota3_16 == c16[:, None, :], ub[:, None, :], zero)
        w3 = oh if w3 is None else w3 + oh
    w_t = w3.reshape(nblocks * k, tile_s) * jnp.bfloat16(1.0 / users)
    out_ref[:] = jax.lax.dot_general(
        eh_ref[:], w_t, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT,
    )


def _dm_kernel_hl(codes_ref, u_ref, eh_ref, el_ref, out_ref, *, nblocks, k,
                  users, passes):
    """EXACT hi/lo one-hot decomposition: code = hi*kl + lo; the scaled
    K-one-hot is oh_hi(u) ⊗ oh_lo(1) — built with ONE mul+add pass over the
    (B, K, tile) domain per user instead of compare+select+add (the small
    (B, 16, tile) one-hots are ~1/16 domain).  Products are u*1 / u*0 so the
    accumulated w3 is bit-identical to the production kernel's."""
    from gqx.ops.pallas_hsq3 import _dot_wt

    tile_s = codes_ref.shape[2]
    kh = 1 << (((k - 1).bit_length() + 1) // 2)
    kl = k // kh
    iota_hi = jax.lax.broadcasted_iota(jnp.int32, (nblocks, kh, 1, tile_s), 1)
    iota_lo = jax.lax.broadcasted_iota(jnp.int32, (nblocks, 1, kl, tile_s), 2)
    w4 = None
    for uu in range(users):
        c = codes_ref[uu]
        hi = (c // kl)[:, None, None, :]
        lo = (c % kl)[:, None, None, :]
        oh_hi = jnp.where(iota_hi == hi, u_ref[uu][:, None, None, :], 0.0)
        oh_lo = jnp.where(iota_lo == lo, 1.0, 0.0)
        prod = oh_hi * oh_lo                     # (B, kh, kl, tile) full pass
        w4 = prod if w4 is None else w4 + prod
    w_t = w4.reshape(nblocks * k, tile_s) * (1.0 / users)
    out_ref[:] = _dot_wt(eh_ref, el_ref, w_t, passes)


def decode_mean_var(codes, u, eh, dim, tile_s, kern, interpret=False):
    users, m = codes.shape
    b, num_tiles, s_pad = _geometry(m * dim, dim, tile_s)
    k = eh.shape[1] // b
    codes_t, u_t = _sig_to_transposed(
        codes.astype(jnp.int32), u.astype(jnp.float32), b, s_pad)
    out_t = pl.pallas_call(
        functools.partial(kern, nblocks=b, k=k, users=users),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, tile_s), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LANES, s_pad), jnp.float32),
        interpret=interpret,
    )(codes_t, u_t, eh)
    return jnp.swapaxes(out_t, 0, 1).reshape(-1)[:m * dim]


def decode_mean_hl(codes, u, eh, el, dim, tile_s, passes=2, interpret=False):
    users, m = codes.shape
    b, num_tiles, s_pad = _geometry(m * dim, dim, tile_s)
    k = eh.shape[1] // b
    codes_t, u_t = _sig_to_transposed(
        codes.astype(jnp.int32), u.astype(jnp.float32), b, s_pad)
    out_t = pl.pallas_call(
        functools.partial(_dm_kernel_hl, nblocks=b, k=k, users=users,
                          passes=passes),
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((users, b, tile_s), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((LANES, b * k), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((LANES, tile_s), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((LANES, s_pad), jnp.float32),
        interpret=interpret,
    )(codes_t, u_t, eh, el)
    return jnp.swapaxes(out_t, 0, 1).reshape(-1)[:m * dim]


def main():
    dim, K, users = 16, 256, 8
    size = 23498432 // dim * dim
    cb = hsq2.bf16_exact_codebook(np.asarray(get_codebook(dim, K)))
    eh, el = map(jnp.asarray, hsq2.split_hi_lo(hsq2.expand_codebook(cb)))
    rng = np.random.default_rng(0)
    flats = jnp.asarray(rng.standard_normal((users, size)), jnp.float32)
    print(f"backend={jax.default_backend()} size={size} users={users}")

    uF, cF = jax.block_until_ready(jax.jit(lambda f: v4.hsq_encode_flat(
        f, eh, el, dim, tile_s=512, passes=2))(flats))
    m0 = np.asarray(jax.jit(lambda c, u: v4.hsq_decode_mean(
        c, u, eh, el, dim, tile_s=256, passes=2))(cF, uF))
    scale = np.max(np.abs(m0)) + 1e-12

    for name, kern in (("H2", _dm_kernel_h2), ("H3", _dm_kernel_h3)):
        try:
            m1 = np.asarray(jax.jit(lambda c, u: decode_mean_var(
                c, u, eh, dim, 256, kern))(cF, uF))
            print(f"{name}: max rel dev {np.max(np.abs(m1 - m0)) / scale:.2e}")
        except Exception as e:
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:120]}")
    try:
        m1 = np.asarray(jax.jit(lambda c, u: decode_mean_hl(
            c, u, eh, el, dim, 256, passes=2))(cF, uF))
        ident = np.array_equal(m1, m0)
        print(f"HL: bit-identical={ident} max abs dev "
              f"{np.max(np.abs(m1 - m0)):.2e}")
    except Exception as e:
        print(f"HL: FAIL {type(e).__name__}: {str(e)[:160]}")

    for tile_s in (128, 256, 512):
        row = [f"tile={tile_s:4d}"]
        dt, _ = timeit(jax.jit(lambda c, u: v4.hsq_decode_mean(
            c, u, eh, el, dim, tile_s=tile_s, passes=2)), cF, uF, n=5)
        row.append(f"dm(v4) {dt*1e3:6.2f}")
        for name, kern in (("H2", _dm_kernel_h2), ("H3", _dm_kernel_h3)):
            try:
                dt, _ = timeit(jax.jit(functools.partial(
                    decode_mean_var, eh=eh, dim=dim, tile_s=tile_s,
                    kern=kern)), cF, uF, n=5)
                row.append(f"{name} {dt*1e3:6.2f}")
            except Exception:
                row.append(f"{name} FAIL")
        for p in (2, 1):
            try:
                dt, _ = timeit(jax.jit(functools.partial(
                    decode_mean_hl, eh=eh, el=el, dim=dim, tile_s=tile_s,
                    passes=p)), cF, uF, n=5)
                row.append(f"HL(p{p}) {dt*1e3:6.2f}")
            except Exception:
                row.append(f"HL(p{p}) FAIL")
        print("  ".join(row), flush=True)


if __name__ == "__main__":
    main()
