"""Shared operand-prep helpers for the flat-layout fused HSQ kernels
(block-diagonal expanded codebook, bf16 hi/lo pass splitting).

The v2 kernel *bodies* that originally lived here (flat-layout encode with a
per-row-chunk loop, fused decode(-mean)) were retired after the v3/v4
generations (gqx.ops.pallas_hsq3 / pallas_hsq4) superseded them on every
measured axis — users-in-block grid (8x fewer grid steps), transposed
128-lane-aligned signature layout (16x less write traffic), vectorized
selection; the measured v1 -> v2 -> v3 -> v4 progression and the v2-era
negative results are recorded in PERF.md, and the bodies remain in git
history.  What stays here is the operand preparation shared by all flat
kernel generations:

  - ``expand_codebook`` / ``expand_codebook_t``: the (K, dim) codebook as a
    block-diagonal (128, B*K) / (B*K, 128) MXU operand E / E2 with
    E[j*dim + t, j*K + c] = codebook[c, t], so a full-128-lane contraction
    computes all B = 128/dim subvector blocks' inner products at once with
    the gradient kept in its natural flat layout;
  - ``split_hi_lo`` + ``_split_dot``: explicit bf16 pass splitting (Mosaic
    supports only DEFAULT/HIGHEST dot precisions; HIGHEST f32 costs 6 MXU
    passes) — x@E as xh@Eh [+ xl@Eh] [+ xh@El] native 1-pass bf16 matmuls;
  - ``bf16_exact_codebook``: rounds codewords to bf16-representable f32 so
    the 2-pass split is exact to fp32 (E's lo term vanishes);
  - ``supports_flat``: the dim/K envelope the flat layout requires.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LANES = 128
DEFAULT_TILE_S = 1024      # sublane rows per tile: p/W tile = TILE_S*B*K*4 bytes
MAX_EXPANDED = 8192        # cap on B*K (VMEM for the expanded codebook / p tile)


def supports_flat(dim: int, k: int) -> bool:
    """The flat-layout kernels need whole subvectors per 128-lane row and a
    VMEM-resident expanded codebook."""
    return dim >= 1 and LANES % dim == 0 and (LANES // dim) * k <= MAX_EXPANDED


def expand_codebook(codebook: np.ndarray) -> np.ndarray:
    """(K, dim) -> block-diagonal (128, B*K) encode operand E."""
    k, dim = codebook.shape
    b = LANES // dim
    e = np.zeros((LANES, b * k), dtype=np.float32)
    for j in range(b):
        e[j * dim:(j + 1) * dim, j * k:(j + 1) * k] = codebook.T
    return e


def expand_codebook_t(codebook: np.ndarray) -> np.ndarray:
    """(K, dim) -> block-diagonal (B*K, 128) decode operand E2."""
    return expand_codebook(codebook).T.copy()


def split_hi_lo(a: np.ndarray):
    """f32 -> (hi, lo) bf16 pair with hi + lo ≈ a (~16 mantissa bits)."""
    import jax.numpy as _jnp

    hi = np.asarray(a, np.float32).astype(_jnp.bfloat16)
    lo = (np.asarray(a, np.float32) - np.asarray(hi, np.float32)).astype(_jnp.bfloat16)
    return np.asarray(hi), np.asarray(lo)


def bf16_exact_codebook(codebook: np.ndarray) -> np.ndarray:
    """Round codewords to bf16-representable f32 values.

    With a bf16-exact codebook, E's lo split is zero and the ``passes=2``
    matmul (xh@Eh + xl@Eh) is exact to fp32 — 2 MXU passes instead of 3/6.
    The ~0.4% perturbation of the (k-means-approximate) codewords is
    self-consistent: encode and decode use the same perturbed codebook, and
    u is the true signed inner product with the perturbed codeword."""
    import jax.numpy as _jnp

    return np.asarray(
        np.asarray(codebook, np.float32).astype(_jnp.bfloat16), np.float32
    )


def _split_dot(x, eh_ref, el_ref, passes):
    """x (f32) @ E via bf16 pass splitting; returns f32.

    passes=1: xh@Eh (~0.4% error).
    passes=2: xh@Eh + xl@Eh — exact-to-fp32 when E is bf16-representable
              (see bf16_exact_codebook).
    passes=3: + xh@El (error ~1e-5 relative for general f32 E).
    passes=6: fp32 HIGHEST (Mosaic 6-pass emulation) for reference checks.
    """
    dims = (((1,), (0,)), ((), ()))
    if passes >= 6:
        e = eh_ref[:].astype(jnp.float32) + el_ref[:].astype(jnp.float32)
        return jax.lax.dot_general(
            x, e, dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def bdot(a, b_ref):
        return jax.lax.dot_general(
            a, b_ref[:], dimension_numbers=dims,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )

    xh = x.astype(jnp.bfloat16)
    p = bdot(xh, eh_ref)
    if passes >= 2:
        xl = (x - xh.astype(jnp.float32)).astype(jnp.bfloat16)
        p = p + bdot(xl, eh_ref)
    if passes >= 3:
        p = p + bdot(xh, el_ref)
    return p

