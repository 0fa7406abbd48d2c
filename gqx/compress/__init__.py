"""Compressor registry and per-leaf construction.

Mirrors the reference registries (reference main.py:20-26 for the CLI names;
compressors/__init__.py:1-8 for the full exported family) and the per-layer
selection rule: leaves with <= 1000 elements always get the identity
compressor (reference ps_quantizer.py:17-20 / ring_quantizer.py:15-20).
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax

from gqx.compress.api import Compressor, Sig, subvector_dim  # noqa: F401
from gqx.compress.scalar import (  # noqa: F401
    IdenticalCompressor,
    ProbabilisticScalarCompressor,
    QSGDCompressor,
    SignSGDCompressor,
)
from gqx.compress.sparse import (  # noqa: F401
    MaureySparsificationCompressor,
    TopKCompressor,
)
from gqx.compress.vq import (  # noqa: F401
    HSQCompressor,
    ProbabilisticVectorCompressor,
    ResidualCompressor,
)


def make_compressor(name: str, size: int, shape: Tuple[int, ...], config,
                    norm_segment_sizes=None) -> Compressor:
    """Build one compressor from a GQConfig-like object (c_dim/k_bit/n_bit/
    cr/random/use_pallas attributes).  ``norm_segment_sizes`` (VQ families
    only) segments the norm quantizer's min/max range per original leaf
    inside a grouped unit (strict per-layer parity, see
    ProbabilisticScalarCompressor)."""
    random = bool(getattr(config, "random", True))
    use_pallas = bool(getattr(config, "use_pallas", False) or False)
    if name == "sgd":
        return IdenticalCompressor(size, shape)
    if name == "sign":
        return SignSGDCompressor(size, shape)
    if name == "qsgd":
        return QSGDCompressor(size, shape, config.n_bit, config.c_dim, random)
    if name == "terngrad":
        # TernGrad == QSGD with n_bit=1 and whole-tensor bucket
        # (reference README.md:21-26)
        return QSGDCompressor(size, shape, 1, 0, random)
    if name == "hsq":
        return HSQCompressor(
            size, shape, config.c_dim, config.k_bit, config.n_bit, random,
            use_pallas=use_pallas, norm_segment_sizes=norm_segment_sizes,
            passes=int(getattr(config, "hsq_passes", 2)),
        )
    if name == "pvq":
        return ProbabilisticVectorCompressor(
            size, shape, config.c_dim, config.k_bit, config.n_bit, random,
            norm_segment_sizes=norm_segment_sizes,
        )
    if name == "residual":
        return ResidualCompressor(
            size, shape, config.c_dim, config.k_bit, config.n_bit, random,
            use_pallas=use_pallas, norm_segment_sizes=norm_segment_sizes,
        )
    if name == "topk":
        return TopKCompressor(size, shape, config.cr)
    if name == "maurey":
        return MaureySparsificationCompressor(
            size, shape, config.c_dim, config.k_bit, config.n_bit
        )
    raise ValueError(f"unknown compressor {name!r}")


def build_leaf_compressors(params, config) -> Any:
    """Per-leaf compressor pytree for a parameter/gradient pytree.

    Leaves with <= ``passthrough_threshold`` elements (default 1000) get the
    identity compressor — this is the reference's rule that BatchNorm
    scales/biases and small biases are never quantized
    (reference ps_quantizer.py:15-20)."""
    threshold = int(getattr(config, "passthrough_threshold", 1000))

    def per_leaf(p):
        size = int(p.size)
        shape = tuple(p.shape)
        if size > threshold:
            return make_compressor(config.quantizer, size, shape, config)
        return IdenticalCompressor(size, shape)

    return jax.tree.map(per_leaf, params)
