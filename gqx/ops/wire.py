"""Signature <-> packed-payload conversion per compressor family.

``pack_signature`` turns a compressor signature into a dict of uint32 word
arrays (the physical wire payload); ``unpack_signature`` inverts it exactly
(bit-exact roundtrip).  ``wire_word_counts`` gives the static per-field word
counts so collectives can preallocate and bytes-on-wire metrics are exact.

This subsystem has no reference counterpart — the reference ships unpacked
bool/int32 tensors (SURVEY.md §2.5 preamble) — and is required for the
"bytes-on-wire verified against the reference encoding" north star
(BASELINE.json).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from gqx.compress.scalar import (
    IdenticalCompressor,
    ProbabilisticScalarCompressor,
    QSGDCompressor,
    SignSGDCompressor,
)
from gqx.compress.sparse import MaureySparsificationCompressor, TopKCompressor
from gqx.compress.vq import (
    HSQCompressor,
    ProbabilisticVectorCompressor,
    ResidualCompressor,
)
from gqx.ops.pack import (
    f32_to_words,
    pack_uint,
    packed_words,
    unpack_uint,
    words_to_f32,
)

Wire = Dict[str, jax.Array]


def _level_bits(comp) -> int:
    """Physical bits for the quantization level `l`.

    With stochastic rounding the reference's level can reach s = 2^n_bit
    (clamp to s-1 then +1 with probability scaled-l: reference
    qsgd_compressor.py:53-61, probabilistic_scalar_compressor.py:17-26), so
    one extra bit is required for a lossless wire — the reference's *logical*
    accounting (n_bit) ignores this overflow because it never packs."""
    return comp.n_bit + (1 if comp.random else 0)


def _pack_prob_scalar(comp: ProbabilisticScalarCompressor, sig) -> Wire:
    return {
        "bounds": f32_to_words(jnp.stack([sig["lower"], sig["upper"]])),
        "l": pack_uint(sig["l"].reshape(-1), _level_bits(comp)),
    }


def _unpack_prob_scalar(comp: ProbabilisticScalarCompressor, wire: Wire):
    if comp.segment_sizes is not None:
        bounds = words_to_f32(wire["bounds"], (2, comp.n_segments))
    else:
        bounds = words_to_f32(wire["bounds"], (2,))
    l = unpack_uint(wire["l"], _level_bits(comp), comp.size).astype(jnp.int32)
    return {"lower": bounds[0], "upper": bounds[1], "l": l.reshape(comp.shape)}


def _pack_vq_u(comp, sig) -> Wire:
    if comp.compressed_norm:
        inner = _pack_prob_scalar(comp.norm_compressor, sig["u"])
        return {f"u_{k}": v for k, v in inner.items()}
    return {"u_raw": f32_to_words(sig["u"])}


def _unpack_vq_u(comp, wire: Wire):
    if comp.compressed_norm:
        inner = {k[2:]: v for k, v in wire.items() if k.startswith("u_")}
        return _unpack_prob_scalar(comp.norm_compressor, inner)
    return words_to_f32(wire["u_raw"], (comp.M,))


def pack_signature(comp, sig, transposed: bool = False) -> Wire:
    """``transposed=True`` packs an HSQ signature in the kernels' native
    (B, s_pad) layout (gqx.ops.pallas_hsq4 ``transposed=True``), skipping
    both m-order conversions on the packed mesh path: the encode's
    (B, s_pad)->(s_pad, B) minor transpose and the decode's
    ``_sig_to_transposed`` — each measured several ms/step off roofline
    (PERF.md round 3/5).  The bit layout is the same little-endian uint32
    stream, just over the transposed element order (element (blk, s) is
    m-order row ``s * B + blk``); all devices produce and consume the same
    order, so cross-device payloads stay consistent.  The payload carries
    the kernel grid's tail pad (``b * s_pad`` values vs ``M``), a
    <0.1% size slack over the canonical wire — see
    :func:`wire_bytes_transposed`."""
    if transposed:
        if not getattr(comp, "sig_t", False):
            raise TypeError(
                f"transposed wire needs an HSQ compressor with sig_t; got "
                f"{type(comp).__name__}")
        b, s_pad = comp._tgeom
        out = {
            "codes": pack_uint(
                sig["codes"].reshape(-1).astype(jnp.uint32), comp.code_bits)
        }
        if comp.compressed_norm:
            inner = _pack_prob_scalar(comp.norm_compressor_t, sig["u"])
            out.update({f"u_{k}": v for k, v in inner.items()})
        else:
            out["u_raw"] = f32_to_words(sig["u"].reshape(-1))
        return out
    if isinstance(comp, IdenticalCompressor):
        return {"raw": f32_to_words(sig["vec"].reshape(-1))}
    if isinstance(comp, SignSGDCompressor):
        # ternary {-1,0,+1} -> {0,1,2}, 2 bits/coordinate
        trits = (jnp.sign(sig["signs"]).reshape(-1) + 1.0).astype(jnp.uint32)
        return {"trits": pack_uint(trits, 2)}
    if isinstance(comp, QSGDCompressor):
        return {
            "norm": f32_to_words(sig["norm"].reshape(-1)),
            "signs": pack_uint(sig["signs"].reshape(-1).astype(jnp.uint32), 1),
            "l": pack_uint(sig["l"].reshape(-1), _level_bits(comp)),
        }
    if isinstance(comp, ProbabilisticScalarCompressor):
        return _pack_prob_scalar(comp, sig)
    if isinstance(comp, (HSQCompressor, ProbabilisticVectorCompressor)):
        out = {"codes": pack_uint(sig["codes"].reshape(-1).astype(jnp.uint32),
                                  comp.code_bits)}
        out.update(_pack_vq_u(comp, sig))
        return out
    if isinstance(comp, ResidualCompressor):
        out: Wire = {}
        for i, stage in enumerate(comp.stages):
            for k, v in pack_signature(stage, sig[f"stage{i}"]).items():
                out[f"s{i}_{k}"] = v
        return out
    if isinstance(comp, TopKCompressor):
        idx_bits = 16 if comp.size <= (1 << 16) else 32
        return {
            "values": f32_to_words(sig["values"]),
            "indices": pack_uint(sig["indices"].astype(jnp.uint32), idx_bits),
        }
    if isinstance(comp, MaureySparsificationCompressor):
        # signs are {-1, 0, +1} (reference torch.sign semantics — zero is
        # reachable via searchsorted boundary clips): pack as 2-bit trits so
        # the roundtrip is bit-exact, like SignSGD above.
        trits = (jnp.sign(sig["signs"]) + 1.0).astype(jnp.uint32)
        return {
            "scale": f32_to_words(sig["scale"][None]),
            "codes": pack_uint(sig["codes"].astype(jnp.uint32), comp.idx_bits),
            "signs": pack_uint(trits, 2),
        }
    raise TypeError(type(comp))


def unpack_signature(comp, wire: Wire, transposed: bool = False):
    if transposed:
        from gqx.compress.api import code_dtype

        if not getattr(comp, "sig_t", False):
            raise TypeError(
                f"transposed wire needs an HSQ compressor with sig_t; got "
                f"{type(comp).__name__}")
        b, s_pad = comp._tgeom
        codes = unpack_uint(wire["codes"], comp.code_bits, b * s_pad)
        sig = {"codes": codes.astype(code_dtype(comp.code_bits)).reshape(b, s_pad)}
        if comp.compressed_norm:
            inner = {k[2:]: v for k, v in wire.items() if k.startswith("u_")}
            sig["u"] = _unpack_prob_scalar(comp.norm_compressor_t, inner)
        else:
            sig["u"] = words_to_f32(wire["u_raw"], (b, s_pad))
        return sig
    if isinstance(comp, IdenticalCompressor):
        return {"vec": words_to_f32(wire["raw"], comp.shape)}
    if isinstance(comp, SignSGDCompressor):
        trits = unpack_uint(wire["trits"], 2, comp.size).astype(jnp.float32) - 1.0
        return {"signs": trits.reshape(comp.shape)}
    if isinstance(comp, QSGDCompressor):
        return {
            "norm": words_to_f32(wire["norm"], (comp.M,)),
            "signs": unpack_uint(wire["signs"], 1, comp.size).astype(jnp.bool_).reshape(comp.shape),
            "l": unpack_uint(wire["l"], _level_bits(comp), comp.size)
            .astype(jnp.int32)
            .reshape(comp.shape),
        }
    if isinstance(comp, ProbabilisticScalarCompressor):
        return _unpack_prob_scalar(comp, wire)
    if isinstance(comp, (HSQCompressor, ProbabilisticVectorCompressor)):
        from gqx.compress.api import code_dtype

        codes = unpack_uint(wire["codes"], comp.code_bits, comp.M)
        return {
            "codes": codes.astype(code_dtype(comp.code_bits)),
            "u": _unpack_vq_u(comp, wire),
        }
    if isinstance(comp, ResidualCompressor):
        sig = {}
        for i, stage in enumerate(comp.stages):
            sub = {k[len(f"s{i}_"):]: v for k, v in wire.items() if k.startswith(f"s{i}_")}
            sig[f"stage{i}"] = unpack_signature(stage, sub)
        return sig
    if isinstance(comp, TopKCompressor):
        idx_bits = 16 if comp.size <= (1 << 16) else 32
        return {
            "values": words_to_f32(wire["values"], (comp.k,)),
            "indices": unpack_uint(wire["indices"], idx_bits, comp.k).astype(jnp.int32),
        }
    if isinstance(comp, MaureySparsificationCompressor):
        trits = unpack_uint(wire["signs"], 2, comp.k).astype(jnp.float32)
        return {
            "scale": words_to_f32(wire["scale"], (1,))[0],
            "codes": unpack_uint(wire["codes"], comp.idx_bits, comp.k).astype(jnp.int32),
            "signs": trits - 1.0,
        }
    raise TypeError(type(comp))


def wire_bytes_transposed(comp) -> int:
    """Exact payload bytes for the transposed HSQ wire (pack_signature
    ``transposed=True``): the canonical encoding over ``b * s_pad`` grid
    elements (M real + kernel tail pad) plus one extra bounds segment for
    the pad."""
    assert getattr(comp, "sig_t", False), type(comp)
    b, s_pad = comp._tgeom
    n = b * s_pad
    if comp.compressed_norm:
        nt = comp.norm_compressor_t
        u_bytes = 4 * (2 * nt.n_segments + packed_words(n, _level_bits(nt)))
    else:
        u_bytes = 4 * n
    return 4 * packed_words(n, comp.code_bits) + u_bytes


def wire_bytes(comp) -> int:
    """Exact packed payload size in bytes (incl. word padding)."""
    if isinstance(comp, IdenticalCompressor):
        return 4 * comp.size
    if isinstance(comp, SignSGDCompressor):
        return 4 * packed_words(comp.size, 2)
    if isinstance(comp, QSGDCompressor):
        return 4 * (
            comp.M + packed_words(comp.size, 1) + packed_words(comp.size, _level_bits(comp))
        )
    if isinstance(comp, ProbabilisticScalarCompressor):
        # 2 range scalars per segment (segments = original leaves in grouped
        # units; 1 segment = the reference's 2-per-tensor accounting)
        return 4 * (2 * comp.n_segments + packed_words(comp.size, _level_bits(comp)))
    if isinstance(comp, (HSQCompressor, ProbabilisticVectorCompressor)):
        u_bytes = (
            wire_bytes(comp.norm_compressor) if comp.compressed_norm else 4 * comp.M
        )
        return 4 * packed_words(comp.M, comp.code_bits) + u_bytes
    if isinstance(comp, ResidualCompressor):
        return sum(wire_bytes(s) for s in comp.stages)
    if isinstance(comp, TopKCompressor):
        idx_bits = 16 if comp.size <= (1 << 16) else 32
        return 4 * (comp.k + packed_words(comp.k, idx_bits))
    if isinstance(comp, MaureySparsificationCompressor):
        # scale + idx_bits/sample + 2-bit sign trit/sample
        return 4 * (1 + packed_words(comp.k, comp.idx_bits) + packed_words(comp.k, 2))
    raise TypeError(type(comp))
