"""Quantized gradient aggregation — parameter-server and ring topologies.

Behavioral spec from the reference (SURVEY.md §2.3):
  - PS (reference quantizers/ps_quantizer.py:27-65): every user adds its EF
    error (scaled by the warmup schedule), compress→decompresses its gradient,
    updates its error; the server *means* the decompressed gradients; with
    two-phase the mean is recompressed (downlink) with its own server-side EF.
  - Ring (reference quantizers/ring_quantizer.py:25-47): a *chain* — user i>0
    first adds the previous user's decompressed partial sum, then (EF +)
    compress→decompress.  The final gradient is the last hop's value, i.e. a
    quantized **sum** over users (not a mean), and the broadcast phase is
    lossless.

TPU-first design: gradients are packed into a handful of flat "units"
(gqx.parallel.packing) — one concatenated vector per compressor config plus
one identity unit for the <=1000-element passthrough leaves — and each unit
is aggregated as a whole.  On one chip the users axis is ``vmap`` (PS) or
``lax.scan`` (ring, inherently sequential).  The same per-user math is
reused by the real-mesh ``shard_map`` collectives in
gqx.parallel.collectives, which is what makes simulated-vs-mesh parity
testable (SURVEY.md §4).

EF state layout: one (num_users, unit_size) array per unit (the reference
keeps a per-user list per param, ps_quantizer.py:21-23); the server-side
two-phase error is one (unit_size,) array per unit (ps_quantizer.py:24-25).
"""

from __future__ import annotations

from typing import Any, List, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gqx.compress.api import Compressor
from gqx.parallel.packing import UnitPlan

PyTree = Any


class AggState(NamedTuple):
    """Aggregator state threaded through training steps (per-unit lists)."""

    ef: Optional[List[jax.Array]]          # [(num_users, unit_size)] or None
    server_ef: Optional[List[jax.Array]]   # [(unit_size,)] or None


def init_state(plan: UnitPlan, num_users: int, ef: bool, two_phase: bool) -> AggState:
    ef_list = (
        [jnp.zeros((num_users, u.size), jnp.float32) for u in plan.units] if ef else None
    )
    server_list = (
        [jnp.zeros((u.size,), jnp.float32) for u in plan.units]
        if (ef and two_phase)
        else None
    )
    return AggState(ef=ef_list, server_ef=server_list)


def unit_keys(key: jax.Array, num_units: int, num_users: int):
    """Per-unit key blocks: rows 0..U-1 for users, row U for the server-side
    (two-phase) recompression."""
    unit_key_arr = jax.random.split(key, num_units)
    return [jax.random.split(k, num_users + 1) for k in unit_key_arr]


def _user_roundtrip(comp: Compressor, g: jax.Array, err, scale, key):
    """One user's compress→decompress with optional error feedback
    (reference ps_quantizer.py:33-43)."""
    if err is not None:
        g = g + scale * err
    dec = comp.roundtrip(g, key)
    new_err = (g - dec) if err is not None else None
    return dec, new_err


def ps_aggregate(
    plan: UnitPlan,
    grads: PyTree,
    state: AggState,
    scale: jax.Array,
    key: jax.Array,
    *,
    two_phase: bool = False,
):
    """Parameter-server aggregation over a stacked users axis.

    ``grads`` leaves have shape (num_users, *leaf.shape).  Returns
    (aggregated_grads, new_state); aggregated leaves have the leaf shape.
    """
    units = plan.pack(grads)  # [(U, unit_size)]
    num_users = units[0].shape[0]
    keys = unit_keys(key, len(units), num_users)
    ef_on = state.ef is not None

    out, new_ef, new_server = [], [], []
    for ui, (u, g) in enumerate(zip(plan.units, units)):
        comp = u.compressor
        user_keys = keys[ui][:num_users]
        server_key = keys[ui][num_users]
        e = state.ef[ui] if ef_on else None
        se = state.server_ef[ui] if state.server_ef is not None else None

        if ef_on:
            with jax.named_scope(f"unit{ui}_encode_decode"):
                g_adj = (g + scale * e)  # EF injection (ps_quantizer.py:34-35)
                dec = comp.roundtrip_batch(g_adj, user_keys)
                e_new = g_adj - dec      # new error (ps_quantizer.py:39)
            with jax.named_scope(f"unit{ui}_server_reduce"):
                mean = jnp.mean(dec, axis=0)  # server reduce (ps_quantizer.py:48)
        else:
            # no per-user decompressed values needed -> encode per user (the
            # users axis folded into the kernel grid), then the compressor's
            # (possibly fused) decode_mean does the server reduce in one pass
            with jax.named_scope(f"unit{ui}_encode"):
                sig = comp.compress_batch(g, user_keys)
            with jax.named_scope(f"unit{ui}_decode_mean"):
                mean = comp.decode_mean(sig)
            e_new = None

        if two_phase:
            # downlink recompression of the averaged gradient
            # (reference ps_quantizer.py:52-61)
            if se is not None:
                mean = mean + se
                dec2 = comp.roundtrip(mean, server_key)
                new_server.append(mean - dec2)
                mean = dec2
            else:
                mean = comp.roundtrip(mean, server_key)
        elif se is not None:
            new_server.append(se)

        out.append(mean)
        if ef_on:
            new_ef.append(e_new)

    agg = plan.unpack(out)
    new_state = AggState(
        ef=new_ef if ef_on else None,
        server_ef=new_server if state.server_ef is not None else None,
    )
    return agg, new_state


def ring_aggregate(
    plan: UnitPlan,
    grads: PyTree,
    state: AggState,
    scale: jax.Array,
    key: jax.Array,
):
    """Chain-ring aggregation over a stacked users axis (lax.scan over hops).

    The hop order is user 0 → 1 → … → U-1; each hop compresses the running
    partial sum, so quantization noise is injected at every hop
    (reference ring_quantizer.py:31-43).  The result is the last hop's
    decompressed value — a quantized **sum**, not a mean (its :45-47)."""
    units = plan.pack(grads)
    num_users = units[0].shape[0]
    keys = unit_keys(key, len(units), num_users)
    ef_on = state.ef is not None

    out, new_ef = [], []
    for ui, (u, g) in enumerate(zip(plan.units, units)):
        comp = u.compressor
        user_keys = keys[ui][:num_users]
        e = state.ef[ui] if ef_on else None
        first_mask = jnp.arange(num_users) == 0

        def hop(carry, inp, comp=comp):
            if ef_on:
                g_u, key_u, is_first, e_u = inp
            else:
                g_u, key_u, is_first = inp
                e_u = None
            g_acc = jnp.where(is_first, g_u, g_u + carry)
            dec, e_new = _user_roundtrip(comp, g_acc, e_u, scale, key_u)
            return dec, e_new

        xs = (g, user_keys, first_mask) + ((e,) if ef_on else ())
        zero = jnp.zeros(g.shape[1:], g.dtype)
        final, e_scan = jax.lax.scan(hop, zero, xs)
        out.append(final)
        if ef_on:
            new_ef.append(e_scan)

    agg = plan.unpack(out)
    new_state = AggState(ef=new_ef if ef_on else None, server_ef=state.server_ef)
    return agg, new_state


def make_aggregator(config, plan: UnitPlan):
    """Return aggregate(grads, state, scale, key) for config.mode
    (factory parity with reference quantizers/__init__.py:5-10)."""
    if config.mode == "ps":
        def agg(grads, state, scale, key):
            return ps_aggregate(
                plan, grads, state, scale, key, two_phase=config.two_phase
            )
        return agg
    if config.mode == "ring":
        def agg(grads, state, scale, key):
            return ring_aggregate(plan, grads, state, scale, key)
        return agg
    raise ValueError(f"unknown mode {config.mode!r}")
