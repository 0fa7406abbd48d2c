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

TPU-first design: aggregation is a pure function over a gradient pytree whose
leaves carry a leading ``users`` axis.  On one chip the users axis is
materialized by ``vmap`` (PS — all users independent) or ``lax.scan``
(ring — inherently sequential per hop).  The same per-user math is reused by
the real-mesh ``shard_map`` collectives in gqx.parallel.collectives, which is
what makes simulated-vs-mesh parity testable (SURVEY.md §4).

EF state layout: one array of shape (num_users, *leaf.shape) per leaf
(reference keeps a per-user python list per param, ps_quantizer.py:21-23);
the server-side two-phase error is one array of the leaf shape
(ps_quantizer.py:24-25).
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gqx.compress.api import Compressor

PyTree = Any


class AggState(NamedTuple):
    """Aggregator state threaded through training steps."""

    ef: Optional[PyTree]          # per-leaf (num_users, *shape) or None
    server_ef: Optional[PyTree]   # per-leaf (*shape) or None (two-phase only)


def init_state(params: PyTree, num_users: int, ef: bool, two_phase: bool) -> AggState:
    ef_tree = (
        jax.tree.map(lambda p: jnp.zeros((num_users,) + tuple(p.shape), p.dtype), params)
        if ef
        else None
    )
    server_tree = (
        jax.tree.map(lambda p: jnp.zeros_like(p), params) if (ef and two_phase) else None
    )
    return AggState(ef=ef_tree, server_ef=server_tree)


def _leaf_keys(key: jax.Array, treedef, num_users: int):
    """One (num_users+1)-row key block per leaf: rows 0..U-1 for users, row U
    for the server-side (two-phase) recompression."""
    n = treedef.num_leaves
    leaf_keys = jax.random.split(key, n)
    blocks = [jax.random.split(k, num_users + 1) for k in leaf_keys]
    return jax.tree.unflatten(treedef, blocks)


def _user_roundtrip(comp: Compressor, g: jax.Array, err, scale, key):
    """One user's compress→decompress with optional error feedback
    (reference ps_quantizer.py:33-43)."""
    if err is not None:
        g = g + scale * err
    dec = comp.roundtrip(g, key)
    new_err = (g - dec) if err is not None else None
    return dec, new_err


def ps_aggregate(
    compressors: PyTree,
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
    leaves, treedef = jax.tree.flatten(grads)
    num_users = leaves[0].shape[0]
    keys = _leaf_keys(key, treedef, num_users)
    ef_on = state.ef is not None

    comp_leaves = treedef.flatten_up_to(compressors)
    ef_leaves = treedef.flatten_up_to(state.ef) if ef_on else [None] * len(leaves)
    server_leaves = (
        treedef.flatten_up_to(state.server_ef)
        if state.server_ef is not None
        else [None] * len(leaves)
    )
    key_leaves = treedef.flatten_up_to(keys)

    out, new_ef, new_server = [], [], []
    for comp, g, e, se, kb in zip(comp_leaves, leaves, ef_leaves, server_leaves, key_leaves):
        user_keys = kb[:num_users]
        server_key = kb[num_users]

        def one(g_u, key_u, e_u=None, comp=comp):
            return _user_roundtrip(comp, g_u, e_u, scale, key_u)

        if ef_on:
            dec, e_new = jax.vmap(lambda g_u, k_u, e_u: one(g_u, k_u, e_u))(g, user_keys, e)
        else:
            dec, e_new = jax.vmap(lambda g_u, k_u: one(g_u, k_u))(g, user_keys)

        mean = jnp.mean(dec, axis=0)  # server reduce (reference ps_quantizer.py:48)

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
        else:
            if se is not None:
                new_server.append(se)

        out.append(mean)
        if ef_on:
            new_ef.append(e_new)

    agg = jax.tree.unflatten(treedef, out)
    new_state = AggState(
        ef=jax.tree.unflatten(treedef, new_ef) if ef_on else None,
        server_ef=jax.tree.unflatten(treedef, new_server) if state.server_ef is not None else None,
    )
    return agg, new_state


def ring_aggregate(
    compressors: PyTree,
    grads: PyTree,
    state: AggState,
    scale: jax.Array,
    key: jax.Array,
):
    """Chain-ring aggregation over a stacked users axis (lax.scan over hops).

    The hop order is user 0 → 1 → … → U-1; each hop compresses the running
    partial sum, so quantization noise is injected at every hop
    (reference ring_quantizer.py:31-43).  The result is the last hop's
    decompressed value — a quantized **sum**, not a mean (its :45-47).
    """
    leaves, treedef = jax.tree.flatten(grads)
    num_users = leaves[0].shape[0]
    keys = _leaf_keys(key, treedef, num_users)
    ef_on = state.ef is not None

    comp_leaves = treedef.flatten_up_to(compressors)
    ef_leaves = treedef.flatten_up_to(state.ef) if ef_on else [None] * len(leaves)
    key_leaves = treedef.flatten_up_to(keys)

    out, new_ef = [], []
    for comp, g, e, kb in zip(comp_leaves, leaves, ef_leaves, key_leaves):
        user_keys = kb[:num_users]
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

    agg = jax.tree.unflatten(treedef, out)
    new_state = AggState(
        ef=jax.tree.unflatten(treedef, new_ef) if ef_on else None,
        server_ef=state.server_ef,
    )
    return agg, new_state


def make_aggregator(config, compressors: PyTree):
    """Return aggregate(grads, state, scale, key) for config.mode
    (factory parity with reference quantizers/__init__.py:5-10)."""
    if config.mode == "ps":
        def agg(grads, state, scale, key):
            return ps_aggregate(
                compressors, grads, state, scale, key, two_phase=config.two_phase
            )
        return agg
    if config.mode == "ring":
        def agg(grads, state, scale, key):
            return ring_aggregate(compressors, grads, state, scale, key)
        return agg
    raise ValueError(f"unknown mode {config.mode!r}")
