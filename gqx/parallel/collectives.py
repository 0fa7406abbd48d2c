"""Real-mesh quantized collectives over a ``users`` axis (shard_map + XLA
collectives).

This is the component the reference *lacks* (SURVEY.md §2.10 — its
"communication" is in-process list appends): here the users axis is a
``jax.sharding.Mesh`` axis; each device hosts ``num_users / n_devices``
local users and the aggregation becomes real collectives over the
compression units of gqx.parallel.packing:

  - PS mode, wire='logical': per-user encode→decode locally, then
    ``lax.pmean`` of the decompressed gradients (semantics identical to the
    reference server mean, ps_quantizer.py:48; the collective carries fp32).
  - PS mode, wire='packed': the *bit-packed* payloads (gqx.ops.wire) are
    ``lax.all_gather``-ed across the users axis and every device decodes all
    users' payloads and means them — bytes-on-wire are physically the packed
    encodings.  Mathematically identical to 'logical' up to fp reduction
    order.
  - Ring mode: the chain of reference ring_quantizer.py:25-47 — local users
    chain by ``lax.scan``, devices chain by D sequential masked
    ``lax.ppermute`` hops, then the final (sum) value is broadcast.  This is
    the chain-faithful parity mode; it is latency-bound by construction,
    exactly like the algorithm it implements.

Two-phase downlink recompression runs replicated (same PRNG key on every
device), so the server-side EF state stays consistent across the mesh.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gqx.parallel.aggregate import AggState, _user_roundtrip, unit_keys
from gqx.parallel.packing import UnitPlan
from gqx.train import TrainState, cross_entropy

PyTree = Any


def warn_chain_ring_scale(config, n_devices: int = None) -> bool:
    """Warn when the reference-faithful chain ring is about to run on a big
    mesh: its per-device work is O(D) — D sequential full-model hops are the
    algorithm (reference ring_quantizer.py:25-47), not an implementation
    artifact — measured 32x slower than the segmented ring at 32 devices
    (561 s vs 17.4 s/step, results/mesh_bench_cpu_32dev.json).  The
    segmented ring (``--ring-mode segmented``) is the deploy mode; chain
    exists for parity.  Returns True if the warning fired."""
    if config.mode != "ring" or config.ring_mode != "chain":
        return False
    if n_devices is None:
        n_devices = len(jax.devices())
    if n_devices <= 8:
        return False
    import warnings

    warnings.warn(
        f"--mode ring --ring-mode chain on a {n_devices}-device mesh: the "
        f"chain is latency-bound with O(D) per-device work (reference-parity "
        f"mode; 32x slower than segmented at 32 devices — "
        f"results/mesh_bench_cpu_32dev.json). Use --ring-mode segmented for "
        f"real meshes.",
        stacklevel=2,
    )
    return True


def make_user_mesh(num_users: int, axis: str = "users") -> Tuple[Mesh, int]:
    """1-D mesh over all devices; uses the largest device count that divides
    num_users.  Returns (mesh, local_users_per_device)."""
    devices = np.asarray(jax.devices())
    n = len(devices)
    while n > 1 and num_users % n != 0:
        n -= 1
    mesh = Mesh(devices[:n], (axis,))
    return mesh, num_users // n


# --------------------------------------------------------------------------
# per-unit aggregation bodies (run INSIDE shard_map)
# --------------------------------------------------------------------------

def _ps_unit_logical(comp, g_local, e_local, scale, keys, axis):
    """g_local: (U_local, unit_size). Returns (global_mean, new_e_local).

    Uses the BATCHED kernel API (compress_batch / roundtrip_batch / fused
    decode_mean — the same hot path as the sim backend): round 4 shipped a
    per-user ``jax.vmap(compress)`` here, which wrapped each Pallas call in
    an XLA while-loop with per-user dynamic-update-slices and skipped the
    transposed-signature fast path (PERF.md round 4: mesh_logical carried
    +29 ms of world=1 machinery over sim_vmap)."""
    if e_local is not None:
        g_adj = g_local + scale * e_local     # EF inject (ps_quantizer.py:34-35)
        dec = comp.roundtrip_batch(g_adj, keys)
        e_new = g_adj - dec                   # new error (ps_quantizer.py:39)
        local_mean = jnp.mean(dec, axis=0)
    else:
        sig = comp.compress_batch(g_local, keys)
        local_mean = comp.decode_mean(sig)    # fused server reduce
        e_new = None
    return jax.lax.pmean(local_mean, axis), e_new


def _ps_unit_packed(comp, g_local, e_local, scale, keys, axis):
    """Wire-true PS: all-gather packed payloads, decode all users, mean.

    Encode is ONE batched kernel call; only pack/unpack of the compact
    signature is vmapped per user (cheap after the periodic pack_bits
    formulation, gqx.ops.pack).  On TPU the HSQ unit ships the TRANSPOSED
    wire (pack_signature ``transposed=True``): the kernel's native
    signature layout goes straight onto the wire, skipping the m-order
    conversions on both sides — this also makes the packed mesh path use
    the exact same quantization grid as the sim backend (the transposed
    norm quantizer).  Other compressors (and the CPU fallback) use the
    canonical m-order wire (``compress_batch_m``)."""
    from gqx.ops.wire import pack_signature, unpack_signature

    sig_t = bool(getattr(comp, "sig_t", False))
    g_enc = g_local + scale * e_local if e_local is not None else g_local
    sig = (comp.compress_batch(g_enc, keys) if sig_t
           else comp.compress_batch_m(g_enc, keys))
    wire = jax.vmap(lambda s: pack_signature(comp, s, transposed=sig_t))(sig)
    e_new = None
    if e_local is not None:
        e_new = g_enc - comp.decompress_batch(sig)

    # all-gather every wire field: (U_local, W) -> (D, U_local, W) -> (U, W)
    gathered = jax.tree.map(
        lambda w: jax.lax.all_gather(w, axis).reshape((-1,) + w.shape[1:]), wire
    )
    sig_all = jax.vmap(
        lambda wu: unpack_signature(comp, wu, transposed=sig_t))(gathered)
    return comp.decode_mean(sig_all), e_new


def _two_phase_unit(comp, mean, server_e, scale, server_key):
    """Replicated downlink recompression (reference ps_quantizer.py:52-61)."""
    if server_e is not None:
        mean = mean + server_e
        dec = comp.roundtrip(mean, server_key)
        return dec, mean - dec
    return comp.roundtrip(mean, server_key), None


def _ring_unit(comp, g_local, e_local, scale, keys, axis, n_dev):
    """Chain over all users: local scan, then D sequential ppermute hops.

    Device d's local chain starts from the partial received from device d-1;
    the final value (on the last device) is broadcast.  Output is the
    quantized SUM (reference ring_quantizer.py:45-47)."""
    my = jax.lax.axis_index(axis)

    def local_chain(partial_in, use_carry):
        def hop(carry, inp):
            if e_local is not None:
                g_u, k_u, idx, e_u = inp
            else:
                g_u, k_u, idx = inp
                e_u = None
            first_global = jnp.logical_and(idx == 0, jnp.logical_not(use_carry))
            g_acc = jnp.where(first_global, g_u, g_u + carry)
            dec, e_new = _user_roundtrip(comp, g_acc, e_u, scale, k_u)
            return dec, e_new

        idxs = jnp.arange(g_local.shape[0])
        xs = (g_local, keys, idxs) + ((e_local,) if e_local is not None else ())
        return jax.lax.scan(hop, partial_in, xs)

    zero = jnp.zeros(g_local.shape[1:], g_local.dtype)
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    carry = zero
    e_final = None
    for d in range(n_dev):
        received = jax.lax.ppermute(carry, axis, perm) if d > 0 else zero
        out, e_new = local_chain(received, use_carry=jnp.asarray(d > 0))
        active = my == d
        carry = jnp.where(active, out, received)
        if e_local is not None:
            e_final = e_new if e_final is None else jnp.where(active, e_new, e_final)

    # broadcast the last device's value (lossless broadcast phase)
    final = jax.lax.psum(jnp.where(my == n_dev - 1, carry, jnp.zeros_like(carry)), axis)
    return final, e_final


def _ring_unit_segmented(comp_chunk, chunk, g_local, e_local, scale, keys,
                         axis, n_dev):
    """Bandwidth-optimal quantized ring: local (lossless) user sum, then a
    ring reduce-scatter with per-hop encode→decode of 1/D-size segments,
    then a compressed all-gather of the final segments.

    Per-device wire volume is ~2x the compressed unit size (vs the chain's
    D x full-size hops).  Per-hop quantization noise matches the spirit of
    reference ring_quantizer.py (noise injected at every hop); output is the
    quantized SUM over users, like the reference's ring.

    Error feedback (round-4 design, VERDICT r3 item 4): the ring topology is
    static, so the send at (device d, hop s) carries the running partial sum
    of segment (d - s) % D at *every* training step.  Each device therefore
    keeps one chunk-size error slot per send it performs — n_dev-1 RS hops
    plus the final all-gather encode, ``e_local`` (1, n_dev, chunk) — and,
    exactly like the reference's per-sender EF (ring_quantizer.py:33-38 /
    ps_quantizer.py:24-25 at the reducing hop), adds ``scale * e[s]`` to the
    pre-encode value and stores the new residual ``pre - decode(encode(pre))``
    back into slot s.  Convergence gate: scripts/parity_study.py ringseg_ef
    configs (results/study/fcn_ringseg_ef.jsonl).
    """
    from gqx.ops.wire import pack_signature, unpack_signature

    my = jax.lax.axis_index(axis)
    g = jnp.sum(g_local, axis=0)  # local users reduce losslessly
    size = g.shape[0]
    pad = n_dev * chunk - size
    segs = (jnp.pad(g, (0, pad)) if pad else g).reshape(n_dev, chunk)

    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    ef_on = e_local is not None
    e = e_local[0] if ef_on else None  # (n_dev, chunk): one slot per send
    e_out = []

    def encode(x, key, slot):
        """EF-compensated encode; returns (wire, new error for this slot)."""
        pre = x + scale * e[slot] if ef_on else x
        sig = comp_chunk.compress(pre, key)
        if ef_on:
            e_out.append(pre - comp_chunk.decompress(sig))
        return pack_signature(comp_chunk, sig)

    acc = jnp.take(segs, my, axis=0)
    for s in range(n_dev - 1):
        hop_key = jax.random.fold_in(jax.random.fold_in(keys, my), s)
        wire = encode(acc, hop_key, s)
        recv = jax.tree.map(lambda w: jax.lax.ppermute(w, axis, perm), wire)
        partial = comp_chunk.decompress(unpack_signature(comp_chunk, recv))
        recv_idx = (my - s - 1) % n_dev
        acc = partial + jnp.take(segs, recv_idx, axis=0)

    # device d now holds the quantized sum of segment (d+1) % n_dev;
    # compressed all-gather + reorder back to segment order
    final_key = jax.random.fold_in(jax.random.fold_in(keys, my), n_dev)
    wire = encode(acc, final_key, n_dev - 1)
    gathered = jax.tree.map(lambda w: jax.lax.all_gather(w, axis), wire)
    decoded = jax.vmap(
        lambda wd: comp_chunk.decompress(unpack_signature(comp_chunk, wd))
    )(gathered)  # (D, chunk); decoded[d] = segment (d+1) % D
    order = (jnp.arange(n_dev) - 1) % n_dev  # out_seg[j] came from device j-1
    out = jnp.take(decoded, order, axis=0).reshape(-1)[:size]
    return out, (jnp.stack(e_out)[None] if ef_on else None)


def _pmean_tree(tree, axis):
    """pmean of a whole pytree as ONE collective: ravel+concat the leaves,
    pmean the single vector, split back.  A per-leaf ``tree.map(pmean)``
    emits one collective op per leaf (~106 BN-stat leaves on ResNet-50),
    which multiplies both compile time and launch overhead."""
    leaves, treedef = jax.tree.flatten(tree)
    if not leaves:
        return tree
    if len(leaves) == 1:
        return jax.tree.unflatten(
            treedef, [jax.lax.pmean(leaves[0], axis)]
        )
    flat = jnp.concatenate([l.reshape(-1) for l in leaves])
    flat = jax.lax.pmean(flat, axis)
    out, off = [], 0
    for l in leaves:
        n = int(np.prod(l.shape)) if l.shape else 1
        out.append(flat[off:off + n].reshape(l.shape))
        off += n
    return jax.tree.unflatten(treedef, out)


def segment_chunk_size(unit_size: int, n_dev: int, align: int) -> int:
    """Per-device segment size: ceil(unit/D) rounded up to the compressor's
    subvector alignment."""
    base = -(-unit_size // n_dev)
    return -(-base // align) * align


# --------------------------------------------------------------------------
# the mesh training step
# --------------------------------------------------------------------------

def make_mesh_train_step(config, model, plan: UnitPlan, tx, state: TrainState):
    """Build a jitted shard_map training step over the users mesh.

    Returns (train_step, resharded_state).  EF state is sharded over the
    users axis; params/opt_state/server-EF are replicated.
    """
    axis = config.mesh_axis
    mesh, local_users = make_user_mesh(config.num_users, axis)
    n_dev = mesh.devices.size
    packed = config.wire == "packed"
    from gqx.config import resolve_schedule

    momentum = resolve_schedule(config)[4]

    segmented_ring = config.mode == "ring" and config.ring_mode == "segmented"
    chunk_comps = None
    if segmented_ring:
        from gqx.compress import IdenticalCompressor, make_compressor

        chunk_comps = []
        for u in plan.units:
            align = max(int(getattr(u.compressor, "dim", 1)), 1)
            chunk = segment_chunk_size(u.size, n_dev, align)
            if isinstance(u.compressor, IdenticalCompressor):
                cc = IdenticalCompressor(chunk, (chunk,))
            else:
                cc = make_compressor(config.quantizer, chunk, (chunk,), config)
            chunk_comps.append((cc, chunk))
        if config.ef and state.agg_state.ef is not None:
            # segmented-ring EF state: one chunk-size slot per send each
            # device performs per step — (n_dev RS+AG sends) x chunk,
            # globally (n_dev, n_dev, chunk) sharded device-first (see
            # _ring_unit_segmented).  Replace the (num_users, unit) buffers
            # from init_state unless resuming from a segmented checkpoint.
            new_ef = []
            for (cc, chunk), cur in zip(chunk_comps, state.agg_state.ef):
                want = (n_dev, n_dev, chunk)
                new_ef.append(cur if cur.shape == want
                              else jnp.zeros(want, jnp.float32))
            state = state._replace(agg_state=AggState(
                ef=new_ef, server_ef=state.agg_state.server_ef))

    def user_grads(params, batch_stats, x, y):
        def loss_fn(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(
                variables, x, train=True,
                mutable=["batch_stats"] if batch_stats else [],
            )
            if batch_stats:
                logits, mutated = out
                new_stats = mutated["batch_stats"]
            else:
                logits, new_stats = (out[0] if isinstance(out, tuple) else out), batch_stats
            return cross_entropy(logits, y), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, new_stats

    folded = bool(getattr(config, "folded_users", False))

    def sharded_body(params, batch_stats, opt_state, agg_state, x, y, scale, lr, wd, key):
        # x: (U_local, B, ...) on this device
        if folded:
            # folded fwd/bwd over the LOCAL users (same ghost-routed
            # per-user-grad machinery as the sim backend, ~2x faster
            # backward than vmap — gqx.train.folded_user_grads); stats come
            # back already averaged over local users
            from gqx.train import folded_user_grads

            losses, grads, local_stats = folded_user_grads(
                model, plan, local_users, params, batch_stats, x, y
            )
        else:
            losses, grads, new_stats = jax.vmap(
                lambda xu, yu: user_grads(params, batch_stats, xu, yu)
            )(x, y)
            local_stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), new_stats)

        units = plan.pack(grads)  # [(U_local, unit_size)]
        keys = unit_keys(key, len(units), local_users)
        ef_on = agg_state.ef is not None
        server_on = agg_state.server_ef is not None

        my = jax.lax.axis_index(axis)
        agg_out, ef_out, server_out = [], [], []
        for ui, (u, g) in enumerate(zip(plan.units, units)):
            comp = u.compressor
            # distinct keys per (device, local user): fold the device index in
            dev_key = jax.random.fold_in(keys[ui][local_users], my)
            user_keys = jax.vmap(lambda i: jax.random.fold_in(dev_key, i))(
                jnp.arange(local_users)
            )
            server_key = keys[ui][local_users]  # same on all devices
            e = agg_state.ef[ui] if ef_on else None
            se = agg_state.server_ef[ui] if server_on else None

            if segmented_ring:
                cc, chunk = chunk_comps[ui]
                mean, e_new = _ring_unit_segmented(
                    cc, chunk, g, e, scale, keys[ui][local_users], axis, n_dev
                )
            elif config.mode == "ring":
                mean, e_new = _ring_unit(comp, g, e, scale, user_keys, axis, n_dev)
            elif packed:
                mean, e_new = _ps_unit_packed(comp, g, e, scale, user_keys, axis)
            else:
                mean, e_new = _ps_unit_logical(comp, g, e, scale, user_keys, axis)

            if config.mode == "ps" and config.two_phase:
                mean, se_new = _two_phase_unit(comp, mean, se, scale, server_key)
                if server_on:
                    server_out.append(se_new)
            elif server_on:
                server_out.append(se)

            agg_out.append(mean)
            if ef_on:
                ef_out.append(e_new)

        agg_grads = plan.unpack(agg_out)
        new_agg_state = AggState(
            ef=ef_out if ef_on else None,
            server_ef=server_out if server_on else None,
        )

        from gqx.train import fused_sgd_update

        new_params, new_opt_state = fused_sgd_update(
            agg_grads, params, opt_state, lr, wd, momentum)
        new_batch_stats = _pmean_tree(local_stats, axis)
        mean_loss = jax.lax.pmean(jnp.mean(losses), axis)
        return new_params, new_batch_stats, new_opt_state, new_agg_state, mean_loss

    replicated = P()
    users_first = P(axis)

    ef_spec = (
        [users_first for _ in plan.units] if state.agg_state.ef is not None else None
    )
    server_spec = (
        [replicated for _ in plan.units] if state.agg_state.server_ef is not None else None
    )
    agg_spec = AggState(ef=ef_spec, server_ef=server_spec)

    params_spec = jax.tree.map(lambda _: replicated, state.params)
    stats_spec = jax.tree.map(lambda _: replicated, state.batch_stats)
    opt_spec = jax.tree.map(lambda _: replicated, state.opt_state)

    body = jax.shard_map(
        sharded_body,
        mesh=mesh,
        in_specs=(
            params_spec, stats_spec, opt_spec, agg_spec,
            users_first, users_first, replicated, replicated, replicated, replicated,
        ),
        out_specs=(params_spec, stats_spec, opt_spec, agg_spec, replicated),
        check_vma=False,
    )

    @jax.jit
    def _train_step(state: TrainState, x, y, scale, lr, wd, key):
        params, batch_stats, opt_state, agg_state, loss = body(
            state.params, state.batch_stats, state.opt_state, state.agg_state,
            x, y, scale, lr, wd, key,
        )
        return (
            TrainState(params, batch_stats, opt_state, agg_state, state.step + 1),
            loss,
        )

    def train_step(state, x, y, scale, lr, wd, key):
        return _train_step(state, x, y, scale, lr, wd, key)

    train_step.mesh = mesh  # exposed for multi-host data feeding (runner)

    # reshard state onto the mesh
    def shard_tree(tree, spec_tree):
        return jax.tree.map(
            lambda v, s: jax.device_put(v, NamedSharding(mesh, s)), tree, spec_tree
        )

    state = TrainState(
        params=shard_tree(state.params, params_spec),
        batch_stats=shard_tree(state.batch_stats, stats_spec),
        opt_state=shard_tree(state.opt_state, opt_spec),
        agg_state=AggState(
            ef=shard_tree(state.agg_state.ef, ef_spec) if ef_spec is not None else None,
            server_ef=shard_tree(state.agg_state.server_ef, server_spec)
            if server_spec is not None
            else None,
        ),
        step=state.step,
    )
    return train_step, state
