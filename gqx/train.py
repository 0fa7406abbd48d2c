"""Training driver: jitted multi-user step + eval.

Reference behavior being re-designed (SURVEY.md §2.2, §3.2): ``one_iter``
(reference main.py:216-233) runs per-user forward/backward sequentially on
micro-batches, records quantized gradients, applies the aggregator, then
``optimizer.step()``.  Here the users axis is a ``vmap`` (single chip) or a
mesh axis (gqx.parallel.collectives); everything — per-user grads, EF,
compression, aggregation, SGD update — is one fused jit.

Optimizer parity: torch ``optim.SGD(lr, momentum, weight_decay)``
(reference main.py:133-134) ==
``add_decayed_weights(wd) → trace(momentum) → scale(-lr)``; the quantizer
modifies gradients *before* the optimizer sees them, so weight decay and
momentum act on the aggregated decompressed gradient, exactly like the
reference.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from gqx.parallel.aggregate import AggState, init_state, make_aggregator
from gqx.parallel.packing import UnitPlan, plan_units

PyTree = Any


class TrainState(NamedTuple):
    params: PyTree
    batch_stats: PyTree
    opt_state: PyTree
    agg_state: AggState
    step: jax.Array


def create_train_state(config, model, sample_input, key) -> Tuple[TrainState, UnitPlan, Any]:
    """Initialize params/batch_stats/optimizer/EF state and the compression
    unit plan.  Returns (state, plan, tx)."""
    variables = model.init(key, sample_input, train=True)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    from gqx.config import resolve_schedule

    _, _, _, _, momentum, _ = resolve_schedule(config)
    # Weight decay is applied inline in the train step (g + wd*p) so it can
    # follow the reference's boundary-epoch re-hardcode (config.wd_at_epoch);
    # add_decayed_weights(wd) -> trace is equivalent when wd is constant.
    tx = optax.trace(decay=momentum, nesterov=False)
    opt_state = tx.init(params)
    plan = plan_units(params, config)
    agg_state = init_state(plan, config.num_users, config.ef, config.two_phase)
    state = TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        agg_state=agg_state,
        step=jnp.zeros((), jnp.int32),
    )
    return state, plan, tx


def cross_entropy(logits, labels):
    return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(logits, labels))


def fused_sgd_update(agg_grads, params, opt_state, lr, wd, momentum):
    """One-pass SGD+momentum+wd update.

    Bit-equal to ``add wd -> optax.trace -> p - lr*u`` (the exact torch
    ``optim.SGD`` semantics, reference main.py:133-134) but emitted as a
    single tree.map so XLA fuses the whole update into one read of
    (g, p, t) and one write of (p', t') per leaf — the 3-pass version
    measured 4.9 ms vs a ~1.3 ms HBM bound (PERF.md round 3).
    """
    def upd(g, p, t):
        t2 = (g + wd * p) + momentum * t
        return p - lr * t2, t2

    out = jax.tree.map(upd, agg_grads, params, opt_state.trace)
    new_params = jax.tree.map(lambda o: o[0], out,
                              is_leaf=lambda o: isinstance(o, tuple))
    new_trace = jax.tree.map(lambda o: o[1], out,
                             is_leaf=lambda o: isinstance(o, tuple))
    return new_params, opt_state._replace(trace=new_trace)


def make_train_step(config, model, plan: UnitPlan, tx) -> Callable:
    """Build the jitted step: (state, x (U,B,H,W,C), y (U,B), scale, lr, key)
    -> (state, mean_loss).

    With ``config.folded_users`` (sim backend), the per-user fwd/bwd runs on
    the FOLDED (U*B) batch with per-user weight grads routed through the
    ghost collection (gqx/models/folded.py) — measured ~2x faster backward
    than vmap (PERF.md); per-user BN statistics and the resulting gradients
    match the vmapped path (tests/test_folded.py)."""
    if getattr(config, "folded_users", False) and config.backend == "sim":
        return _make_train_step_folded(config, model, plan, tx)
    aggregator = make_aggregator(config, plan)
    from gqx.config import resolve_schedule

    momentum = resolve_schedule(config)[4]

    def user_grads(params, batch_stats, x, y):
        def loss_fn(p):
            variables = {"params": p}
            if batch_stats:
                variables["batch_stats"] = batch_stats
            out = model.apply(variables, x, train=True, mutable=["batch_stats"] if batch_stats else [])
            if batch_stats:
                logits, mutated = out
                new_stats = mutated["batch_stats"]
            else:
                logits, new_stats = (out[0] if isinstance(out, tuple) else out), batch_stats
            return cross_entropy(logits, y), new_stats

        (loss, new_stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        return loss, grads, new_stats

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, y, scale, lr, wd, key):
        # per-user forward/backward over the users axis
        with jax.named_scope("user_fwd_bwd"):
            losses, grads, new_stats = jax.vmap(
                lambda xu, yu: user_grads(state.params, state.batch_stats, xu, yu)
            )(x, y)

        with jax.named_scope("quantized_aggregate"):
            agg_grads, agg_state = aggregator(grads, state.agg_state, scale, key)

        with jax.named_scope("sgd_update"):
            params, opt_state = fused_sgd_update(
                agg_grads, state.params, state.opt_state, lr, wd, momentum)

        # the reference's sequential per-user BN updates collapse to averaging
        # the per-user running stats (simulation detail, SURVEY.md §2.2)
        batch_stats = jax.tree.map(lambda s: jnp.mean(s, axis=0), new_stats)

        return (
            TrainState(params, batch_stats, opt_state, agg_state, state.step + 1),
            jnp.mean(losses),
        )

    return train_step


def folded_user_grads(model, plan: UnitPlan, users: int, params, batch_stats,
                      x, y):
    """Folded-users forward/backward: one fwd/bwd on the (U*B,) folded batch
    with ghost-routed per-user weight grads (gqx/models/folded.py).

    Per-user grads: ghost-covered leaves (conv/dense kernels, BN
    scale/bias — gqx/models/common.py folded wrappers) get the true
    per-user gradient from the ghost cotangent; every other leaf gets the
    folded total / U broadcast, which is exact because such leaves are
    guaranteed (asserted) to sit in identity-compressor (passthrough)
    units: the identity roundtrip is linear with zero EF error, so
    mean/sum aggregation of the broadcast equals that of the true
    per-user values.

    ``x``: (U, B, ...), ``y``: (U, B).  Returns (losses (U,), grads with a
    leading users axis on every leaf, new_stats WITHOUT a users axis — the
    folded BatchNorm already averaged the per-user stat updates).  Shared by
    the sim step and the mesh body (where U = local users per device)."""
    from gqx.compress.scalar import IdenticalCompressor
    from gqx.models.common import folded_users

    def _path_str(path):
        return "/".join(str(getattr(k, "key", k)) for k in path)

    u, b = x.shape[0], x.shape[1]
    xf = x.reshape((u * b,) + x.shape[2:])

    with folded_users(u):
        gv = jax.eval_shape(
            functools.partial(model.init, train=True),
            jax.random.PRNGKey(0), xf,
        )
    ghosts0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype), gv["ghosts"])

    has_bn = bool(batch_stats)

    def loss_fold(gh, p):
        variables = {"params": p, "ghosts": gh}
        if has_bn:
            variables["batch_stats"] = batch_stats
        with folded_users(u):
            out = model.apply(
                variables, xf, train=True,
                mutable=["batch_stats"] if has_bn else [],
            )
        if has_bn:
            logits, mutated = out
            stats = mutated["batch_stats"]
        else:
            logits = out[0] if isinstance(out, tuple) else out
            stats = batch_stats
        lg = logits.reshape(u, b, -1)
        losses = jax.vmap(cross_entropy)(lg, y)
        return jnp.sum(losses), (losses, stats)

    (_, (losses, new_stats)), (g_ghost, g_param) = jax.value_and_grad(
        loss_fold, argnums=(0, 1), has_aux=True
    )(ghosts0, params)

    # merge: ghost-covered leaves get true per-user grads; others
    # get the folded total / U broadcast (exact for passthrough)
    ghost_flat = {
        _path_str(path): g
        for path, g in jax.tree_util.tree_flatten_with_path(g_ghost)[0]
    }
    merged = []
    uncovered_idx = []
    param_items = jax.tree_util.tree_flatten_with_path(g_param)[0]
    for i, (path, g) in enumerate(param_items):
        key_ = _path_str(path)
        if key_ in ghost_flat:
            merged.append(ghost_flat[key_].astype(jnp.float32))
        else:
            uncovered_idx.append(i)
            merged.append(
                jnp.broadcast_to(
                    (g / u)[None].astype(jnp.float32), (u,) + g.shape
                )
            )
    # every uncovered leaf must be in an identity (passthrough) unit
    for unit in plan.units:
        if isinstance(unit.compressor, IdenticalCompressor):
            continue
        bad = set(unit.leaf_indices) & set(uncovered_idx)
        assert not bad, (
            f"folded_users: leaves {bad} are compressed but have no "
            f"ghost — per-user grads would be wrong; use the vmap "
            f"path for this model/config"
        )
    grads = jax.tree.unflatten(jax.tree.structure(g_param), merged)
    return losses, grads, new_stats


def _make_train_step_folded(config, model, plan: UnitPlan, tx) -> Callable:
    """Folded-users step (see make_train_step and folded_user_grads
    docstrings)."""
    aggregator = make_aggregator(config, plan)
    users = config.num_users
    from gqx.config import resolve_schedule

    momentum = resolve_schedule(config)[4]

    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(state: TrainState, x, y, scale, lr, wd, key):
        with jax.named_scope("user_fwd_bwd_folded"):
            losses, grads, new_stats = folded_user_grads(
                model, plan, users, state.params, state.batch_stats, x, y
            )

        with jax.named_scope("quantized_aggregate"):
            agg_grads, agg_state = aggregator(grads, state.agg_state, scale, key)

        with jax.named_scope("sgd_update"):
            params, opt_state = fused_sgd_update(
                agg_grads, state.params, state.opt_state, lr, wd, momentum)

        # FoldedBatchNorm already averaged the per-user stat updates
        return (
            TrainState(params, new_stats, opt_state, agg_state, state.step + 1),
            jnp.mean(losses),
        )

    return train_step


def make_eval_step(model) -> Callable:
    @jax.jit
    def eval_step(params, batch_stats, x, y):
        variables = {"params": params}
        if batch_stats:
            variables["batch_stats"] = batch_stats
        logits = model.apply(variables, x, train=False)
        loss = optax.softmax_cross_entropy_with_integer_labels(logits, y)
        correct = jnp.sum(jnp.argmax(logits, axis=-1) == y)
        return jnp.mean(loss), correct

    return eval_step


def evaluate(eval_step, state: TrainState, batches) -> Tuple[float, float]:
    """Full test-set eval (reference main.py:236-255): returns
    (loss, accuracy).  Loss reproduces the reference definition exactly —
    sum of per-batch *mean* CE divided by dataset size (its :245,250) —
    so logged curves are directly comparable; with B-sized full batches this
    equals true-mean-CE / B."""
    total_loss, total_correct, total_n = 0.0, 0, 0
    for x, y in batches:
        loss, correct = eval_step(state.params, state.batch_stats, x, y)
        total_loss += float(loss)
        total_correct += int(correct)
        total_n += len(y)
    return total_loss / max(total_n, 1), total_correct / max(total_n, 1)
