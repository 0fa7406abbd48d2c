"""Aggregation-layer tests: PS mean semantics, ring sum semantics, error
feedback telescoping, two-phase downlink recompression (SURVEY.md §2.3)."""

import jax
import jax.numpy as jnp
import numpy as np

from gqx.compress import IdenticalCompressor, QSGDCompressor, build_leaf_compressors
from gqx.config import GQConfig
from gqx.parallel.aggregate import (
    AggState,
    init_state,
    make_aggregator,
    ps_aggregate,
    ring_aggregate,
)

U = 4


def make_grads(rng, shapes):
    return {k: jnp.asarray(rng.standard_normal((U,) + s), jnp.float32) for k, s in shapes.items()}


def identity_comps(grads):
    return {k: IdenticalCompressor(int(np.prod(g.shape[1:])), g.shape[1:]) for k, g in grads.items()}


def test_ps_identity_is_mean(rng):
    grads = make_grads(rng, {"w": (32, 8), "b": (8,)})
    comps = identity_comps(grads)
    state = init_state({k: g[0] for k, g in grads.items()}, U, ef=False, two_phase=False)
    agg, _ = ps_aggregate(comps, grads, state, jnp.float32(1.0), jax.random.PRNGKey(0))
    for k in grads:
        np.testing.assert_allclose(np.asarray(agg[k]), np.asarray(grads[k]).mean(0), rtol=1e-6)


def test_ring_identity_is_sum(rng):
    grads = make_grads(rng, {"w": (16, 4)})
    comps = identity_comps(grads)
    state = init_state({k: g[0] for k, g in grads.items()}, U, ef=False, two_phase=False)
    agg, _ = ring_aggregate(comps, grads, state, jnp.float32(1.0), jax.random.PRNGKey(0))
    # reference ring_quantizer.py:45-47: final value is the SUM over users
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(grads["w"]).sum(0), rtol=1e-5)


def test_ps_qsgd_deterministic_matches_manual(rng):
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    comp = QSGDCompressor(2048, (2048,), n_bit=4, c_dim=128, random=False)
    grads = {"w": g}
    state = init_state({"w": g[0]}, U, ef=False, two_phase=False)
    agg, _ = ps_aggregate({"w": comp}, grads, state, jnp.float32(1.0), jax.random.PRNGKey(0))
    manual = jnp.mean(jnp.stack([comp.roundtrip(g[u]) for u in range(U)]), axis=0)
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(manual), rtol=1e-6)


def test_ps_error_feedback_telescopes(rng):
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    comp = QSGDCompressor(2048, (2048,), n_bit=2, c_dim=128, random=False)
    grads = {"w": g}
    state = init_state({"w": g[0]}, U, ef=True, two_phase=False)
    scale = jnp.float32(1.0)
    agg, new_state = ps_aggregate({"w": comp}, grads, state, scale, jax.random.PRNGKey(0))
    # error[user] = adjusted_grad - decompressed (reference ps_quantizer.py:39)
    for u in range(U):
        adj = g[u] + scale * state.ef["w"][u]
        dec = comp.roundtrip(adj)
        np.testing.assert_allclose(
            np.asarray(new_state.ef["w"][u]), np.asarray(adj - dec), rtol=1e-5, atol=1e-6
        )
    # and the aggregate is the mean of the decompressed values
    manual = jnp.mean(jnp.stack([comp.roundtrip(g[u]) for u in range(U)]), axis=0)
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(manual), rtol=1e-5)


def test_ps_two_phase_recompression(rng):
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    comp = QSGDCompressor(2048, (2048,), n_bit=4, c_dim=128, random=False)
    state = init_state({"w": g[0]}, U, ef=False, two_phase=True)
    agg, _ = ps_aggregate(
        {"w": comp}, {"w": g}, state, jnp.float32(1.0), jax.random.PRNGKey(0), two_phase=True
    )
    mean = jnp.mean(jnp.stack([comp.roundtrip(g[u]) for u in range(U)]), axis=0)
    manual = comp.roundtrip(mean)  # downlink recompression (ps_quantizer.py:52-61)
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(manual), rtol=1e-5)


def test_ps_two_phase_server_ef(rng):
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    comp = QSGDCompressor(2048, (2048,), n_bit=2, c_dim=128, random=False)
    state = init_state({"w": g[0]}, U, ef=True, two_phase=True)
    agg, new_state = ps_aggregate(
        {"w": comp}, {"w": g}, state, jnp.float32(1.0), jax.random.PRNGKey(0), two_phase=True
    )
    mean = jnp.mean(jnp.stack([comp.roundtrip(g[u]) for u in range(U)]), axis=0)
    dec2 = comp.roundtrip(mean)  # server_error starts at zero
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(dec2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.server_ef["w"]), np.asarray(mean - dec2), rtol=1e-5, atol=1e-6
    )


def test_ring_chain_order(rng):
    """Ring hop i compresses (partial_{i-1} + g_i): verify against a manual
    sequential chain (reference ring_quantizer.py:31-43)."""
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    comp = QSGDCompressor(2048, (2048,), n_bit=4, c_dim=128, random=False)
    state = init_state({"w": g[0]}, U, ef=False, two_phase=False)
    agg, _ = ring_aggregate({"w": comp}, {"w": g}, state, jnp.float32(1.0), jax.random.PRNGKey(0))
    partial = comp.roundtrip(g[0])
    for u in range(1, U):
        partial = comp.roundtrip(g[u] + partial)
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(partial), rtol=1e-5)


def test_make_aggregator_jits(rng):
    cfg = GQConfig(quantizer="qsgd", mode="ps", c_dim=128, n_bit=2, ef=True,
                   num_users=U, dataset="synthetic")
    params = {"w": jnp.zeros((64, 64)), "b": jnp.zeros((64,))}
    comps = build_leaf_compressors(params, cfg)
    aggf = make_aggregator(cfg, comps)
    grads = make_grads(rng, {"w": (64, 64), "b": (64,)})
    state = init_state(params, U, ef=True, two_phase=False)
    jitted = jax.jit(aggf)
    agg, new_state = jitted(grads, state, jnp.float32(0.5), jax.random.PRNGKey(2))
    assert agg["w"].shape == (64, 64)
    assert new_state.ef["w"].shape == (U, 64, 64)
    # small leaf is passthrough: aggregate == plain mean, EF error stays 0
    np.testing.assert_allclose(
        np.asarray(agg["b"]), np.asarray(grads["b"]).mean(0), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(new_state.ef["b"]), 0.0, atol=1e-6)
