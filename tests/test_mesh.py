"""Simulated-users vs real-mesh parity (SURVEY.md §4 (b)): on the 8-virtual-
device CPU mesh, the shard_map collectives must produce the same training
trajectory as the vmap/scan simulation for deterministic compressors, in
every mode (ps logical / ps packed / ring / two-phase / EF)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gqx.config import GQConfig
from gqx.data import Pipeline
from gqx.models import create_model
from gqx.parallel.collectives import make_mesh_train_step, make_user_mesh
from gqx.train import create_train_state, make_train_step


def run_steps(cfg, n_steps=2):
    pipeline = Pipeline(cfg)
    model = create_model(cfg.network, cfg.num_classes)
    sample = jnp.zeros((cfg.batch_size,) + pipeline.image_shape, jnp.float32)
    state, comps, tx = create_train_state(cfg, model, sample, jax.random.PRNGKey(0))
    if cfg.backend == "mesh":
        step_fn, state = make_mesh_train_step(cfg, model, comps, tx, state)
    else:
        step_fn = make_train_step(cfg, model, comps, tx)
    losses = []
    it = pipeline.train_epoch(1)
    for i in range(n_steps):
        x, y = next(it)
        state, loss = step_fn(
            state, jnp.asarray(x), jnp.asarray(y), jnp.float32(1.0),
            jnp.float32(0.05), jnp.float32(5e-4), jax.random.PRNGKey(100 + i),
        )
        losses.append(float(loss))
    return jax.device_get(state), losses


def base_cfg(**kw):
    d = dict(
        network="fcn", dataset="synthetic", quantizer="qsgd", mode="ps",
        c_dim=128, n_bit=4, random=False, num_users=8, batch_size=8,
        test_batch_size=64, seed=5,
    )
    d.update(kw)
    return GQConfig(**d)


def assert_trees_close(a, b, rtol=2e-4, atol=2e-5, flip_frac=2e-3):
    """Quantization-aware closeness: sim (vmap) and mesh (shard_map) compile
    differently, so per-user grads differ by float rounding; a gradient value
    sitting exactly on a quantization bucket edge can flip buckets, changing
    isolated elements by one quantization step.  Allow a tiny fraction of
    such flips; everything else must match tightly."""
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        x, y = np.asarray(x), np.asarray(y)
        close = np.isclose(x, y, rtol=rtol, atol=atol)
        frac_bad = 1.0 - close.mean()
        assert frac_bad <= flip_frac, f"{frac_bad:.4%} elements differ"
        # flipped elements are still bounded by ~one quantization step
        assert np.max(np.abs(x - y)) < 0.05, np.max(np.abs(x - y))


@pytest.mark.parametrize("mode,wire,ef,two_phase", [
    ("ps", "logical", False, False),
    ("ps", "packed", False, False),
    ("ps", "packed", True, False),
    ("ps", "packed", True, True),
    ("ps", "logical", True, False),
    ("ps", "logical", True, True),
    ("ring", "logical", False, False),
    ("ring", "logical", True, False),
])
def test_mesh_matches_sim(mode, wire, ef, two_phase):
    assert len(jax.devices()) == 8, "conftest must provide 8 CPU devices"
    cfg_sim = base_cfg(mode=mode, ef=ef, two_phase=two_phase, backend="sim")
    cfg_mesh = base_cfg(mode=mode, ef=ef, two_phase=two_phase, backend="mesh", wire=wire)
    state_sim, losses_sim = run_steps(cfg_sim)
    state_mesh, losses_mesh = run_steps(cfg_mesh)
    np.testing.assert_allclose(losses_sim, losses_mesh, rtol=1e-4)
    assert_trees_close(state_sim.params, state_mesh.params)
    if ef:
        assert_trees_close(state_sim.agg_state.ef, state_mesh.agg_state.ef)


def test_segmented_ring_identity_matches_chain():
    """With the identity compressor the segmented ring is an exact sum —
    same result as the chain (both equal plain gradient sum)."""
    cfg_chain = base_cfg(mode="ring", quantizer="sgd", backend="mesh")
    cfg_seg = base_cfg(mode="ring", quantizer="sgd", backend="mesh",
                       ring_mode="segmented")
    s1, l1 = run_steps(cfg_chain)
    s2, l2 = run_steps(cfg_seg)
    np.testing.assert_allclose(l1, l2, rtol=1e-5)
    assert_trees_close(s1.params, s2.params)


def test_segmented_ring_qsgd_close_to_sum():
    """Quantized segmented ring approximates the gradient sum: train a couple
    of steps and check losses stay finite and close to the chain's."""
    cfg = base_cfg(mode="ring", backend="mesh", ring_mode="segmented", n_bit=8)
    state, losses = run_steps(cfg)
    assert all(np.isfinite(losses))
    cfg_chain = base_cfg(mode="ring", backend="mesh", n_bit=8)
    _, losses_chain = run_steps(cfg_chain)
    np.testing.assert_allclose(losses, losses_chain, rtol=0.05)


def test_segmented_ring_ef():
    """Segmented-ring EF (per-(device, hop) error slots): at step 1 the
    error state is zero, so EF-on == EF-off exactly; afterwards the EF
    state holds each send's quantization residual (nonzero for a lossy
    compressor) and training stays finite."""
    cfg_off = base_cfg(mode="ring", backend="mesh", ring_mode="segmented",
                       n_bit=4)
    cfg_on = dataclasses.replace(cfg_off, ef=True)
    s_off, l_off = run_steps(cfg_off, n_steps=1)
    s_on, l_on = run_steps(cfg_on, n_steps=1)
    np.testing.assert_allclose(l_off, l_on, rtol=1e-6)
    assert_trees_close(s_off.params, s_on.params)

    s_on2, l_on2 = run_steps(cfg_on, n_steps=3)
    assert all(np.isfinite(l_on2))
    # EF buffers have the segmented shape (D, D, chunk) and nonzero content
    # for the quantized unit(s)
    assert any(
        e.ndim == 3 and float(np.abs(np.asarray(e)).max()) > 0
        for e in s_on2.agg_state.ef
    )


def test_segmented_ring_ef_identity_error_is_zero():
    """With the identity compressor every send is lossless, so the EF state
    must stay exactly zero."""
    cfg = base_cfg(mode="ring", quantizer="sgd", backend="mesh",
                   ring_mode="segmented", ef=True)
    state, _ = run_steps(cfg, n_steps=2)
    for e in state.agg_state.ef:
        assert float(np.abs(np.asarray(e)).max()) == 0.0


def test_mesh_stochastic_runs_finite():
    cfg = base_cfg(quantizer="hsq", c_dim=16, k_bit=6, n_bit=6, random=True,
                   ef=True, backend="mesh", wire="packed")
    state, losses = run_steps(cfg)
    assert all(np.isfinite(losses))
    for leaf in jax.tree.leaves(state.params):
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_mesh_fewer_users_than_requested_divisor():
    mesh, local = make_user_mesh(12)  # 8 devices, 12 users -> 6 devices x 2? 4x3
    assert 12 % mesh.devices.size == 0
    assert local == 12 // mesh.devices.size
