"""Aggregation-layer tests: PS mean semantics, ring sum semantics, error
feedback telescoping, two-phase downlink recompression (SURVEY.md §2.3),
and unit-plan packing."""

import jax
import jax.numpy as jnp
import numpy as np

from gqx.compress import IdenticalCompressor, QSGDCompressor
from gqx.config import GQConfig
from gqx.parallel.aggregate import (
    init_state,
    make_aggregator,
    ps_aggregate,
    ring_aggregate,
)
from gqx.parallel.packing import plan_from_leaf_compressors, plan_units

U = 4


def make_grads(rng, shapes):
    return {k: jnp.asarray(rng.standard_normal((U,) + s), jnp.float32) for k, s in shapes.items()}


def identity_plan(grads):
    params = {k: g[0] for k, g in grads.items()}
    comps = {k: IdenticalCompressor(int(np.prod(g.shape[1:])), g.shape[1:]) for k, g in grads.items()}
    return plan_from_leaf_compressors(params, comps)


def single_qsgd_plan(g0, **kw):
    params = {"w": g0}
    comps = {"w": QSGDCompressor(g0.size, g0.shape, **kw)}
    return plan_from_leaf_compressors(params, comps), comps["w"]


def test_ps_identity_is_mean(rng):
    grads = make_grads(rng, {"w": (32, 8), "b": (8,)})
    plan = identity_plan(grads)
    state = init_state(plan, U, ef=False, two_phase=False)
    agg, _ = ps_aggregate(plan, grads, state, jnp.float32(1.0), jax.random.PRNGKey(0))
    for k in grads:
        np.testing.assert_allclose(np.asarray(agg[k]), np.asarray(grads[k]).mean(0), rtol=1e-6)


def test_ring_identity_is_sum(rng):
    grads = make_grads(rng, {"w": (16, 4)})
    plan = identity_plan(grads)
    state = init_state(plan, U, ef=False, two_phase=False)
    agg, _ = ring_aggregate(plan, grads, state, jnp.float32(1.0), jax.random.PRNGKey(0))
    # reference ring_quantizer.py:45-47: final value is the SUM over users
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(grads["w"]).sum(0), rtol=1e-5)


def test_ps_qsgd_deterministic_matches_manual(rng):
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    plan, comp = single_qsgd_plan(g[0], n_bit=4, c_dim=128, random=False)
    state = init_state(plan, U, ef=False, two_phase=False)
    agg, _ = ps_aggregate(plan, {"w": g}, state, jnp.float32(1.0), jax.random.PRNGKey(0))
    manual = jnp.mean(jnp.stack([comp.roundtrip(g[u]) for u in range(U)]), axis=0)
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(manual), rtol=1e-6)


def test_ps_error_feedback_telescopes(rng):
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    plan, comp = single_qsgd_plan(g[0], n_bit=2, c_dim=128, random=False)
    state = init_state(plan, U, ef=True, two_phase=False)
    scale = jnp.float32(1.0)
    agg, new_state = ps_aggregate(plan, {"w": g}, state, scale, jax.random.PRNGKey(0))
    # error[user] = adjusted_grad - decompressed (reference ps_quantizer.py:39)
    for u in range(U):
        adj = g[u] + scale * state.ef[0][u]
        dec = comp.roundtrip(adj)
        np.testing.assert_allclose(
            np.asarray(new_state.ef[0][u]), np.asarray(adj - dec), rtol=1e-5, atol=1e-6
        )
    manual = jnp.mean(jnp.stack([comp.roundtrip(g[u]) for u in range(U)]), axis=0)
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(manual), rtol=1e-5)


def test_ps_two_phase_recompression(rng):
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    plan, comp = single_qsgd_plan(g[0], n_bit=4, c_dim=128, random=False)
    state = init_state(plan, U, ef=False, two_phase=True)
    agg, _ = ps_aggregate(
        plan, {"w": g}, state, jnp.float32(1.0), jax.random.PRNGKey(0), two_phase=True
    )
    mean = jnp.mean(jnp.stack([comp.roundtrip(g[u]) for u in range(U)]), axis=0)
    manual = comp.roundtrip(mean)  # downlink recompression (ps_quantizer.py:52-61)
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(manual), rtol=1e-5)


def test_ps_two_phase_server_ef(rng):
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    plan, comp = single_qsgd_plan(g[0], n_bit=2, c_dim=128, random=False)
    state = init_state(plan, U, ef=True, two_phase=True)
    agg, new_state = ps_aggregate(
        plan, {"w": g}, state, jnp.float32(1.0), jax.random.PRNGKey(0), two_phase=True
    )
    mean = jnp.mean(jnp.stack([comp.roundtrip(g[u]) for u in range(U)]), axis=0)
    dec2 = comp.roundtrip(mean)  # server_error starts at zero
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(dec2), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(new_state.server_ef[0]), np.asarray(mean - dec2), rtol=1e-5, atol=1e-6
    )


def test_ring_chain_order(rng):
    """Ring hop i compresses (partial_{i-1} + g_i): verify against a manual
    sequential chain (reference ring_quantizer.py:31-43)."""
    g = jnp.asarray(rng.standard_normal((U, 2048)), jnp.float32)
    plan, comp = single_qsgd_plan(g[0], n_bit=4, c_dim=128, random=False)
    state = init_state(plan, U, ef=False, two_phase=False)
    agg, _ = ring_aggregate(plan, {"w": g}, state, jnp.float32(1.0), jax.random.PRNGKey(0))
    partial = comp.roundtrip(g[0])
    for u in range(1, U):
        partial = comp.roundtrip(g[u] + partial)
    np.testing.assert_allclose(np.asarray(agg["w"]), np.asarray(partial), rtol=1e-5)


def test_make_aggregator_jits(rng):
    cfg = GQConfig(quantizer="qsgd", mode="ps", c_dim=128, n_bit=2, ef=True,
                   num_users=U, dataset="synthetic")
    params = {"w": jnp.zeros((64, 64)), "b": jnp.zeros((64,))}
    plan = plan_units(params, cfg)
    aggf = make_aggregator(cfg, plan)
    grads = make_grads(rng, {"w": (64, 64), "b": (64,)})
    state = init_state(plan, U, ef=True, two_phase=False)
    jitted = jax.jit(aggf)
    agg, new_state = jitted(grads, state, jnp.float32(0.5), jax.random.PRNGKey(2))
    assert agg["w"].shape == (64, 64)
    # small leaf is passthrough: aggregate == plain mean, its EF error stays 0
    np.testing.assert_allclose(
        np.asarray(agg["b"]), np.asarray(grads["b"]).mean(0), rtol=1e-5, atol=1e-6
    )


def test_plan_units_grouping():
    cfg = GQConfig(quantizer="hsq", c_dim=16, k_bit=6, n_bit=6, dataset="synthetic")
    params = {
        "a": jnp.zeros((64, 64)),     # 4096, divisible by 16 -> grouped
        "b": jnp.zeros((48, 64)),     # 3072, divisible      -> grouped
        "c": jnp.zeros((1032,)),      # ragged (1032 % 16 != 0; fixup -> 24) -> own unit
        "small": jnp.zeros((10,)),    # passthrough
    }
    plan = plan_units(params, cfg)
    kinds = sorted((len(u.leaf_indices), type(u.compressor).__name__) for u in plan.units)
    # one grouped HSQ unit (a+b), one ragged HSQ unit (c), one identity (small)
    assert len(plan.units) == 3
    grouped = [u for u in plan.units if len(u.leaf_indices) == 2][0]
    assert grouped.size == 4096 + 3072
    assert type(grouped.compressor).__name__ == "HSQCompressor"


def test_plan_pack_unpack_roundtrip(rng):
    cfg = GQConfig(quantizer="qsgd", c_dim=16, n_bit=4, dataset="synthetic")
    params = {"a": jnp.zeros((64, 64)), "b": jnp.zeros((32, 48)), "s": jnp.zeros((7,))}
    plan = plan_units(params, cfg)
    tree = {k: jnp.asarray(rng.standard_normal((U,) + tuple(v.shape)), jnp.float32)
            for k, v in params.items()}
    units = plan.pack(tree)
    assert all(u.shape[0] == U for u in units)
    back = plan.unpack(units)
    for k in tree:
        np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(tree[k]))


def test_grouped_vs_leafwise_qsgd_equivalence(rng):
    """With c_dim dividing every leaf, grouping does not change QSGD math
    (bucket boundaries align with leaf boundaries)."""
    cfg_g = GQConfig(quantizer="qsgd", c_dim=16, n_bit=4, random=False,
                     dataset="synthetic", grouping="auto")
    cfg_l = GQConfig(quantizer="qsgd", c_dim=16, n_bit=4, random=False,
                     dataset="synthetic", grouping="none")
    params = {"a": jnp.zeros((64, 64)), "b": jnp.zeros((32, 48))}
    grads = make_grads(rng, {"a": (64, 64), "b": (32, 48)})
    for cfg in (cfg_g, cfg_l):
        plan = plan_units(params, cfg)
        state = init_state(plan, U, ef=False, two_phase=False)
        agg, _ = ps_aggregate(plan, grads, state, jnp.float32(1.0), jax.random.PRNGKey(0))
        if cfg is cfg_g:
            agg_grouped = agg
    for k in grads:
        np.testing.assert_allclose(
            np.asarray(agg_grouped[k]), np.asarray(agg[k]), rtol=1e-6
        )


def test_grouped_vs_leafwise_hsq_equivalence(rng):
    """The grouped HSQ unit segments the norm quantizer's min/max range per
    original leaf (norm_segment_sizes), so grouping is exactly neutral for
    HSQ too — codes are per-subvector and the norm ranges match the
    reference's per-layer compressors (probabilistic_scalar_compressor.py:13-14)."""
    kw = dict(quantizer="hsq", c_dim=16, k_bit=6, n_bit=6, random=False,
              dataset="synthetic")
    cfg_g = GQConfig(grouping="auto", **kw)
    cfg_l = GQConfig(grouping="none", **kw)
    params = {"a": jnp.zeros((64, 64)), "b": jnp.zeros((32, 48))}
    grads = make_grads(rng, {"a": (64, 64), "b": (32, 48)})
    agg_by_mode = {}
    for cfg in (cfg_g, cfg_l):
        plan = plan_units(params, cfg)
        state = init_state(plan, U, ef=False, two_phase=False)
        agg, _ = ps_aggregate(plan, grads, state, jnp.float32(1.0), jax.random.PRNGKey(0))
        agg_by_mode[cfg.grouping] = agg
    for k in grads:
        np.testing.assert_allclose(
            np.asarray(agg_by_mode["auto"][k]), np.asarray(agg_by_mode["none"][k]),
            rtol=1e-6, atol=1e-7,
        )
    # and the grouped unit's norm quantizer really is segmented per leaf
    plan = plan_units(params, cfg_g)
    grouped = [u for u in plan.units if len(u.leaf_indices) == 2][0]
    assert grouped.compressor.norm_compressor.segment_sizes == (
        64 * 64 // 16, 32 * 48 // 16,
    )

def test_plan_pack_unpack_roundtrip_all_layouts(rng):
    """pack/unpack inverse for torch / outfirst / natural layouts, including
    conv-shaped and scan-stacked leaves."""
    params = {
        "conv": jnp.zeros((3, 3, 8, 16)),
        "conv1x1": jnp.zeros((1, 1, 16, 32)),
        "dense": jnp.zeros((48, 32)),
        "stacked": jnp.zeros((4, 3, 3, 8, 8)),  # nn.scan lead axis
        "bias": jnp.zeros((16,)),
    }
    tree = {k: jnp.asarray(rng.standard_normal((U,) + tuple(v.shape)), jnp.float32)
            for k, v in params.items()}
    for layout in ("torch", "outfirst", "natural"):
        cfg = GQConfig(quantizer="qsgd", c_dim=16, n_bit=4, dataset="synthetic")
        cfg.quant_layout = layout
        plan = plan_units(params, cfg)
        back = plan.unpack(plan.pack(tree))
        for k in tree:
            np.testing.assert_array_equal(np.asarray(back[k]), np.asarray(tree[k]))


def test_outfirst_matches_torch_for_dense_and_1x1():
    """outfirst == torch flattening for dense kernels and 1x1 convs (the
    permutations coincide), so the reference-partition parity is exact there."""
    from gqx.parallel.packing import outfirst_axis_order, torch_axis_order

    for shape in ((48, 32), (1, 1, 16, 32), (5, 48, 32)):
        a = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
        pt = torch_axis_order(shape)
        po = outfirst_axis_order(shape)
        np.testing.assert_array_equal(
            np.transpose(a, pt).reshape(-1), np.transpose(a, po).reshape(-1)
        )
    # 3x3 conv: different intra-subvector order, same output-unit-major rows
    shape = (3, 3, 8, 16)
    a = np.arange(np.prod(shape), dtype=np.float32).reshape(shape)
    t = np.transpose(a, torch_axis_order(shape)).reshape(16, -1)
    o = np.transpose(a, outfirst_axis_order(shape)).reshape(16, -1)
    # each row (one output unit) holds the same SET of weights
    np.testing.assert_array_equal(np.sort(t, axis=1), np.sort(o, axis=1))


def test_grouped_vs_leafwise_topk_maurey_equivalence(rng):
    """Top-k and Maurey budgets are per-layer in the reference
    (topk_sparsification_compressor.py:15-16, maurey_sparsification.py:9), so
    plan_units never groups them: grouping='auto' must produce exactly the
    per-leaf plan and bit-identical aggregates to grouping='none'."""
    params = {"a": jnp.zeros((64, 64)), "b": jnp.zeros((32, 48))}
    grads = make_grads(rng, {"a": (64, 64), "b": (32, 48)})
    for name in ("topk", "maurey"):
        agg_by_mode = {}
        for grouping in ("auto", "none"):
            cfg = GQConfig(quantizer=name, c_dim=32, k_bit=8, n_bit=8, cr=64,
                           dataset="synthetic", grouping=grouping)
            plan = plan_units(params, cfg)
            # every compressed unit must cover exactly one leaf
            assert all(len(u.leaf_indices) == 1 for u in plan.units
                       if not isinstance(u.compressor, IdenticalCompressor)), name
            state = init_state(plan, U, ef=False, two_phase=False)
            agg, _ = ps_aggregate(plan, grads, state, jnp.float32(1.0),
                                  jax.random.PRNGKey(0))
            agg_by_mode[grouping] = agg
        for k in grads:
            np.testing.assert_array_equal(
                np.asarray(agg_by_mode["auto"][k]), np.asarray(agg_by_mode["none"][k])
            ), name


def test_bf16_units_equal_bf16_rounded_f32_pipeline(rng):
    """unit_dtype='auto' with hsq_passes=1 + bf16 compute packs the
    compressed units in bfloat16 (half the pack/encode HBM traffic).  The
    passes=1 encode bf16-rounds its input anyway, so the compressed-unit
    aggregation must be BIT-IDENTICAL to feeding pre-bf16-rounded f32
    gradients through f32 units; passthrough (identity) units must stay f32
    (their roundtrip feeds the optimizer directly)."""
    import dataclasses

    cfg = GQConfig(quantizer="hsq", c_dim=16, k_bit=6, n_bit=6, num_users=U,
                   dataset="synthetic", hsq_passes=1,
                   compute_dtype="bfloat16", random=False)
    params = {"w1": jnp.zeros((64, 64)), "w2": jnp.zeros((128, 32)),
              "b": jnp.zeros((64,))}
    plan_bf = plan_units(params, cfg)
    plan_32 = plan_units(params, dataclasses.replace(cfg, unit_dtype="float32"))
    assert any(d is not None for d in plan_bf.unit_dtypes)
    assert all(d is None for d in plan_32.unit_dtypes)
    # EF forces f32 units under 'auto' (error residuals need fp32)
    plan_ef = plan_units(params, dataclasses.replace(cfg, ef=True))
    assert all(d is None for d in plan_ef.unit_dtypes)

    grads = make_grads(rng, {k: v.shape for k, v in params.items()})
    rounded = jax.tree.map(
        lambda g: g.astype(jnp.bfloat16).astype(jnp.float32), grads)
    st = init_state(plan_bf, U, ef=False, two_phase=False)
    key = jax.random.PRNGKey(3)
    agg_bf, _ = ps_aggregate(plan_bf, grads, st, jnp.float32(1.0), key)
    agg_32, _ = ps_aggregate(plan_32, rounded, st, jnp.float32(1.0), key)
    for k in ("w1", "w2"):  # compressed leaves: bit-identical
        np.testing.assert_array_equal(np.asarray(agg_bf[k]),
                                      np.asarray(agg_32[k]))
    # passthrough leaf: bf16 plan must have used the RAW f32 values
    np.testing.assert_array_equal(np.asarray(agg_bf["b"]),
                                  np.asarray(jnp.mean(grads["b"], axis=0)))
