"""Numerics of the folded-users fast-path building blocks (gqx/models/folded.py):
ghost-routed per-user weight grads == vmapped per-user grads; grouped BN ==
per-user BN."""

import jax
import jax.numpy as jnp
import numpy as np

from gqx.models.folded import (
    grouped_batch_norm,
    shared_conv,
    shared_dense,
)

U, B = 4, 3


def test_shared_conv_ghost_grads_match_vmap(rng):
    x = jnp.asarray(rng.standard_normal((U * B, 8, 8, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    dy_seed = jnp.asarray(rng.standard_normal((U * B, 8, 8, 7)), jnp.float32)

    def loss_fold(ghost):
        y = shared_conv(x, k, ghost, U, (1, 1), "SAME")
        return jnp.sum(y * dy_seed)

    ghost = jnp.zeros((U,) + k.shape, jnp.float32)
    got = jax.grad(loss_fold)(ghost)

    def conv(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    def per_user(xu, du):
        return jax.grad(lambda kk: jnp.sum(conv(xu, kk) * du))(k)

    want = jax.vmap(per_user)(
        x.reshape(U, B, 8, 8, 5), dy_seed.reshape(U, B, 8, 8, 7))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    # primal value unchanged by the ghost
    y0 = shared_conv(x, k, ghost, U, (1, 1), "SAME")
    np.testing.assert_allclose(np.asarray(y0), np.asarray(conv(x, k)),
                               rtol=1e-6)


def test_einsum_dw_matches_bgc(rng):
    """The 'einsum' per-user dW implementation (shifted-slice batched
    matmuls) must equal the vmapped conv-vjp path on every conv geometry the
    models use (1x1/3x3, stride 1/2, SAME/VALID/explicit)."""
    from gqx.models import folded

    for (h, cin, cout, kk, s, pad) in [
        (8, 3, 16, 3, (1, 1), "SAME"),
        (8, 16, 32, 3, (2, 2), "SAME"),
        (8, 16, 32, 1, (1, 1), "SAME"),
        (9, 8, 8, 1, (2, 2), "SAME"),
        (8, 8, 8, 3, (1, 1), "VALID"),
        (8, 8, 8, 3, (2, 2), ((1, 1), (1, 1))),
    ]:
        x = jnp.asarray(rng.standard_normal((U * B, h, h, cin)), jnp.float32)
        k = jnp.asarray(rng.standard_normal((kk, kk, cin, cout)), jnp.float32)
        dy = jnp.asarray(
            rng.standard_normal(folded._conv(x, k, s, pad).shape), jnp.float32)
        xu = x.reshape((U, -1) + x.shape[1:])
        dyu = dy.reshape((U, -1) + dy.shape[1:])
        want = jax.vmap(
            lambda a, b: jax.vjp(
                lambda w: folded._conv(a, w, s, pad), k)[1](b)[0]
        )(xu, dyu)
        got = folded._per_user_dw_einsum(x, dy, k, U, s, pad)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-4, atol=1e-5)


def test_shared_conv_einsum_dw_end_to_end(rng, monkeypatch):
    """shared_conv's ghost grads with DW_IMPL='einsum' == vmapped per-user."""
    from gqx.models import folded

    monkeypatch.setattr(folded, "DW_IMPL", "einsum")
    x = jnp.asarray(rng.standard_normal((U * B, 8, 8, 5)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((3, 3, 5, 7)), jnp.float32)
    dy_seed = jnp.asarray(rng.standard_normal((U * B, 4, 4, 7)), jnp.float32)

    ghost = jnp.zeros((U,) + k.shape, jnp.float32)
    got = jax.grad(
        lambda g: jnp.sum(shared_conv(x, k, g, U, (2, 2), "SAME") * dy_seed)
    )(ghost)

    def conv(xx, kk):
        return jax.lax.conv_general_dilated(
            xx, kk, (2, 2), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))

    want = jax.vmap(
        lambda xu, du: jax.grad(lambda w: jnp.sum(conv(xu, w) * du))(k)
    )(x.reshape(U, B, 8, 8, 5), dy_seed.reshape(U, B, 4, 4, 7))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_shared_dense_ghost_grads_match_vmap(rng):
    x = jnp.asarray(rng.standard_normal((U * B, 6)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((6, 4)), jnp.float32)
    dy_seed = jnp.asarray(rng.standard_normal((U * B, 4)), jnp.float32)

    ghost = jnp.zeros((U,) + k.shape, jnp.float32)
    got = jax.grad(
        lambda g: jnp.sum(shared_dense(x, k, g, U) * dy_seed))(ghost)
    want = jnp.einsum("ubi,ubo->uio", x.reshape(U, B, 6),
                      dy_seed.reshape(U, B, 4))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5,
                               atol=1e-5)


def test_grouped_batch_norm_matches_per_user(rng):
    x = jnp.asarray(rng.standard_normal((U * B, 4, 4, 6)), jnp.float32)
    scale = jnp.asarray(rng.standard_normal((6,)), jnp.float32)
    bias = jnp.asarray(rng.standard_normal((6,)), jnp.float32)
    y, (mean, var) = grouped_batch_norm(x, U, scale, bias)

    xg = np.asarray(x).reshape(U, B, 4, 4, 6)
    for u in range(U):
        m = xg[u].reshape(-1, 6).mean(0)
        v = xg[u].reshape(-1, 6).var(0)
        want = (xg[u] - m) / np.sqrt(v + 1e-5) * np.asarray(scale) + np.asarray(bias)
        np.testing.assert_allclose(
            np.asarray(y).reshape(U, B, 4, 4, 6)[u], want, rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(mean)[u], m, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(var)[u], v, rtol=1e-3, atol=1e-4)


def test_folded_resnet_grads_match_vmap(rng):
    """Full-model check: under folded_users, ghost grads == per-user vmap
    grads for every conv/dense kernel; logits and BN running stats match;
    param tree paths unchanged."""
    import optax

    from gqx.models import create_model
    from gqx.models.common import folded_users

    UU, BB = 2, 3
    model = create_model("resnet18", 10)
    x = jnp.asarray(rng.standard_normal((UU, BB, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(UU, BB)), jnp.int32)

    variables = model.init(jax.random.PRNGKey(0), x[0], train=True)
    params, bstats = variables["params"], variables["batch_stats"]

    with folded_users(UU):
        vf = model.init(jax.random.PRNGKey(0), x.reshape(UU * BB, 32, 32, 3),
                        train=True)
    # identical param tree (paths + shapes) and init values
    assert jax.tree.structure(vf["params"]) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(vf["params"]), jax.tree.leaves(params)):
        assert a.shape == b.shape
    ghosts = vf["ghosts"]

    def ce(logits, labels):
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))

    # vmapped reference: per-user grads + stats
    def user_loss(p, xu, yu):
        out = model.apply({"params": p, "batch_stats": bstats}, xu,
                          train=True, mutable=["batch_stats"])
        return ce(out[0], yu), (out[0], out[1]["batch_stats"])

    (losses, (logits_v, stats_v)), grads_v = jax.vmap(
        lambda xu, yu: jax.value_and_grad(user_loss, has_aux=True)(
            params, xu, yu))(x, y)

    # folded: one apply, grads via ghosts
    def loss_fold(gh):
        with folded_users(UU):
            out = model.apply(
                {"params": params, "batch_stats": bstats, "ghosts": gh},
                x.reshape(UU * BB, 32, 32, 3), train=True,
                mutable=["batch_stats"],
            )
        logits, mut = out
        lg = logits.reshape(UU, BB, -1)
        total = sum(ce(lg[u], y[u]) for u in range(UU))
        return total, (logits, mut["batch_stats"])

    grads_f, (logits_f, stats_f) = jax.grad(loss_fold, has_aux=True)(ghosts)

    np.testing.assert_allclose(
        np.asarray(logits_f.reshape(UU, BB, -1)), np.asarray(logits_v),
        rtol=2e-4, atol=2e-4)

    # ghost grads == vmapped kernel grads (ghost tree is the subset of param
    # paths that have a conv/dense kernel)
    gv_flat = dict(jax.tree_util.tree_flatten_with_path(grads_v)[0])
    checked = 0
    for path, g in jax.tree_util.tree_flatten_with_path(grads_f)[0]:
        want = gv_flat[path]
        # tolerance covers fp-formulation noise through 18 BN'd layers
        # (different-but-equivalent var/conv fold orders); the BN-free FCN
        # test below checks the mechanism at 1e-5
        np.testing.assert_allclose(np.asarray(g), np.asarray(want),
                                   rtol=3e-3, atol=3e-3)
        checked += 1
    assert checked >= 20  # resnet18: all conv kernels + the classifier

    # BN running stats: folded update == mean over users of vmapped updates
    for a, b in zip(jax.tree.leaves(stats_f),
                    jax.tree.leaves(jax.tree.map(lambda s: jnp.mean(s, 0),
                                                 stats_v))):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4)


def test_folded_fcn_grads_exact(rng):
    """BN-free model: folded ghost grads == vmapped grads to fp32 precision."""
    import optax

    from gqx.models import create_model
    from gqx.models.common import folded_users

    UU, BB = 3, 4
    model = create_model("fcn", 10)
    x = jnp.asarray(rng.standard_normal((UU, BB, 28, 28, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(UU, BB)), jnp.int32)
    params = model.init(jax.random.PRNGKey(0), x[0], train=True)["params"]
    with folded_users(UU):
        vf = model.init(jax.random.PRNGKey(0),
                        x.reshape(UU * BB, 28, 28, 1), train=True)
    ghosts = vf["ghosts"]

    def ce(logits, labels):
        return jnp.mean(optax.softmax_cross_entropy_with_integer_labels(
            logits, labels))

    def user_loss(p, xu, yu):
        return ce(model.apply({"params": p}, xu, train=True), yu)

    grads_v = jax.vmap(lambda xu, yu: jax.grad(user_loss)(params, xu, yu))(x, y)

    def loss_fold(gh):
        with folded_users(UU):
            logits = model.apply({"params": params, "ghosts": gh},
                                 x.reshape(UU * BB, 28, 28, 1), train=True)
        lg = logits.reshape(UU, BB, -1)
        return sum(ce(lg[u], y[u]) for u in range(UU))

    grads_f = jax.grad(loss_fold)(ghosts)
    gv_flat = dict(jax.tree_util.tree_flatten_with_path(grads_v)[0])
    for path, g in jax.tree_util.tree_flatten_with_path(grads_f)[0]:
        np.testing.assert_allclose(np.asarray(g), np.asarray(gv_flat[path]),
                                   rtol=1e-5, atol=1e-6)


def _run_steps(cfg, model, x, y, nsteps=3):
    from gqx.train import create_train_state, make_train_step

    state, plan, tx = create_train_state(cfg, model, x[0],
                                         jax.random.PRNGKey(0))
    step = make_train_step(cfg, model, plan, tx)
    sc, lr, wd = jnp.float32(1.0), jnp.float32(0.05), jnp.float32(5e-4)
    key = jax.random.PRNGKey(7)
    for i in range(nsteps):
        key, k = jax.random.split(key)
        state, loss = step(state, x, y, sc, lr, wd, k)
    return state, float(loss)


def test_folded_train_step_matches_vmap_fcn():
    """Deterministic QSGD on FCN: folded and vmap steps produce identical
    parameters (no BN, exact ghost grads)."""
    from gqx.config import GQConfig
    from gqx.models import create_model

    rng = np.random.default_rng(3)
    UU, BB = 4, 8
    x = jnp.asarray(rng.standard_normal((UU, BB, 28, 28, 1)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(UU, BB)), jnp.int32)
    model = create_model("fcn", 10)

    kw = dict(network="fcn", dataset="synthetic", quantizer="qsgd", c_dim=16,
              n_bit=4, random=False, num_users=UU, batch_size=BB, seed=1)
    s_v, l_v = _run_steps(GQConfig(**kw), model, x, y)
    cfg_f = GQConfig(**kw)
    cfg_f.folded_users = True
    s_f, l_f = _run_steps(cfg_f, model, x, y)
    assert abs(l_v - l_f) < 1e-5
    for a, b in zip(jax.tree.leaves(s_v.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-6)


def test_folded_train_step_matches_vmap_resnet():
    """ResNet-18 (BN) with identity compression: folded ~ vmap within BN
    fp-formulation noise.  (A discrete quantizer would amplify the ~1e-3
    formulation noise through code-selection flips — the quantizer-level
    equivalence is covered exactly by the FCN test and the grad-level
    resnet test.)"""
    from gqx.config import GQConfig
    from gqx.models import create_model

    rng = np.random.default_rng(4)
    UU, BB = 2, 4
    x = jnp.asarray(rng.standard_normal((UU, BB, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(rng.integers(0, 10, size=(UU, BB)), jnp.int32)
    model = create_model("resnet18", 10)

    kw = dict(network="resnet18", dataset="synthetic", quantizer="sgd",
              random=False, num_users=UU, batch_size=BB, seed=1)
    # single step: the two paths compute the same math through different
    # fp reduction/fusion orders; BN chaos compounds the ~1e-4 first-step
    # noise over multiple steps, so only one step is compared here (the
    # FCN test above is exact over 3 steps; digits convergence-neutrality
    # is the acceptance gate before folded becomes the default)
    s_v, l_v = _run_steps(GQConfig(**kw), model, x, y, nsteps=1)
    cfg_f = GQConfig(**kw)
    cfg_f.folded_users = True
    s_f, l_f = _run_steps(cfg_f, model, x, y, nsteps=1)
    assert abs(l_v - l_f) < 1e-4, (l_v, l_f)
    for a, b in zip(jax.tree.leaves(s_v.params), jax.tree.leaves(s_f.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-3,
                                   atol=5e-4)
    for a, b in zip(jax.tree.leaves(s_v.batch_stats),
                    jax.tree.leaves(s_f.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-5)
