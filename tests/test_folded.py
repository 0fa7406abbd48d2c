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
