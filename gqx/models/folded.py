"""Folded-users fast path: shared-weight layers with per-user kernel grads.

Motivation (PERF.md): the reference semantics need ONE gradient per user
(each user compresses its own micro-batch gradient, reference
main.py:221-230), which gqx computes with ``jax.vmap`` over a users axis.
XLA runs the vmapped backward ~2x slower than the same math on the folded
(U*B) batch: the per-user weight-grad convolutions lower to
batch_group_count convs whose layouts break fusion of the surrounding
elementwise backward (measured 15.3 ms vs 2.9 ms of loop fusions,
29.6 ms vs 21.6 ms of conv fusions; resnet50, 8x32).

The fix: run forward and the data-gradient backward on the FOLDED batch —
identical math, since all users share the parameters — and compute ONLY the
per-user weight gradients user-separated.  ``shared_conv`` / ``shared_dense``
take the normal shared kernel plus a zeros "ghost" operand with a leading
users axis; their custom VJP returns the per-user weight gradient as the
ghost's cotangent (the shared kernel's cotangent is the usual folded total).
``jax.grad`` w.r.t. the ghost pytree therefore yields exactly the gradients
the vmapped path produces, while everything else in the backward stays
folded.  Per-user BatchNorm statistics (reference parity: each user
normalizes with its own micro-batch stats) are preserved by
``GroupedBatchNorm``: stats are computed per user-group with folded
elementwise normalization.

Leaves that never reach a shared_* layer (BN scales/biases, small biases)
are below the <=1000-element passthrough threshold; their per-user
gradients are only ever summed/averaged by the aggregators, so the folded
total divided/broadcast appropriately is mathematically identical (the
identity compressor is linear and its EF error is exactly zero).
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp

# Per-user weight-grad (dW) implementation for shared_conv's backward:
#   'bgc'    — vmapped per-user conv vjp (XLA lowers to
#              batch_group_count=U grouped convolutions).  Full-step A/B
#              with retuned tiles: bgc 51.6 ms vs hybrid 52.0 (PERF.md r4).
#   'hybrid' — einsum for 1x1 stride-1 convs, bgc otherwise.  Probe-driven
#              (scripts/probe_dw2.py, v5e): isolated wide-channel 1x1 bgc
#              outliers (512x2048@4x4: 5.9 ms bgc vs 1.5 ms einsum) — but
#              the advantage vanishes inside the fused whole-model backward.
#   'einsum' — kh*kw shifted-slice batched einsums everywhere.  Loses
#              globally (44.8 vs 38.9 ms whole-model, probe_dw.py) and
#              CRASHES XLA's fusion pass on small-spatial 3x3 geometries
#              (TransformWindow SIGABRT) — debugging/probe use only.
#   'pallas' — Pallas per-user dW kernel (gqx/ops/pallas_dw.py) for
#              stride-1 KxK convs with K > 1 (shifted in-VMEM slices + MXU
#              contractions, the bgc outlier class), einsum for 1x1
#              stride-1, bgc for strided convs.  TPU only.
# Trace-time switch (module attribute; env GQX_DW_IMPL sets the default).
DW_IMPL = os.environ.get("GQX_DW_IMPL", "bgc")


def _conv(x, kernel, strides, padding):
    return jax.lax.conv_general_dilated(
        x, kernel, window_strides=strides, padding=padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _per_user_dw_einsum(x, dy, k, users: int, strides, padding):
    """Per-user conv weight gradient as kh*kw shifted-slice batched matmuls.

    dW_u[kh,kw,ci,co] = sum_{b,oh,ow} xpad[u,b, oh*sh+kh, ow*sw+kw, ci]
                                      * dy[u,b,oh,ow,co]
    — mathematically the conv-vjp weight gradient restricted to user u's
    micro-batch, expressed as jnp.einsum contractions over (b,oh,ow) so XLA
    emits batched matmuls instead of batch_group_count grouped convolutions.
    """
    kh, kw, cin, cout = k.shape
    sh, sw = strides
    oh, ow = dy.shape[1], dy.shape[2]
    pads = jax.lax.padtype_to_pads(
        x.shape[1:3], (kh, kw), (sh, sw), padding
    ) if isinstance(padding, str) else list(padding)
    xpad = jnp.pad(x, ((0, 0), pads[0], pads[1], (0, 0)))
    xu = xpad.reshape((users, -1) + xpad.shape[1:])
    dyu = dy.reshape((users, -1) + dy.shape[1:])
    terms = []
    for i in range(kh):
        for j in range(kw):
            xs = jax.lax.slice(
                xu,
                (0, 0, i, j, 0),
                (users, xu.shape[1], i + (oh - 1) * sh + 1,
                 j + (ow - 1) * sw + 1, cin),
                (1, 1, sh, sw, 1),
            )
            terms.append(jnp.einsum(
                "unhwi,unhwo->uio", xs, dyu,
                preferred_element_type=jnp.float32,
            ))
    dku = jnp.stack(terms).reshape(kh, kw, users, cin, cout)
    return dku.transpose(2, 0, 1, 3, 4).astype(k.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def shared_conv(x, kernel, ghost, users: int, strides, padding):
    """Folded conv with per-user weight grads.

    x (U*B, H, W, Cin); kernel (kh, kw, Cin, Cout) shared; ghost
    (U, kh, kw, Cin, Cout) zeros.  Output = conv(x, kernel + mean_u ghost_u)
    — equal to conv(x, kernel) for zero ghosts, and the ghost cotangent is
    the PER-USER weight gradient."""
    return _conv(x, kernel + jnp.mean(ghost, axis=0), strides, padding)


def _shared_conv_fwd(x, kernel, ghost, users, strides, padding):
    k = kernel + jnp.mean(ghost, axis=0)
    return _conv(x, k, strides, padding), (x, k)


def _resolved_pads(x, k, strides, padding):
    if isinstance(padding, str):
        return jax.lax.padtype_to_pads(
            x.shape[1:3], k.shape[:2], tuple(strides), padding)
    return list(padding)


def _per_user_dw_pallas(x, dy, k, users, strides, padding):
    from gqx.ops.pallas_dw import per_user_dw

    pads = _resolved_pads(x, k, strides, padding)
    return per_user_dw(
        x, dy, users, k.shape[0], k.shape[1], pads[0][0], pads[1][0]
    ).astype(k.dtype)


def _shared_conv_bwd(users, strides, padding, res, dy):
    x, k = res
    # data gradient on the folded batch (fast path: no batch groups)
    dx = jax.vjp(lambda xx: _conv(xx, k, strides, padding), x)[1](dy)[0]
    is_1x1_s1 = k.shape[0] == k.shape[1] == 1 and tuple(strides) == (1, 1)
    is_kxk_s1 = k.shape[0] * k.shape[1] > 1 and tuple(strides) == (1, 1)
    use_einsum = DW_IMPL == "einsum" or (
        DW_IMPL in ("hybrid", "pallas") and is_1x1_s1
    )
    if DW_IMPL == "sharedbroadcast":
        # MEASUREMENT-ONLY mode (semantically WRONG — every user gets the
        # folded total): isolates the intrinsic per-user-vs-shared dW cost
        # in the otherwise-identical backward context (scripts/probe_dw.py)
        dw = jax.vjp(lambda kk: _conv(x, kk, strides, padding), k)[1](dy)[0]
        dku = jnp.broadcast_to(dw[None], (users,) + dw.shape)
    elif DW_IMPL == "pallas" and is_kxk_s1 and dy.shape[1:3] == x.shape[1:3]:
        dku = _per_user_dw_pallas(x, dy, k, users, strides, padding)
    elif use_einsum:
        dku = _per_user_dw_einsum(x, dy, k, users, strides, padding)
    else:
        # per-user weight gradient: one vjp per user slice (batch_group conv)
        xu = x.reshape((users, -1) + x.shape[1:])
        dyu = dy.reshape((users, -1) + dy.shape[1:])
        dku = jax.vmap(
            lambda a, b: jax.vjp(lambda kk: _conv(a, kk, strides, padding), k)[1](b)[0]
        )(xu, dyu)
    # shared-kernel cotangent = folded total (sum over users); ghost gets the
    # per-user grads scaled by d(mean)/d(ghost_u) inverse — the ghost enters
    # through mean_u, so its true cotangent is dku_total/U per user; we
    # instead return dku directly and give the kernel zeros, which makes
    # grad-wrt-ghost THE per-user gradient (callers differentiate w.r.t. the
    # ghost only; the kernel is a closure constant there).
    return dx, jnp.zeros_like(k), dku


shared_conv.defvjp(_shared_conv_fwd, _shared_conv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def shared_dense(x, kernel, ghost, users: int):
    """Folded matmul with per-user weight grads; x (U*B, Cin),
    kernel (Cin, Cout), ghost (U, Cin, Cout) zeros."""
    return x @ (kernel + jnp.mean(ghost, axis=0))


def _shared_dense_fwd(x, kernel, ghost, users):
    k = kernel + jnp.mean(ghost, axis=0)
    return x @ k, (x, k)


def _shared_dense_bwd(users, res, dy):
    x, k = res
    dx = dy @ k.T
    xu = x.reshape(users, -1, x.shape[-1])
    dyu = dy.reshape(users, -1, dy.shape[-1])
    dku = jnp.einsum("ubi,ubo->uio", xu, dyu)
    return dx, jnp.zeros_like(k), dku


shared_dense.defvjp(_shared_dense_fwd, _shared_dense_bwd)


def grouped_batch_stats(x, users: int) -> Tuple[jax.Array, jax.Array]:
    """Per-user mean/var over each user's micro-batch (reference parity:
    each simulated worker normalizes with its own batch stats).  x
    (U*B, H, W, C) -> (mean (U, C), var (U, C))."""
    xg = x.reshape((users, -1, x.shape[-1]))
    mean = jnp.mean(xg, axis=1)
    # flax _compute_stats "fast variance": Var = E[x^2] - E[x]^2, negatives
    # clipped — matched exactly so the folded path reproduces nn.BatchNorm
    # bit-for-bit-ish (the vmapped reference path uses flax BN)
    var = jnp.maximum(
        0.0, jnp.mean(jnp.square(xg), axis=1) - jnp.square(mean)
    )
    return mean, var


def grouped_batch_norm(x, users: int, scale, bias, eps: float = 1e-5):
    """Folded-elementwise BN with per-user statistics.  Returns
    (normalized x, (mean, var)) — stats are (U, C) for running-average
    updates.

    The backward runs through a custom VJP (``_gbn``) with the
    re-associated two-pass BN gradient: one fused reduction pass over
    (x, dy) producing the per-(user, channel) sums s1 = Σdy and
    s2 = Σdy·x̂ (shared by dscale, dbias AND the dx formula), then one
    elementwise pass dx = scale·inv·(dy − s1/n − x̂·s2/n).  Plain
    autodiff of the forward emits separate reduction chains for
    dscale/dbias and the dmean/dvar paths that XLA does not CSE (the
    products differ by where ``inv`` is applied), costing extra full
    passes over the activation — the dominant "loop fusion" HBM traffic
    in the resnet50 step trace (PERF.md round 5).  Values agree with
    autodiff up to float re-association (same analytic derivative).
    """
    shape = x.shape
    c = shape[-1]
    bshape = (users,) + (1,) * (len(shape) - 1) + (c,)
    scale_u = jnp.broadcast_to(
        jnp.asarray(scale, jnp.float32), bshape).reshape(users, c)
    bias_u = jnp.broadcast_to(
        jnp.asarray(bias, jnp.float32), bshape).reshape(users, c)
    return _gbn(x, scale_u, bias_u, users, eps)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _gbn(x, scale, bias, users: int, eps: float):
    """Core grouped BN on the folded batch; scale/bias are (U, C) f32.

    Forward math is kept op-for-op identical to the pre-custom-VJP
    version (normalize, then affine) so logits are bit-stable across the
    change; only the backward is re-associated."""
    return _gbn_fwd(x, scale, bias, users, eps)[0]


def _gbn_fwd(x, scale, bias, users: int, eps: float):
    shape = x.shape
    mean, var = grouped_batch_stats(x.astype(jnp.float32), users)
    xg = x.reshape((users, -1) + shape[1:]).astype(jnp.float32)
    inv = jax.lax.rsqrt(var + eps)
    bshape = (users,) + (1,) * (len(shape) - 1) + (shape[-1],)
    y = (xg - mean.reshape(bshape)) * inv.reshape(bshape)
    y = y * scale.reshape(bshape) + bias.reshape(bshape)
    out = (y.reshape(shape).astype(x.dtype), (mean, var))
    return out, (x, mean, var, inv, scale)


def _gbn_bwd(users: int, eps: float, res, ct):
    x, mean, var, inv, scale = res
    dy, (dmean_out, dvar_out) = ct
    shape = x.shape
    c = shape[-1]
    bshape = (users,) + (1,) * (len(shape) - 1) + (c,)
    red_axes = tuple(range(1, len(shape)))  # all but the users axis → (U, C)
    n = 1
    for s in shape[:-1]:
        n *= s
    n = jnp.float32(n // users)

    xg = x.reshape((users, -1) + shape[1:]).astype(jnp.float32)
    dyg = dy.reshape((users, -1) + shape[1:]).astype(jnp.float32)
    xhat = (xg - mean.reshape(bshape)) * inv.reshape(bshape)
    # pass 1: one fused multi-output reduction over (x, dy)
    s1 = jnp.sum(dyg, axis=red_axes)          # (U, C) == dbias
    s2 = jnp.sum(dyg * xhat, axis=red_axes)   # (U, C) == dscale
    # the var path is clipped to zero where the fast-variance estimate was
    # clipped (grouped_batch_stats' maximum(0, ·)); x̂≈0 there anyway
    mask = (var > 0).astype(jnp.float32)
    # pass 2: elementwise dx (+ the stats-output cotangents, which are
    # all-zero in training use and algebraically simplified away by XLA):
    #   dx = scale·inv·dy − (s1·scale·inv − dmean)/n
    #        + (x − m)·(2·dvar − s2·scale·inv²)·mask/n
    g1 = scale * inv                                      # (U, C)
    g2 = (s1 * g1 - dmean_out) / n
    g5 = mask * (2.0 * dvar_out - s2 * g1 * inv) / n      # (x−m) coefficient
    dx = g1.reshape(bshape) * dyg - g2.reshape(bshape) \
        + (xg - mean.reshape(bshape)) * g5.reshape(bshape)
    dx = dx.reshape(shape).astype(x.dtype)
    return dx, s2, s1


_gbn.defvjp(_gbn_fwd, _gbn_bwd)
