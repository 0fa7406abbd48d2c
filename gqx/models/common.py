"""Shared model utilities.

Initializers reproduce torch's defaults (kaiming-uniform with a=sqrt(5) for
conv/linear weights, fan-in uniform for biases) so parameter *distributions*
match the reference models at init; layer shapes are matched exactly (see the
per-model docstrings).  Data layout is NHWC (TPU-native), vs the reference's
NCHW — parameter element counts are identical, which is what the <=1000
passthrough rule keys on.

``dtype`` is the computation dtype (bfloat16 rides the MXU at full rate);
parameters are always stored float32 (flax casts at apply time), so gradients
and the compression pipeline stay float32.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax import random

Dtype = Any

# Reserved module-name suffix marking an nn.scan over repeated blocks whose
# parameters carry a stacked leading axis.  gqx.parallel.packing keys the
# per-slice <=1000-element passthrough decision on a path COMPONENT ending
# with this marker (an exact naming contract, not a substring match over the
# whole path — a user module merely containing "_scan" cannot trigger it).
SCAN_AXIS_MARKER = "__scanblocks"


def torch_kernel_init():
    # kaiming_uniform(a=sqrt(5)) == U(-sqrt(1/fan_in), sqrt(1/fan_in))
    # == variance_scaling(1/3, fan_in, uniform).
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


def torch_bias_init(fan_in: int):
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return random.uniform(key, shape, dtype, minval=-bound, maxval=bound)

    return init


class TorchDense(nn.Module):
    """nn.Linear with torch default init."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        users = active_folded_users()
        if users is not None:
            return _FoldedDenseInner(
                features=self.features, use_bias=self.use_bias,
                dtype=self.dtype, kernel_init=torch_kernel_init(),
                bias_init=torch_bias_init(fan_in), users=users,
                name="Dense_0",
            )(x)
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_kernel_init(),
            bias_init=torch_bias_init(fan_in),
        )(x)


class TorchConv(nn.Module):
    """nn.Conv2d with torch default init (NHWC)."""

    features: int
    kernel_size: tuple
    strides: tuple = (1, 1)
    padding: str | tuple = "SAME"
    use_bias: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1] * self.kernel_size[0] * self.kernel_size[1]
        users = active_folded_users()
        if users is not None:
            return _FoldedConvInner(
                features=self.features, kernel_size=self.kernel_size,
                strides=self.strides, padding=self.padding,
                use_bias=self.use_bias, dtype=self.dtype,
                kernel_init=torch_kernel_init(),
                bias_init=torch_bias_init(fan_in),
                users=users, name="Conv_0",
            )(x)
        return nn.Conv(
            self.features,
            self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=torch_kernel_init(),
            bias_init=torch_bias_init(fan_in),
        )(x)


class BatchNorm(nn.Module):
    """BatchNorm2d parity: torch momentum 0.1 == flax momentum 0.9, eps 1e-5.
    Statistics are always accumulated in float32."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool):
        users = active_folded_users()
        if users is not None:
            return _FoldedBatchNormInner(
                users=users, momentum=0.9, epsilon=1e-5, dtype=self.dtype,
                name="BatchNorm_0",
            )(x, use_running_average=not train)
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)


@jax.custom_vjp
def relu(x):
    """ReLU whose backward recomputes the mask from the OUTPUT.

    ``jnp.maximum(x, 0.0)`` makes autodiff save the pre-activation x for
    the backward mask, so every BN+ReLU site stores TWO full activation
    tensors (the r5 resnet50 trace shows dual-output bf16 forward fusions
    at exactly these sites).  The output y is already saved as the next
    conv's backward input, and ``y > 0  <=>  x > 0`` wherever the gradient
    is nonzero, so masking on y lets XLA drop the extra tensor — one
    fewer full-activation store+load per ReLU (~2 ms/step on the
    resnet50 bench config).  Values differ from jnp.maximum only in the
    measure-zero subgradient at exactly x == 0."""
    return jnp.maximum(x, 0.0)


def _relu_fwd(x):
    y = jnp.maximum(x, 0.0)
    return y, y


def _relu_bwd(y, dy):
    return ((dy * (y > 0).astype(dy.dtype)).astype(dy.dtype),)


relu.defvjp(_relu_fwd, _relu_bwd)


def avg_pool(x, window: int, stride: int | None = None):
    stride = stride or window
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


def max_pool(x, window: int, stride: int | None = None):
    stride = stride or window
    return nn.max_pool(x, (window, window), strides=(stride, stride))


# ---------------------------------------------------------------------------
# Folded-users fast path (PERF.md): when ``folded_users(U)`` is active, the
# wrappers below run on the folded (U*B) batch with per-user weight grads
# routed through a "ghosts" variable collection (gqx.models.folded) and
# per-user BatchNorm statistics.  Param/batch_stats paths are IDENTICAL to
# the vmapped path (child modules are named like flax's auto-named ones), so
# plans/checkpoints are interchangeable.  Inactive context = exact previous
# behavior.
# ---------------------------------------------------------------------------

from contextlib import contextmanager           # noqa: E402
from contextvars import ContextVar              # noqa: E402

_FOLDED_USERS: ContextVar = ContextVar("gqx_folded_users", default=None)


@contextmanager
def folded_users(users: int):
    """Trace-time switch: inside this context the Torch* wrappers and
    BatchNorm use the folded-users implementations."""
    token = _FOLDED_USERS.set(int(users))
    try:
        yield
    finally:
        _FOLDED_USERS.reset(token)


def active_folded_users():
    return _FOLDED_USERS.get()


class _FoldedConvInner(nn.Module):
    """Declares params exactly like nn.Conv (path <parent>/Conv_0/kernel)
    but applies the shared-weight custom-VJP conv with a per-user ghost."""

    features: int
    kernel_size: tuple
    strides: tuple
    padding: str | tuple
    use_bias: bool
    dtype: Any
    kernel_init: Any
    bias_init: Any
    users: int

    @nn.compact
    def __call__(self, x):
        from gqx.models.folded import shared_conv

        kshape = self.kernel_size + (x.shape[-1], self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        ghost = self.variable(
            "ghosts", "kernel",
            lambda: jnp.zeros((self.users,) + kshape, jnp.float32),
        ).value
        pad = self.padding
        if isinstance(pad, str):
            padding = pad
        else:
            padding = tuple((p, p) if isinstance(p, int) else p for p in pad)
        y = shared_conv(
            x.astype(self.dtype), kernel.astype(self.dtype),
            ghost.astype(self.dtype), self.users, self.strides, padding,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class _FoldedDenseInner(nn.Module):
    """Declares params exactly like nn.Dense (path <parent>/Dense_0/kernel)."""

    features: int
    use_bias: bool
    dtype: Any
    kernel_init: Any
    bias_init: Any
    users: int

    @nn.compact
    def __call__(self, x):
        from gqx.models.folded import shared_dense

        kshape = (x.shape[-1], self.features)
        kernel = self.param("kernel", self.kernel_init, kshape)
        ghost = self.variable(
            "ghosts", "kernel",
            lambda: jnp.zeros((self.users,) + kshape, jnp.float32),
        ).value
        y = shared_dense(
            x.astype(self.dtype), kernel.astype(self.dtype),
            ghost.astype(self.dtype), self.users,
        )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(self.dtype)
        return y


class _FoldedBatchNormInner(nn.Module):
    """nn.BatchNorm-compatible params/stats with PER-USER batch statistics
    on the folded batch (reference parity: each simulated worker normalizes
    with its own micro-batch stats; running stats updated with the mean of
    the per-user stats — equal to averaging per-user flax BN updates)."""

    users: int
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: bool):
        from gqx.models.folded import grouped_batch_norm

        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # per-user ghosts (zeros): grad w.r.t. them IS the per-user
        # scale/bias gradient — needed because wide BN layers (>1000
        # channels in ResNet-50+) are compressed per user, not passthrough.
        # Unlike the conv/dense ghosts this is plain autodiff (the per-user
        # application below is the true function of ghost_u).
        g_scale = self.variable(
            "ghosts", "scale", lambda: jnp.zeros((self.users, c), jnp.float32)
        ).value
        g_bias = self.variable(
            "ghosts", "bias", lambda: jnp.zeros((self.users, c), jnp.float32)
        ).value
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((c,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((c,), jnp.float32))
        if use_running_average:
            inv = jax.lax.rsqrt(ra_var.value + self.epsilon)
            y = (x.astype(jnp.float32) - ra_mean.value) * inv * scale + bias
            return y.astype(x.dtype)
        bshape = (self.users,) + (1,) * (x.ndim - 1) + (c,)
        y, (mean_u, var_u) = grouped_batch_norm(
            x, self.users,
            scale + g_scale.reshape(bshape),
            bias + g_bias.reshape(bshape),
            self.epsilon,
        )
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1 - m) * jnp.mean(mean_u, 0)
            ra_var.value = m * ra_var.value + (1 - m) * jnp.mean(var_u, 0)
        return y
