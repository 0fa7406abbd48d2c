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

import jax.numpy as jnp
from flax import linen as nn
from jax import random

Dtype = Any


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
        return nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5,
            dtype=self.dtype,
        )(x)


def avg_pool(x, window: int, stride: int | None = None):
    stride = stride or window
    return nn.avg_pool(x, (window, window), strides=(stride, stride))


def max_pool(x, window: int, stride: int | None = None):
    stride = stride or window
    return nn.max_pool(x, (window, window), strides=(stride, stride))
