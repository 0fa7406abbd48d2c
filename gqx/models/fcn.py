"""FCN: 784 -> 256 -> num_classes MLP, ReLU between — the MNIST workhorse
(shape spec: reference models/fcn.py:5-24; ReLU via clamp(min=0) there)."""

from __future__ import annotations

import typing

import jax.numpy as jnp
from flax import linen as nn

from gqx.models.common import TorchDense, relu


class FCN(nn.Module):
    num_classes: int = 10
    hidden: int = 256
    d_in: int = 784
    dtype: typing.Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        x = x.reshape(x.shape[0], -1).astype(self.dtype)
        h = relu(TorchDense(self.hidden, dtype=self.dtype)(x))
        return TorchDense(self.num_classes, dtype=self.dtype)(h).astype(jnp.float32)
