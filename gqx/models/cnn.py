"""LeNet-style MNIST CNN (shape spec: reference models/cnn.py:6-22 —
conv 20@5x5 valid, pool2, conv 50@5x5 valid, pool2, fc 500, fc 10,
log-softmax output)."""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from gqx.models.common import TorchConv, TorchDense, max_pool, relu


class CNN(nn.Module):
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        del train
        x = TorchConv(20, (5, 5), padding="VALID", use_bias=True)(x)
        x = relu(x)
        x = max_pool(x, 2)
        x = TorchConv(50, (5, 5), padding="VALID", use_bias=True)(x)
        x = relu(x)
        x = max_pool(x, 2)
        x = x.reshape(x.shape[0], -1)
        x = relu(TorchDense(500)(x))
        x = TorchDense(self.num_classes)(x)
        return nn.log_softmax(x)
