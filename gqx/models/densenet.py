"""DenseNet-BC for CIFAR (shape spec: reference models/densenet.py:9-99:
bottleneck 1x1 to 4*growth then 3x3 to growth, channel concat; transitions
BN + 1x1 conv + 2x2 avg-pool with 0.5 reduction; final BN + ReLU + 4x4
avg-pool + linear).  ``densenet_cifar`` = growth 12, blocks (6,12,24,16)."""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp
from flax import linen as nn

from gqx.models.common import BatchNorm, TorchConv, TorchDense, avg_pool


class DenseBottleneck(nn.Module):
    growth_rate: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        out = jnp.maximum(BatchNorm()(x, train), 0.0)
        out = TorchConv(4 * self.growth_rate, (1, 1))(out)
        out = jnp.maximum(BatchNorm()(out, train), 0.0)
        out = TorchConv(self.growth_rate, (3, 3))(out)
        # channel concat (reference densenet.py:19: cat([out, x]))
        return jnp.concatenate([out, x], axis=-1)


class Transition(nn.Module):
    out_planes: int

    @nn.compact
    def __call__(self, x, train: bool = True):
        x = jnp.maximum(BatchNorm()(x, train), 0.0)
        x = TorchConv(self.out_planes, (1, 1))(x)
        return avg_pool(x, 2)


class DenseNet(nn.Module):
    nblocks: Sequence[int]
    growth_rate: int = 12
    reduction: float = 0.5
    num_classes: int = 10

    @nn.compact
    def __call__(self, x, train: bool = True):
        num_planes = 2 * self.growth_rate
        x = TorchConv(num_planes, (3, 3))(x)
        for stage, nblock in enumerate(self.nblocks):
            for _ in range(nblock):
                x = DenseBottleneck(self.growth_rate)(x, train)
            num_planes += nblock * self.growth_rate
            if stage != len(self.nblocks) - 1:
                out_planes = int(math.floor(num_planes * self.reduction))
                x = Transition(out_planes)(x, train)
                num_planes = out_planes
        x = jnp.maximum(BatchNorm()(x, train), 0.0)
        x = avg_pool(x, 4)
        x = x.reshape(x.shape[0], -1)
        return TorchDense(self.num_classes)(x)


def densenet_cifar(num_classes=10):
    return DenseNet((6, 12, 24, 16), growth_rate=12, num_classes=num_classes)


def DenseNet121(num_classes=10):
    return DenseNet((6, 12, 24, 16), growth_rate=32, num_classes=num_classes)


def DenseNet169(num_classes=10):
    return DenseNet((6, 12, 32, 32), growth_rate=32, num_classes=num_classes)


def DenseNet201(num_classes=10):
    return DenseNet((6, 12, 48, 32), growth_rate=32, num_classes=num_classes)


def DenseNet161(num_classes=10):
    return DenseNet((6, 12, 36, 24), growth_rate=48, num_classes=num_classes)
