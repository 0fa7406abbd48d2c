"""DenseNet-BC for CIFAR (shape spec: reference models/densenet.py:9-99:
bottleneck 1x1 to 4*growth then 3x3 to growth, channel concat; transitions
BN + 1x1 conv + 2x2 avg-pool with 0.5 reduction; final BN + ReLU + 4x4
avg-pool + linear).  ``densenet_cifar`` = growth 12, blocks (6,12,24,16)."""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax.numpy as jnp
from flax import linen as nn

from gqx.models.common import BatchNorm, TorchConv, TorchDense, avg_pool, relu


class DenseBottleneck(nn.Module):
    growth_rate: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        out = relu(BatchNorm(d)(x, train))
        out = TorchConv(4 * self.growth_rate, (1, 1), dtype=d)(out)
        out = relu(BatchNorm(d)(out, train))
        out = TorchConv(self.growth_rate, (3, 3), dtype=d)(out)
        # channel concat (reference densenet.py:19: cat([out, x]))
        return jnp.concatenate([out, x], axis=-1)


class Transition(nn.Module):
    out_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        x = relu(BatchNorm(d)(x, train))
        x = TorchConv(self.out_planes, (1, 1), dtype=d)(x)
        return avg_pool(x, 2)


class DenseNet(nn.Module):
    nblocks: Sequence[int]
    growth_rate: int = 12
    reduction: float = 0.5
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        x = x.astype(d)
        num_planes = 2 * self.growth_rate
        x = TorchConv(num_planes, (3, 3), dtype=d)(x)
        for stage, nblock in enumerate(self.nblocks):
            for _ in range(nblock):
                x = DenseBottleneck(self.growth_rate, dtype=d)(x, train)
            num_planes += nblock * self.growth_rate
            if stage != len(self.nblocks) - 1:
                out_planes = int(math.floor(num_planes * self.reduction))
                x = Transition(out_planes, dtype=d)(x, train)
                num_planes = out_planes
        x = relu(BatchNorm(d)(x, train))
        x = avg_pool(x, 4)
        x = x.reshape(x.shape[0], -1)
        return TorchDense(self.num_classes, dtype=d)(x).astype(jnp.float32)


def densenet_cifar(num_classes=10, dtype=jnp.float32):
    return DenseNet((6, 12, 24, 16), growth_rate=12, num_classes=num_classes, dtype=dtype)


def DenseNet121(num_classes=10, dtype=jnp.float32):
    return DenseNet((6, 12, 24, 16), growth_rate=32, num_classes=num_classes, dtype=dtype)


def DenseNet169(num_classes=10, dtype=jnp.float32):
    return DenseNet((6, 12, 32, 32), growth_rate=32, num_classes=num_classes, dtype=dtype)


def DenseNet201(num_classes=10, dtype=jnp.float32):
    return DenseNet((6, 12, 48, 32), growth_rate=32, num_classes=num_classes, dtype=dtype)


def DenseNet161(num_classes=10, dtype=jnp.float32):
    return DenseNet((6, 12, 36, 24), growth_rate=48, num_classes=num_classes, dtype=dtype)
