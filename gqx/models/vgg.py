"""CIFAR VGG-11/13/16/19 with BatchNorm and a single 512->classes head
(shape spec: reference models/vgg.py:6-50: 3x3 SAME convs with bias + BN +
ReLU per config entry, 2x2 maxpool at 'M', trailing 1x1 avg-pool no-op,
one linear classifier)."""

from __future__ import annotations

from typing import Any, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from gqx.models.common import BatchNorm, TorchConv, TorchDense, max_pool, relu

CFG = {
    "VGG11": (64, "M", 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "VGG13": (64, 64, "M", 128, 128, "M", 256, 256, "M", 512, 512, "M", 512, 512, "M"),
    "VGG16": (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
              512, 512, 512, "M", 512, 512, 512, "M"),
    "VGG19": (64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
              512, 512, 512, 512, "M", 512, 512, 512, 512, "M"),
}


class VGG(nn.Module):
    cfg: Sequence[Union[int, str]]
    num_classes: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        x = x.astype(d)
        for entry in self.cfg:
            if entry == "M":
                x = max_pool(x, 2)
            else:
                x = TorchConv(int(entry), (3, 3), use_bias=True, dtype=d)(x)
                x = relu(BatchNorm(d)(x, train))
        x = x.reshape(x.shape[0], -1)
        return TorchDense(self.num_classes, dtype=d)(x).astype(jnp.float32)


def vgg11(num_classes=10, dtype=jnp.float32):
    return VGG(CFG["VGG11"], num_classes, dtype)


def vgg13(num_classes=10, dtype=jnp.float32):
    return VGG(CFG["VGG13"], num_classes, dtype)


def vgg16(num_classes=10, dtype=jnp.float32):
    return VGG(CFG["VGG16"], num_classes, dtype)


def vgg19(num_classes=10, dtype=jnp.float32):
    return VGG(CFG["VGG19"], num_classes, dtype)
