"""CIFAR-style ResNet-18/34/50/101/152.

Shape spec from the reference (reference models/resnet.py:11-115): 3x3 stem,
stride 1, NO maxpool (this is the CIFAR variant, not torchvision's ImageNet
ResNet — SURVEY.md §2.6 flags this as a fidelity requirement), channel plan
64/128/256/512 with strides 1/2/2/2, BasicBlock (expansion 1) for 18/34 and
Bottleneck (expansion 4) for 50/101/152, a 4x4 average pool before the fc.
All convs bias-free; shortcuts are 1x1 conv + BN when shape changes.
"""

from __future__ import annotations

from typing import Any, Sequence, Type

import jax.numpy as jnp
from flax import linen as nn

from gqx.models.common import (
    BatchNorm,
    SCAN_AXIS_MARKER,
    TorchConv,
    TorchDense,
    avg_pool,
    relu,
)


class BasicBlock(nn.Module):
    filters: int
    stride: int = 1
    expansion: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        out = TorchConv(self.filters, (3, 3), strides=(self.stride, self.stride), dtype=d)(x)
        out = BatchNorm(d)(out, train)
        out = relu(out)
        out = TorchConv(self.filters, (3, 3), dtype=d)(out)
        out = BatchNorm(d)(out, train)

        if self.stride != 1 or x.shape[-1] != self.filters:
            x = TorchConv(self.filters, (1, 1), strides=(self.stride, self.stride), dtype=d)(x)
            x = BatchNorm(d)(x, train)
        return relu(out + x)


class Bottleneck(nn.Module):
    filters: int
    stride: int = 1
    expansion: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        width = self.filters
        out_ch = self.filters * self.expansion
        out = TorchConv(width, (1, 1), dtype=d)(x)
        out = relu(BatchNorm(d)(out, train))
        out = TorchConv(width, (3, 3), strides=(self.stride, self.stride), dtype=d)(out)
        out = relu(BatchNorm(d)(out, train))
        out = TorchConv(out_ch, (1, 1), dtype=d)(out)
        out = BatchNorm(d)(out, train)

        if self.stride != 1 or x.shape[-1] != out_ch:
            x = TorchConv(out_ch, (1, 1), strides=(self.stride, self.stride), dtype=d)(x)
            x = BatchNorm(d)(x, train)
        return relu(out + x)


class _RepeatedBlocks(nn.Module):
    """Stride-1 tail blocks of a stage under nn.scan: one traced block body
    instead of n-1 — shrinks the compiled HLO of deep ResNets by ~the stage
    depth (XLA compile time on ResNet-50+ drops accordingly).  Parameters get
    a stacked leading axis; total parameter count is unchanged, and
    gqx.parallel.packing treats scanned leaves per-slice for the <=1000
    passthrough rule so compression decisions match the unscanned layout."""

    block: Type[nn.Module]
    filters: int
    train: bool
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, _):
        out = self.block(filters=self.filters, stride=1, dtype=self.dtype)(carry, self.train)
        return out, None


class ResNet(nn.Module):
    block: Type[nn.Module]
    stage_sizes: Sequence[int]
    num_classes: int = 10
    scan_blocks: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = True):
        d = self.dtype
        x = x.astype(d)
        x = TorchConv(64, (3, 3), dtype=d)(x)
        x = relu(BatchNorm(d)(x, train))
        for i, (filters, blocks) in enumerate(zip((64, 128, 256, 512), self.stage_sizes)):
            stride = 1 if i == 0 else 2
            x = self.block(filters=filters, stride=stride, dtype=d)(x, train)
            if blocks > 1:
                if self.scan_blocks:
                    scanned = nn.scan(
                        _RepeatedBlocks,
                        variable_axes={"params": 0, "batch_stats": 0},
                        split_rngs={"params": True},
                        length=blocks - 1,
                        metadata_params={nn.PARTITION_NAME: None},
                    )
                    x, _ = scanned(
                        block=self.block, filters=filters, train=train, dtype=d,
                        name=f"stage{i}{SCAN_AXIS_MARKER}",
                    )(x, None)
                else:
                    for _ in range(blocks - 1):
                        x = self.block(filters=filters, stride=1, dtype=d)(x, train)
        x = avg_pool(x, 4)
        x = x.reshape(x.shape[0], -1)
        return TorchDense(self.num_classes, dtype=d)(x).astype(jnp.float32)


def ResNet18(num_classes=10, scan_blocks=False, dtype=jnp.float32):
    return ResNet(BasicBlock, (2, 2, 2, 2), num_classes, scan_blocks, dtype)


def ResNet34(num_classes=10, scan_blocks=False, dtype=jnp.float32):
    return ResNet(BasicBlock, (3, 4, 6, 3), num_classes, scan_blocks, dtype)


def ResNet50(num_classes=10, scan_blocks=False, dtype=jnp.float32):
    return ResNet(Bottleneck, (3, 4, 6, 3), num_classes, scan_blocks, dtype)


def ResNet101(num_classes=10, scan_blocks=False, dtype=jnp.float32):
    return ResNet(Bottleneck, (3, 4, 23, 3), num_classes, scan_blocks, dtype)


def ResNet152(num_classes=10, scan_blocks=False, dtype=jnp.float32):
    return ResNet(Bottleneck, (3, 8, 36, 3), num_classes, scan_blocks, dtype)
