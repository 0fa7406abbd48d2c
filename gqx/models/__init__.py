"""Model registry (name parity with reference main.py:28-40; ``cnn`` is
additionally registered here — the reference exports it but forgot to
register it, models/__init__.py:2 vs main.py:28-40)."""

from __future__ import annotations

from gqx.models.cnn import CNN
from gqx.models.densenet import (
    DenseNet,
    DenseNet121,
    DenseNet161,
    DenseNet169,
    DenseNet201,
    densenet_cifar,
)
from gqx.models.fcn import FCN
from gqx.models.resnet import ResNet18, ResNet34, ResNet50, ResNet101, ResNet152
from gqx.models.vgg import vgg11, vgg13, vgg16, vgg19

NETWORKS = {
    "resnet18": ResNet18,
    "resnet34": ResNet34,
    "resnet50": ResNet50,
    "resnet101": ResNet101,
    "resnet152": ResNet152,
    "vgg11": vgg11,
    "vgg13": vgg13,
    "vgg16": vgg16,
    "vgg19": vgg19,
    "dense": densenet_cifar,
    "fcn": FCN,
    "cnn": CNN,
}


def create_model(name: str, num_classes: int, scan_blocks: bool = False,
                 dtype: str = "float32"):
    import jax.numpy as jnp

    d = jnp.dtype(dtype) if isinstance(dtype, str) else dtype
    if name not in NETWORKS:
        raise ValueError(f"unknown network {name!r}")
    if name == "fcn":
        return FCN(num_classes=num_classes, dtype=d)
    if name == "cnn":
        return CNN(num_classes=num_classes)
    if name.startswith("resnet"):
        return NETWORKS[name](num_classes=num_classes, scan_blocks=scan_blocks, dtype=d)
    return NETWORKS[name](num_classes=num_classes, dtype=d)
