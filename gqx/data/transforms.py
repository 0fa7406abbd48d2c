"""Vectorized host-side augmentation (numpy), matching the reference
transform stacks (reference dataloaders.py):

  - mnist: normalize (0.1307, 0.3081) only (its :8-18)
  - cifar10/cifar100/svhn: random crop with 4px padding + horizontal flip +
    CIFAR-10 channel stats (its :23-45 — the reference reuses CIFAR-10 stats
    for cifar100/svhn/stl10, which we preserve)
  - stl10: random crop 96 with 4px padding + flip, CIFAR-10 stats (its :77-90)
  - tinyimg: flip + ImageNet stats (its :135-144; the RandomResizedCrop(224)
    upscale is replaced by native-resolution random crop — images are stored
    at load resolution)
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

STATS = {
    "mnist": ((0.1307,), (0.3081,)),
    "cifar10": ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010)),
    "cifar100": ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010)),
    "stl10": ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010)),
    "svhn": ((0.4914, 0.4822, 0.4465), (0.2023, 0.1994, 0.2010)),
    "tinyimg": ((0.485, 0.456, 0.406), (0.229, 0.224, 0.225)),
    "synthetic": ((0.5, 0.5, 0.5), (0.25, 0.25, 0.25)),
}

AUGMENT = {  # (random_crop_padding, horizontal_flip)
    "mnist": (0, False),
    "cifar10": (4, True),
    "cifar100": (4, True),
    "stl10": (4, True),
    "svhn": (4, True),
    "tinyimg": (4, True),
    "synthetic": (0, False),
}


def normalize(x_uint8: np.ndarray, dataset: str) -> np.ndarray:
    mean, std = STATS[dataset]
    x = x_uint8.astype(np.float32) / 255.0
    return (x - np.asarray(mean, np.float32)) / np.asarray(std, np.float32)


def random_crop_flip(
    x: np.ndarray, rng: np.random.Generator, padding: int, flip: bool
) -> np.ndarray:
    """Random crop (after zero padding) + horizontal flip, vectorized over the
    batch with per-image offsets."""
    n, h, w, c = x.shape
    if padding > 0:
        padded = np.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
        off_h = rng.integers(0, 2 * padding + 1, size=n)
        off_w = rng.integers(0, 2 * padding + 1, size=n)
        rows = off_h[:, None] + np.arange(h)[None, :]            # (n, h)
        cols = off_w[:, None] + np.arange(w)[None, :]            # (n, w)
        x = padded[np.arange(n)[:, None, None], rows[:, :, None], cols[:, None, :], :]
    if flip:
        do = rng.random(n) < 0.5
        x = np.where(do[:, None, None, None], x[:, :, ::-1, :], x)
    return x


def augment_batch(
    x_uint8: np.ndarray, dataset: str, rng: np.random.Generator
) -> np.ndarray:
    padding, flip = AUGMENT[dataset]
    x = random_crop_flip(x_uint8, rng, padding, flip)
    return normalize(x, dataset)
