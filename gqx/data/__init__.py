"""Data pipeline: raw readers + vectorized augmentation + per-user batching.

Train batches carry a leading ``users`` axis of shape
(num_users, batch_size, H, W, C): the reference builds global batches of
``batch_size * num_users`` and slices them per user (reference
dataloaders.py:12, main.py:186-193); here the user split is a reshape, and
the same array shards directly over a mesh ``users`` axis in mesh mode.

Deviation from the reference: trailing partial global batches are dropped
(static shapes under jit); the reference gives the remainder to the last
user (main.py:192-193).
"""

from __future__ import annotations

from typing import Iterator, Optional, Tuple

import numpy as np

from gqx.data.datasets import LOADERS, load_dataset
from gqx.data.transforms import (
    AUGMENT,
    STATS,
    TINYIMG_SIZE,
    augment_batch,
    normalize,
    resize_center_crop,
)


class Pipeline:
    """In-memory dataset + epoch iterators."""

    def __init__(self, config, native: Optional[bool] = None):
        self.dataset = config.dataset
        self.num_users = config.num_users
        self.batch_size = config.batch_size
        self.test_batch_size = config.test_batch_size
        (self.train_x, self.train_y), (self.test_x, self.test_y) = load_dataset(
            config.dataset, config.data_dir,
            **(getattr(config, "dataset_kwargs", None) or {})
        )
        self.global_batch = self.batch_size * self.num_users
        self.steps_per_epoch = len(self.train_x) // self.global_batch
        self._seed = config.seed
        # Optional native (C++) augmentation backend; falls back to numpy.
        self._native = None
        if native is not False:
            try:
                from gqx.data import native as native_mod

                self._native = native_mod if native_mod.available() else None
            except Exception:
                self._native = None

    def train_epoch(self, epoch: int) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (x, y) with x: (num_users, batch, H, W, C) float32, y int32."""
        rng = np.random.default_rng(self._seed * 100003 + epoch)
        order = rng.permutation(len(self.train_x))
        for step in range(self.steps_per_epoch):
            idx = order[step * self.global_batch : (step + 1) * self.global_batch]
            if self._native is not None and self.dataset != "tinyimg":
                # the native kernel covers pad/crop/flip/normalize; tinyimg's
                # RandomResizedCrop(224) runs on the numpy path
                x = self._native.augment_batch(self.train_x[idx], self.dataset, rng)
            else:
                x = augment_batch(self.train_x[idx], self.dataset, rng)
            y = self.train_y[idx].astype(np.int32)
            u, b = self.num_users, self.batch_size
            yield (
                x.reshape((u, b) + x.shape[1:]),
                y.reshape(u, b),
            )

    def test_batches(self, limit: Optional[int] = None) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        n = len(self.test_x)
        count = 0
        for start in range(0, n, self.test_batch_size):
            x = self.test_x[start : start + self.test_batch_size]
            if self.dataset == "tinyimg":
                # eval stack Resize(256) + CenterCrop(224)
                # (reference dataloaders.py:154-155)
                x = resize_center_crop(x, 256, TINYIMG_SIZE)
            x = normalize(x, self.dataset)
            y = self.test_y[start : start + self.test_batch_size].astype(np.int32)
            yield x, y
            count += 1
            if limit is not None and count >= limit:
                return

    @property
    def image_shape(self):
        if self.dataset == "tinyimg":
            # images are stored at load resolution; the train/eval transforms
            # emit 224px (reference dataloaders.py:141,154-155)
            return (TINYIMG_SIZE, TINYIMG_SIZE, 3)
        return tuple(self.train_x.shape[1:])
