"""Data-pipeline tests: transform parity with the reference stacks
(reference dataloaders.py), incl. the tinyimg RandomResizedCrop(224) train
path and Resize(256)+CenterCrop(224) eval path on an ImageFolder fixture."""

import numpy as np
import pytest
from PIL import Image

from gqx.config import GQConfig
from gqx.data import Pipeline
from gqx.data.transforms import (
    augment_batch,
    normalize,
    random_resized_crop,
    resize_center_crop,
)


def test_normalize_stats_mnist():
    x = np.full((2, 28, 28, 1), 255, np.uint8)
    out = normalize(x, "mnist")
    np.testing.assert_allclose(out, (1.0 - 0.1307) / 0.3081, rtol=1e-5)


def test_random_resized_crop_shape_and_range(rng):
    x = rng.integers(0, 256, size=(8, 64, 64, 3)).astype(np.uint8)
    out = random_resized_crop(x, np.random.default_rng(0), out_size=224)
    assert out.shape == (8, 224, 224, 3)
    assert out.min() >= 0.0 and out.max() <= 255.0


def test_random_resized_crop_identity_on_constant():
    # a constant image must stay constant through crop + bilinear resize
    x = np.full((2, 64, 64, 3), 113, np.uint8)
    out = random_resized_crop(x, np.random.default_rng(1), out_size=96)
    np.testing.assert_allclose(out, 113.0, atol=1e-3)


def test_resize_center_crop_semantics():
    # 64x64 -> Resize(256) upscales 4x, CenterCrop(224) keeps the middle
    # 224/256 = 7/8 of the image; corners of the source must not survive.
    x = np.zeros((1, 64, 64, 3), np.uint8)
    x[0, 31:33, 31:33, :] = 200  # center marker
    out = resize_center_crop(x, 256, 224)
    assert out.shape == (1, 224, 224, 3)
    c = out[0, 110:114, 110:114, 0]
    assert c.max() > 100.0  # center marker survives, upscaled
    assert out[0, 0, 0, 0] == 0.0


def test_augment_batch_tinyimg_is_224():
    x = np.random.default_rng(2).integers(0, 256, size=(4, 64, 64, 3)).astype(np.uint8)
    out = augment_batch(x, "tinyimg", np.random.default_rng(3))
    assert out.shape == (4, 224, 224, 3)
    # ImageNet normalization applied (values in standardized range)
    assert -3.0 < out.mean() < 3.0


@pytest.fixture
def tinyimg_fixture(tmp_path):
    """Minimal ImageFolder layout: 2 classes x 3 train / 2 val images."""
    rng = np.random.default_rng(7)
    for split, count in (("train", 3), ("val", 2)):
        for cls in ("n001", "n002"):
            d = tmp_path / "tinyimgnet" / split / cls
            d.mkdir(parents=True)
            for i in range(count):
                arr = rng.integers(0, 256, size=(64, 64, 3)).astype(np.uint8)
                Image.fromarray(arr).save(d / f"img_{i}.jpg")
    return str(tmp_path)


def test_tinyimg_pipeline_end_to_end(tinyimg_fixture):
    cfg = GQConfig(dataset="tinyimg", num_users=2, batch_size=2, test_batch_size=4,
                   data_dir=tinyimg_fixture)
    assert cfg.num_classes == 200  # registry value (reference main.py:57,70)
    p = Pipeline(cfg)
    assert p.image_shape == (224, 224, 3)
    x, y = next(p.train_epoch(1))
    assert x.shape == (2, 2, 224, 224, 3)
    assert y.shape == (2, 2)
    tx, ty = next(p.test_batches())
    assert tx.shape == (4, 224, 224, 3)
    assert set(np.unique(ty)) <= {0, 1}
