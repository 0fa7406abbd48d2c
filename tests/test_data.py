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


# ---------------------------------------------------------------------------
# Raw-format reader fixtures: synthesize tiny valid files for every loader
# the reference supports (reference dataloaders.py:5-128) and run the full
# Pipeline on each — shapes, dtypes, label decoding, and layout transposes.
# ---------------------------------------------------------------------------

import gzip
import pickle
import struct

from gqx.data.datasets import load_dataset

N_TRAIN, N_TEST = 8, 4


def _write_idx(path, arr, compress=False):
    """IDX format: >u4 magic (0x0000_08_nd), >u4 per dim, raw uint8 payload."""
    magic = struct.pack(">I", 0x00000800 | arr.ndim)
    dims = b"".join(struct.pack(">I", d) for d in arr.shape)
    opener = gzip.open if compress else open
    with opener(str(path) + (".gz" if compress else ""), "wb") as f:
        f.write(magic + dims + arr.astype(np.uint8).tobytes())


@pytest.fixture
def mnist_fixture(tmp_path, rng):
    d = tmp_path / "MNIST" / "raw"
    d.mkdir(parents=True)
    tr_x = rng.integers(0, 256, size=(N_TRAIN, 28, 28)).astype(np.uint8)
    tr_y = (np.arange(N_TRAIN) % 10).astype(np.uint8)
    te_x = rng.integers(0, 256, size=(N_TEST, 28, 28)).astype(np.uint8)
    te_y = (np.arange(N_TEST) % 10).astype(np.uint8)
    # train plain, t10k gzipped: exercises both _maybe_gz_open paths
    _write_idx(d / "train-images-idx3-ubyte", tr_x)
    _write_idx(d / "train-labels-idx1-ubyte", tr_y)
    _write_idx(d / "t10k-images-idx3-ubyte", te_x, compress=True)
    _write_idx(d / "t10k-labels-idx1-ubyte", te_y, compress=True)
    return str(tmp_path), tr_x, tr_y, te_x, te_y


def test_mnist_reader_and_pipeline(mnist_fixture):
    root, tr_x, tr_y, te_x, te_y = mnist_fixture
    (x, y), (xt, yt) = load_dataset("mnist", root)
    np.testing.assert_array_equal(x[..., 0], tr_x)   # bit-exact payload
    np.testing.assert_array_equal(y, tr_y)
    np.testing.assert_array_equal(xt[..., 0], te_x)
    np.testing.assert_array_equal(yt, te_y)
    assert x.shape == (N_TRAIN, 28, 28, 1) and y.dtype == np.int64
    p = Pipeline(GQConfig(dataset="mnist", num_users=2, batch_size=2,
                          test_batch_size=4, data_dir=root))
    bx, by = next(p.train_epoch(1))
    assert bx.shape == (2, 2, 28, 28, 1) and by.shape == (2, 2)
    tx, _ = next(p.test_batches())
    assert tx.shape == (4, 28, 28, 1)


def _cifar_train_test(rng, key):
    tr_x = rng.integers(0, 256, size=(N_TRAIN, 3072)).astype(np.uint8)
    te_x = rng.integers(0, 256, size=(N_TEST, 3072)).astype(np.uint8)
    tr_y = [int(i % 10) for i in range(N_TRAIN)]
    te_y = [int(i % 10) for i in range(N_TEST)]
    return tr_x, tr_y, te_x, te_y


def test_cifar10_reader_and_pipeline(tmp_path, rng):
    root = tmp_path / "cifar-10-batches-py"
    root.mkdir()
    tr_x, tr_y, te_x, te_y = _cifar_train_test(rng, "labels")
    # 5 train batches (reference dataloaders.py loads data_batch_1..5)
    per = N_TRAIN // 4
    for i in range(1, 6):
        lo = (i - 1) * per % N_TRAIN
        chunk_x, chunk_y = tr_x[lo:lo + per], tr_y[lo:lo + per]
        with open(root / f"data_batch_{i}", "wb") as f:
            pickle.dump({"data": chunk_x, "labels": chunk_y}, f)
    with open(root / "test_batch", "wb") as f:
        pickle.dump({"data": te_x, "labels": te_y}, f)
    (x, y), (xt, yt) = load_dataset("cifar10", str(tmp_path))
    assert x.shape == (5 * per, 32, 32, 3) and xt.shape == (N_TEST, 32, 32, 3)
    # CHW -> HWC transpose: channel c, row h, col w of image 0
    np.testing.assert_array_equal(
        xt[0], te_x[0].reshape(3, 32, 32).transpose(1, 2, 0)
    )
    np.testing.assert_array_equal(yt, np.asarray(te_y, np.int64))
    p = Pipeline(GQConfig(dataset="cifar10", num_users=2, batch_size=2,
                          test_batch_size=4, data_dir=str(tmp_path)))
    bx, by = next(p.train_epoch(1))
    assert bx.shape == (2, 2, 32, 32, 3)


def test_cifar100_reader_and_pipeline(tmp_path, rng):
    root = tmp_path / "cifar-100-python"
    root.mkdir()
    tr_x, _, te_x, _ = _cifar_train_test(rng, "fine_labels")
    tr_y = [int(i % 100) for i in range(N_TRAIN)]
    te_y = [int(i % 100) for i in range(N_TEST)]
    with open(root / "train", "wb") as f:
        pickle.dump({"data": tr_x, "fine_labels": tr_y}, f)
    with open(root / "test", "wb") as f:
        pickle.dump({"data": te_x, "fine_labels": te_y}, f)
    (x, y), (xt, yt) = load_dataset("cifar100", str(tmp_path))
    assert x.shape == (N_TRAIN, 32, 32, 3)
    np.testing.assert_array_equal(y, np.asarray(tr_y, np.int64))
    cfg = GQConfig(dataset="cifar100", num_users=2, batch_size=2,
                   test_batch_size=4, data_dir=str(tmp_path))
    assert cfg.num_classes == 100
    bx, by = next(Pipeline(cfg).train_epoch(1))
    assert bx.shape == (2, 2, 32, 32, 3)


def test_svhn_reader_and_pipeline(tmp_path, rng):
    from scipy import io as sio

    def make(name, n):
        x = rng.integers(0, 256, size=(32, 32, 3, n)).astype(np.uint8)  # HWCN
        # labels cycle 4..10,1,... so a '10' (-> digit 0) is always present
        y = ((np.arange(n) + 3) % 10 + 1).astype(np.uint8)[:, None]
        sio.savemat(tmp_path / f"{name}_32x32.mat", {"X": x, "y": y})
        return x, y

    tr_x, tr_y, = make("train", N_TRAIN)
    te_x, te_y = make("test", N_TEST)
    (x, y), (xt, yt) = load_dataset("svhn", str(tmp_path))
    assert x.shape == (N_TRAIN, 32, 32, 3)
    # HWCN -> NHWC transpose exactness
    np.testing.assert_array_equal(x[3], tr_x[:, :, :, 3])
    # label '10' means digit 0 (reference dataloaders.py svhn semantics)
    np.testing.assert_array_equal(y, (tr_y.reshape(-1) % 10).astype(np.int64))
    assert 0 in y  # the 1..10 cycle includes a '10' -> 0 mapping
    bx, by = next(Pipeline(GQConfig(dataset="svhn", num_users=2, batch_size=2,
                                    test_batch_size=4, data_dir=str(tmp_path))
                           ).train_epoch(1))
    assert bx.shape == (2, 2, 32, 32, 3)


def test_stl10_reader_and_pipeline(tmp_path, rng):
    root = tmp_path / "stl10_binary"
    root.mkdir()

    def make(name, n):
        x = rng.integers(0, 256, size=(n, 3, 96, 96)).astype(np.uint8)  # NCWH
        y = (np.arange(n) % 10 + 1).astype(np.uint8)  # labels 1..10
        x.tofile(root / f"{name}_X.bin")
        y.tofile(root / f"{name}_y.bin")
        return x, y

    tr_x, tr_y = make("train", N_TRAIN)
    make("test", N_TEST)
    (x, y), (xt, yt) = load_dataset("stl10", str(tmp_path))
    assert x.shape == (N_TRAIN, 96, 96, 3) and xt.shape == (N_TEST, 96, 96, 3)
    # column-major CWH -> HWC: pixel (h, w, c) comes from stored (c, w, h)
    np.testing.assert_array_equal(x[1], tr_x[1].transpose(2, 1, 0))
    np.testing.assert_array_equal(y, tr_y.astype(np.int64) - 1)
    bx, by = next(Pipeline(GQConfig(dataset="stl10", num_users=2, batch_size=2,
                                    test_batch_size=4, data_dir=str(tmp_path))
                           ).train_epoch(1))
    assert bx.shape == (2, 2, 96, 96, 3)
