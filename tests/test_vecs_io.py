"""fvecs/ivecs/bvecs IO: write/read roundtrips and mmap==eager equality
(on-disk format spec: reference utils/vecs_io.py:5-52)."""

import numpy as np

from gqx.utils.vecs_io import (
    bvecs_read,
    bvecs_read_mmap,
    bvecs_write,
    fvecs_read,
    fvecs_read_mmap,
    fvecs_write,
    ivecs_read,
    ivecs_read_mmap,
    ivecs_write,
)


def test_fvecs_roundtrip_and_mmap(tmp_path):
    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((17, 5)).astype(np.float32)
    p = tmp_path / "a.fvecs"
    fvecs_write(p, vecs)
    got = fvecs_read(p)
    np.testing.assert_array_equal(got, vecs)
    mm = fvecs_read_mmap(p)
    assert isinstance(mm.base, np.memmap)
    np.testing.assert_array_equal(np.asarray(mm), vecs)


def test_ivecs_roundtrip_and_mmap(tmp_path):
    rng = np.random.default_rng(1)
    vecs = rng.integers(-1000, 1000, size=(9, 7)).astype(np.int32)
    p = tmp_path / "a.ivecs"
    ivecs_write(p, vecs)
    np.testing.assert_array_equal(ivecs_read(p), vecs)
    np.testing.assert_array_equal(np.asarray(ivecs_read_mmap(p)), vecs)


def test_bvecs_read(tmp_path):
    # bvecs rows: int32 dim header + dim uint8 payload
    rng = np.random.default_rng(2)
    vecs = rng.integers(0, 256, size=(11, 6)).astype(np.uint8)
    p = tmp_path / "a.bvecs"
    with open(p, "wb") as f:
        for row in vecs:
            f.write(np.int32(row.size).tobytes())
            f.write(row.tobytes())
    np.testing.assert_array_equal(bvecs_read(p), vecs)
    np.testing.assert_array_equal(np.asarray(bvecs_read_mmap(p)), vecs)


def test_empty_files(tmp_path):
    p = tmp_path / "empty.fvecs"
    p.write_bytes(b"")
    assert fvecs_read(p).shape == (0, 0)
    assert ivecs_read(p).shape == (0, 0)
    assert bvecs_read(p).shape == (0, 0)
    # mmap readers must match the eager (0, 0) result instead of crashing in
    # np.memmap ('cannot mmap an empty file')
    assert fvecs_read_mmap(p).shape == (0, 0)
    assert ivecs_read_mmap(p).shape == (0, 0)
    assert bvecs_read_mmap(p).shape == (0, 0)


def test_bvecs_write_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    vecs = rng.integers(0, 256, size=(13, 9)).astype(np.uint8)
    p = tmp_path / "w.bvecs"
    bvecs_write(p, vecs)
    np.testing.assert_array_equal(bvecs_read(p), vecs)
    np.testing.assert_array_equal(np.asarray(bvecs_read_mmap(p)), vecs)


def test_writers_append_mode(tmp_path):
    # the reference writers open "ab" (utils/vecs_io.py:33-52): appending two
    # batches equals one concatenated write
    rng = np.random.default_rng(4)
    a = rng.standard_normal((3, 4)).astype(np.float32)
    b = rng.standard_normal((5, 4)).astype(np.float32)
    p = tmp_path / "app.fvecs"
    fvecs_write(p, a)
    fvecs_write(p, b, append=True)
    np.testing.assert_array_equal(fvecs_read(p), np.concatenate([a, b]))

    ia = rng.integers(0, 99, size=(2, 6)).astype(np.int32)
    ib = rng.integers(0, 99, size=(4, 6)).astype(np.int32)
    q = tmp_path / "app.ivecs"
    ivecs_write(q, ia)
    ivecs_write(q, ib, append=True)
    np.testing.assert_array_equal(ivecs_read(q), np.concatenate([ia, ib]))

    ba = rng.integers(0, 256, size=(2, 5)).astype(np.uint8)
    bb = rng.integers(0, 256, size=(3, 5)).astype(np.uint8)
    r = tmp_path / "app.bvecs"
    bvecs_write(r, ba)
    bvecs_write(r, bb, append=True)
    np.testing.assert_array_equal(bvecs_read(r), np.concatenate([ba, bb]))
