"""fvecs/ivecs/bvecs IO: write/read roundtrips and mmap==eager equality
(on-disk format spec: reference utils/vecs_io.py:5-52)."""

import numpy as np

from gqx.utils.vecs_io import (
    bvecs_read,
    bvecs_read_mmap,
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
