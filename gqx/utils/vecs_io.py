"""fvecs/ivecs codebook file IO.

The on-disk format (shared with the reference's codebook data,
reference utils/vecs_io.py:5-52): each row is a little-endian ``int32``
dimension header followed by ``dim`` payload elements (float32 for fvecs,
int32 for ivecs).  Implemented as single-shot numpy buffer reshapes — no
per-row Python loops.
"""

from __future__ import annotations

import os

import numpy as np


def ivecs_read(path) -> np.ndarray:
    raw = np.fromfile(path, dtype=np.int32)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.int32)
    dim = int(raw[0])
    return np.ascontiguousarray(raw.reshape(-1, dim + 1)[:, 1:])


def fvecs_read(path) -> np.ndarray:
    return ivecs_read(path).view(np.float32)


def bvecs_read(path) -> np.ndarray:
    """uint8-payload variant: 4-byte dim header + ``dim`` bytes per row
    (behavioral spec: reference utils/vecs_io.py:5-8)."""
    raw = np.fromfile(path, dtype=np.uint8)
    if raw.size == 0:
        return np.zeros((0, 0), dtype=np.uint8)
    dim = int(raw[:4].view(np.int32)[0])
    return np.ascontiguousarray(raw.reshape(-1, dim + 4)[:, 4:])


def ivecs_read_mmap(path) -> np.ndarray:
    """Zero-copy mmap view of an ivecs file: (n, dim) int32 slice of a
    ``np.memmap`` — rows materialize lazily on access, so a 99 MB codebook
    corpus can be opened whole without touching the pages (behavioral spec:
    reference utils/vecs_io.py:17-30).  The returned array is read-only."""
    # np.memmap refuses empty files, so the empty case is checked up front
    # to match the eager readers' (0, 0) result.
    if os.path.getsize(path) == 0:
        return np.zeros((0, 0), dtype=np.int32)
    raw = np.memmap(path, dtype=np.int32, mode="r")
    dim = int(raw[0])
    return raw.reshape(-1, dim + 1)[:, 1:]


def fvecs_read_mmap(path) -> np.ndarray:
    return ivecs_read_mmap(path).view(np.float32)


def bvecs_read_mmap(path) -> np.ndarray:
    if os.path.getsize(path) == 0:
        return np.zeros((0, 0), dtype=np.uint8)
    raw = np.memmap(path, dtype=np.uint8, mode="r")
    dim = int(raw[:4].view(np.int32)[0])
    return raw.reshape(-1, dim + 4)[:, 4:]


def fvecs_write(path, vecs: np.ndarray, append: bool = False) -> None:
    """Write (or with ``append=True``, append — the reference writers open
    ``"ab"``, utils/vecs_io.py:33-41) rows in fvecs format."""
    vecs = np.ascontiguousarray(np.asarray(vecs, dtype=np.float32))
    n, dim = vecs.shape
    buf = np.empty((n, dim + 1), dtype=np.int32)
    buf[:, 0] = dim
    buf[:, 1:] = vecs.view(np.int32)
    with open(path, "ab" if append else "wb") as f:
        buf.tofile(f)


def ivecs_write(path, vecs: np.ndarray, append: bool = False) -> None:
    vecs = np.ascontiguousarray(np.asarray(vecs, dtype=np.int32))
    n, dim = vecs.shape
    buf = np.empty((n, dim + 1), dtype=np.int32)
    buf[:, 0] = dim
    buf[:, 1:] = vecs
    with open(path, "ab" if append else "wb") as f:
        buf.tofile(f)


def bvecs_write(path, vecs: np.ndarray, append: bool = False) -> None:
    """uint8-payload writer: 4-byte dim header + ``dim`` bytes per row
    (completes the reader/writer family; row framing per reference
    utils/vecs_io.py:5-8)."""
    vecs = np.ascontiguousarray(np.asarray(vecs, dtype=np.uint8))
    n, dim = vecs.shape
    buf = np.empty((n, dim + 4), dtype=np.uint8)
    buf[:, :4] = np.full((n, 1), dim, dtype=np.int32).view(np.uint8)
    buf[:, 4:] = vecs
    with open(path, "ab" if append else "wb") as f:
        buf.tofile(f)


def normalize_rows(vecs: np.ndarray):
    """L2-normalize rows with a divide-by-zero guard; returns (norms, unit_rows)
    (behavioral spec: reference utils/vec_np.py:4-10)."""
    vecs = np.asarray(vecs)
    norms = np.linalg.norm(vecs, axis=1)
    safe = np.where(norms == 0, 1.0, norms)
    return norms, (vecs / safe[:, None]).astype(vecs.dtype)
