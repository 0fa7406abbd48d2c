"""ctypes binding for the native (C++/OpenMP) host-side data pipeline.

Builds ``native/libgqx_native.so`` on first use if the toolchain is present;
every entry point has a numpy fallback in gqx.data.transforms, so the
framework works without a compiler.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

from gqx.data.transforms import AUGMENT, STATS

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_NATIVE_DIR = os.path.join(_REPO, "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libgqx_native.so")

_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-C", _NATIVE_DIR],
            check=True, capture_output=True, timeout=120,
        )
        return os.path.exists(_LIB_PATH)
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
        lib.gqx_augment_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_uint64,
        ]
        lib.gqx_normalize_batch.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.gqx_pack_bits.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.gqx_unpack_bits.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int,
        ]
        lib.gqx_num_threads.restype = ctypes.c_int
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return _load() is not None


def augment_batch(x_uint8: np.ndarray, dataset: str, rng: np.random.Generator) -> np.ndarray:
    """Native fused pad/crop/flip/normalize; same distribution as the numpy
    path (offsets differ per-RNG but match the transform spec)."""
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x_uint8)
    n, h, w, c = x.shape
    pad, flip = AUGMENT[dataset]
    mean, std = STATS[dataset]
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    out = np.empty((n, h, w, c), np.float32)
    seed = int(rng.integers(0, 2 ** 63 - 1))
    lib.gqx_augment_batch(
        x.ctypes.data, out.ctypes.data, n, h, w, c, pad, int(flip),
        mean_a.ctypes.data, std_a.ctypes.data, seed,
    )
    return out


def normalize_batch(x_uint8: np.ndarray, dataset: str) -> np.ndarray:
    lib = _load()
    assert lib is not None
    x = np.ascontiguousarray(x_uint8)
    c = x.shape[-1]
    mean, std = STATS[dataset]
    mean_a = np.asarray(mean, np.float32)
    std_a = np.asarray(std, np.float32)
    out = np.empty(x.shape, np.float32)
    lib.gqx_normalize_batch(
        x.ctypes.data, out.ctypes.data, int(np.prod(x.shape[:-1])), c,
        mean_a.ctypes.data, std_a.ctypes.data,
    )
    return out


def pack_bits(values: np.ndarray, bits: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    v = np.ascontiguousarray(values, np.uint32)
    n = v.shape[0]
    out = np.zeros(((n * bits + 31) // 32,), np.uint32)
    lib.gqx_pack_bits(v.ctypes.data, out.ctypes.data, n, bits)
    return out


def unpack_bits(words: np.ndarray, bits: int, n: int) -> np.ndarray:
    lib = _load()
    assert lib is not None
    w = np.ascontiguousarray(words, np.uint32)
    out = np.empty((n,), np.uint32)
    lib.gqx_unpack_bits(w.ctypes.data, out.ctypes.data, n, bits)
    return out
