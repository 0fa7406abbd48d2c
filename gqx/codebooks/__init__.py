"""Codebook registry: load learned codebooks from disk or train on-device.

The reference ships ~99MB of precomputed k-means codebooks and loads
``codebooks/learned_codebook/angular_dim_{d}_Ks_{K}.fvecs`` at compressor
construction (reference nearest_neighbor_compressor.py:48-52).  Here we
search a list of directories for that artifact family and, if absent,
train an equivalent codebook on-device (gqx.codebooks.kmeans) and cache it.

Rows are always L2-normalized at load (the reference normalizes at load too,
its :52, regardless of what's on disk).
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Sequence

import numpy as np

from gqx.codebooks.kmeans import DEFAULT_TRAIN_SIZE, train_codebook
from gqx.utils.vecs_io import fvecs_read, fvecs_write, normalize_rows

ENV_DIR = "GQX_CODEBOOK_DIR"
ENV_TRAIN_SIZE = "GQX_CODEBOOK_TRAIN_SIZE"

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
DEFAULT_CACHE_DIR = os.path.join(_REPO_ROOT, "codebooks", "learned_codebook")

# Read-only fallbacks.  The framework is self-hosted: all canonical
# dim/K codebooks are committed under codebooks/learned_codebook/ (generated
# by scripts/gen_codebooks.py).  Set GQX_REFERENCE_CODEBOOKS=/path/to/dir to
# additionally search an external artifact family (data, not code).
EXTRA_SEARCH_DIRS = ("./codebooks/learned_codebook",)
ENV_REFERENCE_DIR = "GQX_REFERENCE_CODEBOOKS"


def codebook_filename(dim: int, k: int) -> str:
    return f"angular_dim_{dim}_Ks_{k}.fvecs"


def _search_dirs(extra: Optional[Sequence[str]] = None):
    dirs = []
    if extra:
        dirs.extend(extra)
    env = os.environ.get(ENV_DIR)
    if env:
        dirs.append(env)
    dirs.append(DEFAULT_CACHE_DIR)
    dirs.extend(EXTRA_SEARCH_DIRS)
    ref = os.environ.get(ENV_REFERENCE_DIR)
    if ref:
        dirs.append(ref)
    return dirs


@functools.lru_cache(maxsize=None)
def get_codebook(
    dim: int,
    k: int,
    search_dir: Optional[str] = None,
    train_size: Optional[int] = None,
    cache: bool = True,
) -> np.ndarray:
    """Return a unit-row (k, dim) float32 codebook, loading or training it."""
    fname = codebook_filename(dim, k)
    for d in _search_dirs((search_dir,) if search_dir else None):
        path = os.path.join(d, fname)
        if os.path.exists(path):
            cb = fvecs_read(path)
            if cb.shape == (k, dim):
                return normalize_rows(cb)[1].astype(np.float32)

    if train_size is None:
        train_size = int(os.environ.get(ENV_TRAIN_SIZE, DEFAULT_TRAIN_SIZE))
    cb = train_codebook(dim, k, train_size=train_size)
    cb = normalize_rows(cb)[1].astype(np.float32)
    if cache:
        os.makedirs(DEFAULT_CACHE_DIR, exist_ok=True)
        fvecs_write(os.path.join(DEFAULT_CACHE_DIR, fname), cb)
    return cb


def orthonormal_codebook(dim: int, seed: int = 1) -> np.ndarray:
    """Random orthonormal (dim, dim) codebook for the K == dim case
    (reference nearest_neighbor_compressor.py:45-46 uses scipy ortho_group)."""
    from scipy import stats

    return stats.ortho_group.rvs(dim, random_state=seed).astype(np.float32)
