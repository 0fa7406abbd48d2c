"""The committed codebook corpus covers the full family the reference SHIPS
(reference codebooks/learned_codebook/: dims 1..65 + {128,256,512} x Ks
{32,...,4096} — loaded by nearest_neighbor_compressor.py:50-52), so
``get_codebook`` never falls back to train-at-train-time for any reference-
reachable (dim, K).  We are a strict superset: the 3 files the reference
checkout lost to missing-large-blobs (its .MISSING_LARGE_BLOBS) are present
here too."""

import os

import numpy as np
import pytest

from gqx.codebooks import DEFAULT_CACHE_DIR, codebook_filename, get_codebook

KS = (32, 64, 256, 512, 1024, 2048, 4096)
DIMS = tuple(range(1, 66)) + (128, 256, 512)


def test_family_files_present():
    missing = [
        (d, k)
        for d in DIMS
        for k in KS
        if not os.path.exists(os.path.join(DEFAULT_CACHE_DIR, codebook_filename(d, k)))
    ]
    assert not missing, f"{len(missing)} codebooks missing, e.g. {missing[:5]}"


@pytest.mark.parametrize("dim", DIMS[::7])  # sampled dims, every K
@pytest.mark.parametrize("k", KS)
def test_family_loads_unit_rows(dim, k):
    cb = get_codebook(dim, k)
    assert cb.shape == (k, dim)
    assert cb.dtype == np.float32
    norms = np.linalg.norm(cb, axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)


def test_kmeans_family_files_present():
    """The reference's second artifact family: raw (non-normalized) k-means
    centroids under codebooks/kmeans_codebook/ — written by reference
    codebook_generator.py:23-31, loaded by no code path (SURVEY.md §2.8).
    Shipped for artifact-family completeness: same 328-file grid as the
    reference (dims 1..65 x Ks {32,64,256,512,1024} + dim 256 at
    Ks {256,512,1024})."""
    kdir = os.path.join(os.path.dirname(DEFAULT_CACHE_DIR), "kmeans_codebook")
    grid = [(d, k) for d in range(1, 66) for k in (32, 64, 256, 512, 1024)]
    grid += [(256, 256), (256, 512), (256, 1024)]
    missing = [
        (d, k) for d, k in grid
        if not os.path.exists(os.path.join(kdir, codebook_filename(d, k)))
    ]
    assert not missing, f"{len(missing)} kmeans codebooks missing: {missing[:5]}"


def test_kmeans_family_raw_centroids():
    """Rows are raw centroids strictly INSIDE the unit sphere (k-means means
    of unit vectors), unlike the learned family's unit rows."""
    from gqx.utils.vecs_io import fvecs_read

    kdir = os.path.join(os.path.dirname(DEFAULT_CACHE_DIR), "kmeans_codebook")
    cb = fvecs_read(os.path.join(kdir, codebook_filename(16, 256)))
    assert cb.shape == (256, 16)
    norms = np.linalg.norm(cb, axis=1)
    assert 0.2 < norms.mean() < 0.95 and norms.max() < 1.0
