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
