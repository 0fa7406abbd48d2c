"""The committed codebook corpus covers the full reference-reachable family
(reference codebook_generator.py:25-26: dims 1..65 x Ks {32,64,256,512,1024},
plus the dim-128 extras HSQ can reach with --c-dim 128), so ``get_codebook``
never falls back to train-at-train-time for any of these configs."""

import os

import numpy as np
import pytest

from gqx.codebooks import DEFAULT_CACHE_DIR, codebook_filename, get_codebook

KS = (32, 64, 256, 512, 1024)
DIMS = tuple(range(1, 66)) + (128,)


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
