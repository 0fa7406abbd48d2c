"""On-device k-means codebook training (jitted Lloyd iterations).

TPU-native replacement for the reference's offline scipy pipeline
(reference codebook_generator.py:14-20: 1M unit-normalized N(0,1) samples,
``kmeans2`` with 20 iterations, ``minit='points'``).  The assignment step is
an (N, dim) x (dim, K) matmul on the MXU; centroid updates use segment sums.
Assignment is chunked over N so peak memory stays bounded for large K.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

DEFAULT_TRAIN_SIZE = 1_000_000
DEFAULT_ITERS = 20
_CHUNK = 1 << 17  # rows per assignment chunk


def unit_gaussian_samples(key: jax.Array, n: int, dim: int) -> jax.Array:
    x = jax.random.normal(key, (n, dim), dtype=jnp.float32)
    norms = jnp.linalg.norm(x, axis=1, keepdims=True)
    return x / jnp.where(norms == 0, 1.0, norms)


def _assign_chunk(x: jax.Array, centroids: jax.Array) -> jax.Array:
    # argmin ||x - c||^2  ==  argmax x·c - ||c||^2 / 2 — one MXU matmul.
    logits = jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
    logits = logits - 0.5 * jnp.sum(centroids * centroids, axis=1)
    return jnp.argmax(logits, axis=1)


@functools.partial(jax.jit, static_argnames=("k", "iters"))
def lloyd(key: jax.Array, x: jax.Array, k: int, iters: int = DEFAULT_ITERS) -> jax.Array:
    """Run ``iters`` Lloyd iterations; init = random distinct sample rows
    ('points' init).  Empty clusters keep their previous centroid (matching
    scipy kmeans2's default missing-cluster policy)."""
    n = x.shape[0]
    init_idx = jax.random.choice(key, n, (k,), replace=False)
    centroids = x[init_idx]

    n_chunks = max(1, -(-n // _CHUNK))
    pad = n_chunks * _CHUNK - n
    x_padded = jnp.pad(x, ((0, pad), (0, 0))) if pad else x
    chunks = x_padded.reshape(n_chunks, -1, x.shape[1])
    valid = (jnp.arange(n_chunks * chunks.shape[1]) < n).reshape(n_chunks, -1)

    def step(centroids, _):
        def per_chunk(carry, inp):
            sums, counts = carry
            xc, v = inp
            assign = _assign_chunk(xc, centroids)
            w = v.astype(jnp.float32)
            sums = sums + jax.ops.segment_sum(xc * w[:, None], assign, k)
            counts = counts + jax.ops.segment_sum(w, assign, k)
            return (sums, counts), None

        (sums, counts), _ = jax.lax.scan(
            per_chunk,
            (jnp.zeros((k, x.shape[1]), jnp.float32), jnp.zeros((k,), jnp.float32)),
            (chunks, valid),
        )
        new = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centroids)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    return centroids


def train_codebook(
    dim: int,
    k: int,
    seed: int = 808,
    train_size: int = DEFAULT_TRAIN_SIZE,
    iters: int = DEFAULT_ITERS,
    dim_pad: int = 128,
) -> np.ndarray:
    """Train a (k, dim) angular codebook from unit-normalized Gaussian samples
    (semantics of reference codebook_generator.py:23-31, seed included).

    Samples are zero-padded to ``dim_pad`` coordinates before Lloyd: padded
    coordinates contribute 0 to every distance and stay exactly 0 in every
    centroid update, so the trajectory equals the native-dim run — but one
    ``lloyd`` compilation per K serves the whole dim family (compiles are
    minutes each on this environment; the reference family is 65 dims).
    """
    key = jax.random.PRNGKey(seed)
    k_sample, k_init = jax.random.split(key)
    x = unit_gaussian_samples(k_sample, train_size, dim)
    if dim < dim_pad:
        x = jnp.pad(x, ((0, 0), (0, dim_pad - dim)))
    centroids = lloyd(k_init, x, k, iters)[:, :dim]
    return np.asarray(jax.device_get(centroids))
