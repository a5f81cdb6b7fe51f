"""Approximate medoid — batched replacement for the reference's
`compute_approximate_medoid_cython` (reference pydiskann/cython_utils.pyx:210-263),
which loops over a 1000-point sample computing scalar distance sums.

Here: one batched [S, N'] distance matrix + row-sum reduction on the MXU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diskrag_tpu.ops.distance import Metric, pairwise_distance


@functools.partial(jax.jit, static_argnames=("sample_size", "target_size", "metric"))
def approximate_medoid(
    points: jax.Array,
    key: jax.Array | None = None,
    sample_size: int = 1024,
    target_size: int = 16384,
    metric: Metric | str = Metric.L2,
) -> jax.Array:
    """Index of the approximate medoid of `points` [N, D].

    Samples up to `sample_size` candidate rows and up to `target_size`
    target rows, computes the full candidate x target distance matrix, and
    returns the candidate with the smallest distance sum. With N below both
    caps this is the exact medoid (the reference samples 1000 candidates vs
    all N targets).
    """
    n = points.shape[0]
    if key is None:
        key = jax.random.key(0)
    k_c, k_t = jax.random.split(key)
    if n <= sample_size:
        cand_idx = jnp.arange(n)
    else:
        cand_idx = jax.random.choice(k_c, n, shape=(sample_size,), replace=False)
    if n <= target_size:
        targets = points
    else:
        t_idx = jax.random.choice(k_t, n, shape=(target_size,), replace=False)
        targets = points[t_idx]
    cands = points[cand_idx]
    d = pairwise_distance(cands, targets, metric)
    sums = jnp.sum(d, axis=1)
    return cand_idx[jnp.argmin(sums)]
