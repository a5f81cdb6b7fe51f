"""Batched distance kernels (TPU-native replacements of the reference's
scalar Cython distance loops).

Reference behavior being matched (NOT ported):
  - L2: squared euclidean, `l2_distance_fast_cython`
    (reference pydiskann/cython_utils.pyx:18-24) — a scalar per-element loop.
  - Cosine: returns cosine *distance* (1 - cos similarity) despite the
    reference's name `cosine_similarity_cython`
    (reference pydiskann/cython_utils.pyx:53-70).

Here every distance is computed in batched matmul form so the FLOPs land on
the MXU:  ||x - y||^2 = ||x||^2 + ||y||^2 - 2 x.y.
All functions are jit-friendly (static shapes, no data-dependent control
flow) and used under vmap/shard_map by the search and build paths.
"""

from __future__ import annotations

import enum
import functools

import jax
import jax.numpy as jnp


class Metric(str, enum.Enum):
    """Distance metric. Values match the reference's string choices
    (reference pydiskann/vamana_graph.py:21 `distance_metric='l2'|'cosine'`)."""

    L2 = "l2"
    COSINE = "cosine"
    DOT = "dot"  # negative inner product (extension; not in reference)


def squared_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms. x: [..., D] -> [...]."""
    return jnp.sum(jnp.square(x), axis=-1)


def pairwise_l2_sq(
    x: jax.Array,
    y: jax.Array,
    y_sq: jax.Array | None = None,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Pairwise squared L2 distances in matmul form.

    x: [M, D], y: [N, D] -> [M, N].  `y_sq` optionally caches ||y||^2.
    Clamped at 0 to hide catastrophic-cancellation negatives.
    """
    x_sq = squared_norms(x)
    if y_sq is None:
        y_sq = squared_norms(y)
    xy = jnp.matmul(x, y.T, precision=precision)
    d = x_sq[..., :, None] + y_sq[..., None, :] - 2.0 * xy
    return jnp.maximum(d, 0.0)


def pairwise_cosine_distance(
    x: jax.Array,
    y: jax.Array,
    eps: float = 1e-12,
    precision=jax.lax.Precision.HIGHEST,
) -> jax.Array:
    """Pairwise cosine distance (1 - cosine similarity), [M, N].

    Matches the reference's convention of returning a distance
    (reference pydiskann/cython_utils.pyx:68-70).
    """
    xn = x * jax.lax.rsqrt(squared_norms(x) + eps)[..., :, None]
    yn = y * jax.lax.rsqrt(squared_norms(y) + eps)[..., :, None]
    return 1.0 - jnp.matmul(xn, yn.T, precision=precision)


def pairwise_dot_distance(
    x: jax.Array, y: jax.Array, precision=jax.lax.Precision.HIGHEST
) -> jax.Array:
    """Negative inner product as a distance, [M, N]."""
    return -jnp.matmul(x, y.T, precision=precision)


def pairwise_distance(
    x: jax.Array, y: jax.Array, metric: Metric | str = Metric.L2, **kw
) -> jax.Array:
    """Dispatch on metric, mirroring the reference's `compute_distance`
    dispatcher (reference pydiskann/vamana_graph.py:259-329)."""
    metric = Metric(metric)
    if metric == Metric.L2:
        return pairwise_l2_sq(x, y, **kw)
    if metric == Metric.COSINE:
        return pairwise_cosine_distance(x, y, **kw)
    return pairwise_dot_distance(x, y, **kw)


def query_point_distance(
    query: jax.Array, points: jax.Array, metric: Metric | str = Metric.L2
) -> jax.Array:
    """Distances from one query [D] to points [K, D] -> [K]."""
    return pairwise_distance(query[None, :], points, metric)[0]


@functools.partial(jax.jit, static_argnames=("k", "metric"))
def brute_force_topk(
    queries: jax.Array, points: jax.Array, k: int, metric: Metric | str = Metric.L2
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k nearest neighbors by full distance matrix.

    queries: [B, D], points: [N, D] -> (dists [B, k], ids [B, k]).
    This is the ground-truth oracle (reference dataset_benchmark.py:62) and
    the `brute_force` search mode used for tiny collections
    (reference pydiskann/pq/adaptive_pq.py:60-66).
    """
    d = pairwise_distance(queries, points, metric)
    neg, idx = jax.lax.top_k(-d, k)
    return -neg, idx


def rerank_exact_topk(
    queries: jax.Array,
    vectors_f32: jax.Array,
    cand_ids: jax.Array,
    k: int,
    metric: str | Metric = Metric.L2,
) -> tuple[jax.Array, jax.Array]:
    """Exact f32 rerank of gathered candidates — THE shared tail of every
    approximate scan (fused flat scan, XLA tiled scan, IVF probes).

    Gathers `vectors_f32[cand_ids]` ([B, kk, D]), computes the exact
    metric distance (L2 squared via the difference form — no
    cancellation; cosine as 1 - cos on normalized copies; dot negated),
    masks invalid ids (-1) to +inf, and returns the ascending top-k
    (dists [B, k], ids [B, k]).
    """
    m = Metric(metric)
    n = vectors_f32.shape[0]
    cand = vectors_f32[jnp.clip(cand_ids, 0, n - 1)]  # [B, kk, D]
    if m == Metric.L2:
        diff = cand - queries[:, None, :]
        exact = jnp.sum(diff * diff, axis=-1)
    elif m == Metric.COSINE:
        qh = queries / (
            jnp.linalg.norm(queries, axis=-1, keepdims=True) + 1e-12
        )
        ch = cand / (jnp.linalg.norm(cand, axis=-1, keepdims=True) + 1e-12)
        exact = 1.0 - jnp.einsum("bd,bkd->bk", qh, ch)
    else:
        exact = -jnp.einsum("bd,bkd->bk", queries, cand)
    exact = jnp.where(cand_ids == -1, jnp.inf, exact)
    neg, take = jax.lax.top_k(-exact, k)
    return -neg, jnp.take_along_axis(cand_ids, take, axis=1)
