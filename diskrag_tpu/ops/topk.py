"""On-device top-k / candidate-list maintenance primitives.

The reference maintains Python heaps (`heapq`) for its search frontier and
result lists (reference pydiskann/vamana_graph.py:535-605,607-640). On TPU
those become fixed-width sorted arrays maintained with `lax.top_k`, with
duplicate / invalid entries masked to +inf — the standard static-shape
formulation of a bounded priority queue.

Conventions used throughout the framework:
  - invalid ids are -1 (the reference zero-pads neighbor slots, aliasing
    node 0 — see SURVEY.md §7 quirks; we deliberately use a -1 sentinel).
  - invalid / masked distances are +inf.
  - candidate lists are kept sorted ascending by distance.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

INF = jnp.inf
INVALID_ID = -1


def topk_smallest(dists: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Smallest-k along the last axis. Returns (values, indices), ascending."""
    neg, idx = jax.lax.top_k(-dists, k)
    return -neg, idx


def mask_duplicates(ids: jax.Array, dists: jax.Array) -> jax.Array:
    """Return dists with duplicate/invalid ids masked to +inf.

    Keeps, for each distinct id, the occurrence with the smallest
    (dist, position) pair. ids: [..., K], dists: [..., K] -> [..., K].
    O(K^2) elementwise compare — VPU-friendly for K up to a few hundred.
    """
    k = ids.shape[-1]
    eq = ids[..., :, None] == ids[..., None, :]  # [..., K, K]
    d_i = dists[..., :, None]
    d_j = dists[..., None, :]
    pos = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)  # row index i
    pos_j = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)  # col index j
    # occurrence j "beats" occurrence i if it has smaller dist, or equal dist
    # and earlier position.
    beats = (d_j < d_i) | ((d_j == d_i) & (pos_j < pos))
    dup = jnp.any(eq & beats, axis=-1)
    bad = dup | (ids == INVALID_ID)
    return jnp.where(bad, INF, dists)


def merge_topk(
    ids_a: jax.Array,
    dists_a: jax.Array,
    ids_b: jax.Array,
    dists_b: jax.Array,
    k: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Merge two candidate lists into the k best unique entries.

    Returns (ids [.., k], dists [.., k], take [.., k]) where `take` indexes
    into the concatenated [A+B] axis, so callers can gather any payload
    arrays (e.g. expanded flags) with `jnp.take_along_axis(concat_payload,
    take, axis=-1)`. Output sorted ascending; slots beyond the number of
    valid uniques have id == -1 and dist == +inf.
    """
    ids = jnp.concatenate([ids_a, ids_b], axis=-1)
    dists = jnp.concatenate([dists_a, dists_b], axis=-1)
    masked = mask_duplicates(ids, dists)
    top_d, take = topk_smallest(masked, k)
    top_i = jnp.take_along_axis(ids, take, axis=-1)
    top_i = jnp.where(jnp.isinf(top_d), INVALID_ID, top_i)
    return top_i, top_d, take


@functools.partial(jax.jit, static_argnames=("k",))
def sort_topk_unique(ids: jax.Array, dists: jax.Array, k: int):
    """Top-k unique over a single list (convenience wrapper)."""
    masked = mask_duplicates(ids, dists)
    top_d, take = topk_smallest(masked, k)
    top_i = jnp.take_along_axis(ids, take, axis=-1)
    top_i = jnp.where(jnp.isinf(top_d), INVALID_ID, top_i)
    return top_i, top_d, take
