"""Dynamic index operations: incremental insert, tombstone delete,
consolidation — counterparts of the reference's `insert_node` /
`delete_node` / `consolidate_index` (reference vamana_graph.py:58-230).

TPU-native design:
  - inserts are *batched*: new points extend the dense arrays and one
    build wave (batched search + RobustPrune + reverse edges) links them
    in — the single-point reference loop is the W=1 special case;
  - deletes are tombstones in a boolean mask; search traverses through
    tombstoned nodes (standard FreshDiskANN behavior) but they are
    filtered from results by the caller (see `filter_deleted`);
  - consolidation compacts the arrays: deleted rows are dropped, ids are
    remapped, edges into deleted nodes are replaced by the deleted node's
    own out-edges (a cheap stitch), then a refinement pass restores graph
    quality — the reference instead rebuilds all active nodes from
    scratch (vamana_graph.py:127-230); we refine in waves for the same
    effect at a fraction of the cost.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.graph.build import wave_step
from diskrag_tpu.graph.types import VamanaIndex
from diskrag_tpu.ops.topk import INVALID_ID


def insert_points(
    index: VamanaIndex,
    new_vectors: np.ndarray | jax.Array,
    *,
    build_width: int = 64,
    alpha: float = 1.2,
    max_incoming: int | None = None,
    expand_width: int = 8,
) -> VamanaIndex:
    """Insert a batch of new points into an existing index.

    Returns a new (larger) index; ids of existing points are unchanged,
    new points get ids n..n+M-1.
    """
    new_vectors = jnp.asarray(new_vectors, jnp.float32)
    if new_vectors.ndim == 1:
        new_vectors = new_vectors[None, :]
    m = new_vectors.shape[0]
    n, r = index.adjacency.shape
    if new_vectors.shape[1] != index.dim:
        raise ValueError(
            f"dimension mismatch: {new_vectors.shape[1]} vs {index.dim}"
        )

    vectors = jnp.concatenate([index.vectors, new_vectors], axis=0)
    # new rows start with random links into the existing graph so reverse
    # edges can reach them even before their wave completes
    key = jax.random.key(n)  # deterministic per current size
    rand = jax.random.randint(key, (m, r), 0, n, jnp.int32)
    adjacency = jnp.concatenate([index.adjacency, rand], axis=0)

    wave_ids = jnp.arange(n, n + m, dtype=jnp.int32)
    chunk = min(8192, m * r)
    adjacency = wave_step(
        vectors, adjacency, index.medoid, wave_ids,
        jnp.asarray(alpha, jnp.float32),
        build_width=build_width,
        max_incoming=max_incoming or min(16, r),
        chunk=chunk, metric=index.metric, expand_width=expand_width,
    )
    return VamanaIndex(
        vectors=vectors, adjacency=adjacency, medoid=index.medoid,
        metric=index.metric, entry_points=index.entry_points,
    )


def make_deleted_mask(n: int, deleted_ids=None) -> jax.Array:
    mask = jnp.zeros((n,), jnp.bool_)
    if deleted_ids is not None and len(deleted_ids) > 0:
        mask = mask.at[jnp.asarray(deleted_ids, jnp.int32)].set(True)
    return mask


def delete_points(deleted_mask: jax.Array, ids) -> jax.Array:
    """Tombstone additional ids (reference delete_node, vamana_graph.py:116)."""
    return deleted_mask.at[jnp.asarray(ids, jnp.int32)].set(True)


def filter_deleted(
    ids: jax.Array, dists: jax.Array, deleted_mask: jax.Array, k: int
) -> tuple[jax.Array, jax.Array]:
    """Drop tombstoned ids from search results; callers should over-fetch
    (search k' > k) when deletions are pending."""
    n = deleted_mask.shape[0]
    bad = (ids == INVALID_ID) | deleted_mask[jnp.clip(ids, 0, n - 1)]
    masked = jnp.where(bad, jnp.inf, dists)
    neg, take = jax.lax.top_k(-masked, k)
    out_ids = jnp.take_along_axis(ids, take, axis=-1)
    out_ids = jnp.where(jnp.isinf(-neg), INVALID_ID, out_ids)
    return out_ids, -neg


def consolidate(
    index: VamanaIndex,
    deleted_mask: jax.Array,
    *,
    build_width: int = 64,
    alpha: float = 1.2,
    refine_fraction: float = 1.0,
    seed: int = 0,
) -> tuple[VamanaIndex, np.ndarray]:
    """Compact away tombstoned nodes.

    Returns (new_index, old_to_new) where old_to_new[i] is the new id of
    old node i, or -1 if it was deleted.
    """
    deleted = np.asarray(deleted_mask)
    n = len(deleted)
    keep = ~deleted
    n_new = int(keep.sum())
    if n_new == 0:
        raise ValueError("cannot consolidate an index with every node deleted")
    old_to_new = np.full(n, -1, np.int64)
    old_to_new[keep] = np.arange(n_new)

    vectors = np.asarray(index.vectors)[keep]
    adj_full = np.asarray(index.adjacency)  # one device->host fetch

    # stitch: edges into deleted nodes are replaced by that node's own
    # out-edges (one hop through the tombstone), then remapped + deduped
    kept_adj = adj_full[keep]  # [n_new, R] old ids
    r = kept_adj.shape[1]
    # Everything below is built PER ROW-CHUNK: the hop tensor is
    # [rows, R, R] and the candidate matrix [rows, R*(R+1)] — at 1M x
    # R=48 materializing them for all rows at once costs tens of GB of
    # host RAM for a 192 MB adjacency. The chunk loop bounds the whole
    # working set, not just the argsort temporaries.
    new_adj = np.full((n_new, r), -1, np.int32)
    c = r * (r + 1)
    chunk_rows = max(1, (1 << 24) // max(c, 1))
    for lo in range(0, n_new, chunk_rows):
        ka = kept_adj[lo : lo + chunk_rows]  # [m, R] old ids
        safe = np.clip(ka, 0, n - 1)
        edge_deleted = (ka >= 0) & deleted[safe]
        # candidates: original neighbors + one-hop-through for deleted
        # ones (the deleted neighbor's own out-edges)
        hop = adj_full[safe]  # [m, R, R]
        cand = np.concatenate(
            [
                np.where(edge_deleted, -1, ka)[:, :, None],
                np.where(edge_deleted[:, :, None], hop, -1),
            ],
            axis=2,
        ).reshape(ka.shape[0], -1)
        # remap to new ids, dropping deleted/invalid
        cand_safe = np.clip(cand, 0, n - 1)
        rows = np.where(
            (cand >= 0) & ~deleted[cand_safe], old_to_new[cand_safe], -1
        ).astype(np.int32)
        # dedup per row keeping column order, cap at R: id-sorted stable
        # argsort marks repeat occurrences, then a second stable argsort
        # on validity compacts survivors to the front
        m = rows.shape[0]
        self_col = np.arange(lo, lo + m, dtype=rows.dtype)[:, None]
        valid = (rows >= 0) & (rows != self_col)
        by_id = np.argsort(np.where(valid, rows, np.iinfo(np.int32).max),
                           axis=1, kind="stable")
        sorted_ids = np.take_along_axis(rows, by_id, axis=1)
        dup_sorted = np.zeros_like(valid)
        dup_sorted[:, 1:] = sorted_ids[:, 1:] == sorted_ids[:, :-1]
        dup = np.zeros_like(valid)
        np.put_along_axis(dup, by_id, dup_sorted, axis=1)
        keep = valid & ~dup
        compact = np.argsort(~keep, axis=1, kind="stable")[:, :r]
        vals = np.take_along_axis(rows, compact, axis=1)
        kept = np.take_along_axis(keep, compact, axis=1)
        new_adj[lo : lo + m] = np.where(kept, vals, -1)

    from diskrag_tpu.ops.medoid import approximate_medoid

    # remap surviving entry points to new ids (deleted ones are dropped)
    new_entries = None
    if index.entry_points is not None:
        eps = np.asarray(index.entry_points)
        eps = old_to_new[eps[~deleted[eps]]]
        if eps.size > 1:
            new_entries = jnp.asarray(np.unique(eps), jnp.int32)

    vectors_j = jnp.asarray(vectors)
    new_index = VamanaIndex(
        vectors=vectors_j,
        adjacency=jnp.asarray(new_adj),
        medoid=approximate_medoid(vectors_j, metric=index.metric),
        metric=index.metric,
        entry_points=new_entries,
    )

    # refinement pass over (a fraction of) the nodes to restore quality
    if refine_fraction > 0:
        rng = np.random.default_rng(seed)
        n_refine = max(1, int(n_new * refine_fraction))
        order = rng.permutation(n_new)[:n_refine].astype(np.int32)
        wave = min(512, n_refine)
        pad = (-len(order)) % wave
        if pad:
            order = np.concatenate([order, order[:pad]])
        adjacency = new_index.adjacency
        for w in order.reshape(-1, wave):
            adjacency = wave_step(
                new_index.vectors, adjacency, new_index.medoid,
                jnp.asarray(w), jnp.asarray(alpha, jnp.float32),
                build_width=build_width,
                max_incoming=min(16, r), chunk=min(8192, wave * r),
                metric=index.metric,
            )
        new_index = VamanaIndex(
            vectors=new_index.vectors, adjacency=adjacency,
            medoid=new_index.medoid, metric=new_index.metric,
            entry_points=new_index.entry_points,
        )
    return new_index, old_to_new
