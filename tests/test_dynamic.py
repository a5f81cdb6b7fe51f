"""Dynamic index op tests: batched insert, tombstone delete + filtering,
consolidation with id remap — reference vamana_graph.py:58-230 semantics."""

import numpy as np
import jax.numpy as jnp

from diskrag_tpu.graph import beam_search, build_vamana
from diskrag_tpu.graph.dynamic import (
    consolidate,
    delete_points,
    filter_deleted,
    insert_points,
    make_deleted_mask,
)
from diskrag_tpu.ops import brute_force_topk


def _recall(ids, gt):
    return np.mean(
        [len(set(ids[i]) & set(gt[i])) / gt.shape[1] for i in range(len(ids))]
    )


def test_insert_points_searchable(clustered_data):
    pts = clustered_data
    base, extra = pts[:1800], pts[1800:]
    idx = build_vamana(base, degree_bound=24, build_width=48, wave_size=256)
    idx2 = insert_points(idx, extra, build_width=48)
    assert idx2.n_points == 2000

    # inserted points must be findable as their own nearest neighbor
    q = jnp.asarray(extra[:32])
    res = beam_search(
        idx2.vectors, idx2.adjacency, idx2.medoid, q, search_width=48, k=10
    )
    found_self = np.mean(
        np.asarray(res.ids)[:, 0] == (1800 + np.arange(32))
    )
    assert found_self >= 0.9, f"only {found_self:.2f} inserted points find themselves"

    # overall recall on the grown index
    rng = np.random.default_rng(0)
    qi = rng.integers(0, 2000, size=64)
    queries = pts[qi] + rng.normal(size=(64, pts.shape[1])).astype(np.float32) * 0.1
    res = beam_search(
        idx2.vectors, idx2.adjacency, idx2.medoid, jnp.asarray(queries),
        search_width=48, k=10,
    )
    _, gt = brute_force_topk(jnp.asarray(queries), idx2.vectors, k=10)
    assert _recall(np.asarray(res.ids), np.asarray(gt)) >= 0.9


def test_delete_and_filter(clustered_data):
    pts = clustered_data[:1000]
    idx = build_vamana(pts, degree_bound=24, build_width=48, wave_size=256)
    mask = make_deleted_mask(1000)
    dead = [3, 77, 500]
    mask = delete_points(mask, dead)

    q = jnp.asarray(pts[dead])  # query exactly at deleted points
    res = beam_search(
        idx.vectors, idx.adjacency, idx.medoid, q, search_width=48, k=20
    )
    ids, dists = filter_deleted(res.ids, res.dists, mask, k=5)
    ids = np.asarray(ids)
    assert not np.isin(ids, dead).any(), "tombstoned ids leaked into results"
    assert (ids[:, 0] >= 0).all()


def test_consolidate_keeps_metric_for_medoid(clustered_data):
    """Regression: consolidate() recomputed the medoid without the
    index's metric, so cosine indexes with heterogeneous norms got an
    L2-chosen (norm-biased) entry point after compaction."""
    from diskrag_tpu.ops.medoid import approximate_medoid

    rng = np.random.default_rng(2)
    pts = clustered_data[:600].copy()
    # wildly varying norms so L2 and cosine medoids disagree
    pts *= rng.uniform(0.01, 100.0, size=(600, 1)).astype(np.float32)
    idx = build_vamana(
        pts, degree_bound=24, build_width=48, wave_size=256, metric="cosine"
    )
    mask = delete_points(make_deleted_mask(600), [5, 10])
    new_idx, _ = consolidate(idx, mask, refine_fraction=0.0)
    assert new_idx.metric == "cosine"
    want = int(approximate_medoid(new_idx.vectors, metric="cosine"))
    assert int(new_idx.medoid) == want


def test_consolidate_remaps_and_recalls(clustered_data):
    pts = clustered_data[:1000]
    idx = build_vamana(pts, degree_bound=24, build_width=48, wave_size=256)
    rng = np.random.default_rng(1)
    dead = rng.choice(1000, size=200, replace=False)
    mask = delete_points(make_deleted_mask(1000), dead)

    new_idx, old_to_new = consolidate(idx, mask, refine_fraction=0.5)
    assert new_idx.n_points == 800
    assert (old_to_new[dead] == -1).all()
    kept = np.setdiff1d(np.arange(1000), dead)
    assert (old_to_new[kept] >= 0).all()
    # vectors moved consistently
    np.testing.assert_array_equal(
        np.asarray(new_idx.vectors[old_to_new[kept[0]]]), pts[kept[0]]
    )

    # recall on the compacted index
    qi = rng.choice(kept, size=64)
    queries = pts[qi] + rng.normal(size=(64, pts.shape[1])).astype(np.float32) * 0.1
    res = beam_search(
        new_idx.vectors, new_idx.adjacency, new_idx.medoid,
        jnp.asarray(queries), search_width=48, k=10,
    )
    _, gt = brute_force_topk(jnp.asarray(queries), new_idx.vectors, k=10)
    rec = _recall(np.asarray(res.ids), np.asarray(gt))
    assert rec >= 0.9, f"post-consolidation recall {rec}"
