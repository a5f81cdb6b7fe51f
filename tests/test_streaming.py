"""Streaming-ingest tier tests (index/streaming.py): buffered inserts are
immediately searchable with exact scores, deletes tombstone either tier,
merges (insert-wave and rebuild paths) keep external ids stable, recall
holds through a full ingest cycle — the FreshDiskANN-style replacement
for the reference's per-point mutation (reference vamana_graph.py:58-230)."""

import numpy as np
import jax.numpy as jnp
import pytest

from diskrag_tpu.graph import build_vamana
from diskrag_tpu.index.streaming import StreamingIndex
from diskrag_tpu.ops import brute_force_topk


def _recall(ids, gt):
    return np.mean(
        [len(set(ids[i]) & set(gt[i])) / gt.shape[1] for i in range(len(ids))]
    )


def _make(pts, **kw):
    idx = build_vamana(pts, degree_bound=24, build_width=48, wave_size=256)
    return StreamingIndex(idx, **kw)


def test_auto_buffer_capacity(clustered_data):
    """Default-constructed StreamingIndex derives its buffer from the
    base size (VERDICT r3 #5): the measured 32768 optimum at >=131k
    bases, shrinking for small collections; explicit override wins."""
    from diskrag_tpu.index.streaming import auto_buffer_capacity

    assert auto_buffer_capacity(200_000) == 32_768
    assert auto_buffer_capacity(1_000_000) == 32_768
    assert auto_buffer_capacity(131_072) == 32_768
    assert auto_buffer_capacity(50_000) == 16_384
    assert auto_buffer_capacity(2_000) == 4_096
    s = _make(clustered_data[:1800])
    assert s.capacity == 4_096  # auto for a 1800-row base
    s2 = _make(clustered_data[:1800], buffer_capacity=256)
    assert s2.capacity == 256  # explicit override honored


def test_insert_immediately_searchable(clustered_data):
    base, extra = clustered_data[:1800], clustered_data[1800:]
    s = _make(base)
    ids = s.insert(extra)
    assert list(ids) == list(range(1800, 2000))
    assert s.n_buffered == 200

    # buffered points are scanned exactly: searching for them finds them
    got, dists = s.search(extra[:32], k=1, search_width=32)
    assert np.mean(np.asarray(got)[:, 0] == ids[:32]) == 1.0
    assert float(np.max(np.asarray(dists)[:, 0])) < 1e-3


def test_search_merges_tiers(clustered_data, rng):
    base, extra = clustered_data[:1600], clustered_data[1600:]
    s = _make(base)
    s.insert(extra)
    q = clustered_data[rng.integers(0, 2000, 64)] + rng.normal(
        size=(64, base.shape[1])
    ).astype(np.float32) * 0.05
    got, _ = s.search(q, k=10, search_width=48)
    _, gt = brute_force_topk(jnp.asarray(q), jnp.asarray(clustered_data), k=10)
    rec = _recall(np.asarray(got), np.asarray(gt))
    assert rec >= 0.95, f"merged-tier recall {rec:.3f}"


def test_delete_both_tiers(clustered_data):
    base, extra = clustered_data[:1800], clustered_data[1800:]
    s = _make(base)
    ids = s.insert(extra)
    # delete one buffered point and one graph point, then search for them
    s.delete([int(ids[0]), 7])
    got, _ = s.search(
        np.stack([extra[0], base[7]]), k=5, search_width=48
    )
    got = np.asarray(got)
    assert int(ids[0]) not in got[0]
    assert 7 not in got[1]


@pytest.mark.parametrize("mm", ["knn", "wave"])
def test_merge_insert_wave_path(clustered_data, mm):
    base, extra = clustered_data[:1800], clustered_data[1800:]
    s = _make(base, merge_insert_max_fraction=0.5, merge_method=mm)
    ids = s.insert(extra)
    s.merge()
    assert s.n_buffered == 0 and s.n_merges == 1
    assert s.n_graph == 2000
    # external ids survive the merge
    got, dists = s.search(extra[:32], k=1, search_width=48)
    frac = np.mean(np.asarray(got)[:, 0] == ids[:32])
    assert frac >= 0.9, f"post-merge self-retrieval {frac:.2f}"


def test_merge_rebuild_path(clustered_data):
    base, extra = clustered_data[:1600], clustered_data[1600:]
    s = _make(base, merge_insert_max_fraction=0.01)  # force rebuild
    ids = s.insert(extra)
    s.delete([3, 5])  # graph tombstones are dropped by the rebuild
    s.merge()
    assert s.n_graph == 1600 + 400 - 2
    got, _ = s.search(extra[:32], k=1, search_width=48)
    frac = np.mean(np.asarray(got)[:, 0] == ids[:32])
    assert frac >= 0.9, f"post-rebuild self-retrieval {frac:.2f}"
    # deleted graph points stay gone
    got, _ = s.search(np.stack([base[3], base[5]]), k=5, search_width=48)
    got = np.asarray(got)
    assert 3 not in got[0] and 5 not in got[1]


def test_auto_merge_on_overflow(clustered_data):
    base = clustered_data[:1600]
    s = _make(base, buffer_capacity=256, merge_insert_max_fraction=0.5)
    for lo in range(1600, 2000, 100):
        s.insert(clustered_data[lo : lo + 100])
    assert s.n_merges >= 1
    assert s.n_graph + s.n_buffered == 2000
    got, _ = s.search(clustered_data[1900:1932], k=1, search_width=48)
    frac = np.mean(np.asarray(got)[:, 0] == np.arange(1900, 1932))
    assert frac >= 0.9


def test_oversized_batch_goes_straight_to_graph(clustered_data):
    base, extra = clustered_data[:1500], clustered_data[1500:]
    s = _make(base, buffer_capacity=128, merge_insert_max_fraction=0.5)
    ids = s.insert(extra)  # 500 > capacity
    assert s.n_buffered == 0
    assert s.n_graph == 2000
    got, _ = s.search(extra[:32], k=1, search_width=48)
    assert np.mean(np.asarray(got)[:, 0] == ids[:32]) >= 0.9


def test_consolidate_compacts_tombstones(clustered_data):
    base, extra = clustered_data[:1800], clustered_data[1800:]
    s = _make(base, merge_insert_max_fraction=0.5)
    s.insert(extra)
    dead = list(range(0, 100))
    s.delete(dead)
    s.consolidate()
    assert s.n_graph == 1900
    assert s._n_deleted == 0
    # survivors keep their external ids
    got, _ = s.search(base[150:182], k=1, search_width=48)
    frac = np.mean(np.asarray(got)[:, 0] == np.arange(150, 182))
    assert frac >= 0.9
    # deleted are unfindable
    got, _ = s.search(base[:8], k=3, search_width=48)
    assert not np.isin(np.asarray(got), np.arange(100)).any()


@pytest.mark.parametrize("mm", ["knn", "wave"])
def test_recall_holds_during_ingest(clustered_data, rng, mm):
    """The VERDICT r1 gate: recall during ingest stays at the graph's
    operating point (buffered points are exact hits)."""
    base = clustered_data[:1500]
    s = _make(
        base, buffer_capacity=128, merge_insert_max_fraction=0.3,
        merge_method=mm,
    )
    q = clustered_data[rng.integers(0, 2000, 48)] + rng.normal(
        size=(48, base.shape[1])
    ).astype(np.float32) * 0.05
    recs = []
    for lo in range(1500, 2000, 100):
        s.insert(clustered_data[lo : lo + 100])
        live = clustered_data[: lo + 100]
        got, _ = s.search(q, k=10, search_width=48)
        _, gt = brute_force_topk(jnp.asarray(q), jnp.asarray(live), k=10)
        recs.append(_recall(np.asarray(got), np.asarray(gt)))
    assert min(recs) >= 0.95, f"ingest recall dipped to {min(recs):.3f}"


def test_knn_merge_cosine_masks_pad_rows(clustered_data):
    """The kNN merge's candidate scan sees the capacity-pad rows; under
    cosine they normalize to one identical unit vector (not 'far' like
    under L2), so the merge must mask candidates past the in-use
    watermark or new rows would link to pads."""
    data = clustered_data / np.linalg.norm(
        clustered_data, axis=1, keepdims=True
    )
    base, extra = data[:1800], data[1800:]
    idx = build_vamana(
        base, degree_bound=24, build_width=48, wave_size=256,
        metric="cosine",
    )
    s = StreamingIndex(idx, merge_insert_max_fraction=0.5,
                       merge_method="knn")
    ids = s.insert(extra)
    s.merge()
    adj = np.asarray(s.index.adjacency[: s.n_graph])
    assert adj.max() < s.n_graph, "merge linked into capacity-pad rows"
    got, _ = s.search(extra[:16], k=1, search_width=48)
    assert np.mean(np.asarray(got)[:, 0] == ids[:16]) >= 0.9


def test_delete_idempotent_and_live_count(clustered_data):
    """Regression: re-deleting an id must not double-count into
    n_total_live, and merge() must reclaim dead buffered slots (they
    vanish at merge instead of becoming graph tombstones)."""
    base, extra = clustered_data[:1800], clustered_data[1800:]
    s = _make(base)
    ids = s.insert(extra)  # 200 buffered
    n0 = s.n_total_live
    assert n0 == 2000

    s.delete([int(ids[0]), 7])
    assert s.n_total_live == n0 - 2
    # idempotent: same ids again, one buffered + one graph
    s.delete([int(ids[0]), 7])
    assert s.n_total_live == n0 - 2
    # unknown id still raises
    import pytest

    with pytest.raises(KeyError):
        s.delete([999_999])

    # merge folds dead buffered slots in as graph tombstones (static
    # merge shapes — see the module docstring): the live total holds
    s.delete([int(ids[1])])
    s.merge()
    assert s.n_total_live == n0 - 3
    assert s.n_buffered == 0
    # the folded tombstones stay idempotently deleted (no double count)
    s.delete([int(ids[0]), int(ids[1])])
    assert s.n_total_live == n0 - 3

    # consolidate compacts all three tombstones and the count holds
    s.consolidate()
    assert s.n_total_live == n0 - 3
    assert s.n_graph == n0 - 3


def test_reserve_inserts_prevents_growth(clustered_data):
    """reserve_inserts pads the adoption once; streaming that many rows
    must never trigger a mid-run growth event (growth = reallocation +
    fresh compiles of every jitted shape — the 1M ingest regression)."""
    base, extra = clustered_data[:1800], clustered_data[1800:]
    s = _make(base, buffer_capacity=64, reserve_inserts=len(extra))
    cap0 = s._graph_capacity
    assert cap0 >= s.n_graph + 64 + len(extra)
    for off in range(0, len(extra), 32):
        s.insert(extra[off : off + 32])
    s.merge()
    assert s._graph_capacity == cap0, "growth event fired despite reserve"
    assert s.n_graph == 2000

    # the runtime reserve() method grows once, then holds
    s2 = _make(base, buffer_capacity=64)
    s2.reserve(len(extra))
    cap1 = s2._graph_capacity
    for off in range(0, len(extra), 32):
        s2.insert(extra[off : off + 32])
    s2.merge()
    assert s2._graph_capacity == cap1


def test_delete_batch_with_unknown_id_is_side_effect_free(clustered_data):
    """ADVICE r2: a KeyError on a later id in a delete batch must not
    leave earlier ids half-deleted (marked in _deleted_ext but never
    tombstoned on device — a retried delete would then no-op forever
    through the idempotency skip while the rows keep serving)."""
    base, extra = clustered_data[:1800], clustered_data[1800:]
    s = _make(base)
    ids = s.insert(extra)
    n0 = s.n_total_live
    with pytest.raises(KeyError):
        s.delete([int(ids[0]), 7, 999_999])  # buffered, graph, unknown
    assert s.n_total_live == n0
    # the earlier ids in the failed batch are still live and servable
    got, _ = s.search(np.stack([extra[0], base[7]]), k=1, search_width=48)
    got = np.asarray(got)
    assert got[0, 0] == int(ids[0]) and got[1, 0] == 7
    # and a retried delete of them actually works
    assert s.delete([int(ids[0]), 7]) == 2
    assert s.n_total_live == n0 - 2


def test_delete_returns_newly_tombstoned_count(clustered_data):
    base, extra = clustered_data[:1800], clustered_data[1800:]
    s = _make(base)
    ids = s.insert(extra)
    assert s.delete([int(ids[0]), 7]) == 2
    # idempotent re-delete reports 0 new; mixed batch reports only new
    assert s.delete([int(ids[0]), 7]) == 0
    assert s.delete([int(ids[0]), 9]) == 1


def test_rows_compacted_flag(clustered_data):
    """ADVICE r2 (high): compaction (rebuild-path merge or consolidate
    dropping tombstones) breaks row == external-id alignment and must
    leave a sticky marker for flush_index to refuse on — _n_deleted
    returns to 0 and can't guard it."""
    base, extra = clustered_data[:1600], clustered_data[1600:]
    # rebuild path WITHOUT tombstones preserves row order: no flag
    s = _make(base, merge_insert_max_fraction=0.01)
    s.insert(extra)
    s.merge()
    assert not s.rows_compacted

    # rebuild path WITH tombstones drops rows: sticky flag, counter at 0
    s = _make(base, merge_insert_max_fraction=0.01)
    s.insert(extra)
    s.delete([3, 5])
    s.merge()
    assert s._n_deleted == 0
    assert s.rows_compacted

    # consolidate also compacts
    s2 = _make(base, merge_insert_max_fraction=0.5)
    s2.insert(extra)
    s2.delete([3])
    s2.consolidate()
    assert s2._n_deleted == 0
    assert s2.rows_compacted
