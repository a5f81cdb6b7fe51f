"""Host-tier (disk-style) index tests: codes in 'HBM', vectors served
from the packed record file, recall checked against brute force."""

import numpy as np
import jax.numpy as jnp
import pytest

from diskrag_tpu.build_index import build_index_from_vectors
from diskrag_tpu.index.host_tier import HostTierIndex
from diskrag_tpu.ops import brute_force_topk


def test_host_tier_search_recall(tmp_path, clustered_data):
    pts = clustered_data  # [2000, 64]
    rng = np.random.default_rng(9)
    build_index_from_vectors(
        pts, tmp_path / "idx", write_compat=True,
        params_override={"R": 32, "L": 64, "alpha": 1.2},
    )
    ht = HostTierIndex.from_store(tmp_path / "idx")
    qi = rng.integers(0, len(pts), size=32)
    queries = pts[qi] + rng.normal(size=(32, pts.shape[1])).astype(np.float32) * 0.1
    dists, ids, stats = ht.search(queries, search_width=64, k=10)
    assert stats["search_type"] == "host_tier"
    assert stats["host_vectors_fetched"] > 0

    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)
    recall = np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))])
    assert recall >= 0.85, f"host-tier recall@10 = {recall}"
    # exact rerank: distances ascending and match recomputed values
    assert (np.diff(dists, axis=1) >= -1e-5).all()
    d0 = ((queries[0] - pts[ids[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(dists[0, 0], d0, rtol=1e-3, atol=1e-3)


def test_host_tier_bf16_mode(tmp_path, clustered_data):
    """bf16 traversal mode: bf16 vectors in HBM guide the search, host
    f32 rerank restores exact ordering — near-exact recall without PQ."""
    pts = clustered_data
    rng = np.random.default_rng(10)
    build_index_from_vectors(
        pts, tmp_path / "idx", write_compat=True,
        params_override={"R": 32, "L": 64, "alpha": 1.2},
    )
    ht = HostTierIndex.from_store(tmp_path / "idx", mode="bf16")
    assert ht.mode == "bf16" and ht.vectors_bf16 is not None and ht.pq is None
    qi = rng.integers(0, len(pts), size=32)
    queries = pts[qi] + rng.normal(size=(32, pts.shape[1])).astype(np.float32) * 0.1
    dists, ids, stats = ht.search(queries, search_width=64, k=10, expand_width=8)
    assert stats["mode"] == "bf16"
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)
    recall = np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))])
    assert recall >= 0.95, f"bf16 host-tier recall@10 = {recall}"
    # no duplicate results
    for row in ids:
        valid = row[row >= 0]
        assert len(np.unique(valid)) == len(valid)


def test_host_tier_pipelined_matches_sequential(tmp_path, clustered_data):
    """search_pipelined must return exactly what search() returns —
    including a padded non-multiple last chunk — while chunking the
    device/host overlap."""
    pts = clustered_data
    rng = np.random.default_rng(11)
    build_index_from_vectors(
        pts, tmp_path / "idx", write_compat=True,
        params_override={"R": 32, "L": 64, "alpha": 1.2},
    )
    ht = HostTierIndex.from_store(tmp_path / "idx", mode="bf16")
    qi = rng.integers(0, len(pts), size=50)
    queries = pts[qi] + rng.normal(size=(50, pts.shape[1])).astype(np.float32) * 0.1
    d_seq, i_seq, _ = ht.search(queries, search_width=48, k=10, expand_width=4)
    # 50 queries / chunk 16 -> 4 chunks, last one padded
    d_pip, i_pip, stats = ht.search_pipelined(
        queries, search_width=48, k=10, chunk=16, expand_width=4
    )
    assert stats["pipelined_chunks"] == 4
    assert stats["nodes_visited"] > 0
    np.testing.assert_array_equal(i_pip, i_seq)
    np.testing.assert_allclose(d_pip, d_seq, rtol=1e-5, atol=1e-5)
    # small-batch fall-through: identical API, no chunking
    d1, i1, s1 = ht.search_pipelined(queries[:8], search_width=48, k=10)
    assert "pipelined_chunks" not in s1
    np.testing.assert_array_equal(i1, i_seq[:8])


def test_host_tier_iq_mode(tmp_path, clustered_data):
    """IntQuantizer artifacts serve the host tier via the iq traversal
    (int8 rows in HBM, exact host rerank): auto mode picks it, the ADC
    path still refuses the row format, and recall matches bf16's."""
    pts = clustered_data
    build_index_from_vectors(
        pts, tmp_path / "idx", write_compat=True,
        pq_kind="int8",
        params_override={"R": 32, "L": 64, "alpha": 1.2},
    )
    ht = HostTierIndex.from_store(tmp_path / "idx")
    assert ht.mode == "iq"
    with pytest.raises(ValueError, match="cannot score"):
        HostTierIndex.from_store(tmp_path / "idx", mode="pq")

    rng = np.random.default_rng(9)
    qi = rng.integers(0, len(pts), size=32)
    queries = (
        pts[qi]
        + rng.normal(size=(32, pts.shape[1])).astype(np.float32) * 0.1
    )
    dists, ids, stats = ht.search(queries, search_width=64, k=10)
    assert stats["mode"] == "iq"
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))]
    )
    assert recall >= 0.85, f"host-tier iq recall@10 = {recall}"


def test_host_tier_rejects_stale_pq_aux(tmp_path, clustered_data):
    """Regression: a stale/torn pq_aux.npz (length != code rows) must
    fail loudly at bring-up — device gathers clamp out-of-bounds indices,
    so serving it would silently corrupt traversal distances."""
    from diskrag_tpu.index.persist import IndexStore, load_pq_aux

    build_index_from_vectors(
        clustered_data, tmp_path / "idx", write_compat=True,
        pq_kind="residual",
        params_override={"R": 32, "L": 64, "alpha": 1.2},
    )
    store = IndexStore(tmp_path / "idx")
    with np.load(store.pq_aux_path) as z:
        cells, bias = z["point_cell"], z["point_bias"]
    np.savez(store.pq_aux_path, point_cell=cells[:100], point_bias=bias[:100])
    with pytest.raises(ValueError, match="stale"):
        load_pq_aux(store, expect_n=len(clustered_data))
    with pytest.raises(ValueError, match="stale"):
        HostTierIndex.from_store(tmp_path / "idx", mode="pq")
