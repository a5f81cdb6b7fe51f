"""Persistence round-trip tests — the equivalent of the reference's
test_disk_write_verify.py (build, save, size check, read-back, compare)."""

import json

import numpy as np
import jax.numpy as jnp

from diskrag_tpu.graph import build_vamana, beam_search, beam_search_pq
from diskrag_tpu.index import (
    load_index,
    read_compat_records,
    save_index,
    write_compat_records,
)
from diskrag_tpu.pq import ProductQuantizer


def _small_index(rng, n=300, d=16):
    pts = rng.normal(size=(n, d)).astype(np.float32)
    return build_vamana(pts, degree_bound=8, build_width=16, alpha=1.2,
                        wave_size=64)


def test_save_load_roundtrip(tmp_path, rng):
    idx = _small_index(rng)
    meta = save_index(tmp_path / "index", idx, meta_extra={"L": 16, "alpha": 1.2})
    idx2, pq, codes, meta2 = load_index(tmp_path / "index")
    assert pq is None and codes is None
    assert meta2["num_points"] == idx.n_points
    assert meta2["L"] == 16
    np.testing.assert_array_equal(
        np.asarray(idx.adjacency), np.asarray(idx2.adjacency)
    )
    np.testing.assert_array_equal(
        np.asarray(idx.vectors), np.asarray(idx2.vectors)
    )
    assert int(idx2.medoid) == int(idx.medoid)


def test_save_load_with_pq(tmp_path, rng):
    n, d = 1100, 16
    pts = rng.normal(size=(n, d)).astype(np.float32)
    idx = build_vamana(pts, degree_bound=8, build_width=16, wave_size=128)
    pq = ProductQuantizer(n_subvectors=4).fit(pts)
    codes = np.asarray(pq.encode(pts))
    save_index(tmp_path / "i", idx, pq=pq, pq_codes=codes)
    idx2, pq2, codes2, meta = load_index(tmp_path / "i")
    assert meta["use_pq"] and meta["n_subvectors"] == 4
    np.testing.assert_array_equal(codes, codes2)
    np.testing.assert_allclose(
        np.asarray(pq.codebooks), np.asarray(pq2.codebooks)
    )


def test_compat_records_roundtrip(tmp_path, rng):
    idx = _small_index(rng)
    vecs = np.asarray(idx.vectors)
    adj = np.asarray(idx.adjacency)
    path = tmp_path / "index.dat"
    rec_size = write_compat_records(path, vecs, adj)
    n, d = vecs.shape
    r = adj.shape[1]
    # size formula check, as in reference test_disk_write_verify.py:74-83
    assert rec_size == 4 * (d + r)
    assert path.stat().st_size == n * rec_size
    v2, a2 = read_compat_records(path, n, d, r)
    np.testing.assert_array_equal(vecs, v2)
    np.testing.assert_array_equal(adj, a2)


def test_pq_search_recall_after_reload(tmp_path, clustered_data):
    pts = clustered_data
    rng = np.random.default_rng(5)
    idx = build_vamana(pts, degree_bound=32, build_width=64, wave_size=256,
                       seed=11)
    pq = ProductQuantizer(n_subvectors=16).fit(pts)
    codes = np.asarray(pq.encode(pts))
    save_index(tmp_path / "x", idx, pq=pq, pq_codes=codes)
    idx2, pq2, codes2, _ = load_index(tmp_path / "x")

    qi = rng.integers(0, len(pts), size=64)
    queries = pts[qi] + rng.normal(size=(64, pts.shape[1])).astype(np.float32) * 0.1
    tables = pq2.compute_distance_tables(queries)
    res = beam_search_pq(
        jnp.asarray(codes2), tables, idx2.adjacency, idx2.medoid,
        search_width=64, k=10, rerank=True,
        vectors=idx2.vectors, queries=jnp.asarray(queries),
    )
    from diskrag_tpu.ops import brute_force_topk

    _, gt = brute_force_topk(jnp.asarray(queries), idx2.vectors, k=10)
    got, want = np.asarray(res.ids), np.asarray(gt)
    recall = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(len(got))]
    )
    assert recall >= 0.85, f"PQ-path recall@10 = {recall}"
