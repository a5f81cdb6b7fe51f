"""Multi-chip sharded index tests on the emulated 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from diskrag_tpu.ops import brute_force_topk
from diskrag_tpu.parallel import (
    build_sharded,
    make_mesh,
    shard_to_mesh,
    sharded_search,
)


def test_mesh_shape():
    mesh = make_mesh(n_shards=4, n_data=2)
    assert mesh.shape["data"] == 2 and mesh.shape["shard"] == 4


import pytest


@pytest.mark.parametrize("build_method", ["knn", "wave"])
def test_sharded_search_recall(clustered_data, build_method):
    pts = clustered_data  # [2000, 64]
    rng = np.random.default_rng(3)
    sharded = build_sharded(
        pts, n_shards=4, degree_bound=24, build_width=48, wave_size=128,
        build_method=build_method,
    )
    # knn builds carry per-shard entry points (500-point shards -> ~7 seeds)
    assert (sharded.entry_points is not None) == (build_method == "knn")
    # padding rows only in the last shard; global ids cover all points
    gids = np.asarray(sharded.global_ids)
    valid = gids[gids >= 0]
    assert len(np.unique(valid)) == len(pts)

    mesh = make_mesh(n_shards=4, n_data=2)
    sharded = shard_to_mesh(sharded, mesh)
    qi = rng.integers(0, len(pts), size=64)
    queries = pts[qi] + rng.normal(size=(64, pts.shape[1])).astype(np.float32) * 0.1
    ids, dists = sharded_search(
        sharded, queries, mesh, search_width=48, k=10
    )
    ids = np.asarray(ids)
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))]
    )
    assert recall >= 0.9, f"sharded recall@10 = {recall}"
    # merged dists ascending
    assert (np.diff(np.asarray(dists), axis=1) >= -1e-6).all()


def test_sharded_flat_search(clustered_data):
    from diskrag_tpu.parallel import sharded_flat_search
    from jax.sharding import NamedSharding, PartitionSpec as P

    pts = clustered_data  # [2000, 64]
    rng = np.random.default_rng(4)
    s, ns = 4, 500
    perm = rng.permutation(2000)
    gids = perm.reshape(s, ns).astype(np.int32)
    vecs = pts[gids]  # [S, Ns, D]
    norms = (vecs.astype(np.float64) ** 2).sum(-1).astype(np.float32)

    mesh = make_mesh(n_shards=4, n_data=2)
    spec3 = NamedSharding(mesh, P("shard", None, None))
    spec2 = NamedSharding(mesh, P("shard", None))
    v = jax.device_put(jnp.asarray(vecs, jnp.bfloat16), spec3)
    nn = jax.device_put(jnp.asarray(norms), spec2)
    g = jax.device_put(jnp.asarray(gids), spec2)

    qi = rng.integers(0, 2000, size=32)
    queries = pts[qi] + rng.normal(size=(32, 64)).astype(np.float32) * 0.1
    ids, dists = sharded_flat_search(v, nn, g, queries, mesh, k=10)
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    ids, gt = np.asarray(ids), np.asarray(gt)
    recall = np.mean([len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))])
    assert recall >= 0.95, f"sharded flat recall {recall}"


def test_sharded_search_with_padding_exact(clustered_data):
    """Regression guard: N % n_shards != 0 wrap-pads the last shard with
    gid=-1 duplicate rows; queries sitting exactly on the duplicated
    points must still get the exact brute-force top-k (pad rows may
    occupy local result slots but must never cost a merged candidate)."""
    from diskrag_tpu.parallel import sharded_flat_search
    from jax.sharding import NamedSharding, PartitionSpec as P

    pts = clustered_data[:1995]  # 4 shards -> per=499, pad=1
    sharded = build_sharded(pts, n_shards=4, degree_bound=16)
    gids = np.asarray(sharded.global_ids)
    assert (gids < 0).sum() == 1  # one wrap-pad row in the last shard

    mesh = make_mesh(n_shards=4, n_data=2)
    placed = shard_to_mesh(sharded, mesh)
    # query exactly at the duplicated point (and one other real point)
    dup_gid = gids[-1, -2]  # neighbor of the pad row, some last-shard point
    wrapped_gid = int(np.asarray(sharded.global_ids)[0, 0])  # pad source
    queries = pts[[wrapped_gid, int(dup_gid)]]

    spec3 = NamedSharding(mesh, P("shard", None, None))
    spec2 = NamedSharding(mesh, P("shard", None))
    vecs = np.asarray(sharded.vectors)
    norms = (vecs.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    ids, dists = sharded_flat_search(
        jax.device_put(jnp.asarray(vecs, jnp.bfloat16), spec3),
        jax.device_put(jnp.asarray(norms), spec2),
        jax.device_put(jnp.asarray(gids), spec2),
        queries, mesh, k=8,
    )
    ids = np.asarray(ids)
    assert (ids >= 0).all(), "pad rows leaked into merged results"
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=8)
    gt = np.asarray(gt)
    # the self-match must be rank 0 and the candidate sets must agree
    assert ids[0, 0] == wrapped_gid and ids[1, 0] == dup_gid
    for i in range(len(queries)):
        assert len(set(ids[i]) & set(gt[i])) >= 7  # bf16 boundary ties


def test_sharded_host_tier(clustered_data, tmp_path):
    """Configs 4+5 combined: per-shard bf16 traversal in HBM, one host
    rerank over the all-gathered pools against the f32 record file."""
    from diskrag_tpu.index.persist import write_compat_records
    from diskrag_tpu.native import RecordReader
    from diskrag_tpu.parallel.host_tier import ShardedHostTier

    pts = clustered_data  # [2000, 64]
    rng = np.random.default_rng(5)
    sharded = build_sharded(pts, n_shards=4, degree_bound=24)
    mesh = make_mesh(n_shards=4, n_data=2)

    # vector-only record file (r=0): the host tier reranks, it does not
    # traverse from the file
    path = tmp_path / "vectors.dat"
    write_compat_records(path, pts, np.empty((len(pts), 0), np.int32))
    reader = RecordReader(path, len(pts), pts.shape[1], 0)

    ht = ShardedHostTier.from_sharded_index(sharded, reader, mesh)
    qi = rng.integers(0, len(pts), size=64)
    queries = pts[qi] + rng.normal(size=(64, pts.shape[1])).astype(np.float32) * 0.1
    dists, ids, stats = ht.search(queries, search_width=32, k=10)
    assert stats["search_type"] == "sharded_host_tier"
    assert stats["n_shards"] == 4
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))]
    )
    assert recall >= 0.9, f"sharded host-tier recall@10 = {recall}"
    # exact rerank: distances ascending and correct vs direct computation
    d0 = ((queries[0] - pts[ids[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(dists[0, 0], d0, rtol=1e-3)


def test_sharded_host_tier_pipelined(clustered_data, tmp_path):
    """Pipelined sharded host tier must match the sequential path
    exactly, including the padded last chunk."""
    from diskrag_tpu.index.persist import write_compat_records
    from diskrag_tpu.native import RecordReader
    from diskrag_tpu.parallel.host_tier import ShardedHostTier

    pts = clustered_data
    rng = np.random.default_rng(6)
    sharded = build_sharded(pts, n_shards=4, degree_bound=24)
    mesh = make_mesh(n_shards=4, n_data=2)
    path = tmp_path / "vectors.dat"
    write_compat_records(path, pts, np.empty((len(pts), 0), np.int32))
    reader = RecordReader(path, len(pts), pts.shape[1], 0)
    ht = ShardedHostTier.from_sharded_index(sharded, reader, mesh)

    qi = rng.integers(0, len(pts), size=50)
    queries = pts[qi] + rng.normal(size=(50, pts.shape[1])).astype(np.float32) * 0.1
    d_seq, i_seq, _ = ht.search(queries, search_width=32, k=10)
    d_pip, i_pip, stats = ht.search_pipelined(
        queries, search_width=32, k=10, chunk=16
    )
    assert stats["pipelined_chunks"] == 4
    np.testing.assert_array_equal(i_pip, i_seq)
    np.testing.assert_allclose(d_pip, d_seq, rtol=1e-5, atol=1e-5)


def test_sharded_save_load_roundtrip(clustered_data, tmp_path):
    """save_sharded_index/load_sharded_index: identical arrays and
    identical search results after a restart, including mesh placement."""
    from diskrag_tpu.parallel import load_sharded_index, save_sharded_index

    pts = clustered_data
    rng = np.random.default_rng(9)
    sharded = build_sharded(pts, n_shards=4, degree_bound=24)
    save_sharded_index(sharded, tmp_path / "sharded")
    # atomic writes leave no .tmp droppings
    assert not list((tmp_path / "sharded").glob("*.tmp"))

    mesh = make_mesh(n_shards=4, n_data=2)
    loaded = load_sharded_index(tmp_path / "sharded", mesh=mesh)
    assert loaded.metric == sharded.metric
    np.testing.assert_array_equal(
        np.asarray(loaded.adjacency), np.asarray(sharded.adjacency)
    )
    np.testing.assert_array_equal(
        np.asarray(loaded.global_ids), np.asarray(sharded.global_ids)
    )
    if sharded.entry_points is not None:
        np.testing.assert_array_equal(
            np.asarray(loaded.entry_points), np.asarray(sharded.entry_points)
        )

    queries = pts[rng.integers(0, len(pts), size=32)]
    placed = shard_to_mesh(sharded, mesh)
    i0, d0 = sharded_search(placed, queries, mesh, search_width=32, k=10)
    i1, d1 = sharded_search(loaded, queries, mesh, search_width=32, k=10)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i0))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d0), rtol=1e-6)


def test_load_sharded_index_bad_format(tmp_path):
    import json as _json

    from diskrag_tpu.parallel import load_sharded_index

    d = tmp_path / "sharded"
    d.mkdir()
    (d / "sharded_meta.json").write_text(_json.dumps({"format": "bogus"}))
    import pytest as _pytest

    with _pytest.raises(ValueError, match="unsupported sharded index format"):
        load_sharded_index(d)


def test_sharded_host_tier_pq_mode(clustered_data, tmp_path):
    """PQ traversal mode of the sharded host tier: uint8 codes/shard
    guide the traversal, exact host rerank restores true distances."""
    from diskrag_tpu.index.persist import write_compat_records
    from diskrag_tpu.native import RecordReader
    from diskrag_tpu.parallel.host_tier import ShardedHostTier
    from diskrag_tpu.pq import ProductQuantizer

    pts = clustered_data
    rng = np.random.default_rng(11)
    sharded = build_sharded(pts, n_shards=4, degree_bound=24)
    mesh = make_mesh(n_shards=4, n_data=2)
    path = tmp_path / "vectors.dat"
    write_compat_records(path, pts, np.empty((len(pts), 0), np.int32))
    reader = RecordReader(path, len(pts), pts.shape[1], 0)

    pq = ProductQuantizer(n_subvectors=8).fit(pts, seed=0)
    codes = np.asarray(pq.encode(pts))
    ht = ShardedHostTier.from_sharded_index(
        sharded, reader, mesh, mode="pq", pq=pq, codes=codes
    )
    assert ht.mode == "pq" and ht.vectors_bf16 is None
    assert ht.codes.shape[0] == 4 and ht.codes.dtype == jnp.uint8

    qi = rng.integers(0, len(pts), size=50)
    queries = pts[qi] + rng.normal(size=(50, pts.shape[1])).astype(np.float32) * 0.1
    dists, ids, stats = ht.search(queries, search_width=48, k=10)
    assert stats["mode"] == "pq"
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))]
    )
    assert recall >= 0.8, f"pq sharded host-tier recall@10 = {recall}"
    # rerank is exact regardless of the ADC traversal
    d0 = ((queries[0] - pts[ids[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(dists[0, 0], d0, rtol=1e-3)
    # pipelined path matches
    d_pip, i_pip, pstats = ht.search_pipelined(
        queries, search_width=48, k=10, chunk=16
    )
    assert pstats["mode"] == "pq"
    np.testing.assert_array_equal(i_pip, ids)


def test_sharded_host_tier_iq_mode(clustered_data, tmp_path):
    """iq traversal mode of the sharded host tier: IntQuantizer int8
    rows/shard guide the traversal (MXU-scored, near-exact ordering),
    exact host rerank restores true distances."""
    from diskrag_tpu.index.persist import write_compat_records
    from diskrag_tpu.native import RecordReader
    from diskrag_tpu.parallel.host_tier import ShardedHostTier
    from diskrag_tpu.pq import IntQuantizer

    pts = clustered_data
    rng = np.random.default_rng(11)
    sharded = build_sharded(pts, n_shards=4, degree_bound=24)
    mesh = make_mesh(n_shards=4, n_data=2)
    path = tmp_path / "vectors.dat"
    write_compat_records(path, pts, np.empty((len(pts), 0), np.int32))
    reader = RecordReader(path, len(pts), pts.shape[1], 0)

    iq = IntQuantizer(bits=8).fit(pts, seed=0)
    rows = np.asarray(iq.encode(pts))
    ht = ShardedHostTier.from_sharded_index(
        sharded, reader, mesh, mode="iq", pq=iq, codes=rows
    )
    assert ht.mode == "iq" and ht.vectors_bf16 is None
    assert ht.codes.shape[0] == 4 and ht.codes.dtype == jnp.int8

    qi = rng.integers(0, len(pts), size=50)
    queries = (
        pts[qi] + rng.normal(size=(50, pts.shape[1])).astype(np.float32) * 0.1
    )
    dists, ids, stats = ht.search(queries, search_width=48, k=10)
    assert stats["mode"] == "iq"
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))]
    )
    # int8 ordering is near-exact: expect the bf16-mode recall band,
    # not the ADC one
    assert recall >= 0.9, f"iq sharded host-tier recall@10 = {recall}"
    d0 = ((queries[0] - pts[ids[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(dists[0, 0], d0, rtol=1e-3)


def test_sharded_save_load_without_entry_points(clustered_data, tmp_path):
    """Wave-built shards carry no entry points; the artifact round-trip
    must preserve that (has_entry_points=False path)."""
    from diskrag_tpu.parallel import load_sharded_index, save_sharded_index

    pts = clustered_data[:800]
    sharded = build_sharded(
        pts, n_shards=2, degree_bound=16, build_width=32, wave_size=128,
        build_method="wave",
    )
    assert sharded.entry_points is None
    save_sharded_index(sharded, tmp_path / "s")
    loaded = load_sharded_index(tmp_path / "s")
    assert loaded.entry_points is None
    np.testing.assert_array_equal(
        np.asarray(loaded.adjacency), np.asarray(sharded.adjacency)
    )


def test_sharded_large_k_tiny_shards(clustered_data):
    """Regression: k larger than a shard's point count (kk clamps to ns)
    must pad local lists back to k, not crash top_k — both the graph
    and the flat sharded paths."""
    from diskrag_tpu.parallel import sharded_flat_search
    from jax.sharding import NamedSharding, PartitionSpec as P

    pts = clustered_data[:100]  # 8 shards -> 13 points/shard < k=16
    k = 16
    sharded = build_sharded(pts, n_shards=8, degree_bound=8)
    mesh = make_mesh(n_shards=8, n_data=1)
    placed = shard_to_mesh(sharded, mesh)
    queries = pts[:5]
    ids, dists = sharded_search(placed, queries, mesh, search_width=32, k=k)
    ids, dists = np.asarray(ids), np.asarray(dists)
    assert ids.shape == (5, k) and (ids[:, 0] == np.arange(5)).all()
    assert (np.diff(dists, axis=1) >= -1e-6).all()

    gids = np.asarray(sharded.global_ids)
    vecs = np.asarray(sharded.vectors)
    norms = (vecs.astype(np.float64) ** 2).sum(-1).astype(np.float32)
    spec3 = NamedSharding(mesh, P("shard", None, None))
    spec2 = NamedSharding(mesh, P("shard", None))
    fids, fdists = sharded_flat_search(
        jax.device_put(jnp.asarray(vecs, jnp.bfloat16), spec3),
        jax.device_put(jnp.asarray(norms), spec2),
        jax.device_put(jnp.asarray(gids), spec2),
        queries, mesh, k=k,
    )
    fids = np.asarray(fids)
    assert fids.shape == (5, k) and (fids[:, 0] == np.arange(5)).all()
    # exhaustive scan with k=16 over 100 real points: all ids valid+unique
    for row in fids:
        assert len(set(row[row >= 0])) == (row >= 0).sum()


def test_sharded_host_tier_residual_pq_mode(clustered_data, tmp_path):
    """Residual-PQ traversal mode of the sharded host tier: the aux
    operands shard with the codes and the decomposed ADC guides each
    shard's traversal (pq/residual.py serving decomposition)."""
    from diskrag_tpu.index.persist import write_compat_records
    from diskrag_tpu.native import RecordReader
    from diskrag_tpu.parallel.host_tier import ShardedHostTier
    from diskrag_tpu.pq import ResidualPQ

    pts = clustered_data
    rng = np.random.default_rng(12)
    sharded = build_sharded(pts, n_shards=4, degree_bound=24)
    mesh = make_mesh(n_shards=4, n_data=2)
    path = tmp_path / "vectors.dat"
    write_compat_records(path, pts, np.empty((len(pts), 0), np.int32))
    reader = RecordReader(path, len(pts), pts.shape[1], 0)

    rpq = ResidualPQ(n_subvectors=8, n_coarse=64).fit(pts, seed=0)
    codes, cids = rpq.encode(pts)
    bias = np.asarray(rpq.point_bias(codes, cids))
    ht = ShardedHostTier.from_sharded_index(
        sharded, reader, mesh, mode="pq", pq=rpq,
        codes=np.asarray(codes), pq_cells=np.asarray(cids), pq_bias=bias,
    )
    assert ht.mode == "pq" and ht.pq_cells is not None

    qi = rng.integers(0, len(pts), size=50)
    queries = pts[qi] + rng.normal(size=(50, pts.shape[1])).astype(np.float32) * 0.1
    dists, ids, stats = ht.search(queries, search_width=48, k=10)
    assert stats["mode"] == "pq"
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(ids))]
    )
    assert recall >= 0.9, f"residual-pq sharded host-tier recall@10 = {recall}"
    # rerank is exact regardless of the ADC traversal
    d0 = ((queries[0] - pts[ids[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(dists[0, 0], d0, rtol=1e-3)
