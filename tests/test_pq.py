"""PQ subsystem tests: batched k-means quality, encode/decode round-trip,
ADC consistency against a numpy oracle, adaptive tuner behavior parity."""

import numpy as np
import jax
import jax.numpy as jnp

from diskrag_tpu.pq import (
    ProductQuantizer,
    calculate_adaptive_pq_params,
    kmeans_fit,
)


def test_kmeans_recovers_clusters(rng):
    # 3 subspace problems, each with 8 well-separated clusters
    m, per, d, k = 3, 50, 4, 8
    centers = rng.normal(size=(m, k, d)).astype(np.float32) * 10
    data = (
        centers[:, :, None, :]
        + rng.normal(size=(m, k, per, d)).astype(np.float32) * 0.1
    ).reshape(m, k * per, d)
    got_centers, assign = kmeans_fit(jax.random.key(0), jnp.asarray(data), k,
                                     max_iter=20, chunk=128)
    got_centers = np.asarray(got_centers)
    # every true center should be within 0.5 of some learned center
    for mi in range(m):
        dists = np.linalg.norm(
            centers[mi][:, None, :] - got_centers[mi][None, :, :], axis=-1
        )
        assert dists.min(axis=1).max() < 0.5
    # assignment shape / dtype
    assert assign.shape == (m, k * per)


def test_pq_roundtrip_and_adc(rng):
    n, dim, m = 2000, 32, 8
    pts = rng.normal(size=(n, dim)).astype(np.float32)
    pq = ProductQuantizer(n_subvectors=m).fit(pts, seed=0)
    codes = np.asarray(pq.encode(pts))
    assert codes.shape == (n, m) and codes.dtype == np.uint8

    # decode error should be far smaller than the data norm
    rec = np.asarray(pq.decode(codes))
    rel = np.linalg.norm(pts - rec) / np.linalg.norm(pts)
    assert rel < 0.9  # lossy, but not garbage

    # ADC == exact distance to the *reconstruction* (numpy oracle)
    q = rng.normal(size=(4, dim)).astype(np.float32)
    tables = pq.compute_distance_tables(q)
    assert tables.shape == (4, m, 256)
    adc = np.asarray(pq.asymmetric_distance_sq(tables, jnp.asarray(codes)))
    want = ((q[:, None, :] - rec[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(adc, want, rtol=1e-3, atol=1e-3)

    # distance preservation: ADC should correlate strongly with exact
    exact = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    for i in range(len(q)):
        corr = np.corrcoef(adc[i], exact[i])[0, 1]
        assert corr > 0.8, f"ADC-exact correlation too low: {corr}"


def test_pq_persistence_roundtrip(rng):
    pts = rng.normal(size=(1200, 16)).astype(np.float32)
    pq = ProductQuantizer(n_subvectors=4).fit(pts, seed=1)
    arrays = pq.to_arrays()
    pq2 = ProductQuantizer.from_arrays(arrays)
    np.testing.assert_array_equal(
        np.asarray(pq.encode(pts[:100])), np.asarray(pq2.encode(pts[:100]))
    )


def test_adaptive_params_behavior():
    # <1000 points -> brute force (reference adaptive_pq.py:60-66)
    rec = calculate_adaptive_pq_params(500, 128)
    assert rec.recommendation == "brute_force"
    # 1536-d balanced mid-size: valid m are those dividing 1536 with
    # sub_dim in [2,64]
    rec = calculate_adaptive_pq_params(10_000, 1536, "balanced")
    assert rec.n_subvectors > 0 and 2 <= rec.sub_dimension <= 64
    assert 1536 % rec.n_subvectors == 0
    assert rec.n_centroids == 256
    # huge dataset -> space saving (min m)
    rec = calculate_adaptive_pq_params(5_000_000, 128, "balanced")
    assert rec.recommendation == "space_saving"
    # regression: D=50 has no grid candidate (8/16/32 don't divide it);
    # the recommendation must still divide the dimension, never crash
    # ProductQuantizer.fit downstream
    rec = calculate_adaptive_pq_params(10_000, 50, "balanced")
    assert rec.n_subvectors > 0
    assert 50 % rec.n_subvectors == 0
    assert 2 <= rec.sub_dimension <= 64
    # prime dimension: nothing divides it -> brute force, not a bad m
    rec = calculate_adaptive_pq_params(10_000, 127, "balanced")
    assert rec.recommendation == "brute_force"


def test_gathered_adc(rng):
    from diskrag_tpu.pq.product_quantizer import adc_lookup_gathered

    n, dim, m, b, c = 500, 16, 4, 3, 7
    pts = rng.normal(size=(n, dim)).astype(np.float32)
    pq = ProductQuantizer(n_subvectors=m).fit(pts, seed=0)
    codes = np.asarray(pq.encode(pts))
    q = rng.normal(size=(b, dim)).astype(np.float32)
    tables = pq.compute_distance_tables(q)
    cand = rng.integers(0, n, size=(b, c))
    got = np.asarray(adc_lookup_gathered(tables, jnp.asarray(codes[cand])))
    full = np.asarray(pq.asymmetric_distance_sq(tables, jnp.asarray(codes)))
    want = np.take_along_axis(full, cand, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_symmetric_distance(rng):
    n, dim, m = 600, 16, 4
    pts = rng.normal(size=(n, dim)).astype(np.float32)
    pq = ProductQuantizer(n_subvectors=m).fit(pts, seed=0)
    codes = pq.encode(pts)
    tables = pq.symmetric_distance_tables()
    assert tables.shape == (m, 256, 256)
    got = np.asarray(pq.symmetric_distance_sq(codes[:5], codes[:7], tables))
    # oracle: distance between reconstructions
    rec = np.asarray(pq.decode(codes))
    want = ((rec[:5, None, :] - rec[None, :7, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_opq_rotation_improves_anisotropic_data():
    """OPQ (learned rotation) must cut reconstruction error and improve
    ADC ranking on correlated data, and be a no-op flag on persistence."""
    from diskrag_tpu.pq import ProductQuantizer

    rng = np.random.default_rng(0)
    mix = rng.normal(size=(64, 64)) * np.linspace(2.0, 0.05, 64)[None, :]
    pts = (rng.normal(size=(4000, 64)) @ mix).astype(np.float32)
    q = (rng.normal(size=(32, 64)) @ mix).astype(np.float32)
    exact = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(exact, 1)[:, :10]

    def adc_recall(pq):
        adc = np.asarray(
            pq.asymmetric_distance_sq(pq.compute_distance_tables(q), pq.encode(pts))
        )
        got = np.argsort(adc, 1)[:, :10]
        return np.mean([len(set(got[i]) & set(gt[i])) / 10 for i in range(len(q))])

    plain = ProductQuantizer(n_subvectors=8).fit(pts, seed=0)
    opq = ProductQuantizer(n_subvectors=8).fit(pts, seed=0, opq_iters=6)
    assert opq.rotation is not None
    # opq_iters=1 trains on unrotated data and never updates the
    # rotation: the model must be identical to opq_iters=0 (no identity
    # [D, D] matmul added to every encode/query)
    one = ProductQuantizer(n_subvectors=8).fit(pts, seed=0, opq_iters=1)
    assert one.rotation is None
    np.testing.assert_array_equal(
        np.asarray(one.encode(pts[:64])), np.asarray(plain.encode(pts[:64]))
    )
    # rotation is orthogonal
    r = np.asarray(opq.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(64), atol=1e-4)
    assert opq.reconstruction_error(pts[:1000]) < 0.9 * plain.reconstruction_error(pts[:1000])
    assert adc_recall(opq) > adc_recall(plain)

    # persistence round-trip keeps the rotation and exact codes
    clone = ProductQuantizer.from_arrays(dict(opq.to_arrays()))
    np.testing.assert_array_equal(
        np.asarray(clone.encode(pts[:64])), np.asarray(opq.encode(pts[:64]))
    )
    # decode undoes the rotation: reconstruction lives in the original space
    rec = np.asarray(opq.decode(opq.encode(pts[:64])))
    assert ((rec - pts[:64]) ** 2).sum() < ((pts[:64]) ** 2).sum()


def test_attach_pq(rng):
    """Library-level set_pq_model counterpart: train + full re-encode
    (reference vamana_graph.py:26-56)."""
    from diskrag_tpu.build_index import attach_pq

    vecs = rng.normal(size=(300, 32)).astype(np.float32)
    pq, codes, val = attach_pq(vecs, n_subvectors=4)
    assert codes.shape == (300, 4) and codes.dtype == np.uint8
    assert val["encode_consistent"]

    # the adaptive tuner recommends brute force below 1000 points
    pq2, codes2, val2 = attach_pq(vecs)
    assert pq2 is None and codes2 is None and val2 is None


def _clustered(rng, n=4000, dim=32, n_clusters=40, spread=0.05):
    """Tightly-clustered set — the regime where plain PQ's ADC ordering
    collapses (docs/PERFORMANCE.md 'Notes on the PQ-guided mode')."""
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32)
    lab = rng.integers(0, n_clusters, size=n)
    return (
        centers[lab]
        + rng.normal(size=(n, dim)).astype(np.float32) * spread
    ).astype(np.float32)


def test_residual_pq_roundtrip_and_adc(rng):
    from diskrag_tpu.pq import ResidualPQ

    pts = _clustered(rng)
    n, dim, m = pts.shape[0], pts.shape[1], 8
    rpq = ResidualPQ(n_subvectors=m, n_coarse=64).fit(pts, seed=0)
    codes, cids = rpq.encode(pts)
    codes, cids = np.asarray(codes), np.asarray(cids)
    assert codes.shape == (n, m) and codes.dtype == np.uint8
    assert cids.shape == (n,) and cids.dtype == np.int32
    assert cids.min() >= 0 and cids.max() < rpq.n_coarse

    # ADC == exact distance to the reconstruction (numpy oracle)
    rec = np.asarray(rpq.decode(codes, cids))
    q = rng.normal(size=(4, dim)).astype(np.float32)
    tables = rpq.compute_query_tables(q)
    adc = np.asarray(
        rpq.asymmetric_distance_sq(tables, jnp.asarray(codes), cids)
    )
    want = ((q[:, None, :] - rec[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(adc, want, rtol=1e-3, atol=1e-3)

    # the whole point: residual PQ beats plain PQ at the same m on
    # clustered data, in reconstruction error AND in ADC ordering
    plain = ProductQuantizer(n_subvectors=m).fit(pts, seed=0)
    assert rpq.reconstruction_error(pts) < 0.5 * plain.reconstruction_error(pts)
    exact = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    p_tables = plain.compute_distance_tables(q)
    p_adc = np.asarray(
        plain.asymmetric_distance_sq(p_tables, plain.encode(pts))
    )

    def recall10(approx):
        hits = 0
        for i in range(len(q)):
            true = set(np.argsort(exact[i])[:10].tolist())
            got = set(np.argsort(approx[i])[:10].tolist())
            hits += len(true & got)
        return hits / (10 * len(q))

    assert recall10(adc) >= recall10(p_adc)
    assert recall10(adc) >= 0.5


def test_residual_pq_gathered_matches_shared(rng):
    from diskrag_tpu.pq import ResidualPQ
    from diskrag_tpu.pq.residual import rpq_lookup_gathered

    pts = _clustered(rng, n=1500, dim=16)
    rpq = ResidualPQ(n_subvectors=4, n_coarse=32).fit(pts, seed=1)
    codes, cids = rpq.encode(pts)
    b, c = 3, 9
    q = rng.normal(size=(b, 16)).astype(np.float32)
    tables = rpq.compute_query_tables(q)
    cand = rng.integers(0, pts.shape[0], size=(b, c))
    got = np.asarray(
        rpq_lookup_gathered(
            tables, rpq.t2_flat,
            jnp.asarray(np.asarray(codes)[cand]),
            jnp.asarray(np.asarray(cids)[cand], np.int32),
        )
    )
    full = np.asarray(rpq.asymmetric_distance_sq(tables, codes, cids))
    want = np.take_along_axis(full, cand, axis=1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_residual_pq_persistence_roundtrip(rng, tmp_path):
    from diskrag_tpu.pq import ResidualPQ, pq_from_arrays

    pts = _clustered(rng, n=1500, dim=16)
    rpq = ResidualPQ(n_subvectors=4, n_coarse=32).fit(pts, seed=2)
    path = tmp_path / "rpq.npz"
    np.savez(path, **rpq.to_arrays())
    clone = pq_from_arrays(dict(np.load(path)))
    assert isinstance(clone, ResidualPQ)
    assert clone.n_coarse == rpq.n_coarse
    c0, i0 = rpq.encode(pts[:64])
    c1, i1 = clone.encode(pts[:64])
    np.testing.assert_array_equal(np.asarray(c0), np.asarray(c1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))

    # plain-PQ artifacts still dispatch to ProductQuantizer
    plain = ProductQuantizer(n_subvectors=4).fit(pts, seed=0)
    np.savez(tmp_path / "pq.npz", **plain.to_arrays())
    back = pq_from_arrays(dict(np.load(tmp_path / "pq.npz")))
    assert isinstance(back, ProductQuantizer)


def test_residual_pq_serving_decomposition(rng):
    """The serving split (inner tables + cell table + point bias — the
    plain-PQ-machinery path used by beam_search_pq) must agree with the
    RPQTables oracle lookup."""
    from diskrag_tpu.pq import ResidualPQ
    from diskrag_tpu.pq.product_quantizer import adc_lookup

    pts = _clustered(rng, n=1500, dim=16)
    rpq = ResidualPQ(n_subvectors=4, n_coarse=32).fit(pts, seed=3)
    codes, cids = rpq.encode(pts)
    q = rng.normal(size=(3, 16)).astype(np.float32)
    inner = np.asarray(adc_lookup(rpq.inner_tables(q), codes))
    cell = np.asarray(rpq.cell_tables(q))
    bias = np.asarray(rpq.point_bias(codes, cids))
    got = inner + cell[:, np.asarray(cids)] + bias[None, :]
    want = np.asarray(
        rpq.asymmetric_distance_sq(rpq.compute_query_tables(q), codes, cids)
    )
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_beam_search_pq_chunked_seed_scoring(clustered_data):
    """With more entry points than the 4096 seed-scoring chunk, the
    chunked lax.map path must score every seed (regression for the 10M
    16.8 GB seed-fusion OOM, 2026-08-21): seeding ALL nodes as entries
    and reranking exactly must recover brute-force top-k."""
    from diskrag_tpu.graph.search import beam_search_pq
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.ops.distance import brute_force_topk
    from diskrag_tpu.pq import ResidualPQ

    rng_l = np.random.default_rng(3)
    pts = np.concatenate([clustered_data] * 3)  # 6000 rows > 4096 chunk
    pts = pts + rng_l.normal(size=pts.shape).astype(np.float32) * 0.01
    index = build_vamana_knn(pts, degree_bound=16, alpha=1.2, seed=0)
    queries = pts[rng_l.integers(0, len(pts), size=8)] + 0.05 * rng_l.normal(
        size=(8, pts.shape[1])
    ).astype(np.float32)
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=5)

    rpq = ResidualPQ(n_subvectors=8, n_coarse=64).fit(pts, seed=0)
    codes, cids = rpq.encode(pts)
    all_entries = jnp.arange(len(pts), dtype=jnp.int32)
    res = beam_search_pq(
        codes, rpq.inner_tables(queries), index.adjacency, index.medoid,
        search_width=64, k=5, rerank=True,
        vectors=index.vectors, queries=jnp.asarray(queries),
        entry_points=all_entries,
        point_cell=jnp.asarray(cids), point_bias=rpq.point_bias(codes, cids),
        cell_tables=rpq.cell_tables(queries),
    )
    got = np.asarray(res.ids)
    gt = np.asarray(gt)
    rec = np.mean(
        [len(set(got[i]) & set(gt[i])) / 5 for i in range(len(gt))]
    )
    assert rec >= 0.9, f"chunked-seed recall {rec:.3f}"


def test_beam_search_residual_pq_traversal(clustered_data):
    """PQ-guided graph traversal with the residual aux operands: on
    clustered data the residual-guided traversal (exact rerank on top)
    must reach >= 0.9 recall@10 and beat plain PQ at the same m."""
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.graph.search import beam_search_pq
    from diskrag_tpu.ops.distance import brute_force_topk
    from diskrag_tpu.pq import ResidualPQ

    pts = clustered_data  # 2000 x 64, 50 tight clusters
    index = build_vamana_knn(pts, degree_bound=24, alpha=1.2, seed=0)
    rng_l = np.random.default_rng(0)
    qi = rng_l.integers(0, len(pts), size=32)
    queries = (
        pts[qi] + rng_l.normal(size=(32, pts.shape[1])).astype(np.float32) * 0.1
    ).astype(np.float32)
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    gt = np.asarray(gt)

    def recall(ids):
        return float(np.mean(
            [len(set(np.asarray(ids)[i]) & set(gt[i])) / 10 for i in range(len(gt))]
        ))

    m = 8
    rpq = ResidualPQ(n_subvectors=m, n_coarse=64).fit(pts, seed=0)
    codes, cids = rpq.encode(pts)
    res = beam_search_pq(
        codes, rpq.inner_tables(queries), index.adjacency, index.medoid,
        search_width=48, k=10, rerank=True,
        vectors=index.vectors, queries=jnp.asarray(queries),
        entry_points=index.entry_points,
        point_cell=jnp.asarray(cids), point_bias=rpq.point_bias(codes, cids),
        cell_tables=rpq.cell_tables(queries),
    )
    r_res = recall(res.ids)

    plain = ProductQuantizer(n_subvectors=m).fit(pts, seed=0)
    pres = beam_search_pq(
        plain.encode(pts), plain.compute_distance_tables(queries),
        index.adjacency, index.medoid,
        search_width=48, k=10, rerank=True,
        vectors=index.vectors, queries=jnp.asarray(queries),
        entry_points=index.entry_points,
    )
    r_plain = recall(pres.ids)
    assert r_res >= 0.9, f"residual-guided recall@10 = {r_res}"
    assert r_res >= r_plain, (r_res, r_plain)
