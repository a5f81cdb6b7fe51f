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
