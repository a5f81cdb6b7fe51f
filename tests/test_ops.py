"""Numeric tests for core ops against numpy oracles — the generalization of
the reference's Cython-vs-numpy consistency checks
(reference scripts/test_pydiskann_cython.sh:40-60, rtol=1e-5)."""

import numpy as np
import jax.numpy as jnp

from diskrag_tpu.ops import (
    pairwise_l2_sq,
    pairwise_cosine_distance,
    brute_force_topk,
    approximate_medoid,
    topk_smallest,
    merge_topk,
    mask_duplicates,
)
from diskrag_tpu.ops.distance import brute_force_topk as bft  # noqa: F401


def test_pairwise_l2_matches_numpy(rng):
    x = rng.normal(size=(33, 17)).astype(np.float32)
    y = rng.normal(size=(55, 17)).astype(np.float32)
    got = np.asarray(pairwise_l2_sq(jnp.asarray(x), jnp.asarray(y)))
    want = ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_pairwise_cosine_matches_numpy(rng):
    x = rng.normal(size=(20, 32)).astype(np.float32)
    y = rng.normal(size=(11, 32)).astype(np.float32)
    got = np.asarray(pairwise_cosine_distance(jnp.asarray(x), jnp.asarray(y)))
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    yn = y / np.linalg.norm(y, axis=1, keepdims=True)
    want = 1.0 - xn @ yn.T
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_brute_force_topk(rng):
    pts = rng.normal(size=(200, 16)).astype(np.float32)
    q = rng.normal(size=(7, 16)).astype(np.float32)
    d, i = brute_force_topk(jnp.asarray(q), jnp.asarray(pts), k=5)
    full = ((q[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    want_i = np.argsort(full, axis=1)[:, :5]
    np.testing.assert_array_equal(np.asarray(i), want_i)
    np.testing.assert_allclose(
        np.asarray(d), np.take_along_axis(full, want_i, axis=1), rtol=1e-4, atol=1e-4
    )


def test_medoid_exact_on_small(rng):
    pts = rng.normal(size=(300, 8)).astype(np.float32)
    idx = int(approximate_medoid(jnp.asarray(pts)))
    full = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    want = int(np.argmin(full.sum(1)))
    assert idx == want


def test_topk_smallest():
    d = jnp.asarray([[3.0, 1.0, 2.0, 0.5]])
    v, i = topk_smallest(d, 2)
    np.testing.assert_allclose(np.asarray(v), [[0.5, 1.0]])
    np.testing.assert_array_equal(np.asarray(i), [[3, 1]])


def test_mask_duplicates_keeps_best():
    ids = jnp.asarray([[5, 3, 5, -1, 3]])
    dists = jnp.asarray([[1.0, 2.0, 0.5, 0.1, 2.0]])
    out = np.asarray(mask_duplicates(ids, dists))
    # id 5: keep dist 0.5 (mask 1.0); id 3: tie -> keep earlier (pos 1);
    # id -1: always masked.
    assert np.isinf(out[0, 0]) and out[0, 2] == 0.5
    assert out[0, 1] == 2.0 and np.isinf(out[0, 4])
    assert np.isinf(out[0, 3])


def test_merge_topk_dedup_and_payload():
    ids_a = jnp.asarray([[1, 2, 3]])
    d_a = jnp.asarray([[0.1, 0.2, 0.3]])
    ids_b = jnp.asarray([[2, 4, -1]])
    d_b = jnp.asarray([[0.05, 0.15, 7.0]])
    ids, dists, take = merge_topk(ids_a, d_a, ids_b, d_b, k=4)
    np.testing.assert_array_equal(np.asarray(ids), [[2, 1, 4, 3]])
    np.testing.assert_allclose(np.asarray(dists), [[0.05, 0.1, 0.15, 0.3]])
    payload = jnp.asarray([[10, 20, 30, 21, 40, 99]])  # concat order a then b
    got = np.asarray(jnp.take_along_axis(payload, take, axis=-1))
    np.testing.assert_array_equal(got, [[21, 10, 40, 30]])
