"""Flat (exhaustive MXU scan) and IVF-flat index tests."""

import numpy as np
import jax.numpy as jnp

from diskrag_tpu.index.ivf import build_ivf
from diskrag_tpu.ops import brute_force_topk
from diskrag_tpu.ops.flat import FlatIndex


def _recall(ids, gt):
    k = gt.shape[1]
    return np.mean([len(set(ids[i]) & set(gt[i])) / k for i in range(len(ids))])


def test_flat_index_exact(clustered_data, rng):
    pts = clustered_data
    idx = FlatIndex(pts)
    qi = rng.integers(0, len(pts), size=64)
    queries = pts[qi] + rng.normal(size=(64, pts.shape[1])).astype(np.float32) * 0.1
    dists, ids = idx.search(queries, k=10, chunk=512)  # force multi-tile
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    rec = _recall(np.asarray(ids), np.asarray(gt))
    assert rec >= 0.999, f"flat recall {rec}"
    # rerank distances are f32-exact
    d0 = ((queries[0] - pts[np.asarray(ids)[0, 0]]) ** 2).sum()
    np.testing.assert_allclose(float(dists[0, 0]), d0, rtol=1e-4, atol=1e-4)


def test_flat_index_cosine(clustered_data, rng):
    pts = clustered_data
    idx = FlatIndex(pts, metric="cosine")
    queries = pts[rng.integers(0, len(pts), size=16)]
    dists, ids = idx.search(queries, k=5, chunk=1024)
    # a point queried with itself is its own nearest (cosine distance 0)
    assert (np.asarray(dists)[:, 0] < 1e-3).all()


def test_ivf_build_and_search(clustered_data, rng):
    pts = clustered_data
    idx = build_ivf(pts, n_cells=64, seed=0)
    # every point placed exactly once
    ids = np.asarray(idx.tile_ids)
    placed = ids[ids >= 0]
    assert len(placed) == len(pts)
    assert len(np.unique(placed)) == len(pts)

    qi = rng.integers(0, len(pts), size=64)
    queries = pts[qi] + rng.normal(size=(64, pts.shape[1])).astype(np.float32) * 0.1
    _, gt = brute_force_topk(jnp.asarray(queries), jnp.asarray(pts), k=10)
    # probing all cells must be ~exact
    _, got = idx.search(queries, k=10, n_probe=64)
    assert _recall(np.asarray(got), np.asarray(gt)) >= 0.999
    # probing a few cells should still be accurate on clustered data
    _, got = idx.search(queries, k=10, n_probe=8)
    rec = _recall(np.asarray(got), np.asarray(gt))
    assert rec >= 0.9, f"ivf n_probe=8 recall {rec}"


def test_ivf_large_k_narrow_probe(clustered_data):
    """Regression: k above cap*n_probe crashed the final top_k (the
    candidate buffer was sized min(4k, cap*n_probe) < k)."""
    pts = clustered_data
    idx = build_ivf(pts, n_cells=64, seed=0)
    cap = int(idx.tile_ids.shape[1])
    k = cap + 10  # forces kk > cap * n_probe at n_probe=1
    d, ids = idx.search(pts[:4], k=k, n_probe=1)
    assert ids.shape == (4, k)
    ids = np.asarray(ids)
    # one probed cell holds at most cap candidates; the rest must be
    # -1-padded with +inf distances, never duplicated or garbage
    for row, drow in zip(ids, np.asarray(d)):
        real = row[row >= 0]
        assert len(np.unique(real)) == len(real)
        assert np.isinf(drow[row < 0]).all()


def test_ivf_tile_precision_persisted(clustered_data, tmp_path):
    """A bf16-tile build must stay bf16 across a save/load round trip
    (tile_precision is recorded in meta, not silently re-quantized)."""
    from diskrag_tpu.index.persist import load_ivf_index, save_ivf_index

    pts = clustered_data
    for prec, dtype in (("bf16", jnp.bfloat16), ("int8", jnp.int8)):
        idx = build_ivf(pts, n_cells=32, seed=0, tile_precision=prec)
        assert idx.tiles.dtype == dtype
        d = tmp_path / prec
        save_ivf_index(d, idx)
        loaded, meta = load_ivf_index(d)
        assert meta["tile_precision"] == prec
        assert loaded.tiles.dtype == dtype
        assert (loaded.tile_scales is None) == (prec == "bf16")


def test_ivf_spill_points_stay_findable(clustered_data):
    """Capacity spill must not hide points: with cap_factor=1.0 (heavy
    spill pressure) every point still lands in a near cell, so
    self-queries recover themselves at moderate probe counts. The old
    global-fill straggler placement scattered ~2% of points into
    arbitrary far cells — an unrecoverable recall ceiling (measured
    plateau 0.977 at 4M regardless of n_probe)."""
    import jax.numpy as jnp
    import numpy as np

    from diskrag_tpu.index.ivf import build_ivf

    pts = clustered_data  # [2000, 64] tightly clustered -> uneven cells
    ivf = build_ivf(pts, n_cells=64, cap_factor=1.5, seed=0)
    # all points placed exactly once
    tids = np.asarray(ivf.tile_ids)
    placed = tids[tids >= 0]
    assert len(placed) == len(pts) and len(np.unique(placed)) == len(pts)

    # self-queries: the point itself must be reachable via probing
    q = jnp.asarray(pts[::7])
    _, ids = ivf.search(q, k=1, n_probe=16)
    hit = float(np.mean(np.asarray(ids)[:, 0] == np.arange(0, len(pts), 7)))
    assert hit >= 0.99, f"self-hit rate after spill: {hit}"


def test_ivf_cosine_recall_clustered():
    """Cosine IVF: cell ASSIGNMENT must rank cells with the same score
    the query side probes with (dot, not L2) — a disagreement places
    points in cells queries never probe (the invisible-point ceiling)."""
    from diskrag_tpu.benchmark import make_dataset
    from diskrag_tpu.index.ivf import build_ivf
    from diskrag_tpu.ops.distance import brute_force_topk

    pts, q = make_dataset(20_000, 64, 64)
    ivf = build_ivf(pts, 64, metric="cosine", seed=0, cap_factor=3.0)
    d, ids = ivf.search(jnp.asarray(q), k=10, n_probe=8)
    _, gt = brute_force_topk(
        jnp.asarray(q), jnp.asarray(pts), k=10, metric="cosine"
    )
    got, want = np.asarray(ids), np.asarray(gt)
    rec = np.mean([len(set(got[i]) & set(want[i])) / 10 for i in range(64)])
    assert rec >= 0.95, f"cosine ivf recall@10 = {rec}"
