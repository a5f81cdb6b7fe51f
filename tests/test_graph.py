"""Graph build/search tests: numpy oracles for RobustPrune, exact-search
sanity on a complete graph, and the recall-parity gate for the wave-batched
Vamana builder (the acceptance criterion from SURVEY.md §7)."""

import numpy as np
import jax.numpy as jnp

from diskrag_tpu.graph import (
    beam_search,
    build_vamana,
    random_regular_init,
    robust_prune_batch,
)
from diskrag_tpu.ops import brute_force_topk
import jax


def prune_oracle(point_id, cand_ids, cand_vecs, cand_dists, alpha, r):
    """Reference semantics of RobustPrune (sequential, numpy)."""
    active = {}
    for i, cid in enumerate(cand_ids):
        if cid < 0 or cid == point_id:
            continue
        if cid not in active or cand_dists[i] < cand_dists[active[cid]]:
            active[cid] = i
    active = dict(active)
    out = []
    while active and len(out) < r:
        sel_id = min(active, key=lambda c: (cand_dists[active[c]], active[c]))
        sel_i = active.pop(sel_id)
        out.append(sel_id)
        for cid in list(active):
            i = active[cid]
            d_sel = ((cand_vecs[sel_i] - cand_vecs[i]) ** 2).sum()
            if alpha * d_sel <= cand_dists[i]:
                del active[cid]
    return out + [-1] * (r - len(out))


def test_robust_prune_matches_oracle(rng):
    n, c, d, r = 12, 24, 8, 5
    pts = rng.normal(size=(100, d)).astype(np.float32)
    point_ids = rng.integers(0, 100, size=n)
    cand_ids = rng.integers(-1, 100, size=(n, c))
    cand_vecs = pts[np.clip(cand_ids, 0, 99)]
    cand_dists = ((pts[point_ids][:, None, :] - cand_vecs) ** 2).sum(-1)
    cand_dists = np.where(cand_ids < 0, np.inf, cand_dists).astype(np.float32)

    got = np.asarray(
        robust_prune_batch(
            jnp.asarray(point_ids, jnp.int32),
            jnp.asarray(cand_ids, jnp.int32),
            jnp.asarray(cand_vecs),
            jnp.asarray(cand_dists),
            1.2,
            degree_bound=r,
            block_size=1,  # exact sequential mode matches the oracle
        )
    )
    for i in range(n):
        want = prune_oracle(
            point_ids[i], cand_ids[i], cand_vecs[i], cand_dists[i], 1.2, r
        )
        assert list(got[i]) == want, f"row {i}: {list(got[i])} != {want}"


def test_blocked_prune_is_close_to_sequential(rng):
    """block_size>1 is an approximation: it must keep the same nearest
    candidates and produce a neighbor set mostly overlapping the exact
    sequential result."""
    n, c, d, r = 64, 48, 16, 8
    pts = rng.normal(size=(300, d)).astype(np.float32)
    point_ids = rng.integers(0, 300, size=n)
    cand_ids = rng.integers(0, 300, size=(n, c))
    cand_vecs = pts[cand_ids]
    cand_dists = ((pts[point_ids][:, None, :] - cand_vecs) ** 2).sum(-1).astype(np.float32)
    args = (
        jnp.asarray(point_ids, jnp.int32), jnp.asarray(cand_ids, jnp.int32),
        jnp.asarray(cand_vecs), jnp.asarray(cand_dists), 1.2,
    )
    exact = np.asarray(robust_prune_batch(*args, degree_bound=r, block_size=1))
    blocked = np.asarray(robust_prune_batch(*args, degree_bound=r, block_size=8))
    # first selection always identical (closest candidate)
    np.testing.assert_array_equal(exact[:, 0], blocked[:, 0])
    overlap = np.mean([
        len(set(exact[i]) & set(blocked[i]) - {-1})
        / max(len(set(exact[i]) - {-1}), 1)
        for i in range(n)
    ])
    assert overlap >= 0.8, f"blocked/sequential overlap {overlap}"


def test_blocked_prune_fills_degrees_on_clustered_candidates(rng):
    """Regression: tight clusters eliminate most of each round's block
    in-block, so a fixed ceil(R/G)+2 round budget under-filled degrees
    (6 kept where sequential keeps 21). The round loop must keep going
    until R kept or candidates exhausted."""
    n_clusters, per, d, r = 40, 8, 16, 32
    centers = rng.normal(size=(n_clusters, d)) * 100.0
    radii = 0.01 * (1 + np.arange(n_clusters))[:, None, None]
    pts = (
        centers[:, None, :] + rng.normal(size=(n_clusters, per, d)) * radii
    ).reshape(-1, d).astype(np.float32)
    dists = (pts**2).sum(1).astype(np.float32)  # point at origin
    ids = np.arange(len(pts), dtype=np.int32)

    want = prune_oracle(-7, ids, pts, dists, 1.0, r)
    got = np.asarray(
        robust_prune_batch(
            jnp.asarray([-7], jnp.int32),
            jnp.asarray(ids)[None],
            jnp.asarray(pts)[None],
            jnp.asarray(dists)[None],
            1.0,
            degree_bound=r,
            block_size=8,
        )
    )[0]
    want_set = {x for x in want if x >= 0}
    got_set = {int(x) for x in got if x >= 0}
    assert len(got_set) == len(want_set), (len(got_set), len(want_set))
    assert got_set == want_set


def test_beam_search_exact_on_complete_graph(rng):
    n, d = 60, 16
    pts = rng.normal(size=(n, d)).astype(np.float32)
    # complete graph: every node sees every other
    adj = np.stack([np.delete(np.arange(n), i) for i in range(n)]).astype(np.int32)
    q = rng.normal(size=(5, d)).astype(np.float32)
    res = beam_search(
        jnp.asarray(pts), jnp.asarray(adj), jnp.asarray(0, jnp.int32),
        jnp.asarray(q), search_width=16, k=5,
    )
    want_d, want_i = brute_force_topk(jnp.asarray(q), jnp.asarray(pts), k=5)
    np.testing.assert_array_equal(np.asarray(res.ids), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(res.dists), np.asarray(want_d), rtol=1e-4, atol=1e-4
    )
    assert int(res.n_steps) <= 32


def test_random_regular_init_no_self_loops():
    adj = np.asarray(random_regular_init(jax.random.key(0), 100, 8))
    assert adj.shape == (100, 8)
    assert (adj >= 0).all() and (adj < 100).all()
    assert not (adj == np.arange(100)[:, None]).any()


def test_build_vamana_recall(clustered_data):
    pts = clustered_data  # [2000, 64] clustered
    rng = np.random.default_rng(7)
    idx = build_vamana(
        pts, degree_bound=32, build_width=64, alpha=1.2, seed=3,
        wave_size=256,
    )
    adj = np.asarray(idx.adjacency)
    # structural sanity
    assert adj.shape == (len(pts), 32)
    degs = (adj >= 0).sum(1)
    assert degs.min() >= 1
    # recall@10 vs brute force on perturbed-point queries
    qi = rng.integers(0, len(pts), size=128)
    queries = pts[qi] + rng.normal(size=(128, pts.shape[1])).astype(np.float32) * 0.1
    res = beam_search(
        idx.vectors, idx.adjacency, idx.medoid, jnp.asarray(queries),
        search_width=64, k=10,
    )
    _, gt = brute_force_topk(jnp.asarray(queries), idx.vectors, k=10)
    got, want = np.asarray(res.ids), np.asarray(gt)
    recall = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(len(got))]
    )
    assert recall >= 0.95, f"recall@10 = {recall}"


def test_build_vamana_knn_recall(clustered_data):
    """Recall-parity gate for the kNN-based fast builder (graph/knn_build):
    same acceptance criterion as the wave builder, plus entry-point
    structure checks (unique, in range, excluding the medoid)."""
    from diskrag_tpu.graph.knn_build import build_vamana_knn

    pts = clustered_data  # [2000, 64] clustered
    rng = np.random.default_rng(11)
    idx = build_vamana_knn(
        pts, degree_bound=32, alpha=1.2, seed=3, wave_size=512,
        n_entry_points=64,
    )
    adj = np.asarray(idx.adjacency)
    assert adj.shape == (len(pts), 32)
    assert (adj < len(pts)).all()
    assert (adj >= 0).sum(1).min() >= 1
    eps = np.asarray(idx.entry_points)
    assert len(np.unique(eps)) == len(eps)
    assert (eps >= 0).all() and (eps < len(pts)).all()
    assert int(idx.medoid) not in eps

    qi = rng.integers(0, len(pts), size=128)
    queries = pts[qi] + rng.normal(size=(128, pts.shape[1])).astype(np.float32) * 0.1
    res = beam_search(
        idx.vectors, idx.adjacency, idx.medoid, jnp.asarray(queries),
        search_width=64, k=10, entry_points=idx.entry_points,
    )
    _, gt = brute_force_topk(jnp.asarray(queries), idx.vectors, k=10)
    got, want = np.asarray(res.ids), np.asarray(gt)
    recall = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(len(got))]
    )
    assert recall >= 0.95, f"recall@10 = {recall}"
    # no duplicate ids in returned results (entry seeding must not leak dups)
    for row in got:
        valid = row[row >= 0]
        assert len(np.unique(valid)) == len(valid)


def test_exact_knn_matches_brute_force(rng):
    from diskrag_tpu.graph.knn_build import exact_knn

    pts = rng.normal(size=(500, 32)).astype(np.float32)
    ids, dists = exact_knn(jnp.asarray(pts), 10, query_block=128)
    d_all = ((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d_all, np.inf)
    want = np.argsort(d_all, axis=1)[:, :10]
    got = np.asarray(ids)
    # allow tie reordering: compare distance values
    got_d = np.take_along_axis(d_all, got, axis=1)
    want_d = np.take_along_axis(d_all, want, axis=1)
    np.testing.assert_allclose(got_d, want_d, rtol=1e-4, atol=1e-4)
    assert not (got == np.arange(500)[:, None]).any()


def test_entry_points_random_path_at_scale(rng):
    """Past 20k seeds the entry-point picker switches from k-means to
    random sampling — ids must be unique, in range, and the full count."""
    import jax

    from diskrag_tpu.graph.knn_build import compute_entry_points

    pts = jnp.asarray(rng.normal(size=(30_000, 8)).astype(np.float32))
    eps = compute_entry_points(pts, 20_000, jax.random.key(0))
    assert len(eps) == 20_000
    assert len(np.unique(eps)) == len(eps)
    assert eps.min() >= 0 and eps.max() < 30_000


def test_incoming_tables_host_matches_device(rng):
    """The host-numpy reverse-edge grouping (used past ~150M edges where
    the device lexsort workspace exceeds HBM) must agree with the device
    version up to within-target distance ties."""
    from diskrag_tpu.graph.knn_build import (
        _incoming_tables,
        _incoming_tables_host,
    )

    n, r, mi = 300, 8, 6
    ids = rng.integers(-1, n, size=(n, r)).astype(np.int32)
    dists = np.where(
        ids == -1, np.inf, rng.random(size=(n, r)).astype(np.float32)
    )
    di, dd = _incoming_tables(
        jnp.asarray(ids), jnp.asarray(dists), max_incoming=mi, n=n
    )
    hi, hd = _incoming_tables_host(
        jnp.asarray(ids), jnp.asarray(dists), max_incoming=mi, n=n
    )
    np.testing.assert_array_equal(np.asarray(di), np.asarray(hi))
    np.testing.assert_allclose(
        np.asarray(dd), np.asarray(hd).astype(np.float32), rtol=1e-2
    )


def test_build_vamana_knn_ivf_backend(clustered_data):
    """The approximate (IVF-probe) kNN backend must still clear the
    recall gate on the final index."""
    from diskrag_tpu.graph.knn_build import build_vamana_knn

    pts = clustered_data
    rng = np.random.default_rng(5)
    idx = build_vamana_knn(
        pts, degree_bound=32, alpha=1.2, seed=3, knn_backend="ivf",
        n_entry_points=64,
    )
    qi = rng.integers(0, len(pts), size=96)
    queries = pts[qi] + rng.normal(size=(96, pts.shape[1])).astype(np.float32) * 0.1
    res = beam_search(
        idx.vectors, idx.adjacency, idx.medoid, jnp.asarray(queries),
        search_width=64, k=10, expand_width=8, entry_points=idx.entry_points,
    )
    _, gt = brute_force_topk(jnp.asarray(queries), idx.vectors, k=10)
    got, want = np.asarray(res.ids), np.asarray(gt)
    recall = np.mean(
        [len(set(got[i]) & set(want[i])) / 10 for i in range(len(got))]
    )
    assert recall >= 0.93, f"recall@10 = {recall}"


def test_approx_knn_ivf_table_recall_clustered():
    """The ivf-kNN backend's tables must be near-exact on clustered
    data at the shipped cap_factor. Regression gate for the 10M recall
    ceiling (2026-08): capacity caps displaced ~11% of points past
    their 8 nearest cells, capping table recall at 0.89 at ANY depth
    and the final index at 0.96 — invisible points never enter any
    candidate pool, so no probe width or entry-point count recovers
    them. cap_factor >= 3 measured a 1.0 co-probe ceiling."""
    from diskrag_tpu.benchmark import make_dataset
    from diskrag_tpu.graph.knn_build import approx_knn_ivf, exact_knn

    pts, _ = make_dataset(30_000, 64, 4)  # 30 natural clusters of 1000
    v = jnp.asarray(pts)
    ids_exact, _ = exact_knn(v, 16, query_block=8192)
    ids_exact = np.asarray(ids_exact)

    # n_cells matches the >2M regime's cell/cluster geometry (~350
    # points per cell vs 1000-point clusters); the default small-N
    # formula would give 43-point cells, a shape the auto backend
    # never produces (ivf only engages past 2M points)
    ids_tbl, _ = approx_knn_ivf(
        v, 16, n_probe=8, query_block=8192, seed=0, cap_factor=3.0,
        n_cells=90,
    )
    ids_tbl = np.asarray(ids_tbl)
    sample = np.random.default_rng(0).choice(30_000, 512, replace=False)
    rec = np.mean([
        len(set(ids_tbl[r, :10].tolist()) & set(ids_exact[r, :10].tolist()))
        / 10
        for r in sample
    ])
    assert rec >= 0.97, f"ivf-kNN table recall@10 = {rec}"


def test_prune_int8_matches_f32_on_separated_data():
    """int8-codes prune path (robust_prune_batch cand_scales +
    gathered_distance_int8): on well-separated data the kept sets match
    the f32 path — the alpha rule must tolerate int8 rounding."""
    import jax.numpy as jnp

    from diskrag_tpu.graph.prune import (
        gathered_distance_int8,
        robust_prune_batch,
    )
    from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

    rng = np.random.default_rng(7)
    w, c, d, r = 16, 24, 32, 8
    # well-separated clusters so prune decisions have margin
    centers = rng.normal(size=(c, d)).astype(np.float32) * 10.0
    cand_vecs = np.stack([
        centers + rng.normal(size=(c, d)).astype(np.float32) * 0.05
        for _ in range(w)
    ])
    points = rng.normal(size=(w, d)).astype(np.float32)
    cand_ids = np.tile(np.arange(c, dtype=np.int32)[None], (w, 1)) + 100
    dists = ((cand_vecs - points[:, None, :]) ** 2).sum(-1)

    f32 = robust_prune_batch(
        jnp.arange(w, dtype=jnp.int32), jnp.asarray(cand_ids),
        jnp.asarray(cand_vecs), jnp.asarray(dists), 1.2, degree_bound=r,
    )
    codes, scales = quantize_int8(jnp.asarray(cand_vecs))
    i8 = robust_prune_batch(
        jnp.arange(w, dtype=jnp.int32), jnp.asarray(cand_ids),
        codes, jnp.asarray(dists), 1.2, degree_bound=r,
        cand_scales=scales,
    )
    # identical keep-decisions on separated data
    assert (np.asarray(f32) == np.asarray(i8)).mean() > 0.95

    # gathered_distance_int8 tracks the exact distances closely
    qc, qs = quantize_int8(jnp.asarray(points))
    d_i8 = np.asarray(
        gathered_distance_int8(qc, qs, codes, scales, "l2")
    )
    rel = np.abs(d_i8 - dists) / (dists + 1e-6)
    assert rel.mean() < 0.02, rel.mean()

    # cosine variant sanity
    d_cos_i8 = np.asarray(
        gathered_distance_int8(qc, qs, codes, scales, "cosine")
    )
    pn = points / np.linalg.norm(points, axis=-1, keepdims=True)
    cn = cand_vecs / np.linalg.norm(cand_vecs, axis=-1, keepdims=True)
    d_cos = 1.0 - np.einsum("wd,wcd->wc", pn, cn)
    assert np.abs(d_cos_i8 - d_cos).mean() < 0.01


def test_reverse_edges_int8_path_recall():
    """_reverse_edges with int8 codes: graph built with the int8 reverse
    repair must reach the same self-retrieval quality as the f32 path."""
    import jax.numpy as jnp

    from diskrag_tpu.graph.build import _reverse_edges
    from diskrag_tpu.graph.prune import robust_prune_batch
    from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

    rng = np.random.default_rng(11)
    n, d, r = 600, 32, 12
    vecs = rng.normal(size=(n, d)).astype(np.float32)
    adj = rng.integers(0, n, size=(n, r)).astype(np.int32)
    wave = jnp.arange(200, 328, dtype=jnp.int32)
    # forward rows: nearest neighbors by brute force
    dists = ((vecs[np.asarray(wave)][:, None] - vecs[None]) ** 2).sum(-1)
    order = np.argsort(dists, axis=1)[:, 1 : r + 1].astype(np.int32)
    pruned = jnp.asarray(order)
    codes, scales = quantize_int8(jnp.asarray(vecs))
    out_f32 = _reverse_edges(
        jnp.asarray(vecs), jnp.asarray(adj.copy()), wave, pruned,
        jnp.float32(1.2), max_incoming=8, chunk=512, metric="l2",
    )
    out_i8 = _reverse_edges(
        jnp.asarray(vecs), jnp.asarray(adj.copy()), wave, pruned,
        jnp.float32(1.2), max_incoming=8, chunk=512, metric="l2",
        codes=codes, code_scales=scales,
    )
    # the wave's targets gained in-edges in both; rows mostly agree
    f32_rows = np.asarray(out_f32)
    i8_rows = np.asarray(out_i8)
    changed = (f32_rows != adj).any(axis=1)
    assert changed.sum() > 50  # repair actually ran
    agree = (f32_rows[changed] == i8_rows[changed]).mean()
    assert agree > 0.9, f"int8 reverse rows diverge: {agree:.3f}"


def test_build_vamana_knn_host_resident_tables(clustered_data, monkeypatch):
    """The huge-build path that keeps kNN tables host-side and slices
    them per prune block must produce the IDENTICAL graph to the
    device-resident path (same candidates, same prune) — it is a pure
    residency change. Regression gate for the 10M x R=48
    RESOURCE_EXHAUSTED (2026-08-21)."""
    from diskrag_tpu.graph import knn_build

    pts = clustered_data
    idx_dev = knn_build.build_vamana_knn(
        pts, degree_bound=24, alpha=1.2, seed=7, knn_backend="ivf",
    )
    monkeypatch.setattr(knn_build, "_HOST_KNN_BYTES", 0)
    idx_host = knn_build.build_vamana_knn(
        pts, degree_bound=24, alpha=1.2, seed=7, knn_backend="ivf",
    )
    np.testing.assert_array_equal(
        np.asarray(idx_dev.adjacency), np.asarray(idx_host.adjacency)
    )
    assert int(idx_dev.medoid) == int(idx_host.medoid)
