"""Fused Pallas scan kernel (ops/flat_scan_pallas): correctness vs the
brute-force oracle in interpret mode (CPU), all metrics, plus the
bucket-collision recall bound."""

import numpy as np
import jax.numpy as jnp

from diskrag_tpu.benchmark import make_dataset
from diskrag_tpu.ops.distance import brute_force_topk
from diskrag_tpu.ops.flat_scan_pallas import flat_search_fused, scan_bucketed_topk


def _recall(got, want):
    k = want.shape[1]
    return np.mean(
        [len(set(got[i]) & set(want[i])) / k for i in range(len(got))]
    )


def test_fused_scan_matches_oracle_l2():
    pts, q = make_dataset(20000, 64, 64)
    v = jnp.asarray(pts)
    vb = v.astype(jnp.bfloat16)
    norms = jnp.sum(jnp.square(v), -1)
    d, ids = flat_search_fused(
        jnp.asarray(q), vb, norms, v, k=10, n_buckets=2048, interpret=True
    )
    gt_d, gt_i = brute_force_topk(jnp.asarray(q), v, k=10)
    assert _recall(np.asarray(ids), np.asarray(gt_i)) >= 0.99
    # rerank is exact f32: the best distance must match the oracle
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], np.asarray(gt_d)[:, 0], rtol=1e-3, atol=1e-3
    )
    # ascending output
    assert (np.diff(np.asarray(d), axis=1) >= -1e-6).all()


def test_fused_scan_cosine_and_dot():
    pts, q = make_dataset(8000, 64, 32)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    vb_cos = (v / jnp.linalg.norm(v, axis=1, keepdims=True)).astype(jnp.bfloat16)
    _, ids = flat_search_fused(
        jnp.asarray(q), vb_cos, norms, v, k=10, metric="cosine", interpret=True
    )
    _, gt = brute_force_topk(jnp.asarray(q), v, k=10, metric="cosine")
    assert _recall(np.asarray(ids), np.asarray(gt)) >= 0.98
    _, ids2 = flat_search_fused(
        jnp.asarray(q), v.astype(jnp.bfloat16), norms, v, k=10, metric="dot",
        interpret=True,
    )
    _, gt2 = brute_force_topk(jnp.asarray(q), v, k=10, metric="dot")
    assert _recall(np.asarray(ids2), np.asarray(gt2)) >= 0.98


def test_fused_scan_int8_matches_oracle():
    """int8 path: per-vector-scaled s8 x s8 -> s32 scan + f32 rerank."""
    from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

    pts, q = make_dataset(20000, 64, 64)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    codes, scales = quantize_int8(v)
    d, ids = flat_search_fused(
        jnp.asarray(q), codes, norms, v, k=10, n_buckets=2048,
        interpret=True, db_scales=scales,
    )
    gt_d, gt_i = brute_force_topk(jnp.asarray(q), v, k=10)
    assert _recall(np.asarray(ids), np.asarray(gt_i)) >= 0.99
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], np.asarray(gt_d)[:, 0], rtol=1e-3, atol=1e-3
    )
    # cosine: quantize the normalized database
    vb_cos = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    codes_c, scales_c = quantize_int8(vb_cos)
    _, ids_c = flat_search_fused(
        jnp.asarray(q), codes_c, norms, v, k=10, metric="cosine",
        interpret=True, db_scales=scales_c,
    )
    _, gt_c = brute_force_topk(jnp.asarray(q), v, k=10, metric="cosine")
    assert _recall(np.asarray(ids_c), np.asarray(gt_c)) >= 0.98


def test_fused_scan_default_geometry():
    """The shipped default config (NB=512/QB=1024/T=2048, int8) against
    the oracle — the exact path FlatIndex.search serves."""
    from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

    pts, q = make_dataset(20000, 64, 64)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    codes, scales = quantize_int8(v)
    d, ids = flat_search_fused(
        jnp.asarray(q), codes, norms, v, k=10, interpret=True,
        db_scales=scales,
    )
    _, gt_i = brute_force_topk(jnp.asarray(q), v, k=10)
    # NB=512 bucket-collision bound: 1 - 9/1024 = 0.991
    assert _recall(np.asarray(ids), np.asarray(gt_i)) >= 0.98


def test_fused_scan_large_k_autoscales_buckets():
    """k=100 must widen NB past the 512 default (the collision bound at
    NB=512 would fall to ~0.90) and not crash the final top_k."""
    pts, q = make_dataset(20000, 32, 16)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    d, ids = flat_search_fused(
        jnp.asarray(q), v.astype(jnp.bfloat16), norms, v, k=100,
        interpret=True,
    )
    assert ids.shape == (16, 100)
    _, gt_i = brute_force_topk(jnp.asarray(q), v, k=100)
    assert _recall(np.asarray(ids), np.asarray(gt_i)) >= 0.97


def test_fused_scan_tiny_db_large_k_falls_back_exact():
    """Regression: n=300 with k=280 crashed — the k guard checked the
    widened NB but the kernels shrink NB down to 128-ish when n < NB,
    and the final top_k then outran the state width. Tiny databases with
    k past the shrunk bucket count must take the exact brute-force path."""
    pts, q = make_dataset(300, 64, 4)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    d, ids = flat_search_fused(
        jnp.asarray(q), v.astype(jnp.bfloat16), norms, v, k=280,
        interpret=True,
    )
    assert ids.shape == (4, 280)
    gt_d, gt_i = brute_force_topk(jnp.asarray(q), v, k=280)
    np.testing.assert_array_equal(np.asarray(ids), np.asarray(gt_i))


def test_quantize_int8_roundtrip():
    from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 32)).astype(np.float32) * 5.0
    x[7] = 0.0  # all-zero row must not divide by zero
    codes, scales = quantize_int8(jnp.asarray(x))
    back = np.asarray(codes, np.float32) * np.asarray(scales)[:, None]
    np.testing.assert_allclose(back, x, atol=np.abs(x).max() / 127 + 1e-6)
    assert np.asarray(codes)[7].max() == 0


def test_bucketed_topk_state_and_padding():
    """Non-multiple N and B; padded db rows must never be returned."""
    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 32)).astype(np.float32)
    q = rng.normal(size=(7, 32)).astype(np.float32)
    v = jnp.asarray(pts)
    vals, ids = scan_bucketed_topk(
        jnp.asarray(q).astype(jnp.bfloat16), v.astype(jnp.bfloat16),
        jnp.sum(jnp.square(v), -1), n_buckets=256, interpret=True,
    )
    ids_np = np.asarray(ids)
    assert ids_np.shape[0] == 7
    assert ids_np.max() < 5000
    # every valid bucket winner is a real row; -1 only where bucket empty
    assert ((ids_np >= -1)).all()


def test_fused_scan_packed_matches_oracle():
    """Packed-int32 fold (global scales): l2 + cosine vs the oracle,
    exercised through flat_search_fused and FlatIndex plumbing."""
    from diskrag_tpu.ops.flat_scan_pallas import quantize_int8_global

    pts, q = make_dataset(20000, 64, 64)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    codes, scale = quantize_int8_global(v)
    d, ids = flat_search_fused(
        jnp.asarray(q), codes, norms, v, k=10, n_buckets=2048,
        interpret=True, db_scale_global=scale,
    )
    gt_d, gt_i = brute_force_topk(jnp.asarray(q), v, k=10)
    assert _recall(np.asarray(ids), np.asarray(gt_i)) >= 0.98
    np.testing.assert_allclose(
        np.asarray(d)[:, 0], np.asarray(gt_d)[:, 0], rtol=1e-3, atol=1e-3
    )
    assert (np.diff(np.asarray(d), axis=1) >= -1e-6).all()
    # cosine rides the packed L2 kernel on the normalized copy: the
    # norms argument must then be the scan copy's norms (ones)
    vn = v / jnp.linalg.norm(v, axis=1, keepdims=True)
    codes_c, scale_c = quantize_int8_global(vn)
    _, ids_c = flat_search_fused(
        jnp.asarray(q), codes_c, jnp.sum(jnp.square(vn), -1), v, k=10,
        metric="cosine", interpret=True, db_scale_global=scale_c,
    )
    _, gt_c = brute_force_topk(jnp.asarray(q), v, k=10, metric="cosine")
    assert _recall(np.asarray(ids_c), np.asarray(gt_c)) >= 0.98


def test_packed_scan_segment_budget_and_padding():
    """Padded rows and empty buckets must come back as -1, never as
    ids >= N (widen-loop coverage lives in test_packed_scan_widen_loop)."""
    from diskrag_tpu.ops.flat_scan_pallas import (
        quantize_int8_global, scan_bucketed_topk_packed,
    )

    rng = np.random.default_rng(0)
    pts = rng.normal(size=(5000, 32)).astype(np.float32)
    q = rng.normal(size=(7, 32)).astype(np.float32)
    v = jnp.asarray(pts)
    codes, scale = quantize_int8_global(v)
    qc, qs = quantize_int8_global(jnp.asarray(q))
    vals, ids = scan_bucketed_topk_packed(
        qc, qs, codes, jnp.sum(jnp.square(v), -1), scale,
        n_buckets=256, interpret=True,
    )
    ids_np = np.asarray(ids)
    assert ids_np.shape[0] == 7
    assert ids_np.max() < 5000
    assert (ids_np >= -1).all()
    # ids must be consistent: re-derive each winner's true score and
    # check it beats every other member of its bucket (spot check row 0)
    nb = ids_np.shape[1]
    full = 2.0 * (q[0] @ pts.T) - np.sum(pts * pts, -1)
    for lane in range(0, nb, 37):
        i = ids_np[0, lane]
        if i < 0:
            continue
        bucket = full[lane::nb]
        assert full[i] >= bucket.max() - np.abs(bucket.max()) * 0.2


def test_packed_scan_widen_loop():
    """N past PACK*NB must widen NB, and the layout must keep the
    widened tiles inside the VMEM working-set budget (regression: at
    N=1M a 512-bucket request widens to NB=4096/T=4096, where the
    caller-sized QB=1024 needed 32 MB and failed to compile)."""
    from diskrag_tpu.ops.flat_scan_pallas import (
        _PACK,
        _packed_layout,
        quantize_int8_global,
        scan_bucketed_topk_packed,
    )

    d = 128
    for n, req_nb in ((1_000_000, 512), (4_000_000, 1024), (262_145, 512)):
        nb, t, qb, pad = _packed_layout(n, d, req_nb, 1024, 2048)
        assert (n + pad) <= _PACK * nb
        # working set = QB*(score tile + state) + double-buffered input
        # tiles (int8 codes + i32 norm row) — all inside the 16 MB limit
        assert qb * (t * 4 + nb * 4) + 2 * (t * d + t * 4) <= (15 << 20), (
            n, nb, t, qb,
        )
        assert qb >= 8 and qb % 8 == 0 and t % nb == 0
    # past ~8M rows the 256-segment budget forces tiles whose
    # double-buffered inputs alone blow the VMEM limit: the layout must
    # say so (qb == 0) instead of shipping an uncompilable kernel, and
    # FlatIndex must downgrade the precision request to per-row int8
    nb, t, qb, pad = _packed_layout(10_000_000, d, 1024, 1024, 2048)
    assert qb == 0
    nb, t, qb, pad = _packed_layout(40_000_000, d, 1024, 1024, 2048)
    assert qb == 0

    # end-to-end at a CPU-tractable widened size: 40k rows with a
    # 128-bucket request exceed the 32768-id pack budget -> NB = 256
    rng = np.random.default_rng(2)
    pts = rng.normal(size=(40_000, 8)).astype(np.float32)
    q = rng.normal(size=(5, 8)).astype(np.float32)
    v = jnp.asarray(pts)
    norms = np.sum(pts * pts, -1).astype(np.float32)
    codes, scale = quantize_int8_global(v)
    qc, qs = quantize_int8_global(jnp.asarray(q))
    vals, ids = scan_bucketed_topk_packed(
        qc, qs, codes, jnp.asarray(norms), scale,
        n_buckets=128, interpret=True,
    )
    assert vals.shape == (5, 256)  # widened from the 128 request
    ids_np = np.asarray(ids)
    assert ids_np.max() < 40_000 and (ids_np >= -1).all()
    # exact integer oracle: the kernel's packed scores are pure int32
    # arithmetic over the quantized codes, so every bucket winner is
    # deterministic — recompute in numpy and compare ids lane by lane
    nb = 256
    cross = np.asarray(qc, np.int64) @ np.asarray(codes, np.int64).T
    n_int = np.clip(
        np.round(norms / float(np.asarray(scale) * np.asarray(qs))), 0, 1 << 21
    ).astype(np.int64)
    packed = cross * (2 * 256) + (np.arange(40_000) // nb - n_int * 256)
    for r in range(5):
        want = np.full(nb, -1)
        for lane in range(nb):
            bucket = packed[r, lane::nb]
            want[lane] = lane + nb * int(bucket.argmax())
        np.testing.assert_array_equal(ids_np[r], want)


def test_fused_scan_tiny_db_no_duplicates():
    """n < rerank width: exhausted cut lanes must pad with -1, never
    duplicate an already-selected id (regression: the exact cut kernel
    re-emitted lane 0 once every finite lane had been extracted)."""
    from diskrag_tpu.ops.flat_scan_pallas import (
        quantize_int8,
        quantize_int8_global,
    )

    rng = np.random.default_rng(5)
    pts = rng.normal(size=(20, 32)).astype(np.float32)
    q = rng.normal(size=(9, 32)).astype(np.float32)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    _, gt_i = brute_force_topk(jnp.asarray(q), v, k=10)
    codes, scales = quantize_int8(v)
    gcodes, gscale = quantize_int8_global(v)
    for db, kwargs in (
        (codes, dict(db_scales=scales)),
        (gcodes, dict(db_scale_global=gscale)),
    ):
        d, ids = flat_search_fused(
            jnp.asarray(q), db, norms, v, k=10, interpret=True,
            rerank_width=32, **kwargs,
        )
        ids_np, d_np = np.asarray(ids), np.asarray(d)
        for r in range(len(q)):
            valid = ids_np[r][ids_np[r] >= 0]
            assert len(set(valid.tolist())) == len(valid), ids_np[r]
            # 20 points, k=10, exact rerank of all of them: exact top-10
            assert set(valid.tolist()) == set(np.asarray(gt_i)[r].tolist())
        assert np.isfinite(d_np).all()


def test_flat_index_packed_precision():
    from diskrag_tpu.ops.flat import FlatIndex

    pts, q = make_dataset(8000, 32, 16)
    idx = FlatIndex(
        pts, use_fused=True, fused_precision="int8_packed",
    )
    assert idx._fused_db_scale_global is not None
    # dot falls back to per-row int8 (packed fold is l2/cosine-only)
    idx_dot = FlatIndex(
        pts, metric="dot", use_fused=True, fused_precision="int8_packed",
    )
    assert idx_dot._fused_db_scale_global is None
    assert idx_dot._fused_db_scales is not None
    # D past the packed int32 range proof (192) must downgrade to the
    # per-row int8 scan — D=256 would overflow and corrupt winners
    import pytest

    from diskrag_tpu.ops.flat_scan_pallas import (
        quantize_int8_global, scan_bucketed_topk_packed,
    )

    rng = np.random.default_rng(0)
    big = rng.normal(size=(300, 256)).astype(np.float32)
    idx_big = FlatIndex(big, use_fused=True, fused_precision="int8_packed")
    assert idx_big._fused_db_scale_global is None
    assert idx_big._fused_db_scales is not None
    codes, scale = quantize_int8_global(jnp.asarray(big))
    qc, qs = quantize_int8_global(jnp.asarray(big[:4]))
    with pytest.raises(ValueError, match="packed scan caps D"):
        scan_bucketed_topk_packed(
            qc, qs, codes, jnp.sum(jnp.square(jnp.asarray(big)), -1), scale,
            interpret=True,
        )


def test_fused_scan_rerank_width_override():
    """rerank_width pins the candidate cut (serving's QPS/recall knob):
    narrow widths must still clear the bucket bound minus the expected
    ordering loss, width=k must work, and FlatIndex must plumb it."""
    from diskrag_tpu.ops.flat import FlatIndex
    from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

    pts, q = make_dataset(20000, 64, 64)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    codes, scales = quantize_int8(v)
    _, gt_i = brute_force_topk(jnp.asarray(q), v, k=10)
    for rw, floor in ((24, 0.97), (10, 0.85)):
        d, ids = flat_search_fused(
            jnp.asarray(q), codes, norms, v, k=10, n_buckets=2048,
            interpret=True, db_scales=scales, rerank_width=rw,
        )
        assert _recall(np.asarray(ids), np.asarray(gt_i)) >= floor
        assert (np.diff(np.asarray(d), axis=1) >= -1e-6).all()
    # width below k is clamped up to k, not an error
    d, ids = flat_search_fused(
        jnp.asarray(q), codes, norms, v, k=10, n_buckets=2048,
        interpret=True, db_scales=scales, rerank_width=4,
    )
    assert ids.shape == (64, 10)
    idx = FlatIndex(pts, use_fused=True, rerank_width=24)
    assert idx.rerank_width == 24


def test_topk_lanes_pallas_exact():
    """The Pallas cut kernel is EXACT top-kk (unlike approx_max_k):
    match a numpy argsort oracle, including ties (lowest lane wins),
    -inf rows, and non-multiple-of-block batch sizes."""
    from diskrag_tpu.ops.flat_scan_pallas import topk_lanes_pallas

    rng = np.random.default_rng(3)
    s = rng.normal(size=(37, 512)).astype(np.float32)
    s[5, 7] = s[5, 100] = 99.0  # tie at the top: lane 7 must win first
    s[11] = -np.inf      # empty row
    lanes = np.asarray(topk_lanes_pallas(jnp.asarray(s), 24, interpret=True))
    assert lanes.shape == (37, 24)
    order = np.argsort(-s, axis=1, kind="stable")[:, :24]
    for r in range(37):
        if r == 11:
            # exhausted row: every lane must be the out-of-range
            # sentinel NB, not a duplicated real lane
            assert (lanes[r] == 512).all()
            continue
        got, want = lanes[r], order[r]
        assert (np.sort(s[r][got]) == np.sort(s[r][want])).all(), r
    assert 7 in lanes[5][:24]


def test_fit_query_block_large_k_geometry():
    """Regression (large-k VMEM sizing): the fit formula must count the
    QB-independent double-buffered input tiles. At the k=200 geometry
    (NB widened to 16384, db_tile forced to match) the old formula
    returned QB=64 whose total working set blew the 16 MB scoped-VMEM
    limit; the corrected one must keep everything inside it."""
    from diskrag_tpu.ops.flat_scan_pallas import _fit_query_block

    d = 128
    for nb in (8192, 16384):
        t = nb
        for itemsize, state_b, norm_rows in ((1, 8, 2), (2, 8, 1)):
            qb = _fit_query_block(
                1024, t, nb, d,
                state_bytes=state_b, itemsize=itemsize, norm_rows=norm_rows,
                batch=1000,
            )
            assert qb >= 8 and qb % 8 == 0
            # multi-block model: inputs + score tile + DOUBLE-buffered
            # output state (what the real compiler charges when the
            # batch spans several query blocks)
            total = (
                qb * t * 4
                + 2 * qb * nb * state_b
                + 2 * (t * d * itemsize + norm_rows * t * 4)
            )
            assert total <= (16 << 20), (nb, itemsize, qb, total)
    # an impossible geometry must return 0, not a tiny-but-doomed block
    assert _fit_query_block(
        1024, 262144, 262144, d, state_bytes=4, itemsize=1
    ) == 0


def test_fused_search_large_k_matches_bruteforce():
    """flat_search_fused with a large k (widened NB) stays correct in
    interpret mode and agrees with the exact scan."""
    import jax.numpy as jnp

    from diskrag_tpu.ops.distance import brute_force_topk
    from diskrag_tpu.ops.flat_scan_pallas import (
        flat_search_fused,
        quantize_int8,
    )

    rng = np.random.default_rng(7)
    pts = rng.normal(size=(4096, 32)).astype(np.float32)
    q = rng.normal(size=(5, 32)).astype(np.float32)
    v = jnp.asarray(pts)
    codes, scales = quantize_int8(v)
    k = 48  # NB widens past the caller's request (50*47 > 1024)
    d_f, i_f = flat_search_fused(
        jnp.asarray(q), codes, jnp.sum(jnp.square(v), -1), v,
        k=k, metric="l2", n_buckets=1024, interpret=True,
        db_scales=scales,
    )
    d_bf, i_bf = brute_force_topk(jnp.asarray(q), v, k, "l2")
    overlap = np.mean([
        len(set(np.asarray(i_f)[r]) & set(np.asarray(i_bf)[r])) / k
        for r in range(5)
    ])
    assert overlap >= 0.9, overlap


def test_hier_scan_matches_packed_oracle():
    """Hierarchical packed fold (scan_bucketed_topk_hier): per-bucket
    winners must match the integer-score oracle exactly, across multiple
    (NB, T) geometries including partial final super-tiles, and NB must
    stay at the requested width (the flat packed fold would widen it
    past the 256-segment budget)."""
    from diskrag_tpu.ops.flat_scan_pallas import (
        quantize_int8_global,
        scan_bucketed_topk_hier,
    )

    rng = np.random.default_rng(3)
    for n, nb, tile in [(9000, 512, 2048), (3000, 256, 512),
                        (40_000, 512, 1024)]:
        db = rng.normal(size=(n, 64)).astype(np.float32)
        q = (
            db[rng.integers(0, n, 23)]
            + 0.1 * rng.normal(size=(23, 64)).astype(np.float32)
        )
        gcodes, gscale = quantize_int8_global(jnp.asarray(db))
        gq, gqs = quantize_int8_global(jnp.asarray(q))
        norms = jnp.sum(jnp.square(jnp.asarray(db)), -1)
        scores, ids = scan_bucketed_topk_hier(
            gq, gqs, gcodes, norms, gscale,
            n_buckets=nb, db_tile=tile, interpret=True,
        )
        assert ids.shape[1] == nb  # segment budget did not widen NB
        n_int = np.clip(
            np.round(np.asarray(norms) / (float(gscale) * float(gqs))),
            0, 1 << 21,
        ).astype(np.int64)
        cross = np.asarray(gq, np.int64) @ np.asarray(gcodes, np.int64).T
        score = 2 * cross - n_int[None, :]
        ids_np = np.asarray(ids)
        scores_np = np.asarray(scores)
        for b in range(0, 23, 5):
            for lane in range(0, nb, 113):
                cols = np.arange(lane, n, nb)
                best = score[b, cols].max()
                got = ids_np[b, lane]
                assert got >= 0 and got % nb == lane
                assert score[b, got] == best
                assert scores_np[b, lane] == float(score[b, got])


def test_hier_scan_end_to_end_recall():
    """Full path: hier scan -> cut -> exact rerank reaches the same
    recall as the flat packed path at equal bucket count."""
    from diskrag_tpu.ops.distance import Metric
    from diskrag_tpu.ops.flat_scan_pallas import (
        _rerank,
        quantize_int8_global,
        scan_bucketed_topk_hier,
    )

    pts, q = make_dataset(20000, 64, 64)
    v = jnp.asarray(pts)
    gcodes, gscale = quantize_int8_global(v)
    gq, gqs = quantize_int8_global(jnp.asarray(q))
    norms = jnp.sum(jnp.square(v), -1)
    scores, ids = scan_bucketed_topk_hier(
        gq, gqs, gcodes, norms, gscale,
        n_buckets=512, db_tile=2048, interpret=True,
    )
    d, top = _rerank(
        jnp.asarray(q), v, scores, ids, 10, 40, Metric.L2, interpret=True
    )
    _, gt = brute_force_topk(jnp.asarray(q), v, k=10)
    assert _recall(np.asarray(top), np.asarray(gt)) >= 0.97
    assert (np.diff(np.asarray(d), axis=1) >= -1e-6).all()


def test_prepadded_table_matches_unpadded():
    """The pre-padded table contract (build_packed_scan_table + n_valid)
    must return exactly what the default (pad-per-call) contract does,
    for both the flat packed and hierarchical folds, and through
    flat_search_fused. N is chosen NOT to be a granule multiple so the
    pads are real."""
    from diskrag_tpu.ops.flat_scan_pallas import (
        build_packed_scan_table,
        flat_search_fused,
        quantize_int8_global,
        scan_bucketed_topk_hier,
        scan_bucketed_topk_packed,
    )

    pts, q = make_dataset(5000, 48, 32)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    gcodes, gscale = quantize_int8_global(v)
    gq, gqs = quantize_int8_global(jnp.asarray(q))
    tcodes, nf, tscale, n = build_packed_scan_table(v, granule=4096)
    assert n == 5000 and tcodes.shape[0] == 8192
    assert np.asarray(tscale) == np.asarray(gscale)
    assert (np.asarray(tcodes[:n]) == np.asarray(gcodes)).all()
    assert np.isinf(np.asarray(nf[0, n:])).all()

    for fn in (scan_bucketed_topk_packed, scan_bucketed_topk_hier):
        s_ref, i_ref = fn(
            gq, gqs, gcodes, norms, gscale, n_buckets=512, interpret=True
        )
        s_tab, i_tab = fn(
            gq, gqs, tcodes, nf, tscale, n_buckets=512, interpret=True,
            n_valid=n,
        )
        assert (np.asarray(i_ref) == np.asarray(i_tab)).all(), fn.__name__
        assert (np.asarray(s_ref) == np.asarray(s_tab)).all(), fn.__name__

    d_ref, i_ref = flat_search_fused(
        jnp.asarray(q), gcodes, norms, v, k=10, db_scale_global=gscale,
        interpret=True,
    )
    d_tab, i_tab = flat_search_fused(
        jnp.asarray(q), tcodes, norms, v, k=10, db_scale_global=tscale,
        db_nf=nf, n_valid=n, interpret=True,
    )
    assert (np.asarray(i_ref) == np.asarray(i_tab)).all()
    np.testing.assert_allclose(np.asarray(d_ref), np.asarray(d_tab))

    # FlatIndex packed mode serves through the table and stays exact
    from diskrag_tpu.ops.flat import FlatIndex

    idx = FlatIndex(pts, use_fused=True, fused_precision="int8_packed")
    assert idx._fused_n_valid == 5000
    # the CPU backend can't execute the fused route un-interpreted, so
    # drive flat_search_fused directly through the index's stored table
    d_f, i_f = flat_search_fused(
        jnp.asarray(q), idx._fused_db, idx.norms_sq, idx.vectors, k=10,
        db_scale_global=idx._fused_db_scale_global,
        db_nf=idx._fused_nf, n_valid=idx._fused_n_valid, interpret=True,
    )
    assert (np.asarray(i_f) == np.asarray(i_tab)).all()


def test_epilogue_cut_matches_two_stage():
    """cut_kk (in-kernel top-kk extraction on the last tile) must select
    exactly the ids the two-stage path (scan state -> topk_lanes_pallas)
    selects, for both packed folds, including tie/exhaustion handling."""
    from diskrag_tpu.ops.flat_scan_pallas import (
        quantize_int8_global,
        scan_bucketed_topk_hier,
        scan_bucketed_topk_packed,
        topk_lanes_pallas,
    )

    pts, q = make_dataset(6000, 32, 24)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), -1)
    gcodes, gscale = quantize_int8_global(v)
    gq, gqs = quantize_int8_global(jnp.asarray(q))
    for fn in (scan_bucketed_topk_packed, scan_bucketed_topk_hier):
        scores, ids = fn(
            gq, gqs, gcodes, norms, gscale, n_buckets=256, interpret=True
        )
        take = topk_lanes_pallas(scores, 20, interpret=True)
        dead = take >= scores.shape[1]
        ref = np.asarray(jnp.where(
            dead, -1,
            jnp.take_along_axis(ids, jnp.where(dead, 0, take), axis=1),
        ))
        _, cut_ids = fn(
            gq, gqs, gcodes, norms, gscale, n_buckets=256, interpret=True,
            cut_kk=20,
        )
        assert cut_ids.shape == (24, 20)
        # the two-stage reference ranks f32-CAST packed values (lossy
        # above 2^24) while cut_kk extracts on exact int32, so two
        # packed values that collide after the cast may be ordered
        # either way: any id divergence must pair up id-for-id with an
        # exactly-equal f32 lane score (a cast collision or true tie)
        cut_np = np.asarray(cut_ids)
        scores_np = np.asarray(scores)
        nb = scores_np.shape[1]
        for b in range(cut_np.shape[0]):
            c, r = set(cut_np[b].tolist()), set(ref[b].tolist())
            assert (-1 in c) == (-1 in r), fn.__name__
            sc = sorted(scores_np[b, i % nb] for i in c - r if i >= 0)
            sr = sorted(scores_np[b, i % nb] for i in r - c if i >= 0)
            assert sc == sr, (fn.__name__, b, c - r, r - c)
