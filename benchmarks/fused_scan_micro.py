"""Microbenchmark of the fused flat-scan kernel (run on the real TPU).

Breaks the headline flat path into stages so kernel work can be
attributed: the bucketed scan alone, the full fused path (scan +
approx_max_k cut + f32 rerank), and a (db_tile, query_block, n_buckets)
sweep. Timing via diskrag_tpu.benchmark._measure (see CLAUDE.md — naive
block_until_ready timing lies on this platform).

    JAX_COMPILATION_CACHE_DIR=.jax_cache python benchmarks/fused_scan_micro.py \
        --n 200000 --queries 1000
"""

from __future__ import annotations

import argparse
import itertools
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--sweep", action="store_true",
        help="also sweep (db_tile, query_block, n_buckets)",
    )
    args = ap.parse_args()

    import jax.numpy as jnp

    from diskrag_tpu.benchmark import (
        _measure, ground_truth, make_dataset, recall_at_k,
    )
    from diskrag_tpu.ops.flat_scan_pallas import (
        flat_search_fused, quantize_int8, scan_bucketed_topk,
    )

    pts, queries = make_dataset(args.n, args.dim, args.queries)
    gt = ground_truth(pts, queries, args.k)
    v = jnp.asarray(pts)
    norms = jnp.sum(jnp.square(v), axis=-1)
    codes, scales = quantize_int8(v)
    qcodes, qscales = quantize_int8(jnp.asarray(queries))
    q = jnp.asarray(queries)
    nq = args.queries

    def report(name, dt, ids=None, extra=None):
        line = {"stage": name, "qps": round(nq / dt, 1),
                "batch_ms": round(dt * 1e3, 3)}
        if ids is not None:
            line["recall"] = round(recall_at_k(ids, gt, args.k), 4)
        if extra:
            line.update(extra)
        print(json.dumps(line))

    # stage 1: the Pallas scan alone (int8), default blocks
    dt, _ = _measure(
        lambda: scan_bucketed_topk(
            qcodes, codes, norms, q_scales=qscales, db_scales=scales,
        ),
        nq, args.repeats,
    )
    report("scan_only_int8", dt)

    # stage 2: scan alone, bf16
    vb = v.astype(jnp.bfloat16)
    qb = q.astype(jnp.bfloat16)
    dt, _ = _measure(
        lambda: scan_bucketed_topk(qb, vb, norms), nq, args.repeats
    )
    report("scan_only_bf16", dt)

    # stage 3: full fused path (scan + candidate cut + f32 rerank)
    def full():
        return flat_search_fused(
            q, codes, norms, v, k=args.k, db_scales=scales,
        )

    dt, (d, ids) = _measure(full, nq, args.repeats)
    import numpy as np

    report("fused_full_int8", dt, np.asarray(ids))

    # stage 4: packed-int32 fold (global scales)
    from diskrag_tpu.ops.flat_scan_pallas import (
        quantize_int8_global, scan_bucketed_topk_packed,
    )

    gcodes, gscale = quantize_int8_global(v)
    gq, gqs = quantize_int8_global(q)
    dt, _ = _measure(
        lambda: scan_bucketed_topk_packed(gq, gqs, gcodes, norms, gscale),
        nq, args.repeats,
    )
    report("scan_only_packed", dt)

    dt, (d, ids) = _measure(
        lambda: flat_search_fused(
            q, gcodes, norms, v, k=args.k, db_scale_global=gscale,
        ),
        nq, args.repeats,
    )
    report("fused_full_packed", dt, np.asarray(ids))

    # stage 4b: hierarchical packed fold (NB free of the segment budget)
    from diskrag_tpu.ops.flat_scan_pallas import scan_bucketed_topk_hier

    for pipe, hnb, htile in (
        (False, 512, 2048), (False, 1024, 2048), (False, 512, 4096),
        (True, 512, 1024), (True, 512, 2048), (True, 1024, 2048),
    ):
        tag = "pipe" if pipe else "plain"
        try:
            dt, _ = _measure(
                lambda: scan_bucketed_topk_hier(
                    gq, gqs, gcodes, norms, gscale,
                    n_buckets=hnb, db_tile=htile, pipelined=pipe,
                ),
                nq, args.repeats,
            )
            report(f"scan_only_hier_{tag}_nb{hnb}_t{htile}", dt)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "stage": f"scan_only_hier_{tag}_nb{hnb}_t{htile}",
                "error": f"{type(e).__name__}: {e}"[:200],
            }))

    # stage 5: rerank breakdown on the packed scan's output (the
    # post-scan stages dominate the fused path once the scan is packed)
    import jax

    from diskrag_tpu.ops.flat_scan_pallas import _rerank
    from diskrag_tpu.ops.distance import Metric

    scores, cids = scan_bucketed_topk_packed(gq, gqs, gcodes, norms, gscale)
    scores.block_until_ready()

    cut = jax.jit(lambda s, i: jax.lax.approx_max_k(s, 40))
    dt, _ = _measure(lambda: cut(scores, cids), nq, args.repeats)
    report("rerank_cut_only", dt)

    # v must be an ARGUMENT: a closed-over 1M x 128 f32 constant gets
    # embedded in the compile request (HTTP 413 from the remote helper)
    rr = jax.jit(
        lambda qq, vv, s, i: _rerank(qq, vv, s, i, args.k, 40, Metric.L2)
    )
    dt, (d, ids) = _measure(lambda: rr(q, v, scores, cids), nq, args.repeats)
    report("rerank_full", dt, np.asarray(ids))

    # matmul-only floor at the hier geometry: same grid/DMA, the fold
    # replaced by one [QB, NB]-wide accumulate — isolates MXU + input
    # DMA from VPU fold cost
    from jax.experimental import pallas as pl

    try:
        from jax.experimental.pallas import tpu as pltpu
    except ImportError:
        pltpu = None

    def _mm_only(q_ref, db_ref, acc_ref):
        t_idx = pl.program_id(1)

        @pl.when(t_idx == 0)
        def _init():
            acc_ref[...] = jnp.zeros_like(acc_ref)

        cross = jax.lax.dot_general(
            q_ref[...], db_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        acc_ref[...] += cross[:, : acc_ref.shape[1]]

    def mm_only(tile, nb_out=512, qb=1024):
        n = gcodes.shape[0]
        d = gcodes.shape[1]
        pad_n = (-n) % tile
        dbp = jnp.pad(gcodes, ((0, pad_n), (0, 0)))
        b = gq.shape[0]
        qb = min(qb, max(128, -(-b // 128) * 128))
        qp = jnp.pad(gq, ((0, (-b) % qb), (0, 0)))
        kw = {}
        if pltpu is not None:
            kw["compiler_params"] = pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"))
        return pl.pallas_call(
            _mm_only,
            grid=(qp.shape[0] // qb, dbp.shape[0] // tile),
            in_specs=[
                pl.BlockSpec((qb, d), lambda i, j: (i, 0)),
                pl.BlockSpec((tile, d), lambda i, j: (j, 0)),
            ],
            out_specs=pl.BlockSpec((qb, nb_out), lambda i, j: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((qp.shape[0], nb_out), jnp.int32),
            **kw,
        )(qp, dbp)

    mmj = jax.jit(mm_only, static_argnums=(0,))
    for tile in (2048, 4096):
        dt, _ = _measure(lambda: mmj(tile), nq, args.repeats)
        report(f"scan_mm_only_t{tile}", dt)

    # tail decomposition on a hier-width score block (NB=512): the cut
    # (pallas extraction), the candidate gather + exact distances +
    # final top-k, at two rerank widths
    from diskrag_tpu.ops.flat_scan_pallas import (
        scan_bucketed_topk_hier, topk_lanes_pallas,
    )
    from diskrag_tpu.ops.distance import rerank_exact_topk

    try:
        hs, hi = scan_bucketed_topk_hier(gq, gqs, gcodes, norms, gscale)
        np.asarray(hi[:1])
    except Exception as e:  # noqa: BLE001 — keep later stages alive
        print(json.dumps({
            "stage": "tail_cut_source_hier",
            "error": f"{type(e).__name__}: {e}"[:200],
        }))
        hs, hi = scan_bucketed_topk_packed(gq, gqs, gcodes, norms, gscale)
    for kk in (20, 40):
        dt, _ = _measure(
            lambda: topk_lanes_pallas(hs, kk), nq, args.repeats
        )
        report(f"tail_cut_pallas_nb512_kk{kk}", dt)

        cut = jax.jit(
            lambda s, i, _kk=kk: jnp.where(
                topk_lanes_pallas(s, _kk) >= s.shape[1], -1,
                jnp.take_along_axis(
                    i,
                    jnp.minimum(topk_lanes_pallas(s, _kk), s.shape[1] - 1),
                    axis=1,
                ),
            )
        )
        cids_kk = cut(hs, hi)
        np.asarray(cids_kk[:1])
        g = jax.jit(
            lambda qq, vv, ii, _kk=kk: rerank_exact_topk(
                qq, vv, ii, args.k, Metric.L2
            )
        )
        dt, _ = _measure(lambda: g(q, v, cids_kk), nq, args.repeats)
        report(f"tail_gather_exact_kk{kk}", dt)

    # pre-padded table contract (round 3): no per-call db pad copy or
    # norm-table pipeline — the serving path FlatIndex actually uses
    from diskrag_tpu.ops.flat_scan_pallas import build_packed_scan_table

    tcodes, tnf, tscale, tn = build_packed_scan_table(v)
    np.asarray(tnf[0, :1])
    dt, _ = _measure(
        lambda: scan_bucketed_topk_packed(
            gq, gqs, tcodes, tnf, tscale, n_valid=tn
        ),
        nq, args.repeats,
    )
    report("scan_only_packed_table", dt)
    dt, _ = _measure(
        lambda: scan_bucketed_topk_hier(
            gq, gqs, tcodes, tnf, tscale, n_valid=tn
        ),
        nq, args.repeats,
    )
    report("scan_only_hier_table", dt)
    for rw in (None, 20):
        dt, (d, ids) = _measure(
            lambda: flat_search_fused(
                q, tcodes, norms, v, k=args.k, db_scale_global=tscale,
                db_nf=tnf, n_valid=tn, rerank_width=rw,
            ),
            nq, args.repeats,
        )
        report(f"fused_full_table_rr{rw or 'def'}", dt, np.asarray(ids))

    # no-rerank variant: trust packed kernel scores outright
    def norerank(s, i):
        top_s, take = jax.lax.approx_max_k(s, args.k)
        return top_s, jnp.take_along_axis(i, take, axis=1)

    nr = jax.jit(norerank)
    dt, (d, ids) = _measure(lambda: nr(scores, cids), nq, args.repeats)
    report("packed_no_rerank", dt, np.asarray(ids))

    if not args.sweep:
        return
    for tile, qblk, nb in itertools.product(
        (2048, 4096, 8192), (256, 512, 1024), (512, 1024)
    ):
        try:
            dt, (d, ids) = _measure(
                lambda: flat_search_fused(
                    q, codes, norms, v, k=args.k, db_scales=scales,
                    db_tile=tile, query_block=qblk, n_buckets=nb,
                ),
                nq, args.repeats,
            )
        except Exception as e:  # VMEM overflow compiles fail loudly
            print(json.dumps({
                "stage": f"sweep t{tile} qb{qblk} nb{nb}",
                "error": str(e)[:120],
            }))
            continue
        report(
            f"sweep", dt, np.asarray(ids),
            {"db_tile": tile, "query_block": qblk, "n_buckets": nb},
        )


if __name__ == "__main__":
    main()
