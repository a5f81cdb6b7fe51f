#!/usr/bin/env python3
"""Driver benchmark: prints ONE JSON line with the metric of record.

Metric: QPS/chip at recall@10 >= 0.95 on a seeded SIFT-like clustered
dataset (128-d), plus Vamana build time. `vs_baseline` compares against
the reference CPU implementation measured on this machine with the same
protocol (see benchmarks/reference_baseline.py; value stored in
benchmarks/baseline_measured.json).

Env knobs: BENCH_N (default 200000), BENCH_QUERIES (1000), BENCH_DIM (128).
"""

import json
import os
import pathlib
import sys
import time


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: verified to work through the
    axon tunnel (cross-process compile reuse, ~5x faster warmup). Build
    timing below is honest either way — the first full run pays the
    compiles; re-runs measure steady-state."""
    os.environ.setdefault(
        "JAX_COMPILATION_CACHE_DIR",
        str(pathlib.Path(__file__).parent / ".jax_cache"),
    )
    os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")


def main() -> None:
    _enable_compilation_cache()
    n = int(os.environ.get("BENCH_N", "200000"))
    dim = int(os.environ.get("BENCH_DIM", "128"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "1000"))
    k = 10

    import numpy as np

    from diskrag_tpu.benchmark import (
        best_qps_at_recall,
        ground_truth,
        make_dataset,
        sweep_exact,
        sweep_flat,
        sweep_ivf,
        sweep_pq,
    )
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.pq import ProductQuantizer

    pts, queries = make_dataset(n, dim, n_queries)
    gt = ground_truth(pts, queries, k)

    # MXU-native in-HBM modes first (flat scan + IVF tiles)
    points = sweep_flat(pts, queries, gt, k=k)
    ivf_points, ivf_build_seconds = sweep_ivf(pts, queries, gt, k=k)
    points += ivf_points

    # graph modes (the beyond-HBM engine, benched in-HBM for parity).
    # Built with the kNN-based fast path (exact-kNN MXU scans + global
    # alpha-prune + reverse pass + k-means entry points). Built twice:
    # the first build pays one-time process costs (XLA compiles unless
    # the persistent cache is warm, plus the ~100MB dataset upload over
    # the tunnel); the second measures the steady-state build the CPU
    # baseline number is comparable to (the C++ baseline has no compile
    # step to amortize). Both are reported.
    t0 = time.perf_counter()
    index = build_vamana_knn(pts, degree_bound=48, alpha=1.2, seed=0)
    build_seconds_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    index = build_vamana_knn(pts, degree_bound=48, alpha=1.2, seed=0)
    build_seconds = time.perf_counter() - t0
    # post-frontier-dedup-fix operating points: each L explores strictly
    # more, so the efficient configs are narrower beams + wider expansion
    points += sweep_exact(
        index, queries, gt, k=k, widths=(16, 24, 32),
        expand_widths=(8, 12),
    )
    pq = ProductQuantizer(n_subvectors=32).fit(pts, seed=0)
    codes = np.asarray(pq.encode(pts))
    points += sweep_pq(
        index, pq, codes, queries, gt, k=k, widths=(96,),
        expand_widths=(2,),
    )

    best = best_qps_at_recall(points, 0.95)
    if best is None:
        # report the highest-recall point so the driver still gets a line
        best = max(points, key=lambda p: p.recall)

    baseline_path = pathlib.Path(__file__).parent / "benchmarks" / "baseline_measured.json"
    vs_baseline = None
    if baseline_path.exists():
        base = json.loads(baseline_path.read_text())
        base_qps = base.get("qps_at_recall_0.95") or base.get("best_qps")
        if base_qps:
            vs_baseline = best.qps / base_qps

    print(
        json.dumps(
            {
                "metric": "qps_per_chip_at_recall10>=0.95_sift-like-%dk" % (n // 1000),
                "value": round(best.qps, 1),
                "unit": "qps",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
                "recall": round(best.recall, 4),
                "search_width": best.search_width,
                "mode": best.mode,
                "build_seconds": round(build_seconds, 1),
                "build_seconds_cold": round(build_seconds_cold, 1),
                "ivf_build_seconds": round(ivf_build_seconds, 1),
                "sweep": [
                    {
                        "L": p.search_width,
                        "E": p.expand_width,
                        "recall": round(p.recall, 4),
                        "qps": round(p.qps, 1),
                        "mode": p.mode,
                    }
                    for p in points
                ],
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
