"""User-facing dataset benchmark — counterpart of the reference's
`dataset_benchmark.py`: load vectors (parquet/npy or a seeded synthetic
set), build, compute brute-force ground truth, sweep recall/latency/QPS
for the in-memory exact mode, the PQ mode, and the host-tier (disk-style)
mode.

Run:
  python -m diskrag_tpu.tools.dataset_benchmark --n 100000 --dim 128
  python -m diskrag_tpu.tools.dataset_benchmark --vectors data.npy \
      --queries q.npy
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def load_vectors(path: str) -> np.ndarray:
    """npy or parquet (any numeric columns / a single list column)."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    if path.endswith(".parquet"):
        import pandas as pd

        df = pd.read_parquet(path)
        first = df.iloc[:, 0]
        if first.dtype == object:  # list column
            return np.stack(first.to_numpy()).astype(np.float32)
        return df.to_numpy().astype(np.float32)
    raise ValueError(f"unsupported vector file: {path}")


def main() -> int:
    ap = argparse.ArgumentParser(description="diskrag_tpu dataset benchmark")
    ap.add_argument("--vectors", help="npy/parquet vectors (default: synthetic)")
    ap.add_argument("--queries", help="npy/parquet queries")
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--n-queries", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--R", type=int, default=32)
    ap.add_argument("--L-build", type=int, default=64)
    ap.add_argument("--alpha", type=float, default=1.2)
    ap.add_argument("--widths", default="32,48,64,96,128")
    ap.add_argument("--expand", default="1,4")
    ap.add_argument("--pq-m", type=int, default=0, help="0 = skip PQ sweep")
    ap.add_argument(
        "--host-tier", action="store_true",
        help="also sweep the host-offload tier over beam {24,32,48,64} — "
             "the counterpart of the reference's disk-mode sweep "
             "(dataset_benchmark.py:132-171)",
    )
    ap.add_argument("--build-method", choices=["knn", "wave"], default="knn")
    ap.add_argument(
        "--metric", choices=["l2", "cosine", "dot"], default="l2",
        help="distance metric (cosine covers the angular/GloVe-style "
             "configuration; the PQ sweep is L2-only and is skipped "
             "for other metrics)",
    )
    ap.add_argument("--json", action="store_true", help="JSON output only")
    args = ap.parse_args()

    from diskrag_tpu.benchmark import (
        ground_truth,
        make_dataset,
        sweep_exact,
        sweep_pq,
    )
    from diskrag_tpu.graph.build import build_vamana
    from diskrag_tpu.graph.knn_build import build_vamana_knn

    if args.vectors:
        pts = load_vectors(args.vectors)
        if args.queries:
            queries = load_vectors(args.queries)[: args.n_queries]
        else:
            rng = np.random.default_rng(0)
            qi = rng.integers(0, len(pts), size=args.n_queries)
            queries = pts[qi] + rng.normal(
                size=(args.n_queries, pts.shape[1])
            ).astype(np.float32) * 0.05
    else:
        pts, queries = make_dataset(args.n, args.dim, args.n_queries)

    widths = tuple(int(x) for x in args.widths.split(","))
    expands = tuple(int(x) for x in args.expand.split(","))

    t0 = time.perf_counter()
    if args.build_method == "knn":
        index = build_vamana_knn(
            pts, degree_bound=args.R, alpha=args.alpha, metric=args.metric,
        )
    else:
        index = build_vamana(
            pts, degree_bound=args.R, build_width=args.L_build,
            alpha=args.alpha, metric=args.metric,
        )
    build_s = time.perf_counter() - t0
    gt = ground_truth(pts, queries, args.k, metric=args.metric)

    points = sweep_exact(
        index, queries, gt, k=args.k, widths=widths, expand_widths=expands
    )
    if args.pq_m and args.metric != "l2":
        print(f"(--pq-m skipped: the ADC tables are L2-only, metric={args.metric})")
        args.pq_m = 0
    if args.pq_m:
        from diskrag_tpu.pq import ProductQuantizer

        pq = ProductQuantizer(n_subvectors=args.pq_m).fit(pts)
        codes = np.asarray(pq.encode(pts))
        points += sweep_pq(
            index, pq, codes, queries, gt, k=args.k, widths=widths,
            expand_widths=expands,
        )
    if args.host_tier:
        import tempfile

        from diskrag_tpu.benchmark import sweep_host_tier
        from diskrag_tpu.index.persist import save_index

        with tempfile.TemporaryDirectory() as td:
            save_index(td, index, write_compat=True, host_vectors=pts)
            points += sweep_host_tier(
                td, queries, gt, k=args.k, widths=(24, 32, 48, 64),
                expand_widths=(expands[-1],),
            )

    # process memory report — the reference's psutil monitor
    # (dataset_benchmark.py:23-25); resource is the always-available
    # stdlib fallback (ru_maxrss is KiB on linux)
    try:
        import psutil

        rss_mb = psutil.Process().memory_info().rss / 1e6
    except ImportError:
        import resource

        rss_mb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e3
    result = {
        "n": len(pts), "dim": pts.shape[1], "n_queries": len(queries),
        "R": args.R, "L_build": args.L_build, "alpha": args.alpha,
        "metric": args.metric,
        "build_method": args.build_method,
        "build_seconds": round(build_s, 1),
        "host_rss_mb": round(rss_mb, 1),
        "sweep": [
            {
                "mode": p.mode, "L": p.search_width, "E": p.expand_width,
                "recall": round(p.recall, 4), "qps": round(p.qps, 1),
                "latency_ms": round(p.mean_latency_ms, 3),
            }
            for p in points
        ],
    }
    if args.json:
        print(json.dumps(result))
    else:
        print(f"N={result['n']} dim={result['dim']} build={build_s:.1f}s")
        for p in result["sweep"]:
            print(
                f"  {p['mode']:<10} L={p['L']:<4} E={p['E']:<2} "
                f"recall@{args.k}={p['recall']:.4f} qps={p['qps']:>9.1f}"
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
