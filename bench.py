#!/usr/bin/env python3
"""Driver benchmark: prints ONE JSON line with the metric of record.

Metric: QPS/chip at recall@10 >= 0.95 on a seeded SIFT-like clustered
dataset (128-d), plus Vamana build time. `vs_baseline` compares against
the reference CPU implementation measured on this machine with the same
protocol (see benchmarks/reference_baseline.py; value stored in
benchmarks/baseline_measured.json).

Wall budget: the driver cap is ~30 min and the shared tunnel has real
outage windows (a 20-min stall was observed 2026-08-19). Every stage
past the core 200k flat+graph sweep is gated on remaining budget and
wrapped so a failure records an error field instead of killing the run —
the JSON line is emitted no matter which stages were skipped.

Env knobs: BENCH_N (default 200000), BENCH_QUERIES (1000), BENCH_DIM
(128), BENCH_BUDGET_S (default 1560 = 26 min), BENCH_1M (default 1),
BENCH_SERVING (default 1).
"""

import json
import os
import pathlib
import sys
import time


def _enable_compilation_cache() -> None:
    """Persistent XLA compilation cache: verified to work through the
    axon tunnel (cross-process compile reuse, ~5x faster warmup), plus
    the shipped pre-warmed entries for the standard geometries so a
    fresh checkout's first build doesn't pay compile-everything
    (utils/compile_cache.py). Build timing below is honest either way —
    the first full run pays whatever compiles remain; re-runs measure
    steady-state."""
    from diskrag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()


class _Budget:
    """Elapsed-wall gate: stage runs only if its estimate fits in what's
    left. Estimates are deliberately coarse (warm-cache walls measured
    2026-08); the point is that a tunnel stall early in the run makes
    later stages skip instead of blowing the driver cap."""

    def __init__(self, total_s: float):
        self.t0 = time.monotonic()
        self.total = total_s
        self.skipped: list[str] = []

    @property
    def elapsed(self) -> float:
        return time.monotonic() - self.t0

    def allow(self, stage: str, need_s: float) -> bool:
        if self.elapsed + need_s > self.total:
            self.skipped.append(stage)
            print(
                f"# budget: skipping {stage} ({self.elapsed:.0f}s elapsed "
                f"+ ~{need_s:.0f}s needed > {self.total:.0f}s cap)",
                file=sys.stderr,
            )
            return False
        return True


def _sweep_scale(
    n: int, dim: int, n_queries: int, k: int, *, compact: bool, bud: _Budget
):
    """Full sweep at one dataset scale. `compact` trims to the cheap
    flagship points (used for the secondary 1M stage so total bench wall
    time stays under the ~30 min cap)."""
    import numpy as np

    from diskrag_tpu.benchmark import (
        ground_truth,
        make_dataset,
        sweep_exact,
        sweep_flat,
        sweep_iq,
        sweep_ivf,
        sweep_pq,
    )
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.pq import IntQuantizer, ResidualPQ

    tag = f"{n // 1000}k"
    pts, queries = make_dataset(n, dim, n_queries)
    gt = ground_truth(pts, queries, k)
    timings = {}

    # MXU-native in-HBM modes first (flat scan + IVF tiles)
    points = sweep_flat(pts, queries, gt, k=k)
    if not compact and bud.allow(f"ivf_{tag}", 150):
        ivf_points, (ivf_cold, ivf_warm) = sweep_ivf(pts, queries, gt, k=k)
        points += ivf_points
        timings["ivf_build_seconds_cold"] = round(ivf_cold, 1)
        timings["ivf_build_seconds"] = round(ivf_warm, 1)

    # graph modes (the beyond-HBM engine, benched in-HBM for parity).
    # Built with the kNN-based fast path (exact-kNN MXU scans + global
    # alpha-prune + reverse pass + k-means entry points). Built twice:
    # the first build pays one-time process costs (XLA compiles unless
    # the persistent cache is warm, plus the dataset upload over the
    # tunnel); the second measures the steady-state build the CPU
    # baseline number is comparable to (the C++ baseline has no compile
    # step to amortize). Both are reported.
    t0 = time.perf_counter()
    index = build_vamana_knn(pts, degree_bound=48, alpha=1.2, seed=0)
    timings["build_seconds_cold"] = round(time.perf_counter() - t0, 1)
    t0 = time.perf_counter()
    index = build_vamana_knn(pts, degree_bound=48, alpha=1.2, seed=0)
    timings["build_seconds"] = round(time.perf_counter() - t0, 1)
    # post-frontier-dedup-fix operating points: each L explores strictly
    # more, so the efficient configs are narrower beams + wider expansion
    points += sweep_exact(
        index, queries, gt, k=k,
        widths=(16,) if compact else (16, 24),
        expand_widths=(12,) if compact else (8, 12),
    )

    # compressed-traversal tiers (the reference's PQ-accelerated serving
    # mode, search_engine.py:381-506, split TPU-first into a speed tier
    # and a max-compression tier — measured 2026-08 at 200k):
    #   iq8   (intq rows, MXU-scored):  L=16/E=8  0.995 @ 58k QPS
    #   iq4c  (68 B/pt):                L=32/E=8  0.992 @ 25k QPS
    #   rpq32 (residual PQ, ~38 B/pt):  L=64/E=4  0.991 @ 3.2k QPS
    if bud.allow(f"iq8_{tag}", 120):
        iq8 = IntQuantizer(bits=8).fit(pts, seed=0)
        points += sweep_iq(
            index, iq8, iq8.encode(pts), queries, gt, k=k,
            widths=(16,) if compact else (16, 24), expand_widths=(8,),
        )
    if not compact:
        if bud.allow(f"iq4_{tag}", 120):
            iq4 = IntQuantizer(bits=4, n_cells=1024).fit(pts, seed=0)
            points += sweep_iq(
                index, iq4, iq4.encode(pts), queries, gt, k=k,
                widths=(32,), expand_widths=(8,),
            )
        if bud.allow(f"rpq_{tag}", 180):
            rpq = ResidualPQ(n_subvectors=32).fit(pts, seed=0)
            codes, cids = rpq.encode(pts)
            points += sweep_pq(
                index, rpq, np.asarray(codes), queries, gt, k=k,
                widths=(32, 64), expand_widths=(4,),
                coarse_ids=np.asarray(cids),
            )
    return points, timings, (pts, queries, index)


def main() -> None:
    _enable_compilation_cache()
    n = int(os.environ.get("BENCH_N", "200000"))
    dim = int(os.environ.get("BENCH_DIM", "128"))
    n_queries = int(os.environ.get("BENCH_QUERIES", "1000"))
    k = 10
    bud = _Budget(float(os.environ.get("BENCH_BUDGET_S", "1560")))

    from diskrag_tpu.benchmark import best_qps_at_recall

    def fmt(points):
        return [
            {
                "L": p.search_width,
                "E": p.expand_width,
                "recall": round(p.recall, 4),
                "qps": round(p.qps, 1),
                "mode": p.mode,
            }
            for p in points
        ]

    record = {
        "metric": "qps_per_chip_at_recall10>=0.95_sift-like-%dk" % (n // 1000),
        "value": 0.0,
        "unit": "qps",
        "vs_baseline": None,
    }
    try:
        points, timings, (pts, queries, index) = _sweep_scale(
            n, dim, n_queries, k, compact=False, bud=bud
        )
        best = best_qps_at_recall(points, 0.95)
        if best is None:
            # report the highest-recall point so the driver still gets a line
            best = max(points, key=lambda p: p.recall)

        baseline_path = (
            pathlib.Path(__file__).parent / "benchmarks" /
            "baseline_measured.json"
        )
        vs_baseline = None
        if baseline_path.exists():
            base = json.loads(baseline_path.read_text())
            base_qps = base.get("qps_at_recall_0.95") or base.get("best_qps")
            if base_qps:
                vs_baseline = best.qps / base_qps

        record.update(
            value=round(best.qps, 1),
            vs_baseline=round(vs_baseline, 2) if vs_baseline else None,
            recall=round(best.recall, 4),
            search_width=best.search_width,
            mode=best.mode,
            **timings,
        )
        record["sweep"] = fmt(points)
    except Exception as e:  # noqa: BLE001 — the line must still print
        record["error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(record))
        raise SystemExit(1)

    # engine + HTTP serving throughput (VERDICT r2 #6): the number a
    # user actually gets — search_many / POST /search-batch at B=512,
    # including the packed result fetch and JSON assembly
    if os.environ.get("BENCH_SERVING", "1") == "1" and bud.allow(
        "serving", 300
    ):
        try:
            import numpy as np

            sys.path.insert(0, str(pathlib.Path(__file__).parent))
            from benchmarks.serving_bench import measure_serving

            serving = measure_serving(
                pts, np.asarray(queries), index=index, batches=(512,),
                k=k, repeats=5,
            )
            record["serving_qps_b512"] = {
                m: round(rows[0]["qps"], 1)
                for m, rows in serving.items()
                if isinstance(rows, list)
            }
            record["serving"] = serving
        except Exception as e:  # noqa: BLE001
            record["serving_error"] = f"{type(e).__name__}: {e}"

    # secondary 1M stage (VERDICT r1 #9: the north-star names SIFT1M) —
    # a compact sweep so the driver record tracks the million-point
    # operating points every round. Disable with BENCH_1M=0.
    if (
        n == 200_000
        and os.environ.get("BENCH_1M", "1") == "1"
        and bud.allow("1m_stage", 600)
    ):
        try:
            points_1m, timings_1m, _ = _sweep_scale(
                1_000_000, dim, n_queries, k, compact=True, bud=bud
            )
            best_1m = best_qps_at_recall(points_1m, 0.95)
            record["1m"] = {
                "qps_at_recall0.95": (
                    round(best_1m.qps, 1) if best_1m else None
                ),
                "recall": round(best_1m.recall, 4) if best_1m else None,
                "mode": best_1m.mode if best_1m else None,
                **timings_1m,
                "sweep": fmt(points_1m),
            }
        except Exception as e:  # noqa: BLE001
            record["1m_error"] = f"{type(e).__name__}: {e}"

    if bud.skipped:
        record["budget_skipped"] = bud.skipped
    record["bench_wall_seconds"] = round(bud.elapsed, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    sys.exit(main())
