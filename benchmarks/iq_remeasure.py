#!/usr/bin/env python3
"""Post-fairness-fix re-measure of the iq tier operating points at 200k
(sweep_iq now times the per-chunk query-table prep inside the measured
region, benchmark.py 2026-08-19). Prints one JSON line.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/iq_remeasure.py
"""

import json
import os
import pathlib

os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    str(pathlib.Path(__file__).resolve().parent.parent / ".jax_cache"),
)
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "2")

# env vars alone are ignored when sitecustomize already imported jax
# (CLAUDE.md 2026-08-21); bind the live config too
try:
    import sys as _sys
    _sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from diskrag_tpu.utils.compile_cache import enable_compilation_cache
    enable_compilation_cache(seed=False)
except Exception:
    pass

import numpy as np

N = int(os.environ.get("BENCH_N", "200000"))
DIM = int(os.environ.get("BENCH_DIM", "128"))
N_QUERIES = 1000
K = 10


def main():
    from diskrag_tpu.benchmark import (
        ground_truth,
        make_dataset,
        sweep_iq,
    )
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.pq import IntQuantizer

    pts, queries = make_dataset(N, DIM, N_QUERIES)
    gt = ground_truth(pts, queries, K)
    index = build_vamana_knn(pts, degree_bound=48, alpha=1.2, seed=0)

    iq8 = IntQuantizer(bits=8).fit(pts, seed=0)
    points = sweep_iq(index, iq8, iq8.encode(pts), queries, gt, k=K,
                      widths=(16, 24), expand_widths=(8,))
    iq4 = IntQuantizer(bits=4, n_cells=1024).fit(pts, seed=0)
    points += sweep_iq(index, iq4, iq4.encode(pts), queries, gt, k=K,
                       widths=(32,), expand_widths=(8,))
    print(json.dumps({
        "config": f"iq-remeasure-{N}",
        "sweep": [
            {"mode": p.mode, "L": p.search_width, "E": p.expand_width,
             "recall": round(p.recall, 4), "qps": round(p.qps, 1)}
            for p in points
        ],
    }))


if __name__ == "__main__":
    main()
