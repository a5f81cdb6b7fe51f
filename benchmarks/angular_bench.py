#!/usr/bin/env python3
"""On-chip angular-config quantized-tier measurement (VERDICT r1 #10).

Round 1 measured the plain-PQ ADC traversal collapsing to 0.536 recall
on the normalized 1.2M config (docs/PERFORMANCE.md "Angular / cosine
configuration"). This re-measures the compressed tiers that replaced it
in round 2 — IntQuantizer (iq8) and ResidualPQ (rpq m=32) — on the same
dataset shape: unit-normalized clustered vectors, normalize-then-L2 form
(cosine ranking == L2 ranking on normalized data).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/angular_bench.py
"""

import json
import os
import pathlib
import time

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

N = int(os.environ.get("BENCH_N", "1200000"))
DIM = int(os.environ.get("BENCH_DIM", "128"))
N_QUERIES = 1000
K = 10


def _dump(points):
    print(json.dumps([
        {"mode": p.mode, "L": p.search_width, "E": p.expand_width,
         "recall": round(p.recall, 4), "qps": round(p.qps, 1)}
        for p in points
    ]), flush=True)


def main():
    from diskrag_tpu.benchmark import (
        ground_truth,
        make_dataset,
        sweep_exact,
        sweep_iq,
        sweep_pq,
    )
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.pq import IntQuantizer, ResidualPQ

    pts, queries = make_dataset(N, DIM, N_QUERIES)
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)
    gt = ground_truth(pts, queries, K)

    t0 = time.perf_counter()
    index = build_vamana_knn(pts, degree_bound=32, alpha=1.2, seed=0)
    build_s = time.perf_counter() - t0
    print(f"build {build_s:.1f}s", flush=True)

    points = sweep_exact(index, queries, gt, k=K, widths=(16, 32),
                         expand_widths=(8,))
    _dump(points)

    iq8 = IntQuantizer(bits=8).fit(pts, seed=0)
    points += sweep_iq(index, iq8, iq8.encode(pts), queries, gt, k=K,
                       widths=(16, 32), expand_widths=(8,))
    _dump(points)

    rpq = ResidualPQ(n_subvectors=32).fit(pts, seed=0)
    codes, cids = rpq.encode(pts)
    points += sweep_pq(index, rpq, np.asarray(codes), queries, gt, k=K,
                       widths=(32, 64), expand_widths=(4,),
                       coarse_ids=np.asarray(cids))
    _dump(points)

    # VERDICT r2 #8: can residual-PQ clear 0.95 on angular at all?
    # Bigger sub-vector budget + 4x coarse cells (residuals on a unit
    # sphere carry most of the signal in the cell assignment) + wider
    # beams. If this still lands short, the angular recommendation is
    # scoped to iq tiers and rpq rows document the limitation.
    # n_coarse=2048, not 4096: k=4096 k-means at d=128/train=262k hits
    # an XLA TPU compiler CHECK-crash (fusion_util TransformWindow, probed
    # 2026-08-21 — fails at any chunk size; 2048 compiles fine)
    rpq64 = ResidualPQ(n_subvectors=64, n_coarse=2048).fit(pts, seed=0)
    codes64, cids64 = rpq64.encode(pts)
    points += sweep_pq(index, rpq64, np.asarray(codes64), queries, gt,
                       k=K, widths=(64, 96), expand_widths=(4,),
                       coarse_ids=np.asarray(cids64))

    out = {
        "config": f"angular-normalized-{N}",
        "build_seconds": round(build_s, 1),
        "measured": time.strftime("%Y-%m-%d"),
        "sweep": [
            {"mode": p.mode, "L": p.search_width, "E": p.expand_width,
             "recall": round(p.recall, 4), "qps": round(p.qps, 1)}
            for p in points
        ],
    }
    print(json.dumps(out))
    path = pathlib.Path(__file__).resolve().parent / "last_angular_tpu.json"
    path.write_text(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
