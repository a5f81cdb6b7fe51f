#!/usr/bin/env python3
"""On-chip streaming-ingest measurement (docs/PERFORMANCE.md "Streaming
ingest"; VERDICT r1 #6 done-criterion: sustained ingest rate + recall
held during ingest at 200k base scale).

Protocol: build a 200k-base Vamana graph, then stream `STREAM_N` new
points through `StreamingIndex.insert` in `BATCH`-sized batches, timing
the whole ingest wall (appends + every merge it triggers). Recall is
probed mid-stream (buffer half full) and post-stream against an exact
oracle over the full live set. Two buffer configs: one whose merges take
the bulk-rebuild path and one sized for the insert-wave path.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/streaming_bench.py
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

BASE_N = int(os.environ.get("BASE_N", "200000"))
STREAM_N = int(os.environ.get("STREAM_N", "131072"))
BATCH = int(os.environ.get("BATCH", "1024"))
DIM = int(os.environ.get("BENCH_DIM", "128"))
N_QUERIES = 1000
K = 10


def main():
    import jax.numpy as jnp

    from diskrag_tpu.benchmark import ground_truth, make_dataset, recall_at_k
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.index.streaming import StreamingIndex

    pts, queries = make_dataset(BASE_N + STREAM_N, DIM, N_QUERIES)
    base, stream = pts[:BASE_N], pts[BASE_N:]

    print(f"base build ({BASE_N})...", flush=True)
    t0 = time.perf_counter()
    index = build_vamana_knn(base, degree_bound=48, alpha=1.2, seed=0)
    print(f"  {time.perf_counter() - t0:.1f}s", flush=True)

    configs = [(16384, 0.125), (32768, 0.25), (65536, 0.125)]
    sel = os.environ.get("STREAM_CONFIGS")
    if sel:  # e.g. STREAM_CONFIGS="16384:0.125,32768:0.25"
        configs = [
            (int(c.split(":")[0]), float(c.split(":")[1]))
            for c in sel.split(",")
        ]
    results = []
    merge_method = os.environ.get("MERGE_METHOD", "knn")
    for capacity, frac in configs:
        # capacity 0 = the auto-sized default (VERDICT r3 #5 done
        # criterion: default-constructed streaming within 10% of the
        # hand-tuned rate)
        idx = StreamingIndex(
            index, buffer_capacity=capacity or None,
            merge_insert_max_fraction=frac,
            merge_method=merge_method,
            # preallocate the run's ingest (what a long-running service
            # does): without this, ONE geometric growth event fires
            # mid-stream — a multi-GB reallocation plus fresh compiles
            # of every jitted program at the new padded shape, inside
            # the timed region (measured 2026-08-19 at 1M: growth
            # compiles dominated the ingest wall, 1.4k/s vs the
            # steady-state rate)
            reserve_inserts=STREAM_N,
        )
        # warm the merged-search + append + MERGE compiles out of the
        # timed region — the merge warmup must run at the real shapes
        # (a full-capacity merge: sub-waves + reverse slices), or the
        # first timed config eats every compile and the next config
        # inherits them warm (measured 2026-08-19: 619/s vs 5,650/s for
        # two configs whose steady-state rates are ~2.8k and ~7k)
        capacity = idx.capacity  # resolved (auto or explicit)
        warm_n = capacity
        for off in range(0, warm_n, BATCH):
            idx.insert(stream[off : off + BATCH])
        idx.merge()
        idx.search(queries, k=K, search_width=32)

        probes = []
        t0 = time.perf_counter()
        for off in range(warm_n, STREAM_N, BATCH):
            idx.insert(stream[off : off + BATCH])
            if idx.n_buffered == capacity // 2 and len(probes) < 2:
                # mid-stream recall probe (excluded from the rate: it is
                # a serving-path call, not ingest work)
                t_probe = time.perf_counter()
                live = np.concatenate(
                    [base, stream[: off + BATCH]]
                )
                gt = ground_truth(live, queries, K)
                ids, _ = idx.search(queries, k=K, search_width=32)
                probes.append(
                    {
                        "n_live": int(idx.n_total_live),
                        "n_buffered": int(idx.n_buffered),
                        "recall": round(recall_at_k(np.asarray(ids), gt, K), 4),
                    }
                )
                t0 += time.perf_counter() - t_probe
        idx.merge()
        # drain: one host fetch of a fresh search forces everything
        # dispatched above to finish (in-order execution; CLAUDE.md)
        ids, _ = idx.search(queries, k=K, search_width=32)
        np.asarray(ids)
        ingest_s = time.perf_counter() - t0

        live = np.concatenate([base, stream])
        gt = ground_truth(live, queries, K)
        ids, _ = idx.search(queries, k=K, search_width=32)
        final_recall = recall_at_k(np.asarray(ids), gt, K)

        # steady-state search QPS with a half-full buffer; queries are
        # uploaded ONCE like every other serving sweep (benchmark.py
        # sweep_*) — a per-call [1000, D] f32 upload over this tunnel
        # would dominate the measurement
        idx.insert(stream[: capacity // 2])
        q_dev = jnp.asarray(queries)
        idx.search(q_dev, k=K, search_width=32)
        t0 = time.perf_counter()
        reps = 5
        for _ in range(reps):
            ids, _ = idx.search(q_dev, k=K, search_width=32)
        np.asarray(ids)
        qps = N_QUERIES * reps / (time.perf_counter() - t0)

        r = {
            "capacity": capacity,
            "merge_method": merge_method,
            "merge_insert_max_fraction": frac,
            "ingest_per_s": round((STREAM_N - warm_n) / ingest_s, 1),
            "ingest_seconds": round(ingest_s, 1),
            "n_merges": idx.n_merges,
            "mid_stream_probes": probes,
            "final_recall": round(final_recall, 4),
            "search_qps_half_buffer": round(qps, 1),
        }
        print(json.dumps(r), flush=True)
        results.append(r)
    print(json.dumps({"base_n": BASE_N, "stream_n": STREAM_N, "runs": results}))


if __name__ == "__main__":
    main()
