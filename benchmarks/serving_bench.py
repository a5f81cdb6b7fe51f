#!/usr/bin/env python3
"""Engine-level and HTTP-level serving throughput (VERDICT r2 #6).

Every QPS number in the sweep records is harness-level (jitted fns timed
via diskrag_tpu.benchmark._measure). This measures what a *user* gets:
`SearchEngine.search_many` (mock embedder, packed device fetch, text
join) and `POST /search-batch` (plus request parse + JSON assembly),
batch-size sweep, flat + vamana serving modes — the counterpart of the
reference's `performance_test_search_engine`
(reference search_engine.py:818-933), which measured its engine end to
end the same way.

Standalone: `python benchmarks/serving_bench.py` (writes
benchmarks/last_serving_tpu.json). bench.py calls `measure_serving`
directly for its compact driver-visible stage.
"""

from __future__ import annotations

import json
import os
import pathlib
import shutil
import tempfile
import time


def _enable_compilation_cache() -> None:
    # env vars alone are ignored when sitecustomize already imported jax
    # (CLAUDE.md 2026-08-21); the shared helper binds the live config
    import sys

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    from diskrag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache(seed=False)


def make_collection(base_dir, pts, name: str = "bench"):
    """A real collection over the benchmark points: texts + metadata +
    vectors.npy, appended in chunks (one 200k update_collection call
    would build one giant parquet concat anyway; chunking bounds peak
    memory and matches how ingest actually arrives)."""
    from diskrag_tpu.data.collection import CollectionManager

    mgr = CollectionManager(base_dir)
    info = mgr.get_collection_info(name)
    if info is not None and info.num_vectors == len(pts):
        return mgr  # reuse across runs (tmp_dir callers iterate on this)
    mgr.create_collection(name, int(pts.shape[1]))
    chunk = 100_000
    for lo in range(0, len(pts), chunk):
        hi = min(lo + chunk, len(pts))
        mgr.update_collection(
            name,
            pts[lo:hi],
            [f"doc {i}" for i in range(lo, hi)],
            [{"i": i} for i in range(lo, hi)],
        )
    return mgr


def _time_calls(fn, warm_args, timed_args, repeats: int) -> float:
    """Best-of-`repeats` wall time after one full-shape warmup (warming
    with a different shape leaves the real shape's compile inside the
    timed region — CLAUDE.md). Engine calls fetch results to host, so
    wall clock is an honest barrier here (unlike raw device dispatch).
    Min, not mean: the shared tunnel's per-RPC latency swings 28-60 ms
    between calls (±30% run-to-run measured 2026-08-21), and the mean
    folds those stalls into what is meant to be a capability number —
    same convention as host_tier_bench's min(times)."""
    fn(*warm_args)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        fn(*timed_args)
        best = min(best, time.perf_counter() - t0)
    return best


def measure_engine_qps(
    engine, queries, *, batch: int, k: int = 10, repeats: int = 5,
    l_search: int | None = None,
) -> dict:
    """search_many QPS at one batch size (mock embedder = dict lookup,
    so embedding cost is the Python-side floor, not OpenAI). Includes a
    per-stage breakdown (embed / device+fetch / fetch RPC / text join)
    so the engine-vs-kernel residual is attributable (VERDICT r3 #2).

    stage_ms comes from the BEST timed call, not a single extra call
    after the loop: the round-4 record carried a 90.8 ms text_join at
    batch 1024 because the one instrumented call hit an outlier window
    (VERDICT r4 weak #1). The first-ever call's join is reported
    separately as text_join_cold_ms — it pays the column store's
    one-time JSON-decode memoization for the result rows, which is real
    and worth stating rather than hiding."""
    qtexts = [f"q{i}" for i in range(batch)]
    lut = {f"q{i}": queries[i % len(queries)] for i in range(batch)}
    out = {}

    def call(texts):
        return engine.search_many(
            texts, k=k, embedding_fn=lut.__getitem__, l_search=l_search
        )

    def join_ms(res):
        t = res["timing"]
        return (t["total_time"] - t["embedding_time"] - t["search_time"]) * 1e3

    warm_res = call(qtexts)  # full-shape warmup (compiles + cold decode)
    cold_join = join_ms(warm_res)
    best_dt, best_res = float("inf"), warm_res
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = call(qtexts)
        dt = time.perf_counter() - t0
        if dt < best_dt:
            best_dt, best_res = dt, res
    out["qps"] = batch / best_dt
    out["batch"] = batch
    out["latency_ms"] = best_dt * 1e3
    out["search_type"] = best_res["stats"]["search_type"]
    t = best_res["timing"]
    out["stage_ms"] = {
        "embed": round(t["embedding_time"] * 1e3, 2),
        "search": round(t["search_time"] * 1e3, 2),
        "fetch_rpc": round(
            best_res["stats"].get("fetch_time", 0.0) * 1e3, 2
        ),
        "text_join": round(join_ms(best_res), 2),
        "text_join_cold": round(cold_join, 2),
    }
    if "stage_ms" in best_res["stats"]:  # host-tier traverse/rerank split
        out["stage_ms"]["tier"] = {
            kk: round(vv, 1)
            for kk, vv in best_res["stats"]["stage_ms"].items()
        }
    return out


def measure_pipelined_qps(
    engine, queries, *, batch: int, n_batches: int = 16, k: int = 10,
    repeats: int = 3, l_search: int | None = None, max_in_flight: int = 8,
) -> dict:
    """Sustained throughput via engine.search_pipelined: n_batches
    batches per call with overlapped drain RPCs — the serving number a
    throughput-oriented caller gets, vs search_many's per-call latency
    which pays the full ~30-40 ms tunnel fetch RPC serially per batch."""
    batches = [[f"q{i}" for i in range(batch)] for _ in range(n_batches)]
    lut = {f"q{i}": queries[i % len(queries)] for i in range(batch)}

    def call(bs):
        return engine.search_pipelined(
            bs, k=k, embedding_fn=lut.__getitem__, l_search=l_search,
            max_in_flight=max_in_flight,
        )

    dt = _time_calls(call, (batches,), (batches,), repeats)
    return {
        "qps": batch * n_batches / dt,
        "batch": batch,
        "n_batches": n_batches,
        "max_in_flight": max_in_flight,
        "latency_ms_per_batch": dt / n_batches * 1e3,
    }


def measure_http_qps(
    base_dir, queries, *, batch: int, k: int = 10, repeats: int = 5,
    collection: str = "bench",
) -> dict:
    """POST /search-batch through the real aiohttp app (request parse,
    worker-thread dispatch, text join, JSON response assembly)."""
    import asyncio

    from aiohttp.test_utils import TestClient, TestServer

    from diskrag_tpu.api import AppState, create_app

    state = AppState(base_dir=str(base_dir))
    lut = {f"q{i}": queries[i % len(queries)] for i in range(batch)}
    state.embed = lut.__getitem__  # inject the benchmark embedder
    app = create_app(state)
    payload = {
        "collection": collection,
        "queries": [f"q{i}" for i in range(batch)],
        "top_k": k,
    }

    async def run():
        async with TestClient(TestServer(app)) as client:
            r = await client.post("/search-batch", json=payload)
            assert r.status == 200, await r.text()
            t0 = time.perf_counter()
            for _ in range(repeats):
                r = await client.post("/search-batch", json=payload)
                await r.json()
            return (time.perf_counter() - t0) / repeats

    dt = asyncio.run(run())
    return {"qps": batch / dt, "batch": batch, "latency_ms": dt * 1e3}


def measure_serving(
    pts,
    queries,
    *,
    index=None,
    batches=(512,),
    k: int = 10,
    repeats: int = 5,
    http: bool = True,
    tmp_dir: str | None = None,
    modes=("flat", "vamana", "streaming", "host_tier"),
) -> dict:
    """Build a collection over `pts` and measure end-to-end serving.

    `index`: a prebuilt VamanaIndex over `pts` (skips rebuilding for the
    vamana mode); None builds one.
    Covers every explicit serving mode through the engine path
    (VERDICT r4 #4b): "streaming" wraps the vamana index in the mutable
    tier, "host_tier" persists packed records + iq8 artifacts and serves
    the compressed-traversal + host-rerank tier. Mode order matters:
    host_tier runs last because it rewrites the index dir's meta with
    the iq8 artifact keys.
    Returns {mode: [{batch, qps, ...}]}, plus "http_vamana" rows.
    """
    from diskrag_tpu.build_index import build_index_from_vectors
    from diskrag_tpu.engine import SearchEngine
    from diskrag_tpu.index.persist import save_index

    own_tmp = tmp_dir is None
    base = tmp_dir or tempfile.mkdtemp(prefix="diskrag_serving_")
    out: dict = {}
    try:
        mgr = make_collection(base, pts)
        index_dir = mgr.get_index_dir("bench")

        if "flat" in modes:
            build_index_from_vectors(
                pts, index_dir, index_type="flat", force_rebuild=True
            )
            eng = SearchEngine("bench", base_dir=base, run_diagnostics=False)
            out["flat"] = [
                measure_engine_qps(
                    eng, queries, batch=b, k=k, repeats=repeats
                )
                for b in batches
            ]
            out["flat_pipelined"] = [
                measure_pipelined_qps(
                    eng, queries, batch=b, k=k, repeats=max(2, repeats - 2)
                )
                for b in batches
            ]
            del eng

        need_vamana = {"vamana", "streaming", "host_tier"} & set(modes)
        if need_vamana:
            if index is None:
                from diskrag_tpu.graph.knn_build import build_vamana_knn

                index = build_vamana_knn(
                    pts, degree_bound=48, alpha=1.2, seed=0
                )
            save_index(index_dir, index, host_vectors=pts)
        if "vamana" in modes:
            eng = SearchEngine("bench", base_dir=base, run_diagnostics=False)
            out["vamana"] = [
                measure_engine_qps(
                    eng, queries, batch=b, k=k, repeats=repeats,
                    l_search=16,
                )
                for b in batches
            ]
            del eng
            if http:
                try:
                    out["http_vamana"] = [
                        measure_http_qps(
                            base, queries, batch=b, k=k, repeats=repeats
                        )
                        for b in batches
                    ]
                except ImportError:
                    out["http_vamana"] = "aiohttp unavailable"

        if "streaming" in modes:
            # mutable tier through the engine: same graph, searched via
            # StreamingIndex (graph beam + exact buffer scan in one
            # program) — what a live-ingest service serves between merges
            eng = SearchEngine(
                "bench", base_dir=base, run_diagnostics=False,
                serving_mode="streaming",
            )
            out["streaming"] = [
                measure_engine_qps(
                    eng, queries, batch=b, k=k, repeats=repeats,
                    l_search=16,
                )
                for b in batches
            ]
            del eng

        if "host_tier" in modes:
            # beyond-HBM tier through the engine: packed record file +
            # iq8 traversal artifacts persisted over the vamana index
            # (rewrites pq-family meta keys — keep this mode last)
            import numpy as np_

            from diskrag_tpu.pq.intq import IntQuantizer

            t0 = time.perf_counter()
            iq8 = IntQuantizer(bits=8).fit(pts, seed=0)
            save_index(
                index_dir, index, pq=iq8,
                pq_codes=np_.asarray(iq8.encode(pts)),
                meta_extra={
                    "recommended_search_L": 24,
                    "recommended_expand_width": 8,
                },
                write_compat=True, host_vectors=pts,
            )
            prep_s = time.perf_counter() - t0
            eng = SearchEngine(
                "bench", base_dir=base, run_diagnostics=False,
                serving_mode="host_tier",
            )
            out["host_tier"] = [
                measure_engine_qps(
                    eng, queries, batch=b, k=k, repeats=repeats,
                )
                for b in batches
            ]
            out["host_tier_prep_seconds"] = round(prep_s, 1)
            del eng
    finally:
        if own_tmp:
            shutil.rmtree(base, ignore_errors=True)
    return out


def main() -> None:
    _enable_compilation_cache()
    import numpy as np

    from diskrag_tpu.benchmark import make_dataset

    n = int(os.environ.get("BENCH_N", "200000"))
    dim = int(os.environ.get("BENCH_DIM", "128"))
    pts, queries = make_dataset(n, dim, 1024)
    t0 = time.perf_counter()
    out = measure_serving(
        pts, np.asarray(queries), batches=(64, 512, 1024), repeats=5,
        # stable scratch: the 200k collection build (~4 min of parquet
        # appends) is reused across standalone runs
        tmp_dir=os.environ.get(
            "SERVING_TMP", f"/tmp/diskrag_serving_persist_{n}"
        ),
    )
    record = {
        "n": n,
        "dim": dim,
        "wall_seconds": round(time.perf_counter() - t0, 1),
        "results": out,
    }
    path = pathlib.Path(__file__).parent / "last_serving_tpu.json"
    path.write_text(json.dumps(record, indent=2))
    print(json.dumps(record, indent=2))


if __name__ == "__main__":
    main()
