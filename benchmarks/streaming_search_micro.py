#!/usr/bin/env python3
"""Decompose StreamingIndex._search_merged cost on chip: graph beam at
the over-fetched width vs the buffer scan's full-width exact top_k vs a
tiled exact top_k replacement. Decides whether the merged-search path
needs a tiled buffer cut (it serves 14-15k QPS vs the pure graph's ~56k
at L=32 — somewhere ~50 ms/batch is going missing).

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/streaming_search_micro.py
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

import functools

import jax
import jax.numpy as jnp
import numpy as np

N = 200_000
DIM = 128
CAP = 65_536
B = 1000
K = 10
W = 32


def timeit(fn, *args, reps=10):
    out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    np.asarray(jax.tree_util.tree_leaves(out)[-1])
    return (time.perf_counter() - t0) / reps


def main():
    from diskrag_tpu.benchmark import make_dataset
    from diskrag_tpu.graph import beam_search
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.index.streaming import StreamingIndex
    from diskrag_tpu.ops.distance import Metric, pairwise_distance

    pts, queries = make_dataset(N + CAP, DIM, B)
    base, extra = pts[:N], pts[N : N + CAP]
    index = build_vamana_knn(base, degree_bound=48, alpha=1.2, seed=0)
    q = jnp.asarray(queries)
    buf = jnp.asarray(extra)

    res = {}

    @jax.jit
    def graph_k10(q):
        r = beam_search(index.vectors, index.adjacency, index.medoid, q,
                        search_width=W, k=K, metric="l2",
                        entry_points=index.entry_points)
        return r.ids

    @jax.jit
    def graph_kW(q):
        r = beam_search(index.vectors, index.adjacency, index.medoid, q,
                        search_width=W, k=W, metric="l2",
                        entry_points=index.entry_points)
        return r.ids

    @jax.jit
    def buf_full(q):
        d = pairwise_distance(q, buf, Metric("l2"))
        neg, idx = jax.lax.top_k(-d, K)
        return idx

    @functools.partial(jax.jit, static_argnames=("tile",))
    def buf_tiled(q, tile=4096):
        d = pairwise_distance(q, buf, Metric("l2"))
        t = d.reshape(B, CAP // tile, tile)
        neg, idx = jax.lax.top_k(-t, K)  # [B, T, K]
        base_ids = (
            jnp.arange(CAP // tile, dtype=jnp.int32)[None, :, None] * tile
        )
        ids = idx + base_ids
        neg2, take = jax.lax.top_k(neg.reshape(B, -1), K)
        return jnp.take_along_axis(ids.reshape(B, -1), take, axis=1)

    res["graph_k10_ms"] = round(timeit(graph_k10, q) * 1e3, 2)
    res["graph_kW_ms"] = round(timeit(graph_kW, q) * 1e3, 2)
    res["buffer_fulltopk_ms"] = round(timeit(buf_full, q) * 1e3, 2)
    res["buffer_tiledtopk_ms"] = round(timeit(buf_tiled, q) * 1e3, 2)
    # agreement check
    a = np.sort(np.asarray(buf_full(q))[:, :K], axis=1)
    b = np.sort(np.asarray(buf_tiled(q))[:, :K], axis=1)
    res["tiled_exact_match"] = bool((a == b).all())

    # the full merged path as shipped
    s = StreamingIndex(index, buffer_capacity=CAP)
    s.insert(extra[: CAP - 1024])
    t = timeit(lambda: s.search(q, k=K, search_width=W)[0], reps=5)
    res["merged_search_ms"] = round(t * 1e3, 2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
