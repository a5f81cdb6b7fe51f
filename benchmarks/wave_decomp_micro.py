#!/usr/bin/env python3
"""Decompose the streaming-merge wave cost on chip.

A merge folds m buffered rows into the graph with `wave_step` sub-waves;
measured ingest is ~470-1500/s while the 5k/s target needs a sub-wave to
cost well under 1 s. This probe times the wave's three phases separately
at the production sub-wave geometry (W=4096, R=48, padded 200k base):

  beam     — candidate acquisition via graph beam search (sequential
             frontier rounds: the latency-bound suspect)
  knn      — the MXU alternative: exact top-C via the fused int8 flat
             scan over the padded database (one matmul pass)
  prune    — robust_prune_batch on a [W, C]-candidate pool
  reverse  — _reverse_edges repair of the wave's targets
  wave     — the full wave_step for reference

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/wave_decomp_micro.py
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

import jax
import jax.numpy as jnp
import numpy as np

N = 200_000
DIM = 128
CAP = 16_384
W = 4096
R = 48
BUILD_WIDTH = 64



def _drain(out):
    """Execution barrier WITHOUT fetching the payload: slice ONE element
    on device, fetch 4 bytes (in-order execution makes it a full
    barrier). np.asarray of a large result costs seconds over this
    ~50 MB/s tunnel and silently dominated earlier micro numbers."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf[(0,) * leaf.ndim])

def timeit(fn, reps=5):
    out = fn()
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _drain(out)
    return (time.perf_counter() - t0) / reps


def main():
    from diskrag_tpu.benchmark import make_dataset
    from diskrag_tpu.graph import beam_search
    from diskrag_tpu.graph.build import _reverse_edges, wave_step
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.index.streaming import StreamingIndex
    from diskrag_tpu.ops.flat_scan_pallas import (
        flat_search_fused,
        quantize_int8,
    )

    pts, _ = make_dataset(N + CAP, DIM, 10)
    base, extra = pts[:N], pts[N : N + CAP]
    print("base build...", flush=True)
    t0 = time.perf_counter()
    index = build_vamana_knn(base, degree_bound=R, alpha=1.2, seed=0)
    print(f"  {time.perf_counter() - t0:.1f}s", flush=True)

    # reproduce the streaming tier's padded state with W new rows placed
    idx = StreamingIndex(index, buffer_capacity=CAP, wave_chunk=W)
    idx.insert(extra)  # fills the buffer (no merge yet at cap)
    vectors = idx.index.vectors
    adjacency = idx.index.adjacency
    medoid = idx.index.medoid
    n0 = idx.n_graph
    key = jax.random.key(0)
    rand = jax.random.randint(key, (W, R), 0, n0, jnp.int32)
    vecs_w = jnp.asarray(extra[:W], jnp.float32)
    vectors = jax.lax.dynamic_update_slice(vectors, vecs_w, (n0, 0))
    adjacency = jax.lax.dynamic_update_slice(adjacency, rand, (n0, 0))
    wave_ids = jnp.arange(n0, n0 + W, dtype=jnp.int32)
    alpha = jnp.asarray(1.2, jnp.float32)

    res = {}

    # 1. beam-search candidate acquisition (current wave_step phase 1)
    queries = vectors[wave_ids]
    res["beam_s"] = timeit(
        lambda: beam_search(
            vectors, adjacency, medoid, queries,
            search_width=BUILD_WIDTH, k=BUILD_WIDTH, metric="l2",
            expand_width=8,
        )
    )
    print("beam", res["beam_s"], flush=True)

    # 2. exact-kNN alternative: fused int8 scan over the padded db
    knn_k = max(64, (4 * R) // 3) + 1
    vec_scan, scan_scales = quantize_int8(vectors)
    norms = jnp.sum(jnp.square(vectors), axis=-1)
    vec_scan, scan_scales, norms = jax.device_put(
        (vec_scan, scan_scales, norms)
    )

    def knn():
        return flat_search_fused(
            queries, vec_scan, norms, vectors, k=knn_k, metric="l2",
            rerank_mult=4, n_buckets=4096, db_tile=4096, query_block=128,
            db_scales=scan_scales,
        )

    res["knn_s"] = timeit(knn)
    print("knn", res["knn_s"], flush=True)
    # quantization overhead (paid once per merge, not per sub-wave)
    res["quantize_s"] = timeit(lambda: quantize_int8(vectors))
    print("quantize", res["quantize_s"], flush=True)

    # 3. reverse-edge repair alone, on the wave's actual pruned rows
    import functools

    d, ids = knn()
    pruned = ids[:, :R]  # stand-in pruned rows: top-R exact neighbors

    rev = jax.jit(functools.partial(
        _reverse_edges, max_incoming=16, chunk=8192, metric="l2",
    ))
    res["reverse_s"] = timeit(lambda: rev(
        vectors, adjacency, wave_ids, pruned, alpha,
    ))
    print("reverse", res["reverse_s"], flush=True)

    # 4. the full current wave_step
    res["wave_s"] = timeit(
        lambda: wave_step(
            vectors, adjacency, medoid, wave_ids, alpha,
            build_width=BUILD_WIDTH, max_incoming=16,
            chunk=8192, metric="l2",
        )
    )
    print("wave", res["wave_s"], flush=True)

    res["geometry"] = {"n0": int(n0), "W": W, "R": R, "cap_rows": int(vectors.shape[0])}
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
