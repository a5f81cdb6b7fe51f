#!/usr/bin/env python3
"""Decompose the streaming exact-kNN merge cost at large base N.

The kNN merge (index/streaming.py `_knn_merge_waves`) sustained
14.1k inserts/s at a 200k base but 1.43k/s at 1M — a 10x drop for a
5x base. This probe times each phase of one merge cycle at the real
geometry (capacity-padded base, wc=4096 sub-waves) with a *synthetic*
graph (random adjacency): the scan, prune, and reverse phases don't
care about edge quality, and it avoids a ~15 min 1M base build.

Phases per merge of `m` rows:
  quantize — int8-pack the padded db (once per merge)
  scan     — fused flat scan per sub-wave (m/wc of them)
  forward  — _knn_forward_rows alpha-prune + row writes (per sub-wave)
  reverse  — _reverse_pass per 16k-row slice (m/16k of them)

Run: PYTHONPATH=/root/repo:/root/.axon_site \
       BASE_N=1000000 python benchmarks/knn_merge_decomp_micro.py
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

N = int(os.environ.get("BASE_N", "1000000"))
DIM = 128
CAP = int(os.environ.get("STREAM_CAP", "32768"))
WC = 4096
R = 48



def _drain(out):
    """Execution barrier WITHOUT fetching the payload: slice ONE element
    on device, fetch 4 bytes (in-order execution makes it a full
    barrier). np.asarray of a large result costs seconds over this
    ~50 MB/s tunnel and silently dominated earlier micro numbers."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf[(0,) * leaf.ndim])

def timeit(fn, reps=3):
    out = fn()
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    _drain(out)
    return (time.perf_counter() - t0) / reps


def main():
    from diskrag_tpu.benchmark import make_dataset
    from diskrag_tpu.index.streaming import (
        _knn_forward_rows,
        _reverse_pass,
        _round_up,
    )
    from diskrag_tpu.ops.flat_scan_pallas import (
        flat_search_fused,
        quantize_int8,
    )

    pts, _ = make_dataset(N + CAP, DIM, 10)
    n0 = N
    m = CAP
    cap_total = _round_up(n0 + m, CAP)
    print(f"N={N} m={m} padded={cap_total}", flush=True)

    rng = np.random.default_rng(0)
    vectors = jnp.zeros((cap_total, DIM), jnp.float32)
    vectors = jax.lax.dynamic_update_slice(
        vectors, jnp.asarray(pts, jnp.float32), (0, 0)
    )
    adjacency = jnp.asarray(
        rng.integers(0, n0, (cap_total, R), dtype=np.int32)
    )
    vectors, adjacency = jax.device_put((vectors, adjacency))
    alpha = jnp.asarray(1.2, jnp.float32)
    n_used = jnp.int32(n0 + m)
    knn_k = max(64, (4 * R) // 3)

    res = {"n": N, "m": m, "padded": cap_total}

    res["quantize_s"] = timeit(lambda: quantize_int8(vectors))
    print("quantize", res["quantize_s"], flush=True)
    vec_scan, scan_scales = jax.device_put(quantize_int8(vectors))
    norms = jax.device_put(jnp.sum(jnp.square(vectors), axis=-1))

    q = jax.lax.dynamic_slice_in_dim(vectors, n0, WC)

    def scan():
        return flat_search_fused(
            q, vec_scan, norms, vectors, k=knn_k + 1, metric="l2",
            rerank_mult=4, n_buckets=4096, db_tile=4096,
            query_block=128, db_scales=scan_scales,
        )

    res["scan_per_subwave_s"] = timeit(scan)
    print("scan", res["scan_per_subwave_s"], flush=True)

    d, ids = scan()
    wave_ids = jnp.arange(n0, n0 + WC, dtype=jnp.int32)

    # _knn_forward_rows/_reverse_pass DONATE adjacency — chain the
    # returned array through the timing loop or the second rep reads a
    # freed buffer (opaque "TPU backend error (InvalidArgument)")
    state = {"adj": adjacency, "pruned": None}

    def forward():
        adj, pruned = _knn_forward_rows(
            vectors, state["adj"], wave_ids, ids, d, n_used, alpha,
            metric="l2",
        )
        state["adj"], state["pruned"] = adj, pruned
        return pruned

    res["forward_per_subwave_s"] = timeit(forward)
    print("forward", res["forward_per_subwave_s"], flush=True)

    adj2, pruned = state["adj"], state["pruned"]

    # sweep reverse (rev_rows, chunk) geometries: bigger chunks shrink
    # the sequential fix_chunk loop (73 iterations at 16k:8192), bigger
    # slices amortize the grouping prologue over more rows
    sweep = os.environ.get(
        "REV_SWEEP", "16384:8192,16384:32768,32768:32768,32768:65536"
    )
    best = None
    for spec in sweep.split(","):
        rev_rows, chunk = (int(x) for x in spec.split(":"))
        pruned_big = jnp.tile(pruned, (rev_rows // WC + 1, 1))[:rev_rows]
        wave_big = jnp.arange(
            n0, n0 + rev_rows, dtype=jnp.int32
        ) % jnp.int32(n0 + m)

        def reverse_i8():
            state["adj"] = _reverse_pass(
                vectors, state["adj"], wave_big, pruned_big, alpha,
                max_incoming=min(16, R), chunk=min(chunk, rev_rows * R),
                metric="l2", codes=vec_scan, code_scales=scan_scales,
            )
            return state["adj"]

        t = timeit(reverse_i8)
        per_row = t / rev_rows
        print(f"reverse_i8 rows={rev_rows} chunk={chunk}: {t:.3f}s "
              f"({1e6 * per_row:.1f} us/row)", flush=True)
        res[f"reverse_i8_{rev_rows}_{chunk}_s"] = t
        if best is None or per_row < best[2]:
            best = (rev_rows, chunk, per_row, t)

    res["reverse_per_slice_s"] = best[3]
    res["reverse_best"] = {"rev_rows": best[0], "chunk": best[1]}
    n_sub = (m + WC - 1) // WC
    n_slices = (m + best[0] - 1) // best[0]
    res["merge_total_est_s"] = (
        res["quantize_s"]
        + n_sub * (res["scan_per_subwave_s"] + res["forward_per_subwave_s"])
        + n_slices * best[3]
    )
    res["ingest_rate_est_per_s"] = m / res["merge_total_est_s"]
    print(json.dumps(res))


if __name__ == "__main__":
    main()
