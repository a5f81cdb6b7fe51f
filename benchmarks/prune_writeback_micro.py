#!/usr/bin/env python3
"""Probe the two suspects in the reverse pass at the 1M geometry.

A) writeback variants for rebuilding [N, R] adjacency from 553k new
   rows: gather+select (current), pure-gather from a concatenated
   source (no select), and the original row scatter — to pin which
   lowering is slow on this platform.
B) robust_prune_batch at the fix_chunk geometry ([8192, 64] int8
   candidates), block_size G in {8, 16, 24}: the while_loop runs
   max-rounds-over-rows; bigger G cuts rounds ~G-fold at O(G^2)
   trace-unrolled in-block cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/prune_writeback_micro.py
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

N = int(os.environ.get("BASE_N", "1048576"))
R = 48
E = 786432  # 16384 * 48 slots
DIM = 128
CHUNK = 8192
INVALID_ID = -1



def _drain(out):
    """Execution barrier WITHOUT fetching the payload: slice ONE element
    on device, fetch 4 bytes (in-order execution makes it a full
    barrier). np.asarray of a large result costs seconds over this
    ~50 MB/s tunnel and silently dominated earlier micro numbers."""
    leaf = jax.tree_util.tree_leaves(out)[-1]
    np.asarray(leaf[(0,) * leaf.ndim])

def timeit(fn, *args, reps=3):
    out = fn(*args)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _drain(out)
    return (time.perf_counter() - t0) / reps


def main():
    rng = np.random.default_rng(0)
    res = {"n": N}

    n_seg = 553_250
    # unique scattered targets for the live slots
    uniq_targets = rng.choice(N, size=n_seg, replace=False).astype(np.int32)
    uniq_t = np.full((E,), INVALID_ID, np.int32)
    uniq_t[:n_seg] = uniq_targets
    uniq_t = jnp.asarray(uniq_t)
    new_rows = jnp.asarray(rng.integers(0, N, (E, R), dtype=np.int32))
    adjacency = jnp.asarray(rng.integers(0, N, (N, R), dtype=np.int32))

    @jax.jit
    def wb_gather_select(adjacency, uniq_t, new_rows):
        slot = jnp.arange(E, dtype=jnp.int32)
        row_slot = jnp.full((N + 1,), -1, jnp.int32)
        row_slot = row_slot.at[
            jnp.where(uniq_t == INVALID_ID, N, uniq_t)
        ].set(slot, mode="drop")
        row_slot = row_slot[:N]
        touched = row_slot >= 0
        gathered = new_rows[jnp.clip(row_slot, 0, E - 1)]
        return jnp.where(touched[:, None], gathered, adjacency)

    res["wb_gather_select_s"] = timeit(
        wb_gather_select, adjacency, uniq_t, new_rows
    )
    print("wb_gather_select", res["wb_gather_select_s"], flush=True)

    @jax.jit
    def wb_pure_gather(adjacency, uniq_t, new_rows):
        slot = jnp.arange(E, dtype=jnp.int32)
        # node -> source row index into concat([new_rows, adjacency])
        row_slot = jnp.full((N + 1,), -1, jnp.int32)
        row_slot = row_slot.at[
            jnp.where(uniq_t == INVALID_ID, N, uniq_t)
        ].set(slot, mode="drop")
        row_slot = row_slot[:N]
        src = jnp.concatenate([new_rows, adjacency], axis=0)
        idx = jnp.where(
            row_slot >= 0, row_slot, E + jnp.arange(N, dtype=jnp.int32)
        )
        return src[idx]

    res["wb_pure_gather_s"] = timeit(
        wb_pure_gather, adjacency, uniq_t, new_rows
    )
    print("wb_pure_gather", res["wb_pure_gather_s"], flush=True)

    @jax.jit
    def wb_scatter(adjacency, uniq_t, new_rows):
        idx = jnp.where(uniq_t == INVALID_ID, N, uniq_t)
        return adjacency.at[idx].set(new_rows, mode="drop")

    res["wb_scatter_s"] = timeit(wb_scatter, adjacency, uniq_t, new_rows)
    print("wb_scatter", res["wb_scatter_s"], flush=True)

    # --- B: prune block-size sweep -------------------------------------
    from diskrag_tpu.graph.prune import robust_prune_batch
    from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

    w, c = CHUNK, 64
    vecs = rng.normal(size=(w, c, DIM)).astype(np.float32)
    codes_f = jnp.asarray(vecs)
    codes, scales = quantize_int8(codes_f.reshape(-1, DIM))
    codes = codes.reshape(w, c, DIM)
    scales = scales.reshape(w, c)
    point_ids = jnp.arange(w, dtype=jnp.int32)
    cand_ids = jnp.asarray(
        rng.integers(0, N, (w, c), dtype=np.int32)
    )
    cand_dists = jnp.asarray(
        rng.random((w, c)).astype(np.float32) + 0.1
    )

    for g in (8, 16, 24):
        t = timeit(
            lambda g=g: robust_prune_batch(
                point_ids, cand_ids, codes, cand_dists, 1.2,
                degree_bound=R, metric="l2", block_size=g,
                cand_scales=scales,
            )
        )
        res[f"prune_g{g}_s"] = t
        print(f"prune g={g}: {t * 1e3:.1f} ms "
              f"({68 * t:.2f}s over 68 chunks)", flush=True)

    # f32 comparison at g=8 (is int8 pairwise actually helping?)
    t = timeit(
        lambda: robust_prune_batch(
            point_ids, cand_ids, codes_f, cand_dists, 1.2,
            degree_bound=R, metric="l2", block_size=8,
        )
    )
    res["prune_f32_g8_s"] = t
    print(f"prune f32 g=8: {t * 1e3:.1f} ms", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
