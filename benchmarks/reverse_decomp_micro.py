#!/usr/bin/env python3
"""Decompose _reverse_edges' internal phases at the 1M merge geometry.

The merge sweep (knn_merge_decomp_micro) shows a ~3.3 s cost in the
reverse pass that barely moves with rows or chunk size. This probe jits
each phase separately at rev_rows=16384, R=48, N=1M:

  sort      — argsort of the [E] packed target keys (E=786k)
  group     — cumsum seg ids + the 1D start scatter + inc gather table
  chunks    — the fix_chunk while_loop alone (gathers + prune)
  writeback — row_slot 1D scatter + [N, R] gather/select rebuild

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/reverse_decomp_micro.py
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
DIM = 128
W = int(os.environ.get("REV_ROWS", "16384"))
R = 48
K_IN = 16
CHUNK = 8192
INVALID_ID = -1
INF = jnp.inf



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
    intmax = jnp.iinfo(jnp.int32).max
    e = W * R

    pruned = jnp.asarray(
        rng.integers(0, N, (W, R), dtype=np.int32)
    )
    wave_ids = jnp.arange(N - W, N, dtype=jnp.int32)
    codes = jnp.asarray(rng.integers(-127, 128, (N, DIM), dtype=np.int8))
    scales = jnp.full((N,), 0.01, jnp.float32)
    adjacency = jnp.asarray(rng.integers(0, N, (N, R), dtype=np.int32))

    res = {"n": N, "rev_rows": W, "e": e}

    @jax.jit
    def phase_sort(pruned, wave_ids):
        targets = pruned.reshape(-1)
        sources = jnp.repeat(wave_ids, R)
        valid = targets != INVALID_ID
        sort_key = jnp.where(valid, targets, intmax)
        order = jnp.argsort(sort_key)
        return sort_key[order], sources[order]

    res["sort_s"] = timeit(phase_sort, pruned, wave_ids)
    print("sort", res["sort_s"], flush=True)
    t_s, s_s = jax.device_put(phase_sort(pruned, wave_ids))

    @jax.jit
    def phase_group(t_s, s_s):
        v_s = t_s != intmax
        pos = jnp.arange(e, dtype=jnp.int32)
        is_first = jnp.concatenate(
            [jnp.array([True]), t_s[1:] != t_s[:-1]]
        ) & v_s
        seg_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
        start = jnp.full((e,), e, jnp.int32)
        start = start.at[jnp.where(is_first, seg_id, e)].set(pos, mode="drop")
        n_seg = jnp.sum(is_first.astype(jnp.int32))
        slot = jnp.arange(e, dtype=jnp.int32)
        live_slot = slot < n_seg
        start_c = jnp.clip(start, 0, e - 1)
        uniq_t = jnp.where(live_slot, t_s[start_c], INVALID_ID)
        seg_end = jnp.where(
            slot + 1 < n_seg,
            start[jnp.clip(slot + 1, 0, e - 1)],
            jnp.sum(v_s.astype(jnp.int32)),
        )
        k_iota = jnp.arange(K_IN, dtype=jnp.int32)[None, :]
        take_pos = start_c[:, None] + k_iota
        in_seg = live_slot[:, None] & (take_pos < seg_end[:, None])
        inc = jnp.where(in_seg, s_s[jnp.clip(take_pos, 0, e - 1)], INVALID_ID)
        return uniq_t, inc, n_seg

    res["group_s"] = timeit(phase_group, t_s, s_s)
    print("group", res["group_s"], flush=True)
    uniq_t, inc, n_seg = jax.device_put(phase_group(t_s, s_s))

    # sub-phases of group: cumsum alone, the 1D scatter alone
    @jax.jit
    def phase_cumsum(t_s):
        v_s = t_s != intmax
        is_first = jnp.concatenate(
            [jnp.array([True]), t_s[1:] != t_s[:-1]]
        ) & v_s
        return jnp.cumsum(is_first.astype(jnp.int32))

    res["cumsum_s"] = timeit(phase_cumsum, t_s)
    print("cumsum", res["cumsum_s"], flush=True)
    seg_cum = jax.device_put(phase_cumsum(t_s))

    @jax.jit
    def phase_scatter1d(seg_cum, t_s):
        v_s = t_s != intmax
        is_first = jnp.concatenate(
            [jnp.array([True]), t_s[1:] != t_s[:-1]]
        ) & v_s
        seg_id = seg_cum - 1
        pos = jnp.arange(e, dtype=jnp.int32)
        start = jnp.full((e,), e, jnp.int32)
        return start.at[jnp.where(is_first, seg_id, e)].set(pos, mode="drop")

    res["scatter1d_s"] = timeit(phase_scatter1d, seg_cum, t_s)
    print("scatter1d", res["scatter1d_s"], flush=True)

    from diskrag_tpu.graph.prune import (
        gathered_distance_int8,
        robust_prune_batch,
    )
    from diskrag_tpu.ops.topk import mask_duplicates, sort_topk_unique

    @jax.jit
    def phase_chunks(uniq_t, inc, n_seg, adjacency, codes, scales):
        pad_e = (-e) % CHUNK
        uniq_t_p = jnp.pad(uniq_t, (0, pad_e), constant_values=INVALID_ID)
        inc_p = jnp.pad(inc, ((0, pad_e), (0, 0)), constant_values=INVALID_ID)
        n_chunks = (e + pad_e) // CHUNK
        t_chunks = uniq_t_p.reshape(n_chunks, CHUNK)
        inc_chunks = inc_p.reshape(n_chunks, CHUNK, K_IN)
        n_live = (n_seg + CHUNK - 1) // CHUNK

        def fix_chunk(t_chunk, inc_chunk):
            t_safe = jnp.clip(t_chunk, 0, N - 1)
            old = adjacency[t_safe]
            cands = jnp.concatenate([old, inc_chunk], axis=1)
            cands = jnp.where(
                t_chunk[:, None] == INVALID_ID, INVALID_ID, cands
            )
            c_safe = jnp.clip(cands, 0, N - 1)
            cand_vecs = codes[c_safe]
            cand_sc = scales[c_safe]
            dists = gathered_distance_int8(
                codes[t_safe], scales[t_safe], cand_vecs, cand_sc, "l2"
            )
            dists = jnp.where(cands == INVALID_ID, INF, dists)
            union_ids, _, _ = sort_topk_unique(cands, dists, R)
            n_unique = jnp.sum(
                jnp.isfinite(mask_duplicates(cands, dists)), axis=1
            )
            overflow = n_unique > R
            pruned_rows = robust_prune_batch(
                t_chunk, cands, cand_vecs, dists, 1.2,
                degree_bound=R, metric="l2", cand_scales=cand_sc,
            )
            return jnp.where(overflow[:, None], pruned_rows, union_ids)

        def live(carry):
            return carry[0] < n_live

        def body(carry):
            i, rows = carry
            out = fix_chunk(t_chunks[i], inc_chunks[i])
            rows = jax.lax.dynamic_update_slice(rows, out[None], (i, 0, 0))
            return i + 1, rows

        rows0 = jnp.zeros((n_chunks, CHUNK, R), jnp.int32)
        _, new_rows = jax.lax.while_loop(live, body, (jnp.int32(0), rows0))
        return new_rows.reshape(-1, R)

    res["chunks_s"] = timeit(
        phase_chunks, uniq_t, inc, n_seg, adjacency, codes, scales
    )
    print("chunks", res["chunks_s"], flush=True)
    res["n_seg"] = int(n_seg)
    new_rows = jax.device_put(
        phase_chunks(uniq_t, inc, n_seg, adjacency, codes, scales)
    )

    @jax.jit
    def phase_writeback(adjacency, uniq_t, new_rows):
        slot = jnp.arange(e, dtype=jnp.int32)
        row_slot = jnp.full((N + 1,), -1, jnp.int32)
        row_slot = row_slot.at[
            jnp.where(uniq_t == INVALID_ID, N, uniq_t)
        ].set(slot, mode="drop")
        row_slot = row_slot[:N]
        touched = row_slot >= 0
        gathered = new_rows[jnp.clip(row_slot, 0, new_rows.shape[0] - 1)]
        return jnp.where(touched[:, None], gathered, adjacency)

    res["writeback_s"] = timeit(phase_writeback, adjacency, uniq_t, new_rows)
    print("writeback", res["writeback_s"], flush=True)

    total = res["sort_s"] + res["group_s"] + res["chunks_s"] + res["writeback_s"]
    res["phases_total_s"] = total
    print(json.dumps(res))


if __name__ == "__main__":
    main()
