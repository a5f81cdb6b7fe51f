#!/usr/bin/env python3
"""Characterize row-gather cost vs row width/dtype on this platform.

prune_writeback_micro showed a [1M] row gather from an int32 [1.8M, 48]
table costs 3.6 s (~3.6 us/row — HBM-latency per row, unpipelined),
while [·, 128] int8 code gathers run near bandwidth. This sweeps table
row width and dtype to find the fast shapes, then tests the same gather
with SORTED (contiguous-ish) indices.

Run: PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/gather_width_micro.py
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

N = 1_048_576
NIDX = 1_048_576



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


@functools.partial(jax.jit, static_argnames=())
def row_gather(table, idx):
    return table[idx]


@functools.partial(jax.jit, donate_argnums=())
def row_sum_gather(table, idx):
    # force materialization of gathered rows, return a reduction so the
    # fetch is tiny
    return jnp.sum(table[idx], axis=0)


def main():
    rng = np.random.default_rng(0)
    idx_rand = jnp.asarray(rng.integers(0, N, (NIDX,), dtype=np.int32))
    idx_sort = jnp.sort(idx_rand)
    res = {}

    for width, dtype, tag in [
        (48, np.int32, "i32_w48"),
        (64, np.int32, "i32_w64"),
        (128, np.int32, "i32_w128"),
        (32, np.int32, "i32_w32"),
        (128, np.int8, "i8_w128"),
        (192, np.int8, "i8_w192"),  # 48 i32 reinterpreted as int8 lanes
    ]:
        table = jnp.asarray(
            rng.integers(-100, 100, (N, width)).astype(dtype)
        )
        t = timeit(row_sum_gather, table, idx_rand)
        res[f"gather_{tag}_rand_s"] = t
        print(f"gather {tag} rand: {t:.3f}s "
              f"({NIDX * width * np.dtype(dtype).itemsize / t / 1e9:.1f} GB/s)",
              flush=True)
        t = timeit(row_sum_gather, table, idx_sort)
        res[f"gather_{tag}_sorted_s"] = t
        print(f"gather {tag} sorted: {t:.3f}s", flush=True)
        del table

    # one-hot matmul alternative at chunk granularity: gather 8192 rows
    # of [N,48] i32 via f32 one-hot matmul (MXU does gathers as GEMM):
    # [8192, N] x [N, 48] is far too big, but segment-blocked works:
    # sort indices, restrict each 8192-block to a narrow id band.
    # Probe the realistic block: [8192, 65536] onehot @ [65536, 48].
    table = jnp.asarray(rng.integers(0, 100, (N, 48), dtype=np.int32))
    blk_idx = jnp.asarray(rng.integers(0, 65536, (8192,), dtype=np.int32))

    @jax.jit
    def onehot_gather(table_blk, blk_idx):
        oh = (
            blk_idx[:, None]
            == jnp.arange(65536, dtype=jnp.int32)[None, :]
        ).astype(jnp.bfloat16)
        return jnp.einsum(
            "bn,nw->bw", oh, table_blk.astype(jnp.bfloat16)
        ).astype(jnp.int32)

    t = timeit(onehot_gather, table[:65536], blk_idx)
    res["onehot_gather_8192x65536_s"] = t
    print(f"onehot gather 8192x65536: {t:.4f}s", flush=True)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
