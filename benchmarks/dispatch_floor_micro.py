#!/usr/bin/env python3
"""200k dispatch-floor probe (VERDICT r4 #6): the packed fused scan at
200k runs ~25% int8-MFU vs ~40% at 1M because a fixed per-dispatch cost
dominates the 0.55 ms batch. Two questions, answered by measurement:

  1. Does a bigger query batch amortize the floor? Sweep B in
     {1000, 2048, 4096} at 200k (and 1M under INCLUDE_1M=1): if time
     grows sublinearly in B, the gap was per-dispatch overhead and the
     B=4096 point is the 200k headline ceiling; if it grows linearly,
     the kernel itself is the floor and 25% MFU is the honest number.
  2. Where does the remaining time go? Reported as achieved int8-op/s
     vs the chip's MXU peak per point (the PERFORMANCE.md MFU table).

Timing uses `_measure` (dispatch-scaled repeats, one scalar-slice drain)
— never naive wall clock on the tunneled TPU (CLAUDE.md). Each B's
recall is checked on the leading 1000 queries against the exact GT so a
mis-shaped tile can't masquerade as a speedup.

Protocol matched: reference dataset_benchmark.py:102-130 (same dataset
family, k=10); batch size is serving-side free choice there too (the
reference serves one query at a time — B is where the TPU wins live).
"""

from __future__ import annotations

import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from diskrag_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache(seed=False)

import numpy as np

# v5e-class chip: 394.7 int8 TOPS MXU peak (public spec); the s8xs8->s32
# packed scan does 2*N*D int8 ops per query
PEAK_INT8_TOPS = 394.7


def main() -> None:
    from diskrag_tpu.benchmark import (
        _measure,
        ground_truth,
        make_dataset,
        recall_at_k,
    )
    from diskrag_tpu.ops.flat import FlatIndex

    import jax.numpy as jnp

    k = 10
    scales = [int(os.environ.get("DF_N", "200000"))]  # DF_N: CPU smoke
    if os.environ.get("INCLUDE_1M"):
        scales.append(1_000_000)
    batches = tuple(
        int(b) for b in os.environ.get("BATCHES", "1000,2048,4096").split(",")
    )
    record = {"batches": list(batches), "peak_int8_tops": PEAK_INT8_TOPS,
              "runs": []}
    out_path = pathlib.Path(__file__).parent / "last_dispatch_floor.json"

    for n in scales:
        pts, qpool = make_dataset(n, 128, 1000)
        gt = ground_truth(pts, qpool, k)
        rw = 20 if n == 200_000 else 22  # headline operating points
        idx = FlatIndex(pts, fused_precision="int8_packed", rerank_width=rw)
        d = pts.shape[1]
        for b in batches:
            reps_idx = np.arange(b) % len(qpool)
            q = jnp.asarray(np.asarray(qpool)[reps_idx])
            t0 = time.perf_counter()
            dt, (dists, ids) = _measure(
                lambda: idx.search(q, k=k), b, repeats=3
            )
            rec = recall_at_k(np.asarray(ids)[:1000], gt, k)
            ops = 2.0 * n * d * b / dt
            line = {
                "n": n,
                "rw": rw,
                "batch": b,
                "batch_ms": round(dt * 1e3, 4),
                "qps": round(b / dt, 1),
                "recall@10_first1000": round(rec, 4),
                "int8_tops": round(ops / 1e12, 1),
                "mfu_pct": round(100.0 * ops / (PEAK_INT8_TOPS * 1e12), 1),
                "wall_s": round(time.perf_counter() - t0, 1),
            }
            print(json.dumps(line), flush=True)
            record["runs"].append(line)
            record["measured"] = time.strftime("%Y-%m-%d %H:%M UTC",
                                               time.gmtime())
            out_path.write_text(json.dumps(record, indent=1))
        del idx
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
