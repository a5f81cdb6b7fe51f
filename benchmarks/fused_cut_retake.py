#!/usr/bin/env python3
"""Clean-window re-take of the round-3 fused-cut micros (VERDICT r3 #8).

The 2026-08-21 session that produced `last_fused_cut_tpu.json` had
documented 2.4x timing swings (remote compiles ~5x slow, 15-25 min RPC
stalls). This re-measures the three claims that carried the asterisk —
the 200k fused micro decomposition, the 200k rerank-width sweep, and
the 1M rerank-width sweep — with the same protocol (seeded bench data,
B=1000, k=10, `_measure` scalar-slice drain) and writes
`last_fused_cut_retake.json` next to the original so the two windows
can be compared line by line.

Run: JAX_COMPILATION_CACHE_DIR=.jax_cache \
     PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/fused_cut_retake.py
Env: RETAKE_1M=0 skips the 1M stage.
"""

from __future__ import annotations

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


def rw_sweep(pts, queries, gt, k, widths, repeats=3):
    import jax.numpy as jnp

    from diskrag_tpu.benchmark import _measure, recall_at_k
    from diskrag_tpu.ops.flat import FlatIndex

    idx = FlatIndex(pts, fused_precision="int8_packed")
    q = jnp.asarray(queries)
    rows = []
    for rw in widths:
        idx.rerank_width = rw
        dt, (_, ids) = _measure(lambda: idx.search(q, k=k), len(queries),
                                repeats)
        rows.append(
            {
                "rw": rw,
                "qps": round(len(queries) / dt),
                "recall": round(recall_at_k(np.asarray(ids), gt, k), 4),
                "ms": round(dt * 1e3 / 1, 4),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    return rows, idx


def main() -> None:
    from diskrag_tpu.benchmark import ground_truth, make_dataset

    k = 10
    out = {
        "date": time.strftime("%Y-%m-%d %H:%M UTC", time.gmtime()),
        "protocol": (
            "make_dataset seeded bench data, B=1000, k=10, "
            "FlatIndex(int8_packed), _measure scalar-slice drain — "
            "same as last_fused_cut_tpu.json (degraded 2026-08-21 "
            "window); this is the clean-window corroboration"
        ),
    }

    t0 = time.perf_counter()
    pts, queries = make_dataset(200_000, 128, 1000)
    gt = ground_truth(pts, queries, k)
    print(f"200k dataset+gt {time.perf_counter() - t0:.1f}s", flush=True)
    out["sweep_200k"], _ = rw_sweep(
        pts, queries, gt, k, (14, 18, 20, 22, 26)
    )

    if os.environ.get("RETAKE_1M", "1") == "1":
        t0 = time.perf_counter()
        pts, queries = make_dataset(1_000_000, 128, 1000)
        gt = ground_truth(pts, queries, k)
        print(f"1M dataset+gt {time.perf_counter() - t0:.1f}s", flush=True)
        out["sweep_1m"], _ = rw_sweep(
            pts, queries, gt, k, (14, 18, 22, 26)
        )

    path = pathlib.Path(__file__).resolve().parent / "last_fused_cut_retake.json"
    path.write_text(json.dumps(out, indent=1))
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
