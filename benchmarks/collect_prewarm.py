#!/usr/bin/env python3
"""Collect pre-warmed XLA cache entries for the standard build geometry.

Runs the flagship 200k x 128 kNN graph build (bench.py's
`build_seconds_cold` protocol: build_vamana_knn, degree_bound=48,
alpha=1.2) against a FRESH compilation-cache dir, then packs exactly the
entries that build wrote into `prewarmed_cache.tar.zst` at the repo
root. utils/compile_cache.py unpacks that archive on first start in a
fresh checkout, so the driver's cold build reuses these programs
(reference comparison: the Cython builder has zero warmup,
cython_utils.pyx:269-369 — this closes most of the gap).

Run ON THE TARGET CHIP (cache keys include the backend):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/collect_prewarm.py

Options (env):
    PREWARM_DIR   scratch cache dir (default /tmp/prewarm_cache; wiped)
    INCLUDE_1M=1  also compile the 1M build geometry (bigger archive)
"""

import os
import pathlib
import shutil
import sys
import tarfile
import time

ROOT = pathlib.Path(__file__).resolve().parent.parent
SCRATCH = pathlib.Path(os.environ.get("PREWARM_DIR", "/tmp/prewarm_cache"))

# The cache-dir env var MUST be set before the interpreter starts: the
# axon sitecustomize imports jax at startup, freezing the config —
# setting os.environ here is silently ignored (measured 2026-08-21: a
# full 893 s cold build captured ZERO entries). Re-exec with the env in
# place instead of trusting a post-import assignment.
if os.environ.get("JAX_COMPILATION_CACHE_DIR") != str(SCRATCH):
    if SCRATCH.exists():
        shutil.rmtree(SCRATCH)
    SCRATCH.mkdir(parents=True)
    env = dict(os.environ)
    env["JAX_COMPILATION_CACHE_DIR"] = str(SCRATCH)
    env["JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS"] = "2"
    # keys must not embed the cache-dir path (utils/compile_cache.py:
    # the default xla_gpu_per_fusion_autotune_cache_dir injection made
    # every archive entry un-hittable from any other cache dir)
    env["JAX_PERSISTENT_CACHE_ENABLE_XLA_CACHES"] = "none"
    os.execve(sys.executable, [sys.executable, "-u", __file__], env)


def main() -> None:
    import zstandard

    from diskrag_tpu.benchmark import make_dataset
    from diskrag_tpu.graph.knn_build import build_vamana_knn

    geometries = [200_000]
    if os.environ.get("INCLUDE_1M"):
        geometries.append(1_000_000)

    for n in geometries:
        pts, _ = make_dataset(n, 128, 10)
        t0 = time.perf_counter()
        build_vamana_knn(pts, degree_bound=48, alpha=1.2, seed=0)
        print(f"build {n}: {time.perf_counter() - t0:.1f}s "
              "(cold-compile; entries captured)", flush=True)

    entries = sorted(p for p in SCRATCH.iterdir() if p.is_file())
    total = sum(p.stat().st_size for p in entries)
    print(f"{len(entries)} cache entries, {total / 1e6:.1f} MB raw")

    out = ROOT / "prewarmed_cache.tar.zst"
    cctx = zstandard.ZstdCompressor(level=19)
    with out.open("wb") as fh, cctx.stream_writer(fh) as zf:
        with tarfile.open(fileobj=zf, mode="w|") as tf:
            for p in entries:
                tf.add(p, arcname=p.name)
    print(f"wrote {out} ({out.stat().st_size / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
