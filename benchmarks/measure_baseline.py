#!/usr/bin/env python3
"""Measure the reference-equivalent CPU baseline on this machine.

Generates the exact same seeded dataset as bench.py, compiles
reference_baseline.cpp with the reference's own flags (-O3 -ffast-math,
single-thread — pydiskann/setup.py:10), runs the sweep, and stores
benchmarks/baseline_measured.json (used by bench.py for vs_baseline).

Run: python benchmarks/measure_baseline.py  (env: BENCH_N/BENCH_DIM/BENCH_QUERIES)
"""

import json
import os
import pathlib
import subprocess
import sys
import tempfile

HERE = pathlib.Path(__file__).parent


def main() -> None:
    n = int(os.environ.get("BENCH_N", "200000"))
    dim = int(os.environ.get("BENCH_DIM", "128"))
    nq = int(os.environ.get("BENCH_QUERIES", "1000"))
    r, l_build, alpha, k = 48, 80, 1.2, 10
    widths = [32, 48, 64, 96, 128]

    sys.path.insert(0, str(HERE.parent))
    from diskrag_tpu.benchmark import make_dataset

    pts, queries = make_dataset(n, dim, nq)

    binary = HERE / "reference_baseline"
    src = HERE / "reference_baseline.cpp"
    if not binary.exists() or binary.stat().st_mtime < src.stat().st_mtime:
        print("compiling baseline…", flush=True)
        subprocess.run(
            ["g++", "-O3", "-ffast-math", "-march=native", "-o", str(binary), str(src)],
            check=True,
        )

    with tempfile.TemporaryDirectory() as td:
        dpath = pathlib.Path(td) / "data.bin"
        qpath = pathlib.Path(td) / "queries.bin"
        pts.astype("<f4").tofile(dpath)
        queries.astype("<f4").tofile(qpath)
        out = subprocess.run(
            [
                str(binary), str(dpath), str(n), str(dim), str(qpath), str(nq),
                str(r), str(l_build), str(alpha), str(k),
                ",".join(map(str, widths)),
            ],
            check=True, capture_output=True, text=True,
        ).stdout
    result = json.loads(out)
    ok = [p for p in result["sweep"] if p["recall"] >= 0.95]
    result["qps_at_recall_0.95"] = max((p["qps"] for p in ok), default=None)
    result["best_qps"] = max(p["qps"] for p in result["sweep"])
    result["config"] = {
        "n": n, "dim": dim, "n_queries": nq, "R": r, "L_build": l_build,
        "alpha": alpha, "k": k, "note": "reference-equivalent C++ single-thread",
    }
    out_path = HERE / "baseline_measured.json"
    out_path.write_text(json.dumps(result, indent=2))
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
