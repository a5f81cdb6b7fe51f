#!/usr/bin/env python3
"""Per-module subprocess test runner — the `make test` entry point.

Why not one pytest process: after ~170 tests' worth of accumulated XLA
CPU-client compile state in a single process, XLA's
`backend_compile_and_load` can SIGSEGV on small machines (reproduced on
a 1-core box with 8 emulated devices — VERDICT r2 Weak #6). No test
assertion ever fails; the process dies. Running each test module in its
own subprocess bounds the per-process compile count, so the suite
produces a real green summary line anywhere.

The reference has no pytest suite at all (`tests/.gitkeep`, SURVEY §4);
its ad-hoc `make test` scripts also ran as separate processes.

Usage:
  python tests/run_suite.py            # full suite, per-module isolation
  python tests/run_suite.py --quick    # <3 min tier: kernel oracles +
                                       # engine modes on tiny data
  python tests/run_suite.py -j 4      # run up to 4 modules concurrently

Any additional arguments are passed through to pytest.
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

TESTS_DIR = Path(__file__).parent

# The quick tier: fast kernel oracles + data-layer + one engine module.
# Everything here runs on tiny shapes; heavyweight modules (host tier,
# sharded mesh, streaming ingest cycles, build checkpoints) are full-tier
# only.
QUICK_MODULES = [
    "test_ops.py",       # kernel numpy oracles
    "test_pq_scan.py",
    "test_data.py",      # collection/chunker/config
    "test_native.py",    # C++ io lib
    "test_flat_ivf.py",  # flat + ivf serving on tiny data
    "test_intq.py",
    "test_persist.py",   # artifact round-trips
]  # measured 151s serial on the build box (full suite: 1906s)

_SUMMARY_RE = re.compile(
    r"(?:(\d+) failed)?(?:, )?(?:(\d+) passed)?(?:, )?(?:(\d+) skipped)?"
)


def _parse_counts(out: str) -> tuple[int, int, int]:
    """(passed, failed, skipped) from pytest's summary line."""
    passed = failed = skipped = 0
    for line in out.splitlines()[::-1]:
        if " passed" in line or " failed" in line or " error" in line:
            for n, word in re.findall(r"(\d+) (\w+)", line):
                if word == "passed":
                    passed = int(n)
                elif word in ("failed", "error", "errors"):
                    failed += int(n)
                elif word == "skipped":
                    skipped = int(n)
            break
    return passed, failed, skipped


def _run_module(mod: Path, extra: list[str]) -> dict:
    t0 = time.perf_counter()
    env = dict(os.environ)
    # CPU-only, emulated mesh — conftest enforces this too, but make the
    # subprocess env explicit so the runner works stand-alone
    env.setdefault("PALLAS_AXON_POOL_IPS", "")
    env.setdefault("JAX_PLATFORMS", "cpu")
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", str(mod), "-q", "--no-header"]
        + extra,
        capture_output=True,
        text=True,
        env=env,
        cwd=TESTS_DIR.parent,
    )
    out = proc.stdout + proc.stderr
    passed, failed, skipped = _parse_counts(out)
    crashed = proc.returncode not in (0, 1) or (
        proc.returncode != 0 and failed == 0 and passed == 0
    )
    return {
        "module": mod.name,
        "rc": proc.returncode,
        "passed": passed,
        "failed": failed,
        "skipped": skipped,
        "crashed": crashed,
        "seconds": time.perf_counter() - t0,
        "output": out,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true", help="fast tier only")
    ap.add_argument(
        "-j", "--jobs", type=int, default=1,
        help="concurrent module subprocesses (default 1: serial keeps "
        "peak memory and CPU contention bounded on small boxes)",
    )
    args, extra = ap.parse_known_args()

    if args.quick:
        mods = [TESTS_DIR / m for m in QUICK_MODULES]
    else:
        mods = sorted(TESTS_DIR.glob("test_*.py"))
    missing = [m for m in mods if not m.exists()]
    if missing:
        print(f"missing modules: {[m.name for m in missing]}")
        return 2

    t0 = time.perf_counter()
    if args.jobs > 1:
        with ThreadPoolExecutor(max_workers=args.jobs) as ex:
            results = list(ex.map(lambda m: _run_module(m, extra), mods))
    else:
        results = []
        for m in mods:
            r = _run_module(m, extra)
            status = "ok" if r["rc"] == 0 else "FAIL"
            print(
                f"  {r['module']:<28} {status:>4}  "
                f"{r['passed']:>3} passed  {r['seconds']:6.1f}s",
                flush=True,
            )
            results.append(r)

    total_p = sum(r["passed"] for r in results)
    total_f = sum(r["failed"] for r in results)
    total_s = sum(r["skipped"] for r in results)
    bad = [r for r in results if r["rc"] != 0]
    for r in bad:
        print(f"\n=== {r['module']} (rc={r['rc']}) ===")
        # replay the tail of the failing module's output
        print("\n".join(r["output"].splitlines()[-40:]))

    wall = time.perf_counter() - t0
    tier = "quick" if args.quick else "full"
    skipped = f", {total_s} skipped" if total_s else ""
    if bad:
        crashes = [r["module"] for r in results if r["crashed"]]
        crash_note = f" (crashed: {', '.join(crashes)})" if crashes else ""
        print(
            f"\n{tier} suite: {total_f} failed, {total_p} passed{skipped} "
            f"in {wall:.0f}s across {len(mods)} modules{crash_note}"
        )
        return 1
    print(
        f"\n{tier} suite: {total_p} passed{skipped} in {wall:.0f}s "
        f"across {len(mods)} modules — all green"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
