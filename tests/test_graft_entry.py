"""Guards the driver entry points in __graft_entry__.py.

The multichip test reproduces the DRIVER's exact conditions: a fresh
subprocess whose JAX sees too few devices (the round-1 driver ran against
the single real chip and MULTICHIP_r01 recorded ok:false).
dryrun_multichip must self-bootstrap an emulated mesh in that situation —
this test is red without the bootstrap and green with it.
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _fresh_env(force_flags: str) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""  # skip remote-TPU registration
    env["XLA_FLAGS"] = force_flags
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return env


def test_dryrun_multichip_bootstraps_from_single_device():
    # No force_host_platform flag: the subprocess sees ONE cpu device,
    # exactly like the driver's single-real-chip environment. The entry
    # point must detect this and re-exec onto an 8-device emulated mesh.
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=_fresh_env(""),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout[-3000:]


def test_dryrun_multichip_runs_inline_with_enough_devices():
    # With 8 devices already visible it must run inline (no re-exec).
    proc = subprocess.run(
        [
            sys.executable,
            "-c",
            "import __graft_entry__ as g; g.dryrun_multichip(8)",
        ],
        env=_fresh_env("--xla_force_host_platform_device_count=8"),
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=1200,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "dryrun_multichip ok" in proc.stdout, proc.stdout[-3000:]
