"""Two-process multi-host (DCN-analog) slice: distributed ingest +
global sharded search (SURVEY §2.6/§5.8; parallel/multihost.py).

Spawns two REAL processes (not emulated axes in one process): each gets
4 emulated CPU devices via --xla_force_host_platform_device_count,
joins a jax.distributed coordinator on a free localhost port with gloo
collectives, builds only its own dataset block's shards, and runs the
same global search. The parent asserts both exit green, hit the recall
gates, and returned byte-identical merged results (the ids digest).

The reference has nothing distributed (its index is one process + one
mmap file) — this tests blueprint capability, not parity.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_ingest_and_global_search():
    root = pathlib.Path(__file__).resolve().parent.parent
    worker = root / "tests" / "multihost_worker.py"
    port = _free_port()
    env = dict(os.environ)
    env.update(
        JAX_PLATFORMS="cpu",
        XLA_FLAGS="--xla_force_host_platform_device_count=4",
        PALLAS_AXON_POOL_IPS="",
        PYTHONPATH=str(root),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(i), str(port), "2"],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=600)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"
    results = [
        line for out in outs for line in out.splitlines()
        if line.startswith("RESULT")
    ]
    assert len(results) == 2, outs
    # SPMD determinism: both processes must read back the SAME merged
    # result (same digest) — a divergence means the replicated output
    # was assembled from different shard data on the two hosts
    digests = {line.split("ids_digest=")[1] for line in results}
    assert len(digests) == 1, results
