"""Multi-host worker: one simulated "host" of a pod (spawned N times by
tests/test_multihost.py with distinct process ids).

Each process owns 4 emulated CPU devices and a contiguous block of the
dataset, builds its shards locally (ingest never crosses DCN —
parallel/multihost.py module doc), joins the global mesh, and runs the
same global searches. Asserts recall against a local numpy oracle and
that every process sees identical merged results.

Env (JAX_PLATFORMS / XLA_FLAGS / PALLAS_AXON_POOL_IPS) must be set by
the SPAWNER: sitecustomize may import jax before this file runs, which
freezes the platform config (CLAUDE.md 2026-08-21).
"""

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np


def main() -> None:
    pid, port, nproc = int(sys.argv[1]), sys.argv[2], int(sys.argv[3])

    from diskrag_tpu.parallel import multihost as mh

    mh.initialize(f"localhost:{port}", nproc, pid)
    import jax

    assert jax.process_count() == nproc
    assert jax.device_count() == 4 * nproc, jax.devices()

    cfg = mh.MultihostConfig(
        f"localhost:{port}", nproc, pid, shards_per_host=4
    )
    n, dim, nq, k = 4096, 32, 64, 10

    # the full dataset is seeded so the oracle is derivable everywhere,
    # but ingest slices ONLY this host's block — vectors never cross DCN
    rng = np.random.default_rng(0)
    centers = (rng.normal(size=(32, dim)) * 3.0).astype(np.float32)
    pts = (
        centers[rng.integers(0, 32, size=n)]
        + rng.normal(size=(n, dim)).astype(np.float32)
    ).astype(np.float32)
    queries = (
        centers[rng.integers(0, 32, size=nq)]
        + rng.normal(size=(nq, dim)).astype(np.float32)
    ).astype(np.float32)

    lo, hi = cfg.my_block(n)
    per_host = -(-n // nproc)
    per_shard = -(-per_host // cfg.shards_per_host)
    local = mh.build_local_shards(
        pts[lo:hi], lo, n_local_shards=cfg.shards_per_host,
        degree_bound=24, rows_per_shard=per_shard,
    )

    mesh = mh.global_shard_mesh()
    assert mesh.shape["shard"] == cfg.n_global_shards
    index = mh.assemble_global_index(local, mesh, cfg.n_global_shards)
    ids, dists = mh.multihost_sharded_search(
        index, queries, mesh, search_width=32, k=k
    )

    d2 = np.sum(
        (queries[:, None, :] - pts[None, :, :]) ** 2, axis=-1
    )
    gt = np.argsort(d2, axis=1)[:, :k]
    graph_recall = float(np.mean(
        [len(set(ids[i]) & set(gt[i])) / k for i in range(nq)]
    ))
    # merged distances must be the true distances of the returned ids
    picked = np.take_along_axis(d2, ids.astype(np.int64), axis=1)
    assert np.allclose(dists, picked, rtol=1e-4, atol=1e-3)

    # exhaustive bf16 scan over the same global mesh (sharded_flat form)
    import ml_dtypes
    from jax.sharding import PartitionSpec as P

    v = np.asarray(local["vectors"])
    gv = mh._local_to_global(
        mesh, P("shard", None, None), v.astype(ml_dtypes.bfloat16),
        cfg.n_global_shards,
    )
    gn = mh._local_to_global(
        mesh, P("shard", None),
        np.einsum("snd,snd->sn", v, v, dtype=np.float32),
        cfg.n_global_shards,
    )
    gg = mh._local_to_global(
        mesh, P("shard", None), np.asarray(local["global_ids"]),
        cfg.n_global_shards,
    )
    fids, _ = mh.multihost_flat_search(gv, gn, gg, queries, mesh, k=k)
    flat_recall = float(np.mean(
        [len(set(fids[i]) & set(gt[i])) / k for i in range(nq)]
    ))

    print(
        f"RESULT pid={pid} graph_recall={graph_recall:.4f} "
        f"flat_recall={flat_recall:.4f} "
        f"ids_digest={int(np.sum(ids * np.arange(1, k + 1))) & 0xFFFFFFFF}",
        flush=True,
    )
    assert graph_recall >= 0.9, graph_recall
    # the flat scan is exhaustive but scores in bf16 (serving contract:
    # exact ids, bf16-precision distances) — tight synthetic clusters
    # at dim=32 lose a few top-10 orderings to the 8-bit mantissa
    assert flat_recall >= 0.95, flat_recall
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
