#!/usr/bin/env python3
"""Multi-chip quickstart: build, persist, and serve a sharded index.

Runs anywhere via an emulated 8-device mesh:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python examples/sharded_quickstart.py
On a real v5e-8 (or any pod slice whose device count the shard count
divides) the identical code runs over ICI.
"""

import tempfile

import numpy as np


def main() -> None:
    import jax

    from diskrag_tpu.benchmark import ground_truth, make_dataset, recall_at_k
    from diskrag_tpu.parallel import (
        build_sharded,
        load_sharded_index,
        make_mesh,
        save_sharded_index,
        sharded_search,
    )

    ndev = jax.device_count()
    n_shards = 4 if ndev % 4 == 0 else ndev
    pts, queries = make_dataset(20_000, 64, 100)
    gt = ground_truth(pts, queries, 10)

    # 1. Build: one independent Vamana graph per shard (embarrassingly
    #    parallel; on a pod each host builds its own shards)
    index = build_sharded(pts, n_shards, degree_bound=32)

    # 2. Persist + reload straight into the mesh layout — no device ever
    #    holds more than its own shard
    with tempfile.TemporaryDirectory() as d:
        save_sharded_index(index, d)
        mesh = make_mesh(n_shards=n_shards, n_data=ndev // n_shards)
        served = load_sharded_index(d, mesh=mesh)

        # 3. Query: batch split over the "data" mesh axis, per-shard
        #    top-k merged with an all_gather over the "shard" axis (ICI)
        ids, dists = sharded_search(served, queries, mesh,
                                    search_width=64, k=10)
        r = recall_at_k(np.asarray(ids), gt, 10)
        print(f"{n_shards}-shard mesh search: recall@10 = {r:.3f}")

    # The same artifacts serve through the engine/CLI:
    #   diskrag-tpu index <coll> --index-type sharded --shards 4
    #   diskrag-tpu search <coll> "query"          (auto: in-HBM mesh)
    #   ... --serving-mode host_tier               (bf16/PQ + host rerank)


if __name__ == "__main__":
    main()
