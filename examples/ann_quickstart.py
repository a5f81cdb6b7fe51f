#!/usr/bin/env python3
"""Library-level quickstart: the three index families on random data.

Run offline on CPU:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python examples/ann_quickstart.py
On a TPU host just run it plain — the same code uses the MXU fast paths
(fused Pallas flat scan, kNN-based graph build) automatically.
"""

import tempfile

import numpy as np


def main() -> None:
    import jax.numpy as jnp

    from diskrag_tpu.benchmark import ground_truth, make_dataset, recall_at_k
    from diskrag_tpu.graph.knn_build import build_vamana_knn
    from diskrag_tpu.graph.search import beam_search
    from diskrag_tpu.index.ivf import build_ivf
    from diskrag_tpu.index.persist import load_index, save_index
    from diskrag_tpu.ops.flat import FlatIndex

    pts, queries = make_dataset(20_000, 64, 100)
    gt = ground_truth(pts, queries, 10)

    # 1. Flat — exhaustive MXU scan, exact-quality, zero build time
    flat = FlatIndex(pts)
    _, ids = flat.search(queries, k=10)
    print(f"flat      recall@10 = {recall_at_k(np.asarray(ids), gt, 10):.3f}")

    # 2. IVF — k-means cells, probes trade recall for speed
    ivf = build_ivf(pts, seed=0)
    _, ids = ivf.search(queries, k=10, n_probe=16)
    print(f"ivf(p=16) recall@10 = {recall_at_k(np.asarray(ids), gt, 10):.3f}")

    # 3. Vamana graph — the beyond-HBM engine (kNN-based fast build)
    index = build_vamana_knn(pts, degree_bound=32, alpha=1.2, seed=0)
    res = beam_search(
        index.vectors, index.adjacency, index.medoid, jnp.asarray(queries),
        search_width=48, k=10, expand_width=8,
        entry_points=index.entry_points,
    )
    print(f"graph     recall@10 = {recall_at_k(np.asarray(res.ids), gt, 10):.3f}")

    # persistence round-trip
    with tempfile.TemporaryDirectory() as d:
        save_index(d, index)
        loaded, _, _, meta = load_index(d)
        assert meta["num_points"] == len(pts)
        print(f"persisted + reloaded: N={meta['num_points']} R={meta['R']}")


if __name__ == "__main__":
    main()
