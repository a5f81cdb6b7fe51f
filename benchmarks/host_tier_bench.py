"""Host-offload tier benchmark at 1M+ scale (BASELINE.json config 4:
"disk-style split" — graph + compressed traversal data in HBM, f32
vectors host-resident, exact rerank on the host).

Builds (or reuses, via --index-dir) a kNN-built Vamana index with the
packed record file, then sweeps the host tier and prints per-stage
timings. Run on the real TPU:

    JAX_COMPILATION_CACHE_DIR=.jax_cache python benchmarks/host_tier_bench.py \
        --n 1000000 --mode bf16

Takes ~5 min with a warm cache (graph build dominates).
"""

from __future__ import annotations

import argparse
import json
import pathlib
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--mode", default="bf16", choices=["bf16", "pq", "iq"])
    ap.add_argument(
        "--train-quantizer", default=None,
        choices=["iq8", "iq4c1024", "rpq32", "rpq64"],
        help="train + persist quantizer artifacts into the index dir "
        "before serving (needed once per index for --mode pq/iq; the "
        "dataset is regenerated if the index was reused)",
    )
    ap.add_argument("--widths", type=int, nargs="+", default=[32, 48])
    ap.add_argument("--expand", type=int, default=8)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument(
        "--index-dir", default=None,
        help="reuse an existing index dir instead of building",
    )
    ap.add_argument("--R", type=int, default=32)
    ap.add_argument(
        "--knn-probe", type=int, default=8,
        help="IVF-probe width for the kNN build backend (>2M points)",
    )
    ap.add_argument(
        "--scratch", default="/tmp/diskrag_host_tier",
        help="where to build the index if --index-dir is not given",
    )
    ap.add_argument(
        "--extra-entry-points", type=int, default=0,
        help="augment the persisted entry points with this many extra "
        "uniform random seeds (no rebuild needed)",
    )
    ap.add_argument("--entry-seed", type=int, default=0)
    ap.add_argument(
        "--pipeline-chunk", type=int, default=0,
        help="chunk size for search_pipelined (0 = unpipelined search)",
    )
    ap.add_argument(
        "--stream", type=int, default=1,
        help="replicate the query batch this many times and measure "
        "steady-state pipelined throughput across the stream (keeps the "
        "full batch per dispatch; overlap happens across batches)",
    )
    args = ap.parse_args()

    from diskrag_tpu.benchmark import ground_truth, make_dataset, recall_at_k
    from diskrag_tpu.index.host_tier import HostTierIndex

    scratch = pathlib.Path(args.scratch)
    gt_path = scratch / f"gt_{args.n}_{args.dim}_{args.queries}_{args.k}.npy"
    q_path = scratch / f"q_{args.n}_{args.dim}_{args.queries}.npy"

    if args.index_dir:
        index_dir = pathlib.Path(args.index_dir)
    else:
        index_dir = scratch / f"idx_{args.n}_{args.dim}" / "index"
    meta_p = index_dir / "meta.json"
    index_ready = (
        meta_p.exists()
        and json.loads(meta_p.read_text()).get("num_points") == args.n
        and (index_dir / "index.dat").exists()
    )

    # the dataset itself is only needed to build the index / ground truth;
    # at 10M its generation costs ~15 min, so skip it when everything is
    # already on disk (queries are cached beside the gt for that purpose)
    pts = None
    if index_ready and gt_path.exists() and q_path.exists():
        queries = np.load(q_path)
        print(f"reusing index at {index_dir} (dataset gen skipped)")
    else:
        t0 = time.perf_counter()
        pts, queries = make_dataset(args.n, args.dim, args.queries)
        print(f"dataset {args.n}x{args.dim}: {time.perf_counter() - t0:.1f}s")
        q_path.parent.mkdir(parents=True, exist_ok=True)
        np.save(q_path, queries)
        if index_ready:
            print(f"reusing index at {index_dir}")

    if not args.index_dir:
        if not index_ready:
            from diskrag_tpu.graph.knn_build import build_vamana_knn
            from diskrag_tpu.index.persist import save_index

            t0 = time.perf_counter()
            index = build_vamana_knn(
                pts, degree_bound=args.R, knn_probe=args.knn_probe,
                progress=True, checkpoint_dir=index_dir.parent / "ckpt",
            )
            build_s = time.perf_counter() - t0
            print(f"graph build: {build_s:.1f}s")
            t0 = time.perf_counter()
            save_index(index_dir, index, write_compat=True, host_vectors=pts)
            print(f"persist (incl. record file): {time.perf_counter() - t0:.1f}s")
            del index

    t0 = time.perf_counter()
    if gt_path.exists():
        gt = np.load(gt_path)
        print(f"ground truth (cached): {time.perf_counter() - t0:.1f}s")
    else:
        gt = ground_truth(pts, queries, args.k)
        gt_path.parent.mkdir(parents=True, exist_ok=True)
        np.save(gt_path, gt)
        print(f"ground truth: {time.perf_counter() - t0:.1f}s")
    if args.train_quantizer:
        from diskrag_tpu.index.persist import IndexStore, save_pq_artifacts

        store = IndexStore(index_dir)
        if pts is None:
            t0 = time.perf_counter()
            pts, _ = make_dataset(args.n, args.dim, args.queries)
            print(f"dataset regen for quantizer: "
                  f"{time.perf_counter() - t0:.1f}s")
        t0 = time.perf_counter()
        kind = args.train_quantizer
        if kind.startswith("iq"):
            from diskrag_tpu.pq.intq import IntQuantizer

            if kind == "iq8":
                quant = IntQuantizer(bits=8).fit(pts, seed=0)
            else:  # iq4c1024 — the <=80 B/pt capacity rung (VERDICT #2)
                quant = IntQuantizer(bits=4, n_cells=1024).fit(pts, seed=0)
            extra = save_pq_artifacts(
                store, quant, np.asarray(quant.encode(pts))
            )
        else:
            from diskrag_tpu.pq.residual import ResidualPQ

            quant = ResidualPQ(n_subvectors=int(kind[3:])).fit(pts, seed=0)
            codes, cids = quant.encode(pts)
            extra = save_pq_artifacts(
                store, quant, np.asarray(codes), coarse_ids=np.asarray(cids)
            )
        meta = json.loads(meta_p.read_text())
        meta.update(extra)
        meta_p.write_text(json.dumps(meta))
        print(f"quantizer {kind}: {time.perf_counter() - t0:.1f}s")
    del pts

    ht = HostTierIndex.from_store(index_dir, mode=args.mode)
    if args.extra_entry_points:
        # entry points are search-time seeds, not graph structure: augment
        # the persisted set with extra uniform random ids to test/extend
        # seed coverage without rebuilding (see knn_build.compute_entry_points
        # — past 20k seeds random sampling matches k-means placement)
        import jax.numpy as jnp

        rng = np.random.default_rng(args.entry_seed)
        base = (
            np.zeros((0,), np.int64) if ht.entry_points is None
            else np.asarray(ht.entry_points, np.int64)
        )
        extra = rng.choice(
            ht.adjacency.shape[0], size=args.extra_entry_points, replace=False
        )
        merged = np.unique(np.concatenate([base, extra]))
        ht.entry_points = jnp.asarray(merged, jnp.int32)
        print(f"entry points: {len(base)} persisted + {args.extra_entry_points} "
              f"random -> {len(merged)} unique")

    n_total = args.queries * args.stream
    stream_q = (
        np.tile(queries, (args.stream, 1)) if args.stream > 1 else queries
    )

    def run(w):
        if args.stream > 1:
            return ht.search_pipelined(
                stream_q, search_width=w, k=args.k,
                expand_width=args.expand,
                chunk=args.pipeline_chunk or args.queries,
            )
        if args.pipeline_chunk:
            return ht.search_pipelined(
                queries, search_width=w, k=args.k,
                expand_width=args.expand, chunk=args.pipeline_chunk,
            )
        return ht.search(
            queries, search_width=w, k=args.k, expand_width=args.expand
        )

    for w in args.widths:
        # warm (full batch shape — compile + page cache); when pipelining,
        # this also warms the chunk shape
        run(w)
        times, stats = [], None
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            dists, ids, stats = run(w)
            times.append(time.perf_counter() - t0)
        dt = min(times)
        rec = recall_at_k(ids[: args.queries], gt, args.k)
        line = {
            "mode": args.mode,
            "L": w,
            "E": args.expand,
            "recall": round(rec, 4),
            "qps": round(n_total / dt, 1),
            "batch_ms": round(dt * 1e3, 1),
            "stage_ms": {k: round(v, 1) for k, v in stats["stage_ms"].items()},
            "host_vectors_fetched": stats["host_vectors_fetched"],
        }
        if args.pipeline_chunk:
            line["pipeline_chunk"] = args.pipeline_chunk
        if args.stream > 1:
            line["stream"] = args.stream
        print(json.dumps(line))


if __name__ == "__main__":
    main()
