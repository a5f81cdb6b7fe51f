#!/usr/bin/env python3
"""Host-tier sweep over MULTIPLE quantized traversal modes on ONE index.

Builds (or reuses) the kNN Vamana index + packed record file once, then
for each requested quantizer: trains + persists its artifacts into the
index dir (pq-family meta keys replaced, not merged), serves it through
HostTierIndex, and sweeps search widths. One process = one dataset gen
and one graph build amortized over every mode — at 10M the dataset
alone costs ~15 min and the build ~83 min, so the per-mode loop is the
only affordable way to fill the capacity-ladder table
(VERDICT r2 #2/#3: the >=0.95-recall <=80 B/pt rung and the 10M iq8
row; the reference counterpart is the PQ serving mode,
reference search_engine.py:381-506, and the disk tier it replaces,
io/diskann_persist.py:209).

Run (1M, ~20 min warm):
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/host_tier_multi.py \
        --n 1000000 --quantizers iq8,iq4c1024,rpq64
At 10M add --R 32 --knn-probe 8 (HBM-budgeted build) and expect ~2 h
cold.
"""

from __future__ import annotations

import argparse
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

# mode + default width grid per quantizer tag; capacity-rung tags sweep
# wider beams (the host rerank absorbs ordering error, VERDICT #2)
QUANT_SPECS = {
    "bf16": ("bf16", (24, 32, 48)),
    "iq8": ("iq", (24, 32, 48)),
    "iq4c1024": ("iq", (32, 48, 64, 96)),
    "rpq32": ("pq", (48, 64, 96)),
    "rpq64": ("pq", (48, 64, 96, 128)),
}


def train_quantizer(tag: str, pts: np.ndarray, store, meta_p) -> float:
    """Train + persist `tag`'s artifacts; replaces pq-family meta keys."""
    from diskrag_tpu.index.persist import save_pq_artifacts

    t0 = time.perf_counter()
    if tag == "bf16":
        return 0.0
    if tag.startswith("iq"):
        from diskrag_tpu.pq.intq import IntQuantizer

        quant = (
            IntQuantizer(bits=8)
            if tag == "iq8"
            else IntQuantizer(bits=4, n_cells=1024)
        ).fit(pts, seed=0)
        extra = save_pq_artifacts(store, quant, np.asarray(quant.encode(pts)))
    else:
        from diskrag_tpu.pq.residual import ResidualPQ

        quant = ResidualPQ(n_subvectors=int(tag[3:])).fit(pts, seed=0)
        codes, cids = quant.encode(pts)
        extra = save_pq_artifacts(
            store, quant, np.asarray(codes), coarse_ids=np.asarray(cids)
        )
    meta = json.loads(meta_p.read_text())
    # replace, don't merge: stale keys from the previous mode would
    # corrupt auto-detection (cli doctor strips these for the same
    # reason)
    for k in list(meta):
        if k.startswith(("pq_", "iq_")) or k in ("n_subvectors", "use_pq"):
            del meta[k]
    meta.update(extra)
    meta_p.write_text(json.dumps(meta))
    return time.perf_counter() - t0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=1000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--quantizers", default="iq8,iq4c1024,rpq64")
    ap.add_argument("--widths", default=None,
                    help="override width grid for ALL modes, e.g. 32,64")
    ap.add_argument(
        "--expand", default="8",
        help="comma list of expand widths to sweep (wider expansion = "
             "fewer sequential frontier rounds — the only lever against "
             "the ~1 ms/round HBM-latency floor; VERDICT r4 #3)",
    )
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--R", type=int, default=32)
    ap.add_argument("--knn-probe", type=int, default=8)
    ap.add_argument("--extra-entry-points", type=int, default=0)
    ap.add_argument(
        "--no-gather-pad", action="store_true",
        help="disable the 256 B iq row gather pad (A/B control)",
    )
    ap.add_argument(
        "--pipeline", type=int, default=0, metavar="CHUNK",
        help="measure via search_pipelined with this query chunk "
             "(device traverses chunk i+1 while the host reranks chunk "
             "i — the serving engine's path); 0 = plain search()",
    )
    ap.add_argument(
        "--rerank-pool", type=int, default=0,
        help="truncate the host rerank to the best-ordered POOL ids per "
             "query (iq8 traversal ordering is near-exact, so a short "
             "pool keeps recall while cutting host gather+BLAS); 0 = "
             "full beam+visited pool",
    )
    ap.add_argument("--scratch", default="/tmp/diskrag_host_tier")
    ap.add_argument(
        "--reuse-quantizer", default="",
        help="comma list of tags whose artifacts are ALREADY persisted "
             "in the index dir meta (skips the train+persist step — the "
             "operator asserts the on-disk artifacts are that tag's)",
    )
    args = ap.parse_args()

    from diskrag_tpu.benchmark import ground_truth, make_dataset, recall_at_k
    from diskrag_tpu.index.host_tier import HostTierIndex
    from diskrag_tpu.index.persist import IndexStore

    scratch = pathlib.Path(args.scratch)
    index_dir = scratch / f"idx_{args.n}_{args.dim}" / "index"
    meta_p = index_dir / "meta.json"
    gt_path = scratch / f"gt_{args.n}_{args.dim}_{args.queries}_{args.k}.npy"
    q_path = scratch / f"q_{args.n}_{args.dim}_{args.queries}.npy"

    index_ready = (
        meta_p.exists()
        and json.loads(meta_p.read_text()).get("num_points") == args.n
        and (index_dir / "index.dat").exists()
    )

    t0 = time.perf_counter()
    pts, queries = make_dataset(args.n, args.dim, args.queries)
    print(f"dataset {args.n}x{args.dim}: {time.perf_counter() - t0:.1f}s",
          flush=True)
    q_path.parent.mkdir(parents=True, exist_ok=True)
    np.save(q_path, queries)

    out_path = (
        pathlib.Path(__file__).resolve().parent
        / f"last_host_tier_multi_{args.n}.json"
    )
    # merge-append into an existing same-shape record: a crash mid-run
    # (or a follow-up sweep) must not discard rows already measured
    results = {"n": args.n, "dim": args.dim, "runs": []}
    if out_path.exists():
        prev = json.loads(out_path.read_text())
        if prev.get("n") == args.n and prev.get("dim") == args.dim:
            results = prev
    if not index_ready:
        from diskrag_tpu.graph.knn_build import build_vamana_knn
        from diskrag_tpu.index.persist import save_index

        t0 = time.perf_counter()
        index = build_vamana_knn(
            pts, degree_bound=args.R, knn_probe=args.knn_probe,
            progress=True, checkpoint_dir=index_dir.parent / "ckpt",
        )
        results["build_s"] = round(time.perf_counter() - t0, 1)
        print(f"graph build: {results['build_s']}s", flush=True)
        t0 = time.perf_counter()
        save_index(index_dir, index, write_compat=True, host_vectors=pts)
        print(f"persist: {time.perf_counter() - t0:.1f}s", flush=True)
        del index
    else:
        print(f"reusing index at {index_dir}", flush=True)

    if gt_path.exists():
        gt = np.load(gt_path)
    else:
        t0 = time.perf_counter()
        gt = ground_truth(pts, queries, args.k)
        np.save(gt_path, gt)
        print(f"ground truth: {time.perf_counter() - t0:.1f}s", flush=True)

    store = IndexStore(index_dir)
    for tag in args.quantizers.split(","):
        mode, widths = QUANT_SPECS[tag]
        if args.widths:
            widths = tuple(int(w) for w in args.widths.split(","))
        if tag in args.reuse_quantizer.split(","):
            train_s = 0.0
            print(f"quantizer {tag}: reusing persisted artifacts",
                  flush=True)
        else:
            train_s = train_quantizer(tag, pts, store, meta_p)
            print(f"quantizer {tag}: trained+persisted in {train_s:.1f}s",
                  flush=True)
        ht = HostTierIndex.from_store(
            index_dir, mode=mode, gather_pad=not args.no_gather_pad
        )
        if args.extra_entry_points:
            import jax.numpy as jnp

            rng = np.random.default_rng(0)
            base = (
                np.zeros((0,), np.int64) if ht.entry_points is None
                else np.asarray(ht.entry_points, np.int64)
            )
            extra = rng.choice(
                ht.adjacency.shape[0], size=args.extra_entry_points,
                replace=False,
            )
            ht.entry_points = jnp.asarray(
                np.unique(np.concatenate([base, extra])), jnp.int32
            )
        bpp = None
        if mode == "iq":
            # true payload width, not the 256 B gather pad
            bpp = int(ht.pq.row_width) if ht.pq is not None else None
        elif mode == "pq":
            bpp = int(ht.codes.shape[1]) + (
                8 if ht.pq_cells is not None else 0
            )
        expands = tuple(int(e) for e in str(args.expand).split(","))

        rp = args.rerank_pool or None

        def call(w, e):
            if args.pipeline:
                return ht.search_pipelined(
                    queries, search_width=w, k=args.k, expand_width=e,
                    chunk=args.pipeline, rerank_pool=rp,
                )
            return ht.search(
                queries, search_width=w, k=args.k, expand_width=e,
                rerank_pool=rp,
            )

        for w in widths:
            for e in expands:
                call(w, e)
                times, stats = [], None
                for _ in range(args.repeats):
                    t0 = time.perf_counter()
                    dists, ids, stats = call(w, e)
                    times.append(time.perf_counter() - t0)
                dt = min(times)
                rec = recall_at_k(ids[: args.queries], gt, args.k)
                line = {
                    "quantizer": tag,
                    "mode": mode,
                    "R": args.R,
                    "bytes_per_point": bpp,
                    "L": w,
                    "E": e,
                    "entry_extra": args.extra_entry_points,
                    "gather_pad": not args.no_gather_pad,
                    "pipeline_chunk": args.pipeline or None,
                    "rerank_pool": rp,
                    "recall": round(rec, 4),
                    "qps": round(args.queries / dt, 1),
                    "batch_ms": round(dt * 1e3, 1),
                    "train_s": round(train_s, 1),
                    "stage_ms": {
                        k: round(v, 1) for k, v in stats["stage_ms"].items()
                    },
                }
                print(json.dumps(line), flush=True)
                results["runs"].append(line)
                results["measured"] = time.strftime("%Y-%m-%d")
                out_path.write_text(json.dumps(results, indent=1))
        del ht
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
