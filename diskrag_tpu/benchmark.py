"""Benchmark harness — the reference protocol (dataset_benchmark.py):
recall@10 + mean latency + QPS swept over search L, plus build timing.

Dataset: seeded synthetic clustered vectors by default (SIFT-like scale
and dimensionality), since no public dataset ships in this environment.
The generator is deterministic so results are comparable across rounds.
"""

from __future__ import annotations

import dataclasses
import time

import numpy as np

try:
    import jax
    import jax.numpy as jnp
except ImportError:  # pragma: no cover
    jax = None


def make_dataset(
    n: int, dim: int, n_queries: int, seed: int = 42, n_clusters: int | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Seeded clustered dataset + queries (perturbed database points)."""
    rng = np.random.default_rng(seed)
    if n_clusters is None:
        n_clusters = max(16, n // 1000)
    centers = rng.normal(size=(n_clusters, dim)).astype(np.float32) * 4.0
    assign = rng.integers(0, n_clusters, size=n)
    pts = centers[assign] + rng.normal(size=(n, dim)).astype(np.float32)
    qi = rng.integers(0, n, size=n_queries)
    queries = pts[qi] + rng.normal(size=(n_queries, dim)).astype(np.float32) * 0.3
    return pts, queries


def recall_at_k(got_ids: np.ndarray, gt_ids: np.ndarray, k: int) -> float:
    return float(
        np.mean(
            [
                len(set(got_ids[i, :k].tolist()) & set(gt_ids[i, :k].tolist())) / k
                for i in range(len(got_ids))
            ]
        )
    )


@dataclasses.dataclass
class SweepPoint:
    search_width: int
    recall: float
    qps: float
    mean_latency_ms: float
    mode: str
    expand_width: int = 1


def ground_truth(points: np.ndarray, queries: np.ndarray, k: int) -> np.ndarray:
    from diskrag_tpu.ops import brute_force_topk

    # chunk queries to bound the [B, N] distance matrix
    out = []
    step = max(1, min(len(queries), 256))
    for i in range(0, len(queries), step):
        _, ids = brute_force_topk(
            jnp.asarray(queries[i : i + step]), jnp.asarray(points), k=k
        )
        out.append(np.asarray(ids))
    return np.concatenate(out)


def sweep_exact(
    index, queries: np.ndarray, gt: np.ndarray, *, k: int,
    widths=(32, 48, 64, 96, 128), expand_widths=(1,), repeats: int = 3,
) -> list[SweepPoint]:
    """In-memory exact-distance search sweep (reference
    dataset_benchmark.py:104-130 protocol), optionally over beam
    expansion widths."""
    from diskrag_tpu.graph import beam_search

    q = jnp.asarray(queries)
    points = []
    for w in widths:
        for e in expand_widths:
            def run():
                return beam_search(
                    index.vectors, index.adjacency, index.medoid, q,
                    search_width=w, k=k, metric=index.metric, expand_width=e,
                )

            res = run()
            res.ids.block_until_ready()  # compile warmup
            t0 = time.perf_counter()
            for _ in range(repeats):
                res = run()
                res.ids.block_until_ready()
            dt = (time.perf_counter() - t0) / repeats
            rec = recall_at_k(np.asarray(res.ids), gt, k)
            points.append(
                SweepPoint(w, rec, len(queries) / dt,
                           dt / len(queries) * 1e3, "exact", e)
            )
    return points


def sweep_pq(
    index, pq, codes: np.ndarray, queries: np.ndarray, gt: np.ndarray, *,
    k: int, widths=(32, 48, 64, 96, 128), expand_widths=(1,),
    repeats: int = 3,
) -> list[SweepPoint]:
    """PQ-traversal + exact-rerank sweep (the PQ-accelerated mode,
    reference search_engine.py:398-506 protocol-equivalent)."""
    from diskrag_tpu.graph import beam_search_pq

    q = jnp.asarray(queries)
    codes_j = jnp.asarray(codes)
    points = []
    for w in widths:
        for e in expand_widths:
            def run():
                tables = pq.compute_distance_tables(q)
                return beam_search_pq(
                    codes_j, tables, index.adjacency, index.medoid,
                    search_width=w, k=k, rerank=True,
                    vectors=index.vectors, queries=q, metric=index.metric,
                    expand_width=e,
                )

            res = run()
            res.ids.block_until_ready()
            t0 = time.perf_counter()
            for _ in range(repeats):
                res = run()
                res.ids.block_until_ready()
            dt = (time.perf_counter() - t0) / repeats
            rec = recall_at_k(np.asarray(res.ids), gt, k)
            points.append(
                SweepPoint(w, rec, len(queries) / dt,
                           dt / len(queries) * 1e3, "pq+rerank", e)
            )
    return points


def best_qps_at_recall(
    points: list[SweepPoint], min_recall: float
) -> SweepPoint | None:
    ok = [p for p in points if p.recall >= min_recall]
    return max(ok, key=lambda p: p.qps) if ok else None
