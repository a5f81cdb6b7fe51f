"""Engine concurrency microbenchmark — counterpart of the reference's
`performance_test_search_engine` (reference search_engine.py:818-933):
sequential vs ThreadPoolExecutor-concurrent query throughput against a
SearchEngine, plus the batched-path numbers the reference cannot produce.
"""

from __future__ import annotations

import concurrent.futures
import time

import numpy as np


def performance_test_search_engine(
    engine,
    query_vectors: np.ndarray,
    *,
    k: int = 5,
    n_threads: int = 8,
) -> dict:
    nq = len(query_vectors)

    # sequential one-at-a-time (the reference's only mode)
    t0 = time.perf_counter()
    for qv in query_vectors:
        engine.search_batch(qv[None, :], k=k)
    seq_s = time.perf_counter() - t0

    # thread-concurrent one-at-a-time
    t0 = time.perf_counter()
    with concurrent.futures.ThreadPoolExecutor(max_workers=n_threads) as ex:
        list(ex.map(lambda qv: engine.search_batch(qv[None, :], k=k), query_vectors))
    conc_s = time.perf_counter() - t0

    # device-batched (TPU-native mode)
    t0 = time.perf_counter()
    engine.search_batch(query_vectors, k=k)
    batch_s = time.perf_counter() - t0

    return {
        "n_queries": nq,
        "sequential_qps": nq / seq_s,
        "concurrent_qps": nq / conc_s,
        "batched_qps": nq / batch_s,
        "n_threads": n_threads,
        "batch_speedup_vs_sequential": seq_s / batch_s,
    }
