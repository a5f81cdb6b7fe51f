"""Host-offload index tier — the TPU-native analog of the reference's
disk-resident index (mmap + beam search over on-disk records,
reference vamana_graph.py:719-760 + io/diskann_persist.py:209-235).

Memory layout (BASELINE.json config 4, "DEEP10M disk-style split"):
  - HBM: adjacency int32[N, R] + PQ codes uint8[N, m] (+ codebooks) —
    everything graph traversal needs;
  - host RAM / disk: full-precision float32 vectors in the packed record
    file, served by the native batched reader (diskrag_tpu.native);
  - query flow: ADC-guided traversal on device -> candidate pool
    (beam ∪ visited) -> batched host gather of full vectors -> exact
    rerank on device.

The host fetch is the only host<->device traffic per batch:
pool_size * D * 4 bytes per query, overlappable with the next batch's
traversal (double-buffering at the serving layer).
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.graph.search import SearchResult, _gathered_distance, beam_search_pq
from diskrag_tpu.native import RecordReader
from diskrag_tpu.ops.topk import INVALID_ID, mask_duplicates
from diskrag_tpu.pq.product_quantizer import ProductQuantizer

logger = logging.getLogger(__name__)


@dataclasses.dataclass
class HostTierIndex:
    """Graph + codes on device, vectors on host."""

    adjacency: jax.Array      # [N, R] HBM
    medoid: jax.Array
    codes: jax.Array          # [N, m] uint8 HBM
    pq: ProductQuantizer
    reader: RecordReader      # host-side full vectors
    metric: str = "l2"
    entry_points: jax.Array | None = None  # [S] extra search seeds

    @classmethod
    def from_store(cls, index_dir, cache_capacity: int = 4096) -> "HostTierIndex":
        """Open from a persisted index directory containing the packed
        record file (index.dat) + PQ artifacts."""
        from diskrag_tpu.index.persist import IndexStore
        import json

        store = IndexStore(index_dir)
        meta = json.loads(store.meta_path.read_text())
        if not store.compat_path.exists():
            raise FileNotFoundError(
                f"host-tier mode needs the packed record file {store.compat_path} "
                "(save with write_compat=True)"
            )
        # adjacency + PQ from the store; vectors stay on disk/host
        adjacency = jnp.asarray(np.load(store.adjacency_path))
        with np.load(store.pq_model_path) as z:
            pq = ProductQuantizer.from_arrays(dict(z))
        codes = jnp.asarray(np.load(store.pq_codes_path))
        reader = RecordReader(
            store.compat_path, meta["num_points"], meta["dimension"],
            meta["R"], cache_capacity=cache_capacity,
        )
        eps = meta.get("entry_points")
        return cls(
            adjacency=adjacency,
            medoid=jnp.asarray(meta["medoid_idx"], jnp.int32),
            codes=codes, pq=pq, reader=reader,
            metric=meta.get("distance_metric", "l2"),
            entry_points=(
                None if eps is None else jnp.asarray(eps, jnp.int32)
            ),
        )

    def search(
        self,
        queries: np.ndarray,
        *,
        search_width: int,
        k: int,
        expand_width: int = 4,
        rerank_pool: int | None = None,
        n_threads: int = 8,
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """ADC traversal on device + host-fetched exact rerank.

        Returns (dists [B, k] squared, ids [B, k], stats).
        """
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        b = q.shape[0]
        tables = self.pq.compute_distance_tables(q)
        res: SearchResult = beam_search_pq(
            self.codes, tables, self.adjacency, self.medoid,
            search_width=search_width, k=search_width, rerank=False,
            expand_width=expand_width, entry_points=self.entry_points,
        )
        # candidate pool: beam ∪ visited log
        pool = np.concatenate(
            [np.asarray(res.ids), np.asarray(res.visited_ids)], axis=1
        )  # [B, P]
        p = pool.shape[1]
        if rerank_pool is not None and p > rerank_pool:
            pool = pool[:, :rerank_pool]
            p = rerank_pool
        flat = pool.reshape(-1).astype(np.int64)
        vecs = self.reader.get_vectors(flat, n_threads=n_threads)
        vecs = vecs.reshape(b, p, -1)

        pool_j = jnp.asarray(pool)
        exact = _gathered_distance(q, jnp.asarray(vecs), self.metric)
        exact = mask_duplicates(
            pool_j, jnp.where(pool_j == INVALID_ID, jnp.inf, exact)
        )
        top_d, take = jax.lax.top_k(-exact, k)
        ids = np.asarray(jnp.take_along_axis(pool_j, take, axis=1))
        dists = np.asarray(-top_d)
        stats = {
            "search_type": "host_tier",
            "nodes_visited": int(np.sum(np.asarray(res.n_expanded))),
            "host_vectors_fetched": int(len(flat)),
            "cache": self.reader.cache_stats(),
        }
        return dists, ids, stats
