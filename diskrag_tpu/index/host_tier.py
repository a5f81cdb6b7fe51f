"""Host-offload index tier — the TPU-native analog of the reference's
disk-resident index (mmap + beam search over on-disk records,
reference vamana_graph.py:719-760 + io/diskann_persist.py:209-235).

Memory layout (BASELINE.json config 4, "DEEP10M disk-style split"):
  - HBM: adjacency int32[N, R] + a compressed traversal representation —
    PQ codes uint8[N, m] (`mode="pq"`, 16-32x compression, quality
    depends on the data's quantizability), IntQuantizer int8 rows
    (`mode="iq"`, ~4x compression, near-exact ordering at ~10x the ADC
    round throughput — pq/intq.py), or bfloat16 vectors (`mode="bf16"`,
    2x compression, near-exact ordering) — everything graph traversal
    needs;
  - host RAM / disk: full-precision float32 vectors in the packed record
    file, served by the native batched reader (diskrag_tpu.native);
  - query flow: compressed-guided traversal on device -> candidate pool
    (beam ∪ visited) ids to host (a few hundred KB) -> batched host
    gather of full vectors -> **exact rerank on the host** (numpy BLAS).

Reranking on the host is deliberate: the pool vectors already live
there, and rerank FLOPs are trivial (B * P * D); shipping the pool to
the device would move P*D*4 bytes per query across the host<->device
link for no compute benefit (on this environment's tunneled TPU that
link is ~3 MB/s and turned a 30k-QPS traversal into 43 QPS).
"""

from __future__ import annotations

import dataclasses
import logging

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.graph.search import SearchResult, beam_search, beam_search_pq
from diskrag_tpu.native import RecordReader
from diskrag_tpu.ops.topk import INVALID_ID
from diskrag_tpu.pq.product_quantizer import ProductQuantizer

logger = logging.getLogger(__name__)


def exact_rerank_pool(
    queries: np.ndarray,
    pool: np.ndarray,
    reader: RecordReader,
    *,
    metric: str,
    k: int,
    n_threads: int = 8,
) -> tuple[np.ndarray, np.ndarray, int]:
    """Host-side exact rerank of candidate-pool ids.

    queries [B, D] f32, pool [B, P] int global ids (-1 = invalid) ->
    (dists [B, k] squared/float64, ids [B, k] int64, n_unique_fetched).
    Dedups ids before the gather (hot nodes appear in many pools; sorted
    unique reads make the mmap access near-sequential), computes
    per-vector norms once on the unique set, uses batched BLAS GEMV for
    the cross term, and drops duplicate ids per row with an id-sorted
    first-occurrence mask.
    """
    b, p = pool.shape
    # -1 padding clips to row 0; its distance is masked to +inf below
    flat = np.maximum(pool.reshape(-1).astype(np.int64), 0)
    uniq, inverse = np.unique(flat, return_inverse=True)
    uvecs = reader.get_vectors(uniq, n_threads=n_threads)
    vecs = uvecs[inverse].reshape(b, p, -1)

    q_np = np.asarray(queries, np.float32)
    if metric == "cosine":
        qh = q_np / (np.linalg.norm(q_np, axis=1, keepdims=True) + 1e-12)
        un = np.linalg.norm(uvecs, axis=1) + 1e-12
        cos = np.matmul(vecs, qh[:, :, None])[:, :, 0]
        exact = 1.0 - cos / un[inverse].reshape(b, p)
    elif metric == "dot":
        exact = -np.matmul(vecs, q_np[:, :, None])[:, :, 0]
    else:
        qn = np.sum(q_np * q_np, axis=1, keepdims=True)
        un = np.sum(uvecs * uvecs, axis=1)
        cross = np.matmul(vecs, q_np[:, :, None])[:, :, 0]
        exact = np.maximum(qn + un[inverse].reshape(b, p) - 2.0 * cross, 0.0)
    exact = np.where(pool == INVALID_ID, np.inf, exact)
    # drop duplicate ids per row (first occurrence in id-sorted order
    # keeps its distance, repeats are masked)
    id_order = np.argsort(pool, axis=1, kind="stable")
    pool_by_id = np.take_along_axis(pool, id_order, axis=1)
    dup = np.zeros_like(pool_by_id, bool)
    dup[:, 1:] = pool_by_id[:, 1:] == pool_by_id[:, :-1]
    dup_mask = np.zeros_like(dup)
    np.put_along_axis(dup_mask, id_order, dup, axis=1)
    exact = np.where(dup_mask, np.inf, exact)

    if p < k:  # keep the [B, k] output contract
        pad = k - p
        pool = np.pad(pool, ((0, 0), (0, pad)), constant_values=INVALID_ID)
        exact = np.pad(exact, ((0, 0), (0, pad)), constant_values=np.inf)
    order = np.argsort(exact, axis=1, kind="stable")[:, :k]
    ids = np.take_along_axis(pool, order, axis=1).astype(np.int64)
    dists = np.take_along_axis(exact, order, axis=1).astype(np.float64)
    invalid = ~np.isfinite(dists)
    ids[invalid] = INVALID_ID
    dists[invalid] = np.inf
    return dists, ids, int(len(uniq))


@dataclasses.dataclass
class HostTierIndex:
    """Graph + compressed traversal data on device, f32 vectors on host."""

    adjacency: jax.Array      # [N, R] HBM
    medoid: jax.Array
    reader: RecordReader      # host-side full vectors
    mode: str = "pq"          # "pq" | "iq" | "bf16"
    codes: jax.Array | None = None  # [N, m] uint8 (pq) / [N, rw] int8 (iq)
    pq: ProductQuantizer | None = None
    vectors_bf16: jax.Array | None = None   # [N, D] bf16 HBM (bf16 mode)
    metric: str = "l2"
    entry_points: jax.Array | None = None   # [S] extra search seeds
    # residual-PQ serving aux (pq/residual.py): +8 bytes/point in HBM
    pq_cells: jax.Array | None = None       # int32 [N]
    pq_bias: jax.Array | None = None        # f32 [N]

    @classmethod
    def from_store(
        cls, index_dir, cache_capacity: int = 65_536,
        mode: str | None = None, gather_pad: bool = True,
    ) -> "HostTierIndex":
        """Open from a persisted index directory containing the packed
        record file (index.dat). mode None auto-picks: "iq" for
        IntQuantizer artifacts, "pq" for plain/residual ADC codes,
        else "bf16". bf16 mode streams vectors.npy to HBM
        chunk-wise as bfloat16 (half the f32 footprint; the f32 master
        stays host-side, read through the record file for rerank)."""
        from diskrag_tpu.index.persist import IndexStore
        import json

        store = IndexStore(index_dir)
        meta = json.loads(store.meta_path.read_text())
        if not store.compat_path.exists():
            raise FileNotFoundError(
                f"host-tier mode needs the packed record file {store.compat_path} "
                "(save with write_compat=True)"
            )
        metric = meta.get("distance_metric", "l2")
        pq_kind = meta.get("pq_kind", "plain")
        if mode is None:
            # ADC/iq scores rank by squared L2 only (PERFORMANCE.md
            # "Angular"); never auto-pick a traversal that ranks by the
            # wrong metric. Int rows get the iq traversal (one row gather
            # + matmul per candidate — ~10x the ADC round throughput at
            # ~4x the bytes of m=32 codes), plain/residual codes the ADC
            # one; no compressed artifacts (or a non-L2 metric) = bf16.
            if store.pq_model_path.exists() and metric == "l2":
                mode = "iq" if pq_kind.startswith("int") else "pq"
            else:
                mode = "bf16"
        if mode in ("pq", "iq") and metric != "l2":
            raise ValueError(
                f"host-tier {mode} traversal is L2-only (quantized scores "
                f"rank by squared L2); this index uses metric={metric!r} — "
                "serve it in bf16 mode, or normalize the vectors and build "
                "with metric='l2' for angular data"
            )
        if mode == "pq" and pq_kind.startswith("int"):
            raise ValueError(
                f"host-tier pq traversal cannot score pq_kind={pq_kind!r} "
                "(IntQuantizer rows) — use mode='iq' (or None for auto)"
            )
        if mode == "iq" and not pq_kind.startswith("int"):
            raise ValueError(
                f"host-tier iq traversal needs IntQuantizer artifacts; "
                f"this index has pq_kind={pq_kind!r} — use mode='pq'"
            )
        adjacency = jnp.asarray(np.load(store.adjacency_path))
        reader = RecordReader(
            store.compat_path, meta["num_points"], meta["dimension"],
            meta["R"], cache_capacity=cache_capacity,
        )
        pq = None
        codes = None
        vec_bf16 = None
        pq_cells = None
        pq_bias = None
        if mode in ("pq", "iq"):
            from diskrag_tpu.pq.residual import ResidualPQ, pq_from_arrays

            with np.load(store.pq_model_path) as z:
                pq = pq_from_arrays(dict(z))
            codes_np = np.load(store.pq_codes_path)
            if mode == "iq" and gather_pad:
                # round-latency lever: >=256 B rows gather ~3x faster
                # on this chip (pq/intq.py pad_rows_for_gather); the
                # trailing zero lanes are ignored by the scorer
                from diskrag_tpu.pq.intq import pad_rows_for_gather

                codes_np = pad_rows_for_gather(codes_np)
            codes = jnp.asarray(codes_np)
            if isinstance(pq, ResidualPQ):
                from diskrag_tpu.index.persist import load_pq_aux

                cells, bias = load_pq_aux(
                    store, expect_n=int(codes.shape[0])
                )
                if cells is None:
                    raise FileNotFoundError(
                        f"residual-PQ host tier needs {store.pq_aux_path} "
                        "(written by save_pq_artifacts; rebuild the index)"
                    )
                pq_cells = jnp.asarray(cells, jnp.int32)
                pq_bias = jnp.asarray(bias, jnp.float32)
        elif mode == "bf16":
            # mmap the f32 master and down-convert ON THE HOST, then ship
            # one bf16 buffer: peak device memory is exactly N*D*2. (A
            # device-side concatenate of converted chunks would hold all
            # chunks plus the output simultaneously — N*D*4 peak, i.e. the
            # full f32 footprint this tier exists to avoid.)
            import ml_dtypes

            if not store.vectors_path.exists():
                # bf16 mode reads the f32 master from vectors.npy (the
                # record file holds the same vectors but interleaved with
                # neighbor ids — a strided copy of the whole set); fail
                # with the actual requirement instead of a bare np.load
                # error deep below
                raise FileNotFoundError(
                    f"host-tier bf16 mode needs {store.vectors_path} "
                    "alongside the record file (standard save_index "
                    "output); pq mode serves record-file-only layouts"
                )
            vecs = np.load(store.vectors_path, mmap_mode="r")
            host_bf16 = np.empty(vecs.shape, dtype=ml_dtypes.bfloat16)
            step = 262_144
            for i in range(0, vecs.shape[0], step):
                host_bf16[i : i + step] = vecs[i : i + step]
            vec_bf16 = jnp.asarray(host_bf16)
            del host_bf16
        else:
            raise ValueError(f"unknown host-tier mode: {mode}")
        eps = meta.get("entry_points")
        return cls(
            adjacency=adjacency,
            medoid=jnp.asarray(meta["medoid_idx"], jnp.int32),
            reader=reader, mode=mode, codes=codes, pq=pq,
            pq_cells=pq_cells, pq_bias=pq_bias,
            vectors_bf16=vec_bf16,
            metric=metric,
            entry_points=(
                None if eps is None else jnp.asarray(eps, jnp.int32)
            ),
        )

    def _dispatch_traversal(
        self, q: jax.Array, *, search_width: int, expand_width: int
    ) -> tuple[jax.Array, jax.Array]:
        """Dispatch one traversal chunk; returns device arrays only.

        (pool [B, P] = beam ∪ visited concatenated ON DEVICE so the host
        needs exactly one fetch per chunk — every fetch on the tunneled
        TPU costs a fixed ~30-40 ms RPC — and n_expanded summed to a
        device scalar.)  Dispatch is async: nothing here blocks on the
        device, which is what makes the pipelined path overlap.
        """
        if self.mode == "iq":
            from diskrag_tpu.graph.search import beam_search_iq

            # int8 rows in HBM (D + cid/bias lanes per point): traversal
            # scores one gathered row per candidate on the MXU, exact
            # rerank still happens host-side downstream
            res: SearchResult = beam_search_iq(
                self.codes, self.pq.query_tables(q), self.adjacency,
                self.medoid, dim=self.pq.dim, bits=self.pq.bits,
                n_cells=self.pq.n_cells, search_width=search_width,
                k=search_width, rerank=False, expand_width=expand_width,
                entry_points=self.entry_points,
            )
        elif self.mode == "pq":
            if self.pq_cells is not None:  # residual PQ (pq/residual.py)
                tables = self.pq.inner_tables(q)
                aux = {
                    "point_cell": self.pq_cells,
                    "point_bias": self.pq_bias,
                    "cell_tables": self.pq.cell_tables(q),
                }
            else:
                tables = self.pq.compute_distance_tables(q)
                aux = {}
            res = beam_search_pq(
                self.codes, tables, self.adjacency, self.medoid,
                search_width=search_width, k=search_width, rerank=False,
                expand_width=expand_width, entry_points=self.entry_points,
                **aux,
            )
        else:
            res = beam_search(
                self.vectors_bf16, self.adjacency, self.medoid, q,
                search_width=search_width, k=search_width,
                metric=self.metric, expand_width=expand_width,
                entry_points=self.entry_points,
            )
        pool = jnp.concatenate([res.ids, res.visited_ids], axis=1)
        return pool, jnp.sum(res.n_expanded)

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
        """Compressed traversal on device + host-side exact rerank.

        Returns (dists [B, k] squared, ids [B, k], stats).
        """
        import time

        t0 = time.perf_counter()
        # normalize on the host FIRST: the host copy feeds the rerank, so
        # np.asarray of an uploaded device array would be a pure ~30-40 ms
        # RPC round-trip on this tunnel (CLAUDE.md)
        q_np = np.asarray(queries, np.float32)
        if q_np.ndim == 1:
            q_np = q_np[None, :]
        q = jnp.asarray(q_np)
        pool_dev, n_exp = self._dispatch_traversal(
            q, search_width=search_width, expand_width=expand_width
        )
        if rerank_pool is not None and pool_dev.shape[1] > rerank_pool:
            # truncate device-side: the pool fetch below is link-bound
            pool_dev = pool_dev[:, :rerank_pool]
        # ids only cross the link; the np.asarray fetch is also the
        # traversal completion barrier (in-order execution). The
        # n_expanded scalar rides along as one extra column so the call
        # pays exactly ONE ~30-40 ms RPC, not two.
        carrier = jnp.concatenate(
            [
                pool_dev,
                jnp.broadcast_to(
                    n_exp.astype(pool_dev.dtype)[None, None],
                    (pool_dev.shape[0], 1),
                ),
            ],
            axis=1,
        )
        buf = np.asarray(carrier)  # [B, P+1]
        pool, n_exp_host = buf[:, :-1], int(buf[0, -1])
        t1 = time.perf_counter()
        dists, ids, n_uniq = exact_rerank_pool(
            q_np, pool, self.reader, metric=self.metric, k=k,
            n_threads=n_threads,
        )
        t2 = time.perf_counter()
        stats = {
            "search_type": "host_tier",
            "mode": self.mode,
            "nodes_visited": n_exp_host,
            "host_vectors_fetched": n_uniq,
            "cache": self.reader.cache_stats(),
            "stage_ms": {
                "traverse_and_fetch": (t1 - t0) * 1e3,
                "gather_rerank_select": (t2 - t1) * 1e3,
            },
        }
        return dists, ids, stats

    def search_pipelined(
        self,
        queries: np.ndarray,
        *,
        search_width: int,
        k: int,
        chunk: int = 256,
        expand_width: int = 4,
        rerank_pool: int | None = None,
        n_threads: int = 8,
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Two-stage software pipeline over query chunks: the device
        traverses chunk i+1 while the host gathers + reranks chunk i.

        The two stages are close to balanced at 1-10M scale (traversal
        ~55%, host rerank ~45% of the batch), so overlapping them is
        worth up to ~1.8x QPS over `search()` on large batches. Relies
        on two platform facts: dispatch is async (the jitted traversal
        call returns before the device finishes) and execution is
        in-order (fetching chunk i's pool blocks on chunk i only, never
        on the already-queued chunk i+1).

        The last chunk is padded to the chunk size so every dispatch
        reuses one compiled shape. No counterpart in the reference (its
        search loop is single-query sequential Python,
        search_engine.py:429); this is TPU-native batching design.
        """
        import time

        q_np = np.asarray(queries, np.float32)
        if q_np.ndim == 1:
            q_np = q_np[None, :]
        b = q_np.shape[0]
        if b <= chunk:
            return self.search(
                q_np, search_width=search_width, k=k,
                expand_width=expand_width, rerank_pool=rerank_pool,
                n_threads=n_threads,
            )
        n_chunks = -(-b // chunk)
        padded = n_chunks * chunk
        if padded != b:
            q_np = np.concatenate(
                [q_np, np.broadcast_to(q_np[:1], (padded - b, q_np.shape[1]))]
            )

        t_wait = 0.0
        t_rerank = 0.0
        n_uniq_total = 0
        out_d = np.empty((padded, k), np.float64)
        out_i = np.empty((padded, k), np.int64)
        n_exp_parts = []

        t0 = time.perf_counter()
        pending = None  # (start_row, device pool)
        for c in range(n_chunks + 1):
            if c < n_chunks:
                s = c * chunk
                q_dev = jnp.asarray(q_np[s : s + chunk])
                pool_dev, n_exp = self._dispatch_traversal(
                    q_dev, search_width=search_width,
                    expand_width=expand_width,
                )
                if (
                    rerank_pool is not None
                    and pool_dev.shape[1] > rerank_pool
                ):
                    # truncate device-side: the per-chunk fetch is
                    # link-bound, so ship only the reranked prefix
                    pool_dev = pool_dev[:, :rerank_pool]
                n_exp_parts.append(n_exp)
                nxt = (s, pool_dev)
            else:
                nxt = None
            if pending is not None:
                s_prev, pool_dev_prev = pending
                tw = time.perf_counter()
                pool = np.asarray(pool_dev_prev)  # blocks on chunk c-1 only
                t_wait += time.perf_counter() - tw
                tr = time.perf_counter()
                dists, ids, n_uniq = exact_rerank_pool(
                    q_np[s_prev : s_prev + chunk], pool, self.reader,
                    metric=self.metric, k=k, n_threads=n_threads,
                )
                t_rerank += time.perf_counter() - tr
                out_d[s_prev : s_prev + chunk] = dists
                out_i[s_prev : s_prev + chunk] = ids
                n_uniq_total += n_uniq
            pending = nxt
        n_expanded = int(np.asarray(jnp.stack(n_exp_parts).sum()))
        stats = {
            "search_type": "host_tier",
            "mode": self.mode,
            "pipelined_chunks": n_chunks,
            "nodes_visited": n_expanded,
            "host_vectors_fetched": n_uniq_total,
            "cache": self.reader.cache_stats(),
            "stage_ms": {
                "traverse_wait": t_wait * 1e3,
                "gather_rerank_select": t_rerank * 1e3,
                "wall": (time.perf_counter() - t0) * 1e3,
            },
        }
        return out_d[:b], out_i[:b], stats
