"""Search engine — counterpart of the reference's `search_engine.py`
(SearchEngineCorrect): loads the index artifact set for a collection,
runs a startup diagnostic self-check, serves `search` / `faq_search` with
timing + cumulative statistics, and degrades gracefully to brute-force
when the index or PQ artifacts are missing.

TPU-native differences (design, not behavior):
  - queries are searched in device batches (`search_batch`); the
    single-query `search()` wraps a batch of 1 (the reference is strictly
    one-at-a-time, search_engine.py:431);
  - the PQ mode is ADC-guided traversal + exact rerank of beam∪visited
    (replacing the per-node probabilistic exact/PQ policy,
    search_engine.py:381-397 — documented deviation);
  - the full-precision vectors live in HBM next to the codes; the
    host/disk tier is handled by the storage layer, not mmap-per-node.
"""

from __future__ import annotations

import contextlib
import logging
import os
import threading
import time
from typing import Any, Callable, Optional

import numpy as np

import jax.numpy as jnp

from diskrag_tpu.data.collection import CollectionManager
from diskrag_tpu.graph.search import beam_search, beam_search_pq
from diskrag_tpu.index.persist import load_index

logger = logging.getLogger(__name__)


class ServingConfigError(RuntimeError):
    """Topology/configuration error at engine bring-up (e.g. device count
    not divisible by the shard count). Deliberately NOT a ValueError:
    the artifact-loading path degrades ValueError/FileNotFoundError to
    brute-force serving (reference search_engine.py:49-72), but a config
    error must surface to the operator instead."""


_PACK_FN = None


def _get_pack_fn():
    global _PACK_FN
    if _PACK_FN is None:
        import jax

        @jax.jit
        def pack(dists, ids, n_expanded):
            b = ids.shape[0]
            total = jnp.sum(n_expanded).astype(jnp.int32)
            return jnp.concatenate(
                [
                    ids.astype(jnp.int32),
                    jax.lax.bitcast_convert_type(
                        dists.astype(jnp.float32), jnp.int32
                    ),
                    jnp.broadcast_to(total[None, None], (b, 1)),
                ],
                axis=1,
            )

        _PACK_FN = pack
    return _PACK_FN


def _fetch_packed(dists, ids, n_expanded):
    """Fetch (dists, ids, total_expanded) from the device in ONE host
    transfer: ids (int32), the f32 dists bitcast to int32, and the
    summed expansion counter ride a single [B, 2k+1] int32 array. Every
    host fetch on the tunneled TPU costs a fixed ~30-40 ms RPC
    (CLAUDE.md), so three separate np.asarray calls would triple the
    per-request latency floor."""
    k = ids.shape[1]
    return _decode_packed(np.asarray(_enqueue_packed(dists, ids, n_expanded)), k)


def _enqueue_packed(dists, ids, n_expanded):
    """Enqueue the pack program WITHOUT draining: returns the device
    [B, 2k+1] buffer. Split from _fetch_packed so search_pipelined can
    enqueue every batch's pack at dispatch time (main thread) and leave
    worker threads nothing but the blocking np.asarray — jit dispatch
    from workers contends on the GIL with the main loop's dispatches."""
    return _get_pack_fn()(dists, ids, n_expanded)


def _decode_packed(buf: np.ndarray, k: int):
    ids_np = buf[:, :k]
    dists_np = (
        np.ascontiguousarray(buf[:, k : 2 * k]).view(np.float32)
        .astype(np.float64)
    )
    return dists_np, ids_np, int(buf[0, -1])


class SearchEngine:
    """Per-collection search engine."""

    def __init__(
        self,
        collection_name: str,
        base_dir: str = "collections",
        use_lock: bool = True,
        run_diagnostics: bool = True,
        serving_mode: str = "auto",
    ):
        """`serving_mode`: "auto" serves the index fully from HBM;
        "host_tier" keeps only the graph + compressed traversal data in
        HBM and reranks against host-resident f32 vectors (the
        counterpart of the reference's disk-resident serving path,
        search_engine.py:25-78 + MMapNodeReader — requires the packed
        record file, i.e. an index saved with write_compat);
        "sharded_flat" serves a sharded index as an exhaustive bf16 MXU
        scan per shard merged over ICI — exact result ids, distances at
        bf16 precision (no reference counterpart); "streaming" wraps a
        full-HBM vamana index in the mutable tier (index/streaming.py) so
        the engine accepts live insert_texts/delete_ids between searches
        — the reference's insert_node/delete_node surface
        (vamana_graph.py:58-125) lifted to the serving API (it never
        exposed them through its engine)."""
        if serving_mode not in (
            "auto", "host_tier", "sharded_flat", "streaming"
        ):
            raise ValueError(f"unknown serving_mode: {serving_mode}")
        self.serving_mode = serving_mode
        # host-tier batches larger than this are pipelined (device
        # traversal of chunk i+1 overlaps host rerank of chunk i)
        self.host_tier_pipeline_chunk = 256
        self.collection_name = collection_name
        self.manager = CollectionManager(base_dir)
        info = self.manager.get_collection_info(collection_name)
        if info is None:
            raise ValueError(f"collection {collection_name} not found")
        self.info = info

        self._lock = threading.Lock() if use_lock else None
        self._stats: dict[str, float] = {
            "total_searches": 0,
            "total_exact_computations": 0,
            "total_pq_computations": 0,
            "total_nodes_visited": 0,
            "total_search_time": 0.0,
        }

        self.index = None
        self.pq = None
        self.codes = None
        self.codes_j = None
        self.pq_cells_j = None  # residual-PQ aux (pq/residual.py)
        self.pq_bias_j = None
        self.meta: dict = {}
        self.use_pq = False
        self.brute_force_mode = False
        self.streaming = None
        self._load_artifacts()
        if serving_mode == "streaming":
            self._init_streaming()
        self.diagnostics: Optional[dict] = None
        if run_diagnostics:
            try:
                self.diagnostics = self._run_diagnostic_check()
            except Exception as e:  # noqa: BLE001 — diagnostic is non-fatal
                logger.warning("startup diagnostic failed (non-fatal): %s", e)

    # --- bring-up --------------------------------------------------------
    def _load_artifacts(self) -> None:
        import json

        index_dir = self.manager.get_index_dir(self.collection_name)
        self.index_type = "vamana"
        self.recommended_l = 0
        metric_hint = "l2"
        meta_path = index_dir / "meta.json"
        if meta_path.exists():
            try:
                peek = json.loads(meta_path.read_text())
                self.index_type = peek.get("index_type", "vamana")
                metric_hint = peek.get("distance_metric", "l2")
            except ValueError:
                pass
        try:
            if self.serving_mode == "host_tier":
                if self.index_type == "sharded":
                    # sharded host tier (the 100M-scale configuration):
                    # per-shard bf16 traversal in HBM, pools all-gathered
                    # over ICI, one exact host rerank against the f32
                    # record file
                    import jax

                    from diskrag_tpu.native import RecordReader
                    from diskrag_tpu.parallel import (
                        load_sharded_index,
                        make_mesh,
                    )
                    from diskrag_tpu.parallel.host_tier import ShardedHostTier

                    from diskrag_tpu.index.persist import IndexStore

                    store = IndexStore(index_dir)
                    self.meta = json.loads(meta_path.read_text())
                    s = int(self.meta["n_shards"])
                    ndev = jax.device_count()
                    if ndev % s:
                        # configuration error, not a missing artifact —
                        # must surface, not degrade to brute force
                        raise ServingConfigError(
                            f"sharded index has {s} shards but {ndev} "
                            f"device(s) are visible — serving needs "
                            f"device_count % n_shards == 0"
                        )
                    if not store.compat_path.exists():
                        # configuration error (wrong build flags), not a
                        # missing-index condition: degrading to brute
                        # force would np.load the full f32 vector set the
                        # host tier exists to keep off the device
                        raise ServingConfigError(
                            f"host_tier serving needs the packed record "
                            f"file {store.compat_path} (build with "
                            f"write_compat)"
                        )
                    self.mesh = make_mesh(n_shards=s, n_data=ndev // s)
                    # pipelined chunks are batch-sharded over the data
                    # axis — round the chunk up to a multiple of it
                    n_data = ndev // s
                    self.host_tier_pipeline_chunk = (
                        -(-self.host_tier_pipeline_chunk // n_data) * n_data
                    )
                    # large pools: same reader cache sizing as the
                    # single-chip tier (HostTierIndex.from_store)
                    reader = RecordReader(
                        store.compat_path, int(self.meta["num_points"]),
                        int(self.meta["dimension"]),
                        int(self.meta.get("compat_R", 0)),
                        cache_capacity=65_536,
                    )
                    # pq traversal when PQ artifacts exist AND the metric
                    # is L2 (ADC tables are L2-only — same mode selection
                    # as HostTierIndex.from_store), else bf16
                    mode_kwargs: dict = {}
                    if store.pq_model_path.exists() and (
                        self.meta.get("distance_metric", "l2") == "l2"
                    ):
                        from diskrag_tpu.index.persist import load_pq_aux
                        from diskrag_tpu.pq.residual import pq_from_arrays

                        with np.load(store.pq_model_path) as z:
                            pq = pq_from_arrays(dict(z))
                        codes_arr = np.load(store.pq_codes_path)
                        if str(
                            self.meta.get("pq_kind", "plain")
                        ).startswith("int"):
                            # IntQuantizer int8 rows: MXU-scored iq
                            # traversal (same auto-pick as the
                            # single-chip tier, HostTierIndex.from_store)
                            mode_kwargs = {
                                "mode": "iq",
                                "pq": pq,
                                "codes": codes_arr,
                            }
                        else:
                            cells, bias = load_pq_aux(
                                store, expect_n=int(codes_arr.shape[0])
                            )
                            mode_kwargs = {
                                "mode": "pq",
                                "pq": pq,
                                "codes": codes_arr,
                                "pq_cells": cells,
                                "pq_bias": bias,
                            }
                    self.host_tier = ShardedHostTier.from_sharded_index(
                        load_sharded_index(index_dir / "sharded"),
                        reader, self.mesh, **mode_kwargs,
                    )
                    self.recommended_l = int(
                        self.meta.get("recommended_search_L", 64)
                    )
                    return
                from diskrag_tpu.index.host_tier import HostTierIndex

                if self.index_type != "vamana":
                    raise ServingConfigError(
                        f"host_tier serving needs a vamana or sharded "
                        f"index, got {self.index_type}"
                    )
                from diskrag_tpu.index.persist import IndexStore

                compat = IndexStore(index_dir).compat_path
                if not compat.exists():
                    # config error, not a missing index (see the sharded
                    # branch above) — never degrade host_tier to a
                    # full-HBM brute-force load
                    raise ServingConfigError(
                        f"host_tier serving needs the packed record file "
                        f"{compat} (build with write_compat)"
                    )
                self.host_tier = HostTierIndex.from_store(index_dir)
                self.meta = json.loads(meta_path.read_text())
                self.recommended_l = int(
                    self.meta.get("recommended_search_L", 64)
                )
                return
            if self.serving_mode == "sharded_flat":
                import jax

                from diskrag_tpu.parallel import load_sharded_index, make_mesh

                if self.index_type != "sharded":
                    raise ServingConfigError(
                        f"sharded_flat serving needs a sharded index, got "
                        f"{self.index_type}"
                    )
                self.meta = json.loads(meta_path.read_text())
                s = int(self.meta["n_shards"])
                ndev = jax.device_count()
                if ndev % s:
                    raise ServingConfigError(
                        f"sharded index has {s} shards but {ndev} device(s) "
                        f"are visible — serving needs device_count % "
                        f"n_shards == 0"
                    )
                self.mesh = make_mesh(n_shards=s, n_data=ndev // s)
                idx = load_sharded_index(index_dir / "sharded")
                from jax.sharding import NamedSharding, PartitionSpec as P

                import ml_dtypes

                v = np.asarray(idx.vectors)
                spec3 = NamedSharding(self.mesh, P("shard", None, None))
                spec2 = NamedSharding(self.mesh, P("shard", None))
                # bf16 scan copy + f32 norms; padding rows masked by their
                # -1 global id inside the scan
                self._sf_vectors = jax.device_put(
                    v.astype(ml_dtypes.bfloat16), spec3
                )
                # einsum streams from the mmap without a full f32 copy
                self._sf_norms = jax.device_put(
                    np.einsum("snd,snd->sn", v, v, dtype=np.float32), spec2
                )
                self._sf_gids = jax.device_put(
                    np.asarray(idx.global_ids), spec2
                )
                self._sf_metric = idx.metric
                self.recommended_l = int(
                    self.meta.get("recommended_search_L", 64)
                )
                return
            if self.index_type == "sharded":
                import jax

                from diskrag_tpu.parallel import load_sharded_index, make_mesh

                self.meta = json.loads(meta_path.read_text())
                s = int(self.meta["n_shards"])
                ndev = jax.device_count()
                if ndev % s:
                    raise ServingConfigError(
                        f"sharded index has {s} shards but {ndev} device(s) "
                        f"are visible — serving needs device_count % n_shards"
                        f" == 0 (one shard per device over the mesh)"
                    )
                self.mesh = make_mesh(n_shards=s, n_data=ndev // s)
                self.sharded = load_sharded_index(
                    index_dir / "sharded", mesh=self.mesh
                )
                self.recommended_l = int(
                    self.meta.get("recommended_search_L", 64)
                )
                return
            if self.index_type == "flat":
                from diskrag_tpu.ops.flat import FlatIndex

                self.meta = json.loads(meta_path.read_text())
                vecs = np.load(index_dir / "vectors.npy")
                self.flat = FlatIndex(
                    vecs, metric=self.meta.get("distance_metric", "l2"),
                    fused_precision=self.meta.get("flat_precision", "int8"),
                    rerank_width=self.meta.get("flat_rerank_width"),
                )
                return
            if self.index_type == "ivf":
                from diskrag_tpu.index.persist import load_ivf_index

                self.ivf, self.meta = load_ivf_index(index_dir)
                return
            self.index, self.pq, self.codes, self.meta = load_index(index_dir)
        except (FileNotFoundError, ValueError) as e:
            if self.serving_mode != "auto":
                # explicit host_tier/sharded_flat requests must never
                # degrade to a full-HBM brute-force load (that is the
                # exact footprint those modes exist to avoid) — surface
                # every missing/corrupt-artifact error as a config error
                raise ServingConfigError(
                    f"{self.serving_mode} serving could not load its "
                    f"artifacts: {e}"
                ) from e
            # graceful degradation to brute force over raw vectors
            # (reference search_engine.py:49-72) — served by the MXU flat
            # scan rather than an unchunked distance matrix
            logger.warning(
                "index not loadable (%s) — brute-force mode over vectors.npy", e
            )
            from diskrag_tpu.ops.flat import FlatIndex

            self.brute_force_mode = True
            vecs = np.load(self.manager.get_vectors_path(self.collection_name))
            # keep the collection's metric: an L2-default fallback on a
            # cosine collection would rank by the wrong distance (and the
            # sqrt-at-API-edge logic below keys on self.meta's metric)
            self._bf_flat = FlatIndex(vecs, metric=metric_hint)
            self.meta = {"distance_metric": metric_hint}
            return
        self.use_pq = self.pq is not None
        if self.use_pq:
            self.codes_j = jnp.asarray(self.codes)
            from diskrag_tpu.pq.residual import ResidualPQ

            if isinstance(self.pq, ResidualPQ):
                from diskrag_tpu.index.persist import IndexStore, load_pq_aux

                try:
                    cells, bias = load_pq_aux(
                        IndexStore(index_dir),
                        expect_n=int(self.codes.shape[0]),
                    )
                except ValueError as e:  # stale length — treat as torn
                    logger.warning("%s", e)
                    cells = None
                if cells is None:
                    # torn artifact set (model present, aux missing or
                    # stale): recompute from the HBM-resident vectors —
                    # cheap, and keeps the serving mode available
                    logger.warning(
                        "recomputing residual-PQ serving arrays from "
                        "the index vectors"
                    )
                    cells = self.pq.coarse_assign(self.index.vectors)
                    bias = self.pq.point_bias(self.codes_j, cells)
                self.pq_cells_j = jnp.asarray(cells, jnp.int32)
                self.pq_bias_j = jnp.asarray(bias, jnp.float32)
        self.recommended_l = int(self.meta.get("recommended_search_L", 64))

    def _pq_serving_tables(self, q) -> tuple:
        """(tables, beam_search_pq aux kwargs) for the active quantizer —
        inner tables + cell/bias operands for a ResidualPQ (its serving
        decomposition, pq/residual.py), plain ADC tables otherwise."""
        if self.pq_cells_j is not None:
            return self.pq.inner_tables(q), {
                "point_cell": self.pq_cells_j,
                "point_bias": self.pq_bias_j,
                "cell_tables": self.pq.cell_tables(q),
            }
        return self.pq.compute_distance_tables(q), {}

    def _diagnostic_sample(self, n_sample: int = 8):
        """Sample (vectors float32 [S, D], global ids int [S]) straight
        from whatever storage the active serving mode keeps — HBM arrays
        for the in-memory modes, the host record file for host_tier."""
        rng = np.random.default_rng(0)

        def pick(n):
            return np.sort(rng.choice(n, size=min(n_sample, n), replace=False))

        if self.brute_force_mode:
            ids = pick(self._bf_flat.n_points)
            return np.asarray(self._bf_flat.vectors[ids], np.float32), ids
        if self.serving_mode == "host_tier":
            ids = pick(int(self.meta["num_points"]))
            return self.host_tier.reader.get_vectors(ids), ids
        if self.serving_mode == "sharded_flat":
            gids = np.asarray(self._sf_gids[0])
            local = pick(int(np.sum(gids >= 0)))
            vecs = np.asarray(self._sf_vectors[0, local], np.float32)
            return vecs, gids[local]
        if self.index_type == "sharded":
            gids = np.asarray(self.sharded.global_ids[0])
            local = pick(int(np.sum(gids >= 0)))
            vecs = np.asarray(self.sharded.vectors[0, local], np.float32)
            return vecs, gids[local]
        if self.index_type == "flat":
            ids = pick(self.flat.n_points)
            return np.asarray(self.flat.vectors[ids], np.float32), ids
        if self.index_type == "ivf":
            ids = pick(self.ivf.n_points)
            return np.asarray(self.ivf.vectors[ids], np.float32), ids
        ids = pick(int(self.index.vectors.shape[0]))
        return np.asarray(self.index.vectors[ids], np.float32), ids

    # --- streaming serving mode (live insert/delete) ----------------------
    def _init_streaming(self) -> None:
        """Wrap the loaded full-HBM vamana index in the mutable tier.

        Row alignment invariant: graph row i serves collection
        vector_index i, and the streaming tier hands out external ids
        sequentially from N — so the collection row count must equal the
        index's, or live appends would be joined to the wrong texts
        (stale indexes must be rebuilt first)."""
        from diskrag_tpu.index.streaming import StreamingIndex

        if self.brute_force_mode or self.index is None:
            raise ServingConfigError(
                "streaming serving needs a loaded vamana index "
                f"(index_type={self.index_type!r}, "
                f"brute_force={self.brute_force_mode}) — build one with "
                "index type 'vamana' first"
            )
        n_index = int(self.index.adjacency.shape[0])
        n_coll = int(self.info.num_vectors)
        if n_coll < n_index:
            raise ServingConfigError(
                f"collection has {n_coll} vectors but the index covers "
                f"{n_index} — the collection is behind its index "
                "(corrupt or hand-edited); rebuild before serving"
            )
        # DISKRAG_STREAMING_RESERVE pre-pads the mutable tier for that
        # many upcoming inserts: a growth event mid-serving reallocates
        # the padded arrays AND recompiles every jitted shape (measured
        # dominant at 1M scale), so long-running services should declare
        # their expected ingest here
        reserve = int(os.environ.get("DISKRAG_STREAMING_RESERVE", "0"))
        self.streaming = StreamingIndex(self.index, reserve_inserts=reserve)
        if n_coll > n_index:
            # recovery: rows appended after the index was built (e.g.
            # live inserts from a previous session that were never
            # flushed, or a plain `process` without reindex) are adopted
            # into the buffer — they get external ids n_index.. in
            # order, restoring the row == vector_index alignment
            vecs = np.load(
                self.manager.get_vectors_path(self.collection_name),
                mmap_mode="r",
            )
            got = self.streaming.insert(
                np.asarray(vecs[n_index:n_coll], np.float32)
            )
            logger.info(
                "streaming: adopted %d collection rows past the index "
                "watermark (%d..%d)", len(got), n_index, n_coll - 1,
            )

    def insert_texts(
        self,
        texts: list[str],
        metadata_list: Optional[list[dict]] = None,
        embedding_fn: Optional[Callable] = None,
        vectors: Optional[np.ndarray] = None,
    ) -> np.ndarray:
        """Live-append texts: embed -> dedup-append to the collection ->
        insert into the serving tier. Returns the assigned vector ids
        (duplicate texts are skipped, matching update_collection
        semantics). Streaming mode only.

        The reference mutates its graph object directly under a lock
        (vamana_graph.py:58-114) and has no engine-level ingest; here the
        collection (texts/metadata/vectors.npy) and the serving tier
        move together so results keep joining to the right rows."""
        if self.streaming is None:
            raise ServingConfigError(
                "insert_texts requires serving_mode='streaming'"
            )
        if metadata_list is None:
            metadata_list = [{} for _ in texts]
        if vectors is None:
            if embedding_fn is None:
                raise ValueError("need embedding_fn or precomputed vectors")
            vectors = np.stack(
                [np.asarray(embedding_fn(t), np.float32) for t in texts]
            )
        vectors = np.asarray(vectors, np.float32)
        lock = self._lock if self._lock else threading.Lock()
        with lock:
            info, new_vecs, new_idx = self.manager.update_collection(
                self.collection_name, vectors, texts, metadata_list,
                return_rows=True,
            )
            self.info = info
            if len(new_vecs) == 0:
                return np.empty((0,), np.int32)
            got = self.streaming.insert(new_vecs)
            if list(np.asarray(got)) != list(np.asarray(new_idx)):
                # alignment is the correctness invariant — never serve on
                raise RuntimeError(
                    "streaming/collection id divergence: collection "
                    f"assigned {new_idx[:4]}..., serving tier {got[:4]}..."
                )
        return np.asarray(got)

    def delete_ids(self, external_ids) -> int:
        """Tombstone rows in the serving tier by vector id (either tier;
        idempotent — index/streaming.py). Collection rows remain until a
        rebuild: like the reference's tombstones (vamana_graph.py:116-125),
        deletion is a serving-visibility operation, not storage reclaim.
        Returns the count of NEWLY tombstoned ids (idempotent re-deletes
        excluded) so callers report what actually happened; unknown ids
        raise KeyError before any state mutates (streaming.delete)."""
        if self.streaming is None:
            raise ServingConfigError(
                "delete_ids requires serving_mode='streaming'"
            )
        lock = self._lock if self._lock else threading.Lock()
        with lock:
            return self.streaming.delete(external_ids)

    def flush_index(self) -> dict:
        """Fold any buffered inserts into the graph and persist the
        merged index over the collection's index artifacts, so a
        restarted engine (any serving mode) serves every inserted row.
        Returns {n_points, n_buffered_before}.

        Deletions are serving-session-local (delete_ids docstring): a
        flush with live tombstones refuses rather than silently
        resurrecting them on restart — consolidation would compact rows
        and break the row == vector_index alignment the collection join
        depends on; reprocess + rebuild to drop rows from storage."""
        if self.streaming is None:
            raise ServingConfigError(
                "flush_index requires serving_mode='streaming'"
            )
        from diskrag_tpu.graph.types import VamanaIndex
        from diskrag_tpu.index.persist import save_index

        lock = self._lock if self._lock else threading.Lock()
        with lock:
            if self.streaming._n_deleted:
                raise ServingConfigError(
                    "flush_index with live tombstones would resurrect "
                    "them on restart (deletions are serving-session-"
                    "local); rebuild the collection + index to persist "
                    "deletions"
                )
            if self.streaming.rows_compacted:
                # _n_deleted alone can't catch this: a rebuild-path merge
                # or consolidate drops tombstoned rows (returning
                # _n_deleted to 0) and shifts every later row, so graph
                # row i no longer equals collection vector_index i —
                # persisting would silently mis-join texts after restart
                # and re-adopt already-indexed rows under new ids.
                raise ServingConfigError(
                    "flush_index after rows were compacted (a merge or "
                    "consolidate dropped deleted rows) would persist an "
                    "index misaligned with the collection's vector_index;"
                    " rebuild the collection + index instead"
                )
            n_buf = self.streaming.n_buffered
            self.streaming.merge()
            n = self.streaming.n_graph
            idx = self.streaming.index
            exact = VamanaIndex(
                vectors=idx.vectors[:n], adjacency=idx.adjacency[:n],
                medoid=idx.medoid, metric=idx.metric,
                entry_points=idx.entry_points,
            )
            index_dir = self.manager.get_index_dir(self.collection_name)
            # save_index derives these from the index/PQ it is handed and
            # applies meta_extra LAST — carrying the stale values over
            # would override the fresh ones (e.g. a rebuild-path merge
            # moves the medoid/entry points; stale seeds degrade recall
            # silently on reload). Keep only genuinely extra keys such as
            # recommended_search_L / build stats.
            derived = {
                "num_points", "medoid_idx", "entry_points", "R",
                "dimension", "use_pq", "format_version", "index_type",
                "distance_metric", "n_subvectors", "pq_centroids",
                "pq_kind", "pq_n_coarse", "iq_row_width", "iq_n_cells",
            }
            meta_extra = {
                k: v for k, v in self.meta.items() if k not in derived
            }
            pq_kwargs = {}
            if self.use_pq and self.pq is not None:
                # re-encode so the persisted codes cover the merged rows
                # (stale shorter codes would desync every quantized
                # serving path on reload)
                from diskrag_tpu.pq.residual import ResidualPQ

                if isinstance(self.pq, ResidualPQ):
                    codes, cids = self.pq.encode(exact.vectors)
                    pq_kwargs = {
                        "pq": self.pq,
                        "pq_codes": np.asarray(codes),
                        "pq_coarse_ids": np.asarray(cids),
                    }
                else:
                    pq_kwargs = {
                        "pq": self.pq,
                        "pq_codes": np.asarray(self.pq.encode(exact.vectors)),
                    }
            save_index(index_dir, exact, meta_extra=meta_extra, **pq_kwargs)
        return {"n_points": n, "n_buffered_before": n_buf}

    def _run_diagnostic_check(self) -> dict:
        """Startup self-check for EVERY serving mode (the reference always
        self-checks at engine bring-up, search_engine.py:142-253; round 1
        only covered the full-HBM vamana mode):
          - vector stats sanity on a small storage sample;
          - self-retrieval smoke probe: the sampled vectors are searched
            as queries and must return their own ids in the top-10
            (>= 0.8 hit rate — a recall-style gate on the live path);
          - the PQ-enabled vamana mode additionally checks exact-vs-ADC
            distance correlation >= 0.5 AND the per-node ADC/exact ratio
            sanity band [0.1, 10] (reference search_engine.py:214-227;
            our pass gate is >= 90% of sampled pairs in band).
        Also checks the dimension whitelist (reference
        search_engine.py:81) — as a warning, not a hard failure: the
        index math is dimension-agnostic here, the whitelist only
        reflects known embedding-model sizes (documented deviation)."""
        from diskrag_tpu.data.config import validate_vector_dimension

        sample_vecs, sample_gids = self._diagnostic_sample()
        dim = int(sample_vecs.shape[1])
        if not validate_vector_dimension(dim):
            logger.warning(
                "dimension %d is outside the supported whitelist "
                "(reference search_engine.py:81)", dim,
            )
        mode = (
            "brute_force" if self.brute_force_mode
            else self.serving_mode if self.serving_mode != "auto"
            else self.index_type
        )
        stats = {
            "n_points": self._n_points(),
            "dimension": dim,
            "mean_norm": float(np.mean(np.linalg.norm(sample_vecs, axis=1))),
        }
        result = {"vector_stats": stats, "serving_mode": mode, "passed": True}
        if not np.all(np.isfinite(sample_vecs)):
            result["passed"] = False
            result["finite"] = False
            logger.warning("sampled vectors contain non-finite values")
            return result

        # --- self-retrieval smoke probe (all modes) -----------------------
        snapshot = dict(self._stats)
        try:
            _, ids, _ = self.search_batch(sample_vecs, k=10)
        finally:
            with self._lock if self._lock else contextlib.nullcontext():
                self._stats.clear()
                self._stats.update(snapshot)
        hits = [g in set(ids[i].tolist()) for i, g in enumerate(sample_gids)]
        rate = float(np.mean(hits))
        result["self_retrieval_rate"] = rate
        if rate < 0.8:
            result["passed"] = False
            logger.warning(
                "self-retrieval smoke probe %.2f < 0.8 in %s mode", rate, mode
            )

        # --- PQ quality checks (PQ-enabled vamana mode) --------------------
        if self.use_pq and self.index is not None:
            vecs = self.index.vectors
            rng = np.random.default_rng(0)
            n = int(vecs.shape[0])
            sample = rng.choice(n, size=min(512, n), replace=False)
            qidx = sample[: min(8, len(sample))]
            q = vecs[jnp.asarray(qidx)]
            sample_j = jnp.asarray(sample)
            if self.pq_cells_j is not None:  # residual PQ
                tables = self.pq.compute_query_tables(q)
                adc = np.asarray(
                    self.pq.asymmetric_distance_sq(
                        tables, self.codes_j[sample_j],
                        self.pq_cells_j[sample_j],
                    )
                )
            else:
                tables = self.pq.compute_distance_tables(q)
                adc = np.asarray(
                    self.pq.asymmetric_distance_sq(
                        tables, self.codes_j[sample_j]
                    )
                )
            exact = np.asarray(
                jnp.sum(
                    jnp.square(
                        q[:, None, :] - vecs[jnp.asarray(sample)][None, :, :]
                    ),
                    axis=-1,
                )
            )
            corrs = [
                float(np.corrcoef(adc[i], exact[i])[0, 1])
                for i in range(len(qidx))
            ]
            corr = float(np.nanmean(corrs))
            result["pq_exact_correlation"] = corr
            if corr < 0.5:
                result["passed"] = False
                logger.warning(
                    "PQ/exact correlation %.3f < 0.5 — PQ quality suspect", corr
                )
            # per-node ratio band [0.1, 10] (reference
            # search_engine.py:214-227); self-pairs (exact == 0) excluded
            valid = exact > 1e-12
            ratio = adc[valid] / exact[valid]
            in_band = float(np.mean((ratio >= 0.1) & (ratio <= 10.0)))
            result["pq_ratio_band_fraction"] = in_band
            if in_band < 0.9:
                result["passed"] = False
                logger.warning(
                    "only %.1f%% of sampled ADC/exact ratios fall in "
                    "[0.1, 10] — PQ distances are mis-scaled", in_band * 100,
                )
        return result

    def _n_points(self) -> int:
        """Total indexed points for the active mode (diagnostics/stats)."""
        if self.brute_force_mode:
            return int(self._bf_flat.n_points)
        if self.meta.get("num_points"):
            return int(self.meta["num_points"])
        if self.index is not None:
            return int(self.index.vectors.shape[0])
        if self.index_type == "flat":
            return int(self.flat.n_points)
        if self.index_type == "ivf":
            return int(self.ivf.n_points)
        return 0

    # --- stats (reference search_engine.py:87-140) -----------------------
    def _update_stats(self, **updates: float) -> None:
        if self._lock:
            with self._lock:
                for k, v in updates.items():
                    self._stats[k] = self._stats.get(k, 0) + v
        else:
            for k, v in updates.items():
                self._stats[k] = self._stats.get(k, 0) + v

    def get_search_statistics(self) -> dict[str, Any]:
        if self._lock:
            with self._lock:
                stats = dict(self._stats)
        else:
            stats = dict(self._stats)
        n = max(stats["total_searches"], 1)
        stats["avg_search_time"] = stats["total_search_time"] / n
        stats["avg_nodes_visited"] = stats["total_nodes_visited"] / n
        exact = stats["total_exact_computations"]
        pq = stats["total_pq_computations"]
        stats["computation_reduction_rate"] = (
            pq / max(exact + pq, 1) if (exact + pq) else 0.0
        )
        return stats

    # --- core batched search --------------------------------------------
    def search_batch(
        self,
        query_vectors: np.ndarray,
        k: int = 5,
        l_search: Optional[int] = None,
        use_pq_search: bool = True,
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Batched vector search. Returns (dists [B,k] sqrt for L2,
        ids [B,k], stats)."""
        t0 = time.perf_counter()
        q, b, l_search = self._prep_queries(query_vectors, k, l_search)
        disp = self._dispatch_search(q, b, k, l_search, use_pq_search)
        return self._finish_search(disp, b=b, k=k, l_search=l_search, t0=t0)

    def _prep_queries(self, query_vectors, k: int, l_search: Optional[int]):
        q = jnp.asarray(query_vectors, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        b = q.shape[0]
        if l_search is None:
            # reference default is max(2k, 20) (search_engine.py:539) even
            # though its build computes recommended_search_L and logs
            # "L_search >= <it>" (build_index.py:357) without ever applying
            # it; we honor the tuned value as the default floor (documented
            # deviation — an explicit l_search overrides it either way)
            l_search = max(2 * k, 20, getattr(self, "recommended_l", 0))
        return q, b, max(l_search, k)

    def _dispatch_search(
        self, q, b: int, k: int, l_search: int, use_pq_search: bool
    ):
        """Branch dispatch WITHOUT the result fetch. Returns
        ("packed", device_buf, k, meta) for device results — the search
        AND pack programs are enqueued (JAX async dispatch), nothing
        drained — or ("host", (dists, ids), None, meta) for host-side
        paths. meta["counts"](fetched_counter) computes the
        (nodes_visited, n_exact, n_pq) stats triple. Split from
        _finish_search so search_pipelined can enqueue batch i+1's
        programs while batch i's fixed ~30-40 ms fetch RPC is in
        flight, leaving worker threads a pure np.asarray."""
        dists, ids, n_expanded, meta = self._dispatch_branches(
            q, b, k, l_search, use_pq_search
        )
        if isinstance(ids, np.ndarray):
            return "host", (dists, ids), None, meta
        if n_expanded is None:
            n_expanded = jnp.zeros((), jnp.int32)
        return "packed", _enqueue_packed(dists, ids, n_expanded), ids.shape[1], meta

    def _dispatch_branches(
        self, q, b: int, k: int, l_search: int, use_pq_search: bool
    ):
        if self.brute_force_mode:
            dists, ids = self._bf_flat.search(q, k=k)
            nv = self._bf_flat.n_points * b
            return dists, ids, None, {
                "search_type": "brute_force",
                "counts": lambda c, nv=nv: (nv, nv, 0),
            }
        if self.serving_mode == "streaming":
            # mutable tier: graph beam + exact buffer scan, one program
            # (index/streaming.py); ids come back as external ids, which
            # equal collection vector_index rows by the alignment
            # invariant (_init_streaming)
            ids, dists = self.streaming.search(
                q, k=k, search_width=l_search
            )
            nv = b * 2 * l_search  # frontier bound
            ne = nv * int(
                self.streaming.index.adjacency.shape[1]
            ) + b * self.streaming.capacity
            return dists, ids, None, {
                "search_type": "streaming",
                "counts": lambda c, nv=nv, ne=ne: (nv, ne, 0),
            }
        if self.serving_mode == "host_tier":
            # pipelined path overlaps device traversal with host rerank
            # on large batches; falls through to plain search() for
            # batches <= one chunk (the common single-query case)
            # chunk >= half the batch: narrower chunks amplify the
            # fixed per-round traversal latency faster than the
            # traversal/rerank overlap pays back (measured at 10M —
            # docs/PERFORMANCE.md "when pipelining pays")
            chunk = max(self.host_tier_pipeline_chunk, -(-b // 2))
            if hasattr(self, "mesh"):
                n_data = self.mesh.shape.get("data", 1)
                chunk = -(-chunk // n_data) * n_data
            # expand width + rerank-pool truncation come from the index
            # meta when the build tuned them (round-cutting and
            # host-rerank levers — docs/PERFORMANCE.md "Round-cutting
            # levers"; rerank_pool=112 at 10M holds recall bit-identical
            # while cutting the host stage ~30%)
            e = int(self.meta.get("recommended_expand_width", 0) or 4)
            kwargs = {}
            rp = int(self.meta.get("recommended_rerank_pool", 0) or 0)
            if rp and not hasattr(self, "mesh"):
                # the sharded tier's pool is already all-gather-merged
                # per shard and has no truncation knob
                kwargs["rerank_pool"] = rp
            dists, ids, ht_stats = self.host_tier.search_pipelined(
                np.asarray(q), search_width=l_search, k=k, chunk=chunk,
                expand_width=e, **kwargs,
            )
            # the sharded tier's merged shard_map path has no per-shard
            # expansion counters (and no PQ mode)
            nv = ht_stats.get("nodes_visited", 0)
            ne = ht_stats["host_vectors_fetched"]
            npq = (
                nv * self.host_tier.adjacency.shape[-1]
                if getattr(self.host_tier, "mode", "bf16") == "pq" else 0
            )
            return dists, np.asarray(ids), None, {
                "search_type": ht_stats.get("search_type", "host_tier"),
                "counts": lambda c, nv=nv, ne=ne, npq=npq: (nv, ne, npq),
                # per-stage attribution (traverse vs host rerank) rides
                # through to the caller's stats — serving benchmarks
                # report it (VERDICT r4 #2: stage_ms via the engine path)
                "stage_ms": ht_stats.get("stage_ms"),
            }
        if self.serving_mode == "sharded_flat":
            from diskrag_tpu.parallel import sharded_flat_search

            ids, dists = sharded_flat_search(
                self._sf_vectors, self._sf_norms, self._sf_gids, q,
                self.mesh, k=k, metric=self._sf_metric,
            )
            n_points = int(self._sf_gids.shape[0] * self._sf_gids.shape[1])
            nv = n_points * b
            return dists, ids, None, {
                "search_type": "sharded_flat",
                "counts": lambda c, nv=nv: (nv, nv, 0),
            }
        if self.index_type == "sharded":
            from diskrag_tpu.parallel import sharded_search

            ids, dists = sharded_search(
                self.sharded, q, self.mesh, search_width=l_search, k=k
            )
            # the merged shard_map path does not return per-shard expansion
            # counters; report the frontier bound (E nodes/round x rounds)
            nv = b * self.sharded.n_shards * 2 * l_search
            ne = nv * self.sharded.adjacency.shape[-1]
            return dists, ids, None, {
                "search_type": "sharded",
                "counts": lambda c, nv=nv, ne=ne: (nv, ne, 0),
            }
        if self.index_type == "flat":
            dists, ids = self.flat.search(q, k=k)
            nv = self.flat.n_points * b
            return dists, ids, None, {
                "search_type": "flat",
                "counts": lambda c, nv=nv: (nv, nv, 0),
            }
        if self.index_type == "ivf":
            n_probe = max(8, min(l_search // 2, self.ivf.n_cells))
            dists, ids = self.ivf.search(q, k=k, n_probe=n_probe)
            cap = self.ivf.tile_ids.shape[1]
            nv = n_probe * cap * b
            return dists, ids, None, {
                "search_type": "ivf",
                "counts": lambda c, nv=nv: (nv, nv, 0),
            }
        if use_pq_search and self.use_pq and self.index.metric == "l2":
            # ADC tables rank by squared L2 only — on a cosine/dot index
            # PQ-guided traversal would converge to the wrong region, so
            # those metrics fall through to exact traversal below (same
            # guard as HostTierIndex.from_store / ShardedHostTier)
            from diskrag_tpu.pq.intq import IntQuantizer

            if isinstance(self.pq, IntQuantizer):
                from diskrag_tpu.graph.search import beam_search_iq

                res = beam_search_iq(
                    self.codes_j, self.pq.query_tables(q),
                    self.index.adjacency, self.index.medoid,
                    dim=self.pq.dim, bits=self.pq.bits,
                    n_cells=self.pq.n_cells,
                    search_width=l_search, k=k, rerank=True,
                    vectors=self.index.vectors, queries=q,
                    metric=self.index.metric,
                    entry_points=self.index.entry_points,
                )
                search_type = "iq_accelerated"
            else:
                tables, aux = self._pq_serving_tables(q)
                res = beam_search_pq(
                    self.codes_j, tables, self.index.adjacency,
                    self.index.medoid,
                    search_width=l_search, k=k, rerank=True,
                    vectors=self.index.vectors, queries=q,
                    metric=self.index.metric,
                    entry_points=self.index.entry_points,
                    **aux,
                )
                search_type = "pq_accelerated"
            deg = self.index.degree_bound
            ne = b * (l_search + res.visited_ids.shape[1])
            return res.dists, res.ids, res.n_expanded, {
                "search_type": search_type,
                "counts": lambda c, deg=deg, ne=ne: (c, ne, c * deg),
            }
        res = beam_search(
            self.index.vectors, self.index.adjacency, self.index.medoid,
            q, search_width=l_search, k=k, metric=self.index.metric,
            entry_points=self.index.entry_points,
        )
        deg = self.index.degree_bound
        return res.dists, res.ids, res.n_expanded, {
            "search_type": "exact",
            "counts": lambda c, deg=deg: (c, c * deg, 0),
        }

    def _finish_search(
        self, disp, *, b: int, k: int, l_search: int, t0: float
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Drain a _dispatch_search result: ONE packed fetch for device
        results (fixed ~30-40 ms RPC each — CLAUDE.md), sqrt at the API
        edge, stats accounting. Thread-safe (stats go through the engine
        lock) so search_pipelined can drain on a background thread."""
        kind, payload, kk, meta = disp
        t_fetch = time.perf_counter()
        if kind == "packed":
            dists, ids, counter = _decode_packed(np.asarray(payload), kk)
        else:
            dists, ids = payload
            ids = np.asarray(ids)
            dists = np.asarray(dists, np.float64)
            counter = 0
        fetch_time = time.perf_counter() - t_fetch
        nodes_visited, n_exact, n_pq = meta["counts"](counter)
        metric = self.meta.get("distance_metric", "l2") if self.meta else "l2"
        if metric == "l2":
            dists = np.sqrt(np.maximum(dists, 0.0))  # reference returns sqrt
        dt = time.perf_counter() - t0
        self._update_stats(
            total_searches=b,
            total_search_time=dt,
            total_nodes_visited=nodes_visited,
            total_exact_computations=n_exact,
            total_pq_computations=n_pq,
        )
        stats = {
            "search_type": meta["search_type"],
            "nodes_visited": nodes_visited,
            "search_time": dt,
            # device-program wait + result drain (the packed transfer is
            # one fixed ~30-40 ms tunnel RPC); search_time - fetch_time
            # is embed-to-dispatch host work
            "fetch_time": fetch_time,
            "k": k,
            "L_search": l_search,
        }
        if meta.get("stage_ms"):
            stats["stage_ms"] = meta["stage_ms"]
        return dists, ids, stats

    # --- public text API (reference search_engine.py:530-614) ------------
    def search(
        self,
        query: str,
        k: int = 5,
        embedding_fn: Optional[Callable[[str], np.ndarray]] = None,
        l_search: Optional[int] = None,
        use_pq_search: bool = True,
    ) -> dict[str, Any]:
        out = self.search_many(
            [query], k=k, embedding_fn=embedding_fn, l_search=l_search,
            use_pq_search=use_pq_search,
        )
        return {**out, "results": out["results"][0]}

    def search_many(
        self,
        queries: list[str],
        k: int = 5,
        embedding_fn: Optional[Callable[[str], np.ndarray]] = None,
        l_search: Optional[int] = None,
        use_pq_search: bool = True,
    ) -> dict[str, Any]:
        """Batched text search: one device dispatch for the whole query
        list, per-query result lists in order. Ours only — the reference
        serves one query per call (search_engine.py:530); batching is
        where the TPU throughput lives, so the public API exposes it."""
        if embedding_fn is None:
            raise ValueError("embedding_fn is required to embed the queries")
        if not queries:
            raise ValueError("queries must be non-empty")
        t_total = time.perf_counter()
        t_emb = time.perf_counter()
        qv = np.stack(
            [np.asarray(embedding_fn(q), np.float32) for q in queries]
        )
        embedding_time = time.perf_counter() - t_emb
        if qv.ndim != 2 or qv.shape[1] != self.info.dimension:
            raise ValueError(
                f"query vector dimension mismatch: expected "
                f"{self.info.dimension}, got {qv.shape}"
            )
        dists, ids, stats = self.search_batch(
            qv, k=k, l_search=l_search, use_pq_search=use_pq_search
        )
        results = self._attach_texts_batch(ids, dists)
        return {
            "results": results,
            "timing": {
                "embedding_time": embedding_time,
                "search_time": stats["search_time"],
                "total_time": time.perf_counter() - t_total,
            },
            "stats": stats,
        }

    def search_pipelined(
        self,
        query_batches: list[list[str]],
        k: int = 5,
        embedding_fn: Optional[Callable[[str], np.ndarray]] = None,
        l_search: Optional[int] = None,
        use_pq_search: bool = True,
        max_in_flight: int = 8,
    ) -> list[dict[str, Any]]:
        """Sustained-throughput serving over a stream of query batches.

        `search_many` pays a fixed ~30-40 ms tunnel RPC to drain each
        batch's packed result (CLAUDE.md), serializing host fetch behind
        device compute. This path dispatches batch i+1's device program
        BEFORE draining batch i (JAX async dispatch), runs each drain on
        a worker thread so up to `max_in_flight` fetch RPCs overlap each
        other, and does the text join on the main thread while later
        fetches are in flight. Per-batch latency is unchanged; aggregate
        QPS is what improves. Ours only — the reference serves one query
        per call (search_engine.py:530) and has no streaming-batch API.

        Returns one `search_many`-shaped dict per input batch, in order.
        """
        import concurrent.futures as cf

        if embedding_fn is None:
            raise ValueError("embedding_fn is required to embed the queries")
        if not query_batches or any(not qs for qs in query_batches):
            raise ValueError("query_batches must be non-empty batches")
        out: list[Any] = [None] * len(query_batches)

        def finish_and_join(disp, b, ls, t_start, t_emb):
            # worker-side: blocking fetch RPC (releases the GIL during
            # the transfer, so up to max_in_flight RPCs overlap —
            # measured 4x on the tunnel) + the text join, which rides
            # the same worker so it overlaps other batches' RPC waits
            dists, ids, stats = self._finish_search(
                disp, b=b, k=k, l_search=ls, t0=t_start
            )
            return {
                "results": self._attach_texts_batch(ids, dists),
                "timing": {
                    "embedding_time": t_emb,
                    "search_time": stats["search_time"],
                    "total_time": time.perf_counter() - t_start,
                },
                "stats": stats,
            }

        from collections import deque

        pending: deque = deque()
        with cf.ThreadPoolExecutor(max_workers=max(1, max_in_flight)) as ex:
            for bi, texts in enumerate(query_batches):
                t_start = time.perf_counter()
                qv = np.stack(
                    [np.asarray(embedding_fn(t), np.float32) for t in texts]
                )
                t_emb = time.perf_counter() - t_start
                if qv.ndim != 2 or qv.shape[1] != self.info.dimension:
                    raise ValueError(
                        f"query vector dimension mismatch: expected "
                        f"{self.info.dimension}, got {qv.shape}"
                    )
                q, b, ls = self._prep_queries(qv, k, l_search)
                disp = self._dispatch_search(q, b, k, ls, use_pq_search)
                pending.append((
                    bi,
                    ex.submit(finish_and_join, disp, b, ls, t_start, t_emb),
                ))
                while len(pending) > max_in_flight:
                    bj, fut = pending.popleft()
                    out[bj] = fut.result()
            while pending:
                bj, fut = pending.popleft()
                out[bj] = fut.result()
        return out

    def search_with_debug(
        self,
        query: str,
        k: int = 5,
        embedding_fn: Optional[Callable[[str], np.ndarray]] = None,
        l_search: Optional[int] = None,
        use_pq_search: bool = True,
        debug_mode: bool = False,
    ) -> dict[str, Any]:
        """Debug-instrumented search (reference search_engine.py:616-659):
        with debug_mode, re-runs the startup diagnostic, searches the same
        query both exactly and PQ-guided, and reports both result lists
        plus their overlap; without it, delegates to `search`. Deviation:
        the reference's step-by-step single-node trace is replaced by the
        batched stats dict (there is no per-node Python loop to trace)."""
        if embedding_fn is None:
            raise ValueError("embedding_fn is required to embed the query")
        if not debug_mode:
            return self.search(
                query, k=k, embedding_fn=embedding_fn, l_search=l_search,
                use_pq_search=use_pq_search,
            )
        diagnostic = None
        if not self.brute_force_mode and self.index is not None:
            try:
                diagnostic = self._run_diagnostic_check()
            except Exception as e:  # noqa: BLE001 — diagnostic is non-fatal
                logger.error("diagnostic check failed: %s", e)
        qv = np.asarray(embedding_fn(query), np.float32)
        _, exact_ids, exact_stats = self.search_batch(
            qv, k=k, l_search=l_search, use_pq_search=False
        )
        out: dict[str, Any] = {
            "exact_results": exact_ids[0].tolist(),
            "exact_stats": exact_stats,
            "pq_results": [],
            "diagnostic": diagnostic,
            "diagnostic_passed": bool(diagnostic and diagnostic.get("passed")),
        }
        if use_pq_search and self.use_pq:
            try:
                _, pq_ids, pq_stats = self.search_batch(
                    qv, k=k, l_search=l_search, use_pq_search=True
                )
                out["pq_results"] = pq_ids[0].tolist()
                out["pq_stats"] = pq_stats
                out["exact_pq_overlap"] = len(
                    set(out["exact_results"]) & set(out["pq_results"])
                ) / max(k, 1)
            except Exception as e:  # noqa: BLE001 — mirror the reference's
                logger.error("PQ search failed: %s", e)  # soft-fail (:647)
        return out

    def faq_search(
        self,
        query: str,
        k: int = 5,
        embedding_fn: Optional[Callable[[str], np.ndarray]] = None,
        l_search: Optional[int] = None,
    ) -> dict[str, Any]:
        """FAQ search: over-fetch 3k, dedup by qa_id, keep type=='faq'
        (reference search_engine.py:694-812)."""
        fetch_k = k * 3
        out = self.search(
            query, k=fetch_k, embedding_fn=embedding_fn, l_search=l_search
        )
        seen_qa: set[str] = set()
        deduped = []
        for r in out["results"]:
            meta = r.get("metadata") or {}
            if meta.get("type") != "faq":
                continue
            qa_id = meta.get("qa_id")
            if qa_id is not None:
                if qa_id in seen_qa:
                    continue
                seen_qa.add(qa_id)
            deduped.append(r)
            if len(deduped) >= k:
                break
        out["results"] = deduped
        out["stats"]["faq_dedup"] = True
        out["stats"]["k"] = k
        return out

    def _attach_texts(self, ids: np.ndarray, dists: np.ndarray) -> list[dict]:
        return self._attach_texts_batch(
            np.asarray(ids)[None, :], np.asarray(dists)[None, :]
        )[0]

    def _attach_texts_batch(
        self, ids: np.ndarray, dists: np.ndarray
    ) -> list[list[dict]]:
        """Text join for a [B, K] result batch: ONE column-store lookup
        for all B*K ids (per-query manager calls cost Python dispatch
        per query; the batched gather is the engine-serving hot path —
        VERDICT r3 Missing #4)."""
        ids = np.asarray(ids)
        found = self.manager.get_texts_by_indices(
            self.collection_name, ids[ids >= 0].tolist()
        )
        # plain-Python loop over tolist() rows: per-element numpy scalar
        # indexing (ids[b, i] / float(dists[b, i])) costs ~100-150 ns
        # each, which at B=512 x k=10 is real milliseconds on the
        # pipelined serving path
        results: list[list[dict]] = []
        j = 0
        for id_row, dist_row in zip(
            ids.tolist(), np.asarray(dists, np.float64).tolist()
        ):
            row: list[dict] = []
            for idx, dist in zip(id_row, dist_row):
                if idx < 0:
                    continue
                item = found[j]
                j += 1
                if item is None:
                    continue
                text, metadata = item
                if not isinstance(metadata, dict):
                    metadata = {"id": idx, "text": text}
                row.append(
                    {"text": text, "distance": dist, "metadata": metadata}
                )
            results.append(row)
        return results


# parity alias (reference search_engine.py:816 `SearchEngine = SearchEngineCorrect`)
SearchEngineCorrect = SearchEngine
