"""Sharded host-offload tier — BASELINE configs 4+5 combined: each chip
holds one shard's graph + bfloat16 traversal vectors in HBM, the
full-precision f32 vectors stay host-resident, and per-shard candidate
pools are merged across the mesh.

Query flow:
  1. device (shard_map over the "shard" axis): every shard runs the
     batched bf16 frontier search on its local graph, globalizes its
     candidate pool (beam ∪ visited log), and `all_gather`s the pools
     over ICI — one [B, S*P] int32 tensor, no vectors cross the mesh;
  2. host: one exact rerank over the deduped pooled ids against the f32
     record file (diskrag_tpu.index.host_tier.exact_rerank_pool).

On a real multi-host pod each host process would own its shards' record
files and rerank only ids it owns (the merge is then a k-way host-side
top-k over per-host results); in this single-process form one global
record file serves all shards, which is behaviorally identical.

No reference counterpart (the reference is single-process, single-tier:
SURVEY.md §2.6); this is the TPU-native answer to "dataset larger than
one chip's HBM *and* larger than one chip's PQ budget".
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from diskrag_tpu.graph.search import _frontier_search, _gathered_distance
from diskrag_tpu.index.host_tier import exact_rerank_pool
from diskrag_tpu.native import RecordReader
from diskrag_tpu.ops.distance import Metric, pairwise_distance
from diskrag_tpu.ops.topk import INVALID_ID
from diskrag_tpu.parallel.sharded import ShardedIndex, shard_to_mesh


def _local_pool(adj, med, gid, ep, expand, seed_expand, b, *,
                search_width, k, max_steps, expand_width):
    """Shared per-shard body of both pool impls: frontier search ->
    globalized candidate pool (beam ∪ visited) -> ICI all_gather."""
    ns = adj.shape[0]
    res = _frontier_search(
        adj, med, expand, b,
        search_width=search_width, k=k, max_steps=max_steps,
        expand_width=expand_width,
        entry_points=None if ep is None else ep[0],
        seed_expand_fn=seed_expand,
    )
    pool_local = jnp.concatenate([res.ids, res.visited_ids], axis=1)
    pool_g = jnp.where(
        pool_local == INVALID_ID, INVALID_ID,
        gid[jnp.clip(pool_local, 0, ns - 1)],
    )
    # ids only over ICI: [Bd, P] x S shards -> [Bd, S*P]
    return jax.lax.all_gather(pool_g, "shard", axis=1, tiled=True)


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_width", "k", "max_steps", "expand_width", "metric", "mesh"
    ),
)
def _sharded_pool_impl(
    vectors_bf16, adjacency, medoids, global_ids, entry_points, queries,
    *, search_width: int, k: int, max_steps: int, expand_width: int,
    metric: str, mesh: Mesh,
):
    """Per-shard bf16 traversal -> all-gathered global candidate pools.

    Returns int32[B, S * (k + visited_log)] global ids (-1 invalid),
    replicated across the shard axis.
    """

    def local_search(vecs, adj, med, gid, ep, q):
        vecs, adj, gid = vecs[0], adj[0], gid[0]
        med = med[0]
        ns = vecs.shape[0]

        def expand(ids):
            return _gathered_distance(
                q, vecs[jnp.clip(ids, 0, ns - 1)], metric
            )

        def seed_expand(seeds):
            return pairwise_distance(q, vecs[seeds], metric)

        return _local_pool(
            adj, med, gid, ep, expand, seed_expand, q.shape[0],
            search_width=search_width, k=k, max_steps=max_steps,
            expand_width=expand_width,
        )

    ep_spec = P() if entry_points is None else P("shard", None)
    return jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P("shard", None, None),
            P("shard", None, None),
            P("shard"),
            P("shard", None),
            ep_spec,
            P("data", None),
        ),
        out_specs=P("data", None),
        check_vma=False,  # all_gather replicates over "shard"
    )(vectors_bf16, adjacency, medoids, global_ids, entry_points, queries)


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_width", "k", "max_steps", "expand_width", "mesh",
        "use_pallas_adc",
    ),
)
def _sharded_pool_pq_impl(
    codes, tables, adjacency, medoids, global_ids, entry_points, queries,
    pq_cells=None, pq_bias=None, cell_tables=None,
    *, search_width: int, k: int, max_steps: int, expand_width: int,
    mesh: Mesh, use_pallas_adc: bool,
):
    """PQ twin of `_sharded_pool_impl`: traversal guided by per-query ADC
    tables over per-shard uint8 codes (m bytes/node in HBM instead of
    2*D) — extends the per-chip shard capacity ~2*D/m beyond bf16 mode.
    The exact host rerank downstream is unchanged, so result quality
    follows the ADC-traversal recall (see docs/PERFORMANCE.md on when
    PQ-guided traversal holds up). Optional residual-PQ aux (all three
    together): pq_cells int32 [S, Ns], pq_bias f32 [S, Ns],
    cell_tables [B, C] (pq/residual.py serving decomposition)."""
    from diskrag_tpu.ops.pq_scan import adc_lookup_gathered_pallas
    from diskrag_tpu.pq.product_quantizer import adc_lookup, adc_lookup_gathered

    residual = pq_cells is not None

    def local_search(cds, adj, med, gid, ep, q, tbl, cl, bs, ctbl):
        cds, adj, gid = cds[0], adj[0], gid[0]
        med = med[0]
        ns = cds.shape[0]
        if residual:
            cl, bs = cl[0], bs[0]

        def expand(ids):
            safe = jnp.clip(ids, 0, ns - 1)
            gathered = cds[safe]
            if use_pallas_adc:
                d = adc_lookup_gathered_pallas(tbl, gathered)
            else:
                d = adc_lookup_gathered(tbl, gathered)
            if residual:
                d = d + jnp.take_along_axis(ctbl, cl[safe], axis=1) + bs[safe]
            return d

        def seed_expand(seeds):
            d = adc_lookup(tbl, cds[seeds])  # one shared code gather
            if residual:
                d = d + ctbl[:, cl[seeds]] + bs[seeds][None, :]
            return d

        return _local_pool(
            adj, med, gid, ep, expand, seed_expand, q.shape[0],
            search_width=search_width, k=k, max_steps=max_steps,
            expand_width=expand_width,
        )

    ep_spec = P() if entry_points is None else P("shard", None)
    aux_specs = (
        (P("shard", None), P("shard", None), P("data", None))
        if residual else (P(), P(), P())
    )
    return jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P("shard", None, None),
            P("shard", None, None),
            P("shard"),
            P("shard", None),
            ep_spec,
            P("data", None),
            P("data", None, None),
            *aux_specs,
        ),
        out_specs=P("data", None),
        check_vma=False,  # all_gather replicates over "shard"
    )(codes, adjacency, medoids, global_ids, entry_points, queries, tables,
      pq_cells, pq_bias, cell_tables)


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_width", "k", "max_steps", "expand_width", "mesh",
        "dim", "bits", "n_cells",
    ),
)
def _sharded_pool_iq_impl(
    codes, adjacency, medoids, global_ids, entry_points, queries,
    qw, qn, cell_t, bias_lo, bias_scale,
    *, search_width: int, k: int, max_steps: int, expand_width: int,
    mesh: Mesh, dim: int, bits: int, n_cells: int,
):
    """iq twin of `_sharded_pool_pq_impl`: traversal guided by MXU-scored
    IntQuantizer int8 rows per shard (pq/intq.py) — row_width bytes/node
    in HBM, near-exact ordering at ~10x the ADC round throughput (the
    same trade as the single-chip tier's mode='iq', index/host_tier.py).
    The IQTables leaves ride in flat so each gets its own sharding spec
    (qw/qn/cell_t are per-query → data-sharded; the bias affine scalars
    are replicated)."""
    from diskrag_tpu.pq.intq import (
        IQTables,
        iq_score_gathered,
        iq_score_shared,
    )

    def local_search(cds, adj, med, gid, ep, q, qw_, qn_, ct_, blo, bsc):
        cds, adj, gid = cds[0], adj[0], gid[0]
        med = med[0]
        ns = cds.shape[0]
        tbl = IQTables(
            qw=qw_, qn=qn_, cell_t=ct_, bias_lo=blo, bias_scale=bsc
        )

        def expand(ids):
            safe = jnp.clip(ids, 0, ns - 1)
            return iq_score_gathered(
                tbl, cds[safe], dim=dim, bits=bits, n_cells=n_cells
            )

        def seed_expand(seeds):
            return iq_score_shared(
                tbl, cds[seeds], dim=dim, bits=bits, n_cells=n_cells
            )

        return _local_pool(
            adj, med, gid, ep, expand, seed_expand, q.shape[0],
            search_width=search_width, k=k, max_steps=max_steps,
            expand_width=expand_width,
        )

    ep_spec = P() if entry_points is None else P("shard", None)
    ct_spec = P() if cell_t is None else P("data", None)
    return jax.shard_map(
        local_search,
        mesh=mesh,
        in_specs=(
            P("shard", None, None),
            P("shard", None, None),
            P("shard"),
            P("shard", None),
            ep_spec,
            P("data", None),
            P("data", None),
            P("data"),
            ct_spec,
            P(),
            P(),
        ),
        out_specs=P("data", None),
        check_vma=False,  # all_gather replicates over "shard"
    )(codes, adjacency, medoids, global_ids, entry_points, queries,
      qw, qn, cell_t, bias_lo, bias_scale)


@dataclasses.dataclass
class ShardedHostTier:
    """Sharded compressed-traversal tier + host-resident f32 rerank.

    mode "bf16": bf16 vectors/shard in HBM (2*D bytes/node, near-exact
    traversal ordering). mode "pq": uint8 PQ codes/shard (m bytes/node,
    ~2*D/m more capacity per chip; quality is data-dependent — the same
    trade as the single-chip tier, index/host_tier.py). mode "iq":
    IntQuantizer int8 rows/shard (row_width bytes/node, near-exact
    ordering at ~10x the ADC round throughput)."""

    vectors_bf16: jax.Array | None  # [S, Ns, D] bf16 (bf16 mode)
    adjacency: jax.Array      # [S, Ns, R]
    medoids: jax.Array        # [S]
    global_ids: jax.Array     # [S, Ns]
    reader: RecordReader      # global-id -> f32 vector (host)
    mesh: Mesh
    metric: str = Metric.L2.value
    entry_points: jax.Array | None = None
    mode: str = "bf16"        # "bf16" | "pq"
    codes: jax.Array | None = None  # [S, Ns, m] uint8 (pq mode)
    pq: "object | None" = None      # ProductQuantizer | ResidualPQ (pq mode)
    # residual-PQ serving aux, sharded like codes (pq/residual.py)
    pq_cells: jax.Array | None = None  # int32 [S, Ns]
    pq_bias: jax.Array | None = None   # f32 [S, Ns]

    @property
    def n_shards(self) -> int:
        arr = self.vectors_bf16 if self.mode == "bf16" else self.codes
        return int(arr.shape[0])

    @classmethod
    def from_sharded_index(
        cls, index: ShardedIndex, reader: RecordReader, mesh: Mesh,
        *, mode: str = "bf16", pq=None, codes: np.ndarray | None = None,
        pq_cells: np.ndarray | None = None,
        pq_bias: np.ndarray | None = None,
    ) -> "ShardedHostTier":
        """Wrap a built ShardedIndex: place each array straight into its
        sharded layout and keep only the compressed traversal copy on
        device (the f32 master lives behind `reader`; no device ever
        holds more than its own shard — the full-precision vectors are
        never uploaded at all). For mode="pq" pass the fitted
        ProductQuantizer and the *global* uint8 codes [N, m]; they are
        regathered per shard through the global id maps here."""
        from jax.sharding import NamedSharding

        spec3 = NamedSharding(mesh, P("shard", None, None))
        spec2 = NamedSharding(mesh, P("shard", None))
        spec1 = NamedSharding(mesh, P("shard"))
        common = dict(
            adjacency=jax.device_put(index.adjacency, spec3),
            medoids=jax.device_put(index.medoids, spec1),
            global_ids=jax.device_put(index.global_ids, spec2),
            reader=reader,
            mesh=mesh,
            metric=index.metric,
            entry_points=(
                None if index.entry_points is None
                else jax.device_put(index.entry_points, spec2)
            ),
        )
        if mode == "bf16":
            v = index.vectors
            if isinstance(v, jax.Array):
                v16 = jax.device_put(v, spec3).astype(jnp.bfloat16)
            else:
                # host-resident (e.g. mmapped from load_sharded_index):
                # cast on host so only the bf16 copy crosses the link
                import ml_dtypes

                v16 = jax.device_put(
                    np.asarray(v).astype(ml_dtypes.bfloat16), spec3
                )
            return cls(vectors_bf16=v16, **common)
        if mode not in ("pq", "iq"):
            raise ValueError(f"unknown sharded host-tier mode: {mode}")
        if pq is None or codes is None:
            raise ValueError(f"mode={mode!r} needs pq model + global codes")
        if Metric(index.metric) != Metric.L2:
            # quantized scores rank by squared L2 only: traversal would
            # rank by the wrong metric (see index/host_tier.py from_store)
            raise ValueError(
                f"sharded host-tier {mode} traversal is L2-only; this "
                f"index uses metric={index.metric!r} — use bf16 mode, "
                "or normalize the vectors and build with metric='l2'"
            )
        if mode == "iq":
            gids = np.asarray(index.global_ids)
            safe_gids = np.clip(gids, 0, None)
            shard_rows = np.asarray(codes, np.int8)[safe_gids]
            pad_mask = gids < 0
            if pad_mask.any():
                # same treatment as pq below: pad rows are wrap-around
                # duplicates — encode their actual vectors so traversal
                # through them ranks correctly
                ps, pr = np.nonzero(pad_mask)
                shard_rows[pad_mask] = np.asarray(
                    pq.encode(np.asarray(index.vectors[ps, pr]))
                )
            from diskrag_tpu.pq.intq import pad_rows_for_gather

            # 256 B gather pad — same round-latency lever as the
            # single-chip tier (index/host_tier.py from_store)
            shard_rows = pad_rows_for_gather(shard_rows)
            return cls(
                vectors_bf16=None,
                mode="iq",
                codes=jax.device_put(shard_rows, spec3),
                pq=pq,
                **common,
            )
        from diskrag_tpu.pq.residual import ResidualPQ

        residual = isinstance(pq, ResidualPQ)
        if residual and (pq_cells is None or pq_bias is None):
            raise ValueError(
                "residual pq mode needs global pq_cells + pq_bias "
                "(index/persist.py load_pq_aux)"
            )
        gids = np.asarray(index.global_ids)
        safe_gids = np.clip(gids, 0, None)
        shard_codes = np.asarray(codes, np.uint8)[safe_gids]
        shard_cells = shard_bias = None
        if residual:
            shard_cells = np.asarray(pq_cells, np.int32)[safe_gids]
            shard_bias = np.asarray(pq_bias, np.float32)[safe_gids]
        pad_mask = gids < 0
        if pad_mask.any():
            # padding rows are wrap-around duplicates of real points;
            # encode their actual vectors so traversal through them ranks
            # correctly (their -1 gid still masks them out of the pool).
            # Gather ONLY the <=S-1 pad rows device-side before fetching —
            # np.asarray(index.vectors) would pull the full [S, Ns, D]
            # f32 set over the link to read a handful of rows.
            ps, pr = np.nonzero(pad_mask)
            pad_vecs = np.asarray(index.vectors[ps, pr])
            if residual:
                pad_codes, pad_cids = pq.encode(pad_vecs)
                shard_codes[pad_mask] = np.asarray(pad_codes)
                shard_cells[pad_mask] = np.asarray(pad_cids)
                shard_bias[pad_mask] = np.asarray(
                    pq.point_bias(pad_codes, pad_cids)
                )
            else:
                shard_codes[pad_mask] = np.asarray(pq.encode(pad_vecs))
        return cls(
            vectors_bf16=None,
            mode="pq",
            codes=jax.device_put(shard_codes, spec3),
            pq=pq,
            pq_cells=(
                None if shard_cells is None
                else jax.device_put(shard_cells, spec2)
            ),
            pq_bias=(
                None if shard_bias is None
                else jax.device_put(shard_bias, spec2)
            ),
            **common,
        )

    def _pool(self, q: jax.Array, *, search_width, max_steps, expand_width):
        """Dispatch one traversal round -> device pool array [B, S*P]."""
        if self.mode == "iq":
            t = self.pq.query_tables(q)
            return _sharded_pool_iq_impl(
                self.codes, self.adjacency, self.medoids,
                self.global_ids, self.entry_points, q,
                t.qw, t.qn, t.cell_t, t.bias_lo, t.bias_scale,
                search_width=search_width, k=search_width,
                max_steps=max_steps, expand_width=expand_width,
                mesh=self.mesh, dim=self.pq.dim, bits=self.pq.bits,
                n_cells=self.pq.n_cells,
            )
        if self.mode == "pq":
            if self.pq_cells is not None:  # residual PQ (pq/residual.py)
                tables = self.pq.inner_tables(q)
                aux = (self.pq_cells, self.pq_bias, self.pq.cell_tables(q))
            else:
                tables = self.pq.compute_distance_tables(q)
                aux = (None, None, None)
            return _sharded_pool_pq_impl(
                self.codes, tables, self.adjacency, self.medoids,
                self.global_ids, self.entry_points, q, *aux,
                search_width=search_width, k=search_width,
                max_steps=max_steps, expand_width=expand_width,
                mesh=self.mesh,
                use_pallas_adc=jax.default_backend() != "cpu",
            )
        return _sharded_pool_impl(
            self.vectors_bf16, self.adjacency, self.medoids,
            self.global_ids, self.entry_points, q,
            search_width=search_width, k=search_width,
            max_steps=max_steps, expand_width=expand_width,
            metric=self.metric, mesh=self.mesh,
        )

    def search(
        self,
        queries: np.ndarray,
        *,
        search_width: int,
        k: int,
        expand_width: int = 4,
        max_steps: int | None = None,
        n_threads: int = 8,
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Returns (dists [B, k] squared, ids [B, k] global, stats)."""
        # host copy first: it feeds the host rerank, and np.asarray of
        # the uploaded device array later would be a silent ~30-40 ms
        # round-trip over the tunnel (CLAUDE.md)
        q_np = np.asarray(queries, np.float32)
        if q_np.ndim == 1:
            q_np = q_np[None, :]
        q = jnp.asarray(q_np)
        if max_steps is None:
            max_steps = max(search_width, 16)
        b = q.shape[0]
        # the pool impl splits the batch over the "data" mesh axis — pad
        # odd batch sizes and slice the padding back off
        pad = (-b) % self.mesh.shape.get("data", 1)
        if pad:
            q = jnp.concatenate([q, jnp.zeros((pad, q.shape[1]), q.dtype)])
        pool = np.asarray(
            self._pool(
                q, search_width=search_width, max_steps=max_steps,
                expand_width=expand_width,
            )
        )[:b]
        dists, ids, n_uniq = exact_rerank_pool(
            q_np, pool, self.reader, metric=self.metric, k=k,
            n_threads=n_threads,
        )
        stats = {
            "search_type": "sharded_host_tier",
            "mode": self.mode,
            "n_shards": self.n_shards,
            "pool_width": int(pool.shape[1]),
            "host_vectors_fetched": n_uniq,
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
        max_steps: int | None = None,
        n_threads: int = 8,
    ) -> tuple[np.ndarray, np.ndarray, dict]:
        """Chunked two-stage pipeline, the sharded twin of
        `HostTierIndex.search_pipelined`: the mesh traverses chunk i+1
        while the host gathers + reranks chunk i's all-gathered pool.
        The last chunk is padded to keep one compiled shape. Exact same
        results as `search()`. `chunk` must be divisible by the mesh's
        "data" axis size (each chunk is batch-sharded over it).
        """
        n_data = self.mesh.shape.get("data", 1)
        if chunk % n_data:
            raise ValueError(
                f"chunk={chunk} must be divisible by the mesh data axis "
                f"({n_data})"
            )
        q_np = np.asarray(queries, np.float32)
        if q_np.ndim == 1:
            q_np = q_np[None, :]
        b = q_np.shape[0]
        if b <= chunk:
            return self.search(
                q_np, search_width=search_width, k=k,
                expand_width=expand_width, max_steps=max_steps,
                n_threads=n_threads,
            )
        if max_steps is None:
            max_steps = max(search_width, 16)
        n_chunks = -(-b // chunk)
        padded = n_chunks * chunk
        if padded != b:
            q_np = np.concatenate(
                [q_np, np.broadcast_to(q_np[:1], (padded - b, q_np.shape[1]))]
            )
        out_d = np.empty((padded, k), np.float64)
        out_i = np.empty((padded, k), np.int64)
        n_uniq_total = 0
        pool_width = 0
        pending = None
        for c in range(n_chunks + 1):
            if c < n_chunks:
                s = c * chunk
                pool_dev = self._pool(
                    jnp.asarray(q_np[s : s + chunk]),
                    search_width=search_width, max_steps=max_steps,
                    expand_width=expand_width,
                )
                nxt = (s, pool_dev)
            else:
                nxt = None
            if pending is not None:
                s_prev, pool_dev_prev = pending
                pool = np.asarray(pool_dev_prev)
                pool_width = pool.shape[1]
                dists, ids, n_uniq = exact_rerank_pool(
                    q_np[s_prev : s_prev + chunk], pool, self.reader,
                    metric=self.metric, k=k, n_threads=n_threads,
                )
                out_d[s_prev : s_prev + chunk] = dists
                out_i[s_prev : s_prev + chunk] = ids
                n_uniq_total += n_uniq
            pending = nxt
        stats = {
            "search_type": "sharded_host_tier",
            "mode": self.mode,
            "n_shards": self.n_shards,
            "pool_width": pool_width,
            "pipelined_chunks": n_chunks,
            "host_vectors_fetched": n_uniq_total,
        }
        return out_d[:b], out_i[:b], stats
