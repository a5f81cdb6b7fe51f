"""Streaming ingest: a mutable tier between one-wave insert and rebuild.

The reference mutates its graph one point at a time under a lock
(reference vamana_graph.py:58-125 `insert_node`); at TPU batch sizes that
amortizes terribly (measured 274 inserts/s via one-wave
`graph.dynamic.insert_points` — slower than the reference's scalar loop).
The TPU-shaped fix is FreshDiskANN's: absorb new points into a small
*exact* side buffer that is brute-scanned alongside the graph, and fold
the buffer into the graph in bulk when it fills.

Design:
  - The side buffer is a preallocated device array [capacity, D]; an
    append is ONE `dynamic_update_slice` dispatch per batch, so ingest
    throughput is bounded by the merge amortization, not by dispatches.
  - Search = graph beam search + masked flat scan of the buffer + top-k
    merge, all inside one jitted function (one dispatch chain — eager
    op mixing costs ~1.5 ms/op on this platform, see CLAUDE.md).
    Buffer hits are EXACT, so recall during ingest is the graph's
    recall on old points and 1.0 on buffered ones.
  - **Static shapes under jit**: the graph arrays are padded to a
    capacity bucket (multiples of 64k, grown geometrically) with masked
    dead rows, and a full-buffer merge folds ALL `capacity` slots (dead
    buffered rows become graph tombstones). Every program in the cycle —
    the merged search, the append, and the bulk insert wave — therefore
    reuses its compile across merges. The first measurement of this tier
    (2026-08-19, growing arrays) spent ~90% of its ingest wall in XLA
    recompiles: every merge changed [N, D]/[N, R] and recompiled both the
    wave and the serving program, capping ingest at ~330 vectors/s.
  - Merge folds the buffer in bulk while it is a small fraction of the
    graph — by default via exact-kNN insertion (`_knn_merge_waves`:
    candidates from ONE fused MXU flat scan per sub-wave instead of a
    latency-bound beam search; `merge_method="wave"` keeps the
    beam-searched `graph.build.wave_step` path) — and by a full kNN
    rebuild (`graph.knn_build.build_vamana_knn`, 12 s warm at 200k)
    once it isn't. Deletes are tombstones in both tiers;
    `consolidate()` compacts them (graph/dynamic.py).
  - Ids are stable across merges: every point gets a permanent external
    id at insert; searches return external ids via a device-resident
    translation row (`self._ext_of_int`).

Sustained ingest therefore costs: append dispatches (microseconds per
batch) + merge_time / capacity per point, with merge_time paying compile
only on the first merge per capacity bucket. Measured on chip (200k
base, docs/PERFORMANCE.md "Streaming ingest") after the static-shape
fix; the rate scales with `buffer_capacity` (bigger buffer = fewer,
larger merges) at the cost of a wider exact scan per query.
"""

from __future__ import annotations

import functools
import logging
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.graph import beam_search
from diskrag_tpu.graph.build import _reverse_edges, wave_step
from diskrag_tpu.graph.prune import robust_prune_batch
from diskrag_tpu.graph.search import _gathered_distance
from diskrag_tpu.graph.dynamic import (
    consolidate,
    delete_points,
    make_deleted_mask,
)
from diskrag_tpu.graph.types import VamanaIndex
from diskrag_tpu.ops.distance import Metric, pairwise_distance
from diskrag_tpu.ops.topk import INVALID_ID

logger = logging.getLogger(__name__)

# padding rows: far-but-finite vectors (1e30 would make the squared
# distance overflow to inf and risk inf-inf = NaN in the masked merges;
# 1e15 keeps ||pad||^2 ~ 1e32, huge and finite), no out-edges, deleted
_PAD_VALUE = 1e15
_BUCKET = 65_536
INF = jnp.inf


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.partial(jax.jit, donate_argnums=(0,))
def _append(buf: jax.Array, count: jax.Array, batch: jax.Array):
    """One-dispatch batched append into the preallocated buffer."""
    return jax.lax.dynamic_update_slice(buf, batch, (count, 0))


@functools.partial(
    jax.jit,
    static_argnames=("search_width", "k", "expand_width", "metric"),
)
def _search_merged(
    vectors: jax.Array,
    adjacency: jax.Array,
    medoid: jax.Array,
    entry_points: Optional[jax.Array],
    graph_ext: jax.Array,
    graph_deleted: jax.Array,
    buf: jax.Array,
    buf_ext: jax.Array,
    buf_live: jax.Array,
    buf_count: jax.Array,
    queries: jax.Array,
    *,
    search_width: int,
    k: int,
    expand_width: int,
    metric: str,
):
    """Graph beam search + exact buffer scan + top-k merge, one program.

    Graph results are over-fetched at the full beam width so tombstoned
    rows can be dropped without losing k survivors; buffer rows beyond
    `buf_count` (or tombstoned) are masked to +inf. Returns EXTERNAL ids.
    Capacity-padding rows are tombstoned and unreachable (no in-edges),
    so the same masks cover them.
    """
    res = beam_search(
        vectors, adjacency, medoid, queries,
        search_width=search_width, k=search_width, metric=metric,
        expand_width=expand_width, entry_points=entry_points,
    )
    n = graph_deleted.shape[0]
    safe = jnp.clip(res.ids, 0, n - 1)
    bad = (res.ids == INVALID_ID) | graph_deleted[safe]
    g_dists = jnp.where(bad, jnp.inf, res.dists)
    g_ext = jnp.where(bad, INVALID_ID, graph_ext[safe])

    cap = buf.shape[0]
    slot_live = (
        jnp.arange(cap, dtype=jnp.int32) < buf_count
    ) & buf_live
    b_d = pairwise_distance(queries, buf, Metric(metric))
    b_d = jnp.where(slot_live[None, :], b_d, jnp.inf)
    bk = min(k, cap)
    b_neg, b_idx = jax.lax.top_k(-b_d, bk)
    b_ext = jnp.where(jnp.isinf(b_neg), INVALID_ID, buf_ext[b_idx])

    all_d = jnp.concatenate([g_dists, -b_neg], axis=1)
    all_i = jnp.concatenate([g_ext, b_ext], axis=1)
    neg, take = jax.lax.top_k(-all_d, k)
    ids = jnp.take_along_axis(all_i, take, axis=1)
    ids = jnp.where(jnp.isinf(-neg), INVALID_ID, ids)
    return ids, -neg


@functools.partial(
    jax.jit, static_argnames=("metric",), donate_argnames=("adjacency",)
)
def _knn_forward_rows(
    vectors: jax.Array,
    adjacency: jax.Array,
    wave_ids: jax.Array,
    cand_ids: jax.Array,
    cand_dists: jax.Array,
    n_used: jax.Array,
    alpha: jax.Array,
    *,
    metric: str,
    codes=None,
    code_scales=None,
):
    """Prune one sub-wave's exact-kNN candidate pool and write the
    forward rows. The pool = the flat scan's top candidates (self and
    capacity-pad rows >= n_used masked out here — pads are far under L2
    but all-identical unit vectors under cosine) ++ the rows' current
    links (the random init links, plus any reverse edges received from
    earlier merges). Returns (adjacency, pruned [W, R]).

    `codes`/`code_scales`: the merge scan's int8 copy — pool gathers and
    prune distances then run int8 (quarter the gather bytes; the scan's
    candidate distances stay exact f32 either way)."""
    n, r = adjacency.shape
    bad = (cand_ids >= n_used) | (cand_ids == wave_ids[:, None])
    cand_dists = jnp.where(bad, INF, cand_dists)
    cand_ids = jnp.where(bad, INVALID_ID, cand_ids)
    cur = adjacency[wave_ids]
    pool_ids = jnp.concatenate([cand_ids, cur], axis=1)
    safe_pool = jnp.clip(pool_ids, 0, n - 1)
    if codes is not None:
        from diskrag_tpu.graph.prune import gathered_distance_int8

        q_codes = codes[wave_ids]
        q_sc = code_scales[wave_ids]
        cur_codes = codes[jnp.clip(cur, 0, n - 1)]
        cur_sc = code_scales[jnp.clip(cur, 0, n - 1)]
        cur_d = jnp.where(
            cur == INVALID_ID,
            INF,
            gathered_distance_int8(q_codes, q_sc, cur_codes, cur_sc, metric),
        )
        pool_vecs = codes[safe_pool]
        pool_sc = code_scales[safe_pool]
    else:
        queries = vectors[wave_ids]
        cur_vecs = vectors[jnp.clip(cur, 0, n - 1)]
        cur_d = jnp.where(
            cur == INVALID_ID,
            INF,
            _gathered_distance(queries, cur_vecs, metric),
        )
        pool_vecs = vectors[safe_pool]
        pool_sc = None
    pool_dists = jnp.concatenate([cand_dists, cur_d], axis=1)
    pruned = robust_prune_batch(
        wave_ids, pool_ids, pool_vecs, pool_dists, alpha,
        degree_bound=r, metric=metric, cand_scales=pool_sc,
    )
    return adjacency.at[wave_ids].set(pruned), pruned


@functools.partial(
    jax.jit,
    static_argnames=("max_incoming", "chunk", "metric"),
    donate_argnames=("adjacency",),
)
def _reverse_pass(
    vectors, adjacency, wave_ids, pruned, alpha,
    *, max_incoming, chunk, metric, codes=None, code_scales=None,
):
    """Standalone jitted reverse-edge repair (graph/build.py's
    `_reverse_edges`) for the kNN merge: forward rows are written first
    for ALL sub-waves, then targets are repaired once per merge slice.
    `codes`/`code_scales`: the merge scan's int8 copy — the repair's
    candidate gathers then move a quarter of the bytes (the measured
    bottleneck of the whole merge at 1M: 6.5 s of 14 s per slice)."""
    return _reverse_edges(
        vectors, adjacency, wave_ids, pruned, alpha,
        max_incoming=max_incoming, chunk=chunk, metric=metric,
        codes=codes, code_scales=code_scales,
    )


@functools.partial(jax.jit, donate_argnums=(0, 1), static_argnames=())
def _place_rows(vectors, adjacency, n0, vecs, rand_links):
    """Write a wave of new rows into the padded region at n0 — one
    dispatch for both arrays (donated: updates in place in HBM)."""
    vectors = jax.lax.dynamic_update_slice(vectors, vecs, (n0, 0))
    adjacency = jax.lax.dynamic_update_slice(adjacency, rand_links, (n0, 0))
    return vectors, adjacency


def auto_buffer_capacity(n: int) -> int:
    """Default side-buffer capacity for a base of `n` rows, from the
    measured merge-cost model (2026-08-20, post reverse-pass fixes):
    capacity 32768 / fraction 0.25 sustains 14.1k inserts/s at a 200k
    base and 9.2k/s at 1M (recall 0.998+ held); 65536 serves the same
    recall ~35% slower (per-merge prune intermediates scale with
    capacity), and 16384 fell off an 8x cliff at 200k (merge fixed
    costs — compile reuse, reverse pass — amortize over half the
    inserts). 32768 is the optimum across the whole measured range, so
    auto picks it for any base that can absorb it and only shrinks for
    small collections where a 32k buffer would rival the base itself
    (reference scaling counterpart: vamana_graph.py:58-114 sizes its
    insert path off the live graph, no knob)."""
    return min(32_768, max(4_096, -(-(n // 4) // 4_096) * 4_096))


class StreamingIndex:
    """Mutable serving tier: static Vamana graph + exact device buffer.

    The reference counterpart is the insert/delete/consolidate surface of
    `VamanaGraph` (reference vamana_graph.py:58-230); the behavior
    deviation — buffered bulk merges instead of per-point graph mutation
    — is this module's reason to exist (docstring above).

    Not thread-safe: like the underlying jax arrays, callers serialize
    mutations (the HTTP layer does; reference holds a lock, ours
    documents the same single-writer contract).
    """

    def __init__(
        self,
        index: VamanaIndex,
        *,
        buffer_capacity: Optional[int] = None,
        merge_insert_max_fraction: float = 0.25,
        build_width: int = 64,
        alpha: float = 1.2,
        degree_bound: Optional[int] = None,
        seed: int = 0,
        wave_chunk: int = 4096,
        merge_method: str = "knn",
        reserve_inserts: int = 0,
    ):
        if merge_method not in ("knn", "wave"):
            raise ValueError(f"unknown merge_method {merge_method!r}")
        n = int(index.adjacency.shape[0])
        if buffer_capacity is None:
            buffer_capacity = auto_buffer_capacity(n)
        elif n >= 4 * int(buffer_capacity) and int(buffer_capacity) < 32_768:
            # explicit override below the measured efficient band
            logger.warning(
                "buffer_capacity=%d below the measured efficient band "
                "(>=32768 at >=200k base): merge fixed costs amortize "
                "over fewer inserts (an 8x ingest-rate cliff was "
                "measured at 16384)", int(buffer_capacity),
            )
        self.capacity = int(buffer_capacity)
        # insert headroom kept padded beyond the live rows: a growth
        # event reallocates multi-GB arrays AND changes every jitted
        # shape (merge scan, forward/reverse, merged search), which at
        # 1M-row scale costs tens of seconds of recompiles through the
        # remote compile helper. A long-running service should reserve
        # its expected ingest up front — growth then never fires
        # mid-serving (measured 2026-08-19: the un-reserved 1M run paid
        # one mid-stream growth that dominated its ingest wall).
        self._reserve = int(reserve_inserts)
        self.merge_insert_max_fraction = merge_insert_max_fraction
        self._wave_chunk = int(wave_chunk)
        self.merge_method = merge_method
        self.build_width = build_width
        self.alpha = alpha
        self.degree_bound = degree_bound or int(index.adjacency.shape[1])
        self.seed = seed
        self.metric = index.metric

        dim = int(index.vectors.shape[1])
        self._buf = jnp.zeros((self.capacity, dim), index.vectors.dtype)
        self._buf_ext = jnp.full((self.capacity,), INVALID_ID, jnp.int32)
        self._buf_live = jnp.zeros((self.capacity,), jnp.bool_)
        self._count = 0
        # external-id bookkeeping: graph row i serves external id
        # _graph_ext[i]; external ids are dense and never reused
        self._n_graph = n
        self._next_ext = n
        self._n_deleted = 0
        self.n_merges = 0
        # host-side mirror for delete-by-external-id on the buffer
        self._buf_ext_host: dict[int, int] = {}
        # external ids currently tombstoned (either tier): makes delete
        # idempotent — a re-delete must not re-count into _n_deleted
        self._deleted_ext: set[int] = set()
        # sticky: set whenever rows are dropped + compacted (rebuild-path
        # merge or consolidate). From then on graph row i != external id
        # i, so persisting the raw rows over a collection whose
        # vector_index is positional would silently mis-join every
        # compacted row after restart — engine.flush_index refuses while
        # this is set. _n_deleted alone can't guard this: compaction
        # returns it to 0.
        self.rows_compacted = False
        self._adopt_index(index, np.arange(n, dtype=np.int32), None)

    # --- capacity padding ----------------------------------------------------
    def _adopt_index(
        self, index: VamanaIndex, ext: np.ndarray, deleted: np.ndarray | None
    ) -> None:
        """Install `index` (exact-size arrays) padded to the capacity
        bucket; `ext`/`deleted` are its per-row external ids / tombstone
        mask (deleted None = all live)."""
        n = int(index.adjacency.shape[0])
        cap = _round_up(n + self.capacity + self._reserve, _BUCKET)
        pad = cap - n
        dim = int(index.vectors.shape[1])
        r = int(index.adjacency.shape[1])
        vectors = jnp.concatenate(
            [
                jnp.asarray(index.vectors, jnp.float32),
                jnp.full((pad, dim), _PAD_VALUE, jnp.float32),
            ]
        )
        adjacency = jnp.concatenate(
            [index.adjacency, jnp.full((pad, r), INVALID_ID, jnp.int32)]
        )
        self.index = VamanaIndex(
            vectors=vectors, adjacency=adjacency, medoid=index.medoid,
            metric=index.metric, entry_points=index.entry_points,
        )
        self._n_graph = n
        self._graph_ext = jnp.concatenate(
            [
                jnp.asarray(ext, jnp.int32),
                jnp.full((pad,), INVALID_ID, jnp.int32),
            ]
        )
        base_deleted = (
            make_deleted_mask(n) if deleted is None
            else jnp.asarray(deleted, jnp.bool_)
        )
        self._graph_deleted = jnp.concatenate(
            [base_deleted, jnp.ones((pad,), jnp.bool_)]
        )

    @property
    def _graph_capacity(self) -> int:
        return int(self.index.adjacency.shape[0])

    def _ensure_graph_capacity(self, need: int) -> None:
        """Grow the padded region (geometric, bucket-rounded) so `need`
        total rows fit. A growth step changes the jitted shapes — rare by
        construction (>= 1.5x per step)."""
        cap = self._graph_capacity
        if need <= cap:
            return
        new_cap = _round_up(max(need, cap + cap // 2), _BUCKET)
        grow = new_cap - cap
        dim = int(self.index.vectors.shape[1])
        r = int(self.index.adjacency.shape[1])
        self.index = VamanaIndex(
            vectors=jnp.concatenate(
                [
                    self.index.vectors,
                    jnp.full((grow, dim), _PAD_VALUE, jnp.float32),
                ]
            ),
            adjacency=jnp.concatenate(
                [
                    self.index.adjacency,
                    jnp.full((grow, r), INVALID_ID, jnp.int32),
                ]
            ),
            medoid=self.index.medoid,
            metric=self.index.metric,
            entry_points=self.index.entry_points,
        )
        self._graph_ext = jnp.concatenate(
            [self._graph_ext, jnp.full((grow,), INVALID_ID, jnp.int32)]
        )
        self._graph_deleted = jnp.concatenate(
            [self._graph_deleted, jnp.ones((grow,), jnp.bool_)]
        )

    def reserve(self, n_inserts: int) -> None:
        """Pre-grow the padded region for `n_inserts` upcoming inserts:
        one reallocation + one set of shape compiles now (warmable),
        instead of a growth event mid-serving."""
        self._reserve = max(self._reserve, int(n_inserts))
        self._ensure_graph_capacity(
            self._n_graph + self.capacity + int(n_inserts)
        )

    # --- sizes -------------------------------------------------------------
    @property
    def n_graph(self) -> int:
        """Graph rows in use (live + tombstoned; excludes capacity pad)."""
        return self._n_graph

    @property
    def n_buffered(self) -> int:
        return self._count

    @property
    def n_total_live(self) -> int:
        return self._n_graph + self._count - self._n_deleted

    # --- mutation ------------------------------------------------------------
    def insert(self, vectors: np.ndarray | jax.Array) -> np.ndarray:
        """Insert a batch; returns the external ids assigned.

        Appends are one dispatch per batch. When a batch would overflow
        the buffer, the buffer is merged into the graph first (bulk
        insert wave or rebuild — see `merge`)."""
        v = jnp.asarray(vectors, self.index.vectors.dtype)
        if v.ndim == 1:
            v = v[None, :]
        m = int(v.shape[0])
        if m > self.capacity:
            # oversized batch: fold straight into the graph
            ids = np.arange(self._next_ext, self._next_ext + m, dtype=np.int32)
            self._merge_vectors(
                v, jnp.asarray(ids), np.zeros((m,), np.bool_)
            )
            self._next_ext += m
            return ids
        if self._count + m > self.capacity:
            self.merge()
        ids = np.arange(self._next_ext, self._next_ext + m, dtype=np.int32)
        self._buf = _append(self._buf, jnp.int32(self._count), v)
        self._buf_ext = jax.lax.dynamic_update_slice(
            self._buf_ext, jnp.asarray(ids), (self._count,)
        )
        self._buf_live = jax.lax.dynamic_update_slice(
            self._buf_live, jnp.ones((m,), jnp.bool_), (self._count,)
        )
        for j, e in enumerate(ids):
            self._buf_ext_host[int(e)] = self._count + j
        self._count += m
        self._next_ext += m
        return ids

    def delete(self, external_ids) -> int:
        """Tombstone by external id (either tier). Idempotent: re-deleting
        an already-tombstoned id is a no-op (it must not double-count into
        the live total); an id that never existed raises KeyError BEFORE
        any state mutates (all ids are resolved first, so a failed batch
        is a full no-op — a partially applied batch would leave ids in
        `_deleted_ext` with no device tombstone, permanently un-deletable
        through the idempotency skip). Returns the count of NEWLY
        tombstoned ids (idempotent re-deletes excluded)."""
        ext = np.atleast_1d(np.asarray(external_ids, np.int64))
        graph_rows = []
        buf_slots = []
        ext_host = np.asarray(self._graph_ext[: self._n_graph])
        # graph rows: external ids below the graph's watermark are its
        # rows only if still mapped there (post-merge they always are)
        ext_to_row = None
        # pass 1: resolve every id (raising on unknowns) without mutating
        resolved: list[tuple[int, int | None, int | None]] = []
        for e in ext:
            e = int(e)
            slot = self._buf_ext_host.get(e)
            row = None
            if slot is None:
                if ext_to_row is None:
                    ext_to_row = {int(x): i for i, x in enumerate(ext_host)}
                row = ext_to_row.get(e)
                if row is None:
                    raise KeyError(f"unknown external id {e}")
            resolved.append((e, slot, row))
        # pass 2: apply (nothing below raises)
        n_new = 0
        for e, slot, row in resolved:
            if e in self._deleted_ext:
                continue
            self._deleted_ext.add(e)
            n_new += 1
            if slot is not None:
                buf_slots.append(slot)
            else:
                graph_rows.append(row)
        if graph_rows:
            self._graph_deleted = delete_points(
                self._graph_deleted, np.asarray(graph_rows, np.int32)
            )
        if buf_slots:
            sl = jnp.asarray(buf_slots, jnp.int32)
            self._buf_live = self._buf_live.at[sl].set(False)
        self._n_deleted += n_new
        return n_new

    # --- merge ---------------------------------------------------------------
    def merge(self) -> None:
        """Fold the buffer into the graph in bulk.

        Folds EVERY populated slot — tombstoned buffered rows become
        graph tombstones — so a merge of a full buffer always has the
        same shape and reuses its wave compile (static-shape rule in the
        module docstring). `consolidate()` reclaims the tombstones."""
        if self._count == 0:
            return
        vecs = self._buf[: self._count]
        exts = self._buf_ext[: self._count]
        dead = ~np.asarray(self._buf_live[: self._count])
        self._merge_vectors(vecs, exts, dead)
        self._buf_live = jnp.zeros_like(self._buf_live)
        self._buf_ext = jnp.full_like(self._buf_ext, INVALID_ID)
        self._count = 0
        self._buf_ext_host.clear()
        self.n_merges += 1

    def _merge_vectors(
        self, vecs: jax.Array, exts: jax.Array, dead: np.ndarray
    ) -> None:
        m = int(vecs.shape[0])
        if m == 0:
            return
        n0 = self._n_graph
        n_live = n0 - int(np.asarray(self._graph_deleted[:n0]).sum()) if (
            self._n_deleted
        ) else n0
        if m <= self.merge_insert_max_fraction * max(n_live, 1):
            self._ensure_graph_capacity(n0 + m)
            r = int(self.index.adjacency.shape[1])
            # new rows start with random links into the existing graph so
            # reverse edges can reach them even before their wave runs
            key = jax.random.key(n0)
            rand = jax.random.randint(key, (m, r), 0, n0, jnp.int32)
            vectors, adjacency = _place_rows(
                self.index.vectors, self.index.adjacency,
                jnp.int32(n0), jnp.asarray(vecs, jnp.float32), rand,
            )
            # the wave runs in fixed-size sub-waves: the prune
            # intermediates are [W, C, C] + [W, C, D] — multi-GB at
            # W = 16k+ (measured on chip 2026-08-19: one 32k wave ran
            # 3.2x slower than two 16k waves' worth of 4k sub-waves) —
            # and a fixed sub-wave shape means every merge after the
            # first reuses the compile regardless of buffer capacity
            wc = self._wave_chunk
            if self.merge_method == "knn":
                adjacency = self._knn_merge_waves(
                    vectors, adjacency, n0, m, wc
                )
            else:
                for lo in range(0, m, wc):
                    mm = min(wc, m - lo)
                    wave_ids = jnp.arange(
                        n0 + lo, n0 + lo + mm, dtype=jnp.int32
                    )
                    adjacency = wave_step(
                        vectors, adjacency, self.index.medoid, wave_ids,
                        jnp.asarray(self.alpha, jnp.float32),
                        build_width=self.build_width,
                        max_incoming=min(16, r),
                        chunk=min(8192, mm * r),
                        metric=self.metric,
                    )
            self.index = VamanaIndex(
                vectors=vectors, adjacency=adjacency,
                medoid=self.index.medoid, metric=self.metric,
                entry_points=self.index.entry_points,
            )
            self._graph_ext = jax.lax.dynamic_update_slice(
                self._graph_ext, jnp.asarray(exts, jnp.int32), (n0,)
            )
            self._graph_deleted = jax.lax.dynamic_update_slice(
                self._graph_deleted, jnp.asarray(dead), (n0,)
            )
            self._n_graph = n0 + m
        else:
            from diskrag_tpu.graph.knn_build import build_vamana_knn

            # rebuild drops every tombstone (graph + dead buffered) for
            # free; only live rows carry over
            keep = ~np.asarray(self._graph_deleted[:n0])
            gone = np.asarray(self._graph_ext[:n0])[~keep]
            live_new = ~np.asarray(dead)
            gone_new = np.asarray(exts)[np.asarray(dead)]
            self._deleted_ext.difference_update(int(e) for e in gone)
            self._deleted_ext.difference_update(int(e) for e in gone_new)
            self._n_deleted -= len(gone) + len(gone_new)
            if len(gone) or len(gone_new):
                # dropping rows shifts every later row: external ids are
                # no longer positional (see rows_compacted in __init__)
                self.rows_compacted = True
            old_vecs = self.index.vectors[:n0][jnp.asarray(keep)]
            old_ext = self._graph_ext[:n0][jnp.asarray(keep)]
            all_vecs = jnp.concatenate(
                [old_vecs, jnp.asarray(vecs)[jnp.asarray(live_new)]]
            )
            all_ext = np.concatenate(
                [np.asarray(old_ext), np.asarray(exts)[live_new]]
            )
            new_index = build_vamana_knn(
                all_vecs, degree_bound=self.degree_bound,
                alpha=self.alpha, seed=self.seed, metric=self.metric,
            )
            self._adopt_index(new_index, all_ext, None)

    def _knn_merge_waves(self, vectors, adjacency, n0, m, wc):
        """Exact-kNN bulk insert: the MXU-native merge.

        The wave path's candidate acquisition is a graph beam search —
        ~30 sequential frontier rounds per sub-wave, each a scattered
        row-gather at HBM *latency* (CLAUDE.md platform model). Here
        candidates come from ONE fused int8 flat scan per sub-wave over
        the padded database (`ops/flat_scan_pallas`, the same kernel the
        flat serving tier uses) — exact top-C, no traversal, MXU-bound —
        mirroring what `graph/knn_build.py` does for full builds.

        Because the scan sees every *placed* row directly, sub-waves
        don't need reverse edges for reachability (the beam-searched
        path does), so forward rows are written for ALL sub-waves first
        and reverse-edge repair runs once per 16k-row slice at the end —
        each affected target is repaired once per slice instead of once
        per sub-wave. Tombstoned rows still participate as candidates
        (they do in the wave path too); `consolidate()` clears them.
        """
        r = int(adjacency.shape[1])
        knn_k = max(64, (4 * r) // 3)
        alpha = jnp.asarray(self.alpha, jnp.float32)
        metric = self.metric
        n_used = jnp.int32(n0 + m)
        on_cpu = jax.default_backend() == "cpu"
        norms = jnp.sum(jnp.square(vectors), axis=-1)
        # Under cosine the capacity pads (constant 1e15 rows) normalize
        # to ONE unit all-ones direction: tens of thousands of identical
        # scan rows that can crowd the candidate slots of any query
        # correlated with that direction (they're masked only after the
        # top-(knn_k+1) cut in _knn_forward_rows). Push them to the worst
        # cosine score at SCAN level: zero codes (fused path) / +inf norm
        # (XLA path) -> similarity 0 -> distance 1.0, behind every
        # positively-correlated real candidate. L2 needs nothing: pads
        # are ~1e30 away.
        cos = metric == Metric.COSINE.value
        pad_rows = (
            jnp.arange(vectors.shape[0], dtype=jnp.int32) >= n_used
            if cos else None
        )
        if on_cpu:
            # the XLA scan normalizes internally for cosine (raw db +
            # norms), mirroring knn_build.exact_knn's backend split
            from diskrag_tpu.ops.flat import flat_search

            db_bf16 = vectors.astype(jnp.bfloat16)
            if cos:
                norms = jnp.where(pad_rows, jnp.inf, norms)
        else:
            from diskrag_tpu.ops.flat_scan_pallas import (
                flat_search_fused,
                quantize_int8,
            )

            # the fused int8 scan expects a pre-normalized db for cosine
            # (knn_build.exact_knn:94-98 does the same)
            if cos:
                inv = jax.lax.rsqrt(
                    jnp.sum(jnp.square(vectors), axis=-1, keepdims=True)
                    + 1e-12
                )
                vec_scan, scan_scales = quantize_int8(vectors * inv)
                vec_scan = jnp.where(pad_rows[:, None], 0, vec_scan)
                scan_scales = jnp.where(pad_rows, 0.0, scan_scales)
            else:
                vec_scan, scan_scales = quantize_int8(vectors)
        pruned_slices = []
        for lo in range(0, m, wc):
            mm = min(wc, m - lo)
            wave_ids = jnp.arange(n0 + lo, n0 + lo + mm, dtype=jnp.int32)
            q = vectors[n0 + lo : n0 + lo + mm]
            if on_cpu:
                d, ids = flat_search(
                    q, db_bf16, norms, vectors, k=knn_k + 1, metric=metric,
                    chunk=min(65_536, int(vectors.shape[0])), rerank_mult=2,
                )
            else:
                d, ids = flat_search_fused(
                    q, vec_scan, norms, vectors, k=knn_k + 1, metric=metric,
                    rerank_mult=4, n_buckets=4096, db_tile=4096,
                    query_block=128, db_scales=scan_scales,
                )
            adjacency, pruned = _knn_forward_rows(
                vectors, adjacency, wave_ids, ids, d, n_used, alpha,
                metric=metric,
                **({} if on_cpu else
                   {"codes": vec_scan, "code_scales": scan_scales}),
            )
            pruned_slices.append(pruned)
        pruned_all = (
            jnp.concatenate(pruned_slices)
            if len(pruned_slices) > 1 else pruned_slices[0]
        )
        # reverse repair in bounded slices: the grouping argsort is over
        # rows*R elements — 32k rows x R=48 = 1.57M, well under the
        # platform's ~10M-element sort/scan cliff (CLAUDE.md). One 32k
        # slice per default-capacity merge: measured 36 us/row vs
        # 53 us/row at 16k slices (clean-drain sweep 2026-08-20 — the
        # grouping prologue amortizes over more rows)
        rev_rows = 32_768
        rev_kwargs = (
            {} if on_cpu else
            {"codes": vec_scan, "code_scales": scan_scales}
        )
        for lo in range(0, m, rev_rows):
            mm = min(rev_rows, m - lo)
            wave_ids = jnp.arange(n0 + lo, n0 + lo + mm, dtype=jnp.int32)
            adjacency = _reverse_pass(
                vectors, adjacency, wave_ids,
                jax.lax.dynamic_slice_in_dim(pruned_all, lo, mm),
                alpha, max_incoming=min(16, r),
                chunk=min(8192, mm * r), metric=metric, **rev_kwargs,
            )
        return adjacency

    def consolidate(self) -> None:
        """Compact graph tombstones (graph/dynamic.py `consolidate`)."""
        self.merge()
        n0 = self._n_graph
        deleted_real = np.asarray(self._graph_deleted[:n0])
        if not bool(deleted_real.any()):
            return
        n_del = int(deleted_real.sum())
        # compact over the in-use rows only (the capacity pad would count
        # as deleted rows and inflate the consolidation)
        used = VamanaIndex(
            vectors=self.index.vectors[:n0],
            adjacency=self.index.adjacency[:n0],
            medoid=self.index.medoid, metric=self.metric,
            entry_points=self.index.entry_points,
        )
        new_index, old_to_new = consolidate(
            used, jnp.asarray(deleted_real),
            build_width=self.build_width, alpha=self.alpha,
            refine_fraction=0.1, seed=self.seed,
        )
        keep = old_to_new >= 0
        ext0 = np.asarray(self._graph_ext[:n0])
        gone = ext0[~np.asarray(keep)]
        self._deleted_ext.difference_update(int(e) for e in gone)
        self._adopt_index(new_index, ext0[np.asarray(keep)], None)
        self._n_deleted -= n_del
        self.rows_compacted = True

    # --- search ----------------------------------------------------------------
    def search(
        self,
        queries: np.ndarray | jax.Array,
        *,
        k: int = 10,
        search_width: int = 32,
        expand_width: int = 8,
    ):
        """Merged search over graph + buffer. Returns (ids, dists) in
        EXTERNAL ids; dists are squared L2 (API edges sqrt, engine.py
        convention)."""
        q = jnp.asarray(queries, self.index.vectors.dtype)
        squeeze = q.ndim == 1
        if squeeze:
            q = q[None, :]
        ids, dists = _search_merged(
            self.index.vectors, self.index.adjacency, self.index.medoid,
            self.index.entry_points, self._graph_ext, self._graph_deleted,
            self._buf, self._buf_ext, self._buf_live,
            jnp.int32(self._count), q,
            search_width=search_width, k=k, expand_width=expand_width,
            metric=self.metric,
        )
        if squeeze:
            return ids[0], dists[0]
        return ids, dists
