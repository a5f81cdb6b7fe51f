"""Batched greedy/beam graph search as a fixed-width masked frontier loop.

Behavioral model (reference, NOT ported): best-first search holding a
size-L candidate list; repeatedly expand the closest unexpanded candidate,
insert its neighbors, stop when every candidate in the top-L has been
expanded (reference pydiskann/vamana_graph.py:535-640,
cython_utils.pyx:72-122, search_engine.py:398-506 which caps steps at
min(10*L, N)).

TPU-native formulation: the candidate list is a sorted fixed-width array
(ids/dists/expanded flags); each `lax.while_loop` step does, for a whole
batch of queries at once:
  argmin over unexpanded -> gather adjacency rows -> gather neighbor
  vectors -> fused matmul distance -> duplicate masking -> top-L merge.
All shapes static; per-query early exit is expressed as masking and the
loop exits when every query has converged or `max_steps` is hit.

The visited (= expanded) log doubles as the candidate pool for Vamana's
RobustPrune during index build (reference vamana_graph.py:476-487 uses the
greedy-search visited set the same way).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp

from diskrag_tpu.ops.distance import Metric, squared_norms
from diskrag_tpu.ops.topk import INVALID_ID, mask_duplicates

INF = jnp.inf


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SearchResult:
    """Batched search output.

    ids/dists: [B, k] nearest candidates found (ascending; squared L2 for
    the L2 metric — callers take sqrt at the API edge, matching the
    reference which returns sqrt distances from beam search,
    reference vamana_graph.py:596).
    visited_ids/visited_dists: [B, max_steps] log of expanded nodes
    (-1 / +inf padded) — the RobustPrune candidate pool during build.
    n_expanded: [B] number of nodes expanded per query.
    n_steps: [] loop iterations actually executed (same for all queries).
    """

    ids: jax.Array
    dists: jax.Array
    visited_ids: jax.Array
    visited_dists: jax.Array
    n_expanded: jax.Array
    n_steps: jax.Array


def _gathered_distance(
    queries: jax.Array, nbr_vecs: jax.Array, metric: str
) -> jax.Array:
    """Distance from queries [B, D] to per-query gathered vectors [B, R, D].

    Accepts bf16 `nbr_vecs` (the low-bandwidth traversal path): queries
    are cast to match and the contraction accumulates in f32.
    """
    m = Metric(metric)
    queries = queries.astype(nbr_vecs.dtype)
    if m == Metric.L2:
        qn = squared_norms(queries.astype(jnp.float32))[:, None]
        vn = squared_norms(nbr_vecs.astype(jnp.float32))
        qv = jnp.einsum(
            "bd,brd->br", queries, nbr_vecs,
            preferred_element_type=jnp.float32,
        )
        return jnp.maximum(qn + vn - 2.0 * qv, 0.0)
    if m == Metric.COSINE:
        qf = queries.astype(jnp.float32)
        qh = queries * jax.lax.rsqrt(squared_norms(qf) + 1e-12)[:, None].astype(
            nbr_vecs.dtype
        )
        vf = nbr_vecs.astype(jnp.float32)
        vh = nbr_vecs * jax.lax.rsqrt(squared_norms(vf) + 1e-12)[..., None].astype(
            nbr_vecs.dtype
        )
        return 1.0 - jnp.einsum(
            "bd,brd->br", qh, vh, preferred_element_type=jnp.float32
        )
    return -jnp.einsum(
        "bd,brd->br", queries, nbr_vecs, preferred_element_type=jnp.float32
    )


def exact_rerank(
    vectors: jax.Array,
    queries: jax.Array,
    res: "SearchResult",
    k: int,
    metric: str = Metric.L2.value,
) -> "SearchResult":
    """Rerank beam ∪ visited with full-precision distances and return the
    exact top-k. Used after bf16 or PQ/ADC traversal."""
    n = vectors.shape[0]
    pool_ids = jnp.concatenate([res.ids, res.visited_ids], axis=1)
    exact = _gathered_distance(
        queries, vectors[jnp.clip(pool_ids, 0, n - 1)], metric
    )
    exact = mask_duplicates(
        pool_ids, jnp.where(pool_ids == INVALID_ID, INF, exact)
    )
    top_d, take = jax.lax.top_k(-exact, k)
    top_i = jnp.take_along_axis(pool_ids, take, axis=1)
    top_i = jnp.where(jnp.isinf(-top_d), INVALID_ID, top_i)
    return SearchResult(
        ids=top_i, dists=-top_d,
        visited_ids=res.visited_ids, visited_dists=res.visited_dists,
        n_expanded=res.n_expanded, n_steps=res.n_steps,
    )


def _frontier_search(
    adjacency: jax.Array,
    medoid: jax.Array,
    expand_fn,
    batch: int,
    *,
    search_width: int,
    k: int,
    max_steps: int,
    expand_width: int = 1,
    entry_points: jax.Array | None = None,
    seed_expand_fn=None,
) -> SearchResult:
    """Shared best-first loop. `expand_fn(ids [B, C] clipped-safe) -> dists
    [B, C]` supplies the distance backend (exact gather-matmul or PQ/ADC).
    `seed_expand_fn(seeds [S]) -> [B, S]` optionally supplies a cheaper
    backend for the initial seeds: they are SHARED across the batch, so
    one [S] gather + dense [B, S] distance beats expand_fn's per-query
    row gathers (B*S scattered reads) by orders of magnitude once S is
    in the thousands.

    `expand_width` (E) expands the E closest unexpanded candidates per
    round instead of 1 — the frontier becomes a true beam. Total expansion
    budget stays ~the same (max_steps rounds of E), but E x fewer
    sequential rounds: the dominant latency win on TPU, where each round
    costs a fixed pipeline of gather/merge kernels regardless of E.

    `entry_points` (int32[S], optional) seeds the candidate list with S
    extra start nodes besides the medoid. The reference always starts at
    the single medoid (vamana_graph.py:557); multi-seeding costs one
    [B, S] batched distance matmul (nothing on the MXU) and makes graphs
    whose long-range edges are sparse/unstructured — e.g. the kNN-based
    fast build — navigable on strongly clustered data.
    """
    b = batch
    n, r = adjacency.shape
    e = expand_width
    medoid = jnp.asarray(medoid, jnp.int32)
    visited_cap = max_steps * e

    # --- initial candidate list: medoid (+ optional entry points) --------
    if entry_points is None:
        seeds = medoid[None]
    else:
        seeds = jnp.concatenate(
            [medoid[None], jnp.asarray(entry_points, jnp.int32)]
        )
    s = seeds.shape[0]
    seeds_b = jnp.broadcast_to(seeds[None, :], (b, s))
    if seed_expand_fn is not None:
        d0 = seed_expand_fn(seeds)  # [B, S]
    else:
        d0 = expand_fn(seeds_b)  # [B, S]
    if s > 1:
        # entry_points must be unique (build guarantees it); only the
        # medoid can repeat — mask those copies. O(S), not an O(S^2) dedup.
        dup_med = (seeds == medoid) & (jnp.arange(s) > 0)
        d0 = jnp.where(dup_med[None, :], INF, d0)
    # `zero_*` derive from d0 so the initial carry inherits d0's varying
    # mesh axes under shard_map (constants would be axis-invariant and
    # fail the while_loop carry type check).
    zero_f = d0[:, :1] * 0.0  # [B, 1]
    zero_i = zero_f.astype(jnp.int32)
    if s >= search_width:
        neg, take = jax.lax.top_k(-d0, search_width)
        cand_dists = -neg
        cand_ids = jnp.take_along_axis(seeds_b, take, axis=1)
        cand_ids = jnp.where(jnp.isinf(cand_dists), INVALID_ID, cand_ids)
    else:
        pad = search_width - s
        cand_ids = jnp.concatenate(
            [
                jnp.where(jnp.isinf(d0), INVALID_ID, seeds_b),
                jnp.full((b, pad), INVALID_ID, jnp.int32) + zero_i,
            ],
            axis=1,
        )
        cand_dists = jnp.concatenate(
            [d0, jnp.full((b, pad), INF, jnp.float32) + zero_f], axis=1
        )
    expanded = (cand_ids == INVALID_ID) | (zero_i != 0)

    visited_ids = jnp.full((b, visited_cap), INVALID_ID, jnp.int32) + zero_i
    visited_dists = jnp.full((b, visited_cap), INF, jnp.float32) + zero_f
    n_expanded = jnp.zeros((b,), jnp.int32) + zero_i[:, 0]

    def cond(state):
        step, cand_ids, cand_dists, expanded, *_ = state
        frontier = jnp.where(expanded | (cand_ids == INVALID_ID), INF, cand_dists)
        any_active = jnp.any(jnp.min(frontier, axis=1) < INF)
        return (step < max_steps) & any_active

    def body(state):
        (step, cand_ids, cand_dists, expanded, visited_ids, visited_dists,
         n_expanded) = state

        frontier = jnp.where(expanded | (cand_ids == INVALID_ID), INF, cand_dists)
        # E closest unexpanded candidates this round
        sel_dists, sel_slots = jax.lax.top_k(-frontier, e)  # [B, E]
        sel_dists = -sel_dists
        active = sel_dists < INF  # [B, E]

        cur_ids = jnp.take_along_axis(cand_ids, sel_slots, axis=1)  # [B, E]
        cur_ids_safe = jnp.where(active, cur_ids, 0)

        # mark the selected slots expanded (only where active)
        slot_iota = jax.lax.broadcasted_iota(
            jnp.int32, (b, cand_ids.shape[1]), 1
        )
        hit = jnp.any(
            (slot_iota[:, None, :] == sel_slots[:, :, None]) & active[:, :, None],
            axis=1,
        )
        expanded = expanded | hit

        # log visited (E entries per round)
        visited_ids = jax.lax.dynamic_update_slice_in_dim(
            visited_ids, jnp.where(active, cur_ids, INVALID_ID), step * e, axis=1,
        )
        visited_dists = jax.lax.dynamic_update_slice_in_dim(
            visited_dists, jnp.where(active, sel_dists, INF), step * e, axis=1,
        )
        n_expanded = n_expanded + jnp.sum(active, axis=1, dtype=jnp.int32)

        # expand: gather neighbor ids [B, E, R] -> [B, E*R]
        nbrs = adjacency[cur_ids_safe].reshape(b, e * r)
        valid = (nbrs != INVALID_ID) & jnp.repeat(active, r, axis=1)
        nbr_dists = expand_fn(jnp.clip(nbrs, 0, n - 1))
        nbr_dists = jnp.where(valid, nbr_dists, INF)

        # mask beam-resident duplicates BEFORE the width cut: expanded
        # nodes share neighborhoods, so many of the E*R neighbors are
        # already on the candidate list — each one kept past the cut
        # would waste an insertion slot and silently drop a genuinely
        # new candidate ranked just below it. (The [B, E*R, L] compare
        # is cheap; the visited-log compare is deferred past the cut
        # because the log is much wider.)
        on_beam = jnp.any(nbrs[:, :, None] == cand_ids[:, None, :], axis=2)
        nbr_dists = jnp.where(on_beam, INF, nbr_dists)

        # two-stage merge: cut the E*R fresh candidates down to the L'
        # best — at most L' can enter the list — which shrinks the
        # remaining dedup compares/sort from E*R wide to L' wide.
        l_new = min(search_width, e * r)
        neg_new, new_take = jax.lax.top_k(-nbr_dists, l_new)
        sel_new_dists = -neg_new
        sel_new_ids = jnp.take_along_axis(nbrs, new_take, axis=1)

        # dedup the selected few against: the visited log (ids that were
        # on the beam once and got displaced) and themselves (duplicate
        # neighbor from two parents in the same round)
        in_vis = jnp.any(
            sel_new_ids[:, :, None] == visited_ids[:, None, :], axis=2
        )
        eq = sel_new_ids[:, :, None] == sel_new_ids[:, None, :]
        lower = (
            jax.lax.broadcasted_iota(jnp.int32, (l_new, l_new), 0)
            > jax.lax.broadcasted_iota(jnp.int32, (l_new, l_new), 1)
        )
        dup = jnp.any(eq & lower, axis=2)
        drop = in_vis | dup | jnp.isinf(sel_new_dists)
        sel_new_dists = jnp.where(drop, INF, sel_new_dists)
        sel_new_ids = jnp.where(drop, INVALID_ID, sel_new_ids)

        # final merge: [L + L'] -> top L (both parts unique and disjoint)
        all_ids = jnp.concatenate([cand_ids, sel_new_ids], axis=1)
        all_dists = jnp.concatenate([cand_dists, sel_new_dists], axis=1)
        all_exp = jnp.concatenate(
            [expanded, jnp.zeros((b, l_new), jnp.bool_)], axis=1
        )
        neg_top, take = jax.lax.top_k(-all_dists, search_width)
        new_dists = -neg_top
        new_ids = jnp.take_along_axis(all_ids, take, axis=1)
        new_ids = jnp.where(jnp.isinf(new_dists), INVALID_ID, new_ids)
        new_expanded = jnp.take_along_axis(all_exp, take, axis=1)
        new_expanded = new_expanded | (new_ids == INVALID_ID)

        return (step + 1, new_ids, new_dists, new_expanded, visited_ids,
                visited_dists, n_expanded)

    state = (jnp.asarray(0, jnp.int32), cand_ids, cand_dists, expanded,
             visited_ids, visited_dists, n_expanded)
    (step, cand_ids, cand_dists, expanded, visited_ids, visited_dists,
     n_expanded) = jax.lax.while_loop(cond, body, state)

    return SearchResult(
        ids=cand_ids[:, :k],
        dists=cand_dists[:, :k],
        visited_ids=visited_ids,
        visited_dists=visited_dists,
        n_expanded=n_expanded,
        n_steps=step,
    )


@functools.partial(
    jax.jit,
    static_argnames=("search_width", "k", "max_steps", "metric", "expand_width"),
)
def beam_search(
    vectors: jax.Array,
    adjacency: jax.Array,
    medoid: jax.Array,
    queries: jax.Array,
    *,
    search_width: int,
    k: int,
    max_steps: int | None = None,
    metric: str = Metric.L2.value,
    expand_width: int = 1,
    entry_points: jax.Array | None = None,
) -> SearchResult:
    """Batched best-first graph search with exact distances.

    Args:
      vectors: [N, D] database vectors (HBM resident).
      adjacency: [N, R] int32 neighbor ids, -1 padded.
      medoid: [] int32 entry point.
      queries: [B, D] query batch.
      search_width: candidate-list size L (the reference's `L` /
        `beam_width` knob — larger = better recall, more work).
      k: number of results to return (k <= search_width).
      max_steps: hard bound on expansion rounds; defaults to
        ceil(2 * search_width / expand_width) (the loop usually exits
        earlier on convergence).
      metric: distance metric name.
      expand_width: candidates expanded per round (latency knob; 1 matches
        the reference's strictly best-first order).
    """
    if k > search_width:
        raise ValueError(f"k={k} must be <= search_width={search_width}")
    if max_steps is None:
        max_steps = -(-2 * search_width // expand_width)
    n = vectors.shape[0]

    def expand(ids):
        return _gathered_distance(
            queries, vectors[jnp.clip(ids, 0, n - 1)], metric
        )

    def seed_expand(seeds):
        from diskrag_tpu.ops.distance import pairwise_distance

        seed_vecs = vectors[seeds].astype(jnp.float32)  # one shared gather
        return pairwise_distance(
            queries, seed_vecs, metric
        ).astype(jnp.float32)

    return _frontier_search(
        adjacency, medoid, expand, queries.shape[0],
        search_width=search_width, k=k, max_steps=max_steps,
        expand_width=expand_width, entry_points=entry_points,
        seed_expand_fn=seed_expand,
    )


@functools.partial(
    jax.jit,
    static_argnames=("search_width", "k", "max_steps", "metric", "expand_width"),
)
def beam_search_reranked(
    traversal_vectors: jax.Array,
    rerank_vectors: jax.Array,
    adjacency: jax.Array,
    medoid: jax.Array,
    queries: jax.Array,
    *,
    search_width: int,
    k: int,
    max_steps: int | None = None,
    metric: str = Metric.L2.value,
    expand_width: int = 1,
    entry_points: jax.Array | None = None,
) -> SearchResult:
    """Low-bandwidth traversal + full-precision rerank.

    `traversal_vectors` is typically a bfloat16 copy of the database
    (half the gather bytes in the latency-bound frontier loop);
    `rerank_vectors` the float32 original. The final beam ∪ visited pool
    is reranked exactly, so result *ordering* is float32-exact while the
    traversal enjoys compressed bandwidth. No reference counterpart —
    this is a TPU bandwidth optimization in the spirit of the reference's
    PQ-then-exact hybrid (search_engine.py:381-397).
    """
    res = beam_search(
        traversal_vectors, adjacency, medoid, queries,
        search_width=search_width, k=search_width, max_steps=max_steps,
        metric=metric, expand_width=expand_width, entry_points=entry_points,
    )
    return exact_rerank(rerank_vectors, queries, res, k, metric)


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_width", "k", "max_steps", "rerank", "metric", "expand_width",
        "use_pallas_adc",
    ),
)
def beam_search_pq(
    codes: jax.Array,
    tables: jax.Array,
    adjacency: jax.Array,
    medoid: jax.Array,
    *,
    search_width: int,
    k: int,
    max_steps: int | None = None,
    rerank: bool = True,
    vectors: jax.Array | None = None,
    queries: jax.Array | None = None,
    metric: str = Metric.L2.value,
    expand_width: int = 1,
    use_pallas_adc: bool | None = None,
    entry_points: jax.Array | None = None,
    point_cell: jax.Array | None = None,
    point_bias: jax.Array | None = None,
    cell_tables: jax.Array | None = None,
) -> SearchResult:
    """PQ-accelerated graph search: traversal is guided purely by ADC
    distances looked up from per-query tables; optionally the final
    candidate list is reranked with exact distances.

    This replaces the reference's hybrid per-node exact/PQ policy
    (reference search_engine.py:381-506: exact when list not full / PQ
    beats 0.8x worst / 20%-random within 1.2x) with a deterministic
    ADC-traversal + exact-rerank-of-top-L design — documented deviation,
    better suited to batched TPU execution and at least as accurate for
    equal L (rerank sees every surviving candidate).

    Args:
      codes: uint8/int [N, m] PQ codes (HBM resident — m bytes gathered
        per neighbor instead of 4*D, the whole point of the PQ tier).
      tables: [B, m, 256] per-query ADC tables. For a ResidualPQ pass the
        INNER tables (`rpq.inner_tables(q)`) plus the three aux operands
        below (pq/residual.py "serving decomposition").
      adjacency / medoid: graph.
      rerank: if True, `vectors` [N, D] and `queries` [B, D] must be given;
        the returned ids/dists are exact top-k over the final beam.
      use_pallas_adc: ADC lookup backend; None = auto (the Pallas VMEM
        kernel on TPU — ~12x faster than XLA's per-element gathers — and
        the gather path on CPU).
      point_cell / point_bias / cell_tables: residual-PQ aux — coarse cell
        id int32 [N], per-point bias f32 [N], per-query cell cross terms
        [B, C]. Each candidate then costs two extra scalar gathers; all
        three must be given together.
    """
    from diskrag_tpu.ops.pq_scan import adc_lookup_gathered_pallas
    from diskrag_tpu.pq.product_quantizer import adc_lookup_gathered

    if k > search_width:
        raise ValueError(f"k={k} must be <= search_width={search_width}")
    if max_steps is None:
        max_steps = -(-2 * search_width // expand_width)
    if use_pallas_adc is None:
        use_pallas_adc = jax.default_backend() != "cpu"
    residual = point_cell is not None
    if residual and (point_bias is None or cell_tables is None):
        raise ValueError(
            "point_cell/point_bias/cell_tables must be given together"
        )
    n = adjacency.shape[0]
    b = tables.shape[0]

    def expand(ids):
        safe = jnp.clip(ids, 0, n - 1)
        gathered = codes[safe]
        if use_pallas_adc:
            d = adc_lookup_gathered_pallas(tables, gathered)
        else:
            d = adc_lookup_gathered(tables, gathered)
        if residual:
            d = d + jnp.take_along_axis(
                cell_tables, point_cell[safe], axis=1
            ) + point_bias[safe]
        return d

    def _seed_scores(seeds):
        from diskrag_tpu.pq.product_quantizer import adc_lookup

        d = adc_lookup(tables, codes[seeds])  # one shared code gather
        if residual:
            d = d + cell_tables[:, point_cell[seeds]] + point_bias[seeds][None, :]
        return d

    def seed_expand(seeds):
        # the ADC lookup materializes [B, S, m] f32; at 10M the k-means
        # entry set is S=65k, which with B=1000/m=64 is a 16.8 GB fusion
        # (exceeded the 16 GB chip, 2026-08-21). Chunk over S: each tile
        # is a [B, CH, m] transient, summed down to [B, CH] before the
        # next tile runs (lax.map is sequential).
        s = seeds.shape[0]
        ch = 4096
        if s <= ch:
            return _seed_scores(seeds)
        pad = (-s) % ch
        tiles = jnp.pad(seeds, (0, pad)).reshape(-1, ch)
        d = jax.lax.map(_seed_scores, tiles)  # [T, B, CH]
        return jnp.moveaxis(d, 0, 1).reshape(b, -1)[:, :s]

    res = _frontier_search(
        adjacency, medoid, expand, b,
        search_width=search_width, k=search_width, max_steps=max_steps,
        expand_width=expand_width, entry_points=entry_points,
        seed_expand_fn=seed_expand,
    )
    if not rerank:
        return SearchResult(
            ids=res.ids[:, :k], dists=res.dists[:, :k],
            visited_ids=res.visited_ids, visited_dists=res.visited_dists,
            n_expanded=res.n_expanded, n_steps=res.n_steps,
        )
    if vectors is None or queries is None:
        raise ValueError("rerank=True requires vectors and queries")
    # rerank pool = final beam ∪ visited log: ADC noise evicts true
    # neighbors from the beam, but anything ever expanded is recoverable
    # from the visited log at the cost of one more gather.
    return exact_rerank(vectors, queries, res, k, metric)


@functools.partial(
    jax.jit,
    static_argnames=(
        "search_width", "k", "max_steps", "rerank", "metric", "expand_width",
        "dim", "bits", "n_cells", "onehot_cells",
    ),
)
def beam_search_iq(
    rows: jax.Array,
    tables,
    adjacency: jax.Array,
    medoid: jax.Array,
    *,
    dim: int,
    bits: int,
    n_cells: int,
    search_width: int,
    k: int,
    max_steps: int | None = None,
    rerank: bool = True,
    vectors: jax.Array | None = None,
    queries: jax.Array | None = None,
    metric: str = Metric.L2.value,
    expand_width: int = 1,
    entry_points: jax.Array | None = None,
    onehot_cells: bool = True,
) -> SearchResult:
    """Int-quantized graph search: traversal guided by MXU-scored int8/int4
    rows (pq/intq.py), optional exact rerank of beam ∪ visited.

    The fast-traversal sibling of beam_search_pq: a candidate costs ONE
    int8 row gather + its share of one [B, Cand, D] matmul instead of
    m ADC table lookups — ~10x the round throughput at 2-4x the bytes
    (measured: the Pallas ADC round-lookup is 19 ms where the row
    gather+dot round is ~2 ms at serving shapes). Replaces the
    reference's PQ-accelerated mode (reference search_engine.py:381-506)
    on the speed axis; ResidualPQ remains the max-compression tier.

    Args:
      rows: int8 [N, W] encoded rows (IntQuantizer.encode).
      tables: IQTables from IntQuantizer.query_tables(queries).
      dim / bits / n_cells: quantizer geometry (static).
      onehot_cells: lookup the cell term as a fused compare-select-reduce
        instead of per-element gathers (see pq/intq.py::_cell_term).
    """
    from diskrag_tpu.pq.intq import iq_score_gathered, iq_score_shared

    if k > search_width:
        raise ValueError(f"k={k} must be <= search_width={search_width}")
    if max_steps is None:
        max_steps = -(-2 * search_width // expand_width)
    n = adjacency.shape[0]
    b = tables.qw.shape[0]

    def expand(ids):
        gathered = rows[jnp.clip(ids, 0, n - 1)]
        return iq_score_gathered(
            tables, gathered, dim=dim, bits=bits, n_cells=n_cells,
            onehot_cells=onehot_cells,
        )

    def seed_expand(seeds):
        return iq_score_shared(
            tables, rows[seeds], dim=dim, bits=bits, n_cells=n_cells
        )

    res = _frontier_search(
        adjacency, medoid, expand, b,
        search_width=search_width, k=search_width, max_steps=max_steps,
        expand_width=expand_width, entry_points=entry_points,
        seed_expand_fn=seed_expand,
    )
    if not rerank:
        return SearchResult(
            ids=res.ids[:, :k], dists=res.dists[:, :k],
            visited_ids=res.visited_ids, visited_dists=res.visited_dists,
            n_expanded=res.n_expanded, n_steps=res.n_steps,
        )
    if vectors is None or queries is None:
        raise ValueError("rerank=True requires vectors and queries")
    return exact_rerank(vectors, queries, res, k, metric)
