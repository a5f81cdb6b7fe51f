"""Wave-batched Vamana graph construction.

The reference builds sequentially: for each point (in random order), greedy
search from the medoid, RobustPrune the visited set, insert reverse edges
with re-prune on overflow — twice, with alpha=1.0 then the user's alpha
(reference pydiskann/cython_utils.pyx:269-369, vamana_graph.py:464-533).
That loop is inherently serial and scalar.

TPU-native design: points are inserted in *waves* of W at a time. Each wave
runs the batched beam search against the pre-wave graph, a vectorized
RobustPrune over the whole wave, a scatter of the new out-edges, and a
segment-grouped reverse-edge fixup (union + conditional re-prune for
overflowing nodes). Because the graph is initialized random-R-regular over
all points up front — as the reference does
(cython_utils.pyx:182-208) — every wave sees a fully-connected graph, and
two refinement passes converge to Vamana-quality graphs. Wave batching
changes the exact edge set versus sequential insertion; the acceptance
criterion is recall parity at equal R/L/alpha (SURVEY.md §7 "hard parts").
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.graph.prune import robust_prune_batch
from diskrag_tpu.graph.search import _gathered_distance, beam_search
from diskrag_tpu.graph.types import VamanaIndex
from diskrag_tpu.ops.distance import Metric
from diskrag_tpu.ops.medoid import approximate_medoid
from diskrag_tpu.ops.topk import INVALID_ID, mask_duplicates, sort_topk_unique

logger = logging.getLogger(__name__)

INF = jnp.inf


@functools.partial(jax.jit, static_argnames=("n", "degree_bound"))
def random_regular_init(key: jax.Array, n: int, degree_bound: int) -> jax.Array:
    """Random initial adjacency, no self-loops (duplicates possible but rare;
    adjacency has set semantics downstream). Replaces the reference's
    mt19937 loop (reference cython_utils.pyx:182-208)."""
    n = int(n)
    u = jax.random.randint(key, (n, degree_bound), 0, max(n - 1, 1), jnp.int32)
    ids = jnp.arange(n, dtype=jnp.int32)[:, None]
    return (ids + 1 + u) % n


def _reverse_edges(
    vectors: jax.Array,
    adjacency: jax.Array,
    wave_ids: jax.Array,
    pruned: jax.Array,
    alpha: jax.Array,
    *,
    max_incoming: int,
    chunk: int,
    metric: str,
    codes: jax.Array | None = None,
    code_scales: jax.Array | None = None,
) -> jax.Array:
    """Insert reverse edges wave -> graph with conditional re-prune.

    For every new edge (p -> t) in `pruned`, t gains candidate in-neighbor
    p. Edges are grouped by target with a sort + segment ranking; each
    target keeps at most `max_incoming` new in-edges per wave (the rest are
    dropped — hub targets will pick those points up in later passes). If
    old-union-new exceeds the degree bound, the target is RobustPruned,
    otherwise the plain union is written back (matching the reference's
    add-then-prune-on-overflow semantics, cython_utils.pyx:335-353).

    `codes`/`code_scales` ([N, D] int8 + [N] f32, e.g. the fused scan's
    quantized copy): when given, the per-target candidate gathers and all
    prune distances run from the int8 codes instead of f32 rows — the
    candidate-vector gather is this pass's dominant cost (measured
    2026-08-20 at a 1M base: 6.5 s per 16k-row slice, ~22 GB of f32
    row gathers; the alpha rule tolerates int8 rounding).
    """
    n, r = adjacency.shape
    w = wave_ids.shape[0]
    e = w * r
    intmax = jnp.iinfo(jnp.int32).max

    targets = pruned.reshape(-1)
    sources = jnp.repeat(wave_ids, r)
    valid = targets != INVALID_ID
    sort_key = jnp.where(valid, targets, intmax)
    order = jnp.argsort(sort_key)
    t_s = sort_key[order]
    s_s = sources[order]
    v_s = t_s != intmax

    pos = jnp.arange(e, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.array([True]), t_s[1:] != t_s[:-1]]
    ) & v_s
    seg_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # [E]

    # Gather-based grouping: device scatters on this platform run ~100x
    # below bandwidth (a [500k, 48] row scatter measured 2.5 s, a
    # [786k, 16] table scatter 0.49 s — 2026-08-20; CLAUDE.md's ~10M
    # scatter cliff starts far lower than 10M here). The ONE remaining
    # scatter is 1D: segment slot -> first edge position. Everything
    # else (the incoming-source table, the unique-target list, and the
    # final adjacency writeback below) becomes contiguous gathers off
    # the sorted edge array, because a segment's edges are consecutive:
    # inc[s, k] = s_s[start[s] + k].
    start = jnp.full((e,), e, jnp.int32)
    start = start.at[jnp.where(is_first, seg_id, e)].set(pos, mode="drop")
    n_seg = jnp.sum(is_first.astype(jnp.int32))
    slot = jnp.arange(e, dtype=jnp.int32)
    live_slot = slot < n_seg
    start_c = jnp.clip(start, 0, e - 1)
    uniq_t = jnp.where(live_slot, t_s[start_c], INVALID_ID)
    # a slot's edges end where the next live slot's begin; the last
    # live slot ends at the total valid-edge count
    seg_end = jnp.where(
        slot + 1 < n_seg,
        start[jnp.clip(slot + 1, 0, e - 1)],
        jnp.sum(v_s.astype(jnp.int32)),
    )
    k_iota = jnp.arange(max_incoming, dtype=jnp.int32)[None, :]
    take_pos = start_c[:, None] + k_iota  # [E, K]
    in_seg = live_slot[:, None] & (take_pos < seg_end[:, None])
    inc = jnp.where(
        in_seg, s_s[jnp.clip(take_pos, 0, e - 1)], INVALID_ID
    )

    # process targets in chunks: union or re-prune
    pad_e = (-e) % chunk
    uniq_t_p = jnp.pad(uniq_t, (0, pad_e), constant_values=INVALID_ID)
    inc_p = jnp.pad(inc, ((0, pad_e), (0, 0)), constant_values=INVALID_ID)

    def fix_chunk(args):
        t_chunk, inc_chunk = args  # [CH], [CH, K_in]
        ch = t_chunk.shape[0]
        t_safe = jnp.clip(t_chunk, 0, n - 1)
        old = adjacency[t_safe]  # [CH, R]
        cands = jnp.concatenate([old, inc_chunk], axis=1)  # [CH, C2]
        cands = jnp.where(t_chunk[:, None] == INVALID_ID, INVALID_ID, cands)
        c_safe = jnp.clip(cands, 0, n - 1)
        if codes is not None:
            from diskrag_tpu.graph.prune import gathered_distance_int8

            cand_vecs = codes[c_safe]  # [CH, C2, D] int8
            cand_sc = code_scales[c_safe]
            dists = gathered_distance_int8(
                codes[t_safe], code_scales[t_safe], cand_vecs, cand_sc,
                metric,
            )
        else:
            cand_vecs = vectors[c_safe]  # [CH, C2, D]
            cand_sc = None
            t_vecs = vectors[t_safe]
            dists = _gathered_distance(t_vecs, cand_vecs, metric)
        dists = jnp.where(cands == INVALID_ID, INF, dists)
        union_ids, union_dists, _ = sort_topk_unique(cands, dists, r)
        # count distinct candidates without a second full-width
        # sort_topk_unique: the duplicate mask alone gives the tally
        n_unique = jnp.sum(
            jnp.isfinite(mask_duplicates(cands, dists)), axis=1
        )
        overflow = n_unique > r
        pruned_rows = robust_prune_batch(
            t_chunk, cands, cand_vecs, dists, alpha,
            degree_bound=r, metric=metric, cand_scales=cand_sc,
        )
        return jnp.where(overflow[:, None], pruned_rows, union_ids)

    # unique targets are compacted at the front (seg_id is dense), so
    # chunks past ceil(n_seg/chunk) are all-padding: a while_loop skips
    # them (E slots are allocated for the worst case of all-distinct
    # targets, but a clustered wave's edges share targets heavily — at
    # W=4096, R=48 typically <40% of the slots hold a live segment)
    n_chunks = (e + pad_e) // chunk
    t_chunks = uniq_t_p.reshape(n_chunks, chunk)
    inc_chunks = inc_p.reshape(n_chunks, chunk, max_incoming)
    n_seg = jnp.sum(is_first.astype(jnp.int32))
    n_live_chunks = (n_seg + chunk - 1) // chunk

    def live(carry):
        i, _ = carry
        return i < n_live_chunks

    def body(carry):
        i, rows = carry
        out = fix_chunk((t_chunks[i], inc_chunks[i]))
        rows = jax.lax.dynamic_update_slice(rows, out[None], (i, 0, 0))
        return i + 1, rows

    rows0 = jnp.zeros((n_chunks, chunk, r), jnp.int32)
    _, new_rows = jax.lax.while_loop(live, body, (jnp.int32(0), rows0))
    new_rows = new_rows.reshape(-1, r)

    # Writeback as gather + select, not a row scatter: map node -> live
    # slot with one 1D scatter, then rebuild the full adjacency with a
    # row gather and a select. A [500k, 48] row scatter measured 2.5 s
    # on this platform; the [N, R] gather+select rides HBM bandwidth
    # (~200 MB at 1M x R=48, tens of ms) and reuses the donated buffer.
    row_slot = jnp.full((n + 1,), -1, jnp.int32)
    row_slot = row_slot.at[
        jnp.where(uniq_t == INVALID_ID, n, uniq_t)
    ].set(slot, mode="drop")
    row_slot = row_slot[:n]
    touched = row_slot >= 0
    gathered = new_rows[jnp.clip(row_slot, 0, new_rows.shape[0] - 1)]
    return jnp.where(touched[:, None], gathered, adjacency)


@functools.partial(
    jax.jit,
    static_argnames=(
        "build_width", "max_incoming", "chunk", "metric", "expand_width"
    ),
    donate_argnames=("adjacency",),
)
def wave_step(
    vectors: jax.Array,
    adjacency: jax.Array,
    medoid: jax.Array,
    wave_ids: jax.Array,
    alpha: jax.Array,
    *,
    build_width: int,
    max_incoming: int,
    chunk: int,
    metric: str,
    expand_width: int = 8,
) -> jax.Array:
    """Insert/refine one wave of points; returns updated adjacency."""
    n, r = adjacency.shape
    queries = vectors[wave_ids]

    res = beam_search(
        vectors, adjacency, medoid, queries,
        search_width=build_width, k=build_width, metric=metric,
        expand_width=expand_width,
    )

    cur_nbrs = adjacency[wave_ids]  # [W, R]
    cur_vecs = vectors[jnp.clip(cur_nbrs, 0, n - 1)]
    cur_dists = jnp.where(
        cur_nbrs == INVALID_ID,
        INF,
        _gathered_distance(queries, cur_vecs, metric),
    )

    pool_ids = jnp.concatenate([res.visited_ids, res.ids, cur_nbrs], axis=1)
    pool_dists = jnp.concatenate([res.visited_dists, res.dists, cur_dists], axis=1)
    # cap the prune pool at the closest `pool_cap` candidates: the O(C^2)
    # pairwise tensor dominates prune cost and far candidates never
    # survive RobustPrune anyway (duplicates are +inf-masked inside
    # robust_prune_batch, so top_k keeps the unique closest).
    pool_cap = min(pool_ids.shape[1], max(2 * build_width, 4 * r))
    masked = mask_duplicates(pool_ids, pool_dists)
    neg, take = jax.lax.top_k(-masked, pool_cap)
    pool_ids = jnp.take_along_axis(pool_ids, take, axis=1)
    pool_dists = -neg
    pool_vecs = vectors[jnp.clip(pool_ids, 0, n - 1)]

    pruned = robust_prune_batch(
        wave_ids, pool_ids, pool_vecs, pool_dists, alpha,
        degree_bound=r, metric=metric,
    )
    adjacency = adjacency.at[wave_ids].set(pruned)
    return _reverse_edges(
        vectors, adjacency, wave_ids, pruned, alpha,
        max_incoming=max_incoming, chunk=chunk, metric=metric,
    )


def build_vamana(
    vectors: np.ndarray | jax.Array,
    *,
    degree_bound: int = 32,
    build_width: int = 64,
    alpha: float = 1.2,
    metric: str = Metric.L2.value,
    n_passes: int = 2,
    wave_size: int | None = None,
    max_incoming: int | None = None,
    expand_width: int = 8,
    seed: int = 0,
    progress: bool = False,
) -> VamanaIndex:
    """Build a Vamana index (2-pass by default: alpha=1.0 then `alpha`,
    mirroring the reference's pass schedule, cython_utils.pyx:296-310).

    Args mirror the reference's `build_vamana(points, R, L, alpha)`
    (reference pydiskann/vamana_graph.py:686): degree_bound=R,
    build_width=L.
    """
    vectors = jnp.asarray(vectors, jnp.float32)
    n = vectors.shape[0]
    if n < 2:
        raise ValueError("need at least 2 points")
    degree_bound = min(degree_bound, n - 1)
    if wave_size is None:
        wave_size = int(min(2048, max(32, n // 8)))
    wave_size = min(wave_size, n)
    if max_incoming is None:
        max_incoming = min(16, degree_bound)
    chunk = min(16384, wave_size * degree_bound)

    key = jax.random.key(seed)
    k_init, k_med, k_perm = jax.random.split(key, 3)
    adjacency = random_regular_init(k_init, n, degree_bound)
    medoid = approximate_medoid(vectors, k_med, metric=metric)

    alphas = [1.0] * (n_passes - 1) + [float(alpha)]
    t0 = time.perf_counter()
    for pass_idx, a in enumerate(alphas):
        k_perm, k_this = jax.random.split(k_perm)
        perm = jax.random.permutation(k_this, n)
        pad = (-n) % wave_size
        if pad:
            perm = jnp.concatenate([perm, perm[:pad]])
        waves = np.asarray(perm).reshape(-1, wave_size)
        for i, wave in enumerate(waves):
            adjacency = wave_step(
                vectors, adjacency, medoid, jnp.asarray(wave),
                jnp.asarray(a, jnp.float32),
                build_width=build_width, max_incoming=max_incoming,
                chunk=chunk, metric=Metric(metric).value,
                expand_width=expand_width,
            )
            if progress and (i + 1) % 16 == 0:
                logger.info(
                    "pass %d/%d wave %d/%d (%.1fs)",
                    pass_idx + 1, len(alphas), i + 1, len(waves),
                    time.perf_counter() - t0,
                )
    # drain via a host fetch: on the remote-tunneled TPU platform
    # block_until_ready can return early; a scalar fetch is an actual
    # barrier (programs complete in dispatch order).
    np.asarray(adjacency[0, 0])
    if progress:
        logger.info("build done in %.1fs", time.perf_counter() - t0)
    return VamanaIndex(
        vectors=vectors,
        adjacency=adjacency,
        medoid=medoid,
        metric=Metric(metric).value,
    )
