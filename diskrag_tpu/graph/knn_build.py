"""kNN-graph-based Vamana construction — the MXU-native fast build path.

The reference (and our wave builder, `graph/build.py`) constructs the
graph by *sequential insertion*: each point's candidate pool comes from a
beam search over the partially-built graph (reference
pydiskann/cython_utils.pyx:269-369). On TPU that search is a chain of
data-dependent gather rounds that runs at HBM latency, so even heavily
wave-batched it costs minutes at 200k points.

This module removes the sequential dependency entirely. Observation: the
candidate pool the reference feeds RobustPrune is an *approximation* of
the point's nearest neighbors (the beam search's visited set). On TPU we
can compute the exact top-C neighbors for every point at once with tiled
bf16 matmul scans over the whole database (`ops/flat.py`) — sequential
HBM reads at full bandwidth on the MXU, no traversal at all. The build
becomes three embarrassingly-parallel passes:

  1. exact kNN: top-C neighbors per point via the flat MXU scan;
  2. alpha-prune: vectorized RobustPrune of each point's candidate list
     (top-C plus a few seeded random long-range candidates — these play
     the role of the reference's random-regular init, keeping the graph
     connected across clusters; alpha-domination keeps far edges only
     when no kept neighbor covers them, exactly Vamana's mechanism);
  3. reverse edges: group all chosen edges by target (one global sort),
     keep the nearest `max_incoming` per target, then per node
     union-or-reprune, matching the reference's add-then-prune-on-overflow
     semantics (cython_utils.pyx:335-353).

The edge set differs from sequential insertion (as does the wave
builder's); the acceptance criterion is recall parity at equal R/L/alpha
(SURVEY.md §7 "hard parts"). Unlike sequential insertion there is no
2-pass alpha schedule: candidates are exact kNN, so a single prune at the
target alpha is the principled choice (deviation from the reference's
alpha=1.0-then-alpha schedule, cython_utils.pyx:296-310 — documented
here; the wave builder keeps the reference schedule).
"""

from __future__ import annotations

import functools
import logging
import time

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.graph.prune import robust_prune_batch
from diskrag_tpu.graph.search import _gathered_distance
from diskrag_tpu.graph.types import VamanaIndex
from diskrag_tpu.ops.distance import Metric
from diskrag_tpu.ops.flat import flat_search
from diskrag_tpu.ops.medoid import approximate_medoid
from diskrag_tpu.ops.topk import INVALID_ID, mask_duplicates, sort_topk_unique

logger = logging.getLogger(__name__)

# Device-residency ceiling for the [N, knn_k] candidate tables during the
# alpha-prune phase; larger tables stay host-side and prune blocks slice
# them on demand (tests monkeypatch this to 0 to force the host path).
# 2 GB: at 10M x R=48 the tables are 3.84 GB and their residency on top
# of vectors (5.1 GB) + the donated [N, R] accumulators (2.9 GB) was the
# measured RESOURCE_EXHAUSTED margin (2026-08-21).
_HOST_KNN_BYTES = 2 << 30


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _write_rows(acc_ids, acc_dists, b, o_ids, o_dists):
    """Donated accumulator update: without donation each functional
    `.at[b].set` holds BOTH the old and new [N, R] buffer (2 x 2.88 GB
    at 10M x R=48), and the async dispatch queue multiplies that — the
    prune phase measured RESOURCE_EXHAUSTED at that geometry
    (2026-08-21) until the update reused its input buffers."""
    return (
        acc_ids.at[b].set(o_ids),
        acc_dists.at[b].set(o_dists.astype(acc_dists.dtype)),
    )


@functools.partial(jax.jit, donate_argnums=(0,))
def _write_rows_one(acc, b, rows):
    """Single-accumulator variant of _write_rows (merge loop)."""
    return acc.at[b].set(rows)

INF = jnp.inf


def exact_knn(
    vectors: jax.Array,
    k: int,
    *,
    metric: str = Metric.L2.value,
    query_block: int = 8192,
    scan_chunk: int = 65_536,
    rerank_mult: int = 2,
) -> tuple[jax.Array, jax.Array]:
    """Near-exact top-k neighbors for every database point (self
    excluded): fused int8 MXU scan on TPU (tiled bf16 XLA scan on CPU),
    f32 rerank of the kept k*rerank_mult candidates per query block
    (`ops/flat.py`). Block/chunk/rerank_mult defaults are the measured
    sweet spot on v5e at 200k x 128 (2.6-5s for all 200k x 200k);
    occasional tail-candidate misses are irrelevant to graph quality —
    the recall gate is on the final index.
    Returns (ids int32[N, k], dists float32[N, k]) ascending.
    """
    n = vectors.shape[0]
    k = min(k, n - 1)
    norms = jnp.sum(jnp.square(vectors), axis=-1)
    # On TPU the fused Pallas scan (matmul + bucketed top-k in VMEM)
    # replaces the tiled XLA scan, which writes a [block, chunk] f32
    # distance tile to HBM per step and runs approx_max_k over it —
    # selection traffic, not the matmul, dominated the build's kNN pass.
    use_fused = jax.default_backend() not in ("cpu",)
    # the bf16 copy is only for the non-fused XLA path — allocating it
    # up front would hold a dead N*D*2-byte array through the whole
    # fused-path loop on an HBM-budgeted build
    vec_bf16 = None
    if use_fused:
        from diskrag_tpu.ops.flat_scan_pallas import build_rowscan_table

        # pre-padded scan table built ONCE: the per-block loop below
        # makes n/query_block fused calls, and the default contract
        # would re-pad the whole database inside each one
        if metric == Metric.COSINE.value:
            inv = jax.lax.rsqrt(norms + 1e-12)[:, None]
            scan_src = vectors * inv
        else:
            scan_src = vectors
        vec_scan, scan_block, scan_scales, scan_n = build_rowscan_table(
            scan_src, metric=metric
        )
        del scan_src
    ids_out, dists_out = [], []
    for i in range(0, n, query_block):
        q = vectors[i : i + query_block]
        if use_fused:
            from diskrag_tpu.ops.flat_scan_pallas import flat_search_fused

            # NB=4096 keeps bucket-collision loss under 1% at the
            # build's k≈66 (expected tail loss (k-1)/(2*NB)); db_tile
            # shrinks to 4096 and the kernel query block is pinned to
            # 128 so score tile + [qb, NB] running state + double-
            # buffered inputs stay under the 16 MB scoped-VMEM budget
            # (the serving default qb=1024 only fits NB<=512)
            d, ids = flat_search_fused(
                q, vec_scan, scan_block, vectors, k=k + 1, metric=metric,
                rerank_mult=max(rerank_mult, 4), n_buckets=4096,
                db_tile=4096, query_block=128, db_scales=scan_scales,
                n_valid=scan_n,
            )
        else:
            if vec_bf16 is None:
                vec_bf16 = vectors.astype(jnp.bfloat16)
            d, ids = flat_search(
                q, vec_bf16, norms, vectors, k=k + 1, metric=metric,
                chunk=min(scan_chunk, n), rerank_mult=rerank_mult,
            )
        gid = jnp.arange(i, i + q.shape[0], dtype=jnp.int32)[:, None]
        d = jnp.where(ids == gid, INF, d)
        neg, take = jax.lax.top_k(-d, k)
        ids_out.append(jnp.take_along_axis(ids, take, axis=1))
        dists_out.append(-neg)
    return jnp.concatenate(ids_out), jnp.concatenate(dists_out)


@functools.partial(
    jax.jit, static_argnames=("degree_bound", "metric", "pre_sliced")
)
def _prune_block(
    vectors: jax.Array,
    block_ids: jax.Array,
    knn_ids_full: jax.Array,
    knn_dists_full: jax.Array,
    rand_ids_full: jax.Array,
    alpha: jax.Array,
    *,
    degree_bound: int,
    metric: str,
    pre_sliced: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Alpha-prune one block of points' candidate pools.

    Pool = exact kNN (ids+dists precomputed) ++ random long-range
    candidates (distances computed here). Row gathers happen inside the
    jitted program (each host-level indexing op would be its own
    dispatch on this latency-bound platform). Returns (out_ids [W, R],
    out_dists [W, R]); out_dists of -1 slots are +inf.

    `pre_sliced`: the kNN tables are already this block's rows [W, k]
    (host-resident-table mode for huge builds — see build_vamana_knn's
    host_knn branch) instead of the full [N, k] device tables.
    """
    n = vectors.shape[0]
    if pre_sliced:
        knn_ids = knn_ids_full
        knn_dists = knn_dists_full.astype(jnp.float32)
    else:
        knn_ids = knn_ids_full[block_ids]
        # dist tables may be stored bf16 past ~2M points (HBM budget);
        # candidate ordering tolerates the ~0.4% relative error
        knn_dists = knn_dists_full[block_ids].astype(jnp.float32)
    rand_ids = rand_ids_full[block_ids]
    queries = vectors[block_ids]
    rand_vecs = vectors[jnp.clip(rand_ids, 0, n - 1)]
    rand_dists = _gathered_distance(queries, rand_vecs, metric)
    cand_ids = jnp.concatenate([knn_ids, rand_ids], axis=1)
    cand_dists = jnp.concatenate([knn_dists, rand_dists], axis=1)
    cand_vecs = jnp.concatenate(
        [vectors[jnp.clip(knn_ids, 0, n - 1)], rand_vecs], axis=1
    )
    out_ids = robust_prune_batch(
        block_ids, cand_ids, cand_vecs, cand_dists, alpha,
        degree_bound=degree_bound, metric=metric,
    )
    # recover each kept edge's distance by compare-lookup against the pool
    # (duplicate pool ids share one masked-min distance; scatters avoided)
    eq = out_ids[:, :, None] == cand_ids[:, None, :]  # [W, R, C]
    out_dists = jnp.min(
        jnp.where(eq, cand_dists[:, None, :], INF), axis=2
    )
    out_dists = jnp.where(out_ids == INVALID_ID, INF, out_dists)
    return out_ids, out_dists


def _incoming_tables_host(
    out_ids: jax.Array,
    out_dists: jax.Array,
    *,
    max_incoming: int,
    n: int,
) -> tuple[jax.Array, jax.Array]:
    """Host-numpy version of `_incoming_tables` for edge counts whose
    device lexsort workspace (several [N*R] arrays + sort scratch) would
    not fit HBM next to the vectors and edge tables — ~480M edges at 10M
    points x R=48. np.lexsort of that size takes ~1-2 min and ~20 GB of
    host RAM; the device tables come back as int32 ids + bf16 dists."""
    import ml_dtypes

    r = out_ids.shape[1]
    t = np.asarray(out_ids).reshape(-1)
    d = np.asarray(out_dists).astype(np.float32).reshape(-1)
    s = np.repeat(np.arange(n, dtype=np.int32), r)
    tk = np.where(t == INVALID_ID, n, t)
    order = np.lexsort((d, tk))
    t_s, s_s, d_s = tk[order], s[order], d[order]
    del order, t, d, tk
    node_ids = np.arange(n)
    start = np.searchsorted(t_s, node_ids, side="left")
    end = np.searchsorted(t_s, node_ids, side="right")
    pos = start[:, None] + np.arange(max_incoming)[None, :]
    ok = pos < end[:, None]
    pos = np.clip(pos, 0, n * r - 1)
    inc_ids = np.where(ok, s_s[pos], INVALID_ID).astype(np.int32)
    inc_dists = np.where(ok, d_s[pos], np.inf).astype(ml_dtypes.bfloat16)
    return jnp.asarray(inc_ids), jnp.asarray(inc_dists)


@functools.partial(
    jax.jit, static_argnames=("max_incoming", "n")
)
def _incoming_tables(
    out_ids: jax.Array,
    out_dists: jax.Array,
    *,
    max_incoming: int,
    n: int,
) -> tuple[jax.Array, jax.Array]:
    """Group edges by target; keep the `max_incoming` nearest sources per
    target. One global lexsort by (target, dist), then each target's
    incoming run is located with a binary search and sliced with plain
    gathers — no scatters and no long scans (both pathologically slow on
    this platform at ~10M elements).

    Returns (inc_ids int32[N, max_incoming], inc_dists float32[N, ...]).
    """
    r = out_ids.shape[1]
    e = n * r

    targets = out_ids.reshape(-1)
    dists = out_dists.astype(jnp.float32).reshape(-1)
    sources = jnp.repeat(jnp.arange(n, dtype=jnp.int32), r)
    tkey = jnp.where(targets == INVALID_ID, n, targets)
    order = jnp.lexsort((dists, tkey))
    t_s = tkey[order]
    s_s = sources[order]
    d_s = dists[order]

    node_ids = jnp.arange(n, dtype=jnp.int32)
    start = jnp.searchsorted(t_s, node_ids, side="left").astype(jnp.int32)
    end = jnp.searchsorted(t_s, node_ids, side="right").astype(jnp.int32)
    pos = start[:, None] + jnp.arange(max_incoming, dtype=jnp.int32)[None, :]
    ok = pos < end[:, None]
    pos = jnp.clip(pos, 0, e - 1)
    inc_ids = jnp.where(ok, s_s[pos], INVALID_ID)
    inc_dists = jnp.where(ok, d_s[pos], INF)
    return inc_ids, inc_dists


@functools.partial(
    jax.jit, static_argnames=("degree_bound", "metric")
)
def _merge_block(
    vectors: jax.Array,
    block_ids: jax.Array,
    out_ids_full: jax.Array,
    out_dists_full: jax.Array,
    inc_ids_full: jax.Array,
    inc_dists_full: jax.Array,
    alpha: jax.Array,
    *,
    degree_bound: int,
    metric: str,
) -> jax.Array:
    """Union out-edges with incoming reverse edges; RobustPrune only rows
    that overflow the degree bound (reference add-then-prune-on-overflow
    semantics, cython_utils.pyx:335-353)."""
    n = vectors.shape[0]
    r = degree_bound
    out_ids = out_ids_full[block_ids]
    # tables may be stored bf16 past ~3M points (HBM budget)
    out_dists = out_dists_full[block_ids].astype(jnp.float32)
    inc_ids = inc_ids_full[block_ids]
    inc_dists = inc_dists_full[block_ids].astype(jnp.float32)
    cand_ids = jnp.concatenate([out_ids, inc_ids], axis=1)
    cand_dists = jnp.concatenate([out_dists, inc_dists], axis=1)
    masked = mask_duplicates(cand_ids, cand_dists)
    n_unique = jnp.sum(jnp.isfinite(masked), axis=1)
    union_ids, _, _ = sort_topk_unique(cand_ids, cand_dists, r)
    cand_vecs = vectors[jnp.clip(cand_ids, 0, n - 1)]
    pruned = robust_prune_batch(
        block_ids, cand_ids, cand_vecs, cand_dists, alpha,
        degree_bound=r, metric=metric,
    )
    return jnp.where((n_unique > r)[:, None], pruned, union_ids)


def approx_knn_ivf(
    vectors: jax.Array,
    k: int,
    *,
    metric: str = Metric.L2.value,
    n_probe: int = 8,
    query_block: int = 8192,
    seed: int = 0,
    cap_factor: float = 2.0,
    n_cells: int | None = None,
    checkpoint: "BuildCheckpoint | None" = None,
    checkpoint_every_s: float = 600.0,
) -> tuple[jax.Array, jax.Array]:
    """Approximate top-k neighbors via an IVF probe instead of the full
    scan — O(N * probed-cells) instead of O(N^2), the backend for builds
    past a couple million points. Candidates come from each point's
    `n_probe` nearest cells. Table misses are NOT benign: a true
    neighbor assigned outside the probed cells is absent from the
    candidate pool of *every* point, the graph never gets an edge to
    it, and the final index recall inherits the table ceiling (10M,
    2026-08: cap_factor=1.5 tables capped at 0.89 at any depth, index
    at 0.96-0.98 across L; neither probe width nor entry-point count
    could recover it). `cap_factor` is the knob that sets that ceiling
    — see `build_ivf`.

    With `checkpoint`, the host-side accumulation is written to
    `<dir>/knn_partial.npz` every `checkpoint_every_s` seconds together
    with a resume cursor; a restarted build rebuilds the (deterministic,
    seeded) IVF and continues from the cursor instead of from block 0.
    Returns (ids int32[N, k], dists float32[N, k]) ascending.
    """
    from diskrag_tpu.graph.checkpoint import pack_bf16, unpack_bf16
    from diskrag_tpu.index.ivf import build_ivf

    n = vectors.shape[0]
    k = min(k, n - 1)

    start = 0
    ids_out, dists_out = [], []
    if checkpoint is not None:
        part = checkpoint.load("knn_partial")
        if part is not None and int(part["k"]) == k:
            start = int(part["next_i"])
            if start > 0:
                ids_out = [part["ids"]]
                dists_out = [unpack_bf16(part["dists"])]
            logger.info(
                "resuming kNN pass at row %d/%d from checkpoint", start, n
            )

    # cap_factor sizes the padded cell tiles (cap_factor * N * D bytes
    # of HBM at int8) AND sets the table recall ceiling — see the
    # module callers for the measured tradeoff
    # rerank_master: build_ivf round-trips through numpy and would
    # otherwise upload a SECOND full device copy of the vectors for its
    # rerank master — a transient 5.1 GB at 10M x 128 on top of the
    # caller's resident one
    ivf = build_ivf(
        np.asarray(vectors), n_cells, metric=metric, seed=seed,
        cap_factor=cap_factor, rerank_master=jnp.asarray(vectors),
    )

    def save_partial(next_i: int) -> None:
        checkpoint.save(
            "knn_partial",
            ids=np.concatenate(ids_out) if ids_out else np.zeros(
                (0, k), np.int32
            ),
            dists=pack_bf16(
                np.concatenate(dists_out) if dists_out else np.zeros(
                    (0, k), np.float32
                )
            ),
            next_i=np.int64(next_i),
            k=np.int64(k),
        )

    # accumulate per-block results on the HOST: keeping ~1.2k block
    # arrays device-resident plus the final concatenate peaks at ~2x
    # the [N, k+1] table and OOMs a 16 GB chip at 10M
    last_save = time.perf_counter()
    for i in range(start, n, query_block):
        q = vectors[i : i + query_block]
        d, ids = ivf.search(q, k=k + 1, n_probe=n_probe)
        gid = jnp.arange(i, i + q.shape[0], dtype=jnp.int32)[:, None]
        d = jnp.where(ids == gid, INF, d)
        neg, take = jax.lax.top_k(-d, k)
        ids_out.append(np.asarray(jnp.take_along_axis(ids, take, axis=1)))
        dists_out.append(np.asarray(-neg))
        if (
            checkpoint is not None
            and time.perf_counter() - last_save >= checkpoint_every_s
        ):
            # consolidate so the partial holds one array per table
            ids_out = [np.concatenate(ids_out)]
            dists_out = [np.concatenate(dists_out)]
            save_partial(i + query_block)
            last_save = time.perf_counter()
    del ivf
    # NOTE: the partial is NOT cleared here — the caller persists the
    # completed "knn" phase (a multi-GB savez at 10M) and must clear
    # the partial only after that lands, or a crash in the window
    # between would lose the whole pass
    return np.concatenate(ids_out), np.concatenate(dists_out)


def compute_entry_points(
    vectors: jax.Array,
    n_entry: int,
    key: jax.Array,
    *,
    metric: str = Metric.L2.value,
    sample_cap: int = 65_536,
    max_iter: int = 8,
) -> np.ndarray:
    """Well-spread search seeds: k-means cell centers on a subsample,
    snapped to their nearest database points. Returned unique (host-side
    np.unique) so the search loop needs no O(S^2) dedup."""
    from diskrag_tpu.pq.kmeans import kmeans_fit

    n = vectors.shape[0]
    n_entry = min(n_entry, n)
    if n_entry >= 20_000:
        # at this seed count plain random sampling covers the data's
        # natural clusters as well as k-means centers do (at S=65k over
        # 10M points a 1k-point cluster is seeded w.p. ~0.999) and the
        # k-means alternative would need multi-minute Lloyd sweeps over
        # a million-point sample. Measured at 10M: random 65k seeds took
        # graph recall@10 from 0.90 (16k k-means seeds) to 0.96-0.97
        # (L=32/48; the residual loss is IVF-backend kNN graph locality,
        # not seeding).
        ids = jax.random.choice(key, n, (n_entry,), replace=False)
        return np.unique(np.asarray(ids)).astype(np.int32)
    # k-means needs enough samples per center to place them well —
    # 65k samples for 16k centers would leave 4 points/center
    sample_cap = max(sample_cap, 16 * n_entry)
    k_sub, k_km = jax.random.split(key)
    if n > sample_cap:
        sub = jax.random.choice(k_sub, n, (sample_cap,), replace=False)
        sample = vectors[sub]
    else:
        sample = vectors
    centers, _ = kmeans_fit(
        k_km, sample[None], n_entry, max_iter=max_iter, init="d2"
    )
    norms = jnp.sum(jnp.square(vectors), axis=-1)
    _, ids = flat_search(
        centers[0], vectors.astype(jnp.bfloat16), norms, vectors, k=1,
        metric=metric,
    )
    return np.unique(np.asarray(ids[:, 0]))


def build_vamana_knn(
    vectors: np.ndarray | jax.Array,
    *,
    degree_bound: int = 32,
    alpha: float = 1.2,
    metric: str = Metric.L2.value,
    knn_k: int | None = None,
    n_random: int = 8,
    max_incoming: int | None = None,
    query_block: int = 4096,
    wave_size: int = 2048,
    n_entry_points: int | None = None,
    knn_backend: str = "auto",
    knn_probe: int = 8,
    seed: int = 0,
    progress: bool = False,
    checkpoint_dir: str | None = None,
    checkpoint_every_s: float = 600.0,
) -> VamanaIndex:
    """Build a Vamana-quality graph from exact kNN lists (see module doc).

    Args mirror `build_vamana` (degree_bound=R); `knn_k` is the exact-kNN
    candidate count (default max(64, 4R/3)); `n_random` seeded long-range
    candidates per point keep the graph connected across clusters;
    `n_entry_points` well-spread search seeds (k-means-center points,
    default min(4096, N/64)) are stored on the index and make the graph
    navigable — searches seed from them plus the medoid. `knn_backend`:
    "flat" (exact, O(N^2) MXU scans), "ivf" (approximate, O(N*probe) —
    for multi-million-point builds), or "auto" (flat below 2M points).

    `checkpoint_dir` enables mid-build checkpoint/resume of the ivf-kNN
    pass (the dominant phase of multi-million-point builds — ~40+ min of
    a ~1 h 10M build): partial accumulation every `checkpoint_every_s`
    seconds plus the completed kNN tables, all tagged with the build
    params and a dataset fingerprint so a changed build never resumes
    stale state. The reference has no mid-build checkpointing (its
    checkpoint is the finished artifact set, build_index.py:251-332).
    The flat backend ignores it: its kNN tables are device-resident and
    a <2M build costs minutes, less than fetching them to the host over
    this tunnel.
    """
    vectors = jnp.asarray(vectors, jnp.float32)
    n = vectors.shape[0]
    if n < 2:
        raise ValueError("need at least 2 points")
    degree_bound = min(degree_bound, n - 1)
    if knn_k is None:
        knn_k = max(64, (4 * degree_bound) // 3)
    knn_k = min(knn_k, n - 1)
    n_random = min(n_random, max(n - 1 - knn_k, 0))
    if max_incoming is None:
        max_incoming = max(degree_bound // 2, 8)
    wave_size = min(wave_size, n)
    metric = Metric(metric).value
    alpha_j = jnp.asarray(alpha, jnp.float32)

    if n_entry_points is None:
        # coverage scales with dataset size: at 1M, 512 seeds left whole
        # regions unreached (recall 0.65) while 4096 restored 0.999; at
        # 4M, 4096 seeds gave 0.75 and 15k restored 0.989 (32k: 0.9893,
        # diminishing) — the seed matmul is trivial on the MXU, so err
        # on the high side.
        n_entry_points = min(65_536, max(n // 64, 0))

    t0 = time.perf_counter()
    key = jax.random.key(seed)
    k_med, k_rand, k_entry = jax.random.split(key, 3)
    medoid = approximate_medoid(vectors, k_med, metric=metric)
    entry_points = None
    if n_entry_points > 1:
        eps = compute_entry_points(
            vectors, n_entry_points, k_entry, metric=metric
        )
        eps = eps[eps != int(medoid)]
        if eps.size > 1:
            entry_points = jnp.asarray(eps, jnp.int32)
    if progress:
        logger.info("entry points done (%.1fs)", time.perf_counter() - t0)

    if knn_backend == "auto":
        knn_backend = "flat" if n <= 2_000_000 else "ivf"
    if knn_backend == "ivf":
        # cap_factor is the kNN-table recall ceiling (see build_ivf
        # docstring): at 1.5 the 10M tables capped at 0.89 recall at
        # ANY depth/probe — points displaced past their 8 nearest
        # cells are invisible to query-side probing. 3.0 measured a
        # 1.00 co-probe ceiling at 2M; past ~8M points it drops to
        # 2.5 so tiles (cap*N*D int8) + the f32 vectors + per-probe
        # [QB, cap, D] gathers still fit a 16 GB chip.
        cap_factor = 3.0 if n <= 8_000_000 else 2.5
        ckpt = None
        if checkpoint_dir is not None:
            from diskrag_tpu.graph.checkpoint import (
                BuildCheckpoint,
                dataset_fingerprint,
            )

            ckpt = BuildCheckpoint(
                checkpoint_dir,
                tag={
                    "phase_inputs": "ivf-knn",
                    "n": n, "dim": int(vectors.shape[1]),
                    "knn_k": knn_k, "knn_probe": knn_probe,
                    "metric": metric, "seed": seed,
                    "query_block": query_block,
                    # a cap change must invalidate old checkpoints
                    "cap_factor": cap_factor,
                    "data": dataset_fingerprint(vectors),
                },
            )
        done = ckpt.load("knn") if ckpt is not None else None
        if done is not None:
            logger.info("kNN tables loaded from checkpoint %s", checkpoint_dir)
            knn_ids_np = done["ids"]
            knn_dists_np16 = done["dists"]  # bf16 bit patterns
        else:
            knn_ids_np, knn_dists_np = approx_knn_ivf(
                vectors, knn_k, metric=metric, query_block=query_block,
                seed=seed, n_probe=knn_probe,
                cap_factor=cap_factor,
                checkpoint=ckpt, checkpoint_every_s=checkpoint_every_s,
            )
            from diskrag_tpu.graph.checkpoint import pack_bf16

            knn_dists_np16 = pack_bf16(knn_dists_np)
            del knn_dists_np
            if ckpt is not None:
                ckpt.save("knn", ids=knn_ids_np, dists=knn_dists_np16)
                ckpt.clear("knn_partial")
        # the [N, knn_k] f32 dist table is 2.6 GB at 10M — kept bf16
        # on the host and uploaded as such (f32 upload + device cast
        # would transiently hold both); f32 restored inside _prune_block
        import ml_dtypes

        # Past _HOST_KNN_BYTES of kNN-table bytes the tables stay
        # HOST-resident and each prune block's rows are sliced + uploaded
        # on demand: at 10M x R=48 (knn_k=120) the device-resident
        # [N, knn_k] tables (7.2 GB) pushed the prune phase past HBM
        # (RESOURCE_EXHAUSTED measured 2026-08-21). Same total bytes
        # cross the link either way — chunking removes the residency.
        host_knn = (
            knn_ids_np.nbytes + knn_dists_np16.nbytes > _HOST_KNN_BYTES
        )
        if host_knn:
            knn_ids = knn_dists = None
            logger.info(
                "kNN tables (%.1f GB) stay host-resident; prune blocks "
                "slice on demand",
                (knn_ids_np.nbytes + knn_dists_np16.nbytes) / 2**30,
            )
        else:
            knn_ids = jnp.asarray(knn_ids_np)
            knn_dists = jnp.asarray(knn_dists_np16.view(ml_dtypes.bfloat16))
            del knn_ids_np, knn_dists_np16
    else:
        host_knn = False
        knn_ids, knn_dists = exact_knn(
            vectors, knn_k, metric=metric, query_block=query_block
        )
    if progress:
        if knn_ids is not None:
            np.asarray(knn_ids[0, 0])
        logger.info("exact kNN done (%.1fs)", time.perf_counter() - t0)

    if n_random > 0:
        u = jax.random.randint(
            k_rand, (n, n_random), 0, max(n - 1, 1), jnp.int32
        )
        rand_ids = (jnp.arange(n, dtype=jnp.int32)[:, None] + 1 + u) % n
    else:
        rand_ids = jnp.zeros((n, 0), jnp.int32)

    pad = (-n) % wave_size
    ids_all = jnp.arange(n, dtype=jnp.int32)
    if pad:
        ids_all = jnp.concatenate([ids_all, ids_all[:pad]])
    blocks = np.asarray(ids_all).reshape(-1, wave_size)

    # past a few million points the edge tables are HBM-budgeted: dists
    # stored bf16 (f32 restored per block inside the jitted programs) and
    # the reverse-edge grouping runs on the host
    huge = n * degree_bound > (150 << 20)
    dist_dtype = jnp.bfloat16 if huge else jnp.float32
    out_ids = jnp.zeros((n, degree_bound), jnp.int32)
    out_dists = jnp.zeros((n, degree_bound), dist_dtype)
    for bi, blk in enumerate(blocks):
        b = jnp.asarray(blk)
        if host_knn:
            import ml_dtypes

            o_ids, o_dists = _prune_block(
                vectors, b,
                jnp.asarray(knn_ids_np[blk]),
                jnp.asarray(knn_dists_np16[blk].view(ml_dtypes.bfloat16)),
                rand_ids, alpha_j,
                degree_bound=degree_bound, metric=metric, pre_sliced=True,
            )
        else:
            o_ids, o_dists = _prune_block(
                vectors, b, knn_ids, knn_dists, rand_ids, alpha_j,
                degree_bound=degree_bound, metric=metric,
            )
        out_ids, out_dists = _write_rows(
            out_ids, out_dists, b, o_ids, o_dists
        )
        if huge and bi % 64 == 63:
            # belt to donation's braces: bound the dispatch queue's
            # live per-block temporaries too (huge builds only)
            np.asarray(out_ids[0, 0])
    if host_knn:
        del knn_ids_np, knn_dists_np16
    del knn_ids, knn_dists, rand_ids  # [N, k] tables — 4 GB at 10M
    if progress:
        np.asarray(out_ids[0, 0])
        logger.info("alpha-prune done (%.1fs)", time.perf_counter() - t0)

    inc_fn = _incoming_tables_host if huge else _incoming_tables
    inc_ids, inc_dists = inc_fn(
        out_ids, out_dists, max_incoming=max_incoming, n=n
    )

    adjacency = jnp.zeros((n, degree_bound), jnp.int32)
    for bi, blk in enumerate(blocks):
        b = jnp.asarray(blk)
        rows = _merge_block(
            vectors, b, out_ids, out_dists, inc_ids, inc_dists,
            alpha_j, degree_bound=degree_bound, metric=metric,
        )
        adjacency = _write_rows_one(adjacency, b, rows)
        if huge and bi % 64 == 63:
            np.asarray(adjacency[0, 0])  # bound queued temporaries

    # drain via a host fetch (block_until_ready unreliable on this platform)
    np.asarray(adjacency[0, 0])
    if progress:
        logger.info("knn build done in %.1fs", time.perf_counter() - t0)
    return VamanaIndex(
        vectors=vectors, adjacency=adjacency, medoid=medoid, metric=metric,
        entry_points=entry_points,
    )
