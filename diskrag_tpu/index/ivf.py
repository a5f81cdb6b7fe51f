"""IVF-Flat index: k-means cells stored as padded int8 tiles, probed
with streaming matmuls.

The second in-HBM index family (next to FlatIndex and the Vamana graph).
TPU-native rationale: cluster members live in contiguous [cap, D] tiles,
so probing p cells per query is p sequential *tile* reads at full HBM
bandwidth + MXU distance matmuls — no per-row random gathers anywhere.
This is the sweet spot between exhaustive scan (reads all N rows) and
graph traversal (latency-bound random gathers) for N in the millions.

No reference counterpart (the reference has only graph + brute force);
the cell training reuses the batched k-means from the PQ subsystem.
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.ops.distance import Metric
from diskrag_tpu.pq.kmeans import kmeans_fit

INVALID_ID = -1


@functools.partial(jax.jit, static_argnames=("k", "n_probe", "metric"))
def _ivf_search_impl(
    queries,        # [B, D] f32
    centroids,      # [C, D] f32
    tiles,          # [C, cap, D] bf16 or int8 (with tile_scales)
    tile_ids,       # [C, cap] int32
    tile_norms,     # [C, cap] f32 squared norms (inf at padding)
    vectors_f32,    # [N, D] f32
    tile_scales=None,  # [C, cap] f32 per-row dequant scales (int8 tiles)
    *, k: int, n_probe: int, metric: str,
):
    m = Metric(metric)
    b, d = queries.shape
    c, cap, _ = tiles.shape
    n = vectors_f32.shape[0]
    int8 = tiles.dtype == jnp.int8

    # pick cells: [B, C] centroid distances -> top n_probe
    qc = jax.lax.dot_general(
        queries, centroids, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    if m == Metric.L2:
        cd = jnp.sum(jnp.square(centroids), -1)[None, :] - 2.0 * qc
    else:  # cosine/dot: centroid scoring by dot is fine for cell choice
        cd = -qc
    _, probe = jax.lax.top_k(-cd, n_probe)  # [B, P]

    if int8:
        from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

        qb, q_scales = quantize_int8(queries)  # [B, D] s8, [B]
    else:
        qb = queries.astype(jnp.bfloat16)
    qn2 = jnp.sum(jnp.square(queries), -1, keepdims=True)
    # never below k: with large k + narrow probes (k > cap*n_probe) the
    # final top_k over the [B, kk] candidate buffer would outrun its width
    kk = max(min(4 * k, cap * n_probe), k)

    def probe_step(carry, p_idx):
        best_d, best_i = carry
        cells = probe[:, p_idx]  # [B]
        tile = tiles[cells]      # [B, cap, D] (contiguous tile reads)
        ids = tile_ids[cells]    # [B, cap]
        vn = tile_norms[cells]   # [B, cap] precomputed
        if int8:
            cross = jnp.einsum(
                "bd,bcd->bc", qb, tile, preferred_element_type=jnp.int32
            ).astype(jnp.float32)
            cross = cross * q_scales[:, None] * tile_scales[cells]
        else:
            cross = jnp.einsum(
                "bd,bcd->bc", qb, tile, preferred_element_type=jnp.float32
            )
        if m == Metric.L2:
            dist = qn2 + vn - 2.0 * cross
        elif m == Metric.COSINE:
            qnn = jax.lax.rsqrt(qn2 + 1e-12)
            dist = 1.0 - cross * jax.lax.rsqrt(vn + 1e-12) * qnn
        else:
            dist = -cross
        dist = jnp.where(ids == INVALID_ID, jnp.inf, dist)
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg, take = jax.lax.top_k(-cat_d, kk)
        return (-neg, jnp.take_along_axis(cat_i, take, axis=1)), None

    init = (
        jnp.full((b, kk), jnp.inf, jnp.float32),
        jnp.full((b, kk), INVALID_ID, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        probe_step, init, jnp.arange(n_probe)
    )

    # f32 rerank (shared helper)
    from diskrag_tpu.ops.distance import rerank_exact_topk

    return rerank_exact_topk(queries, vectors_f32, best_i, k, m)


@dataclasses.dataclass
class IVFIndex:
    centroids: jax.Array    # [C, D] f32
    tiles: jax.Array        # [C, cap, D] int8 (default) or bf16
    tile_ids: jax.Array     # [C, cap] int32, -1 pad
    tile_norms: jax.Array   # [C, cap] f32 squared norms
    vectors: jax.Array      # [N, D] f32 (rerank master)
    metric: str = "l2"
    tile_scales: jax.Array | None = None  # [C, cap] f32 (int8 tiles only)

    @property
    def n_points(self) -> int:
        return self.vectors.shape[0]

    @property
    def n_cells(self) -> int:
        return self.centroids.shape[0]

    def search(self, queries, k: int = 10, n_probe: int = 32):
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        n_probe = min(n_probe, self.n_cells)
        return _ivf_search_impl(
            q, self.centroids, self.tiles, self.tile_ids, self.tile_norms,
            self.vectors, self.tile_scales, k=k, n_probe=n_probe,
            metric=self.metric,
        )


def tiles_from_ids(
    vectors: np.ndarray, tile_ids: np.ndarray, tile_precision: str
):
    """Reconstruct the [C, cap, D] scan tiles from the f32 master.

    Owns the search kernel's masking invariants — pad rows zeroed, pad
    norms +inf — and the tile precision choice, in ONE place shared by
    `build_ivf` and `persist.load_ivf_index` (so a fix to either path
    cannot silently diverge from the other).

    Returns (tiles_device, tile_norms_np [C, cap] f32, tile_scales | None).
    """
    n = len(vectors)
    tiles = vectors[np.clip(tile_ids, 0, n - 1)].astype(np.float32)
    tiles[tile_ids == INVALID_ID] = 0.0
    tile_norms = np.sum(tiles * tiles, axis=-1, dtype=np.float32)
    tile_norms[tile_ids == INVALID_ID] = np.inf
    tile_scales = None
    if tile_precision == "int8":
        from diskrag_tpu.ops.flat_scan_pallas import quantize_int8

        tiles_q, scales = quantize_int8(tiles)
        tiles_j = jnp.asarray(tiles_q)
        tile_scales = jnp.asarray(scales, jnp.float32)
    else:
        tiles_j = jnp.asarray(tiles, jnp.bfloat16)
    return tiles_j, tile_norms, tile_scales


def build_ivf(
    vectors: np.ndarray,
    n_cells: int | None = None,
    *,
    metric: str = "l2",
    seed: int = 0,
    max_train: int | None = None,
    cap_factor: float = 2.0,
    kmeans_iters: int = 12,
    tile_precision: str = "int8",
    rerank_master: "jax.Array | None" = None,
) -> IVFIndex:
    """Train cells (batched k-means), assign with capacity-aware spill to
    the next-nearest cell, and lay members out as padded scan tiles
    (per-vector-scaled int8 by default — half the probed-gather bytes and
    2x the MXU rate of bf16; the f32 rerank keeps ordering exact).

    `max_train` (None = `max(131_072, 24 * n_cells)`) caps the k-means
    training sample; the default keeps >=24 samples per center as the
    cell count grows (a fixed 131k sample would leave ~10/center at
    N=10M's 12.6k cells). Measured effect is small — a 2M-point
    co-probe study (2026-08) found 10 vs 48 samples/center moved the
    ceiling by <1.5pt — but the fit is cheap MXU work, so the default
    errs on coverage for far larger cell counts.

    `cap_factor` bounds each padded cell tile at `cap_factor * N /
    n_cells` rows. **This is the recall-ceiling knob**: points that
    don't fit any of their 8 nearest cells get displaced to cells the
    query side never probes. Same 2M study: cap 1.5 capped the
    co-probe ceiling (the fraction of true top-10 neighbors assigned
    inside a query's 16 probed cells) at 0.93-0.94 regardless of
    k-means quality; cap 3.0 lifted it to 1.00 with either k-means.
    The cost is HBM (tiles are `cap_factor * N * D` bytes at int8) and
    per-probe scan width."""
    vectors = np.asarray(vectors, np.float32)
    n, d = vectors.shape
    metric = Metric(metric).value
    if cap_factor < 1.0:
        # total capacity below N would silently overwrite tile slots —
        # the overflowing points would be in NO tile, unreturnable
        raise ValueError(f"cap_factor must be >= 1, got {cap_factor}")
    if n_cells is None:
        n_cells = int(max(16, min(4 * np.sqrt(n), n // 8)))
    if max_train is None:
        max_train = max(131_072, 24 * n_cells)
    cap = int(np.ceil(cap_factor * n / n_cells))

    rng = np.random.default_rng(seed)
    train = vectors
    if n > max_train:
        train = vectors[rng.choice(n, size=max_train, replace=False)]
    # "d2" init: one-shot joint D² seeding — n_cells is in the thousands,
    # so k-means++'s n_cells sequential device rounds would dominate the
    # whole IVF build (each round is HBM-latency-bound, ~1ms). 12 Lloyd
    # iters by default: the serving tiles don't need converged centroids —
    # the 2M co-probe study above found k-means quality moves the recall
    # ceiling far less than cap/spill does, and on-chip profiling
    # (2026-08) showed 20 vs 8 iters costs ~10 s of the 200k build.
    centers, _ = kmeans_fit(
        jax.random.key(seed), jnp.asarray(train)[None], n_cells,
        max_iter=kmeans_iters, init="d2",
    )
    centroids = np.asarray(centers[0])  # [C, D]

    # top-8 cell choices per point (chunked). The chunk scales down with
    # the cell count: the [step, C] distance block lives twice on device
    # (cross + dist) and async dispatch keeps ~2 iterations in flight, so
    # a fixed 65k step at C≈12k cells (N=10M) peaks at >13 GB and OOMs a
    # 16 GB chip — cap the in-flight block at ~256 MB per array instead.
    # 8 choices (not 4): a point placed outside its near-centroid cells
    # is invisible to query-side probing, and at 4M points the 4-choice
    # schedule left ~2% of points as stragglers — a recall CEILING that
    # no n_probe can recover (measured plateau at 0.977).
    n_choice = min(8, n_cells)
    choices = np.empty((n, n_choice), np.int32)
    cj = jnp.asarray(centroids)
    l2_cells = Metric(metric) == Metric.L2
    step = max(4096, min(65_536, (1 << 26) // max(n_cells, 1)) // 512 * 512)
    for i in range(0, n, step):
        q = jnp.asarray(vectors[i : i + step])
        cross = jnp.matmul(q, cj.T, precision=jax.lax.Precision.HIGHEST)
        # rank cells with the SAME score the query side probes with
        # (_ivf_search_impl: L2 by distance, cosine/dot by dot) — an
        # assignment metric that disagrees with the probe metric places
        # points in cells queries never visit, the invisible-point
        # recall ceiling all over again
        if l2_cells:
            dist = jnp.sum(cj * cj, -1)[None, :] - 2.0 * cross
        else:
            dist = -cross
        _, idx = jax.lax.top_k(-dist, n_choice)
        choices[i : i + step] = np.asarray(idx)

    # capacity-aware placement: rank points within each chosen cell by
    # choice round; spill to next choice when a cell is full
    assigned = np.full(n, -1, np.int64)
    remaining = np.full(n_cells, cap, np.int64)
    todo = np.arange(n)
    for round_i in range(n_choice):
        if len(todo) == 0:
            break
        want = choices[todo, round_i].astype(np.int64)
        order = np.argsort(want, kind="stable")
        w_sorted = want[order]
        first = np.searchsorted(w_sorted, np.arange(n_cells), side="left")
        pos_in_cell = np.arange(len(order)) - first[w_sorted]
        ok = pos_in_cell < remaining[w_sorted]
        placed = todo[order[ok]]
        assigned[placed] = w_sorted[ok]
        counts = np.bincount(w_sorted[ok], minlength=n_cells)
        remaining -= counts
        todo = todo[order[~ok]]
    if len(todo):
        # final stragglers go to their NEAREST cell with space — placing
        # them by global fill order scattered them into arbitrary far
        # cells that no query-side probe schedule ever visits. Chunked
        # BLAS distances + a preference list keep this O(T·O) matmul +
        # O(T) python, even for adversarially many stragglers.
        open_cells = np.flatnonzero(remaining > 0)
        slack = remaining[open_cells].copy()
        oc = centroids[open_cells]
        oc_norm = np.sum(oc * oc, axis=-1)
        n_pref = min(16, len(open_cells))
        for s in range(0, len(todo), 4096):
            chunk = todo[s : s + 4096]
            if l2_cells:
                d2 = oc_norm[None, :] - 2.0 * vectors[chunk] @ oc.T
            else:
                d2 = -(vectors[chunk] @ oc.T)
            pref = np.argpartition(d2, n_pref - 1, axis=1)[:, :n_pref]
            pref = np.take_along_axis(
                pref, np.argsort(np.take_along_axis(d2, pref, 1), 1), 1
            )
            for row, p in enumerate(chunk):
                for j in pref[row]:
                    if slack[j] > 0:
                        assigned[p] = open_cells[j]
                        slack[j] -= 1
                        break
                else:  # all preferred cells full — least-filled fallback
                    j = int(np.argmax(slack))
                    assigned[p] = open_cells[j]
                    slack[j] -= 1

    tile_ids = np.full((n_cells, cap), INVALID_ID, np.int32)
    order = np.argsort(assigned, kind="stable")
    a_sorted = assigned[order]
    first = np.searchsorted(a_sorted, np.arange(n_cells), side="left")
    pos = np.arange(n) - first[a_sorted]
    tile_ids[a_sorted, np.minimum(pos, cap - 1)] = order
    tiles_j, tile_norms, tile_scales = tiles_from_ids(
        vectors, tile_ids, tile_precision
    )

    return IVFIndex(
        centroids=jnp.asarray(centroids),
        tiles=tiles_j,
        tile_ids=jnp.asarray(tile_ids),
        tile_norms=jnp.asarray(tile_norms),
        # an already-device-resident master avoids a second transient
        # full f32 upload (5.1 GB at 10M — the kNN backend's caller
        # holds one on device already)
        vectors=(
            rerank_master if rerank_master is not None
            else jnp.asarray(vectors)
        ),
        metric=metric,
        tile_scales=tile_scales,
    )
