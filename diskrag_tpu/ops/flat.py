"""Flat (exhaustive) search — the MXU-native fast path for in-HBM data.

On TPU, streaming the whole [N, D] matrix through the MXU beats
latency-bound graph traversal by orders of magnitude until N is tens of
millions: a [B, N] distance matrix is two matmuls' worth of sequential
HBM reads (full bandwidth) instead of hundreds of thousands of random row
gathers (latency-bound). The reference's "brute force" mode
(pydiskann/pq/adaptive_pq.py:60-66, search_engine brute-force fallback)
exists only as a small-N escape hatch; here it is a first-class index
type.

Performance notes (measured on v5e):
  - candidate selection uses `jax.lax.approx_max_k` — the TPU's
    hardware-bucketed TopK — because an exact `lax.top_k` over a
    [B, 200k] row costs more than the matmul that produced it;
  - squared norms are precomputed once per index; the scan never
    up-converts the bf16 tiles;
  - the scan keeps k*rerank_mult running candidates and a final f32
    rerank restores exact ordering.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.ops.distance import Metric


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "chunk", "rerank_mult", "rerank_width"),
)
def flat_search(
    queries: jax.Array,
    vectors_bf16: jax.Array,
    norms_sq: jax.Array,
    vectors_f32: jax.Array | None = None,
    *,
    k: int,
    metric: str = Metric.L2.value,
    chunk: int = 32_768,
    rerank_mult: int = 4,
    rerank_width: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Exhaustive top-k: bf16 matmul scan + approx-topk + f32 rerank.

    Args:
      queries: [B, D] float32.
      vectors_bf16: [N, D] bfloat16 database (the scan operand).
      norms_sq: [N] float32 precomputed squared norms (inverse norms are
        derived for cosine).
      vectors_f32: [N, D] float32 for rerank; None skips rerank.
      chunk: N-axis tile per scan step.
      rerank_mult: candidates kept per query = k * rerank_mult.
      rerank_width: pins the candidate count outright (overrides
        rerank_mult; same knob as `flat_search_fused`).

    Returns (dists [B, k] ascending, ids [B, k]).
    """
    m = Metric(metric)
    b, d = queries.shape
    n = vectors_bf16.shape[0]
    kk = k * rerank_mult if rerank_width is None else max(rerank_width, k)
    kk = min(kk, n)
    chunk = min(chunk, n)
    pad = (-n) % chunk
    vpad = jnp.pad(vectors_bf16, ((0, pad), (0, 0)))
    npad = jnp.pad(norms_sq, (0, pad))
    tiles = vpad.reshape(-1, chunk, d)
    tile_norms = npad.reshape(-1, chunk)
    n_tiles = tiles.shape[0]

    if m == Metric.COSINE:
        qn = jnp.sqrt(jnp.sum(jnp.square(queries), -1, keepdims=True)) + 1e-12
        qb = (queries / qn).astype(jnp.bfloat16)
    else:
        qb = queries.astype(jnp.bfloat16)
    qn2 = jnp.sum(jnp.square(queries), -1, keepdims=True)

    def tile_step(carry, inp):
        best_d, best_i = carry
        tile, vn, t_idx = inp  # [chunk, D], [chunk], []
        cross = jax.lax.dot_general(
            qb, tile, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [B, chunk]
        if m == Metric.L2:
            dist = qn2 + vn[None, :] - 2.0 * cross
        elif m == Metric.COSINE:
            dist = 1.0 - cross * jax.lax.rsqrt(vn + 1e-12)[None, :]
        else:
            dist = -cross
        ids = t_idx * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (b, chunk), 1
        )
        dist = jnp.where(ids < n, dist, jnp.inf)
        # hardware-bucketed approximate top-k per tile, exact merge of the
        # small survivor sets
        tile_d, tile_take = jax.lax.approx_max_k(-dist, kk)
        tile_i = jnp.take_along_axis(ids, tile_take, axis=1)
        cat_d = jnp.concatenate([best_d, -tile_d], axis=1)
        cat_i = jnp.concatenate([best_i, tile_i], axis=1)
        neg, take = jax.lax.top_k(-cat_d, kk)
        return (-neg, jnp.take_along_axis(cat_i, take, axis=1)), None

    init = (
        jnp.full((b, kk), jnp.inf, jnp.float32),
        jnp.full((b, kk), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        tile_step, init,
        (tiles, tile_norms, jnp.arange(n_tiles, dtype=jnp.int32)),
    )

    if vectors_f32 is None:
        return best_d[:, :k], best_i[:, :k]

    # f32 rerank of the kk candidates (shared helper)
    from diskrag_tpu.ops.distance import rerank_exact_topk

    return rerank_exact_topk(queries, vectors_f32, best_i, k, m)


class FlatIndex:
    """In-HBM exhaustive index (scan copy + f32 master + norms).

    On TPU the scan runs through the fused Pallas kernel
    (`ops/flat_scan_pallas.py`: matmul + bucketed top-k in VMEM, no
    [B, N] score matrix in HBM), by default with the int8 scan copy —
    measured 745k QPS at 200k x 128 / 272k at 1M vs 667k / 220k for the
    bf16 kernel and 351k / 87k for the XLA path, at equal recall (the
    f32 rerank keeps result ordering exact either way).
    `use_fused=False` (or a CPU backend) selects the XLA single-tile
    path; `fused_precision="bf16"` keeps the bf16 scan copy.
    """

    def __init__(
        self,
        vectors: np.ndarray | jax.Array,
        metric: str = "l2",
        use_fused: bool | None = None,
        fused_precision: str = "int8",
        rerank_width: int | None = None,
    ):
        self.rerank_width = rerank_width
        self.vectors = jnp.asarray(vectors, jnp.float32)
        self._vectors_bf16 = None
        self.norms_sq = jnp.sum(jnp.square(self.vectors), axis=-1)
        self.metric = Metric(metric).value
        if use_fused is None:
            use_fused = jax.default_backend() not in ("cpu",)
        self.use_fused = use_fused
        self._fused_db = None
        self._fused_db_scales = None
        self._fused_db_scale_global = None
        self._fused_db_norms = None
        self._fused_nf = None
        self._fused_n_valid = None
        if use_fused and fused_precision == "int8_packed" and (
            self.metric == Metric.DOT.value
        ):
            fused_precision = "int8"  # packed fold is l2/cosine-only
        if use_fused and fused_precision == "int8_packed":
            from diskrag_tpu.ops.flat_scan_pallas import (
                _PACKED_MAX_DIM,
                _packed_layout,
            )

            if self.vectors.shape[-1] > _PACKED_MAX_DIM:
                # packed int32 range proof caps D (see _scan_kernel_packed)
                fused_precision = "int8"
            elif _packed_layout(
                self.vectors.shape[0], self.vectors.shape[1],
                1024, 1024, 2048,
            )[2] == 0:
                # the 256-segment budget forces NB (and the db tile) up
                # with N; past ~16M rows the widened tiles exceed the
                # scoped-VMEM limit at any query block — serve per-row
                # int8 instead of failing at compile time
                fused_precision = "int8"
        if use_fused:
            if self.metric == Metric.COSINE.value:
                inv = jax.lax.rsqrt(self.norms_sq + 1e-12)[:, None]
                scan_src = self.vectors * inv
            else:
                scan_src = self.vectors
            if fused_precision == "int8":
                from diskrag_tpu.ops.flat_scan_pallas import (
                    build_rowscan_table,
                )

                # pre-padded per-row table (norm block in
                # _fused_db_norms; see build_rowscan_table)
                (
                    self._fused_db,
                    self._fused_db_norms,
                    self._fused_db_scales,
                    self._fused_n_valid,
                ) = build_rowscan_table(scan_src, metric=self.metric)
            elif fused_precision == "int8_packed":
                from diskrag_tpu.ops.flat_scan_pallas import (
                    build_packed_scan_table,
                )

                # pre-padded table: skips the per-call full-database pad
                # copy + norm-table pipeline inside the scan jit (the
                # nf row carries the scan copy's own norms — ones for
                # cosine — divided by the global dequant scale)
                (
                    self._fused_db,
                    self._fused_nf,
                    self._fused_db_scale_global,
                    self._fused_n_valid,
                ) = build_packed_scan_table(scan_src)
            else:
                self._fused_db = scan_src.astype(jnp.bfloat16)
                if self.metric != Metric.COSINE.value:
                    # identical to what the XLA path would build — share it
                    self._vectors_bf16 = self._fused_db

    @property
    def vectors_bf16(self) -> jax.Array:
        """bf16 copy for the XLA scan path — built lazily so the fused
        default doesn't hold a third, unused database copy in HBM."""
        if self._vectors_bf16 is None:
            self._vectors_bf16 = self.vectors.astype(jnp.bfloat16)
        return self._vectors_bf16

    @property
    def n_points(self) -> int:
        return self.vectors.shape[0]

    def search(self, queries, k: int = 10, chunk: int | None = None):
        """Single-tile scan with query-side blocking.

        Measured on v5e at 200k x 128: one approx_max_k over the full
        [Bq, N] distance block is 3.5x faster than an N-tiled scan with
        per-tile top-k + merge (314k vs 89k QPS at recall 0.995) — the
        per-tile selection work, not the matmul, dominated. Queries are
        blocked so the f32 distance block stays under ~2 GB; blocks are
        dispatched back-to-back (in-order execution pipelines them).
        """
        q = jnp.asarray(queries, jnp.float32)
        if q.ndim == 1:
            q = q[None, :]
        b, n = q.shape[0], self.n_points
        if self.use_fused and chunk is None:
            from diskrag_tpu.ops.flat_scan_pallas import flat_search_fused

            return flat_search_fused(
                q,
                self._fused_db,
                self._fused_db_norms
                if self._fused_db_norms is not None
                else self.norms_sq,
                self.vectors,
                k=k,
                metric=self.metric,
                db_scales=self._fused_db_scales,
                db_scale_global=self._fused_db_scale_global,
                rerank_width=self.rerank_width,
                db_nf=self._fused_nf,
                n_valid=self._fused_n_valid,
            )
        if chunk is not None:
            return flat_search(
                q, self.vectors_bf16, self.norms_sq, self.vectors, k=k,
                metric=self.metric, chunk=min(chunk, n),
                rerank_width=self.rerank_width,
            )
        q_block = int(max(16, min(b, (2**29) // max(n, 1))))
        if q_block >= b:
            return flat_search(
                q, self.vectors_bf16, self.norms_sq, self.vectors, k=k,
                metric=self.metric, chunk=n, rerank_width=self.rerank_width,
            )
        outs = [
            flat_search(
                q[i : i + q_block], self.vectors_bf16, self.norms_sq,
                self.vectors, k=k, metric=self.metric, chunk=n,
                rerank_width=self.rerank_width,
            )
            for i in range(0, b, q_block)
        ]
        return (
            jnp.concatenate([o[0] for o in outs]),
            jnp.concatenate([o[1] for o in outs]),
        )
