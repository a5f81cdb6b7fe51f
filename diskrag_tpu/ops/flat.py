"""Flat (exhaustive) search — the MXU-native fast path for in-HBM data.

On TPU, streaming the whole [N, D] matrix through the MXU beats
latency-bound graph traversal by orders of magnitude until N is tens of
millions: a [B, N] distance matrix is two matmuls' worth of sequential
HBM reads (full bandwidth) instead of hundreds of thousands of random row
gathers (latency-bound). The reference's "brute force" mode
(pydiskann/pq/adaptive_pq.py:60-66, search_engine brute-force fallback)
exists only as a small-N escape hatch; here it is a first-class index
type with bf16 compute + f32 rerank and N-chunked streaming so the
distance tile never exceeds a few hundred MB.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.ops.distance import Metric


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "chunk", "rerank_mult")
)
def flat_search(
    queries: jax.Array,
    vectors_bf16: jax.Array,
    vectors_f32: jax.Array | None = None,
    *,
    k: int,
    metric: str = Metric.L2.value,
    chunk: int = 262_144,
    rerank_mult: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Exhaustive top-k: bf16 matmul scan + f32 rerank.

    Args:
      queries: [B, D] float32.
      vectors_bf16: [N, D] bfloat16 database (the scan operand).
      vectors_f32: [N, D] float32 for rerank; None skips rerank (bf16
        distances returned).
      chunk: N-axis tile per scan step (bounds the [B, chunk] tile).
      rerank_mult: scan keeps k * rerank_mult candidates for f32 rerank
        (absorbs bf16 rounding of near-ties).

    Returns (dists [B, k] ascending, ids [B, k]).
    """
    m = Metric(metric)
    b, d = queries.shape
    n = vectors_bf16.shape[0]
    kk = min(k * rerank_mult, n) if vectors_f32 is not None else k
    chunk = min(chunk, n)
    pad = (-n) % chunk
    vpad = jnp.pad(vectors_bf16, ((0, pad), (0, 0)))
    tiles = vpad.reshape(-1, chunk, d)
    n_tiles = tiles.shape[0]

    qb = queries.astype(jnp.bfloat16)
    if m == Metric.COSINE:
        qn = jnp.sqrt(jnp.sum(jnp.square(queries), -1, keepdims=True)) + 1e-12
        qb = (queries / qn).astype(jnp.bfloat16)

    def tile_step(carry, inp):
        best_d, best_i = carry
        tile, t_idx = inp  # [chunk, D], []
        if m == Metric.L2:
            vn = jnp.sum(
                tile.astype(jnp.float32) * tile.astype(jnp.float32), axis=-1
            )
            cross = jax.lax.dot_general(
                qb, tile,
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # [B, chunk]
            qn2 = jnp.sum(jnp.square(queries), -1, keepdims=True)
            dist = jnp.maximum(qn2 + vn[None, :] - 2.0 * cross, 0.0)
        elif m == Metric.COSINE:
            tn = jax.lax.rsqrt(
                jnp.sum(tile.astype(jnp.float32) ** 2, -1) + 1e-12
            )
            cross = jax.lax.dot_general(
                qb, tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            dist = 1.0 - cross * tn[None, :]
        else:
            dist = -jax.lax.dot_general(
                qb, tile, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        ids = t_idx * chunk + jax.lax.broadcasted_iota(
            jnp.int32, (b, chunk), 1
        )
        dist = jnp.where(ids < n, dist, jnp.inf)
        # merge with running best
        cat_d = jnp.concatenate([best_d, dist], axis=1)
        cat_i = jnp.concatenate([best_i, ids], axis=1)
        neg, take = jax.lax.top_k(-cat_d, kk)
        return (-neg, jnp.take_along_axis(cat_i, take, axis=1)), None

    init = (
        jnp.full((b, kk), jnp.inf, jnp.float32),
        jnp.full((b, kk), -1, jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        tile_step, init, (tiles, jnp.arange(n_tiles, dtype=jnp.int32))
    )

    if vectors_f32 is None:
        return best_d[:, :k], best_i[:, :k]

    # f32 rerank of the kk candidates
    cand = vectors_f32[jnp.clip(best_i, 0, n - 1)]  # [B, kk, D]
    if m == Metric.L2:
        diff = cand - queries[:, None, :]
        exact = jnp.sum(diff * diff, axis=-1)
    elif m == Metric.COSINE:
        qh = queries / (
            jnp.linalg.norm(queries, axis=-1, keepdims=True) + 1e-12
        )
        ch = cand / (jnp.linalg.norm(cand, axis=-1, keepdims=True) + 1e-12)
        exact = 1.0 - jnp.einsum("bd,bkd->bk", qh, ch)
    else:
        exact = -jnp.einsum("bd,bkd->bk", queries, cand)
    exact = jnp.where(best_i == -1, jnp.inf, exact)
    neg, take = jax.lax.top_k(-exact, k)
    return -neg, jnp.take_along_axis(best_i, take, axis=1)


class FlatIndex:
    """In-HBM exhaustive index (bf16 scan copy + f32 master)."""

    def __init__(self, vectors: np.ndarray | jax.Array, metric: str = "l2"):
        self.vectors = jnp.asarray(vectors, jnp.float32)
        self.vectors_bf16 = self.vectors.astype(jnp.bfloat16)
        self.metric = Metric(metric).value

    @property
    def n_points(self) -> int:
        return self.vectors.shape[0]

    def search(self, queries, k: int = 10, chunk: int = 262_144):
        q = jnp.asarray(np.atleast_2d(queries), jnp.float32)
        return flat_search(
            q, self.vectors_bf16, self.vectors, k=k, metric=self.metric,
            chunk=min(chunk, self.n_points),
        )
