"""Vectorized RobustPrune (alpha-relaxed neighbor pruning).

Semantics matched to the reference (NOT ported): sort candidates by
distance to the point; greedily keep the nearest remaining candidate p*;
discard every remaining candidate p' with
    alpha * d(p*, p') <= d(p, p')
stop at R kept (reference pydiskann/vamana_graph.py:642-683,
cython_utils.pyx:124-167,435-492).

TPU-native formulation: for a wave of W points at once, precompute the
[W, C, C] candidate-candidate distance tensor with one batched matmul
(MXU), then run R rounds of masked argmin + elimination as a `lax.scan`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diskrag_tpu.ops.distance import Metric, squared_norms
from diskrag_tpu.ops.topk import INVALID_ID, mask_duplicates

INF = jnp.inf


def _pairwise_within(cand_vecs: jax.Array, metric: str) -> jax.Array:
    """[W, C, D] -> [W, C, C] pairwise distances among candidates."""
    m = Metric(metric)
    if m == Metric.L2:
        n = squared_norms(cand_vecs)  # [W, C]
        cross = jnp.einsum(
            "wcd,wed->wce", cand_vecs, cand_vecs,
            precision=jax.lax.Precision.HIGHEST,
        )
        return jnp.maximum(n[:, :, None] + n[:, None, :] - 2.0 * cross, 0.0)
    if m == Metric.COSINE:
        vh = cand_vecs * jax.lax.rsqrt(squared_norms(cand_vecs) + 1e-12)[..., None]
        return 1.0 - jnp.einsum(
            "wcd,wed->wce", vh, vh, precision=jax.lax.Precision.HIGHEST
        )
    return -jnp.einsum(
        "wcd,wed->wce", cand_vecs, cand_vecs,
        precision=jax.lax.Precision.HIGHEST,
    )


@functools.partial(jax.jit, static_argnames=("degree_bound", "metric"))
def robust_prune_batch(
    point_ids: jax.Array,
    cand_ids: jax.Array,
    cand_vecs: jax.Array,
    cand_dists: jax.Array,
    alpha: jax.Array | float,
    *,
    degree_bound: int,
    metric: str = Metric.L2.value,
) -> jax.Array:
    """Prune candidate lists for a wave of points.

    Args:
      point_ids: [W] id of each point being pruned (self-edges removed).
      cand_ids: [W, C] candidate ids, -1 for invalid; duplicates allowed
        (they are masked to keep the best occurrence).
      cand_vecs: [W, C, D] candidate vectors (garbage rows OK where id=-1).
      cand_dists: [W, C] distance from the point to each candidate.
      alpha: pruning relaxation (>= 1.0). Traced — the two build passes
        reuse one compiled program with alpha 1.0 then the user's alpha
        (reference cython_utils.pyx:296-310 two-pass schedule).
      degree_bound: R, max neighbors kept.

    Returns:
      int32[W, degree_bound] pruned neighbor ids, -1 padded, in selection
      order (ascending distance of selection).
    """
    w, c = cand_ids.shape
    alpha = jnp.asarray(alpha, jnp.float32)

    dists = jnp.where(cand_ids == point_ids[:, None], INF, cand_dists)
    dists = mask_duplicates(cand_ids, dists)

    pair = _pairwise_within(cand_vecs, metric)  # [W, C, C]

    def step(active_dists, _):
        sel = jnp.argmin(active_dists, axis=1)  # [W]
        sel_dist = jnp.take_along_axis(active_dists, sel[:, None], axis=1)[:, 0]
        ok = sel_dist < INF
        sel_id = jnp.where(
            ok, jnp.take_along_axis(cand_ids, sel[:, None], axis=1)[:, 0], INVALID_ID
        )
        # eliminate candidates dominated by the selected one (incl. itself:
        # d(p*, p*) = 0 <= d(p, p*))
        row = jnp.take_along_axis(pair, sel[:, None, None], axis=1)[:, 0, :]  # [W, C]
        eliminate = (alpha * row <= active_dists) & ok[:, None]
        active_dists = jnp.where(eliminate, INF, active_dists)
        return active_dists, sel_id

    _, selected = jax.lax.scan(step, dists, None, length=degree_bound)
    return jnp.transpose(selected)  # [W, degree_bound]
