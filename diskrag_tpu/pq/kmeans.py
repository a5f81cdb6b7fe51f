"""Batched k-means: m independent problems trained at once on device.

The reference trains PQ codebooks with m sequential sklearn KMeans fits
(k-means++ init, Lloyd; reference pydiskann/pq/fast_pq.py:225-241, with
adaptive n_init/max_iter by dataset size at fast_pq.py:188-195). Here all
m subspace problems run together: data is [m, N, d], centroids [m, K, d],
and every step is a batched matmul (assignment) + one-hot matmul
(centroid update) on the MXU. Assignment sweeps are chunked over N with
`lax.scan` so the [m, chunk, K] distance tile stays small regardless of
dataset size. k-means++ seeding is a `fori_loop` over K rounds of
distance-proportional Gumbel sampling, vectorized over m.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _batched_sq_dists(data: jax.Array, centers: jax.Array) -> jax.Array:
    """[m, N, d] x [m, K, d] -> [m, N, K] squared L2."""
    dn = jnp.sum(jnp.square(data), axis=-1)  # [m, N]
    cn = jnp.sum(jnp.square(centers), axis=-1)  # [m, K]
    cross = jnp.einsum(
        "mnd,mkd->mnk", data, centers, precision=jax.lax.Precision.HIGHEST
    )
    return jnp.maximum(dn[..., None] + cn[:, None, :] - 2.0 * cross, 0.0)


def _kmeanspp_init(key: jax.Array, data: jax.Array, k: int) -> jax.Array:
    """k-means++ seeding, batched over the leading m axis.

    data: [m, N, d] -> [m, K, d]. Sequential over K (inherent to ++), but
    each round is one batched [m, N] distance update; the next center is
    sampled with probability proportional to the current min squared
    distance via the Gumbel-max trick.
    """
    m, n, d = data.shape

    k0, k_loop = jax.random.split(key)
    first = jax.random.randint(k0, (m,), 0, n)
    centers0 = jnp.zeros((m, k, d), data.dtype)
    centers0 = centers0.at[:, 0].set(data[jnp.arange(m), first])

    min_d0 = jnp.sum(
        jnp.square(data - centers0[:, 0][:, None, :]), axis=-1
    )  # [m, N]

    def body(i, carry):
        centers, min_d = carry
        ki = jax.random.fold_in(k_loop, i)
        g = jax.random.gumbel(ki, (m, n))
        # sample ∝ min_d: argmax(log(min_d) + gumbel); zero-distance points
        # get -inf logits
        logits = jnp.where(min_d > 0, jnp.log(min_d), -jnp.inf) + g
        # if all distances are 0 (degenerate data), fall back to uniform
        all_zero = jnp.all(min_d <= 0, axis=1)
        uniform_pick = jax.random.randint(ki, (m,), 0, n)
        pick = jnp.where(all_zero, uniform_pick, jnp.argmax(logits, axis=1))
        new_c = data[jnp.arange(m), pick]  # [m, d]
        centers = jax.lax.dynamic_update_slice_in_dim(
            centers, new_c[:, None, :], i, axis=1
        )
        nd = jnp.sum(jnp.square(data - new_c[:, None, :]), axis=-1)
        return centers, jnp.minimum(min_d, nd)

    centers, _ = jax.lax.fori_loop(1, k, body, (centers0, min_d0))
    return centers


def _d2_init(key: jax.Array, data: jax.Array, k: int) -> jax.Array:
    """One-shot D²-weighted seeding (k-means||-flavored): one random
    center, then the remaining k-1 sampled *jointly* without replacement
    with probability ∝ distance² via Gumbel top-k. One distance pass +
    one top_k instead of k sequential rounds — the right trade when k is
    large (IVF cells, entry points) and Lloyd iterations follow anyway.
    """
    m, n, d = data.shape
    k0, k1 = jax.random.split(key)
    first = jax.random.randint(k0, (m,), 0, n)
    c0 = data[jnp.arange(m), first]  # [m, d]
    min_d = jnp.sum(jnp.square(data - c0[:, None, :]), axis=-1)  # [m, N]
    g = jax.random.gumbel(k1, (m, n), data.dtype)
    logits = jnp.where(min_d > 0, jnp.log(min_d), -jnp.inf) + g
    _, picks = jax.lax.top_k(logits, k - 1)  # [m, k-1]
    rest = jnp.take_along_axis(data, picks[..., None], axis=1)
    return jnp.concatenate([c0[:, None, :], rest], axis=1)


@functools.partial(jax.jit, static_argnames=("k", "max_iter", "chunk", "init"))
def kmeans_fit(
    key: jax.Array,
    data: jax.Array,
    k: int,
    max_iter: int = 25,
    chunk: int = 4096,
    init: str = "kmeans++",
) -> tuple[jax.Array, jax.Array]:
    """Fit m batched k-means problems.

    Args:
      data: [m, N, d] — m independent point sets.
      k: number of centroids per problem (256 for PQ).
      max_iter: Lloyd iterations (fixed count for static shapes; the
        reference's sklearn runs up to 100-300 but converges far earlier).
      chunk: N-axis tile for assignment sweeps.
      init: "kmeans++" (k sequential D² rounds — best quality, right for
        small k like PQ's 256) or "d2" (one-shot joint D² sampling — k
        parallel, right for large k where k sequential device rounds
        dominate, e.g. IVF cells / search entry points).

    Returns:
      (centers [m, K, d], assignments [m, N] int32).
    """
    m, n, d = data.shape
    chunk = min(chunk, n)
    if init == "d2":
        centers = _d2_init(key, data, k)
    else:
        centers = _kmeanspp_init(key, data, k)

    pad = (-n) % chunk
    data_p = jnp.pad(data, ((0, 0), (0, pad), (0, 0)))
    n_chunks = (n + pad) // chunk
    # [C, m, chunk, d] so scan iterates over tiles
    tiles = data_p.reshape(m, n_chunks, chunk, d).transpose(1, 0, 2, 3)
    mask = (jnp.arange(n + pad) < n).astype(data.dtype)
    mask_t = mask.reshape(n_chunks, chunk)

    def lloyd(_, centers):
        def tile_step(carry, inp):
            sums, counts = carry
            td, tm = inp  # [m, chunk, d], [chunk]
            dist = _batched_sq_dists(td, centers)  # [m, chunk, K]
            assign = jnp.argmin(dist, axis=-1)
            oh = jax.nn.one_hot(assign, k, dtype=data.dtype) * tm[None, :, None]
            sums = sums + jnp.einsum(
                "mnk,mnd->mkd", oh, td, precision=jax.lax.Precision.HIGHEST
            )
            counts = counts + jnp.sum(oh, axis=1)
            return (sums, counts), None

        init = (
            jnp.zeros((m, k, d), data.dtype),
            jnp.zeros((m, k), data.dtype),
        )
        (sums, counts), _ = jax.lax.scan(tile_step, init, (tiles, mask_t))
        new_centers = sums / jnp.maximum(counts[..., None], 1.0)
        # empty clusters keep their previous centroid
        return jnp.where(counts[..., None] > 0, new_centers, centers)

    centers = jax.lax.fori_loop(0, max_iter, lloyd, centers)

    def assign_tile(td):
        return jnp.argmin(_batched_sq_dists(td, centers), axis=-1)

    assign = jax.lax.map(assign_tile, tiles)  # [C, m, chunk]
    assign = assign.transpose(1, 0, 2).reshape(m, n + pad)[:, :n]
    return centers, assign.astype(jnp.int32)
