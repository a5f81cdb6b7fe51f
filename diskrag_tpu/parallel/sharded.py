"""Sharded Vamana index: partitioned sub-indexes + ICI-merged top-k.

Design (TPU-native; no reference counterpart — SURVEY.md §2.6):
  - vectors are partitioned round-robin into S shards; each shard gets an
    independent Vamana graph (local ids) plus a local->global id map;
  - at query time every device searches its own shard with the batched
    frontier loop, then per-shard top-k lists are all-gathered over the
    "shard" mesh axis (ICI) and merged on every device;
  - queries can additionally be data-parallel over a "data" mesh axis
    (each data row sees the full shard set);
  - builds are embarrassingly parallel over shards (each shard's wave
    steps touch only local arrays).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import os
import pathlib

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diskrag_tpu.graph.build import build_vamana
from diskrag_tpu.graph.knn_build import build_vamana_knn
from diskrag_tpu.graph.search import _frontier_search, _gathered_distance
from diskrag_tpu.ops.distance import Metric
from diskrag_tpu.ops.topk import INVALID_ID


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class ShardedIndex:
    """Stacked per-shard index arrays (leading axis = shard).

    vectors:    float32[S, Ns, D]
    adjacency:  int32[S, Ns, R]   (local ids)
    medoids:    int32[S]
    global_ids: int32[S, Ns]      (local -> global; -1 for padding rows)
    """

    vectors: jax.Array
    adjacency: jax.Array
    medoids: jax.Array
    global_ids: jax.Array
    metric: str = dataclasses.field(default=Metric.L2.value, metadata={"static": True})
    # int32[S, E] per-shard local entry-point ids, padded with the shard's
    # own medoid (duplicate-medoid seeds are masked in the search loop).
    # None = medoid-only seeding.
    entry_points: jax.Array | None = None

    @property
    def n_shards(self) -> int:
        return self.vectors.shape[0]


def build_sharded(
    vectors: np.ndarray,
    n_shards: int,
    *,
    degree_bound: int = 32,
    build_width: int = 64,
    alpha: float = 1.2,
    metric: str = Metric.L2.value,
    seed: int = 0,
    wave_size: int | None = None,
    build_method: str = "knn",
) -> ShardedIndex:
    """Partition + build per-shard Vamana graphs.

    Runs shard builds sequentially on the available device(s); on a pod
    each host would build its own shards (the build itself is the
    embarrassingly-parallel part). build_method "knn" (default, the MXU
    fast path incl. per-shard entry points) or "wave" (insertion).
    """
    vectors = np.asarray(vectors, np.float32)
    n, d = vectors.shape
    rng = np.random.default_rng(seed)
    perm = rng.permutation(n)
    per = -(-n // n_shards)  # ceil
    pad = per * n_shards - n
    # pad with wrap-around copies; padding rows masked out via global_ids=-1
    perm_padded = np.concatenate([perm, perm[:pad]])
    shard_gids = perm_padded.reshape(n_shards, per).astype(np.int32)
    valid = np.ones_like(shard_gids, dtype=bool)
    if pad:
        valid[-1, per - pad:] = False

    vecs, adjs, meds, gids, entries = [], [], [], [], []
    for s in range(n_shards):
        local_vecs = vectors[shard_gids[s]]
        if build_method == "knn":
            idx = build_vamana_knn(
                local_vecs, degree_bound=degree_bound, alpha=alpha,
                metric=metric, seed=seed + s,
            )
        else:
            idx = build_vamana(
                local_vecs, degree_bound=degree_bound,
                build_width=build_width, alpha=alpha, metric=metric,
                seed=seed + s, wave_size=wave_size,
            )
        vecs.append(np.asarray(idx.vectors))
        adjs.append(np.asarray(idx.adjacency))
        meds.append(int(idx.medoid))
        g = shard_gids[s].copy()
        g[~valid[s]] = INVALID_ID
        gids.append(g)
        entries.append(
            np.zeros((0,), np.int32) if idx.entry_points is None
            else np.asarray(idx.entry_points)
        )
    e_max = max(e.shape[0] for e in entries)
    entry_arr = None
    if e_max > 0:
        # pad each shard's entry list with its own medoid (masked as a
        # duplicate seed in the search loop)
        entry_arr = jnp.asarray(np.stack([
            np.concatenate([e, np.full(e_max - e.shape[0], meds[i], np.int32)])
            for i, e in enumerate(entries)
        ]))
    return ShardedIndex(
        vectors=jnp.asarray(np.stack(vecs)),
        adjacency=jnp.asarray(np.stack(adjs)),
        medoids=jnp.asarray(np.asarray(meds, np.int32)),
        global_ids=jnp.asarray(np.stack(gids)),
        metric=Metric(metric).value,
        entry_points=entry_arr,
    )


def shard_to_mesh(index: ShardedIndex, mesh: Mesh) -> ShardedIndex:
    """Place the stacked arrays with the shard axis on the mesh's "shard"
    axis (vectors/adjacency/global_ids sharded; medoids replicated-per-
    shard via the same leading axis)."""
    spec3 = NamedSharding(mesh, P("shard", None, None))
    spec2 = NamedSharding(mesh, P("shard", None))
    spec1 = NamedSharding(mesh, P("shard"))
    return ShardedIndex(
        vectors=jax.device_put(index.vectors, spec3),
        adjacency=jax.device_put(index.adjacency, spec3),
        medoids=jax.device_put(index.medoids, spec1),
        global_ids=jax.device_put(index.global_ids, spec2),
        metric=index.metric,
        entry_points=(
            None if index.entry_points is None
            else jax.device_put(index.entry_points, spec2)
        ),
    )


@functools.partial(
    jax.jit,
    static_argnames=("search_width", "k", "max_steps", "metric", "mesh"),
)
def _sharded_search_impl(
    vectors, adjacency, medoids, global_ids, entry_points, queries,
    *, search_width: int, k: int, max_steps: int, metric: str, mesh: Mesh,
):
    n_pad_bound = mesh.shape["shard"] - 1

    def local_search(vecs, adj, med, gid, ep, q):
        # block shapes: vecs [1, Ns, D], adj [1, Ns, R], med [1], gid [1, Ns],
        # ep [1, E] (medoid-padded local entry seeds), q [Bd, D]
        vecs, adj, gid = vecs[0], adj[0], gid[0]
        med = med[0]
        ns = vecs.shape[0]

        def expand(ids):
            return _gathered_distance(
                q, vecs[jnp.clip(ids, 0, ns - 1)], metric
            )

        def seed_expand(seeds):
            from diskrag_tpu.ops.distance import pairwise_distance

            return pairwise_distance(q, vecs[seeds], metric)

        # wrap-around pad rows (gid = -1, at most S-1, all in the last
        # shard) can occupy local result slots. Under the current padding
        # scheme a pad's source row always lives in another shard and
        # outranks whatever the pad displaces, so the merge stays correct
        # — but that's a counting argument on an implementation detail;
        # over-select k + S - 1 locally, mask, and re-cut to k so the
        # merged top-k never depends on where pad sources live.
        kk = min(k + n_pad_bound, ns)
        res = _frontier_search(
            adj, med, expand, q.shape[0],
            search_width=max(search_width, kk), k=kk, max_steps=max_steps,
            entry_points=None if ep is None else ep[0],
            seed_expand_fn=seed_expand,
        )
        local_ids, local_dists = res.ids, res.dists  # [Bd, kk]
        gids = jnp.where(
            local_ids == INVALID_ID, INVALID_ID,
            gid[jnp.clip(local_ids, 0, ns - 1)],
        )
        dists = jnp.where(gids == INVALID_ID, jnp.inf, local_dists)
        # kk < k is possible on tiny shards (ns < k): cut what exists and
        # pad the list back to k with invalid slots so every shard
        # contributes a fixed [Bd, k] block to the all-gather
        neg, cut = jax.lax.top_k(-dists, min(k, kk))
        dists = -neg
        gids = jnp.take_along_axis(gids, cut, axis=1)
        if kk < k:
            pad = k - kk
            gids = jnp.pad(gids, ((0, 0), (0, pad)),
                           constant_values=INVALID_ID)
            dists = jnp.pad(dists, ((0, 0), (0, pad)),
                            constant_values=jnp.inf)
        # ICI all-gather of per-shard top-k, then merge on every device
        all_gids = jax.lax.all_gather(gids, "shard", axis=1, tiled=True)   # [Bd, S*k]
        all_dists = jax.lax.all_gather(dists, "shard", axis=1, tiled=True)
        top_d, take = jax.lax.top_k(-all_dists, k)
        top_i = jnp.take_along_axis(all_gids, take, axis=1)
        return top_i, -top_d

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
        out_specs=(P("data", None), P("data", None)),
        # outputs ARE replicated over "shard" (every device merges the same
        # all-gathered lists), but the static varying-axes checker cannot
        # infer that through top_k — disable the check.
        check_vma=False,
    )(vectors, adjacency, medoids, global_ids, entry_points, queries)


@functools.partial(
    jax.jit,
    static_argnames=("build_width", "max_incoming", "chunk", "metric", "mesh"),
)
def sharded_build_wave(
    vectors, adjacency, medoids, wave_local_ids, alpha,
    *, build_width: int, max_incoming: int, chunk: int, metric: str,
    mesh: Mesh,
):
    """One index-build step over the mesh: every shard refines one wave of
    its local points (the embarrassingly-parallel "training step" of this
    workload). vectors/adjacency/medoids/wave ids all sharded over
    "shard"; returns the updated adjacency with the same sharding."""
    from diskrag_tpu.graph.build import wave_step

    def local_wave(vecs, adj, med, wave, a):
        new_adj = wave_step(
            vecs[0], adj[0], med[0], wave[0], a,
            build_width=build_width, max_incoming=max_incoming,
            chunk=chunk, metric=metric,
        )
        return new_adj[None]

    return jax.shard_map(
        local_wave,
        mesh=mesh,
        in_specs=(
            P("shard", None, None),
            P("shard", None, None),
            P("shard"),
            P("shard", None),
            P(),
        ),
        out_specs=P("shard", None, None),
        check_vma=False,
    )(vectors, adjacency, medoids, wave_local_ids,
      jnp.asarray(alpha, jnp.float32))


@functools.partial(jax.jit, static_argnames=("k", "metric", "mesh"))
def _sharded_flat_impl(
    vectors_bf16, norms_sq, global_ids, queries,
    *, k: int, metric: str, mesh: Mesh,
):
    from diskrag_tpu.ops.flat import flat_search

    n_pad_bound = mesh.shape["shard"] - 1

    def local_scan(vecs, norms, gid, q):
        vecs, norms, gid = vecs[0], norms[0], gid[0]
        ns = vecs.shape[0]
        # pad rows (gid = -1) can hold local slots: over-select k + S - 1,
        # mask, re-cut to k (rationale in _sharded_search_impl)
        kk = min(k + n_pad_bound, ns)
        # single tile when the [Bd, Ns] f32 block fits ~2 GB (3.5x faster
        # than per-tile top-k merging — see ops/flat.py)
        d, li = flat_search(
            q, vecs, norms, None, k=kk, metric=metric,
            chunk=min(ns, max(32_768, (2**29) // max(q.shape[0], 1))),
        )
        gi = jnp.where(li == -1, -1, gid[jnp.clip(li, 0, vecs.shape[0] - 1)])
        d = jnp.where(gi == -1, jnp.inf, d)
        # tiny shards (ns < k): cut min(k, kk) then pad back to k so the
        # all-gather block shape stays [Bd, k] (same as the graph path)
        neg, cut = jax.lax.top_k(-d, min(k, kk))
        d = -neg
        gi = jnp.take_along_axis(gi, cut, axis=1)
        if kk < k:
            pad = k - kk
            gi = jnp.pad(gi, ((0, 0), (0, pad)), constant_values=-1)
            d = jnp.pad(d, ((0, 0), (0, pad)), constant_values=jnp.inf)
        all_g = jax.lax.all_gather(gi, "shard", axis=1, tiled=True)
        all_d = jax.lax.all_gather(d, "shard", axis=1, tiled=True)
        neg, take = jax.lax.top_k(-all_d, k)
        return jnp.take_along_axis(all_g, take, axis=1), -neg

    return jax.shard_map(
        local_scan,
        mesh=mesh,
        in_specs=(
            P("shard", None, None),
            P("shard", None),
            P("shard", None),
            P("data", None),
        ),
        out_specs=(P("data", None), P("data", None)),
        check_vma=False,
    )(vectors_bf16, norms_sq, global_ids, queries)


def sharded_flat_search(
    vectors_bf16, norms_sq, global_ids, queries, mesh: Mesh, *, k: int,
    metric: str = "l2",
):
    """Sharded exhaustive scan: each device streams its vector shard
    through the MXU; per-shard top-k lists merge over the ICI all-gather.
    The scale-out mode for datasets above one chip's HBM
    (vectors_bf16 [S, Ns, D] / norms [S, Ns] / global_ids [S, Ns] sharded
    over "shard"; queries split over "data" — odd batch sizes padded)."""
    queries = jnp.asarray(queries, jnp.float32)
    b = queries.shape[0]
    pad = (-b) % mesh.shape["data"]
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)]
        )
    q = jax.device_put(queries, NamedSharding(mesh, P("data", None)))
    ids, dists = _sharded_flat_impl(
        vectors_bf16, norms_sq, global_ids, q, k=k, metric=metric, mesh=mesh
    )
    return ids[:b], dists[:b]


def sharded_search(
    index: ShardedIndex,
    queries,
    mesh: Mesh,
    *,
    search_width: int,
    k: int,
    max_steps: int | None = None,
):
    """Search all shards; returns (global ids [B, k], dists [B, k]).

    The query batch is split over the "data" mesh axis; every device
    searches its shard for its query block and the per-shard candidate
    lists are merged with an all-gather over the "shard" axis.
    """
    if max_steps is None:
        max_steps = 2 * search_width
    queries = jnp.asarray(queries, jnp.float32)
    b = queries.shape[0]
    n_data = mesh.shape["data"]
    # the batch is split over the "data" mesh axis — pad odd sizes and
    # slice the padding back off
    pad = (-b) % n_data
    if pad:
        queries = jnp.concatenate(
            [queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)]
        )
    q = jax.device_put(queries, NamedSharding(mesh, P("data", None)))
    ids, dists = _sharded_search_impl(
        index.vectors, index.adjacency, index.medoids, index.global_ids,
        index.entry_points, q,
        search_width=search_width, k=k, max_steps=max_steps,
        metric=index.metric, mesh=mesh,
    )
    return ids[:b], dists[:b]


SHARDED_FORMAT_VERSION = "tpu-sharded-1"


def save_sharded_index(index: ShardedIndex, index_dir: str | os.PathLike) -> None:
    """Persist a ShardedIndex so serving restarts skip the per-shard builds.

    Layout (all-atomic .tmp -> rename writes, same durability behavior as
    index/persist.py; the reference has no multi-shard artifact — its index
    is one mmap file, io/diskann_persist.py:11-24):

        <index_dir>/
          vectors.npy       float32[S, Ns, D]
          adjacency.npy     int32[S, Ns, R]
          medoids.npy       int32[S]
          global_ids.npy    int32[S, Ns]
          entry_points.npy  int32[S, E]        (only when present)
          sharded_meta.json format/shape/metric
    """
    from diskrag_tpu.index.persist import _atomic_save_npy, _atomic_write_bytes

    d = pathlib.Path(index_dir)
    d.mkdir(parents=True, exist_ok=True)
    _atomic_save_npy(d / "vectors.npy", np.asarray(index.vectors, np.float32))
    _atomic_save_npy(d / "adjacency.npy", np.asarray(index.adjacency, np.int32))
    _atomic_save_npy(d / "medoids.npy", np.asarray(index.medoids, np.int32))
    _atomic_save_npy(d / "global_ids.npy", np.asarray(index.global_ids, np.int32))
    if index.entry_points is not None:
        _atomic_save_npy(
            d / "entry_points.npy", np.asarray(index.entry_points, np.int32)
        )
    s, ns, dim = index.vectors.shape
    meta = {
        "format": SHARDED_FORMAT_VERSION,
        "n_shards": int(s),
        "points_per_shard": int(ns),
        "dim": int(dim),
        "degree_bound": int(index.adjacency.shape[-1]),
        "metric": index.metric,
        "has_entry_points": index.entry_points is not None,
    }
    _atomic_write_bytes(
        d / "sharded_meta.json", json.dumps(meta, indent=2).encode()
    )


def load_sharded_index(
    index_dir: str | os.PathLike, mesh: Mesh | None = None
) -> ShardedIndex:
    """Load a saved ShardedIndex.

    Without `mesh` the arrays stay host-resident (numpy, memory-mapped) —
    nothing is committed to a device; consumers place them how they need
    (e.g. ShardedHostTier keeps only a compressed copy on device). With
    `mesh`, shard_to_mesh device_puts each array straight into its
    sharded layout, so no device ever holds more than its own shard."""
    d = pathlib.Path(index_dir)
    meta = json.loads((d / "sharded_meta.json").read_text())
    if meta.get("format") != SHARDED_FORMAT_VERSION:
        raise ValueError(
            f"unsupported sharded index format: {meta.get('format')!r}"
        )
    entry_arr = None
    if meta.get("has_entry_points"):
        entry_arr = np.load(d / "entry_points.npy")
    index = ShardedIndex(
        vectors=np.load(d / "vectors.npy", mmap_mode="r"),
        adjacency=np.load(d / "adjacency.npy", mmap_mode="r"),
        medoids=np.load(d / "medoids.npy"),
        global_ids=np.load(d / "global_ids.npy"),
        metric=Metric(meta["metric"]).value,
        entry_points=entry_arr,
    )
    if mesh is not None:
        index = shard_to_mesh(index, mesh)
    return index
