"""Multi-host (DCN-analog) dataset distribution and search.

SURVEY §2.6/§5.8 names two communication tiers for a pod deployment:
ICI (the chip-to-chip ring inside one host's slice) for the per-query
shard merges, and DCN (the data-center network between hosts) for
dataset/ingest distribution. The single-process code in
`parallel/sharded.py` covers the first tier; this module adds the
second: N processes, each owning a contiguous block of index shards,
build their shards LOCALLY (ingest never crosses DCN — only the
coordinator handshake and the search-time collectives do) and then
serve one GLOBAL sharded search whose all-gather merge rides ICI within
a host and DCN across hosts, exactly where the mesh axes put it.

The reference has no distributed story at all (SURVEY §2.6 — one
process, one mmap file); this is blueprint-native design, not parity.

Execution model (jax.distributed / SPMD):
  - every process calls `initialize(...)` and then runs the SAME
    program over a global mesh assembled from all processes' devices;
  - per-process arrays become global arrays via
    `jax.make_array_from_process_local_data` — each process contributes
    the shard rows it owns (`P("shard", ...)` placements) or an
    identical replicated copy (queries);
  - `_sharded_search_impl` / `_sharded_flat_impl` (parallel/sharded.py)
    run unchanged: shard_map sees one device axis and does not care
    whether a given all-gather hop is ICI or DCN — the mesh does.

CPU testing: works with two localhost processes, gloo collectives and
`--xla_force_host_platform_device_count` (tests/test_multihost.py
spawns exactly that; the same code paths compile for a TPU pod where
each host's jax runtime handles its slice).
"""

from __future__ import annotations

import dataclasses
import logging

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from diskrag_tpu.graph.types import Metric
from diskrag_tpu.ops.topk import INVALID_ID
from diskrag_tpu.parallel.sharded import (
    ShardedIndex,
    _sharded_flat_impl,
    _sharded_search_impl,
)

logger = logging.getLogger(__name__)


def initialize(
    coordinator_address: str,
    num_processes: int,
    process_id: int,
) -> None:
    """Join the multi-process runtime (idempotent per process).

    On CPU backends the cross-process collectives need an explicit
    implementation — gloo ships with jax and is what the two-process
    test uses; TPU backends ignore the setting (the TPU runtime has its
    own ICI/DCN collectives)."""
    try:
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    except Exception:  # noqa: BLE001 — unknown on non-CPU-only builds
        pass
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_shard_mesh(n_data: int = 1) -> Mesh:
    """A ("data", "shard") mesh over ALL processes' devices, shard-major
    within each process: device order is jax.devices() (process 0's
    local devices first, then process 1's, ...), so a host's shards sit
    on its own chips and the shard all-gather crosses DCN exactly
    (num_processes - 1) times per hop instead of interleaving hosts."""
    devices = jax.devices()
    n = len(devices)
    if n % n_data:
        raise ValueError(f"{n} devices not divisible by n_data={n_data}")
    arr = np.asarray(devices).reshape(n_data, n // n_data)
    return Mesh(arr, ("data", "shard"))


def _local_to_global(mesh: Mesh, spec: P, local: np.ndarray, n_global_rows):
    """Assemble a global array from each process's rows (axis 0 =
    sharded leading axis, or replicated when spec has no axis names)."""
    shape = (n_global_rows,) + tuple(local.shape[1:])
    if not any(spec):
        shape = tuple(local.shape)
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.ascontiguousarray(local), shape
    )


def build_local_shards(
    vectors: np.ndarray,
    global_id_base: int,
    *,
    n_local_shards: int,
    degree_bound: int = 32,
    alpha: float = 1.2,
    metric: str = Metric.L2.value,
    seed: int = 0,
    entry_width: int = 8,
    rows_per_shard: int | None = None,
) -> dict[str, np.ndarray]:
    """Build THIS host's shards from THIS host's slice of the dataset.

    `vectors` is the contiguous block of the global dataset this host
    ingested (global ids `global_id_base .. global_id_base + len - 1`);
    nothing here communicates — ingest distribution is "each host reads
    and builds its own block", the DCN carries no vectors.

    `rows_per_shard` must be the GLOBAL per-shard row count (every
    process must agree on padded shapes for the global array assembly);
    None derives it from this block alone (fine when all blocks are
    equal-sized). `entry_width` fixes the per-shard entry-point lane
    count for the same reason (padded with the shard's medoid, which the
    search loop masks as a duplicate seed).

    Returns stacked per-shard arrays (leading axis = local shard) ready
    for `assemble_global_index`.
    """
    from diskrag_tpu.graph.knn_build import build_vamana_knn

    vectors = np.asarray(vectors, np.float32)
    n = vectors.shape[0]
    per = rows_per_shard or -(-n // n_local_shards)
    if per * n_local_shards < n:
        raise ValueError(
            f"rows_per_shard={per} x {n_local_shards} shards < {n} rows"
        )
    vecs, adjs, meds, gids, entries = [], [], [], [], []
    for s in range(n_local_shards):
        lo, hi = s * per, min((s + 1) * per, n)
        block = vectors[lo:hi]
        idx = build_vamana_knn(
            block, degree_bound=degree_bound, alpha=alpha, metric=metric,
            seed=seed + s,
        )
        pad = per - (hi - lo)
        v = np.asarray(idx.vectors)
        a = np.asarray(idx.adjacency)
        g = np.arange(global_id_base + lo, global_id_base + hi,
                      dtype=np.int32)
        if pad:  # equal shapes across shards/processes; pad rows masked
            v = np.concatenate([v, np.zeros((pad, v.shape[1]), v.dtype)])
            a = np.concatenate(
                [a, np.full((pad, a.shape[1]), INVALID_ID, a.dtype)]
            )
            g = np.concatenate([g, np.full(pad, INVALID_ID, np.int32)])
        med = int(idx.medoid)
        e = (
            np.zeros((0,), np.int32) if idx.entry_points is None
            else np.asarray(idx.entry_points, np.int32)[:entry_width]
        )
        e = np.concatenate(
            [e, np.full(entry_width - e.shape[0], med, np.int32)]
        )
        vecs.append(v)
        adjs.append(a)
        meds.append(med)
        gids.append(g)
        entries.append(e)
    return {
        "vectors": np.stack(vecs),
        "adjacency": np.stack(adjs),
        "medoids": np.asarray(meds, np.int32),
        "global_ids": np.stack(gids),
        "entry_points": np.stack(entries),
        "metric": metric,
    }


def assemble_global_index(
    local: dict[str, np.ndarray], mesh: Mesh, n_global_shards: int
) -> ShardedIndex:
    """Lift each process's stacked shard arrays into one global
    ShardedIndex over `mesh` — the only step where shard placement
    touches the network, and it moves no data between hosts (every
    process contributes exactly the rows that land on its own devices)."""
    return ShardedIndex(
        vectors=_local_to_global(
            mesh, P("shard", None, None), local["vectors"], n_global_shards
        ),
        adjacency=_local_to_global(
            mesh, P("shard", None, None), local["adjacency"], n_global_shards
        ),
        medoids=_local_to_global(
            mesh, P("shard"), local["medoids"], n_global_shards
        ),
        global_ids=_local_to_global(
            mesh, P("shard", None), local["global_ids"], n_global_shards
        ),
        metric=str(local["metric"]),
        entry_points=_local_to_global(
            mesh, P("shard", None), local["entry_points"], n_global_shards
        ),
    )


def multihost_sharded_search(
    index: ShardedIndex,
    queries: np.ndarray,
    mesh: Mesh,
    *,
    search_width: int,
    k: int,
    max_steps: int | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Global graph search over a multi-process mesh.

    Every process passes the SAME query batch (replicated input — the
    serving front-end broadcasts queries, which is the one DCN transfer
    besides the merge collectives) and gets the full merged [B, k]
    result back as host numpy. Identical to
    `parallel.sharded.sharded_search` except the query upload goes
    through `make_array_from_process_local_data` (a plain device_put
    cannot target devices this process does not own) and the replicated
    output is read from this process's addressable shard."""
    if max_steps is None:
        max_steps = 2 * search_width
    q_np, b = _pad_queries(queries, mesh)
    q = _local_to_global(mesh, P("data", None), q_np, q_np.shape[0])
    ids, dists = _sharded_search_impl(
        index.vectors, index.adjacency, index.medoids, index.global_ids,
        index.entry_points, q,
        search_width=search_width, k=k, max_steps=max_steps,
        metric=index.metric, mesh=mesh,
    )
    return _replicated_to_host(ids, b), _replicated_to_host(dists, b)


def multihost_flat_search(
    vectors_bf16, norms_sq, global_ids, queries, mesh: Mesh, *, k: int,
    metric: str = "l2",
) -> tuple[np.ndarray, np.ndarray]:
    """Global exhaustive bf16 scan over a multi-process mesh (the
    sharded_flat serving mode's DCN form). Operand arrays must already
    be global (assemble with `_local_to_global` / P("shard", ...))."""
    q_np, b = _pad_queries(queries, mesh)
    q = _local_to_global(mesh, P("data", None), q_np, q_np.shape[0])
    ids, dists = _sharded_flat_impl(
        vectors_bf16, norms_sq, global_ids, q, k=k, metric=metric,
        mesh=mesh,
    )
    return _replicated_to_host(ids, b), _replicated_to_host(dists, b)


def _pad_queries(queries, mesh: Mesh) -> tuple[np.ndarray, int]:
    q_np = np.asarray(queries, np.float32)
    if q_np.ndim == 1:
        q_np = q_np[None, :]
    b = q_np.shape[0]
    pad = (-b) % mesh.shape["data"]
    if pad:
        q_np = np.concatenate(
            [q_np, np.zeros((pad, q_np.shape[1]), q_np.dtype)]
        )
    return q_np, b


def _replicated_to_host(arr: jax.Array, b: int) -> np.ndarray:
    """Read a [B', ...] output whose rows are split over "data" and
    replicated over "shard" back to full host numpy on every process.
    With the default data=1 mesh every process holds a full replica and
    this is a local read; a data axis spanning hosts falls back to one
    process_allgather (a DCN hop the caller opted into by splitting the
    batch across hosts)."""
    blocks = {
        int(s.index[0].start or 0): s.data for s in arr.addressable_shards
    }
    if sum(d.shape[0] for d in blocks.values()) >= arr.shape[0]:
        rows = [np.asarray(d) for _, d in sorted(blocks.items())]
        return np.concatenate(rows)[:b]
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(arr))[:b]


@dataclasses.dataclass
class MultihostConfig:
    """Topology declaration for a pod deployment (DESIGN.md "ICI vs
    DCN"): `shards_per_host` graph shards live on each host's chips;
    queries fan out replicated; merges all-gather over ICI first (the
    mesh's intra-host device order) and cross DCN once per host."""

    coordinator_address: str
    num_processes: int
    process_id: int
    shards_per_host: int

    @property
    def n_global_shards(self) -> int:
        return self.num_processes * self.shards_per_host

    def my_block(self, n_total_rows: int) -> tuple[int, int]:
        """[lo, hi) global-row block this host ingests (contiguous,
        equal-padded; the last host's block may be short)."""
        per_host = -(-n_total_rows // self.num_processes)
        lo = self.process_id * per_host
        return lo, min(lo + per_host, n_total_rows)
