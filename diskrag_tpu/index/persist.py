"""Index persistence.

Artifact set mirrors the reference's
`collections/<name>/index/{index.dat, meta.json, pq_model.pkl, pq_codes.bin}`
(reference scripts/tools/build_index.py:251-332, io/diskann_persist.py:11-206)
with a TPU-friendly primary layout:

    index/
      vectors.npy        float32[N, D]
      adjacency.npy      int32[N, R], -1 padded
      meta.json          params + stats (superset of the reference's meta)
      pq_codes.npy       uint8[N, m]            (when PQ enabled)
      pq_model.npz       codebooks float32[m, 256, ds] + params
      index.dat          optional compat records (see write_compat_records)

Durability behavior matched from the reference: atomic `.tmp` -> rename
writes with reload validation for the PQ model
(reference io/diskann_persist.py:33-105, collection.py:98-137).

The packed `index.dat` record format — float32[dim] vector ‖ uint32[R]
neighbors, record_size 4*(dim+R) (reference io/diskann_persist.py:15-24) —
is kept for compat tooling and the host/disk tier, with one deliberate
change: padding slots store 0xFFFFFFFF instead of 0 (the reference's
zero-padding aliases node 0 — SURVEY.md §7 quirks).
"""

from __future__ import annotations

import json
import logging
import os
import pathlib

import jax.numpy as jnp
import numpy as np

from diskrag_tpu.graph.types import VamanaIndex
from diskrag_tpu.pq.product_quantizer import ProductQuantizer

logger = logging.getLogger(__name__)

FORMAT_VERSION = "tpu-1"
COMPAT_PAD = np.uint32(0xFFFFFFFF)


def _atomic_write_bytes(path: pathlib.Path, data: bytes) -> None:
    tmp = path.with_suffix(path.suffix + ".tmp")
    tmp.write_bytes(data)
    os.replace(tmp, path)


def _atomic_save_npy(path: pathlib.Path, arr: np.ndarray) -> None:
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        np.save(f, arr)
    os.replace(tmp, path)


class IndexStore:
    """Filesystem layout helper for one index directory."""

    def __init__(self, index_dir: str | os.PathLike):
        self.dir = pathlib.Path(index_dir)

    @property
    def vectors_path(self):
        return self.dir / "vectors.npy"

    @property
    def adjacency_path(self):
        return self.dir / "adjacency.npy"

    @property
    def meta_path(self):
        return self.dir / "meta.json"

    @property
    def pq_codes_path(self):
        return self.dir / "pq_codes.npy"

    @property
    def pq_model_path(self):
        return self.dir / "pq_model.npz"

    @property
    def pq_aux_path(self):
        # residual-PQ per-point serving arrays (pq/residual.py
        # "serving decomposition"): point_cell int32[N] + point_bias f32[N]
        return self.dir / "pq_aux.npz"

    @property
    def compat_path(self):
        return self.dir / "index.dat"

    def exists(self) -> bool:
        return self.meta_path.exists() and self.vectors_path.exists()


def save_pq_artifacts(
    store: IndexStore,
    pq,
    pq_codes: np.ndarray,
    coarse_ids: np.ndarray | None = None,
) -> dict:
    """Persist pq_codes.npy + pq_model.npz (atomic, reload-validated like
    the reference's pkl writer, io/diskann_persist.py:79-105); returns the
    meta keys describing them. A ResidualPQ additionally persists
    pq_aux.npz (coarse cell ids + per-point serving bias) and its coarse
    codebook rides inside pq_model.npz (pq/residual.py). An IntQuantizer
    (pq/intq.py) persists its int8 rows in pq_codes.npy (self-contained —
    no aux file)."""
    from diskrag_tpu.pq.intq import IntQuantizer
    from diskrag_tpu.pq.residual import ResidualPQ, pq_from_arrays

    if pq_codes is None:
        raise ValueError("pq given without pq_codes")
    residual = isinstance(pq, ResidualPQ)
    intq = isinstance(pq, IntQuantizer)
    if residual and coarse_ids is None:
        raise ValueError("ResidualPQ needs coarse_ids alongside the codes")
    pq_codes = np.asarray(pq_codes, np.int8 if intq else np.uint8)
    _atomic_save_npy(store.pq_codes_path, pq_codes)
    tmp = store.pq_model_path.with_suffix(".npz.tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **pq.to_arrays())
    with np.load(tmp) as loaded:
        pq_from_arrays(dict(loaded))
    os.replace(tmp, store.pq_model_path)
    if intq:
        return {
            "pq_kind": f"int{pq.bits}",
            "iq_row_width": int(pq.row_width),
            "iq_n_cells": int(pq.n_cells),
        }
    meta = {
        "n_subvectors": int(pq.n_subvectors),
        "pq_centroids": int(pq.n_centroids),
        "pq_kind": "residual" if residual else "plain",
    }
    if residual:
        cells = np.asarray(coarse_ids, np.int32)
        bias = np.asarray(pq.point_bias(pq_codes, cells), np.float32)
        tmp = store.pq_aux_path.with_suffix(".npz.tmp")
        with open(tmp, "wb") as f:
            np.savez(f, point_cell=cells, point_bias=bias)
        os.replace(tmp, store.pq_aux_path)
        meta["pq_n_coarse"] = int(pq.n_coarse)
    return meta


def load_pq_aux(
    store: IndexStore, expect_n: int | None = None
) -> tuple[np.ndarray | None, np.ndarray | None]:
    """(point_cell int32[N], point_bias f32[N]) for a residual-PQ index,
    (None, None) when absent (plain PQ or no PQ). `expect_n` (the code
    row count) guards against a torn/stale aux file: device gathers clamp
    out-of-bounds indices instead of erroring, so a length mismatch would
    otherwise serve silently wrong traversal distances."""
    if not store.pq_aux_path.exists():
        return None, None
    with np.load(store.pq_aux_path) as z:
        cells = np.asarray(z["point_cell"], np.int32)
        bias = np.asarray(z["point_bias"], np.float32)
    if expect_n is not None and (
        cells.shape[0] != expect_n or bias.shape[0] != expect_n
    ):
        raise ValueError(
            f"pq_aux.npz is stale: {cells.shape[0]} cells / "
            f"{bias.shape[0]} biases for {expect_n} code rows — rebuild "
            f"the PQ artifacts (cli doctor, or --force-rebuild)"
        )
    return cells, bias


def save_index(
    index_dir: str | os.PathLike,
    index: VamanaIndex,
    *,
    pq: ProductQuantizer | None = None,
    pq_codes: np.ndarray | None = None,
    pq_coarse_ids: np.ndarray | None = None,
    meta_extra: dict | None = None,
    write_compat: bool = False,
    host_vectors: np.ndarray | None = None,
) -> dict:
    """Persist a Vamana index; returns the meta dict written.

    `host_vectors`: optional host-side copy of `index.vectors` — when the
    caller still holds the numpy array the index was built from, passing
    it here skips a full device->host fetch of the vector matrix (on the
    tunneled TPU that fetch runs at single-digit MB/s; 512 MB at 1M x 128)."""
    store = IndexStore(index_dir)
    store.dir.mkdir(parents=True, exist_ok=True)

    if host_vectors is not None:
        vectors = np.asarray(host_vectors, np.float32)
        if vectors.shape != tuple(index.vectors.shape):
            raise ValueError(
                f"host_vectors shape {vectors.shape} != index "
                f"{tuple(index.vectors.shape)}"
            )
    else:
        vectors = np.asarray(index.vectors, np.float32)
    adjacency = np.asarray(index.adjacency, np.int32)
    _atomic_save_npy(store.vectors_path, vectors)
    _atomic_save_npy(store.adjacency_path, adjacency)

    meta = {
        "format_version": FORMAT_VERSION,
        "index_type": "vamana",
        "dimension": int(vectors.shape[1]),
        "R": int(adjacency.shape[1]),
        "num_points": int(vectors.shape[0]),
        "medoid_idx": int(index.medoid),
        "distance_metric": index.metric,
        "use_pq": pq is not None,
    }
    if index.entry_points is not None:
        meta["entry_points"] = np.asarray(index.entry_points).tolist()
    if pq is not None:
        meta.update(
            save_pq_artifacts(store, pq, pq_codes, coarse_ids=pq_coarse_ids)
        )
    if meta_extra:
        meta.update(meta_extra)
    _atomic_write_bytes(
        store.meta_path, json.dumps(meta, indent=2).encode("utf-8")
    )
    if write_compat:
        write_compat_records(store.compat_path, vectors, adjacency)
    return meta


def load_index(
    index_dir: str | os.PathLike,
    *,
    to_device: bool = True,
) -> tuple[VamanaIndex, ProductQuantizer | None, np.ndarray | None, dict]:
    """Load (index, pq_model | None, pq_codes | None, meta)."""
    store = IndexStore(index_dir)
    if not store.exists():
        raise FileNotFoundError(f"no index at {store.dir}")
    meta = json.loads(store.meta_path.read_text())
    vectors = np.load(store.vectors_path)
    adjacency = np.load(store.adjacency_path)
    if vectors.shape[0] != meta["num_points"]:
        raise ValueError("meta/num_points mismatch with vectors.npy")
    eps = meta.get("entry_points")
    eps_np = None if eps is None else np.asarray(eps, np.int32)
    if to_device:
        index = VamanaIndex.from_numpy(
            vectors, adjacency, meta["medoid_idx"],
            metric=meta.get("distance_metric", "l2"),
            entry_points=eps_np,
        )
    else:
        # host-resident: never commit the big arrays to the device —
        # this flag exists exactly for datasets larger than HBM
        index = VamanaIndex(
            vectors=vectors, adjacency=adjacency,  # type: ignore[arg-type]
            medoid=jnp.asarray(meta["medoid_idx"], jnp.int32),
            metric=meta.get("distance_metric", "l2"),
            entry_points=(
                None if eps_np is None else jnp.asarray(eps_np, jnp.int32)
            ),
        )
    pq = None
    codes = None
    if meta.get("use_pq") and not (
        store.pq_model_path.exists() and store.pq_codes_path.exists()
    ):
        # torn artifact set (model or codes missing): serve without PQ
        # (the engine's documented soft-degrade, reference
        # search_engine.py:49-72) but say so — silence here would hide a
        # half-written index dir
        missing = (
            store.pq_model_path
            if not store.pq_model_path.exists()
            else store.pq_codes_path
        )
        logger.warning(
            "meta says use_pq but %s is missing — loading without PQ "
            "(run `doctor` to retrain)", missing,
        )
    elif meta.get("use_pq"):
        from diskrag_tpu.pq.residual import pq_from_arrays

        with np.load(store.pq_model_path) as loaded:
            pq = pq_from_arrays(dict(loaded))
        codes = np.load(store.pq_codes_path)
        from diskrag_tpu.pq.intq import IntQuantizer

        want_w = (
            pq.row_width if isinstance(pq, IntQuantizer) else pq.n_subvectors
        )
        if codes.shape != (meta["num_points"], want_w):
            raise ValueError(f"pq_codes shape {codes.shape} mismatch")
    return index, pq, codes, meta


def save_flat_index(
    index_dir: str | os.PathLike,
    vectors: np.ndarray,
    *,
    metric: str = "l2",
    meta_extra: dict | None = None,
) -> dict:
    """Persist a Flat (exhaustive-scan) index: just vectors + meta."""
    store = IndexStore(index_dir)
    store.dir.mkdir(parents=True, exist_ok=True)
    vectors = np.asarray(vectors, np.float32)
    _atomic_save_npy(store.vectors_path, vectors)
    meta = {
        "format_version": FORMAT_VERSION,
        "index_type": "flat",
        "dimension": int(vectors.shape[1]),
        "num_points": int(vectors.shape[0]),
        "distance_metric": metric,
        "use_pq": False,
    }
    if meta_extra:
        meta.update(meta_extra)
    _atomic_write_bytes(
        store.meta_path, json.dumps(meta, indent=2).encode("utf-8")
    )
    return meta


def save_ivf_index(
    index_dir: str | os.PathLike,
    ivf,  # IVFIndex
    *,
    meta_extra: dict | None = None,
) -> dict:
    """Persist an IVF-flat index: vectors + centroids + tile id layout
    (tiles themselves are reconstructed from vectors at load)."""
    store = IndexStore(index_dir)
    store.dir.mkdir(parents=True, exist_ok=True)
    vectors = np.asarray(ivf.vectors, np.float32)
    _atomic_save_npy(store.vectors_path, vectors)
    _atomic_save_npy(store.dir / "ivf_centroids.npy", np.asarray(ivf.centroids))
    _atomic_save_npy(store.dir / "ivf_tile_ids.npy", np.asarray(ivf.tile_ids))
    meta = {
        "format_version": FORMAT_VERSION,
        "index_type": "ivf",
        "dimension": int(vectors.shape[1]),
        "num_points": int(vectors.shape[0]),
        "n_cells": int(ivf.n_cells),
        "cell_capacity": int(ivf.tile_ids.shape[1]),
        "distance_metric": ivf.metric,
        "tile_precision": "int8" if str(ivf.tiles.dtype) == "int8" else "bf16",
        "use_pq": False,
    }
    if meta_extra:
        meta.update(meta_extra)
    _atomic_write_bytes(
        store.meta_path, json.dumps(meta, indent=2).encode("utf-8")
    )
    return meta


def load_ivf_index(index_dir: str | os.PathLike):
    """Load an IVF index persisted by save_ivf_index."""
    import jax.numpy as jnp

    from diskrag_tpu.index.ivf import IVFIndex, tiles_from_ids

    store = IndexStore(index_dir)
    meta = json.loads(store.meta_path.read_text())
    if meta.get("index_type") != "ivf":
        raise ValueError(f"not an ivf index: {store.dir}")
    vectors = np.load(store.vectors_path)
    centroids = np.load(store.dir / "ivf_centroids.npy")
    tile_ids = np.load(store.dir / "ivf_tile_ids.npy")
    # scan tiles are derived, not persisted: the f32 master holds all
    # information; the build's precision choice is honored via meta.
    # Reconstruction (incl. the padding invariants) is shared with
    # build_ivf through tiles_from_ids.
    tiles_j, tile_norms, tile_scales = tiles_from_ids(
        vectors, tile_ids, meta.get("tile_precision", "int8")
    )
    return (
        IVFIndex(
            centroids=jnp.asarray(centroids),
            tiles=tiles_j,
            tile_ids=jnp.asarray(tile_ids),
            tile_norms=jnp.asarray(tile_norms),
            vectors=jnp.asarray(vectors),
            metric=meta.get("distance_metric", "l2"),
            tile_scales=tile_scales,
        ),
        meta,
    )


def write_compat_records(
    path: str | os.PathLike, vectors: np.ndarray, adjacency: np.ndarray
) -> int:
    """Write the packed per-node record file: float32[dim] ‖ uint32[R].

    record_size = 4 * (dim + R) — same layout as the reference
    (io/diskann_persist.py:15-24) except padding is 0xFFFFFFFF, not 0.
    Returns the record size in bytes.
    """
    n, dim = vectors.shape
    r = adjacency.shape[1]
    nbrs = adjacency.astype(np.int64)
    packed_nbrs = np.where(nbrs < 0, COMPAT_PAD, nbrs.astype(np.uint32)).astype(
        np.uint32
    )
    # interleave per record: view as bytes
    rec = np.empty((n, 4 * (dim + r)), np.uint8)
    vec_bytes = np.ascontiguousarray(vectors.astype(np.float32))
    rec[:, : 4 * dim] = vec_bytes.view(np.uint8).reshape(n, -1)
    nbr_bytes = np.ascontiguousarray(packed_nbrs)
    rec[:, 4 * dim:] = nbr_bytes.view(np.uint8).reshape(n, -1)
    tmp = pathlib.Path(path).with_suffix(".dat.tmp")
    rec.tofile(tmp)
    os.replace(tmp, path)
    return 4 * (dim + r)


def read_compat_records(
    path: str | os.PathLike, n: int, dim: int, r: int
) -> tuple[np.ndarray, np.ndarray]:
    """Read back the packed record file -> (vectors [N,D], adjacency [N,R]
    int32 with -1 padding). Memory-maps; no full copy until sliced."""
    record_size = 4 * (dim + r)
    raw = np.memmap(path, dtype=np.uint8, mode="r", shape=(n, record_size))
    vectors = raw[:, : 4 * dim].copy().view(np.float32).reshape(n, dim)
    nbrs_u = raw[:, 4 * dim:].copy().view(np.uint32).reshape(n, r)
    adjacency = np.where(nbrs_u == COMPAT_PAD, -1, nbrs_u.astype(np.int64)).astype(
        np.int32
    )
    return vectors, adjacency
