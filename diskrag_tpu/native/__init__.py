"""Native host-tier IO bindings (ctypes over io_native.cpp).

`RecordReader` is the batched equivalent of the reference's
`MMapNodeReader` (reference io/diskann_persist.py:209-235): mmap'd record
file + LRU cache, but serving batched id->vector gathers for the TPU
rerank path, with a pure-numpy fallback when the shared library has not
been built (build with `python -m diskrag_tpu.native.build` or the repo
Makefile)."""

from __future__ import annotations

import ctypes
import logging
import os
import pathlib

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = pathlib.Path(__file__).parent / "libdiskrag_io.so"
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.drag_open.restype = ctypes.c_void_p
    lib.drag_open.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int64,
    ]
    lib.drag_get_vectors.restype = ctypes.c_int
    lib.drag_get_vectors.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int32,
    ]
    lib.drag_get_nodes.restype = ctypes.c_int
    lib.drag_get_nodes.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int32,
    ]
    lib.drag_cache_hits.restype = ctypes.c_int64
    lib.drag_cache_hits.argtypes = [ctypes.c_void_p]
    lib.drag_cache_misses.restype = ctypes.c_int64
    lib.drag_cache_misses.argtypes = [ctypes.c_void_p]
    lib.drag_close.restype = None
    lib.drag_close.argtypes = [ctypes.c_void_p]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


def build_native(force: bool = False) -> bool:
    """Compile the shared library with g++ (idempotent)."""
    src = pathlib.Path(__file__).parent / "io_native.cpp"
    if _LIB_PATH.exists() and not force:
        if _LIB_PATH.stat().st_mtime >= src.stat().st_mtime:
            return True
    import subprocess

    try:
        subprocess.run(
            [
                "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
                "-o", str(_LIB_PATH), str(src),
            ],
            check=True, capture_output=True, text=True,
        )
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logger.warning("native build failed: %s", getattr(e, "stderr", e))
        return False
    global _lib
    _lib = None
    return True


class RecordReader:
    """Batched reader over a packed record file (index.dat layout)."""

    def __init__(
        self,
        path: str | os.PathLike,
        n: int,
        dim: int,
        r: int,
        cache_capacity: int = 1024,
        prefer_native: bool = True,
    ):
        self.path = str(path)
        self.n, self.dim, self.r = int(n), int(dim), int(r)
        self.record_size = 4 * (dim + r)
        self._handle = None
        self._lib = _load_lib() if prefer_native else None
        if self._lib is not None:
            self._handle = self._lib.drag_open(
                self.path.encode(), self.n, self.dim, self.r,
                int(cache_capacity),
            )
            if not self._handle:
                logger.warning("native open failed, falling back to numpy")
                self._lib = None
        if self._lib is None:
            self._mm = np.memmap(
                self.path, dtype=np.uint8, mode="r",
                shape=(self.n, self.record_size),
            )

    @property
    def is_native(self) -> bool:
        return self._lib is not None

    def get_vectors(self, ids: np.ndarray, n_threads: int = 4) -> np.ndarray:
        """ids [C] -> float32 [C, dim]; out-of-range ids give zeros."""
        ids = np.ascontiguousarray(ids, np.int64)
        out = np.empty((len(ids), self.dim), np.float32)
        if self._lib is not None:
            rc = self._lib.drag_get_vectors(
                self._handle,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(ids),
                out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                n_threads,
            )
            if rc != 0:
                raise RuntimeError(f"drag_get_vectors failed rc={rc}")
            return out
        ok = (ids >= 0) & (ids < self.n)
        safe = np.where(ok, ids, 0)
        raw = self._mm[safe, : 4 * self.dim]
        out[:] = raw.view(np.float32).reshape(len(ids), self.dim)
        out[~ok] = 0.0
        return out

    def get_nodes(
        self, ids: np.ndarray, n_threads: int = 4
    ) -> tuple[np.ndarray, np.ndarray]:
        """ids [C] -> (vectors [C, dim], neighbors [C, r] int32, -1 pad)."""
        ids = np.ascontiguousarray(ids, np.int64)
        vecs = np.empty((len(ids), self.dim), np.float32)
        nbrs = np.empty((len(ids), self.r), np.int32)
        if self._lib is not None:
            rc = self._lib.drag_get_nodes(
                self._handle,
                ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                len(ids),
                vecs.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                nbrs.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                n_threads,
            )
            if rc != 0:
                raise RuntimeError(f"drag_get_nodes failed rc={rc}")
            return vecs, nbrs
        ok = (ids >= 0) & (ids < self.n)
        safe = np.where(ok, ids, 0)
        raw = self._mm[safe]
        vecs[:] = raw[:, : 4 * self.dim].view(np.float32).reshape(
            len(ids), self.dim
        )
        nb = raw[:, 4 * self.dim:].view(np.uint32).reshape(len(ids), self.r)
        nbrs[:] = np.where(nb == 0xFFFFFFFF, -1, nb.astype(np.int64)).astype(
            np.int32
        )
        vecs[~ok] = 0.0
        nbrs[~ok] = -1
        return vecs, nbrs

    def cache_stats(self) -> dict:
        # the C functions do not null-check the handle: calling after
        # close() would dereference nullptr and kill the process
        if self._lib is None or not self._handle:
            return {"hits": 0, "misses": 0, "native": False}
        return {
            "hits": int(self._lib.drag_cache_hits(self._handle)),
            "misses": int(self._lib.drag_cache_misses(self._handle)),
            "native": True,
        }

    def close(self) -> None:
        if self._lib is not None and self._handle:
            self._lib.drag_close(self._handle)
            self._handle = None

    def __del__(self):  # noqa: D105
        try:
            self.close()
        except Exception:  # noqa: BLE001
            pass
