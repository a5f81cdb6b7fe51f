"""Mid-build checkpoint/resume for long graph builds.

The reference has NO mid-build checkpointing — its "checkpoint" is the
finished artifact set (SURVEY.md §5.4; reference build_index.py:251-332),
so a crashed build restarts from zero. At 10M points our kNN-backend
build runs ~1 h on one chip, dominated by the IVF kNN pass, whose
results accumulate on the *host* — which makes checkpointing nearly
free: no device fetch is needed, just periodic atomic writes of the
accumulated tables.

A checkpoint directory holds:
  - tag.json        — the build configuration + a dataset fingerprint;
                      a mismatch invalidates every saved phase (stale
                      checkpoints are deleted, never silently reused)
  - <phase>.npz     — completed-phase arrays (e.g. the full kNN tables)
  - <phase>_partial.npz — in-progress accumulation + resume cursor

Distance tables are stored as bfloat16 bit patterns (uint16 view): f16
would overflow on squared-L2 at SIFT scale (128 * 255^2 >> 65504) and
f32 doubles the write volume for precision the prune pass doesn't use.
"""

from __future__ import annotations

import hashlib
import json
import logging
import os
import pathlib

import numpy as np

logger = logging.getLogger(__name__)


def dataset_fingerprint(vectors, sample_rows: int = 1024) -> str:
    """Cheap content fingerprint: shape + dtype + sha256 of a strided
    row sample (hashing all N*D bytes would cost more than it protects
    against; a strided sample catches swapped/regenerated datasets).
    Works on numpy or device arrays (one small fetch)."""
    n = vectors.shape[0]
    idx = np.arange(0, n, max(1, n // sample_rows))[:sample_rows]
    rows = np.asarray(vectors[idx])
    h = hashlib.sha256()
    h.update(str((tuple(vectors.shape), str(rows.dtype))).encode())
    h.update(np.ascontiguousarray(rows).tobytes())
    return h.hexdigest()[:16]


def _save_npz_atomic(path: pathlib.Path, arrays: dict) -> None:
    tmp = path.with_name(path.name + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def pack_bf16(a: np.ndarray) -> np.ndarray:
    import ml_dtypes

    return np.asarray(a, dtype=ml_dtypes.bfloat16).view(np.uint16)


def unpack_bf16(a: np.ndarray) -> np.ndarray:
    import ml_dtypes

    return a.view(ml_dtypes.bfloat16).astype(np.float32)


class BuildCheckpoint:
    """Tagged phase checkpoints under one directory.

    `tag` must capture every input that determines the build's output
    (params, seed, dataset fingerprint). On open, a tag mismatch wipes
    the directory's phase files so a changed build never resumes from
    another build's state.
    """

    def __init__(self, directory: str | os.PathLike, tag: dict):
        self.dir = pathlib.Path(directory)
        self.dir.mkdir(parents=True, exist_ok=True)
        self.tag = {k: tag[k] for k in sorted(tag)}
        tag_path = self.dir / "tag.json"
        old = None
        if tag_path.exists():
            try:
                old = json.loads(tag_path.read_text())
            except ValueError:
                old = None
        # phase files with a missing/unreadable tag are just as stale as
        # a mismatched one — adopting them would silently resume another
        # build's state, the exact thing the tag exists to prevent
        if old != self.tag:
            stale = list(self.dir.glob("*.npz")) + list(
                self.dir.glob("*.npz.tmp")
            )
            if stale:
                logger.info(
                    "checkpoint tag %s — dropping %d stale file(s) in %s",
                    "changed" if old is not None else "missing",
                    len(stale), self.dir,
                )
            for p in stale:
                p.unlink()
        tmp = tag_path.with_name("tag.json.tmp")
        tmp.write_text(json.dumps(self.tag, indent=1))
        os.replace(tmp, tag_path)

    def _path(self, phase: str) -> pathlib.Path:
        return self.dir / f"{phase}.npz"

    def has(self, phase: str) -> bool:
        return self._path(phase).exists()

    def save(self, phase: str, **arrays: np.ndarray) -> None:
        _save_npz_atomic(self._path(phase), arrays)

    def load(self, phase: str) -> dict | None:
        p = self._path(phase)
        if not p.exists():
            return None
        import zipfile

        try:
            with np.load(p) as z:
                return {k: z[k] for k in z.files}
        except (ValueError, OSError, EOFError, zipfile.BadZipFile) as e:
            # torn/corrupt file (e.g. disk full mid-rename on a non-posix
            # fs): treat as absent, rebuild the phase. BadZipFile is what
            # np.load actually raises on a truncated .npz (it subclasses
            # neither ValueError nor OSError).
            logger.warning("unreadable checkpoint %s (%s) — ignoring", p, e)
            return None

    def clear(self, phase: str) -> None:
        self._path(phase).unlink(missing_ok=True)
