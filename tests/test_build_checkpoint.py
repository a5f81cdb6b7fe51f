"""Mid-build checkpoint/resume tests (graph/checkpoint.py + the
ivf-kNN build path). The reference has no counterpart (its checkpoint
is the finished artifact set, SURVEY.md §5.4) — these gates are ours:
resume must reproduce the uninterrupted build, and stale checkpoints
must never be reused."""

import json

import numpy as np
import pytest

from diskrag_tpu.graph.checkpoint import (
    BuildCheckpoint,
    dataset_fingerprint,
    pack_bf16,
    unpack_bf16,
)
from diskrag_tpu.graph.knn_build import approx_knn_ivf, build_vamana_knn


def _data(n=3000, d=32, seed=3):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(16, d)).astype(np.float32) * 3
    return centers[rng.integers(0, 16, n)] + rng.normal(size=(n, d)).astype(
        np.float32
    )


def test_bf16_roundtrip_and_fingerprint():
    a = np.asarray([0.0, 1.5, 3e8, -2.25e-3], np.float32)
    b = unpack_bf16(pack_bf16(a))
    np.testing.assert_allclose(b, a, rtol=8e-3)
    pts = _data(512)
    assert dataset_fingerprint(pts) == dataset_fingerprint(pts.copy())
    other = pts.copy()
    other[100, 0] += 1.0  # strided sample includes row 100 at n=512
    assert dataset_fingerprint(pts) != dataset_fingerprint(other)


def test_checkpoint_tag_invalidation(tmp_path):
    ck = BuildCheckpoint(tmp_path, tag={"seed": 0, "n": 10})
    ck.save("knn", ids=np.arange(4, dtype=np.int32))
    assert ck.has("knn")
    # same tag: files survive a reopen
    ck2 = BuildCheckpoint(tmp_path, tag={"n": 10, "seed": 0})
    assert ck2.has("knn")
    # changed tag: stale phases dropped
    ck3 = BuildCheckpoint(tmp_path, tag={"n": 10, "seed": 1})
    assert not ck3.has("knn")
    assert json.loads((tmp_path / "tag.json").read_text())["seed"] == 1


def test_corrupt_checkpoint_ignored(tmp_path):
    ck = BuildCheckpoint(tmp_path, tag={"x": 1})
    (tmp_path / "knn.npz").write_bytes(b"not an npz")
    assert ck.load("knn") is None
    # truncated npz (np.load raises zipfile.BadZipFile, which is neither
    # ValueError nor OSError): the torn-file case the handler exists for
    ck.save("knn", ids=np.arange(4096, dtype=np.int32))
    full = (tmp_path / "knn.npz").read_bytes()
    (tmp_path / "knn.npz").write_bytes(full[: len(full) // 2])
    assert ck.load("knn") is None


def test_orphan_phase_without_tag_is_dropped(tmp_path):
    """Phase files with no tag.json must be wiped, not silently adopted
    under the new tag — they may belong to a different build."""
    ck = BuildCheckpoint(tmp_path, tag={"seed": 0})
    ck.save("knn", ids=np.arange(4, dtype=np.int32))
    (tmp_path / "tag.json").unlink()
    ck2 = BuildCheckpoint(tmp_path, tag={"seed": 0})
    assert not ck2.has("knn")


def test_approx_knn_partial_resume_matches_fresh(tmp_path):
    pts = _data()
    import jax.numpy as jnp

    vecs = jnp.asarray(pts)
    k, qb = 16, 1024
    ids_fresh, dists_fresh = approx_knn_ivf(
        vecs, k, query_block=qb, seed=0, n_probe=4
    )
    # craft a partial as if the build died after the first block
    ck = BuildCheckpoint(tmp_path, tag={"t": "partial"})
    ck.save(
        "knn_partial",
        ids=ids_fresh[:qb], dists=pack_bf16(dists_fresh[:qb]),
        next_i=np.int64(qb), k=np.int64(k),
    )
    ids_res, dists_res = approx_knn_ivf(
        vecs, k, query_block=qb, seed=0, n_probe=4, checkpoint=ck
    )
    np.testing.assert_array_equal(ids_res, ids_fresh)
    np.testing.assert_allclose(dists_res, dists_fresh, rtol=8e-3, atol=1e-4)
    # the partial survives approx_knn_ivf: only the caller may clear it,
    # after the completed "knn" phase has been persisted (a crash in
    # that window must not lose the pass)
    assert ck.has("knn_partial")


def test_build_vamana_knn_checkpoint_reuse(tmp_path):
    pts = _data()
    idx1 = build_vamana_knn(
        pts, degree_bound=16, knn_backend="ivf", knn_probe=4,
        checkpoint_dir=tmp_path, checkpoint_every_s=0.0,
    )
    assert (tmp_path / "knn.npz").exists()
    assert not (tmp_path / "knn_partial.npz").exists()  # cleared post-save
    # second build loads the finished kNN phase and must produce the
    # exact same graph
    idx2 = build_vamana_knn(
        pts, degree_bound=16, knn_backend="ivf", knn_probe=4,
        checkpoint_dir=tmp_path,
    )
    np.testing.assert_array_equal(
        np.asarray(idx1.adjacency), np.asarray(idx2.adjacency)
    )
    # different params must NOT reuse it (tag changes, phase dropped)
    build_vamana_knn(
        pts, degree_bound=16, knn_backend="ivf", knn_probe=8,
        checkpoint_dir=tmp_path,
    )
    tag = json.loads((tmp_path / "tag.json").read_text())
    assert tag["knn_probe"] == 8
