"""Tools tests: index verification, installation report, perf harness."""

import numpy as np

from diskrag_tpu.build_index import build_index_from_vectors
from diskrag_tpu.tools.verify_index import verify_index
from diskrag_tpu.tools.verify_installation import verify_installation
from diskrag_tpu.utils.profiling import PhaseTimer, block_and_time


def test_dataset_benchmark_cosine_cli(capsys):
    """--metric cosine runs the full sweep path (GloVe-style angular
    config) and skips the L2-only PQ sweep with a note."""
    import json
    import sys
    from unittest import mock

    from diskrag_tpu.tools import dataset_benchmark

    argv = [
        "dataset_benchmark", "--n", "2000", "--dim", "16", "--n-queries",
        "32", "--metric", "cosine", "--widths", "16", "--expand", "2",
        "--pq-m", "4", "--json",
    ]
    with mock.patch.object(sys, "argv", argv):
        assert dataset_benchmark.main() == 0
    out = capsys.readouterr().out.strip().splitlines()
    result = json.loads(out[-1])
    assert result["metric"] == "cosine"
    assert all(p["mode"] != "pq" for p in result["sweep"])
    assert max(p["recall"] for p in result["sweep"]) >= 0.95


def test_verify_index_ok(tmp_path, clustered_data):
    pts = clustered_data[:500]
    build_index_from_vectors(
        pts, tmp_path / "idx", write_compat=True,
        params_override={"R": 16, "L": 32, "alpha": 1.2},
    )
    report = verify_index(tmp_path / "idx")
    failed = {k: v for k, v in report["checks"].items() if not v["passed"]}
    assert report["ok"], f"failed checks: {failed}"


def test_verify_index_detects_corruption(tmp_path, clustered_data):
    pts = clustered_data[:500]
    build_index_from_vectors(
        pts, tmp_path / "idx", write_compat=True,
        params_override={"R": 16, "L": 32, "alpha": 1.2},
    )
    # truncate the record file -> size check must fail
    rec = tmp_path / "idx" / "index.dat"
    data = rec.read_bytes()
    rec.write_bytes(data[: len(data) // 2])
    report = verify_index(tmp_path / "idx")
    assert not report["ok"]
    assert not report["checks"]["record_file_size"]["passed"]


def test_verify_installation():
    report = verify_installation()
    assert report["packages"]["jax"]
    assert report["diskrag_tpu"] == "0.1.0"
    assert report["default_backend"] == "cpu"  # tests run on emulated CPU


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("a"):
        pass
    s = t.summary()
    assert s["a"]["count"] == 2 and s["a"]["total_s"] >= 0


def test_block_and_time():
    import jax.numpy as jnp

    dt, out = block_and_time(lambda x: jnp.sum(x * 2), jnp.ones(16), repeats=2)
    assert dt >= 0 and float(out) == 32.0


def test_performance_test_search_engine(tmp_path, clustered_data):
    """Concurrency microbenchmark harness (reference
    search_engine.py:818-933 counterpart)."""
    from diskrag_tpu.data.collection import CollectionManager
    from diskrag_tpu.engine import SearchEngine
    from diskrag_tpu.tools.perf_test import performance_test_search_engine

    pts = clustered_data[:300].astype(np.float32)
    # pad vectors to a 128-d collection (engine checks info.dimension)
    mgr = CollectionManager(tmp_path / "c")
    mgr.create_collection("p", dimension=pts.shape[1])
    mgr.update_collection(
        "p", pts, [f"t{i}" for i in range(len(pts))],
        [{"i": i} for i in range(len(pts))],
    )
    build_index_from_vectors(
        pts, mgr.get_index_dir("p"),
        params_override={"R": 8, "L": 16, "alpha": 1.2},
    )
    eng = SearchEngine("p", base_dir=tmp_path / "c")
    report = performance_test_search_engine(eng, pts[:8], k=3, n_threads=2)
    assert report["n_queries"] == 8
    assert report["sequential_qps"] > 0
    assert report["concurrent_qps"] > 0
    assert report["batched_qps"] > 0


def test_config_index_block_honored(tmp_path):
    """config.yaml index: {target_quality, force_pq} drive the build when
    the CLI flag is absent (the reference documents the block but ignores
    it, SURVEY §5.6 — regression for the dead-config finding)."""
    import numpy as np
    import yaml

    from diskrag_tpu.cli import DiskRAG
    from diskrag_tpu.data import CollectionManager

    cfg = {
        "collection": "c",
        "embedding": {"provider": "mock", "model": "mock", "dimension": 128},
        "index": {"target_quality": "high", "force_pq": False,
                  "R": 8, "L": 16},
    }
    cfg_path = tmp_path / "config.yaml"
    cfg_path.write_text(yaml.safe_dump(cfg))

    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", dimension=128)
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(1500, 128)).astype(np.float32)
    mgr.update_collection(
        "c", vecs, [f"t{i}" for i in range(1500)],
        [{"i": i} for i in range(1500)],
    )
    rag = DiskRAG(str(cfg_path), base_dir=str(tmp_path / "collections"))
    meta = rag.build_index("c")  # no CLI flag -> config wins
    assert meta["target_quality"] == "high"
    assert meta["use_pq"] is False  # force_pq: false suppressed PQ
    # explicit argument still overrides the config block
    meta2 = rag.build_index("c", target_quality="fast", force_rebuild=True)
    assert meta2["target_quality"] == "fast"


def test_verify_index_non_vamana_types(tmp_path):
    """verify_index must produce a structured report for flat/ivf index
    dirs (their metas have no R key) instead of crashing."""
    import numpy as np

    from diskrag_tpu.build_index import build_index_from_vectors
    from diskrag_tpu.tools.verify_index import verify_index

    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(1200, 64)).astype(np.float32)
    for itype in ("flat", "ivf"):
        d = tmp_path / itype
        build_index_from_vectors(vecs, d, index_type=itype)
        report = verify_index(d)
        assert report["index_type"] == itype
        assert report["ok"], report


def test_build_skip_warns_on_type_mismatch(tmp_path, caplog):
    """Requesting a different index type over an existing index must warn
    at WARNING level (not silently return the wrong type)."""
    import logging

    import numpy as np

    from diskrag_tpu.build_index import build_index_from_vectors

    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(300, 32)).astype(np.float32)
    d = tmp_path / "idx"
    build_index_from_vectors(vecs, d, index_type="flat")
    with caplog.at_level(logging.WARNING):
        meta = build_index_from_vectors(vecs, d, index_type="vamana")
    assert meta["index_type"] == "flat"  # existing one kept...
    assert any("type=vamana was requested" in r.message for r in caplog.records)


def test_doctor_on_grown_collection(tmp_path):
    """doctor must train PQ on the INDEX's own rows when the collection
    has grown since the build — a pq_codes/adjacency length mismatch
    would make the index unloadable (regression)."""
    import numpy as np

    from diskrag_tpu.cli import DiskRAG
    from diskrag_tpu.data import CollectionManager
    from diskrag_tpu.engine import SearchEngine

    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", dimension=64)
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(1500, 64)).astype(np.float32)
    mgr.update_collection(
        "c", vecs, [f"t{i}" for i in range(1500)],
        [{"i": i} for i in range(1500)],
    )
    rag = DiskRAG(str(tmp_path / "nonexistent.yaml"),
                  base_dir=str(tmp_path / "collections"))
    rag.build_index("c")
    # grow the collection past the indexed rows
    more = rng.normal(size=(200, 64)).astype(np.float32)
    mgr.update_collection(
        "c", more, [f"extra{i}" for i in range(200)],
        [{"i": 1500 + i} for i in range(200)],
    )
    # delete the PQ model so doctor has something to repair
    (mgr.get_index_dir("c") / "pq_model.npz").unlink()
    report = rag.doctor("c")
    assert report["status"] == "ok"
    assert any("repair covers the indexed rows" in a for a in report["actions"])
    # the repaired index must still load with PQ intact (not brute force)
    eng = SearchEngine("c", base_dir=tmp_path / "collections")
    assert not eng.brute_force_mode
    assert eng.use_pq


def test_doctor_preserves_pq_kind(tmp_path):
    """Regression: doctor's PQ retrain must recreate the SAME quantizer
    kind the index was built with (meta records it) and refresh the
    pq_kind meta key — not silently downgrade residual to plain while
    stale meta_extra keys paper over it."""
    import json

    import numpy as np

    from diskrag_tpu.cli import DiskRAG
    from diskrag_tpu.data import CollectionManager
    from diskrag_tpu.engine import SearchEngine

    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", dimension=64)
    rng = np.random.default_rng(3)
    vecs = rng.normal(size=(1500, 64)).astype(np.float32)
    mgr.update_collection(
        "c", vecs, [f"t{i}" for i in range(1500)],
        [{"i": i} for i in range(1500)],
    )
    rag = DiskRAG(str(tmp_path / "nonexistent.yaml"),
                  base_dir=str(tmp_path / "collections"))
    rag.build_index("c")
    index_dir = mgr.get_index_dir("c")
    meta_before = json.loads((index_dir / "meta.json").read_text())
    assert meta_before["pq_kind"] == "residual"  # the l2 default

    (index_dir / "pq_codes.npy").unlink()
    report = rag.doctor("c")
    assert report["status"] == "ok"
    assert any("kind=residual" in a for a in report["actions"])

    meta_after = json.loads((index_dir / "meta.json").read_text())
    assert meta_after["pq_kind"] == "residual"
    assert (index_dir / "pq_aux.npz").exists()
    # the repaired artifact set serves the residual path end to end
    eng = SearchEngine("c", base_dir=tmp_path / "collections")
    assert eng.use_pq and eng.pq_cells_j is not None


def test_prewarm_cache_seed_roundtrip(tmp_path, monkeypatch):
    """utils/compile_cache.py: archive entries land in the cache dir
    once, existing entries are kept, re-seed is a marker no-op."""
    import tarfile

    import zstandard

    from diskrag_tpu.utils import compile_cache

    # build a fake archive with two entries
    src = tmp_path / "entries"
    src.mkdir()
    (src / "xla_prog_a").write_bytes(b"AAAA")
    (src / "xla_prog_b").write_bytes(b"BBBB")
    arch = tmp_path / "prewarmed_cache.tar.zst"
    cctx = zstandard.ZstdCompressor()
    with arch.open("wb") as fh, cctx.stream_writer(fh) as zf:
        with tarfile.open(fileobj=zf, mode="w|") as tf:
            for p in sorted(src.iterdir()):
                tf.add(p, arcname=p.name)
    monkeypatch.setattr(compile_cache, "_REPO_ROOT", tmp_path)

    cache = tmp_path / "cache"
    # pre-existing entry must NOT be overwritten
    cache.mkdir()
    (cache / "xla_prog_a").write_bytes(b"NEWER")
    n = compile_cache.seed_cache(cache)
    assert n == 1
    assert (cache / "xla_prog_a").read_bytes() == b"NEWER"
    assert (cache / "xla_prog_b").read_bytes() == b"BBBB"
    # second call: marker short-circuits
    assert compile_cache.seed_cache(cache) == 0


def test_prewarm_cache_gz_fallback(tmp_path, monkeypatch):
    """A .zst archive with no zstandard module must fall through to the
    .tar.gz twin instead of silently disabling seeding (VERDICT r3 #4)."""
    import builtins
    import tarfile

    from diskrag_tpu.utils import compile_cache

    src = tmp_path / "entries"
    src.mkdir()
    (src / "xla_prog_c").write_bytes(b"CCCC")
    (tmp_path / "prewarmed_cache.tar.zst").write_bytes(b"not-used")
    with tarfile.open(tmp_path / "prewarmed_cache.tar.gz", "w:gz") as tf:
        tf.add(src / "xla_prog_c", arcname="xla_prog_c")
    monkeypatch.setattr(compile_cache, "_REPO_ROOT", tmp_path)

    real_import = builtins.__import__

    def no_zstd(name, *a, **k):
        if name == "zstandard":
            raise ImportError("simulated absent zstandard")
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_zstd)
    cache = tmp_path / "cache"
    assert compile_cache.seed_cache(cache) == 1
    assert (cache / "xla_prog_c").read_bytes() == b"CCCC"


def test_compile_cache_keys_are_dir_independent(tmp_path, monkeypatch):
    """enable_compilation_cache must disable jax's XLA-cache injection:
    with the jax-0.9 default, the cache-dir PATH is written into the
    compile options (xla_gpu_per_fusion_autotune_cache_dir) and is NOT
    stripped from the persistent-cache key, so entries collected in one
    dir (the shipped archive, /tmp/prewarm_cache) can never hit from
    another (.jax_cache) — root-caused 2026-08-21 after two 200k builds
    against a seeded cache recompiled everything with 0 hits."""
    import jax

    from diskrag_tpu.utils import compile_cache

    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path / "c1"))
    compile_cache.enable_compilation_cache(seed=False)
    assert jax.config.jax_persistent_cache_enable_xla_caches == "none"
    # the injection site itself must now be a no-op: get_compile_options
    # leaves the autotune-cache path empty, keeping keys dir-independent
    from jax._src import compiler

    opts = compiler.get_compile_options(num_replicas=1, num_partitions=1)
    dbg = opts.executable_build_options.debug_options
    assert dbg.xla_gpu_per_fusion_autotune_cache_dir == ""
    assert dbg.xla_gpu_kernel_cache_file == ""
