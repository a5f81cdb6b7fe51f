"""End-to-end engine tests — the framework equivalent of the reference's
`scripts/test_faq_workflow.py`: CSV -> ingest (mock embeddings) ->
build index -> engine search -> faq_search with qa_id dedup, all offline."""

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from diskrag_tpu.build_index import build_index_from_vectors
from diskrag_tpu.data import (
    CollectionManager,
    EmbeddingConfig,
    EmbeddingGenerator,
    PreprocessingConfig,
    Preprocessor,
    QuestionGenerationConfig,
)
from diskrag_tpu.data.question_generator import QuestionGenerator
from diskrag_tpu.engine import SearchEngine


@pytest.fixture(scope="module")
def faq_collection(tmp_path_factory):
    """A populated collection with a built index, via the mock provider."""
    base = tmp_path_factory.mktemp("workspace")
    rows = []
    for i in range(12):
        rows.append(
            {
                "id": f"faq_{i:03d}",
                "question": f"如何使用功能{i}？",
                "answer": f"關於功能{i}的詳細使用說明文字。" * 3,
            }
        )
    csv = base / "faq.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)

    cfg = PreprocessingConfig(
        collection="faq",
        embedding=EmbeddingConfig(provider="mock", model="mock", dimension=128),
        question_generation=QuestionGenerationConfig(enabled=True, provider="mock"),
    )
    mgr = CollectionManager(base / "collections")
    pre = Preprocessor(
        cfg,
        manager=mgr,
        embedding_generator=EmbeddingGenerator(cfg.embedding, cache_dir=base / "cache"),
        question_generator=QuestionGenerator({"provider": "mock", "max_questions": 4}),
    )
    pre.process_file(str(csv))
    info = mgr.get_collection_info("faq")
    assert info.num_vectors >= 12

    vectors = np.load(mgr.get_vectors_path("faq"))
    build_index_from_vectors(
        vectors, mgr.get_index_dir("faq"),
        params_override={"R": 8, "L": 16, "alpha": 1.2},
        write_compat=True,  # lets the host_tier serving-mode test reuse this
    )
    return base


def _embed(base):
    from diskrag_tpu.data.embedding import mock_embedding

    return lambda text: mock_embedding(text, 128)


def _assert_diag(eng, mode):
    """Every serving mode must run the bring-up self-check (reference
    search_engine.py:142-253 always self-checks) and pass it."""
    d = eng.diagnostics
    assert d is not None, f"no diagnostics in {mode} mode"
    assert d["serving_mode"] == mode
    assert d["self_retrieval_rate"] >= 0.8
    assert d["passed"], d


def test_engine_search_returns_query_itself(faq_collection):
    eng = SearchEngine("faq", base_dir=faq_collection / "collections")
    _assert_diag(eng, "vamana")
    # query with an exact ingested text -> distance ~0 to itself
    out = eng.search(
        "如何使用功能3?",  # normalized form of ingested question
        k=3,
        embedding_fn=_embed(faq_collection),
    )
    assert out["results"], "no results"
    top = out["results"][0]
    assert "功能3" in top["text"]
    assert top["distance"] < 0.05
    assert out["timing"]["total_time"] > 0
    assert out["stats"]["search_type"] in ("exact", "pq_accelerated", "brute_force")


def test_engine_faq_dedup(faq_collection):
    eng = SearchEngine("faq", base_dir=faq_collection / "collections")
    out = eng.faq_search(
        "請問如何使用功能3?", k=5, embedding_fn=_embed(faq_collection)
    )
    qa_ids = [r["metadata"]["qa_id"] for r in out["results"]]
    assert len(qa_ids) == len(set(qa_ids)), "qa_id dedup failed"
    assert all(r["metadata"]["type"] == "faq" for r in out["results"])


def test_engine_statistics(faq_collection):
    eng = SearchEngine("faq", base_dir=faq_collection / "collections")
    eng.search("如何使用功能1?", k=2, embedding_fn=_embed(faq_collection))
    eng.search("如何使用功能2?", k=2, embedding_fn=_embed(faq_collection))
    stats = eng.get_search_statistics()
    assert stats["total_searches"] == 2
    assert stats["avg_search_time"] > 0


def test_engine_brute_force_fallback(tmp_path):
    """Missing index artifacts -> engine still works (brute force),
    matching reference graceful degradation (search_engine.py:49-72)."""
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("tiny", dimension=128)
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(20, 128)).astype(np.float32)
    texts = [f"text {i}" for i in range(20)]
    metas = [{"i": i} for i in range(20)]
    mgr.update_collection("tiny", vecs, texts, metas)

    eng = SearchEngine("tiny", base_dir=tmp_path / "collections")
    assert eng.brute_force_mode
    _assert_diag(eng, "brute_force")
    out = eng.search(
        "whatever", k=3,
        embedding_fn=lambda t: vecs[7],
    )
    assert out["results"][0]["text"] == "text 7"
    assert out["results"][0]["distance"] < 0.05
    assert out["stats"]["search_type"] == "brute_force"


def test_engine_batch_search(faq_collection):
    eng = SearchEngine("faq", base_dir=faq_collection / "collections")
    from diskrag_tpu.data.embedding import mock_embedding

    q = np.stack([mock_embedding(f"如何使用功能{i}?", 128) for i in range(4)])
    dists, ids, stats = eng.search_batch(q, k=3)
    assert dists.shape == (4, 3) and ids.shape == (4, 3)
    assert (dists[:, 0] < 0.05).all()  # each query finds its own text


def test_engine_search_pipelined_matches_search_many(faq_collection):
    """The overlapped-fetch stream path must return exactly what N
    sequential search_many calls return, in order."""
    eng = SearchEngine("faq", base_dir=faq_collection / "collections")
    emb = _embed(faq_collection)
    batches = [
        [f"如何使用功能{i}?" for i in (0, 1, 2)],
        [f"如何使用功能{i}?" for i in (3, 4)],
        [f"如何使用功能{i}?" for i in (5, 6, 7, 8)],
    ]
    piped = eng.search_pipelined(batches, k=3, embedding_fn=emb)
    assert len(piped) == len(batches)
    for texts, got in zip(batches, piped):
        ref = eng.search_many(texts, k=3, embedding_fn=emb)
        assert len(got["results"]) == len(texts)
        for g_row, r_row in zip(got["results"], ref["results"]):
            assert [r["text"] for r in g_row] == [r["text"] for r in r_row]
            np.testing.assert_allclose(
                [r["distance"] for r in g_row],
                [r["distance"] for r in r_row],
                rtol=1e-5, atol=1e-6,
            )
        assert got["stats"]["search_type"] == ref["stats"]["search_type"]
    with pytest.raises(ValueError):
        eng.search_pipelined([["q"], []], k=3, embedding_fn=emb)


def test_engine_flat_and_ivf_index_types(tmp_path):
    """Engine serves flat and ivf index types transparently."""
    from diskrag_tpu.build_index import build_index_from_vectors

    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(1200, 128)).astype(np.float32)
    texts = [f"text {i}" for i in range(1200)]
    metas = [{"i": i} for i in range(1200)]

    for itype in ("flat", "ivf"):
        mgr = CollectionManager(tmp_path / f"coll_{itype}")
        mgr.create_collection("c", dimension=128)
        mgr.update_collection("c", vecs, texts, metas)
        build_index_from_vectors(
            vecs, mgr.get_index_dir("c"), index_type=itype
        )
        eng = SearchEngine("c", base_dir=tmp_path / f"coll_{itype}")
        assert eng.index_type == itype
        _assert_diag(eng, itype)
        out = eng.search("q", k=3, embedding_fn=lambda t: vecs[42])
        assert out["results"][0]["text"] == "text 42"
        assert out["stats"]["search_type"] == itype


def test_engine_host_tier_serving_mode(faq_collection):
    """host_tier serving: graph + compressed data on device, f32 vectors
    host-resident, exact rerank on host — must agree with the in-HBM
    engine on an exact self-match query."""
    eng = SearchEngine(
        "faq", base_dir=faq_collection / "collections",
        serving_mode="host_tier",
    )
    assert not eng.brute_force_mode
    _assert_diag(eng, "host_tier")
    out = eng.search(
        "如何使用功能3?", k=3, embedding_fn=_embed(faq_collection)
    )
    assert out["stats"]["search_type"] == "host_tier"
    top = out["results"][0]
    assert "功能3" in top["text"]
    assert top["distance"] < 0.05


def test_engine_sharded_index_type(tmp_path, clustered_data):
    """sharded index type end-to-end: build with n_shards=4, serve over
    the emulated 8-device mesh (2 data rows x 4 shards), including the
    batch-padding path (B=5 not divisible by the data axis)."""
    vecs = clustered_data[:1200]
    texts = [f"text {i}" for i in range(1200)]
    metas = [{"i": i} for i in range(1200)]

    mgr = CollectionManager(tmp_path / "coll_sharded")
    mgr.create_collection("c", dimension=vecs.shape[1])
    mgr.update_collection("c", vecs, texts, metas)
    meta = build_index_from_vectors(
        vecs, mgr.get_index_dir("c"), index_type="sharded", n_shards=4
    )
    assert meta["index_type"] == "sharded" and meta["n_shards"] == 4
    # skip-if-exists must recognize the sharded artifact set
    again = build_index_from_vectors(
        vecs, mgr.get_index_dir("c"), index_type="sharded", n_shards=4
    )
    assert again["build_seconds"] == meta["build_seconds"]

    eng = SearchEngine("c", base_dir=tmp_path / "coll_sharded")
    assert eng.index_type == "sharded"
    assert eng.mesh.shape == {"data": 2, "shard": 4}
    _assert_diag(eng, "sharded")
    # small 300-point shards need a wider search than the B=1 default
    # (4 entry seeds/shard); L=48 is the adaptive recommendation scale
    out = eng.search("q", k=3, l_search=48, embedding_fn=lambda t: vecs[42])
    assert out["results"][0]["text"] == "text 42"
    assert out["stats"]["search_type"] == "sharded"

    queries = vecs[[10, 20, 30, 40, 50]]
    dists, ids, stats = eng.search_batch(queries, k=5, l_search=48)
    assert ids.shape == (5, 5)
    np.testing.assert_array_equal(ids[:, 0], [10, 20, 30, 40, 50])
    assert (np.diff(dists, axis=1) >= -1e-6).all()


def test_engine_sharded_host_tier(tmp_path, clustered_data):
    """Sharded index served in host_tier mode: per-shard bf16 traversal
    on the emulated mesh, exact host rerank against the f32 record file."""
    vecs = clustered_data[:1200]
    mgr = CollectionManager(tmp_path / "coll_sht")
    mgr.create_collection("c", dimension=vecs.shape[1])
    mgr.update_collection(
        "c", vecs, [f"text {i}" for i in range(1200)],
        [{"i": i} for i in range(1200)],
    )
    build_index_from_vectors(
        vecs, mgr.get_index_dir("c"), index_type="sharded", n_shards=4,
        write_compat=True,
    )
    eng = SearchEngine(
        "c", base_dir=tmp_path / "coll_sht", serving_mode="host_tier"
    )
    out = eng.search("q", k=3, l_search=48, embedding_fn=lambda t: vecs[42])
    assert out["stats"]["search_type"] == "sharded_host_tier"
    assert out["results"][0]["text"] == "text 42"
    assert out["results"][0]["distance"] < 1e-3

    # without the record file the mode must fail with a clear error
    build_index_from_vectors(
        vecs, mgr.get_index_dir("c").parent / "index2",
        index_type="sharded", n_shards=4,
    )
    import shutil

    shutil.rmtree(mgr.get_index_dir("c"))
    shutil.move(str(mgr.get_index_dir("c").parent / "index2"),
                str(mgr.get_index_dir("c")))
    # missing record file under host_tier is a *configuration* error
    # (wrong build flags), not a missing-index condition: degrading to
    # brute force would np.load the full f32 set the tier exists to
    # keep off the device
    from diskrag_tpu.engine import ServingConfigError

    with pytest.raises(ServingConfigError):
        SearchEngine(
            "c", base_dir=tmp_path / "coll_sht", serving_mode="host_tier"
        )


def test_engine_sharded_device_mismatch_raises(tmp_path, clustered_data):
    """A shard count that does not divide the visible device count is a
    configuration error — it must surface, not degrade to brute force."""
    from diskrag_tpu.engine import ServingConfigError

    vecs = clustered_data[:600]
    mgr = CollectionManager(tmp_path / "coll_mm")
    mgr.create_collection("c", dimension=vecs.shape[1])
    mgr.update_collection(
        "c", vecs, [f"t{i}" for i in range(600)], [{} for _ in range(600)]
    )
    build_index_from_vectors(
        vecs, mgr.get_index_dir("c"), index_type="sharded", n_shards=3
    )
    with pytest.raises(ServingConfigError, match="3 shards"):
        SearchEngine("c", base_dir=tmp_path / "coll_mm")
    with pytest.raises(ServingConfigError, match="3 shards"):
        SearchEngine(
            "c", base_dir=tmp_path / "coll_mm", serving_mode="host_tier"
        )


def test_engine_sharded_flat_serving(tmp_path, clustered_data):
    """sharded_flat serving: exhaustive bf16 scan per shard of a sharded
    index, merged over ICI — exact-quality results, no graph traversal."""
    vecs = clustered_data[:1200]
    mgr = CollectionManager(tmp_path / "coll_sf")
    mgr.create_collection("c", dimension=vecs.shape[1])
    mgr.update_collection(
        "c", vecs, [f"text {i}" for i in range(1200)],
        [{"i": i} for i in range(1200)],
    )
    build_index_from_vectors(
        vecs, mgr.get_index_dir("c"), index_type="sharded", n_shards=4
    )
    eng = SearchEngine(
        "c", base_dir=tmp_path / "coll_sf", serving_mode="sharded_flat"
    )
    _assert_diag(eng, "sharded_flat")
    out = eng.search("q", k=3, embedding_fn=lambda t: vecs[42])
    assert out["stats"]["search_type"] == "sharded_flat"
    assert out["results"][0]["text"] == "text 42"

    # exhaustive scan: every self-query hits itself (B=5 pads data axis)
    queries = vecs[[10, 20, 30, 40, 50]]
    dists, ids, stats = eng.search_batch(queries, k=5)
    np.testing.assert_array_equal(ids[:, 0], [10, 20, 30, 40, 50])

    # on a non-sharded index the mode is a config error
    from diskrag_tpu.engine import ServingConfigError

    mgr2 = CollectionManager(tmp_path / "coll_sf2")
    mgr2.create_collection("c", dimension=vecs.shape[1])
    mgr2.update_collection(
        "c", vecs[:100], [f"t{i}" for i in range(100)],
        [{} for _ in range(100)],
    )
    build_index_from_vectors(
        vecs[:100], mgr2.get_index_dir("c"), index_type="flat"
    )
    with pytest.raises(ServingConfigError, match="needs a sharded index"):
        SearchEngine(
            "c", base_dir=tmp_path / "coll_sf2",
            serving_mode="sharded_flat",
        )


def test_engine_pq_guard_non_l2(tmp_path):
    """ADC tables rank by squared L2 only: a cosine index with PQ
    artifacts must be served by exact traversal, not PQ-guided
    (regression for the missing in-HBM metric guard)."""
    rng = np.random.default_rng(5)
    vecs = rng.normal(size=(1500, 128)).astype(np.float32)
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("cos", dimension=128)
    mgr.update_collection(
        "cos", vecs, [f"t{i}" for i in range(1500)],
        [{"i": i} for i in range(1500)],
    )
    meta = build_index_from_vectors(
        vecs, mgr.get_index_dir("cos"), metric="cosine",
        params_override={"R": 8, "L": 16, "alpha": 1.2},
    )
    assert meta["use_pq"]  # PQ artifacts exist…
    eng = SearchEngine("cos", base_dir=tmp_path / "collections")
    out = eng.search("q", k=3, embedding_fn=lambda t: vecs[99])
    assert out["stats"]["search_type"] == "exact"  # …but are not used
    assert out["results"][0]["metadata"]["i"] == 99


def test_engine_host_tier_missing_compat_is_config_error(tmp_path):
    """host_tier without the packed record file must surface a
    ServingConfigError, not silently degrade to a full-HBM brute-force
    FlatIndex (the exact footprint the tier exists to avoid)."""
    from diskrag_tpu.engine import ServingConfigError

    rng = np.random.default_rng(6)
    vecs = rng.normal(size=(1200, 128)).astype(np.float32)
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("noc", dimension=128)
    mgr.update_collection(
        "noc", vecs, [f"t{i}" for i in range(1200)],
        [{"i": i} for i in range(1200)],
    )
    build_index_from_vectors(
        vecs, mgr.get_index_dir("noc"),
        params_override={"R": 8, "L": 16, "alpha": 1.2},
        write_compat=False,
    )
    with pytest.raises(ServingConfigError):
        SearchEngine(
            "noc", base_dir=tmp_path / "collections",
            serving_mode="host_tier",
        )
    # non-vamana index under host_tier is a config error too
    mgr2 = CollectionManager(tmp_path / "flatc")
    mgr2.create_collection("f", dimension=128)
    mgr2.update_collection(
        "f", vecs, [f"t{i}" for i in range(1200)],
        [{"i": i} for i in range(1200)],
    )
    build_index_from_vectors(vecs, mgr2.get_index_dir("f"), index_type="flat")
    with pytest.raises(ServingConfigError):
        SearchEngine("f", base_dir=tmp_path / "flatc", serving_mode="host_tier")


def test_engine_brute_force_keeps_metric(tmp_path):
    """Brute-force degradation on a cosine collection must rank by cosine
    and not sqrt the distances (regression: fallback hardcoded L2)."""
    import json

    rng = np.random.default_rng(7)
    vecs = rng.normal(size=(50, 128)).astype(np.float32)
    # two vectors: same direction/different norm vs tiny L2 distance
    vecs[1] = vecs[0] * 5.0            # cosine distance 0 to vecs[0]
    vecs[2] = vecs[0] + 0.01           # smaller L2, larger angle
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("cosf", dimension=128)
    mgr.update_collection(
        "cosf", vecs, [f"t{i}" for i in range(50)],
        [{"i": i} for i in range(50)],
    )
    # meta.json carries the metric but the index artifacts are missing
    idx_dir = mgr.get_index_dir("cosf")
    idx_dir.mkdir(parents=True, exist_ok=True)
    (idx_dir / "meta.json").write_text(
        json.dumps({"index_type": "vamana", "distance_metric": "cosine"})
    )
    eng = SearchEngine("cosf", base_dir=tmp_path / "collections")
    assert eng.brute_force_mode
    out = eng.search("q", k=2, embedding_fn=lambda t: vecs[0] * 2.0)
    got = [r["metadata"]["i"] for r in out["results"]]
    assert got[0] in (0, 1) and got[1] in (0, 1)  # colinear pair first
    assert out["results"][0]["distance"] < 1e-5


def test_engine_default_l_uses_recommended(faq_collection):
    """Default l_search honors meta's recommended_search_L as a floor
    (deviation from the reference, which computes but never applies it,
    build_index.py:357 vs search_engine.py:539)."""
    eng = SearchEngine("faq", base_dir=faq_collection / "collections")
    assert eng.recommended_l > 0
    out = eng.search("如何使用功能1?", k=2, embedding_fn=_embed(faq_collection))
    assert out["stats"]["L_search"] == max(4, 20, eng.recommended_l)
    # explicit l_search still wins
    out = eng.search(
        "如何使用功能1?", k=2, embedding_fn=_embed(faq_collection), l_search=24
    )
    assert out["stats"]["L_search"] == 24


def test_engine_search_with_debug(faq_collection):
    """Parity: search_with_debug (reference search_engine.py:616-659) —
    debug mode reports exact vs PQ result lists + diagnostics; non-debug
    delegates to search()."""
    eng = SearchEngine("faq", base_dir=faq_collection / "collections")
    out = eng.search_with_debug(
        "如何使用功能2?", k=3, embedding_fn=_embed(faq_collection),
        debug_mode=True,
    )
    assert len(out["exact_results"]) == 3
    if eng.use_pq:
        assert len(out["pq_results"]) == 3
        assert 0.0 <= out["exact_pq_overlap"] <= 1.0
    assert out["diagnostic"] is not None
    out2 = eng.search_with_debug(
        "如何使用功能2?", k=3, embedding_fn=_embed(faq_collection)
    )
    assert "results" in out2  # plain search payload


def test_engine_residual_pq_serving(tmp_path, clustered_data):
    """Default L2 vamana build trains a ResidualPQ (pq_kind auto,
    build_index._resolve_pq_kind) and the engine serves the
    pq_accelerated path through the residual decomposition at >= 0.9
    recall@10 on clustered data — the regime where plain-PQ ADC ordering
    collapses (docs/PERFORMANCE.md)."""
    from diskrag_tpu.pq import ResidualPQ

    vecs = clustered_data  # 2000 x 64
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", dimension=vecs.shape[1])
    mgr.update_collection(
        "c", vecs, [f"text {i}" for i in range(len(vecs))],
        [{"i": i} for i in range(len(vecs))],
    )
    meta = build_index_from_vectors(vecs, mgr.get_index_dir("c"))
    assert meta["use_pq"] and meta["pq_kind"] == "residual"
    assert (mgr.get_index_dir("c") / "pq_aux.npz").exists()
    assert meta["pq_validation"]["passed"]

    eng = SearchEngine("c", base_dir=tmp_path / "collections")
    assert isinstance(eng.pq, ResidualPQ)
    assert eng.pq_cells_j is not None and eng.pq_bias_j is not None
    _assert_diag(eng, "vamana")

    rng = np.random.default_rng(3)
    qi = rng.integers(0, len(vecs), size=32)
    queries = (
        vecs[qi] + rng.normal(size=(32, vecs.shape[1])).astype(np.float32) * 0.1
    ).astype(np.float32)
    dists, ids, stats = eng.search_batch(queries, k=10)
    assert stats["search_type"] == "pq_accelerated"
    exact = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(exact, axis=1)[:, :10]
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(gt))]
    )
    assert recall >= 0.9, f"residual-PQ serving recall@10 = {recall}"


@pytest.mark.parametrize("kind", ["int8", "int4"])
def test_engine_intq_serving(tmp_path, clustered_data, kind):
    """pq_kind int8/int4 builds an IntQuantizer (MXU-scorable rows,
    pq/intq.py) and the engine serves the iq_accelerated path at >= 0.9
    recall@10 — the fast quantized-traversal tier."""
    from diskrag_tpu.pq import IntQuantizer

    vecs = clustered_data  # 2000 x 64
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", dimension=vecs.shape[1])
    mgr.update_collection(
        "c", vecs, [f"text {i}" for i in range(len(vecs))],
        [{"i": i} for i in range(len(vecs))],
    )
    meta = build_index_from_vectors(
        vecs, mgr.get_index_dir("c"), pq_kind=kind
    )
    assert meta["use_pq"] and meta["pq_kind"] == kind
    assert meta["pq_validation"]["passed"]
    assert meta["iq_row_width"] == (
        vecs.shape[1] + 2 if kind == "int8" else vecs.shape[1] // 2 + 4
    )

    eng = SearchEngine("c", base_dir=tmp_path / "collections")
    assert isinstance(eng.pq, IntQuantizer)
    assert eng.codes_j.dtype == jnp.int8
    _assert_diag(eng, "vamana")
    assert eng.diagnostics["pq_exact_correlation"] > 0.99

    rng = np.random.default_rng(3)
    qi = rng.integers(0, len(vecs), size=32)
    queries = (
        vecs[qi] + rng.normal(size=(32, vecs.shape[1])).astype(np.float32) * 0.1
    ).astype(np.float32)
    dists, ids, stats = eng.search_batch(queries, k=10)
    assert stats["search_type"] == "iq_accelerated"
    exact = ((queries[:, None, :] - vecs[None, :, :]) ** 2).sum(-1)
    gt = np.argsort(exact, axis=1)[:, :10]
    recall = np.mean(
        [len(set(ids[i]) & set(gt[i])) / 10 for i in range(len(gt))]
    )
    assert recall >= 0.9, f"{kind} serving recall@10 = {recall}"


def test_engine_streaming_serving_live_ingest(faq_collection):
    """serving_mode='streaming': live insert_texts lands in the
    collection AND the serving tier with aligned ids, is searchable
    immediately, delete_ids tombstones, and flush_index persists the
    merged graph for any later engine."""
    base = faq_collection
    embed = _embed(base)
    eng = SearchEngine(
        "faq", base_dir=base / "collections", serving_mode="streaming"
    )
    assert eng.streaming is not None
    assert eng.diagnostics is not None and eng.diagnostics["passed"]
    n0 = eng.streaming.n_total_live

    new_texts = [f"全新的即時文件 {i}：串流插入測試。" for i in range(6)]
    ids = eng.insert_texts(
        new_texts,
        metadata_list=[{"type": "live", "i": i} for i in range(6)],
        embedding_fn=embed,
    )
    assert len(ids) == 6
    assert eng.streaming.n_total_live == n0 + 6
    # duplicates are skipped (update_collection semantics)
    again = eng.insert_texts(new_texts[:3], embedding_fn=embed)
    assert len(again) == 0

    # inserted rows are immediately searchable and join to their text
    out = eng.search(new_texts[2], k=3, embedding_fn=embed)
    assert out["results"][0]["text"] == new_texts[2]

    # delete tombstones the row out of serving
    eng.delete_ids([int(ids[2])])
    out = eng.search(new_texts[2], k=3, embedding_fn=embed)
    assert all(r["text"] != new_texts[2] for r in out["results"])

    # flush with live tombstones must refuse (deletions are
    # serving-session-local; silent resurrection is worse)
    import pytest as _pytest

    from diskrag_tpu.engine import ServingConfigError

    with _pytest.raises(ServingConfigError, match="tombstone"):
        eng.flush_index()

    # a tombstone-free engine flushes and a fresh auto-mode engine
    # serves the inserted rows from the persisted artifacts
    eng2 = SearchEngine(
        "faq", base_dir=base / "collections", serving_mode="streaming",
        run_diagnostics=False,
    )
    stats = eng2.flush_index()
    assert stats["n_points"] == eng2.info.num_vectors
    eng3 = SearchEngine(
        "faq", base_dir=base / "collections", run_diagnostics=False
    )
    out = eng3.search(new_texts[1], k=3, embedding_fn=embed)
    assert out["results"][0]["text"] == new_texts[1]


def test_engine_streaming_adopts_unindexed_rows(tmp_path):
    """Rows appended to the collection after the index was built (e.g.
    unflushed inserts from a crashed session, or `process` without
    reindex) are adopted into the streaming buffer at bring-up — the
    resume path of the live-ingest story."""
    rng = np.random.default_rng(0)
    vecs = rng.normal(size=(64, 32)).astype(np.float32)
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", 32)
    mgr.update_collection(
        "c", vecs, [f"t{i}" for i in range(64)],
        [{"i": i} for i in range(64)],
    )
    build_index_from_vectors(vecs, mgr.get_index_dir("c"))
    # append more rows WITHOUT rebuilding
    extra = rng.normal(size=(8, 32)).astype(np.float32)
    mgr.update_collection(
        "c", extra, [f"x{i}" for i in range(8)], [{} for _ in range(8)]
    )
    eng = SearchEngine(
        "c", base_dir=tmp_path / "collections",
        serving_mode="streaming", run_diagnostics=False,
    )
    assert eng.streaming.n_total_live == 72
    assert eng.streaming.n_buffered == 8
    # the adopted rows are searchable and joined to the right texts
    dists, ids, _ = eng.search_batch(extra, k=1)
    np.testing.assert_array_equal(ids[:, 0], np.arange(64, 72))


def test_engine_flush_refuses_after_compaction(tmp_path):
    """ADVICE r2 (high): a rebuild-path merge that drops tombstones
    returns _n_deleted to 0 — flush_index must still refuse, or the
    persisted rows silently mis-join to collection texts after restart."""
    import pytest as _pytest

    from diskrag_tpu.engine import ServingConfigError

    rng = np.random.default_rng(1)
    vecs = rng.normal(size=(64, 32)).astype(np.float32)
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", 32)
    mgr.update_collection(
        "c", vecs, [f"t{i}" for i in range(64)], [{} for _ in range(64)]
    )
    build_index_from_vectors(vecs, mgr.get_index_dir("c"))
    eng = SearchEngine(
        "c", base_dir=tmp_path / "collections",
        serving_mode="streaming", run_diagnostics=False,
    )
    assert eng.delete_ids([3, 5]) == 2
    # force the rebuild path: tiny max fraction makes any merge rebuild
    eng.streaming.merge_insert_max_fraction = 0.0
    extra = rng.normal(size=(4, 32)).astype(np.float32)
    eng.insert_texts(
        [f"x{i}" for i in range(4)], vectors=extra,
    )
    eng.streaming.merge()
    assert eng.streaming._n_deleted == 0  # the old guard would pass
    with _pytest.raises(ServingConfigError, match="compacted"):
        eng.flush_index()


def test_engine_flush_meta_does_not_override_derived_keys(tmp_path):
    """ADVICE r2 (medium): flush_index must not carry stale derived meta
    (medoid_idx/entry_points/num_points/...) over the values save_index
    computes from the merged index — stale search seeds silently degrade
    recall on reload."""
    import json

    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(48, 32)).astype(np.float32)
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", 32)
    mgr.update_collection(
        "c", vecs, [f"t{i}" for i in range(48)], [{} for _ in range(48)]
    )
    build_index_from_vectors(vecs, mgr.get_index_dir("c"))
    eng = SearchEngine(
        "c", base_dir=tmp_path / "collections",
        serving_mode="streaming", run_diagnostics=False,
    )
    # poison the in-memory meta with stale derived values; a correct
    # flush recomputes them from the merged index instead
    eng.meta["medoid_idx"] = 9_999
    eng.meta["num_points"] = 1
    eng.meta["recommended_search_L"] = 77  # genuinely extra: must survive
    extra = rng.normal(size=(4, 32)).astype(np.float32)
    eng.insert_texts([f"x{i}" for i in range(4)], vectors=extra)
    eng.flush_index()
    meta = json.loads(
        (mgr.get_index_dir("c") / "meta.json").read_text()
    )
    assert meta["num_points"] == 52
    assert 0 <= meta["medoid_idx"] < 52
    assert meta["recommended_search_L"] == 77
