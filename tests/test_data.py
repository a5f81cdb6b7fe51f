"""Data pipeline tests: config round-trip, chunker behavior, collection
dedup/lookup semantics, mock-embedding ingest (the offline e2e pattern the
reference intended — SURVEY.md §4)."""

import json

import numpy as np
import pandas as pd
import pytest

from diskrag_tpu.data import (
    ChunkConfig,
    CollectionManager,
    EmbeddingConfig,
    EmbeddingGenerator,
    PreprocessingConfig,
    Preprocessor,
    QuestionGenerationConfig,
    TextChunker,
    get_text_hash,
    load_config,
    save_config,
)
from diskrag_tpu.data.chunker import split_text, split_markdown
from diskrag_tpu.data.embedding import mock_embedding


def test_config_yaml_roundtrip(tmp_path):
    cfg = PreprocessingConfig(
        collection="demo",
        embedding=EmbeddingConfig(provider="mock", model="m", dimension=128),
        question_generation=QuestionGenerationConfig(enabled=False),
        chunk=ChunkConfig(size=200, overlap=40),
    )
    path = tmp_path / "config.yaml"
    save_config(cfg, path)
    loaded = load_config(path)
    assert loaded.collection == "demo"
    assert loaded.embedding.provider == "mock"
    assert loaded.chunk.size == 200
    assert loaded.index.target_quality == "balanced"


def test_split_text_overlap_and_snap():
    text = "One sentence. " * 60  # ~840 chars
    parts = split_text(text, size=300, overlap=50)
    assert len(parts) > 1
    assert all(len(p) <= 300 for p in parts)
    # sentence snap: chunks should end with a period (except possibly last)
    assert all(p.rstrip().endswith(".") for p in parts[:-1])
    # short text -> single chunk
    assert split_text("short", size=300, overlap=50) == ["short"]


def test_chunker_faq_csv(tmp_path):
    df = pd.DataFrame(
        {
            "question": ["Q1?", "Q2?"],
            "answer_text": ["A1", "A2"],
        }
    )
    p = tmp_path / "faq.csv"
    df.to_csv(p, index=False)
    chunks = TextChunker(ChunkConfig()).process_csv(p)
    assert len(chunks) == 2
    assert chunks[0].source_type == "faq"
    assert "Q1?" in chunks[0].text and "A1" in chunks[0].text


def test_split_markdown_sections():
    md = (
        "# Install\n"
        "![img](images/a.png)\n"
        + "This paragraph explains the installation procedure in detail, "
        "covering all the steps required to set things up properly.\n"
        + "# Use\n"
        + "Another paragraph with enough characters to be a valid chunk "
        "for the configured minimum size threshold here.\n"
    )
    chunks = split_markdown(md, "manual.md", ChunkConfig(size=300, min_size=50))
    assert len(chunks) == 2
    assert chunks[0].section == "Install"
    assert chunks[0].image == "images/a.png"
    assert chunks[1].section == "Use"


def test_mock_embedding_deterministic():
    a = mock_embedding("hello", 64)
    b = mock_embedding("hello", 64)
    c = mock_embedding("world", 64)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-5


def test_collection_dedup_and_lookup(tmp_path):
    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", dimension=8)
    vecs = np.random.default_rng(0).normal(size=(3, 8)).astype(np.float32)
    texts = ["t1", "t2", "t1"]  # t1 duplicated
    metas = [{"k": i} for i in range(3)]
    info = mgr.update_collection("c", vecs, texts, metas)
    assert info.num_vectors == 2
    got = mgr.get_text_by_index("c", 0)
    assert got is not None and got[0] == "t1"
    # re-adding the same texts is a no-op
    info = mgr.update_collection("c", vecs, texts, metas)
    assert info.num_vectors == 2
    # nested metadata unwrapping
    mgr.update_collection(
        "c",
        vecs[:1] + 1,
        ["t3"],
        [{"qa_id": "x", "metadata": json.dumps({"type": "faq", "qa_id": "x"})}],
    )
    text, meta = mgr.get_text_by_index("c", 2)
    assert text == "t3" and meta["type"] == "faq" and meta["qa_id"] == "x"


def test_preprocessor_end_to_end_mock(tmp_path):
    csv = tmp_path / "faq.csv"
    pd.DataFrame(
        {
            "id": ["faq_1", "faq_2"],
            "question": ["如何安裝？", "怎麼清潔？"],
            "answer": ["請參考手冊第一章。", "使用柔軟的布擦拭。"],
        }
    ).to_csv(csv, index=False)
    cfg = PreprocessingConfig(
        collection="faq_demo",
        embedding=EmbeddingConfig(provider="mock", model="mock-emb", dimension=128),
        question_generation=QuestionGenerationConfig(enabled=True, provider="mock"),
    )
    from diskrag_tpu.data.question_generator import QuestionGenerator

    pre = Preprocessor(
        cfg,
        manager=CollectionManager(tmp_path / "collections"),
        embedding_generator=EmbeddingGenerator(
            cfg.embedding, cache_dir=tmp_path / "cache"
        ),
        question_generator=QuestionGenerator(
            {"provider": "mock", "max_questions": 3}
        ),
    )
    result = pre.process_file(str(csv))
    assert result["texts"] == 2 + 2 * 3  # originals + generated
    info = pre.manager.get_collection_info("faq_demo")
    assert info.num_vectors == 8
    assert info.dimension == 128
    # generated questions saved as *_post.csv
    assert (tmp_path / "faq_post.csv").exists()
    # metadata carries nested faq info unwrapped on read
    text, meta = pre.manager.get_text_by_index("faq_demo", 0)
    assert meta["type"] == "faq" and meta["qa_id"] == "faq_1"


def test_embedding_cache(tmp_path):
    gen = EmbeddingGenerator(
        EmbeddingConfig(provider="mock", model="m", dimension=32),
        cache_dir=tmp_path / "cache",
    )
    embs, valid = gen.generate_embeddings(["a", "b"])
    assert embs.shape == (2, 32) and valid == [0, 1]
    assert gen.cache_misses == 2
    embs2, _ = gen.generate_embeddings(["a", "b"])
    assert gen.cache_hits == 2
    np.testing.assert_array_equal(embs, embs2)


def test_split_text_terminates_with_large_overlap():
    """Regression: overlap >= the sentence-snapped window length used to
    move `start` backward and loop forever (chunker.split_text guard)."""
    from diskrag_tpu.data.chunker import split_text

    # sentence boundaries land just past the midpoint of each window
    text = ("x" * 160 + ". ") * 40
    chunks = split_text(text, size=300, overlap=160)
    assert chunks  # terminated
    joined = "".join(c.replace(" ", "") for c in chunks)
    assert set(joined) <= {"x", "."}
    # every character of the source is covered by some chunk
    assert sum(len(c) for c in chunks) >= len(text.strip()) - len(chunks) * 160


def test_split_markdown_long_line_and_section_flush():
    """Regressions: (a) one line longer than config.size must be
    windowed, not block emission and drop the rest of the document;
    (b) a section heading must flush the pending text into its OWN
    section, not merge it into the next section's first chunk."""
    from diskrag_tpu.data.chunker import split_markdown
    from diskrag_tpu.data.config import ChunkConfig

    cfg = ChunkConfig(size=300, overlap=50, min_size=50)
    long_line = "x" * 400
    content = (
        "# Alpha\n"
        + long_line + "\n"
        + ("alpha tail content " * 5) + "\n"   # ~95 chars, sub-size
        + "# Beta\n"
        + ("beta body content " * 20) + "\n"
    )
    chunks = split_markdown(content, "doc.md", cfg)
    joined = " ".join(c.text for c in chunks)
    assert "x" * 100 in joined          # long line survived (windowed)
    assert "beta body" in joined        # content after it not dropped
    alpha = [c for c in chunks if c.section == "Alpha"]
    beta = [c for c in chunks if c.section == "Beta"]
    assert alpha and beta
    assert all("beta" not in c.text for c in alpha)
    assert all("alpha" not in c.text for c in beta)  # no cross-section carry


def test_faq_metadata_numpy_scalars_json_safe(tmp_path):
    """Regression: numeric CSV columns (np.int64 source_page) must not
    crash json.dumps during collection update."""
    import numpy as np
    import pandas as pd

    from diskrag_tpu.data import (
        CollectionManager, EmbeddingConfig, EmbeddingGenerator,
        PreprocessingConfig, Preprocessor,
    )

    csv = tmp_path / "faq.csv"
    pd.DataFrame(
        [
            {"id": f"q{i}", "question": f"問題{i}？", "answer": f"答案{i}。" * 3,
             "source_page": i + 1}
            for i in range(4)
        ]
    ).to_csv(csv, index=False)
    cfg = PreprocessingConfig(
        collection="np_meta",
        embedding=EmbeddingConfig(provider="mock", model="m", dimension=64),
    )
    mgr = CollectionManager(tmp_path / "collections")
    pre = Preprocessor(
        cfg, manager=mgr,
        embedding_generator=EmbeddingGenerator(cfg.embedding, cache_dir=tmp_path / "c"),
    )
    out = pre.process_file(str(csv))
    assert out and mgr.get_collection_info("np_meta").num_vectors == 4
    text, meta = mgr.get_texts_by_indices("np_meta", [0])[0]
    assert meta["source_page"] == 1  # plain int survived the JSON round-trip


def test_column_store_lookup_semantics(tmp_path):
    """The vector_index column store must match the old pandas path:
    out-of-range/absent ids -> None, cached metadata is mutation-safe,
    and an update_collection invalidates the cache."""
    import numpy as np

    from diskrag_tpu.data import CollectionManager

    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("cs", dimension=4)
    rng = np.random.default_rng(1)
    mgr.update_collection(
        "cs", rng.normal(size=(3, 4)).astype(np.float32),
        ["t0", "t1", "t2"], [{"i": 0}, {"i": 1}, {"i": 2}],
    )
    got = mgr.get_texts_by_indices("cs", [2, 0, 99, -1, 1])
    assert [g[0] if g else None for g in got] == ["t2", "t0", None, None, "t1"]
    assert got[0][1]["i"] == 2 and got[0][1]["vector_index"] == 2
    # caller mutation must not leak into the memoized decode
    got[0][1]["i"] = 999
    again = mgr.get_texts_by_indices("cs", [2])[0]
    assert again[1]["i"] == 2
    # appended rows are visible (cache invalidated by the parquet rewrite)
    mgr.update_collection(
        "cs", rng.normal(size=(1, 4)).astype(np.float32), ["t3"], [{"i": 3}]
    )
    assert mgr.get_texts_by_indices("cs", [3])[0][0] == "t3"
    assert mgr.get_text_by_index("cs", 3)[0] == "t3"


def test_update_collection_recovers_orphan_vectors(tmp_path):
    """Regression: orphan vectors.npy rows from an interrupted update
    (vectors committed, metadata not) must not shift later rows'
    vector_index alignment."""
    import numpy as np

    from diskrag_tpu.data import CollectionManager

    mgr = CollectionManager(tmp_path / "collections")
    mgr.create_collection("c", dimension=8)
    rng = np.random.default_rng(0)
    v1 = rng.normal(size=(3, 8)).astype(np.float32)
    mgr.update_collection("c", v1, ["a", "b", "c"], [{}, {}, {}])
    # simulate the torn state: extra vector rows with no metadata
    vecs = np.load(mgr.get_vectors_path("c"))
    np.save(mgr.get_vectors_path("c"), np.vstack([vecs, rng.normal(size=(2, 8)).astype(np.float32)]))
    v2 = rng.normal(size=(2, 8)).astype(np.float32)
    mgr.update_collection("c", v2, ["d", "e"], [{"i": 3}, {"i": 4}])
    # row 'd' must sit at vector_index 3 AND vectors.npy row 3
    got = mgr.get_texts_by_indices("c", [3, 4])
    assert got[0][0] == "d" and got[1][0] == "e"
    allv = np.load(mgr.get_vectors_path("c"))
    assert allv.shape[0] == 5
    np.testing.assert_allclose(allv[3], v2[0])


def test_embedding_cache_key_includes_dimension(tmp_path):
    """Regression: changing the requested dimension must not serve stale
    cached vectors of the old width."""
    from diskrag_tpu.data import EmbeddingConfig, EmbeddingGenerator

    g1 = EmbeddingGenerator(
        EmbeddingConfig(provider="mock", model="m", dimension=64),
        cache_dir=tmp_path,
    )
    v1 = g1.generate("hello")
    assert v1.shape == (64,)
    g2 = EmbeddingGenerator(
        EmbeddingConfig(provider="mock", model="m", dimension=32),
        cache_dir=tmp_path,
    )
    v2 = g2.generate("hello")
    assert v2.shape == (32,)
