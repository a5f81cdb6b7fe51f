"""CLI + HTTP API tests (offline, mock providers throughout)."""

import json

import numpy as np
import pandas as pd
import pytest

from diskrag_tpu.cli import DiskRAG, main as cli_main
from diskrag_tpu.data import (
    EmbeddingConfig,
    PreprocessingConfig,
    QuestionGenerationConfig,
    save_config,
)


@pytest.fixture()
def workspace(tmp_path, monkeypatch):
    """A config + FAQ CSV workspace using mock providers."""
    monkeypatch.chdir(tmp_path)
    cfg = PreprocessingConfig(
        collection="faq",
        embedding=EmbeddingConfig(provider="mock", model="mock", dimension=128),
        question_generation=QuestionGenerationConfig(enabled=False),
    )
    save_config(cfg, tmp_path / "config.yaml")
    rows = [
        {"id": f"q{i}", "question": f"如何使用功能{i}？", "answer": f"功能{i}的答案。"}
        for i in range(20)
    ]
    pd.DataFrame(rows).to_csv(tmp_path / "faq.csv", index=False)
    return tmp_path


def test_cli_process_index_search_list_delete(workspace, capsys):
    assert cli_main(["process", "faq.csv", "--collection", "faq"]) == 0
    assert cli_main(["index", "faq"]) == 0
    out = capsys.readouterr().out
    assert "index built" in out

    assert cli_main(["search", "faq", "如何使用功能3?", "-k", "3"]) == 0
    out = capsys.readouterr().out
    assert "功能3" in out

    assert cli_main(["list"]) == 0
    out = capsys.readouterr().out
    assert "faq: 20 vectors" in out

    assert cli_main(["delete", "faq"]) == 0
    out = capsys.readouterr().out
    assert "deleted" in out


def test_cli_merge_and_doctor(workspace, capsys):
    rag = DiskRAG("config.yaml")
    rag.process("faq.csv", "a")
    rag.process("faq.csv", "b")
    info = rag.merge_collections(["a", "b"], "m")
    # same content -> dedup leaves 20
    assert info.num_vectors == 20

    rag.build_index("m")
    report = rag.doctor("m")
    assert report["status"] == "ok"

    # self-contained index types must report healthy, not "no index"
    rag.build_index("m", index_type="flat", force_rebuild=True)
    report = rag.doctor("m")
    assert report["status"] == "ok"
    assert any("flat index present" in a for a in report["actions"])


@pytest.fixture()
def api_client(workspace):
    """App factory over a prepared collection (fresh app per event loop)."""
    pytest.importorskip("aiohttp")
    from diskrag_tpu.api import AppState, create_app

    rag = DiskRAG("config.yaml")
    rag.process("faq.csv", "faq")
    rag.build_index("faq")

    def factory():
        state = AppState(
            base_dir="collections",
            embedding_config=EmbeddingConfig(
                provider="mock", model="mock", dimension=128
            ),
            llm_fn=lambda system, prompt: "這是模擬回答。",
        )
        return create_app(state)

    return factory


async def _request(app, method, path, payload=None):
    from aiohttp.test_utils import TestClient, TestServer

    async with TestClient(TestServer(app)) as client:
        if method == "GET":
            resp = await client.get(path)
        else:
            resp = await client.post(path, json=payload)
        return resp.status, await resp.json()


def _run(coro):
    import asyncio

    loop = asyncio.new_event_loop()
    try:
        return loop.run_until_complete(coro)
    finally:
        loop.close()


def test_api_search(api_client):
    status, data = _run(
        _request(api_client(), "POST", "/search",
                 {"collection": "faq", "query": "如何使用功能5?", "top_k": 3})
    )
    assert status == 200
    assert data["results"] and "功能5" in data["results"][0]["text"]
    assert "timing" in data and "stats" in data


def test_api_faq_search_and_validation(api_client):
    status, data = _run(
        _request(api_client(), "POST", "/faq-search",
                 {"collection": "faq", "query": "功能7怎麼用", "top_k": 2})
    )
    assert status == 200
    qa_ids = [r["metadata"]["qa_id"] for r in data["results"]]
    assert len(qa_ids) == len(set(qa_ids))

    # validation error -> 422
    status, _ = _run(
        _request(api_client(), "POST", "/search", {"collection": "faq", "query": ""})
    )
    assert status == 422


def test_api_collections_and_health(api_client):
    status, data = _run(_request(api_client(), "GET", "/collections"))
    assert status == 200
    entry = next(e for e in data if e["name"] == "faq")
    assert entry["status"] == "ready"

    status, data = _run(_request(api_client(), "GET", "/health"))
    assert status == 200
    assert data["checks"]["collections_dir_exists"]


def test_api_ask(api_client):
    status, data = _run(
        _request(api_client(), "POST", "/ask",
                 {"collection": "faq", "question": "功能2怎麼用?", "top_k": 2})
    )
    assert status == 200
    assert data["answer"] == "這是模擬回答。"
    assert data["timing"]["total_time"] > 0


def test_cli_process_article_csv_and_markdown(workspace, capsys):
    rows = [
        {"id": "a1", "title": "安裝指南",
         "paragraph_text": "本章介紹完整的安裝流程，包括前置需求與步驟說明。" * 4,
         "section": "第一章"},
    ]
    pd.DataFrame(rows).to_csv("articles.csv", index=False)
    assert cli_main(["process", "articles.csv", "-c", "arts"]) == 0
    rag = DiskRAG("config.yaml")
    info = rag.manager.get_collection_info("arts")
    assert info is not None and info.num_vectors >= 1
    text, meta = rag.manager.get_text_by_index("arts", 0)
    assert meta["type"] == "article" and meta["title"] == "安裝指南"

    # markdown ingestion path
    md = (
        "# 使用\n"
        + "這一段說明如何日常使用產品，內容足夠長以通過最小長度檢查。" * 3
        + "\n"
    )
    with open("manual.md", "w") as f:
        f.write(md)
    assert cli_main(["process", "manual.md", "-c", "docs"]) == 0
    info = rag.manager.get_collection_info("docs")
    assert info is not None and info.num_vectors >= 1


def test_api_search_batch(api_client):
    """Batched endpoint (ours only): one device dispatch per request,
    per-query result lists in order."""
    status, data = _run(
        _request(api_client(), "POST", "/search-batch",
                 {"collection": "faq",
                  "queries": ["如何使用功能5?", "如何使用功能2?"],
                  "top_k": 2})
    )
    assert status == 200
    assert len(data["results"]) == 2
    assert "功能5" in data["results"][0][0]["text"]
    assert "功能2" in data["results"][1][0]["text"]

    status, _ = _run(
        _request(api_client(), "POST", "/search-batch",
                 {"collection": "faq", "queries": []})
    )
    assert status == 422


def test_api_insert_delete_live(api_client):
    """POST /insert + /delete on a streaming-mode server: inserted texts
    are searchable immediately; non-streaming servers answer 409."""
    pytest.importorskip("aiohttp")
    from diskrag_tpu.api import AppState, create_app

    def streaming_factory():
        state = AppState(
            base_dir="collections",
            embedding_config=EmbeddingConfig(
                provider="mock", model="mock", dimension=128
            ),
            serving_mode="streaming",
        )
        return create_app(state)

    async def flow():
        app = streaming_factory()
        texts = [f"即時插入的新文件 {i}" for i in range(4)]
        status, data = await _request(
            app, "POST", "/insert",
            {"collection": "faq", "texts": texts,
             "metadata": [{"type": "live"}] * 4},
        )
        assert status == 200, data
        assert data["inserted"] == 4 and len(data["ids"]) == 4
        # duplicates skipped on a second insert
        status, data2 = await _request(
            app, "POST", "/insert", {"collection": "faq", "texts": texts[:2]}
        )
        assert status == 200 and data2["inserted"] == 0
        # immediately searchable
        status, out = await _request(
            app, "POST", "/search",
            {"collection": "faq", "query": texts[1], "top_k": 3},
        )
        assert status == 200
        assert out["results"][0]["text"] == texts[1]
        # delete tombstones it
        status, d = await _request(
            app, "POST", "/delete",
            {"collection": "faq", "ids": [data["ids"][1]]},
        )
        assert status == 200 and d["deleted"] == 1
        # idempotent re-delete reports 0 newly tombstoned (ADVICE r2:
        # the response counts what actually happened, not len(ids))
        status, d = await _request(
            app, "POST", "/delete",
            {"collection": "faq", "ids": [data["ids"][1]]},
        )
        assert status == 200 and d["deleted"] == 0 and d["requested"] == 1
        status, out = await _request(
            app, "POST", "/search",
            {"collection": "faq", "query": texts[1], "top_k": 3},
        )
        assert all(r["text"] != texts[1] for r in out["results"])
        # unknown id -> 404
        status, _ = await _request(
            app, "POST", "/delete", {"collection": "faq", "ids": [999999]}
        )
        assert status == 404
        return True

    assert _run(flow())


def test_api_insert_requires_streaming_mode(api_client):
    """A non-streaming server must answer /insert with 409 (serving
    configuration), not 500."""
    status, data = _run(
        _request(
            api_client(), "POST", "/insert",
            {"collection": "faq", "texts": ["x"]},
        )
    )
    assert status == 409
    assert "streaming" in data["detail"]
