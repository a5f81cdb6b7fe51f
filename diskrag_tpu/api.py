"""HTTP API — counterpart of the reference's FastAPI `app.py`, serving
the same five endpoints with the same request/response schemas:

    POST /search       {collection, query, top_k, use_faq_search}
    POST /faq-search   {collection, query, top_k}
    GET  /collections  per-collection file-integrity report
    GET  /health       directory/env checks
    POST /ask          {collection, question, top_k} -> RAG answer

Implemented on aiohttp (FastAPI is not available in this environment);
request validation via pydantic models mirroring the reference's
(app.py:68-82,356-364). Engines are cached per collection (app.py:50-66).
The /ask LLM call normalizes refusals exactly like the reference
(app.py:466-469).
"""

from __future__ import annotations

import asyncio

import json
import logging
import os
import pathlib
import time
from typing import Annotated, Any, Optional

from pydantic import BaseModel, Field, ValidationError

from diskrag_tpu.data import CollectionManager, EmbeddingConfig, EmbeddingGenerator
from diskrag_tpu.engine import SearchEngine, ServingConfigError

try:
    from aiohttp import web
except ImportError:  # pragma: no cover
    web = None

logger = logging.getLogger(__name__)

OPENAI_CHAT_URL = "https://api.openai.com/v1/chat/completions"
REFUSAL_KEYWORDS = ["無法回答", "不知道", "沒有相關資訊", "找不到"]
REFUSAL_ANSWER = "抱歉，我無法根據現有資料回答這個問題。"


class SearchRequest(BaseModel):
    collection: str = Field(...)
    query: str = Field(..., min_length=1, max_length=500)
    top_k: int = Field(5, ge=1, le=20)
    use_faq_search: bool = False


class BatchSearchRequest(BaseModel):
    collection: str = Field(...)
    # same per-query constraints as SearchRequest.query
    queries: list[Annotated[str, Field(min_length=1, max_length=500)]] = (
        Field(..., min_length=1, max_length=1024)
    )
    top_k: int = Field(5, ge=1, le=20)


class InsertRequest(BaseModel):
    collection: str = Field(...)
    texts: list[Annotated[str, Field(min_length=1, max_length=5000)]] = (
        Field(..., min_length=1, max_length=1024)
    )
    metadata: Optional[list[dict]] = None


class DeleteRequest(BaseModel):
    collection: str = Field(...)
    ids: list[int] = Field(..., min_length=1, max_length=65536)


class AskRequest(BaseModel):
    collection: str = Field(...)
    question: str = Field(..., min_length=1, max_length=500)
    top_k: int = Field(2, ge=1, le=5)


class AppState:
    """Engine + embedding caches shared across requests."""

    def __init__(
        self,
        base_dir: str = "collections",
        embedding_config: Optional[EmbeddingConfig] = None,
        llm_fn=None,
        serving_mode: Optional[str] = None,
    ):
        """`serving_mode` None reads DISKRAG_SERVING_MODE (default
        "auto"); "host_tier" serves every collection with host-resident
        f32 vectors (see SearchEngine). In "streaming" mode,
        DISKRAG_STREAMING_RESERVE=<n> pre-pads the mutable tier for n
        upcoming inserts so no growth/recompile event fires mid-serving
        (engine._init_streaming)."""
        self.serving_mode = serving_mode or os.environ.get(
            "DISKRAG_SERVING_MODE", "auto"
        )
        self.base_dir = base_dir
        self.manager = CollectionManager(base_dir)
        self.engines: dict[str, SearchEngine] = {}
        if embedding_config is None:
            provider = "openai" if os.environ.get("OPENAI_API_KEY") else "mock"
            embedding_config = EmbeddingConfig(provider=provider)
        self.embedder = EmbeddingGenerator(embedding_config)
        self.llm_fn = llm_fn  # injectable for tests; default = OpenAI REST

    def get_engine(self, collection: str) -> SearchEngine:
        if collection not in self.engines:
            self.engines[collection] = SearchEngine(
                collection, base_dir=self.base_dir,
                serving_mode=self.serving_mode,
            )
        return self.engines[collection]

    def embed(self, text: str):
        return self.embedder.generate(text)

    def chat(self, system: str, prompt: str) -> str:
        if self.llm_fn is not None:
            return self.llm_fn(system, prompt)
        import httpx

        api_key = os.environ.get("OPENAI_API_KEY")
        if not api_key:
            raise RuntimeError("OPENAI_API_KEY not set for /ask")
        resp = httpx.post(
            OPENAI_CHAT_URL,
            headers={"Authorization": f"Bearer {api_key}"},
            json={
                "model": "gpt-4o-mini",
                "messages": [
                    {"role": "system", "content": system},
                    {"role": "user", "content": prompt},
                ],
                "temperature": 0.3,
                "max_tokens": 500,
            },
            timeout=60.0,
        )
        resp.raise_for_status()
        return resp.json()["choices"][0]["message"]["content"].strip()


def _json_error(status: int, detail: str):
    return web.json_response({"detail": detail}, status=status)


def _build_context(results: list[dict]) -> str:
    """FAQ-aware context assembly (reference app.py:415-428)."""
    parts = []
    for i, r in enumerate(results, 1):
        meta = r.get("metadata", {})
        q = meta.get("original_question") or meta.get("question", "")
        a = meta.get("answer", "")
        if meta.get("type") == "faq" and q and a:
            parts.append(f"FAQ {i}:\n問題：{q}\n答案：{a}")
        else:
            text = r.get("text", "")
            if text:
                parts.append(f"來源 {i}:\n{text}")
    return "\n\n".join(parts)


_ASK_SYSTEM = (
    "你是一個專業的客服助手，根據提供的 FAQ 資料回答問題。回答要簡潔明確，"
    "直接給出解決方案。如果資料不足以回答，請直接說不知道。"
)

_ASK_PROMPT = """你是一個專業的客服助手，請根據以下參考資料回答使用者的問題。
如果參考資料不足以回答問題，或問題與參考資料無關，請直接回答「抱歉，我無法根據現有資料回答這個問題」。

參考資料：
{context}

使用者問題：{question}

請注意：
1. 如果參考資料是 FAQ 格式，請特別注意問題和答案的對應關係
2. 回答時要簡潔明確，直接給出解決方案
3. 如果有多個相關答案，請整合成一個完整的回答
4. 不需要包含「根據參考資料」等開場白
5. 如果參考資料不足以回答問題，請直接說不知道"""


def create_app(state: Optional[AppState] = None):
    """Build the aiohttp application."""
    if web is None:
        raise RuntimeError("aiohttp is not available")
    state = state or AppState()
    app = web.Application()
    app["state"] = state

    async def search(request: web.Request):
        try:
            req = SearchRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(422, str(e))
        try:
            # blocking work (engine bring-up, OpenAI embed, device RPCs)
            # runs in a worker thread: the reference ran sync endpoints
            # in FastAPI's threadpool (app.py:84), and one slow upstream
            # call must not stall the event loop for every other request
            def work():
                engine = state.get_engine(req.collection)
                fn = engine.faq_search if req.use_faq_search else engine.search
                return fn(req.query, k=req.top_k, embedding_fn=state.embed)

            out = await asyncio.to_thread(work)
            return web.json_response(out)
        except Exception as e:  # noqa: BLE001
            logger.exception("search failed")
            return _json_error(500, str(e))

    async def search_batch(request: web.Request):
        """Batched search (ours only — the reference serves one query
        per request): one device dispatch for the whole list."""
        try:
            req = BatchSearchRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(422, str(e))
        try:
            def work():
                engine = state.get_engine(req.collection)
                return engine.search_many(
                    req.queries, k=req.top_k, embedding_fn=state.embed
                )

            out = await asyncio.to_thread(work)
            return web.json_response(out)
        except Exception as e:  # noqa: BLE001
            logger.exception("search_batch failed")
            return _json_error(500, str(e))

    async def faq_search(request: web.Request):
        try:
            req = SearchRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(422, str(e))
        try:
            def work():
                engine = state.get_engine(req.collection)
                return engine.faq_search(
                    req.query, k=req.top_k, embedding_fn=state.embed
                )

            out = await asyncio.to_thread(work)
            return web.json_response(out)
        except Exception as e:  # noqa: BLE001
            logger.exception("faq_search failed")
            return _json_error(500, str(e))

    async def insert(request: web.Request):
        """Live ingest (ours only — no reference counterpart; requires
        the server to run with DISKRAG_SERVING_MODE=streaming): embed ->
        dedup-append to the collection -> insert into the serving tier.
        Inserted rows are searchable immediately (exact side buffer)."""
        try:
            req = InsertRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(422, str(e))
        if req.metadata is not None and len(req.metadata) != len(req.texts):
            return _json_error(422, "metadata length != texts length")
        try:
            def work():
                engine = state.get_engine(req.collection)
                ids = engine.insert_texts(
                    req.texts, metadata_list=req.metadata,
                    embedding_fn=state.embed,
                )
                return {
                    "inserted": len(ids),
                    "skipped_duplicates": len(req.texts) - len(ids),
                    "ids": [int(i) for i in ids],
                    "n_total_live": int(engine.streaming.n_total_live),
                }

            out = await asyncio.to_thread(work)
            return web.json_response(out)
        except ServingConfigError as e:
            return _json_error(409, str(e))
        except Exception as e:  # noqa: BLE001
            logger.exception("insert failed")
            return _json_error(500, str(e))

    async def delete(request: web.Request):
        """Tombstone rows by vector id (streaming mode; idempotent)."""
        try:
            req = DeleteRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(422, str(e))
        try:
            def work():
                engine = state.get_engine(req.collection)
                # delete_ids validates every id BEFORE mutating (a 404
                # is side-effect-free) and returns how many ids were
                # NEWLY tombstoned — idempotent re-deletes are not
                # reported as deletions
                n_new = engine.delete_ids(req.ids)
                return {
                    "deleted": n_new,
                    "requested": len(req.ids),
                    "n_total_live": int(engine.streaming.n_total_live),
                }

            out = await asyncio.to_thread(work)
            return web.json_response(out)
        except ServingConfigError as e:
            return _json_error(409, str(e))
        except KeyError as e:
            return _json_error(404, f"unknown id: {e}")
        except Exception as e:  # noqa: BLE001
            logger.exception("delete failed")
            return _json_error(500, str(e))

    async def collections(request: web.Request):
        """Per-collection integrity report (reference app.py:132-293)."""
        out = []
        for info in state.manager.list_collections():
            name = info.name
            index_dir = state.manager.get_index_dir(name)
            entry: dict[str, Any] = {
                "name": name,
                "num_vectors": info.num_vectors,
                "dimension": info.dimension,
                "updated_at": info.updated_at,
            }
            if not index_dir.exists():
                entry["status"] = "no_index"
                entry["missing_files"] = ["index directory"]
                out.append(entry)
                continue
            meta_path = index_dir / "meta.json"
            if not meta_path.exists():
                entry["status"] = "incomplete"
                entry["missing_files"] = ["index/meta.json"]
                out.append(entry)
                continue
            try:
                meta = json.loads(meta_path.read_text())
            except ValueError:
                meta = {}
            required = {
                "vectors.npy": state.manager.get_vectors_path(name),
                "metadata.parquet": state.manager.get_metadata_path(name),
                "index/meta.json": meta_path,
            }
            # per-index-type artifact sets (flat/ivf/sharded are not the
            # vamana layout — reporting adjacency.npy as missing for a
            # flat index would be a false "incomplete")
            itype = meta.get("index_type", "vamana")
            if itype == "flat":
                required["index/vectors.npy"] = index_dir / "vectors.npy"
            elif itype == "ivf":
                required["index/vectors.npy"] = index_dir / "vectors.npy"
                required["index/ivf_centroids.npy"] = (
                    index_dir / "ivf_centroids.npy"
                )
                required["index/ivf_tile_ids.npy"] = (
                    index_dir / "ivf_tile_ids.npy"
                )
            elif itype == "sharded":
                for f in ("sharded_meta.json", "vectors.npy",
                          "adjacency.npy", "medoids.npy", "global_ids.npy"):
                    required[f"index/sharded/{f}"] = index_dir / "sharded" / f
                if meta.get("write_compat"):
                    required["index/index.dat"] = index_dir / "index.dat"
            else:
                required["index/vectors.npy"] = index_dir / "vectors.npy"
                required["index/adjacency.npy"] = index_dir / "adjacency.npy"
            if meta.get("use_pq"):
                required["index/pq_model.npz"] = index_dir / "pq_model.npz"
                required["index/pq_codes.npy"] = index_dir / "pq_codes.npy"
            missing = [k for k, p in required.items() if not p.exists()]
            entry["status"] = "ready" if not missing else "incomplete"
            if missing:
                entry["missing_files"] = missing
            entry["use_pq"] = meta.get("use_pq")
            entry["num_points"] = meta.get("num_points")
            out.append(entry)
        return web.json_response(out)

    async def health(request: web.Request):
        """Dir/env checks (reference app.py:295-354)."""
        base = pathlib.Path(state.base_dir)
        writable = False
        if base.exists():
            probe = base / ".write_probe"
            try:
                probe.write_text("ok")
                probe.unlink()
                writable = True
            except OSError:
                writable = False
        checks = {
            "collections_dir_exists": base.exists(),
            "collections_dir_writable": writable,
            "openai_api_key_set": bool(os.environ.get("OPENAI_API_KEY")),
            "embedding_provider": state.embedder.provider,
        }
        status = "ok" if base.exists() and writable else "degraded"
        return web.json_response({"status": status, "checks": checks})

    async def ask(request: web.Request):
        """Full RAG: search -> context -> LLM answer (reference app.py:366-493)."""
        try:
            req = AskRequest(**await request.json())
        except (ValidationError, ValueError) as e:
            return _json_error(422, str(e))
        t_total = time.perf_counter()
        try:
            engine = await asyncio.to_thread(
                state.get_engine, req.collection
            )
            t_emb = time.perf_counter()
            embedding = await asyncio.to_thread(state.embed, req.question)
            embedding_time = time.perf_counter() - t_emb
            t_search = time.perf_counter()
            results = await asyncio.to_thread(
                lambda: engine.search(
                    req.question, k=req.top_k,
                    embedding_fn=lambda _t: embedding,
                )
            )
            diskann_time = time.perf_counter() - t_search
            search_time = time.perf_counter() - t_total

            if not results.get("results"):
                return web.json_response(
                    {
                        "answer": REFUSAL_ANSWER,
                        "timing": {
                            "embedding_time": embedding_time,
                            "diskann_time": diskann_time,
                            "search_time": search_time,
                            "llm_time": 0,
                            "total_time": search_time,
                        },
                    }
                )

            context = _build_context(results["results"])
            t_llm = time.perf_counter()
            try:
                answer = await asyncio.to_thread(
                    state.chat,
                    _ASK_SYSTEM,
                    _ASK_PROMPT.format(context=context, question=req.question),
                )
                if any(k in answer.lower() for k in REFUSAL_KEYWORDS):
                    answer = REFUSAL_ANSWER
            except Exception as e:  # noqa: BLE001
                logger.exception("LLM call failed")
                answer = "抱歉，系統處理您的問題時發生錯誤。"
            llm_time = time.perf_counter() - t_llm
            return web.json_response(
                {
                    "answer": answer,
                    "timing": {
                        "embedding_time": embedding_time,
                        "diskann_time": diskann_time,
                        "search_time": search_time,
                        "llm_time": llm_time,
                        "total_time": time.perf_counter() - t_total,
                    },
                }
            )
        except Exception as e:  # noqa: BLE001
            logger.exception("ask failed")
            return _json_error(500, str(e))

    app.router.add_post("/search", search)
    app.router.add_post("/search-batch", search_batch)
    app.router.add_post("/insert", insert)
    app.router.add_post("/delete", delete)
    app.router.add_post("/faq-search", faq_search)
    app.router.add_get("/collections", collections)
    app.router.add_get("/health", health)
    app.router.add_post("/ask", ask)
    return app


def main(
    host: str = "0.0.0.0", port: int = 8000, config: str = "config.yaml"
) -> None:
    # pre-seeded XLA cache before any jax import: a fresh checkout's
    # server warms serving compiles from the shipped archive
    from diskrag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    # stream + app.log file logging, like the reference (app.py:16-24)
    logging.basicConfig(
        level=logging.INFO,
        handlers=[logging.StreamHandler(), logging.FileHandler("app.log")],
        format="%(asctime)s %(levelname)s %(name)s: %(message)s",
    )
    # honor ./config.yaml like the CLI does (embedding provider/model/
    # dimension — otherwise a mock fallback defaults to 1536-d and
    # mismatches any non-1536-d collection)
    state = None
    if pathlib.Path(config).exists():
        # only the embedding: block matters here — read it directly so a
        # serving-only config.yaml without a `collection` key works
        import yaml

        from diskrag_tpu.data.config import EmbeddingConfig

        with open(config, encoding="utf-8") as f:
            data = yaml.safe_load(f) or {}
        emb = data.get("embedding")
        if emb is None and not os.environ.get("OPENAI_API_KEY"):
            # a serving-only config with no embedding: block must fall
            # back to the mock provider exactly like the no-config path
            # (EmbeddingConfig defaults to openai, whose constructor
            # requires the key) — AppState applies that fallback itself
            state = AppState()
        else:
            state = AppState(
                embedding_config=EmbeddingConfig(**(emb or {}))
            )
    web.run_app(create_app(state), host=host, port=port)


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser(description="diskrag-tpu HTTP API")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--config", default="config.yaml")
    a = ap.parse_args()
    main(host=a.host, port=a.port, config=a.config)
