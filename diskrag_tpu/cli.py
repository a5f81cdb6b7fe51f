"""CLI — counterpart of the reference's `diskrag.py`: the `DiskRAG`
facade plus an argparse `main()` with the same 8 subcommands
(process, index, search, list, delete, process-dir, merge, doctor —
reference diskrag.py:455-493), a .env loader, and FAQ-aware result
printing.

The `doctor` command implements the *intended* repair feature (retrain PQ
from vectors.npy / recover vectors.npy from the index artifacts) — the
reference's version calls a nonexistent API and cannot run
(reference diskrag.py:414-430, SURVEY.md §7 quirks).
"""

from __future__ import annotations

import argparse
import logging
import os
import pathlib
import sys
from typing import Optional

import numpy as np

logger = logging.getLogger(__name__)


def load_dotenv(path: str = ".env") -> None:
    """Manual .env parser (reference diskrag.py:17-30)."""
    env = pathlib.Path(path)
    if not env.exists():
        return
    for line in env.read_text(encoding="utf-8").splitlines():
        line = line.strip()
        if line and not line.startswith("#") and "=" in line:
            key, value = line.split("=", 1)
            os.environ.setdefault(key.strip(), value.strip())


class DiskRAG:
    """High-level facade over the pipeline (reference diskrag.py:52)."""

    def __init__(self, config_path: str = "config.yaml", base_dir: str = "collections"):
        from diskrag_tpu.data import CollectionManager, PreprocessingConfig, load_config

        load_dotenv()
        self.config_path = config_path
        if pathlib.Path(config_path).exists():
            self.config = load_config(config_path)
        else:
            self.config = PreprocessingConfig(collection="default")
        self.base_dir = base_dir
        self.manager = CollectionManager(base_dir)

    # --- process ---------------------------------------------------------
    def process(
        self,
        file_path: str,
        collection: Optional[str] = None,
        generate_questions: bool = False,
    ) -> str:
        """Dispatch by file type (reference diskrag.py:75-101). Returns
        the resolved collection name (CLI arg > config > file stem)."""
        path = pathlib.Path(file_path)
        name = collection or self.config.collection or path.stem
        suffix = path.suffix.lower()
        if suffix == ".csv":
            self._process_csv(path, name, generate_questions)
        elif suffix in (".md", ".markdown"):
            self._process_markdown(path, name)
        else:
            raise ValueError(f"unsupported file type: {suffix}")
        return name

    def _process_csv(self, path: pathlib.Path, name: str, questions: bool) -> None:
        import dataclasses

        import pandas as pd

        from diskrag_tpu.data import EmbeddingGenerator, Preprocessor
        from diskrag_tpu.data.question_generator import QuestionGenerator

        # article-format CSVs (title/paragraph_text) go through the
        # chunker path; FAQ CSVs (question/answer) through the
        # Preprocessor (reference auto-detects by columns,
        # chunker.py:147-160)
        cols = set(pd.read_csv(path, nrows=0).columns)
        if "title" in cols and "paragraph_text" in cols:
            self._process_article_csv(path, name)
            return

        cfg = dataclasses.replace(self.config, collection=name)
        qgen = None
        if questions and cfg.question_generation.enabled:
            qgen = QuestionGenerator(dict(cfg.question_generation.__dict__))
        elif not questions:
            cfg = dataclasses.replace(
                cfg,
                question_generation=dataclasses.replace(
                    cfg.question_generation, enabled=False
                ),
            )
        pre = Preprocessor(
            cfg,
            manager=self.manager,
            embedding_generator=EmbeddingGenerator(cfg.embedding),
            question_generator=qgen,
        )
        pre.process_file(str(path))

    def _process_article_csv(self, path: pathlib.Path, name: str) -> None:
        from diskrag_tpu.data import EmbeddingGenerator, TextChunker

        chunker = TextChunker(self.config.chunk)
        chunks = chunker.process_csv(path)
        if not chunks:
            print("(no chunks produced)")
            return
        gen = EmbeddingGenerator(self.config.embedding)
        texts = [c.text for c in chunks]
        vectors, valid = gen.generate_embeddings(texts)
        kept = [chunks[i] for i in valid]
        metas = [
            {
                "type": "article",
                "source_id": c.source_id,
                "section": c.section,
                **(c.metadata or {}),
            }
            for c in kept
        ]
        if self.manager.get_collection_info(name) is None:
            self.manager.create_collection(
                name, vectors.shape[1], config=self.config.to_dict(),
                source_file=str(path),
            )
        self.manager.update_collection(
            name, vectors, [c.text for c in kept], metas, source_file=str(path)
        )

    def _process_markdown(self, path: pathlib.Path, name: str) -> None:
        from diskrag_tpu.data import EmbeddingGenerator, TextChunker
        from diskrag_tpu.data.chunker import DocumentProcessor

        proc = DocumentProcessor(
            TextChunker(self.config.chunk),
            EmbeddingGenerator(self.config.embedding),
            self.manager,
        )
        result = proc.process_file(path, name)
        print(f"processed {result['processed']} chunks ({result['skipped']} skipped)")

    # --- index -----------------------------------------------------------
    def build_index(
        self, collection: str, target_quality: str | None = None,
        force_rebuild: bool = False, index_type: str | None = None,
        checkpoint_dir: str | None = None, n_shards: int | None = None,
    ) -> dict:
        from diskrag_tpu.build_index import build_index_from_vectors

        info = self.manager.get_collection_info(collection)
        if info is None:
            raise ValueError(f"collection {collection} not found")
        vectors = np.load(self.manager.get_vectors_path(collection))
        icfg = self.config.index
        override = {
            k: v
            for k, v in (("R", icfg.R), ("L", icfg.L), ("alpha", icfg.alpha))
            if v is not None
        }
        meta = build_index_from_vectors(
            vectors,
            self.manager.get_index_dir(collection),
            # CLI flag wins; otherwise the config.yaml index: block (the
            # reference documents that block but ignores it, SURVEY §5.6)
            target_quality=target_quality or icfg.target_quality,
            metric=icfg.metric,
            force_pq=icfg.force_pq,
            index_type=index_type or icfg.type,
            force_rebuild=force_rebuild,
            build_method=icfg.build_method,
            opq_iters=icfg.opq_iters,
            pq_kind=icfg.pq_kind,
            write_compat=icfg.write_compat,
            params_override=override or None,
            checkpoint_dir=checkpoint_dir,
            n_shards=n_shards or icfg.n_shards,
            flat_precision=icfg.flat_precision,
            flat_rerank_width=icfg.flat_rerank_width,
            ivf_n_cells=icfg.ivf_n_cells,
            ivf_cap_factor=icfg.ivf_cap_factor,
        )
        # record build stats on the collection (reference build_index.py:334-351)
        info = self.manager.get_collection_info(collection)
        info.chunk_stats["index"] = {
            "index_type": meta.get("index_type", "vamana"),
            "R": meta.get("R"), "L": meta.get("L"), "alpha": meta.get("alpha"),
            "use_pq": meta.get("use_pq"),
            "build_seconds": meta.get("build_seconds"),
        }
        self.manager.save_collection_info(info)
        return meta

    # --- search ----------------------------------------------------------
    def _embedding_fn(self):
        from diskrag_tpu.data import EmbeddingGenerator

        gen = EmbeddingGenerator(self.config.embedding)
        return gen.generate

    def search(
        self, collection: str, query: str, k: int = 5, faq: bool = False,
        serving_mode: str = "auto",
    ) -> dict:
        from diskrag_tpu.engine import SearchEngine

        engine = SearchEngine(
            collection, base_dir=self.base_dir, serving_mode=serving_mode
        )
        fn = self._embedding_fn()
        if faq:
            return engine.faq_search(query, k=k, embedding_fn=fn)
        return engine.search(query, k=k, embedding_fn=fn)

    # --- management ------------------------------------------------------
    def list_collections(self):
        return self.manager.list_collections()

    def delete_collection(self, name: str) -> bool:
        return self.manager.delete_collection(name)

    def process_directory(
        self, directory: str, prefix: Optional[str] = None,
        recursive: bool = False, pattern: str = "*",
    ) -> list[str]:
        """Batch process + auto-index (reference diskrag.py:227-293)."""
        root = pathlib.Path(directory)
        files = sorted(
            root.rglob(pattern) if recursive else root.glob(pattern)
        )
        processed = []
        for f in files:
            if f.suffix.lower() not in (".csv", ".md", ".markdown"):
                continue
            name = f"{prefix}_{f.stem}" if prefix else f.stem
            try:
                self.process(str(f), name)
                self.build_index(name)
                processed.append(name)
            except Exception as e:  # noqa: BLE001 — batch keeps going
                logger.error("failed to process %s: %s", f, e)
        return processed

    def merge_collections(self, sources: list[str], target: str):
        return self.manager.merge_collections(sources, target)

    def doctor(self, collection: str) -> dict:
        """Repair a collection's index artifacts: retrain PQ from
        vectors.npy; if vectors.npy is missing but index artifacts exist,
        reconstruct it from the persisted index."""
        from diskrag_tpu.build_index import attach_pq
        from diskrag_tpu.index.persist import IndexStore, load_index, save_index

        report: dict = {"collection": collection, "actions": []}
        vec_path = self.manager.get_vectors_path(collection)
        index_dir = self.manager.get_index_dir(collection)
        store = IndexStore(index_dir)

        if not vec_path.exists() and store.vectors_path.exists():
            vectors = np.load(store.vectors_path)
            with open(vec_path, "wb") as f:
                np.save(f, vectors)
            report["actions"].append("recovered vectors.npy from index")
        if not vec_path.exists():
            report["status"] = "cannot repair: no vectors anywhere"
            return report

        vectors = np.load(vec_path)
        index_type = "vamana"
        if store.meta_path.exists():
            import json

            try:
                index_type = json.loads(store.meta_path.read_text()).get(
                    "index_type", "vamana"
                )
            except ValueError:
                pass
        if index_type in ("flat", "ivf", "sharded"):
            # these types have no detached PQ artifact set to repair
            # (flat/ivf are self-contained; sharded trains PQ inline) —
            # report health instead of mis-detecting "no index"
            report["actions"].append(
                f"{index_type} index present — nothing to repair "
                f"(use --force-rebuild to rebuild)"
            )
            report["status"] = "ok"
            return report
        if not store.exists():
            report["actions"].append("no index yet — run `index`")
            report["status"] = "ok"
            return report

        # keep vectors host-side: doctor never searches, and committing
        # them to the device would force a minutes-long device->host
        # fetch in save_index below (persist.py docstring)
        index, pq, codes, meta = load_index(index_dir, to_device=False)
        n_index = int(np.asarray(index.vectors).shape[0])
        if len(vectors) != n_index:
            # the collection grew since the build: PQ must be trained on
            # the INDEX's own N rows, or the repaired pq_codes length
            # would mismatch the graph and make the index unloadable
            report["actions"].append(
                f"collection has {len(vectors)} vectors but the index "
                f"was built on {n_index} — repair covers the indexed "
                f"rows; run `index --force-rebuild` to pick up the rest"
            )
        pq_src = np.asarray(index.vectors)
        if pq is None or codes is None or len(codes) != n_index:
            from diskrag_tpu.build_index import _resolve_pq_kind
            from diskrag_tpu.index.persist import IndexStore as _Store

            # retrain the SAME quantizer kind the index was built with
            # (meta records it); a fresh kind choice would silently
            # downgrade e.g. residual -> plain
            kind = meta.get("pq_kind") or _resolve_pq_kind(
                "auto", meta.get("distance_metric", "l2")
            )
            pq, codes, validation = attach_pq(pq_src, pq_kind=kind)
            if pq is not None:
                coarse = (validation or {}).get("coarse_ids")
                # the fresh PQ's own meta keys must win over the stale
                # ones riding in meta_extra (save_index applies extra
                # last); a non-residual retrain also invalidates pq_aux
                pq_meta_keys = (
                    "use_pq", "n_subvectors", "pq_centroids", "pq_kind",
                    "pq_n_coarse", "iq_row_width", "iq_n_cells",
                )
                if coarse is None:
                    _Store(index_dir).pq_aux_path.unlink(missing_ok=True)
                save_index(
                    index_dir, index, pq=pq, pq_codes=codes,
                    pq_coarse_ids=coarse,
                    host_vectors=pq_src, meta_extra={
                        k: v for k, v in meta.items()
                        if k not in pq_meta_keys
                    },
                )
                report["actions"].append(
                    f"retrained PQ (kind={kind})"
                )
        report["status"] = "ok"
        return report


def _print_results(out: dict) -> None:
    """FAQ-aware result printing (reference diskrag.py:516-626)."""
    results = out.get("results", [])
    if not results:
        print("(no results)")
        return
    for i, r in enumerate(results, 1):
        meta = r.get("metadata", {})
        print(f"\n#{i}  distance={r['distance']:.4f}")
        if meta.get("type") == "faq":
            q = meta.get("original_question") or meta.get("question")
            if q:
                print(f"  Q: {q}")
            a = meta.get("answer")
            if a:
                print(f"  A: {a[:300]}")
            if meta.get("is_generated"):
                print("  (matched via generated question)")
        else:
            print(f"  {r['text'][:300]}")
    timing = out.get("timing", {})
    if timing:
        print(
            f"\nembedding {timing.get('embedding_time', 0)*1e3:.1f}ms | "
            f"search {timing.get('search_time', 0)*1e3:.1f}ms | "
            f"total {timing.get('total_time', 0)*1e3:.1f}ms"
        )


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="diskrag-tpu",
        description="DiskRAG-TPU — a TPU-native DiskANN/RAG system",
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    parser.add_argument("--config", default="config.yaml", help="config file path")
    parser.add_argument("--base-dir", default="collections", help="collections dir")
    parser.add_argument("--verbose", "-v", action="store_true")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("process", help="process a source file into vectors")
    p.add_argument("file")
    p.add_argument("--collection", "-c")
    p.add_argument("--questions", "-q", action="store_true",
                   help="generate similar questions for FAQ CSVs")

    p = sub.add_parser("index", help="build the index for a collection")
    p.add_argument("collection")
    p.add_argument("--target-quality", choices=["fast", "balanced", "high"],
                   default=None,
                   help="default: config index.target_quality (balanced)")
    p.add_argument("--index-type",
                   choices=["vamana", "flat", "ivf", "sharded", "auto"],
                   default=None, help="default: config index.type (vamana)")
    p.add_argument("--force-rebuild", action="store_true")
    p.add_argument("--checkpoint-dir", default=None,
                   help="mid-build checkpoint/resume dir for long builds")
    p.add_argument("--shards", type=int, default=None,
                   help="shard count for --index-type sharded (serving "
                        "needs device_count divisible by it)")

    p = sub.add_parser("search", help="search a collection")
    p.add_argument("collection")
    p.add_argument("query")
    p.add_argument("--top-k", "-k", type=int, default=5)
    p.add_argument("--faq", action="store_true",
                   help="FAQ mode: dedup by qa_id, keep type=='faq' entries")
    p.add_argument("--serving-mode", default="auto",
                   choices=["auto", "host_tier", "sharded_flat",
                            "streaming"],
                   help="host_tier: graph in HBM, f32 vectors host-resident "
                        "(needs an index saved with compat records); "
                        "sharded_flat: exhaustive bf16 MXU scan per shard "
                        "of a sharded index, merged over ICI; streaming: "
                        "mutable tier accepting live inserts/deletes "
                        "(HTTP POST /insert, /delete)")

    p = sub.add_parser("process-dir", help="process a whole directory")
    p.add_argument("directory")
    p.add_argument("--prefix", "-p")
    p.add_argument("--recursive", "-r", action="store_true")
    p.add_argument("--pattern", default="*")

    p = sub.add_parser("merge", help="merge collections")
    p.add_argument("collections", nargs="+")
    p.add_argument("--target", "-t", required=True)

    p = sub.add_parser("doctor", help="repair a collection's index artifacts")
    p.add_argument("collection")

    sub.add_parser("list", help="list collections")

    p = sub.add_parser("delete", help="delete a collection")
    p.add_argument("collection")

    return parser


def main(argv: Optional[list[str]] = None) -> int:
    # must run before the first jax import: a fresh checkout's first
    # `index` then reuses the shipped pre-compiled programs instead of
    # paying compile-everything (utils/compile_cache.py)
    from diskrag_tpu.utils.compile_cache import enable_compilation_cache

    enable_compilation_cache()
    args = build_parser().parse_args(argv)
    logging.basicConfig(
        level=logging.INFO if args.verbose else logging.WARNING,
        format="%(levelname)s %(name)s: %(message)s",
    )
    rag = DiskRAG(args.config, base_dir=args.base_dir)

    if args.command == "process":
        # print the RESOLVED name: process() may have stored the data
        # under config.yaml's collection, not the file stem
        name = rag.process(args.file, args.collection, args.questions)
        print(f"done — now run: diskrag-tpu index {name}")
    elif args.command == "index":
        meta = rag.build_index(
            args.collection, args.target_quality, args.force_rebuild,
            index_type=args.index_type, checkpoint_dir=args.checkpoint_dir,
            n_shards=args.shards,
        )
        print(
            f"index built: type={meta.get('index_type', 'vamana')} "
            f"N={meta['num_points']} R={meta.get('R', '-')} "
            f"L={meta.get('L', '-')} use_pq={meta.get('use_pq')} "
            f"({meta.get('build_seconds', 0):.1f}s)"
        )
    elif args.command == "search":
        out = rag.search(
            args.collection, args.query, args.top_k, faq=args.faq,
            serving_mode=args.serving_mode,
        )
        _print_results(out)
    elif args.command == "list":
        infos = rag.list_collections()
        if not infos:
            print("(no collections)")
        for info in infos:
            print(
                f"{info.name}: {info.num_vectors} vectors, dim {info.dimension}, "
                f"updated {info.updated_at}"
            )
    elif args.command == "delete":
        ok = rag.delete_collection(args.collection)
        print("deleted" if ok else "not found")
    elif args.command == "process-dir":
        names = rag.process_directory(
            args.directory, args.prefix, args.recursive, args.pattern
        )
        print(f"processed {len(names)} collections: {', '.join(names)}")
    elif args.command == "merge":
        info = rag.merge_collections(args.collections, args.target)
        print(f"merged into {info.name}: {info.num_vectors} vectors")
    elif args.command == "doctor":
        report = rag.doctor(args.collection)
        print(report)
    return 0


if __name__ == "__main__":
    # die quietly when the reader closes the pipe (e.g. `... | head`)
    try:
        import signal

        signal.signal(signal.SIGPIPE, signal.SIG_DFL)
    except (ImportError, AttributeError, ValueError):
        pass  # no SIGPIPE on this platform
    sys.exit(main())
