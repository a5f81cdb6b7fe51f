"""diskrag_tpu — a TPU-native DiskANN / RAG framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
DiskRAG stack (Jolara-ai/diskrag): Vamana graph construction, batched
greedy/beam search, Product Quantization with ADC, collection management,
ingest pipeline, CLI and HTTP serving — with all distance math, graph build,
frontier search and top-k running on TPU as batched XLA / Pallas programs.

Layer map (ours; cf. reference SURVEY.md §1):

    interfaces   cli.py, api.py                (ref: diskrag.py, app.py)
    orchestration engine.py, build_index.py    (ref: search_engine.py,
                                                scripts/tools/build_index.py)
    data          data/                        (ref: preprocessing/)
    ANN core      graph/, pq/, ops/, index/    (ref: pydiskann/)
    parallel      parallel/                    (ref: none — TPU-native design)
"""

from diskrag_tpu.version import __version__

__all__ = ["__version__"]
