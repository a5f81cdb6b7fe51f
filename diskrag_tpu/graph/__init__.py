"""Vamana graph: TPU-native build + search.

Replaces the reference's graph layer (pydiskann/vamana_graph.py +
cython_utils.pyx) with dense-array algorithms:

  - graph = `int32[N, R]` padded adjacency (-1 sentinel) instead of
    per-node Python `set`s (reference vamana_graph.py:8-14);
  - search = fixed-width masked frontier expansion under `lax.while_loop`
    instead of heapq loops (reference vamana_graph.py:535-640);
  - build = wave-batched insertion with vectorized RobustPrune instead of
    the sequential Cython loop (reference cython_utils.pyx:269-369).
"""

from diskrag_tpu.graph.types import VamanaIndex
from diskrag_tpu.graph.search import (
    beam_search,
    beam_search_iq,
    beam_search_pq,
    SearchResult,
)
from diskrag_tpu.graph.prune import robust_prune_batch
from diskrag_tpu.graph.build import build_vamana, random_regular_init

__all__ = [
    "VamanaIndex",
    "beam_search",
    "beam_search_iq",
    "beam_search_pq",
    "SearchResult",
    "robust_prune_batch",
    "build_vamana",
    "random_regular_init",
]
