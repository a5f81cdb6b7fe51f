"""Core array kernels: batched distances, top-k, medoid.

These replace the reference's scalar Cython kernels
(pydiskann/cython_utils.pyx:18-70,210-263) with batched, MXU-friendly XLA.
"""

from diskrag_tpu.ops.distance import (
    Metric,
    brute_force_topk,
    pairwise_l2_sq,
    pairwise_cosine_distance,
    pairwise_distance,
    query_point_distance,
    squared_norms,
)
from diskrag_tpu.ops.topk import (
    topk_smallest,
    merge_topk,
    mask_duplicates,
)
from diskrag_tpu.ops.medoid import approximate_medoid

__all__ = [
    "Metric",
    "brute_force_topk",
    "pairwise_l2_sq",
    "pairwise_cosine_distance",
    "pairwise_distance",
    "query_point_distance",
    "squared_norms",
    "topk_smallest",
    "merge_topk",
    "mask_duplicates",
    "approximate_medoid",
]
