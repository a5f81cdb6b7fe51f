"""Product Quantization subsystem.

Replaces the reference's DiskANNPQ (pydiskann/pq/fast_pq.py:162-350, the
live second class — no input normalization, 256 centroids forced, uint8
codes) and AdaptivePQCalculator (pydiskann/pq/adaptive_pq.py).

TPU-native design: all m sub-quantizers are trained *simultaneously* as one
batched k-means over a [m, N, sub_dim] tensor (the reference loops m
sklearn fits), encode/ADC are batched matmul + gather programs.
"""

from diskrag_tpu.pq.kmeans import kmeans_fit
from diskrag_tpu.pq.product_quantizer import ProductQuantizer
from diskrag_tpu.pq.residual import (
    ResidualPQ,
    RPQTables,
    default_n_coarse,
    pq_from_arrays,
)
from diskrag_tpu.pq.intq import (
    IntQuantizer,
    IQTables,
    default_iq_cells,
)
from diskrag_tpu.pq.adaptive import (
    PQRecommendation,
    calculate_adaptive_pq_params,
)

__all__ = [
    "kmeans_fit",
    "ProductQuantizer",
    "ResidualPQ",
    "RPQTables",
    "default_n_coarse",
    "pq_from_arrays",
    "IntQuantizer",
    "IQTables",
    "default_iq_cells",
    "PQRecommendation",
    "calculate_adaptive_pq_params",
]
