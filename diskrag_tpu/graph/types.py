"""Index data model.

The reference's in-memory graph is a dict of Python `Node` objects with
`set` neighbor lists (reference pydiskann/vamana_graph.py:8-31). The
TPU-native equivalent is a pytree of dense device arrays with static
shapes, so the whole index can live in HBM, be sharded with
`jax.sharding`, and be closed over by jitted search programs.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from diskrag_tpu.ops.distance import Metric


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class VamanaIndex:
    """A Vamana graph index resident on device.

    Attributes:
      vectors:   float32[N, D] full-precision vectors.
      adjacency: int32[N, R] neighbor ids, -1 padded (we use a -1 sentinel
                 where the reference zero-pads and thereby aliases node 0 —
                 reference io/diskann_persist.py:23, SURVEY.md §7).
      medoid:    int32[] start node for search.
      metric:    distance metric (static aux data).
      entry_points: optional int32[S] extra unique search seeds (besides
                 the medoid), computed at build time as the database
                 points nearest to k-means cell centers. Used by the
                 kNN-based fast build, whose long-range edges are
                 unstructured: one [B, S] seed matmul replaces the
                 navigation the sequential build encodes in its edges.
                 No reference counterpart (single-medoid entry,
                 vamana_graph.py:557).
    """

    vectors: jax.Array
    adjacency: jax.Array
    medoid: jax.Array
    metric: str = dataclasses.field(default=Metric.L2.value, metadata={"static": True})
    entry_points: jax.Array | None = None

    @property
    def n_points(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    @property
    def degree_bound(self) -> int:
        return self.adjacency.shape[1]

    @classmethod
    def from_numpy(
        cls,
        vectors: np.ndarray,
        adjacency: np.ndarray,
        medoid: int,
        metric: str = Metric.L2.value,
        entry_points: np.ndarray | None = None,
    ) -> "VamanaIndex":
        return cls(
            vectors=jnp.asarray(vectors, dtype=jnp.float32),
            adjacency=jnp.asarray(adjacency, dtype=jnp.int32),
            medoid=jnp.asarray(medoid, dtype=jnp.int32),
            metric=Metric(metric).value,
            entry_points=(
                None
                if entry_points is None
                else jnp.asarray(entry_points, dtype=jnp.int32)
            ),
        )

    def degrees(self) -> jax.Array:
        """Out-degree per node."""
        return jnp.sum(self.adjacency >= 0, axis=1)
