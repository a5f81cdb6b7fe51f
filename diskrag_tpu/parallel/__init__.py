"""Multi-chip scale-out. The reference has NO distributed components
(SURVEY.md §2.6) — its scale story is mmap + PQ compression. The
TPU-native equivalents designed here:

  - index sharding: partitioned Vamana sub-indexes across devices
    (`jax.sharding` + `shard_map`), per-shard top-k searched locally and
    merged with an ICI all-gather — the analog of what GPU ANN systems do
    with NCCL;
  - data-parallel query batching over a second mesh axis;
  - per-shard independent builds (embarrassingly parallel wave steps);
  - sharded host-offload tier: per-shard bf16 traversal in HBM, pools
    all-gathered over ICI, one exact host rerank against the f32 record
    file (BASELINE configs 4+5 combined);
  - multi-host (DCN) tier: per-host ingest + local shard builds, one
    global mesh via jax.distributed, search merges riding ICI within a
    host and DCN across hosts (`parallel/multihost.py`, DESIGN.md
    "ICI vs DCN").
"""

from diskrag_tpu.parallel import multihost
from diskrag_tpu.parallel.host_tier import ShardedHostTier
from diskrag_tpu.parallel.mesh import make_mesh
from diskrag_tpu.parallel.sharded import (
    ShardedIndex,
    build_sharded,
    load_sharded_index,
    save_sharded_index,
    sharded_build_wave,
    sharded_flat_search,
    sharded_search,
    shard_to_mesh,
)

__all__ = [
    "multihost",
    "ShardedHostTier",
    "make_mesh",
    "ShardedIndex",
    "build_sharded",
    "load_sharded_index",
    "save_sharded_index",
    "sharded_build_wave",
    "sharded_flat_search",
    "sharded_search",
    "shard_to_mesh",
]
