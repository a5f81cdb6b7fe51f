"""Index persistence: the on-disk artifact set is the checkpoint
(reference build_index.py:251-332 / io/diskann_persist.py)."""

from diskrag_tpu.index.persist import (
    IndexStore,
    save_index,
    load_index,
    write_compat_records,
    read_compat_records,
)
from diskrag_tpu.index.streaming import StreamingIndex

__all__ = [
    "IndexStore",
    "save_index",
    "load_index",
    "write_compat_records",
    "read_compat_records",
    "StreamingIndex",
]
