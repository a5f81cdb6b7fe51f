"""Tracing / profiling utilities.

The reference has no tracer — only wall-clock timing dicts
(SURVEY.md §5.1). Here: phase timers with cumulative stats plus optional
`jax.profiler` trace capture for TPU timeline analysis.
"""

from __future__ import annotations

import contextlib
import logging
import threading
import time
from collections import defaultdict

logger = logging.getLogger(__name__)


class PhaseTimer:
    """Thread-safe named phase timing (engine/build instrumentation)."""

    def __init__(self):
        self._lock = threading.Lock()
        self._totals: dict[str, float] = defaultdict(float)
        self._counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def phase(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self._totals[name] += dt
                self._counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        with self._lock:
            return {
                name: {
                    "total_s": self._totals[name],
                    "count": self._counts[name],
                    "mean_ms": self._totals[name] / max(self._counts[name], 1) * 1e3,
                }
                for name in self._totals
            }

    def reset(self) -> None:
        with self._lock:
            self._totals.clear()
            self._counts.clear()


@contextlib.contextmanager
def device_trace(log_dir: str = "/tmp/diskrag_tpu_trace"):
    """Capture a jax.profiler trace (viewable in TensorBoard/Perfetto)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
        logger.info("device trace written to %s", log_dir)


def block_and_time(fn, *args, repeats: int = 3, **kwargs) -> tuple[float, object]:
    """Compile-warm then time a jitted callable; returns (seconds, result).

    Drains by materializing one leaf of the *newest* result (one
    np.asarray fetch after all dispatches): programs complete in dispatch
    order, so that is a full barrier. `jax.block_until_ready` is NOT used
    for the timed region — on the axon-tunneled TPU it can return before
    execution finishes (see diskrag_tpu.benchmark._measure, which this
    mirrors; use that for dispatch-count auto-scaling)."""
    import jax
    import numpy as np

    def _drain(res) -> None:
        leaves = [x for x in jax.tree.leaves(res) if hasattr(x, "dtype")]
        if leaves:
            np.asarray(leaves[0])

    out = fn(*args, **kwargs)
    _drain(out)
    t0 = time.perf_counter()
    for _ in range(repeats):
        out = fn(*args, **kwargs)
    _drain(out)
    return (time.perf_counter() - t0) / repeats, out
