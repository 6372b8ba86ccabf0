"""Tracing / profiling hooks (SURVEY.md §5: the reference has only tqdm bars).

Wraps jax.profiler: named trace annotations around encode stages, optional
TensorBoard trace dump, and a lightweight wall-clock stage timer whose
results feed the JSONL metrics stream.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict

import jax


@contextlib.contextmanager
def trace_annotation(name: str):
    """Named region in the device profiler timeline."""
    with jax.profiler.TraceAnnotation(name):
        yield


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a TensorBoard-viewable device trace for the enclosed block."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Accumulating wall-clock timer per pipeline stage.

    Blocks on device results at stage exit so the number means something
    (async dispatch otherwise attributes all time to the first sync point).
    """

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        box = {}
        try:
            yield box
        finally:
            out = box.get("result", result)
            if out is not None:
                jax.block_until_ready(out)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def summary(self) -> Dict[str, dict]:
        return {k: {"total_s": v, "calls": self.counts[k],
                    "mean_ms": 1e3 * v / self.counts[k]}
                for k, v in self.totals.items()}
