"""Profiling / tracing helpers.

Replaces the reference's manual perf_counter spans (gdrn_evaluator.py:
697-802 compute-vs-postprocess split, YOLOX MeterBuffer) with
jax.profiler traces + simple section timers that survive async dispatch.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict

import jax


@contextlib.contextmanager
def device_trace(logdir: str):
    """Capture a jax.profiler trace (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class SectionTimer:
    """Named wall-clock sections with correct device synchronization: call
    .sync(tree) with the section's outputs so async dispatch doesn't leak
    time into the next section."""

    def __init__(self):
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def section(self, name: str, sync_tree=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_tree is not None:
                jax.block_until_ready(sync_tree)
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1

    def summary(self) -> Dict[str, float]:
        return {k: {"total_s": v, "count": self.counts[k],
                    "mean_ms": 1e3 * v / max(self.counts[k], 1)}
                for k, v in self.totals.items()}
