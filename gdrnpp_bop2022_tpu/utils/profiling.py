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


def enable_persistent_compilation_cache(cache_dir: str | None = None):
    """Point JAX's persistent compilation cache at a disk directory
    (GDRN_JAX_CACHE=<dir>) so repeated tool invocations (eval sweeps,
    scorer runs, serving restarts) skip XLA compiles. Every CLI tool calls
    this at startup; it is OPT-IN via the env var: on a real local TPU the
    cache removes the minutes of compile a cold scorer/eval run pays, but
    measured on this repo's remote-tunneled device the cache keys never
    matched across processes (backend fingerprint is session-specific —
    each process re-wrote identical kernels under new hashes) so
    default-on would be pure write overhead. Reference analogue: none
    (torch eager has no compile step to cache)."""
    import os
    if cache_dir is None:
        cache_dir = os.environ.get("GDRN_JAX_CACHE")
    if not cache_dir:
        return None
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # cache everything, however small/fast-to-compile
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:  # noqa: BLE001 - cache is an optimization only
        return None
    return cache_dir


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
