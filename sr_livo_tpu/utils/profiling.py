"""Per-stage timing + JAX profiler integration.

The reference has no tracing/profiling (SURVEY §5); here every pipeline
stage can be timed (`StageTimers`) and full XLA traces captured with
`trace_if_enabled` (set LIVO_TRACE_DIR to a directory to enable
TensorBoard-compatible traces).
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict

import jax


class StageTimers:
    """Accumulates wall-clock per named stage; thread-unsafe by design
    (one per pipeline)."""

    def __init__(self, sync: bool = False):
        self.sync = sync          # block_until_ready before stopping clocks
        self.total: Dict[str, float] = defaultdict(float)
        self.count: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if self.sync and result is not None:
                jax.block_until_ready(result)
            self.total[name] += time.perf_counter() - t0
            self.count[name] += 1

    def time_stage(self, name: str, fn, *args, **kwargs):
        t0 = time.perf_counter()
        out = fn(*args, **kwargs)
        if self.sync:
            jax.block_until_ready(out)
        self.total[name] += time.perf_counter() - t0
        self.count[name] += 1
        return out

    def report(self) -> Dict[str, Dict[str, float]]:
        return {
            name: {
                "total_s": self.total[name],
                "count": self.count[name],
                "mean_ms": 1000.0 * self.total[name] / max(self.count[name], 1),
            }
            for name in sorted(self.total)
        }

    def summary(self) -> str:
        lines = ["stage                    count   mean ms   total s"]
        for name, r in self.report().items():
            lines.append(f"{name:<24} {r['count']:>5} {r['mean_ms']:>9.2f} "
                         f"{r['total_s']:>9.2f}")
        return "\n".join(lines)


@contextlib.contextmanager
def trace_if_enabled(tag: str = "livo", env_var: str = "LIVO_TRACE_DIR"):
    """Wrap a region in a jax.profiler trace when env_var points somewhere."""
    trace_dir = os.environ.get(env_var)
    if not trace_dir:
        yield
        return
    path = os.path.join(trace_dir, tag)
    os.makedirs(path, exist_ok=True)
    with jax.profiler.trace(path):
        yield
