"""Per-stage tracing / profiling.

The reference has no tracer (SURVEY.md §5.1 — only wall-clock prints);
this module provides the rebuild's observability: nested stage timers
with call counts, a global registry, and optional jax.profiler hook.

    from targetdiarization_tpu.runtime.trace import trace, report
    with trace("vad"):
        ...
    print(report())

TD_TRACE=1 makes the pipelines emit stage timings automatically.
"""

from __future__ import annotations

import os
import threading
import time
from collections import defaultdict
from contextlib import contextmanager

_LOCAL = threading.local()


class Tracer:
    def __init__(self):
        self.totals = defaultdict(float)
        self.counts = defaultdict(int)
        self._lock = threading.Lock()

    def add(self, name: str, dt: float):
        with self._lock:
            self.totals[name] += dt
            self.counts[name] += 1

    def reset(self):
        with self._lock:
            self.totals.clear()
            self.counts.clear()

    def report(self, sort: bool = True) -> str:
        rows = [
            (name, self.totals[name], self.counts[name])
            for name in self.totals
        ]
        if sort:
            rows.sort(key=lambda r: -r[1])
        lines = [f"{'stage':<32} {'total_s':>9} {'calls':>6} {'mean_ms':>9}"]
        for name, total, count in rows:
            lines.append(
                f"{name:<32} {total:>9.3f} {count:>6d} "
                f"{total / count * 1000:>9.2f}")
        return "\n".join(lines)

    def as_dict(self) -> dict:
        return {
            name: {"total_s": self.totals[name], "calls": self.counts[name]}
            for name in self.totals
        }


GLOBAL_TRACER = Tracer()


def _stack() -> list:
    if not hasattr(_LOCAL, "stack"):
        _LOCAL.stack = []
    return _LOCAL.stack


@contextmanager
def trace(name: str, tracer: Tracer | None = None):
    """Nested timing scope; names join with '/' when nested."""
    tracer = tracer or GLOBAL_TRACER
    stack = _stack()
    full = "/".join(stack + [name])
    stack.append(name)
    t0 = time.perf_counter()
    try:
        yield
    finally:
        stack.pop()
        tracer.add(full, time.perf_counter() - t0)


def report() -> str:
    return GLOBAL_TRACER.report()


def reset():
    GLOBAL_TRACER.reset()


def enabled() -> bool:
    return os.environ.get("TD_TRACE", "0") == "1"


@contextmanager
def device_profile(log_dir: str = "/tmp/jax-trace"):
    """jax.profiler trace scope (view with TensorBoard / xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
