"""Throughput metering and profiler hooks.

The reference has no profiling at all (SURVEY.md §5) — only periodic log
lines.  frames/sec/chip is this rebuild's primary metric (BASELINE.md), so
a throughput meter is built in, and ``maybe_trace`` wraps a region in a
``jax.profiler`` trace when a directory is given.
"""

from __future__ import annotations

import contextlib
import time


class ThroughputMeter:
    """Tracks items/sec over a run, with warmup exclusion.

    ``warmup_items`` items are excluded from the steady-state rate so the
    first jit compile doesn't poison the measurement.
    """

    def __init__(self, warmup_items: int = 0):
        self.warmup_items = warmup_items
        self.total_items = 0
        self._t0 = None
        self._steady_t0 = None
        self._steady_items = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def update(self, n: int) -> None:
        if self._t0 is None:
            self.start()
        self.total_items += n
        if self._steady_t0 is None and self.total_items >= self.warmup_items:
            self._steady_t0 = time.perf_counter()
            self._steady_items = self.total_items

    @property
    def elapsed(self) -> float:
        return 0.0 if self._t0 is None else time.perf_counter() - self._t0

    @property
    def rate(self) -> float:
        """Overall items/sec including warmup."""
        e = self.elapsed
        return self.total_items / e if e > 0 else 0.0

    @property
    def steady_rate(self) -> float:
        """Items/sec excluding the warmup window."""
        if self._steady_t0 is None:
            return self.rate
        e = time.perf_counter() - self._steady_t0
        n = self.total_items - self._steady_items
        return n / e if e > 0 else 0.0


@contextlib.contextmanager
def maybe_trace(trace_dir: str | None):
    """Wrap a region in ``jax.profiler.trace`` when ``trace_dir`` is set.

    Profiler startup failures (e.g. backends without profiling support)
    degrade to a warning — tracing must never take down a production run.
    """
    if not trace_dir:
        yield
        return
    import logging

    import jax

    try:
        ctx = jax.profiler.trace(trace_dir)
        ctx.__enter__()
    except Exception as e:  # pragma: no cover - backend dependent
        logging.getLogger(__name__).warning("profiler unavailable: %s", e)
        yield
        return
    try:
        yield
    finally:
        ctx.__exit__(None, None, None)
