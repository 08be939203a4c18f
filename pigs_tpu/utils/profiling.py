"""Tracing/profiling utilities.

The reference's only instrumentation is wall-clock prints (SURVEY.md §5);
here the same capability plus structured timers and optional XLA profiler
traces viewable in TensorBoard/Perfetto.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax

__all__ = ["Timer", "trace"]


class Timer:
    """Accumulating wall-clock timer with device synchronization.

    >>> t = Timer()
    >>> with t("evolve"):
    ...     state = step(state)
    >>> t.totals()["evolve"]
    """

    def __init__(self):
        self._totals: Dict[str, float] = {}
        self._counts: Dict[str, int] = {}

    @contextlib.contextmanager
    def __call__(self, name: str, sync=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            dt = time.perf_counter() - start
            self._totals[name] = self._totals.get(name, 0.0) + dt
            self._counts[name] = self._counts.get(name, 0) + 1

    def totals(self) -> Dict[str, float]:
        return dict(self._totals)

    def means(self) -> Dict[str, float]:
        return {k: v / self._counts[k] for k, v in self._totals.items()}

    def report(self) -> str:
        return "  ".join(f"{k}: {v*1e3:.2f}ms (x{self._counts[k]})"
                         for k, v in sorted(self._totals.items()))


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """XLA profiler trace context; no-op when ``log_dir`` is None.

    View with TensorBoard's profile plugin or Perfetto.
    """
    if log_dir is None:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
