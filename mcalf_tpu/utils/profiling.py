"""Profiling and tracing hooks (a first-class metrics module; the reference
only prints wall-clock deltas around solver runs, SURVEY.md section 5.1).

* :func:`phase_timer` -- context manager recording named phase durations in a
  process-global registry (queryable via :func:`get_timings`).
* :func:`trace` -- context manager wrapping ``jax.profiler.trace`` when a
  trace directory is configured (MCALF_TPU_TRACE_DIR env var or argument),
  producing TensorBoard-compatible device traces; no-op otherwise.
"""

from __future__ import annotations

import contextlib
import os
import time
from collections import defaultdict
from typing import Dict, List

_TIMINGS: Dict[str, List[float]] = defaultdict(list)


@contextlib.contextmanager
def phase_timer(name: str):
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _TIMINGS[name].append(time.perf_counter() - t0)


def get_timings() -> Dict[str, List[float]]:
    return {k: list(v) for k, v in _TIMINGS.items()}


def reset_timings() -> None:
    _TIMINGS.clear()


@contextlib.contextmanager
def trace(trace_dir: str | None = None):
    """Wrap a block in a jax.profiler trace if a directory is given (or the
    MCALF_TPU_TRACE_DIR environment variable is set)."""
    trace_dir = trace_dir or os.environ.get("MCALF_TPU_TRACE_DIR")
    if not trace_dir:
        yield
        return
    import jax

    with jax.profiler.trace(trace_dir):
        yield
