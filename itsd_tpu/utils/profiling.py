"""Profiling — jax.profiler traces + simple phase timing (the reference has
no tracing at all; only epoch wall-clock, `Train.py:684,805` — SURVEY §5)."""

from __future__ import annotations

import contextlib
import os
from typing import Iterator, Optional


@contextlib.contextmanager
def trace(log_dir: Optional[str] = None) -> Iterator[None]:
    """Capture a jax.profiler trace (viewable in TensorBoard/XProf / Perfetto)
    when `log_dir` (or $ITSD_TRACE_DIR) is set; no-op otherwise."""
    log_dir = log_dir or os.environ.get("ITSD_TRACE_DIR")
    if not log_dir:
        yield
        return
    import jax
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def annotate(name: str) -> Iterator[None]:
    """Named region in the profiler timeline."""
    import jax
    with jax.profiler.TraceAnnotation(name):
        yield
