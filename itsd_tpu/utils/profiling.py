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


class trace_steps:
    """Trace the first ``n_steps`` iterations of a loop into ``log_dir``.

    Usage::

        profiler = trace_steps(cfg.train.profile_steps, trace_dir)
        for batch in data:
            with profiler.step():
                state, metrics = step_fn(state, batch, key)

    Starts the jax.profiler trace at the first step and stops it after
    ``n_steps`` (blocking on the last step's result so the device work is in
    the trace). ``n_steps=0`` makes every call a no-op.
    """

    def __init__(self, n_steps: int, log_dir: str):
        self.n_steps = n_steps
        self.log_dir = log_dir
        self._seen = 0
        self._active = False

    @contextlib.contextmanager
    def step(self) -> Iterator[None]:
        if self.n_steps <= 0 or self._seen >= self.n_steps:
            yield
            return
        import jax
        if not self._active:
            os.makedirs(self.log_dir, exist_ok=True)
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        try:
            with jax.profiler.TraceAnnotation(f"step_{self._seen}"):
                yield
        finally:
            self._seen += 1
            if self._seen >= self.n_steps:
                # drain pending device work so it lands inside the trace
                jax.effects_barrier()
                jax.profiler.stop_trace()
                self._active = False
