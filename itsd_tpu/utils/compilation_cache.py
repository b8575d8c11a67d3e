"""Persistent XLA compilation cache.

The reference pays nothing for compilation (eager torch); our whole-program
jit approach pays once per (shape, program) — 300+ s for the T=1000 sampler
on the TPU relay — and without a persistent cache *every fresh process* pays
it again. Enabling JAX's disk cache turns every warm process start into a
cache hit (sub-second deserialisation instead of minutes of XLA work).

Opt-out with ITSD_NO_COMPILATION_CACHE=1; relocate with ITSD_CACHE_DIR.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at a disk directory.

    Called by every process-level entry point (CLI, bench, experiments).
    Idempotent; returns the cache dir, or None when disabled.
    """
    if os.environ.get("ITSD_NO_COMPILATION_CACHE") == "1":
        return None
    if path is None:
        path = os.environ.get("ITSD_CACHE_DIR") or os.path.join(
            os.path.expanduser("~"), ".cache", "itsd_tpu", "xla_cache")
    os.makedirs(path, exist_ok=True)
    import jax

    jax.config.update("jax_compilation_cache_dir", path)
    # Cache everything: the default 1 s floor would skip the many small
    # helper programs (metric extractors, grid savers) whose compiles still
    # add up to tens of seconds of process startup.
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    return path
