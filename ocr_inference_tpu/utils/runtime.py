"""Runtime helpers: compilation cache, device selection, profiling hooks."""

from __future__ import annotations

import contextlib
import os
import time
from pathlib import Path

_CACHE_ENABLED = False


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    """Turn on JAX's persistent compilation cache.

    First-compile latency on detached TPU frontends is tens of seconds per
    program; the cache brings warm-start runs (CLI invocations, benchmarks,
    driver checks) down to milliseconds. Idempotent.
    """
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "OCR_TPU_COMPILE_CACHE", str(Path.home() / ".cache" / "ocr_tpu_xla")
    )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    _CACHE_ENABLED = True


def cpu_devices():
    """The (possibly virtual) CPU device list, independent of the default
    backend — used by tests and the multi-chip dry run."""
    import jax

    return jax.local_devices(backend="cpu")


@contextlib.contextmanager
def stage_timer(record: dict, key: str):
    """Accumulate wall-clock stage timings into a dict (ms)."""
    start = time.perf_counter()
    try:
        yield
    finally:
        record[key] = record.get(key, 0.0) + (time.perf_counter() - start) * 1000


def trace_profile(log_dir: str):
    """jax.profiler trace context for perf work (SURVEY §5.1)."""
    import jax

    return jax.profiler.trace(log_dir)
