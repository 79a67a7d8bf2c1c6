"""Runtime utilities: compilation cache, device helpers, profiling."""

from ocr_inference_tpu.utils.runtime import (  # noqa: F401
    cpu_devices,
    enable_compilation_cache,
    stage_timer,
    trace_profile,
)
