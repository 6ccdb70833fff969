"""Cross-cutting utilities: profiling/tracing, device timing."""

from openintel_tpu.utils.profiling import (  # noqa: F401
    DeviceTimer,
    profile_trace,
    trace_annotation,
)
