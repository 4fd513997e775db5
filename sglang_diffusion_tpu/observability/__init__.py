from sglang_diffusion_tpu.observability.trace import (  # noqa: F401
    get_recent_traces,
    init_tracing,
    record_request_trace,
    step_span,
    tracing_enabled,
)
