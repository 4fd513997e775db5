"""Prometheus-format latency histograms.

Reference analog: the tokenizer-side TTFT/ITL/E2E histograms in
srt/observability/metrics_collector.py:1019+ (prometheus_client
multiprocess collectors). Self-contained here (no prometheus_client
dependency): fixed exponential buckets, text exposition format.
"""

from __future__ import annotations

import threading
from typing import Dict, List, Sequence


DEFAULT_BUCKETS = (
    0.001, 0.005, 0.01, 0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0,
    10.0, 30.0, 60.0,
)


class Histogram:
    def __init__(self, name: str, help_: str,
                 buckets: Sequence[float] = DEFAULT_BUCKETS):
        self.name = name
        self.help = help_
        self.buckets = tuple(buckets)
        self.counts = [0] * (len(self.buckets) + 1)
        self.total = 0.0
        self.n = 0
        self._lock = threading.Lock()

    def observe(self, value: float) -> None:
        with self._lock:
            self.n += 1
            self.total += value
            for i, b in enumerate(self.buckets):
                if value <= b:
                    self.counts[i] += 1
                    return
            self.counts[-1] += 1

    def expose(self) -> List[str]:
        lines = [
            f"# HELP {self.name} {self.help}",
            f"# TYPE {self.name} histogram",
        ]
        cum = 0
        with self._lock:
            for b, c in zip(self.buckets, self.counts):
                cum += c
                lines.append(f'{self.name}_bucket{{le="{b}"}} {cum}')
            cum += self.counts[-1]
            lines.append(f'{self.name}_bucket{{le="+Inf"}} {cum}')
            lines.append(f"{self.name}_sum {self.total:.6f}")
            lines.append(f"{self.name}_count {self.n}")
        return lines


class LatencyMetrics:
    """TTFT / per-output-token latency / E2E, fed from finished requests."""

    def __init__(self):
        self.ttft = Histogram("sgld_ttft_seconds", "time to first token")
        self.tpot = Histogram("sgld_tpot_seconds",
                              "time per output token (post-first)")
        self.e2e = Histogram("sgld_e2e_seconds", "request end-to-end latency")

    def observe_request(self, req) -> None:
        if req.first_token_at is not None:
            self.ttft.observe(req.first_token_at - req.created_at)
        if (req.finished_at is not None and req.first_token_at is not None
                and len(req.output_ids) > 1):
            self.tpot.observe(
                (req.finished_at - req.first_token_at)
                / (len(req.output_ids) - 1)
            )
        if req.finished_at is not None:
            self.e2e.observe(req.finished_at - req.created_at)

    def expose(self) -> List[str]:
        return self.ttft.expose() + self.tpot.expose() + self.e2e.expose()
