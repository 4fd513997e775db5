"""OTel request tracing (reference analog: srt/observability/trace.py
--enable-trace spans)."""

import asyncio
import json

import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def test_request_and_step_spans_recorded():
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
        enable_trace=True,
    )
    eng = Engine(server_args=args, model_config=ModelConfig.tiny_llama(),
                 tokenizer=ByteTokenizer())
    out = eng.generate("trace me", SamplingParams(temperature=0.0,
                                                  max_new_tokens=4))
    assert len(out["output_ids"]) == 4

    from sglang_diffusion_tpu.observability import get_recent_traces

    spans = get_recent_traces()
    names = [s["name"] for s in spans]
    assert "request" in names
    assert any(n.startswith("step/prefill") for n in names)
    assert any(n.startswith("step/decode") for n in names)
    req_span = [s for s in spans if s["name"] == "request"][-1]
    assert req_span["attributes"]["output_tokens"] == 4
    assert req_span["attributes"]["prompt_tokens"] == len("trace me") + 1
    assert any(e["name"] == "first_token" for e in req_span["events"])
    assert req_span["end_ns"] >= req_span["start_ns"]


def test_traces_route():
    from sglang_diffusion_tpu.server.api_server import ApiServer
    from tests.test_http_server import http_request

    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
        host="127.0.0.1", port=0, enable_trace=True,
        max_new_tokens_default=4,
    )
    eng = Engine(server_args=args, model_config=ModelConfig.tiny_llama(),
                 tokenizer=ByteTokenizer())
    server = ApiServer(eng, args)

    async def scenario():
        await server.start()
        port = server.http.port
        st, _, _ = await http_request(
            port, "POST", "/generate",
            {"text": "hi", "sampling_params": {"max_new_tokens": 3,
                                               "temperature": 0.0}},
        )
        assert st == 200
        st, _, data = await http_request(port, "GET", "/v1/traces?limit=50")
        assert st == 200
        traces = json.loads(data)["traces"]
        assert any(t["name"] == "request" for t in traces)
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))


def test_tracing_off_is_noop():
    from sglang_diffusion_tpu.observability.trace import step_span

    with step_span("decode", 4):
        pass  # must not raise even when tracing was never initialized


def test_latency_histograms_on_metrics():
    """TTFT/TPOT/E2E histograms (reference: tokenizer-side collectors,
    metrics_collector.py:1019+)."""
    from sglang_diffusion_tpu.server.api_server import ApiServer
    from tests.test_http_server import http_request, make_server

    server = make_server()

    async def scenario():
        await server.start()
        port = server.http.port
        await http_request(
            port, "POST", "/generate",
            {"text": "histo", "sampling_params": {"max_new_tokens": 4,
                                                  "temperature": 0.0}},
        )
        st, _, data = await http_request(port, "GET", "/metrics")
        assert st == 200
        text = data.decode()
        assert "sgld_ttft_seconds_bucket" in text
        assert "sgld_e2e_seconds_count 1" in text
        assert "sgld_tpot_seconds_sum" in text
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))
