"""Streaming incremental tool-call parsing (reference analog:
srt/function_call/base_format_detector.py:119 parse_streaming_increment).

Every test feeds the model output in adversarially small chunks (1-3
chars) and asserts: the name arrives in the first delta for the call,
argument increments concatenate to the exact JSON, and normal text
around calls streams through untouched."""

import json

import pytest

from sglang_diffusion_tpu.function_call.streaming import (
    SPECS,
    StreamingToolParser,
)

TOOLS = [
    {"function": {"name": "get_weather",
                  "parameters": {"type": "object"}}},
    {"function": {"name": "search", "parameters": {"type": "object"}}},
]


def drive(fmt, text, chunk=3, tools=TOOLS):
    p = StreamingToolParser(fmt, tools)
    normal = []
    deltas = []
    for i in range(0, len(text), chunk):
        n, d = p.feed(text[i:i + chunk])
        normal.append(n)
        deltas.extend(d)
    n, d = p.flush()
    normal.append(n)
    deltas.extend(d)
    return "".join(normal), deltas, p


def calls_of(deltas):
    """Reassemble OpenAI streaming deltas into full calls."""
    calls = {}
    order = []
    for d in deltas:
        i = d["index"]
        if i not in calls:
            calls[i] = {"name": None, "arguments": ""}
            order.append(i)
        fn = d.get("function", {})
        if fn.get("name"):
            calls[i]["name"] = fn["name"]
        calls[i]["arguments"] += fn.get("arguments", "")
    return [calls[i] for i in order]


@pytest.mark.parametrize("chunk", [1, 2, 7])
def test_hermes_streaming(chunk):
    text = ('Sure, checking.<tool_call>{"name": "get_weather", '
            '"arguments": {"city": "Par\\"is", "days": 3}}</tool_call>'
            " done")
    normal, deltas, p = drive("hermes", text, chunk)
    assert normal == "Sure, checking. done"
    calls = calls_of(deltas)
    assert len(calls) == 1
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": 'Par"is', "days": 3}
    assert p.any_calls
    # name arrives before the arguments finish
    first = deltas[0]
    assert first["function"]["name"] == "get_weather"
    assert first["id"].startswith("call_")
    # arguments streamed over multiple increments for small chunks
    if chunk == 1:
        arg_deltas = [d for d in deltas if "name" not in d.get("function", {})]
        assert len(arg_deltas) > 3


def test_hermes_parallel_calls():
    text = ('<tool_call>{"name": "get_weather", "arguments": {"c": 1}}'
            '</tool_call>\n<tool_call>{"name": "search", '
            '"arguments": {"q": "x"}}</tool_call>')
    normal, deltas, _ = drive("hermes", text, 2)
    calls = calls_of(deltas)
    assert [c["name"] for c in calls] == ["get_weather", "search"]
    assert json.loads(calls[0]["arguments"]) == {"c": 1}
    assert json.loads(calls[1]["arguments"]) == {"q": "x"}
    assert [d["index"] for d in deltas if "name" in d.get("function", {})
            and d["function"]["name"]] == [0, 1]


def test_unknown_name_rejected():
    text = '<tool_call>{"name": "evil", "arguments": {}}</tool_call>hello'
    normal, deltas, p = drive("hermes", text, 3)
    assert deltas == []
    assert not p.any_calls
    assert "hello" in normal


def test_llama3_python_tag():
    text = ('I will check.<|python_tag|>{"name": "search", '
            '"parameters": {"q": "tpu"}}')
    normal, deltas, _ = drive("llama3", text, 2)
    assert normal == "I will check."
    calls = calls_of(deltas)
    assert calls[0]["name"] == "search"
    assert json.loads(calls[0]["arguments"]) == {"q": "tpu"}


def test_kimi_k2_streaming():
    text = ("<|tool_calls_section_begin|><|tool_call_begin|>"
            "functions.get_weather:0<|tool_call_argument_begin|>"
            '{"city": "Tokyo"}<|tool_call_end|>'
            "<|tool_calls_section_end|>")
    normal, deltas, _ = drive("kimi_k2", text, 3)
    assert normal == ""
    calls = calls_of(deltas)
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Tokyo"}


def test_qwen3_coder_streaming():
    text = ("<tool_call><function=search>"
            "<parameter=q>weather in SF</parameter>"
            "<parameter=limit>5</parameter>"
            "</function></tool_call>")
    normal, deltas, _ = drive("qwen3_coder", text, 4)
    calls = calls_of(deltas)
    assert calls[0]["name"] == "search"
    assert json.loads(calls[0]["arguments"]) == {
        "q": "weather in SF", "limit": 5}
    # name was streamed before the closing tag arrived
    name_at = next(i for i, d in enumerate(deltas)
                   if d.get("function", {}).get("name"))
    assert name_at == 0


def test_partial_marker_holdback():
    """A chunk ending mid-marker must not leak marker chars as content."""
    p = StreamingToolParser("hermes", TOOLS)
    n1, d1 = p.feed("hello <tool")
    assert n1 == "hello "
    n2, d2 = p.feed('_call>{"name": "search", "arguments": {}}</tool_call>')
    assert n2 == ""
    calls = calls_of(d1 + d2)
    assert calls and calls[0]["name"] == "search"


def test_truncated_call_flush():
    """max_tokens cut mid-arguments: flush keeps what was streamed."""
    text = '<tool_call>{"name": "search", "arguments": {"q": "unfini'
    normal, deltas, p = drive("hermes", text, 5)
    calls = calls_of(deltas)
    assert calls[0]["name"] == "search"
    assert calls[0]["arguments"].startswith('{"q": "unfini')


def test_specs_cover_promised_families():
    for fmt in ("hermes", "qwen25", "llama3", "kimi_k2", "qwen3_coder",
                "json"):
        assert fmt in SPECS


def test_chat_stream_tool_deltas():
    """SSE-level: /v1/chat/completions streams tool_calls deltas."""
    import asyncio

    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.server.api_server import ApiServer
    from sglang_diffusion_tpu.server.httpd import Request

    args = ServerArgs(model_path="", tokenizer_path="byte", port=0,
                      tool_call_parser="hermes")
    cfg = ModelConfig.tiny_llama()
    eng = Engine(server_args=args, model_config=cfg,
                 tokenizer=ByteTokenizer())
    server = ApiServer(eng, args)

    # scripted delta stream so the SSE path is deterministic
    script = ['I will call.<tool_call>{"na', 'me": "get_weather", "argu',
              'ments": {"city": "SF"}}</tool_call>']

    class FakeQ:
        def __init__(self):
            self.items = [
                {"type": "delta", "text": s} for s in script
            ] + [{"type": "done", "output": {
                "text": "".join(script),
                "meta_info": {"finish_reason": "stop", "prompt_tokens": 1,
                              "completion_tokens": 1},
            }}]

        async def get(self):
            return self.items.pop(0)

    server.eloop.submit = lambda r: FakeQ()

    req = Request(
        "POST", "/v1/chat/completions", {}, {},
        json.dumps({
            "messages": [{"role": "user", "content": "weather in SF?"}],
            "stream": True,
            "tools": [{"type": "function",
                       "function": {"name": "get_weather",
                                    "parameters": {"type": "object"}}}],
        }).encode(),
    )

    async def scenario():
        handler = server.http.routes[("POST", "/v1/chat/completions")]
        resp = await handler(req)
        chunks = []
        async for piece in resp.stream:
            for line in piece.decode().splitlines():
                if line.startswith("data: ") and line != "data: [DONE]":
                    chunks.append(json.loads(line[6:]))
        return chunks

    chunks = asyncio.run(asyncio.wait_for(scenario(), timeout=300))
    deltas = [c["choices"][0]["delta"] for c in chunks]
    tool_deltas = [td for d in deltas for td in d.get("tool_calls", [])]
    calls = calls_of(tool_deltas)
    assert calls and calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "SF"}
    content = "".join(d.get("content", "") for d in deltas)
    assert "I will call." in content
    assert chunks[-1]["choices"][0]["finish_reason"] == "tool_calls"


@pytest.mark.parametrize("chunk", [1, 3])
def test_mistral_streaming(chunk):
    text = ('Let me check.[TOOL_CALLS] [{"name": "get_weather", '
            '"arguments": {"city": "Paris"}}, {"name": "search", '
            '"arguments": {"q": "x"}}]')
    normal, deltas, p = drive("mistral", text, chunk)
    assert normal.strip() == "Let me check."
    calls = calls_of(deltas)
    assert [c["name"] for c in calls] == ["get_weather", "search"]
    assert json.loads(calls[0]["arguments"]) == {"city": "Paris"}
    assert json.loads(calls[1]["arguments"]) == {"q": "x"}


@pytest.mark.parametrize("chunk", [1, 4])
def test_deepseek_streaming(chunk):
    text = ("ok<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
            "<｜tool▁sep｜>get_weather\n```json\n"
            '{"city": "Tokyo", "days": 2}\n```<｜tool▁call▁end｜>'
            "<｜tool▁calls▁end｜>")
    normal, deltas, p = drive("deepseek", text, chunk)
    calls = calls_of(deltas)
    assert len(calls) == 1
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Tokyo", "days": 2}
    assert normal.strip() == "ok"
    # name delta precedes the argument increments
    assert deltas[0]["function"]["name"] == "get_weather"
    if chunk == 1:
        args_deltas = [d for d in deltas
                       if "name" not in d.get("function", {})]
        assert len(args_deltas) > 3


@pytest.mark.parametrize("chunk", [2, 5])
def test_glm4_moe_streaming(chunk):
    text = ("<tool_call>get_weather\n<arg_key>city</arg_key>\n"
            "<arg_value>Beijing</arg_value>\n<arg_key>days</arg_key>\n"
            "<arg_value>3</arg_value>\n</tool_call>")
    normal, deltas, p = drive("glm4_moe", text, chunk)
    calls = calls_of(deltas)
    assert len(calls) == 1
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Beijing",
                                                 "days": 3}
    assert deltas[0]["function"]["name"] == "get_weather"


@pytest.mark.parametrize("chunk", [1, 6])
def test_gpt_oss_streaming(chunk):
    text = ("<|channel|>commentary to=functions.search <|constrain|>json"
            '<|message|>{"q": "tpu kernels"}<|call|>')
    normal, deltas, p = drive("gpt_oss", text, chunk)
    calls = calls_of(deltas)
    assert len(calls) == 1
    assert calls[0]["name"] == "search"
    assert json.loads(calls[0]["arguments"]) == {"q": "tpu kernels"}


@pytest.mark.parametrize("chunk", [3])
def test_step3_streaming(chunk):
    text = ("<｜tool_calls_begin｜>"
            '<steptml:invoke name="get_weather">'
            '<steptml:parameter name="city">Oslo</steptml:parameter>'
            '<steptml:parameter name="days">7</steptml:parameter>'
            "</steptml:invoke><｜tool_calls_end｜>")
    normal, deltas, p = drive("step3", text, chunk)
    calls = calls_of(deltas)
    assert len(calls) == 1
    assert calls[0]["name"] == "get_weather"
    assert json.loads(calls[0]["arguments"]) == {"city": "Oslo", "days": 7}


def test_deepseek_parallel_streaming():
    text = ("<｜tool▁calls▁begin｜>"
            "<｜tool▁call▁begin｜>function<｜tool▁sep｜>get_weather\n"
            '{"city": "A"}<｜tool▁call▁end｜>'
            "<｜tool▁call▁begin｜>function<｜tool▁sep｜>search\n"
            '{"q": "b"}<｜tool▁call▁end｜><｜tool▁calls▁end｜>')
    normal, deltas, p = drive("deepseek", text, 2)
    calls = calls_of(deltas)
    assert [c["name"] for c in calls] == ["get_weather", "search"]
    assert {d["index"] for d in deltas} == {0, 1}
