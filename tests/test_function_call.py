"""Function/tool-call parsing tests (reference analog: srt/function_call)."""

import asyncio
import json

from sglang_diffusion_tpu.function_call import FunctionCallParser, tools_system_prompt

TOOLS = [
    {
        "type": "function",
        "function": {
            "name": "get_weather",
            "description": "Get weather",
            "parameters": {
                "type": "object",
                "properties": {"city": {"type": "string"}},
            },
        },
    }
]


def test_tools_prompt_mentions_tool():
    p = tools_system_prompt(TOOLS)
    assert "get_weather" in p and "arguments" in p


def test_parse_plain_json_call():
    p = FunctionCallParser(TOOLS)
    text = '{"name": "get_weather", "arguments": {"city": "Paris"}}'
    normal, calls = p.parse(text)
    assert normal is None
    assert len(calls) == 1
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}


def test_parse_embedded_json_call():
    p = FunctionCallParser(TOOLS)
    text = 'Sure, let me check. {"name": "get_weather", "arguments": {"city": "Oslo"}} done'
    _, calls = p.parse(text)
    assert len(calls) == 1
    assert json.loads(calls[0]["function"]["arguments"])["city"] == "Oslo"


def test_parse_rejects_unknown_tool_and_plain_text():
    p = FunctionCallParser(TOOLS)
    normal, calls = p.parse('{"name": "rm_rf", "arguments": {}}')
    assert calls == [] and normal is not None
    normal, calls = p.parse("just a plain answer")
    assert calls == [] and normal == "just a plain answer"


def test_parse_handles_nested_and_strings_with_braces():
    p = FunctionCallParser(TOOLS)
    text = '{"name": "get_weather", "arguments": {"city": "a{b}c", "o": {"k": 1}}}'
    _, calls = p.parse(text)
    assert len(calls) == 1
    args = json.loads(calls[0]["function"]["arguments"])
    assert args["city"] == "a{b}c" and args["o"] == {"k": 1}


def test_chat_completions_with_tools_route():
    from tests.test_http_server import http_request, make_server

    server = make_server()

    async def scenario():
        await server.start()
        port = server.http.port
        st, _, data = await http_request(
            port,
            "POST",
            "/v1/chat/completions",
            {
                "model": "default",
                "messages": [{"role": "user", "content": "weather in Paris?"}],
                "tools": TOOLS,
                "tool_choice": "required",
                "max_tokens": 30,
                "temperature": 0,
            },
        )
        assert st == 200, data
        out = json.loads(data)
        choice = out["choices"][0]
        # constrained JSON output: either a parsed tool call or JSON content
        if choice["finish_reason"] == "tool_calls":
            assert choice["message"]["tool_calls"]
        else:
            # random tiny model: still must be (possibly truncated) JSON-ish
            assert choice["finish_reason"] in ("stop", "length")
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))
