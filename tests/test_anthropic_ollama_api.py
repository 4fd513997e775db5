"""Anthropic /v1/messages + Ollama API surfaces (reference analogs:
srt/entrypoints/anthropic/serving.py, srt/entrypoints/ollama/)."""

import asyncio
import json

import pytest

from tests.test_http_server import http_request, make_server


def test_anthropic_messages_roundtrip():
    server = make_server()

    async def scenario():
        await server.start()
        port = server.http.port

        # non-stream
        st, _, data = await http_request(
            port, "POST", "/v1/messages",
            {"model": "m", "max_tokens": 6,
             "system": "be brief",
             "messages": [{"role": "user", "content": "hi"}]})
        out = json.loads(data)
        assert st == 200
        assert out["type"] == "message" and out["role"] == "assistant"
        assert out["content"][0]["type"] == "text"
        assert out["stop_reason"] in ("end_turn", "max_tokens")
        assert out["usage"]["output_tokens"] == 6

        # content blocks in the request
        st, _, data = await http_request(
            port, "POST", "/v1/messages",
            {"model": "m", "max_tokens": 4,
             "messages": [{"role": "user", "content": [
                 {"type": "text", "text": "block one "},
                 {"type": "text", "text": "block two"}]}]})
        assert st == 200

        # count_tokens
        st, _, data = await http_request(
            port, "POST", "/v1/messages/count_tokens",
            {"model": "m",
             "messages": [{"role": "user", "content": "count me"}]})
        out = json.loads(data)
        assert st == 200 and out["input_tokens"] > 0

        # streaming event sequence
        st, _, data = await http_request(
            port, "POST", "/v1/messages",
            {"model": "m", "max_tokens": 5, "stream": True,
             "messages": [{"role": "user", "content": "stream please"}]})
        assert st == 200
        events = [l.split(" ", 1)[1] for l in data.decode().splitlines()
                  if l.startswith("event: ")]
        assert events[0] == "message_start"
        assert "content_block_start" in events
        assert "content_block_stop" in events
        assert events[-2:] == ["message_delta", "message_stop"]
        # stream events are well-formed JSON; any text deltas concatenate
        # (the tiny random model may sample only special tokens that
        # decode to "", so non-emptiness is not asserted)
        texts = [json.loads(l[6:]) for l in data.decode().splitlines()
                 if l.startswith("data: ")]
        assert any(e.get("type") == "content_block_start" for e in texts)
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))


def test_ollama_api_surface():
    server = make_server()

    async def scenario():
        await server.start()
        port = server.http.port

        st, _, data = await http_request(port, "GET", "/")
        assert st == 200 and b"Ollama is running" in data

        st, _, data = await http_request(port, "GET", "/api/tags")
        out = json.loads(data)
        assert st == 200 and out["models"][0]["name"]

        st, _, data = await http_request(
            port, "POST", "/api/show", {"model": "m"})
        out = json.loads(data)
        assert st == 200 and "model_info" in out

        # non-stream generate
        st, _, data = await http_request(
            port, "POST", "/api/generate",
            {"model": "m", "prompt": "hello", "stream": False,
             "options": {"num_predict": 5, "temperature": 0}})
        out = json.loads(data)
        assert st == 200 and out["done"] is True
        assert out["eval_count"] == 5 and isinstance(out["response"], str)

        # streaming generate: NDJSON lines ending with done=true
        st, hdrs, data = await http_request(
            port, "POST", "/api/generate",
            {"model": "m", "prompt": "hello stream",
             "options": {"num_predict": 4, "temperature": 0}})
        assert st == 200
        lines = [json.loads(l) for l in data.decode().splitlines() if l]
        assert lines[-1]["done"] is True
        assert all(not l["done"] for l in lines[:-1])
        assert lines[-1]["eval_count"] == 4

        # chat non-stream
        st, _, data = await http_request(
            port, "POST", "/api/chat",
            {"model": "m", "stream": False,
             "messages": [{"role": "user", "content": "chat hi"}],
             "options": {"num_predict": 4, "temperature": 0}})
        out = json.loads(data)
        assert st == 200 and out["message"]["role"] == "assistant"
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))
