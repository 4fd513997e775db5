"""HTTP API server tests: in-process asyncio server + raw-socket client
(analog of the reference's popen_launch_server fixture, but in-process to
avoid paying jit compile cost per test, SURVEY.md §4)."""

import asyncio
import json

import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.server.api_server import ApiServer


def make_server():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        chunked_prefill_size=64,
        max_prefill_tokens=128,
        attention_backend="xla",
        context_length=512,
        host="127.0.0.1",
        port=0,
        max_new_tokens_default=8,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    return ApiServer(eng, args)


async def http_request(port, method, path, body=None):
    reader, writer = await asyncio.open_connection("127.0.0.1", port)
    payload = json.dumps(body).encode() if body is not None else b""
    req = (
        f"{method} {path} HTTP/1.1\r\nHost: localhost\r\n"
        f"Content-Length: {len(payload)}\r\nContent-Type: application/json\r\n\r\n"
    ).encode() + payload
    writer.write(req)
    await writer.drain()
    status_line = await reader.readline()
    status = int(status_line.split()[1])
    headers = {}
    while True:
        line = await reader.readline()
        if line in (b"\r\n", b"\n", b""):
            break
        k, v = line.decode().split(":", 1)
        headers[k.strip().lower()] = v.strip()
    if headers.get("transfer-encoding") == "chunked":
        chunks = []
        while True:
            size_line = await reader.readline()
            size = int(size_line.strip(), 16)
            if size == 0:
                await reader.readline()
                break
            chunks.append(await reader.readexactly(size))
            await reader.readexactly(2)
        data = b"".join(chunks)
    else:
        data = await reader.readexactly(int(headers.get("content-length", 0)))
    writer.close()
    return status, headers, data


async def _scenario(server):
    await server.start()
    port = server.http.port

    # health + info
    st, _, data = await http_request(port, "GET", "/health")
    assert st == 200 and json.loads(data)["status"] == "ok"
    st, _, data = await http_request(port, "GET", "/v1/models")
    assert st == 200 and json.loads(data)["data"][0]["object"] == "model"
    st, _, data = await http_request(port, "GET", "/get_server_info")
    assert st == 200 and "num_pages" in json.loads(data)

    # native generate
    st, _, data = await http_request(
        port,
        "POST",
        "/generate",
        {"text": "hello", "sampling_params": {"max_new_tokens": 5, "temperature": 0.0}},
    )
    out = json.loads(data)
    assert st == 200 and len(out["output_ids"]) == 5

    # openai completions
    st, _, data = await http_request(
        port,
        "POST",
        "/v1/completions",
        {"model": "default", "prompt": "abc", "max_tokens": 4, "temperature": 0},
    )
    out = json.loads(data)
    assert st == 200 and out["object"] == "text_completion"
    assert out["usage"]["completion_tokens"] == 4

    # openai chat (non-stream)
    st, _, data = await http_request(
        port,
        "POST",
        "/v1/chat/completions",
        {
            "model": "default",
            "messages": [{"role": "user", "content": "hi"}],
            "max_tokens": 4,
            "temperature": 0,
        },
    )
    out = json.loads(data)
    assert st == 200 and out["choices"][0]["message"]["role"] == "assistant"

    # streaming chat: SSE chunks terminated by [DONE]
    st, headers, data = await http_request(
        port,
        "POST",
        "/v1/chat/completions",
        {
            "model": "default",
            "messages": [{"role": "user", "content": "stream please"}],
            "max_tokens": 6,
            "temperature": 0,
            "stream": True,
        },
    )
    assert st == 200
    assert headers.get("content-type", "").startswith("text/event-stream")
    events = [l for l in data.decode().split("\n\n") if l.startswith("data: ")]
    assert events[-1] == "data: [DONE]"
    payloads = [json.loads(e[6:]) for e in events[:-1]]
    assert payloads[-1]["choices"][0]["finish_reason"] in ("length", "stop")

    # health_generate actually decodes
    st, _, data = await http_request(port, "GET", "/health_generate")
    assert st == 200 and json.loads(data)["status"] == "ok"

    # metrics
    st, _, data = await http_request(port, "GET", "/metrics")
    assert st == 200 and b"sgld_num_finished_total" in data

    # 404
    st, _, _ = await http_request(port, "GET", "/nope")
    assert st == 404

    await server.stop()


def test_http_api_roundtrip():
    server = make_server()
    asyncio.run(asyncio.wait_for(_scenario(server), timeout=300))


def test_score_route():
    server = make_server()

    async def scenario():
        await server.start()
        port = server.http.port
        st, _, data = await http_request(
            port, "POST", "/v1/score",
            {"prompt": "The answer is ", "choices": ["yes", "no"]},
        )
        assert st == 200
        out = json.loads(data)
        assert len(out["scores"]) == 2
        assert out["scores"][0] != out["scores"][1]
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))


def test_score_label_tokens():
    """Reference /v1/score form: probability of label_token_ids as the
    next token after query+item (serving_score.py). Cross-checked against
    the choice-scoring path: a 1-token continuation's probability must
    match exp(score_choices logprob)."""
    import math

    server = make_server()

    async def scenario():
        await server.start()
        port = server.http.port
        # softmax over the label set sums to 1 per item
        st, _, data = await http_request(
            port, "POST", "/v1/score",
            {"query": "the answer is ", "items": ["yes", "no"],
             "label_token_ids": [65, 66, 67], "apply_softmax": True},
        )
        assert st == 200
        out = json.loads(data)
        assert len(out["scores"]) == 2
        for row in out["scores"]:
            assert abs(sum(row) - 1.0) < 1e-5
        assert out["usage"]["prompt_tokens"] > 0

        # consistency with the teacher-forcing choice scorer
        st, _, data = await http_request(
            port, "POST", "/v1/score",
            {"query": "hello", "items": [[]],
             "label_token_ids": [104]},  # 'h'
        )
        lab_prob = json.loads(data)["scores"][0][0]
        st, _, data = await http_request(
            port, "POST", "/v1/score",
            {"prompt": "hello", "choices": ["h"]},
        )
        choice_lp = json.loads(data)["scores"][0]
        assert abs(lab_prob - math.exp(choice_lp)) < 1e-4

        # item_first flips the concatenation order -> different scores
        st, _, data = await http_request(
            port, "POST", "/v1/score",
            {"query": "AB", "items": ["CD"], "label_token_ids": [65],
             "item_first": True},
        )
        flipped = json.loads(data)["scores"][0][0]
        st, _, data = await http_request(
            port, "POST", "/v1/score",
            {"query": "AB", "items": ["CD"], "label_token_ids": [65]},
        )
        straight = json.loads(data)["scores"][0][0]
        assert flipped != straight
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))
