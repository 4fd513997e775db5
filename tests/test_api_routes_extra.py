"""Extra OpenAI-compatible routes: /v1/rerank, /v1/responses,
/tokenize, /detokenize (reference analog: srt/entrypoints/openai/
serving_rerank.py, serving_responses.py, serving_tokenize.py)."""

import asyncio
import json

from tests.test_http_server import http_request, make_server


async def _scenario(server):
    await server.start()
    port = server.http.port

    # rerank
    st, _, data = await http_request(
        port, "POST", "/v1/rerank",
        {"query": "fruit", "documents": ["apple pie", "racing car",
                                         "banana split"], "top_n": 2},
    )
    out = json.loads(data)
    assert st == 200
    assert len(out["results"]) == 2
    assert {"index", "relevance_score", "document"} <= set(out["results"][0])
    scores = [r["relevance_score"] for r in out["results"]]
    assert scores == sorted(scores, reverse=True)

    # responses: plain string input
    st, _, data = await http_request(
        port, "POST", "/v1/responses",
        {"input": "say hi", "max_output_tokens": 4, "temperature": 0},
    )
    out = json.loads(data)
    assert st == 200 and out["object"] == "response"
    assert out["status"] == "completed"
    assert out["output"][0]["content"][0]["type"] == "output_text"
    assert out["usage"]["output_tokens"] == 4

    # responses: message-list input + instructions
    st, _, data = await http_request(
        port, "POST", "/v1/responses",
        {
            "input": [{"role": "user", "content": [
                {"type": "input_text", "text": "hello"}]}],
            "instructions": "be brief",
            "max_output_tokens": 3,
            "temperature": 0,
        },
    )
    out = json.loads(data)
    assert st == 200 and out["usage"]["output_tokens"] == 3

    # tokenize / detokenize roundtrip
    st, _, data = await http_request(port, "POST", "/tokenize",
                                     {"text": "hello"})
    toks = json.loads(data)["tokens"]
    assert st == 200 and len(toks) >= 5
    st, _, data = await http_request(port, "POST", "/detokenize",
                                     {"tokens": toks})
    assert st == 200 and "hello" in json.loads(data)["text"]

    await server.stop()


def test_extra_routes():
    server = make_server()
    asyncio.run(asyncio.wait_for(_scenario(server), timeout=300))
