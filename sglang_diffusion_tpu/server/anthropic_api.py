"""Anthropic-compatible Messages API.

Reference analog: srt/entrypoints/anthropic/serving.py (+protocol.py) —
POST /v1/messages (non-stream + SSE event stream with
message_start / content_block_* / message_delta / message_stop) and
POST /v1/messages/count_tokens. Tool use maps onto the engine's
function-call machinery: Anthropic `tools` (input_schema) become the
detector's tool specs, parsed calls come back as `tool_use` content
blocks, and streamed calls ride content_block input_json_delta events.
"""

from __future__ import annotations

import json
import time
import uuid
from typing import Any, AsyncIterator, Dict, List, Optional, Tuple

from sglang_diffusion_tpu.sampling.params import SamplingParams


def _anth_sse(event: str, data: Dict[str, Any]) -> bytes:
    return (f"event: {event}\ndata: {json.dumps(data)}\n\n").encode()


def _to_openai_tools(tools: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
    return [
        {
            "type": "function",
            "function": {
                "name": t.get("name"),
                "description": t.get("description", ""),
                "parameters": t.get("input_schema", {}),
            },
        }
        for t in (tools or [])
    ]


def _flatten_content(content: Any) -> str:
    """Anthropic content blocks -> plain text for the chat template."""
    if isinstance(content, str):
        return content
    parts = []
    for blk in content or []:
        t = blk.get("type")
        if t == "text":
            parts.append(blk.get("text", ""))
        elif t == "tool_result":
            inner = blk.get("content", "")
            parts.append(
                f"[tool result {blk.get('tool_use_id', '')}]: "
                f"{_flatten_content(inner)}"
            )
        elif t == "tool_use":
            parts.append(
                f"[tool call {blk.get('name')}({json.dumps(blk.get('input', {}))})]"
            )
        elif t == "image":
            parts.append("<image>")
    return "".join(parts)


def _messages_to_chat(body: Dict[str, Any]) -> List[Dict[str, str]]:
    msgs: List[Dict[str, str]] = []
    system = body.get("system")
    if system:
        msgs.append({"role": "system", "content": _flatten_content(system)})
    for m in body.get("messages", []):
        msgs.append(
            {"role": m.get("role", "user"),
             "content": _flatten_content(m.get("content"))}
        )
    return msgs


def _sp_from_anthropic(body: Dict[str, Any]) -> SamplingParams:
    return SamplingParams(
        max_new_tokens=body.get("max_tokens", 1024),
        temperature=body.get("temperature", 1.0),
        top_p=body.get("top_p", 1.0),
        top_k=body.get("top_k", -1),
        stop=body.get("stop_sequences"),
    )


def _stop_reason(finish: Optional[str], had_tools: bool) -> str:
    if had_tools:
        return "tool_use"
    if finish == "length":
        return "max_tokens"
    if finish == "stop_str":
        return "stop_sequence"
    return "end_turn"


def register_anthropic_routes(http, server) -> None:
    """server: ApiServer (engine/eloop/args access)."""
    from sglang_diffusion_tpu.server.httpd import Request, Response

    engine = server.engine
    args = server.args
    model_id = args.served_model_name or args.model_path or "sgld-tpu"

    @http.route("POST", "/v1/messages")
    async def messages(req: Request) -> Response:
        body = req.json()
        sp = _sp_from_anthropic(body)
        msgs = _messages_to_chat(body)
        tools = body.get("tools") or []
        parser = None
        stream_tools = None
        if tools and (body.get("tool_choice") or {}).get("type") != "none":
            from sglang_diffusion_tpu.function_call import (
                FunctionCallParser,
                tools_system_prompt,
            )

            oai_tools = _to_openai_tools(tools)
            msgs.insert(
                0, {"role": "system",
                    "content": tools_system_prompt(oai_tools)})
            parser = FunctionCallParser(oai_tools, fmt=args.tool_call_parser)
            if body.get("stream"):
                from sglang_diffusion_tpu.function_call.streaming import (
                    SPECS,
                    StreamingToolParser,
                )

                fmt = args.tool_call_parser or "json"
                if fmt in SPECS:
                    stream_tools = StreamingToolParser(fmt, oai_tools)
        prompt = server._messages_to_prompt(msgs)
        r = engine._make_req(prompt, None, sp, stream=bool(body.get("stream")))
        mid = f"msg_{uuid.uuid4().hex[:24]}"
        n_in = len(engine.tokenizer.encode(prompt))

        if not body.get("stream"):
            out = await server._run_one(r)
            text = out["text"]
            content: List[Dict[str, Any]] = []
            tool_calls: List[Dict[str, Any]] = []
            if parser is not None:
                normal, calls = parser.parse(text)
                if normal:
                    content.append({"type": "text", "text": normal})
                for c in calls:
                    fn = c["function"]
                    try:
                        inp = json.loads(fn["arguments"] or "{}")
                    except json.JSONDecodeError:
                        inp = {}
                    tool_calls.append({
                        "type": "tool_use",
                        "id": c["id"].replace("call_", "toolu_"),
                        "name": fn["name"],
                        "input": inp,
                    })
                content.extend(tool_calls)
            else:
                content.append({"type": "text", "text": text})
            return Response({
                "id": mid,
                "type": "message",
                "role": "assistant",
                "model": model_id,
                "content": content,
                "stop_reason": _stop_reason(
                    out["meta_info"]["finish_reason"], bool(tool_calls)),
                "stop_sequence": None,
                "usage": {
                    "input_tokens": out["meta_info"]["prompt_tokens"],
                    "output_tokens": out["meta_info"]["completion_tokens"],
                },
            })

        async def gen() -> AsyncIterator[bytes]:
            q = server.eloop.submit(r)
            yield _anth_sse("message_start", {
                "type": "message_start",
                "message": {
                    "id": mid, "type": "message", "role": "assistant",
                    "model": model_id, "content": [],
                    "stop_reason": None, "stop_sequence": None,
                    "usage": {"input_tokens": n_in, "output_tokens": 0},
                },
            })
            block = -1  # current content block index
            block_kind: Optional[str] = None
            n_out = 0
            any_tools = False

            def open_block(kind: str, payload: Dict[str, Any]):
                nonlocal block, block_kind
                block += 1
                block_kind = kind
                return _anth_sse("content_block_start", {
                    "type": "content_block_start", "index": block,
                    "content_block": payload,
                })

            def close_block():
                nonlocal block_kind
                if block_kind is None:
                    return None
                block_kind = None
                return _anth_sse("content_block_stop", {
                    "type": "content_block_stop", "index": block})

            def emit_text(txt: str):
                out = []
                if block_kind != "text":
                    c = close_block()
                    if c:
                        out.append(c)
                    out.append(open_block("text", {"type": "text",
                                                   "text": ""}))
                out.append(_anth_sse("content_block_delta", {
                    "type": "content_block_delta", "index": block,
                    "delta": {"type": "text_delta", "text": txt}}))
                return out

            def emit_tool(tds: List[Dict[str, Any]]):
                nonlocal any_tools
                out = []
                for td in tds:
                    fn = td.get("function", {})
                    if fn.get("name"):
                        any_tools = True
                        c = close_block()
                        if c:
                            out.append(c)
                        out.append(open_block("tool_use", {
                            "type": "tool_use",
                            "id": td.get("id", "").replace("call_", "toolu_"),
                            "name": fn["name"], "input": {}}))
                    elif fn.get("arguments") and block_kind == "tool_use":
                        out.append(_anth_sse("content_block_delta", {
                            "type": "content_block_delta", "index": block,
                            "delta": {"type": "input_json_delta",
                                      "partial_json": fn["arguments"]}}))
                return out

            while True:
                ev = await q.get()
                if ev["type"] == "delta":
                    if stream_tools is not None:
                        normal, tds = stream_tools.feed(ev["text"])
                        if normal:
                            for c in emit_text(normal):
                                yield c
                        for c in emit_tool(tds):
                            yield c
                    elif ev["text"]:
                        for c in emit_text(ev["text"]):
                            yield c
                elif ev["type"] == "done":
                    out = ev["output"]
                    n_out = out["meta_info"]["completion_tokens"]
                    if stream_tools is not None:
                        n1, t1 = stream_tools.feed("")
                        n2, t2 = stream_tools.flush()
                        if n1 + n2:
                            for c in emit_text(n1 + n2):
                                yield c
                        for c in emit_tool(t1 + t2):
                            yield c
                    if block < 0:
                        # nothing streamed (detokenizer held everything
                        # back, or the output decoded to nothing): the
                        # Messages API always carries >= 1 content block
                        if out["text"]:
                            for c in emit_text(out["text"]):
                                yield c
                        else:
                            yield open_block("text",
                                             {"type": "text", "text": ""})
                    c = close_block()
                    if c:
                        yield c
                    yield _anth_sse("message_delta", {
                        "type": "message_delta",
                        "delta": {
                            "stop_reason": _stop_reason(
                                out["meta_info"]["finish_reason"],
                                any_tools),
                            "stop_sequence": None,
                        },
                        "usage": {"output_tokens": n_out},
                    })
                    yield _anth_sse("message_stop", {"type": "message_stop"})
                    break
                else:
                    break

        return Response(stream=gen(), content_type="text/event-stream")

    @http.route("POST", "/v1/messages/count_tokens")
    async def count_tokens(req: Request) -> Response:
        body = req.json()
        prompt = server._messages_to_prompt(_messages_to_chat(body))
        return Response(
            {"input_tokens": len(engine.tokenizer.encode(prompt))})
