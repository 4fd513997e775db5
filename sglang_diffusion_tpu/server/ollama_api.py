"""Ollama-compatible API routes.

Reference analog: srt/entrypoints/ollama/serving.py + the route set in
srt/entrypoints/http_server.py:1620-1650 — GET / health text,
POST /api/generate and /api/chat (NDJSON streaming by default, the
Ollama wire format), GET /api/tags, POST /api/show.
"""

from __future__ import annotations

import json
import time
from typing import Any, AsyncIterator, Dict

from sglang_diffusion_tpu.sampling.params import SamplingParams


def _now() -> str:
    return time.strftime("%Y-%m-%dT%H:%M:%S.000Z", time.gmtime())


def _sp_from_ollama(body: Dict[str, Any]) -> SamplingParams:
    opts = body.get("options") or {}
    return SamplingParams(
        max_new_tokens=opts.get("num_predict", 128),
        temperature=opts.get("temperature", 0.8),
        top_p=opts.get("top_p", 0.9),
        top_k=opts.get("top_k", -1),
        stop=opts.get("stop"),
        seed=opts.get("seed"),
    )


def register_ollama_routes(http, server) -> None:
    from sglang_diffusion_tpu.server.httpd import Request, Response

    engine = server.engine
    args = server.args
    model_id = args.served_model_name or args.model_path or "sgld-tpu"

    @http.route("GET", "/")
    async def root(req: Request) -> Response:
        return Response("Ollama is running", content_type="text/plain")

    def _final_stats(out: Dict[str, Any], t0: float) -> Dict[str, Any]:
        mi = out["meta_info"]
        total_ns = int((time.time() - t0) * 1e9)
        return {
            "done": True,
            "done_reason": ("length" if mi["finish_reason"] == "length"
                            else "stop"),
            "total_duration": total_ns,
            "load_duration": 0,
            "prompt_eval_count": mi["prompt_tokens"],
            "prompt_eval_duration": 0,
            "eval_count": mi["completion_tokens"],
            "eval_duration": total_ns,
        }

    async def _ndjson_stream(q, shape) -> AsyncIterator[bytes]:
        t0 = time.time()
        while True:
            ev = await q.get()
            if ev["type"] == "delta":
                yield (json.dumps(
                    {"model": model_id, "created_at": _now(), "done": False,
                     **shape(ev["text"])}) + "\n").encode()
            elif ev["type"] == "done":
                yield (json.dumps(
                    {"model": model_id, "created_at": _now(),
                     **shape(""), **_final_stats(ev["output"], t0)})
                    + "\n").encode()
                break
            else:
                break

    @http.route("POST", "/api/generate")
    async def generate(req: Request) -> Response:
        body = req.json()
        sp = _sp_from_ollama(body)
        prompt = body.get("prompt", "")
        stream = body.get("stream", True)  # Ollama default IS streaming
        r = engine._make_req(prompt, None, sp, stream=stream)
        if not stream:
            t0 = time.time()
            out = await server._run_one(r)
            return Response({
                "model": model_id, "created_at": _now(),
                "response": out["text"], **_final_stats(out, t0)})
        q = server.eloop.submit(r)
        return Response(
            stream=_ndjson_stream(q, lambda t: {"response": t}),
            content_type="application/x-ndjson")

    @http.route("POST", "/api/chat")
    async def chat(req: Request) -> Response:
        body = req.json()
        sp = _sp_from_ollama(body)
        prompt = server._messages_to_prompt(list(body.get("messages", [])))
        stream = body.get("stream", True)
        r = engine._make_req(prompt, None, sp, stream=stream)
        if not stream:
            t0 = time.time()
            out = await server._run_one(r)
            return Response({
                "model": model_id, "created_at": _now(),
                "message": {"role": "assistant", "content": out["text"]},
                **_final_stats(out, t0)})
        q = server.eloop.submit(r)
        return Response(
            stream=_ndjson_stream(
                q, lambda t: {"message": {"role": "assistant",
                                          "content": t}}),
            content_type="application/x-ndjson")

    @http.route("GET", "/api/tags")
    async def tags(req: Request) -> Response:
        return Response({"models": [{
            "name": model_id, "model": model_id,
            "modified_at": _now(), "size": 0, "digest": "",
            "details": {"family": engine.model_config.architecture,
                        "parameter_size": "", "quantization_level":
                        args.quantization or "none"},
        }]})

    @http.route("POST", "/api/show")
    async def show(req: Request) -> Response:
        cfg = engine.model_config
        return Response({
            "modelfile": "", "parameters": "", "template": "",
            "details": {"family": cfg.architecture,
                        "format": "safetensors",
                        "parameter_size": "",
                        "quantization_level": args.quantization or "none"},
            "model_info": {
                "general.architecture": cfg.architecture,
                "vocab_size": cfg.vocab_size,
                "context_length": args.context_length
                or cfg.max_position_embeddings,
            },
        })
