"""HTTP API: native /generate + OpenAI-compatible routes.

Reference analog: srt/entrypoints/http_server.py (FastAPI, 80+ routes) and
the OpenAI serving impls under srt/entrypoints/openai/. Round-1 surface:

  GET  /health, /health_generate, /get_model_info, /get_server_info,
       /v1/models, /metrics
  POST /generate                (native API; stream via SSE)
  POST /v1/completions          (OpenAI completions, stream supported)
  POST /v1/chat/completions     (OpenAI chat, chat template, stream)
  POST /abort_request
"""

from __future__ import annotations

import asyncio
import json
import time
import uuid
from typing import Any, AsyncIterator, Dict, List, Optional

from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.server.engine_loop import EngineLoop
from sglang_diffusion_tpu.server.httpd import (
    HTTPServer,
    Request,
    Response,
    SSE_DONE,
    sse,
)
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("api_server")


def _sp_from_openai(body: Dict[str, Any], default_max: int) -> SamplingParams:
    sp = SamplingParams(
        max_new_tokens=body.get("max_tokens", body.get("max_completion_tokens", default_max)),
        temperature=body.get("temperature", 1.0),
        top_p=body.get("top_p", 1.0),
        top_k=body.get("top_k", -1),
        min_p=body.get("min_p", 0.0),
        frequency_penalty=body.get("frequency_penalty", 0.0),
        presence_penalty=body.get("presence_penalty", 0.0),
        stop=body.get("stop"),
        ignore_eos=body.get("ignore_eos", False),
        seed=body.get("seed"),
        lora_path=body.get("lora_path"),
    )
    # constrained decoding (reference: OpenAI extra fields regex/ebnf +
    # response_format json_schema, srt/entrypoints/openai/protocol.py)
    if body.get("regex"):
        sp.regex = body["regex"]
    if body.get("ebnf"):
        sp.ebnf = body["ebnf"]
    rf = body.get("response_format") or {}
    if rf.get("type") in ("json_object", "json_schema"):
        sp.json_schema = "{}"
    return sp


class ApiServer:
    def __init__(self, engine: Engine, args: ServerArgs, diff_generator=None,
                 mesh_pipeline=None):
        self.engine = engine
        self.args = args
        self.eloop = EngineLoop(engine)
        self.http = HTTPServer(args.host, args.port)
        self.start_time = time.time()
        self._register_routes()
        if diff_generator is not None:
            from sglang_diffusion_tpu.server.image_api import register_image_routes
            from sglang_diffusion_tpu.server.video_api import register_video_routes

            register_image_routes(self.http, diff_generator)
            register_video_routes(self.http, diff_generator)
        if mesh_pipeline is not None:
            from sglang_diffusion_tpu.server.mesh_api import register_mesh_routes

            register_mesh_routes(self.http, mesh_pipeline)

    # ------------- lifecycle -------------
    async def run(self) -> None:
        self.eloop.start(asyncio.get_running_loop())
        await self.http.serve_forever()

    async def start(self) -> None:
        self.eloop.start(asyncio.get_running_loop())
        await self.http.start()

    async def stop(self) -> None:
        self.eloop.shutdown()
        await self.http.stop()

    # ------------- helpers -------------
    async def _run_one(self, req) -> Dict[str, Any]:
        q = self.eloop.submit(req)
        while True:
            ev = await q.get()
            if ev["type"] == "done":
                return ev["output"]
            if ev["type"] == "error":
                raise RuntimeError(ev["error"])

    def _extract_images(self, messages: List[Dict[str, Any]]):
        """OpenAI multimodal chat: content parts of type image_url become a
        literal "<image>" marker in the text (tokenizer-agnostic; the engine
        splits on it and inserts the model's image token id). Returns
        (messages_with_text_content, image_list)."""
        images: List[Any] = []
        out = []
        for m in messages:
            content = m.get("content")
            if not isinstance(content, list):
                out.append(m)
                continue
            texts = []
            for part in content:
                ptype = part.get("type")
                if ptype == "text":
                    texts.append(part.get("text", ""))
                elif ptype == "image_url":
                    url = part.get("image_url")
                    if isinstance(url, dict):
                        url = url.get("url", "")
                    images.append(url)
                    texts.append("<image>")
            out.append({**m, "content": "".join(texts)})
        return out, images

    def _make_reasoner(self, body: Dict[str, Any]):
        """Build a ReasoningParser for this chat request, or None.

        Family is taken from the per-request "reasoning_parser" field when
        present, else ServerArgs.reasoning_parser. A request can opt out of
        separation with separate_reasoning=false (reference:
        srt/entrypoints/openai/serving_chat.py separate_reasoning flag).
        """
        family = body.get("reasoning_parser") or self.args.reasoning_parser
        if not family or not body.get("separate_reasoning", True):
            return None
        from sglang_diffusion_tpu.function_call.reasoning import ReasoningParser

        try:
            return ReasoningParser(
                family, stream_reasoning=body.get("stream_reasoning", True)
            )
        except KeyError:
            return None

    def _messages_to_prompt(self, messages: List[Dict[str, str]]) -> str:
        tk = self.engine.tokenizer
        if hasattr(tk, "apply_chat_template"):
            try:
                return tk.apply_chat_template(messages, add_generation_prompt=True)
            except Exception:
                pass
        # fallback plain template (byte tokenizer / no chat template)
        parts = [f"{m.get('role', 'user')}: {m.get('content', '')}" for m in messages]
        return "\n".join(parts) + "\nassistant:"

    # ------------- routes -------------
    def _register_routes(self) -> None:
        http = self.http
        model_id = self.args.served_model_name or "default"

        # Anthropic Messages + Ollama compatibility surfaces (reference:
        # srt/entrypoints/anthropic/, srt/entrypoints/ollama/)
        from sglang_diffusion_tpu.server.anthropic_api import (
            register_anthropic_routes,
        )
        from sglang_diffusion_tpu.server.ollama_api import (
            register_ollama_routes,
        )

        register_anthropic_routes(http, self)
        register_ollama_routes(http, self)

        @http.route("GET", "/health")
        async def health(_req: Request) -> Response:
            return Response({"status": "ok"})

        @http.route("GET", "/health_generate")
        async def health_generate(_req: Request) -> Response:
            # actually decodes a token (reference http_server.py:484-532)
            r = self.engine._make_req(
                None, [1], SamplingParams(max_new_tokens=1, temperature=0.0)
            )
            out = await self._run_one(r)
            ok = len(out["output_ids"]) == 1
            return Response({"status": "ok" if ok else "fail"})

        @http.route("GET", "/get_model_info")
        async def model_info(_req: Request) -> Response:
            return Response(
                {
                    "model_path": self.args.model_path,
                    "tokenizer_path": self.args.tokenizer_path,
                    "is_generation": True,
                }
            )

        @http.route("GET", "/get_server_info")
        async def server_info(_req: Request) -> Response:
            info = self.engine.get_server_info()
            info["uptime"] = time.time() - self.start_time
            return Response(info)

        @http.route("GET", "/v1/models")
        async def models(_req: Request) -> Response:
            return Response(
                {
                    "object": "list",
                    "data": [
                        {
                            "id": model_id,
                            "object": "model",
                            "created": int(self.start_time),
                            "owned_by": "sglang_diffusion_tpu",
                        }
                    ],
                }
            )

        @http.route("GET", "/v1/traces")
        async def traces(req: Request) -> Response:
            from sglang_diffusion_tpu.observability import get_recent_traces

            limit = int(req.query.get("limit", "100"))
            return Response({"traces": get_recent_traces(limit)})

        @http.route("GET", "/metrics")
        async def metrics(_req: Request) -> Response:
            s = self.engine.scheduler
            lines = [
                "# TYPE sgld_num_finished_total counter",
                f"sgld_num_finished_total {s.num_finished}",
                "# TYPE sgld_num_retracted_total counter",
                f"sgld_num_retracted_total {s.num_retracted}",
                "# TYPE sgld_waiting_queue gauge",
                f"sgld_waiting_queue {len(s.waiting)}",
                "# TYPE sgld_running_reqs gauge",
                f"sgld_running_reqs {len(s.running)}",
                "# TYPE sgld_free_kv_pages gauge",
                f"sgld_free_kv_pages {self.engine.allocator.free_pages}",
                "# TYPE sgld_cached_tokens_served_total counter",
                f"sgld_cached_tokens_served_total {s.cached_tokens_served}",
                "# TYPE sgld_spec_draft_tokens_total counter",
                f"sgld_spec_draft_tokens_total {s.spec_draft_tokens}",
                "# TYPE sgld_spec_accepted_tokens_total counter",
                f"sgld_spec_accepted_tokens_total {s.spec_accepted_tokens}",
            ]
            lines.extend(self.engine.latency_metrics.expose())
            return Response("\n".join(lines) + "\n", content_type="text/plain")

        @http.route("POST", "/abort_request")
        async def abort(req: Request) -> Response:
            body = req.json()
            ok = self.eloop.abort(body.get("rid", ""))
            return Response({"success": ok})

        @http.route("POST", "/classify")
        async def classify(req: Request) -> Response:
            """Reward / sequence-classification logits (reference analog:
            srt/entrypoints/http_server.py /classify)."""
            body = req.json()
            inp = body.get("text", body.get("input", ""))
            prompts = inp if isinstance(inp, list) else [inp]
            loop = asyncio.get_running_loop()
            outs = await loop.run_in_executor(
                None, lambda: self.engine.classify(prompts)
            )
            return Response(
                [
                    {
                        "embedding": o["embedding"],
                        "meta_info": o["meta_info"],
                    }
                    for o in outs
                ]
            )

        @http.route("POST", "/v1/embeddings")
        async def embeddings(req: Request) -> Response:
            body = req.json()
            inp = body.get("input", "")
            prompts = inp if isinstance(inp, list) else [inp]
            loop = asyncio.get_running_loop()
            outs = await loop.run_in_executor(
                None, lambda: self.engine.encode(prompts)
            )
            return Response(
                {
                    "object": "list",
                    "model": model_id,
                    "data": [
                        {
                            "object": "embedding",
                            "index": i,
                            "embedding": o["embedding"],
                        }
                        for i, o in enumerate(outs)
                    ],
                    "usage": {
                        "prompt_tokens": sum(
                            o["meta_info"]["prompt_tokens"] for o in outs
                        )
                    },
                }
            )

        @http.route("POST", "/v1/score")
        async def score(req: Request) -> Response:
            """Scoring (reference: serving_score.py /v1/score). Two forms:
            with label_token_ids -> probability of each label as the NEXT
            token after query+item (one row per item, apply_softmax over
            the label set); without -> legacy choice scoring (sum of
            forced-continuation logprobs)."""
            body = req.json()
            labels = body.get("label_token_ids")
            loop = asyncio.get_running_loop()
            if labels:
                items = body.get("items")
                if items is None:
                    return Response({"error": "items required"}, 400)
                try:
                    out = await loop.run_in_executor(
                        None,
                        lambda: self.engine.score(
                            body.get("query"), items, labels,
                            apply_softmax=bool(
                                body.get("apply_softmax", False)
                            ),
                            item_first=bool(body.get("item_first", False)),
                        ),
                    )
                except ValueError as e:
                    return Response({"error": str(e)}, 400)
                return Response({
                    "model": model_id,
                    "scores": out["scores"],
                    "usage": {
                        "prompt_tokens": out["prompt_tokens"],
                        "total_tokens": out["prompt_tokens"],
                    },
                })
            prompt = body.get("prompt", body.get("query", ""))
            choices = body.get("choices", body.get("items", []))
            if not choices:
                return Response({"error": "choices required"}, 400)
            scores = await loop.run_in_executor(
                None, lambda: self.engine.score_choices(prompt, choices)
            )
            return Response({"scores": scores})

        @http.route("POST", "/v1/rerank")
        async def rerank(req: Request) -> Response:
            """Document reranking (reference analog: serving_rerank.py).
            Relevance = choice-scoring logprob of each document given the
            query (cross-encoder-style teacher forcing on the LM)."""
            body = req.json()
            query = body.get("query", "")
            docs = body.get("documents", [])
            if not docs:
                return Response({"error": "documents required"}, 400)
            top_n = int(body.get("top_n", len(docs)))
            loop = asyncio.get_running_loop()
            scores = await loop.run_in_executor(
                None, lambda: self.engine.score_choices(query + "\n", docs)
            )
            order = sorted(range(len(docs)), key=lambda i: -scores[i])[:top_n]
            return Response({
                "model": model_id,
                "results": [
                    {
                        "index": i,
                        "relevance_score": scores[i],
                        "document": docs[i] if body.get("return_documents",
                                                        True) else None,
                    }
                    for i in order
                ],
            })

        @http.route("POST", "/v1/responses")
        async def responses(req: Request) -> Response:
            """OpenAI Responses API, non-streaming core (reference analog:
            serving_responses.py)."""
            body = req.json()
            inp = body.get("input", "")
            if isinstance(inp, list):
                messages = [
                    m if isinstance(m.get("content"), str)
                    else {**m, "content": "".join(
                        p.get("text", "") for p in m["content"]
                        if isinstance(p, dict)
                    )}
                    for m in inp
                ]
            else:
                messages = [{"role": "user", "content": str(inp)}]
            if body.get("instructions"):
                messages.insert(
                    0, {"role": "system", "content": body["instructions"]}
                )
            sp = SamplingParams(
                max_new_tokens=body.get(
                    "max_output_tokens", self.args.max_new_tokens_default
                ),
                temperature=body.get("temperature", 1.0),
                top_p=body.get("top_p", 1.0),
            )
            prompt = self._messages_to_prompt(messages)
            r = self.engine._make_req(prompt, None, sp)
            out = await self._run_one(r)
            rid = f"resp_{uuid.uuid4().hex}"
            return Response({
                "id": rid,
                "object": "response",
                "created_at": int(time.time()),
                "model": model_id,
                "status": "completed",
                "output": [
                    {
                        "type": "message",
                        "id": f"msg_{uuid.uuid4().hex}",
                        "role": "assistant",
                        "status": "completed",
                        "content": [
                            {"type": "output_text", "text": out["text"],
                             "annotations": []}
                        ],
                    }
                ],
                "usage": {
                    "input_tokens": out["meta_info"]["prompt_tokens"],
                    "output_tokens": out["meta_info"]["completion_tokens"],
                    "total_tokens": out["meta_info"]["prompt_tokens"]
                    + out["meta_info"]["completion_tokens"],
                },
            })

        @http.route("POST", "/v1/audio/transcriptions")
        async def transcriptions(req: Request) -> Response:
            """OpenAI transcriptions (reference analog:
            serving_transcriptions.py). JSON body: {"file_b64": <wav/pcm>,
            "prompt": optional} — requires an audio-capable model."""
            if self.engine.model_config.audio_token_id is None:
                return Response({"error": "model takes no audio input"}, 400)
            import base64 as _b64
            import io as _io
            import wave as _wave

            import numpy as _np

            body = req.json()
            try:
                raw = _b64.b64decode(body.get("file_b64", ""))
                with _wave.open(_io.BytesIO(raw)) as w:
                    n = w.getnframes()
                    pcm = _np.frombuffer(w.readframes(n), _np.int16)
                    if w.getnchannels() > 1:
                        pcm = pcm.reshape(-1, w.getnchannels()).mean(axis=1)
                    wav = (pcm.astype(_np.float32) / 32768.0)
            except Exception as e:  # noqa: BLE001
                return Response({"error": f"invalid wav: {e}"}, 400)
            prompt = body.get("prompt", "Transcribe: <audio>")
            if "<audio>" not in prompt:
                prompt += " <audio>"
            ids: List[int] = []
            for piece_i, piece in enumerate(prompt.split("<audio>")):
                if piece_i:
                    ids.append(self.engine.model_config.audio_token_id)
                ids.extend(self.engine.tokenizer.encode(piece))
            sp = SamplingParams(
                max_new_tokens=body.get("max_tokens",
                                        self.args.max_new_tokens_default),
                temperature=body.get("temperature", 0.0),
            )
            r = self.engine._make_req(None, ids, sp, audio_data=wav)
            out = await self._run_one(r)
            return Response({"text": out["text"]})

        @http.route("POST", "/tokenize")
        async def tokenize(req: Request) -> Response:
            body = req.json()
            ids = self.engine.tokenizer.encode(body.get("text", ""))
            return Response({"tokens": list(ids), "count": len(ids)})

        @http.route("POST", "/detokenize")
        async def detokenize(req: Request) -> Response:
            body = req.json()
            text = self.engine.tokenizer.decode(body.get("tokens", []))
            return Response({"text": text})

        @http.route("POST", "/open_session")
        async def open_session(req: Request) -> Response:
            body = req.json()
            sid = self.engine.open_session(body.get("session_id"))
            return Response({"session_id": sid})

        @http.route("POST", "/close_session")
        async def close_session(req: Request) -> Response:
            body = req.json()
            ok = self.engine.close_session(body.get("session_id", ""))
            return Response({"success": ok})

        @http.route("POST", "/start_profile")
        async def start_profile(req: Request) -> Response:
            # reference analog: scheduler_profiler_mixin.py:37 (torch.profiler);
            # here jax.profiler traces XLA/TPU activity for xprof/tensorboard
            import jax

            body = req.json()
            out_dir = body.get("output_dir", "/tmp/sgld_profile")
            try:
                jax.profiler.start_trace(out_dir)
                return Response({"success": True, "output_dir": out_dir})
            except Exception as e:  # noqa: BLE001
                return Response({"success": False, "message": str(e)}, 400)

        @http.route("POST", "/stop_profile")
        async def stop_profile(req: Request) -> Response:
            import jax

            try:
                jax.profiler.stop_trace()
                return Response({"success": True})
            except Exception as e:  # noqa: BLE001
                return Response({"success": False, "message": str(e)}, 400)

        @http.route("POST", "/load_lora_adapter")
        async def load_lora(req: Request) -> Response:
            body = req.json()
            out = self.engine.load_lora_adapter(
                body.get("lora_name", ""), body.get("lora_path", "")
            )
            return Response(out, 200 if out["success"] else 400)

        @http.route("POST", "/unload_lora_adapter")
        async def unload_lora(req: Request) -> Response:
            body = req.json()
            out = self.engine.unload_lora_adapter(body.get("lora_name", ""))
            return Response(out, 200 if out["success"] else 400)

        @http.route("POST", "/merge_lora_adapters")
        async def merge_lora(req: Request) -> Response:
            """Weighted merge: {"lora_name": ..., "components":
            {name: weight, ...}} -> fresh slot holding
            sum w_i * s_i * A_i B_i (exact rank concatenation)."""
            body = req.json()
            out = self.engine.merge_lora_adapters(
                body.get("lora_name", ""), body.get("components", {})
            )
            return Response(out, 200 if out["success"] else 400)

        @http.route("POST", "/release_memory_occupation")
        async def release_memory(req: Request) -> Response:
            body = req.json() if req.body else {}
            try:
                out = self.engine.release_memory_occupation(body.get("tags"))
            except RuntimeError as e:
                return Response({"error": str(e)}, status=409)
            return Response(out)

        @http.route("POST", "/resume_memory_occupation")
        async def resume_memory(req: Request) -> Response:
            body = req.json() if req.body else {}
            return Response(
                self.engine.resume_memory_occupation(body.get("tags")))

        @http.route("POST", "/update_weights_from_disk")
        async def update_weights(req: Request) -> Response:
            body = req.json()
            out = self.engine.update_weights_from_disk(body.get("model_path", ""))
            return Response(out, 200 if out["success"] else 400)

        @http.route("POST", "/disagg/kv")
        async def disagg_kv(req: Request) -> Response:
            """PD disaggregation receive path (reference: decode-side
            prealloc/transfer queues, disaggregation/decode.py:218,775):
            accepts a prefill host's KV handoff blob, imports the pages and
            starts decoding; poll /disagg/result?rid=..."""
            from sglang_diffusion_tpu.disagg.transfer import (
                handoff_from_bytes,
                import_and_decode,
            )

            try:
                handoff = handoff_from_bytes(req.body)
            except Exception as e:  # noqa: BLE001
                return Response({"error": f"bad handoff: {e}"}, 400)
            if not hasattr(self, "_disagg_results"):
                self._disagg_results = {}
            # backstop for never-polled rids: evict oldest terminal entries
            if len(self._disagg_results) >= 4096:
                for old_rid in [
                    r for r, v in self._disagg_results.items()
                    if v["status"] != "decoding"
                ][:1024]:
                    self._disagg_results.pop(old_rid, None)
            self._disagg_results[handoff.rid] = {"status": "decoding"}

            def run():
                try:
                    out = import_and_decode(self.engine, handoff)
                    self._disagg_results[handoff.rid] = {
                        "status": "completed", "output": out,
                    }
                except Exception as e:  # noqa: BLE001
                    self._disagg_results[handoff.rid] = {
                        "status": "failed", "error": str(e),
                    }

            asyncio.get_running_loop().run_in_executor(None, run)
            return Response({"rid": handoff.rid, "status": "accepted"})

        @http.route("GET", "/disagg/result")
        async def disagg_result(req: Request) -> Response:
            rid = req.query.get("rid", "")
            results = getattr(self, "_disagg_results", {})
            res = results.get(rid)
            if res is None:
                return Response({"error": "unknown rid"}, 404)
            if res["status"] != "decoding":
                # terminal result delivered: evict so a long-running decode
                # server doesn't accumulate results unboundedly
                results.pop(rid, None)
            return Response(res)

        @http.route("POST", "/update_weights_from_bucket")
        async def update_weights_bucket(req: Request) -> Response:
            """Bucketed weight sync (reference: tensor_bucket RL transport):
            {"metas": [...], "blob_b64": ...}."""
            import base64 as _b64

            body = req.json()
            blob = _b64.b64decode(body.get("blob_b64", ""))
            out = self.engine.update_weights_from_bucket(
                blob, body.get("metas", [])
            )
            return Response(out, 200 if out["success"] else 400)

        @http.route("POST", "/record_expert_distribution")
        async def record_expert_distribution(req: Request) -> Response:
            """EPLB recording probe (reference:
            /start_expert_distribution_record family): body
            {"input_ids": [[...], ...]}."""
            body = req.json()
            out = self.engine.record_expert_distribution(
                body.get("input_ids", [])
            )
            return Response(out, 200 if out["success"] else 400)

        @http.route("GET", "/dump_expert_distribution")
        async def dump_expert_distribution(req: Request) -> Response:
            out = self.engine.dump_expert_distribution()
            return Response(out, 200 if out["success"] else 400)

        @http.route("POST", "/rebalance_experts")
        async def rebalance_experts(req: Request) -> Response:
            """Live EPLB rebalance (reference: srt/eplb/eplb_manager.py)."""
            body = req.json() if req.body else {}
            out = self.engine.rebalance_experts(body.get("load"))
            return Response(out, 200 if out["success"] else 400)

        @http.route("POST", "/flush_cache")
        async def flush_cache(req: Request) -> Response:
            s = self.engine.scheduler
            if s.running or s.waiting or s.chunked_req is not None:
                return Response(
                    {"success": False, "message": "requests in flight"}, 400
                )
            if self.engine.radix is not None:
                self.engine.radix.evict(10**9)
            return Response({"success": True})

        @http.route("POST", "/generate")
        async def generate(req: Request) -> Response:
            body = req.json()
            sp_dict = body.get("sampling_params", {})
            sp = SamplingParams(
                **{
                    k: v
                    for k, v in sp_dict.items()
                    if k in SamplingParams.__dataclass_fields__
                }
            )
            prompt = body.get("text", body.get("prompt"))
            input_ids = body.get("input_ids")
            stream = body.get("stream", False)
            image_data = body.get("image_data")
            if image_data is not None and prompt is not None and input_ids is None:
                input_ids, prompt = self.engine.encode_mm_prompt(prompt), None
            r = self.engine._make_req(
                prompt, input_ids, sp, stream=stream, image_data=image_data
            )
            if not stream:
                out = await self._run_one(r)
                return Response(out)

            async def gen() -> AsyncIterator[bytes]:
                q = self.eloop.submit(r)
                acc_text = ""
                while True:
                    ev = await q.get()
                    if ev["type"] == "delta":
                        acc_text += ev["text"]
                        yield sse({"text": acc_text, "meta_info": {"id": r.rid}})
                    elif ev["type"] == "done":
                        yield sse(ev["output"])
                        break
                    else:
                        yield sse({"error": ev.get("error")})
                        break
                yield SSE_DONE

            return Response(stream=gen(), content_type="text/event-stream")

        @http.route("POST", "/v1/completions")
        async def completions(req: Request) -> Response:
            body = req.json()
            sp = _sp_from_openai(body, self.args.max_new_tokens_default)
            prompt = body.get("prompt", "")
            n = int(body.get("n", 1))
            stream = body.get("stream", False)

            def make_req():
                if isinstance(prompt, list) and prompt and isinstance(prompt[0], int):
                    return self.engine._make_req(None, prompt, sp, stream=stream)
                p = prompt[0] if isinstance(prompt, list) else prompt
                return self.engine._make_req(p, None, sp, stream=stream)

            cid = f"cmpl-{uuid.uuid4().hex}"
            created = int(time.time())
            if not stream:
                outs = await asyncio.gather(
                    *(self._run_one(make_req()) for _ in range(n))
                )
                return Response(
                    {
                        "id": cid,
                        "object": "text_completion",
                        "created": created,
                        "model": model_id,
                        "choices": [
                            {
                                "index": i,
                                "text": out["text"],
                                "logprobs": None,
                                "finish_reason": out["meta_info"]["finish_reason"],
                            }
                            for i, out in enumerate(outs)
                        ],
                        "usage": {
                            "prompt_tokens": outs[0]["meta_info"]["prompt_tokens"],
                            "completion_tokens": sum(
                                o["meta_info"]["completion_tokens"] for o in outs
                            ),
                            "total_tokens": outs[0]["meta_info"]["prompt_tokens"]
                            + sum(o["meta_info"]["completion_tokens"] for o in outs),
                        },
                    }
                )
            r = make_req()

            async def gen() -> AsyncIterator[bytes]:
                q = self.eloop.submit(r)
                while True:
                    ev = await q.get()
                    if ev["type"] == "delta":
                        yield sse(
                            {
                                "id": cid,
                                "object": "text_completion",
                                "created": created,
                                "model": model_id,
                                "choices": [
                                    {"index": 0, "text": ev["text"], "finish_reason": None}
                                ],
                            }
                        )
                    elif ev["type"] == "done":
                        out = ev["output"]
                        yield sse(
                            {
                                "id": cid,
                                "object": "text_completion",
                                "created": created,
                                "model": model_id,
                                "choices": [
                                    {
                                        "index": 0,
                                        "text": "",
                                        "finish_reason": out["meta_info"]["finish_reason"],
                                    }
                                ],
                            }
                        )
                        break
                    else:
                        break
                yield SSE_DONE

            return Response(stream=gen(), content_type="text/event-stream")

        @http.route("POST", "/v1/chat/completions")
        async def chat(req: Request) -> Response:
            body = req.json()
            sp = _sp_from_openai(body, self.args.max_new_tokens_default)
            messages = list(body.get("messages", []))
            tools = body.get("tools") or []
            tool_choice = body.get("tool_choice", "auto" if tools else "none")
            parser = None
            if tools and tool_choice != "none":
                from sglang_diffusion_tpu.function_call import (
                    FunctionCallParser,
                    tools_system_prompt,
                )

                messages.insert(
                    0, {"role": "system", "content": tools_system_prompt(tools)}
                )
                parser = FunctionCallParser(
                    tools, fmt=self.args.tool_call_parser
                )
                if tool_choice == "required" or isinstance(tool_choice, dict):
                    sp.json_schema = "{}"  # constrain output to JSON
            messages, images = self._extract_images(messages)
            prompt = self._messages_to_prompt(messages)
            stream = body.get("stream", False)
            if images:
                ids = self.engine.encode_mm_prompt(prompt)
                r = self.engine._make_req(
                    None, ids, sp, stream=stream, image_data=images
                )
            else:
                r = self.engine._make_req(prompt, None, sp, stream=stream)
            cid = f"chatcmpl-{uuid.uuid4().hex}"
            created = int(time.time())
            reasoner = self._make_reasoner(body)
            if not stream:
                out = await self._run_one(r)
                content: Any = out["text"]
                tool_calls = []
                finish = out["meta_info"]["finish_reason"]
                reasoning_content = None
                if reasoner is not None:
                    reasoning_content, content = reasoner.parse(content)
                if parser is not None:
                    content, tool_calls = parser.parse(content or "")
                    if tool_calls:
                        finish = "tool_calls"
                msg: Dict[str, Any] = {"role": "assistant", "content": content}
                if reasoning_content is not None:
                    msg["reasoning_content"] = reasoning_content
                if tool_calls:
                    msg["tool_calls"] = tool_calls
                return Response(
                    {
                        "id": cid,
                        "object": "chat.completion",
                        "created": created,
                        "model": model_id,
                        "choices": [
                            {
                                "index": 0,
                                "message": msg,
                                "finish_reason": finish,
                            }
                        ],
                        "usage": {
                            "prompt_tokens": out["meta_info"]["prompt_tokens"],
                            "completion_tokens": out["meta_info"]["completion_tokens"],
                            "total_tokens": out["meta_info"]["prompt_tokens"]
                            + out["meta_info"]["completion_tokens"],
                        },
                    }
                )

            # incremental tool-call deltas (reference analog:
            # base_format_detector.parse_streaming_increment) — only for
            # formats with a streaming spec; others fall back to plain
            # content streaming and one-shot parse by the client
            stream_tools = None
            if parser is not None:
                from sglang_diffusion_tpu.function_call.streaming import (
                    SPECS,
                    StreamingToolParser,
                )

                fmt = self.args.tool_call_parser or "json"
                if fmt in SPECS:
                    stream_tools = StreamingToolParser(fmt, tools)

            async def gen() -> AsyncIterator[bytes]:
                q = self.eloop.submit(r)
                first = True

                def chunk(delta: Dict[str, Any], finish=None) -> bytes:
                    return sse(
                        {
                            "id": cid,
                            "object": "chat.completion.chunk",
                            "created": created,
                            "model": model_id,
                            "choices": [
                                {"index": 0, "delta": delta,
                                 "finish_reason": finish}
                            ],
                        }
                    )

                def route(text: str) -> Optional[Dict[str, Any]]:
                    """Split a content delta into content/tool_calls."""
                    delta: Dict[str, Any] = {}
                    if stream_tools is not None:
                        normal, tds = stream_tools.feed(text)
                        if normal:
                            delta["content"] = normal
                        if tds:
                            delta["tool_calls"] = tds
                    elif text:
                        delta["content"] = text
                    return delta or None

                while True:
                    ev = await q.get()
                    if ev["type"] == "delta":
                        delta = {}
                        if reasoner is not None:
                            rd, nd = reasoner.parse_stream_chunk(ev["text"])
                            if rd:
                                delta["reasoning_content"] = rd
                            if nd:
                                delta.update(route(nd) or {})
                        else:
                            delta = route(ev["text"]) or {}
                        if not delta:
                            continue  # held back (partial marker)
                        if first:
                            delta["role"] = "assistant"
                            first = False
                        yield chunk(delta)
                    elif ev["type"] == "done":
                        out = ev["output"]
                        tail: Dict[str, Any] = {}
                        residual = ""
                        if reasoner is not None:
                            rd, nd = reasoner.flush()
                            if rd:
                                tail["reasoning_content"] = rd
                            residual = nd
                        if stream_tools is not None:
                            n1, t1 = stream_tools.feed(residual)
                            n2, t2 = stream_tools.flush()
                            if n1 + n2:
                                tail["content"] = n1 + n2
                            if t1 + t2:
                                tail["tool_calls"] = t1 + t2
                        elif residual:
                            tail["content"] = residual
                        if tail:
                            if first:
                                tail["role"] = "assistant"
                                first = False
                            yield chunk(tail)
                        finish = out["meta_info"]["finish_reason"]
                        if stream_tools is not None and stream_tools.any_calls:
                            finish = "tool_calls"
                        yield chunk({}, finish)
                        break
                    else:
                        break
                yield SSE_DONE

            return Response(stream=gen(), content_type="text/event-stream")


def launch_server(args: ServerArgs, engine: Optional[Engine] = None) -> None:
    """Blocking entry (reference analog: launch_server.py:run_server)."""
    if engine is None:
        engine = Engine(server_args=args)
    mesh_pipeline = None
    if getattr(args, "mesh_model", None):
        from sglang_diffusion_tpu.diffusion.hunyuan3d import (
            Hunyuan3DConfig,
            Hunyuan3DPipeline,
            ShapeVAEConfig,
        )

        # "default" serves the true hunyuan3d-2.0 dims with random
        # weights (shape-class serving without a checkpoint); any other
        # value is treated as a checkpoint directory for the loader.
        mesh_pipeline = Hunyuan3DPipeline(
            Hunyuan3DConfig(), ShapeVAEConfig())
    server = ApiServer(engine, args, mesh_pipeline=mesh_pipeline)
    asyncio.run(server.run())
