"""gRPC serving endpoint (scheduler-direct, token-level, protobuf wire).

Reference analog: srt/entrypoints/grpc_server.py:145 SGLangSchedulerServicer
— the gateway-facing RPC surface that bypasses HTTP+templating (tokens in,
tokens out). Since round 5 the wire format is real protobuf
(server/proto/sgld_scheduler.proto, compiled with protoc): the service,
message, and field NAMES mirror the reference's sglang_scheduler proto as
observed from its servicer, so gateway-side conversion logic ports 1:1.
grpcio's python plugin is not in this image, so the service registers
generic method handlers with pb2 (de)serializers instead of generated
stubs — identical wire semantics.

Methods (service sgld.grpc.scheduler.SglangScheduler):
  Generate      server-streaming GenerateResponse{chunk*, complete}
  Embed         unary EmbedResponse
  HealthCheck   unary (decodes one token like the reference's
                /health_generate)
  Abort         unary
  GetModelInfo  unary
  GetLoads      unary (scheduler queue/running/token counts)
"""

from __future__ import annotations

import threading
from concurrent import futures
from typing import Any, Dict, Iterator

from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.server.proto import sgld_scheduler_pb2 as pb2
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("grpc")

SERVICE = "sgld.grpc.scheduler.SglangScheduler"


def sampling_params_from_proto(p: "pb2.SamplingParams") -> SamplingParams:
    """Proto -> engine SamplingParams (reference:
    grpc_server.py _convert_sampling_params)."""
    kw: Dict[str, Any] = dict(
        temperature=p.temperature,
        top_p=p.top_p or 1.0,
        top_k=p.top_k or -1,
        min_p=p.min_p,
        frequency_penalty=p.frequency_penalty,
        presence_penalty=p.presence_penalty,
        ignore_eos=p.ignore_eos,
    )
    if p.HasField("max_new_tokens"):
        kw["max_new_tokens"] = p.max_new_tokens
    if p.stop:
        kw["stop"] = list(p.stop)
    which = p.WhichOneof("constraint")
    if which == "regex":
        kw["regex"] = p.regex
    elif which == "json_schema":
        kw["json_schema"] = p.json_schema
    elif which == "ebnf_grammar":
        kw["ebnf"] = p.ebnf_grammar
    fields = SamplingParams.__dataclass_fields__
    return SamplingParams(**{k: v for k, v in kw.items() if k in fields})


class GrpcServer:
    """Sync gRPC server over the shared Engine. Each Generate stream runs a
    scheduler-coupled request; concurrent streams interleave through the
    engine's continuous-batching step loop via per-request polling."""

    def __init__(self, engine: Engine, args: ServerArgs, port: int = 0):
        import grpc

        self.engine = engine
        self.args = args
        self._server = grpc.server(
            futures.ThreadPoolExecutor(max_workers=32)
        )
        handlers = {
            "Generate": grpc.unary_stream_rpc_method_handler(
                self._generate,
                request_deserializer=pb2.GenerateRequest.FromString,
                response_serializer=pb2.GenerateResponse.SerializeToString,
            ),
            "Embed": grpc.unary_unary_rpc_method_handler(
                self._embed,
                request_deserializer=pb2.EmbedRequest.FromString,
                response_serializer=pb2.EmbedResponse.SerializeToString,
            ),
            "HealthCheck": grpc.unary_unary_rpc_method_handler(
                self._health,
                request_deserializer=pb2.HealthCheckRequest.FromString,
                response_serializer=(
                    pb2.HealthCheckResponse.SerializeToString),
            ),
            "Abort": grpc.unary_unary_rpc_method_handler(
                self._abort,
                request_deserializer=pb2.AbortRequest.FromString,
                response_serializer=pb2.AbortResponse.SerializeToString,
            ),
            "GetModelInfo": grpc.unary_unary_rpc_method_handler(
                self._model_info,
                request_deserializer=pb2.GetModelInfoRequest.FromString,
                response_serializer=(
                    pb2.GetModelInfoResponse.SerializeToString),
            ),
            "GetLoads": grpc.unary_unary_rpc_method_handler(
                self._loads,
                request_deserializer=pb2.GetLoadsRequest.FromString,
                response_serializer=pb2.GetLoadsResponse.SerializeToString,
            ),
        }
        self._server.add_generic_rpc_handlers(
            (grpc.method_handlers_generic_handler(SERVICE, handlers),)
        )
        self.port = self._server.add_insecure_port(f"{args.host}:{port}")

    def start(self) -> None:
        self._server.start()
        logger.info("grpc server on port %d", self.port)

    def stop(self, grace: float = 1.0) -> None:
        self._server.stop(grace)

    # ------------- handlers -------------
    def _health(self, request, context) -> "pb2.HealthCheckResponse":
        out = self.engine.generate(
            input_ids=[1], sampling_params=SamplingParams(
                max_new_tokens=1, temperature=0.0, ignore_eos=True,
            ),
        )
        ok = len(out["output_ids"]) == 1
        return pb2.HealthCheckResponse(
            healthy=ok, message="ok" if ok else "generation failed")

    def _abort(self, request, context) -> "pb2.AbortResponse":
        ok = self.engine.abort_request(request.request_id)
        return pb2.AbortResponse(success=ok)

    def _model_info(self, request, context) -> "pb2.GetModelInfoResponse":
        cfg = self.engine.model_config
        return pb2.GetModelInfoResponse(
            model_path=self.args.model_path,
            model_type=cfg.architecture,
            max_context_length=self.engine.runner.context_len,
            vocab_size=cfg.vocab_size,
            is_generation=True,
            eos_token_ids=[int(t) for t in cfg.eos_token_ids],
        )

    def _loads(self, request, context) -> "pb2.GetLoadsResponse":
        sched = self.engine.scheduler
        tokens = sum(r.num_computed for r in sched.running)
        return pb2.GetLoadsResponse(loads=[
            pb2.SchedulerLoad(
                num_waiting_reqs=len(sched.waiting),
                num_running_reqs=len(sched.running),
                num_tokens=tokens,
                scheduler_id="0",
            )
        ])

    def _embed(self, request, context) -> "pb2.EmbedResponse":
        try:
            ids = list(request.tokenized.input_ids)
            out = self.engine.encode(
                request.tokenized.original_text) if not ids else None
            if ids:
                from sglang_diffusion_tpu.utils.common import cdiv

                pages = self.engine.allocator.alloc(
                    cdiv(len(ids), self.args.page_size))
                try:
                    emb = self.engine.runner.run_embedding(ids, pages)
                finally:
                    self.engine.allocator.free(pages)
                vec = [float(x) for x in emb.tolist()]
                ptoks = len(ids)
            else:
                vec = out["embedding"]
                ptoks = out["meta_info"]["prompt_tokens"]
            return pb2.EmbedResponse(
                request_id=request.request_id,
                complete=pb2.EmbedComplete(
                    embedding=vec, prompt_tokens=ptoks),
            )
        except Exception as e:  # noqa: BLE001
            return pb2.EmbedResponse(
                request_id=request.request_id,
                error=pb2.GenerateError(message=str(e)),
            )

    def _generate(self, request, context) -> Iterator["pb2.GenerateResponse"]:
        sp = sampling_params_from_proto(request.sampling_params)
        input_ids = list(request.tokenized.input_ids) or None
        text = request.tokenized.original_text or None
        req = self.engine._make_req(
            text if input_ids is None else None, input_ids, sp, stream=True
        )
        if request.request_id:
            detok = self.engine._detoks.pop(req.rid, None)
            req.rid = request.request_id
            if detok is not None:
                self.engine._detoks[req.rid] = detok
        with self.engine._lock:
            self.engine.scheduler.add_request(req)
        sent_tokens = 0
        while True:
            with self.engine._lock:
                if not req.finished:
                    self.engine.step()
                self.engine.pop_stream_delta(req.rid)
            new_toks = req.output_ids[sent_tokens:]
            if req.finished:
                fr = str(req.finish_reason.value) if req.finish_reason \
                    else "stop"
                yield pb2.GenerateResponse(
                    request_id=req.rid,
                    complete=pb2.GenerateComplete(
                        output_ids=[int(t) for t in req.output_ids],
                        finish_reason=fr,
                        prompt_tokens=req.prompt_len,
                        completion_tokens=len(req.output_ids),
                        cached_tokens=req.cached_prefix_len,
                    ),
                )
                return
            if new_toks:
                yield pb2.GenerateResponse(
                    request_id=req.rid,
                    chunk=pb2.GenerateStreamChunk(
                        token_ids=[int(t) for t in new_toks],
                        prompt_tokens=req.prompt_len,
                        completion_tokens=len(req.output_ids),
                        cached_tokens=req.cached_prefix_len,
                    ),
                )
                sent_tokens += len(new_toks)
            else:
                import time

                time.sleep(0.001)  # another stream's step owns the engine


def make_channel_stubs(address: str):
    """Client-side callables (test + gateway router use):
    (generate_stream, health, abort, model_info, loads) over protobuf."""
    import grpc

    channel = grpc.insecure_channel(address)
    gen = channel.unary_stream(
        f"/{SERVICE}/Generate",
        request_serializer=pb2.GenerateRequest.SerializeToString,
        response_deserializer=pb2.GenerateResponse.FromString,
    )
    health = channel.unary_unary(
        f"/{SERVICE}/HealthCheck",
        request_serializer=pb2.HealthCheckRequest.SerializeToString,
        response_deserializer=pb2.HealthCheckResponse.FromString,
    )
    abort = channel.unary_unary(
        f"/{SERVICE}/Abort",
        request_serializer=pb2.AbortRequest.SerializeToString,
        response_deserializer=pb2.AbortResponse.FromString,
    )
    model_info = channel.unary_unary(
        f"/{SERVICE}/GetModelInfo",
        request_serializer=pb2.GetModelInfoRequest.SerializeToString,
        response_deserializer=pb2.GetModelInfoResponse.FromString,
    )
    loads = channel.unary_unary(
        f"/{SERVICE}/GetLoads",
        request_serializer=pb2.GetLoadsRequest.SerializeToString,
        response_deserializer=pb2.GetLoadsResponse.FromString,
    )
    return gen, health, abort, model_info, loads
