"""gRPC serving endpoint (scheduler-direct, token-level).

Reference analog: srt/entrypoints/grpc_server.py:145 SGLangSchedulerServicer
— the gateway-facing RPC surface that bypasses HTTP+templating (tokens in,
tokens out). grpc_tools/protoc-python-plugin are not in this image, so the
service registers hand-built method handlers with a JSON codec (wire-level
gRPC semantics — unary + server-streaming — are identical; a .proto codec
can be swapped in without touching the service logic).

Methods (service sglang.Scheduler):
  Generate     server-streaming: {text|input_ids, sampling_params}
               -> {token_ids, text_delta, finished, meta}
  HealthCheck  unary: {} -> {status}
  Abort        unary: {rid} -> {ok}
"""

from __future__ import annotations

import asyncio
import json
import threading
from concurrent import futures
from typing import Any, Dict, Iterator

from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("grpc")

SERVICE = "sglang.Scheduler"


def _ser(obj: Dict[str, Any]) -> bytes:
    return json.dumps(obj).encode()


def _de(data: bytes) -> Dict[str, Any]:
    return json.loads(data) if data else {}


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
                request_deserializer=_de,
                response_serializer=_ser,
            ),
            "HealthCheck": grpc.unary_unary_rpc_method_handler(
                self._health,
                request_deserializer=_de,
                response_serializer=_ser,
            ),
            "Abort": grpc.unary_unary_rpc_method_handler(
                self._abort,
                request_deserializer=_de,
                response_serializer=_ser,
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
    def _health(self, request, context) -> Dict[str, Any]:
        out = self.engine.generate(
            input_ids=[1], sampling_params=SamplingParams(
                max_new_tokens=1, temperature=0.0, ignore_eos=True,
            ),
        )
        ok = len(out["output_ids"]) == 1
        return {"status": "ok" if ok else "error"}

    def _abort(self, request, context) -> Dict[str, Any]:
        return {"ok": self.engine.abort_request(request.get("rid", ""))}

    def _generate(self, request, context) -> Iterator[Dict[str, Any]]:
        sp_dict = request.get("sampling_params", {})
        sp = SamplingParams(**{
            k: v for k, v in sp_dict.items()
            if k in SamplingParams.__dataclass_fields__
        })
        req = self.engine._make_req(
            request.get("text"), request.get("input_ids"), sp, stream=True
        )
        with self.engine._lock:
            self.engine.scheduler.add_request(req)
        sent_tokens = 0
        sent_text = ""
        while True:
            with self.engine._lock:
                if not req.finished:
                    self.engine.step()
                delta_text = self.engine.pop_stream_delta(req.rid)
            new_toks = req.output_ids[sent_tokens:]
            if new_toks or delta_text or req.finished:
                frame: Dict[str, Any] = {
                    "rid": req.rid,
                    "token_ids": [int(t) for t in new_toks],
                    "text_delta": delta_text,
                    "finished": req.finished,
                }
                sent_tokens += len(new_toks)
                sent_text += delta_text
                if req.finished:
                    frame["meta"] = {
                        "prompt_tokens": len(req.input_ids),
                        "completion_tokens": len(req.output_ids),
                        "finish_reason": str(req.finish_reason.value),
                        "cached_tokens": req.cached_prefix_len,
                    }
                yield frame
            if req.finished:
                break
            if not new_toks and not delta_text:
                import time

                time.sleep(0.001)  # another stream's step owns the engine


def make_channel_stubs(address: str):
    """Client-side helper (test + gateway use): returns callables
    (generate_stream, health, abort) speaking the JSON codec."""
    import grpc

    channel = grpc.insecure_channel(address)
    gen = channel.unary_stream(
        f"/{SERVICE}/Generate",
        request_serializer=_ser,
        response_deserializer=_de,
    )
    health = channel.unary_unary(
        f"/{SERVICE}/HealthCheck",
        request_serializer=_ser,
        response_deserializer=_de,
    )
    abort = channel.unary_unary(
        f"/{SERVICE}/Abort",
        request_serializer=_ser,
        response_deserializer=_de,
    )
    return gen, health, abort
