"""gRPC serving endpoint (reference analog: srt/entrypoints/grpc_server.py
+ grpc_request_manager — the gateway-facing token-level RPC). Since round
5 the wire is real protobuf (server/proto/sgld_scheduler.proto) mirroring
the reference's sglang_scheduler service surface."""

import threading

import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.server.grpc_server import GrpcServer, make_channel_stubs
from sglang_diffusion_tpu.server.proto import sgld_scheduler_pb2 as pb2


def _gen_req(text, max_new=6, rid=""):
    return pb2.GenerateRequest(
        request_id=rid,
        tokenized=pb2.TokenizedInput(original_text=text),
        sampling_params=pb2.SamplingParams(
            temperature=0.0, max_new_tokens=max_new),
        stream=True,
    )


@pytest.fixture(scope="module")
def server():
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
        host="127.0.0.1",
    )
    eng = Engine(server_args=args, model_config=ModelConfig.tiny_llama(),
                 tokenizer=ByteTokenizer())
    srv = GrpcServer(eng, args)
    srv.start()
    yield srv
    srv.stop()


def test_health_and_model_info(server):
    _, health, _, model_info, loads = make_channel_stubs(
        f"127.0.0.1:{server.port}")
    assert health(pb2.HealthCheckRequest()).healthy
    info = model_info(pb2.GetModelInfoRequest())
    assert info.model_type == "LlamaForCausalLM"
    assert info.vocab_size > 0
    l = loads(pb2.GetLoadsRequest())
    assert len(l.loads) == 1


def test_generate_stream(server):
    gen, *_ = make_channel_stubs(f"127.0.0.1:{server.port}")
    frames = list(gen(_gen_req("hello grpc", 6, rid="req-1")))
    assert frames[-1].WhichOneof("response") == "complete"
    comp = frames[-1].complete
    assert comp.completion_tokens == 6
    assert list(comp.output_ids)
    assert comp.prompt_tokens == len("hello grpc") + 1
    assert frames[-1].request_id == "req-1"
    chunk_toks = [
        t for f in frames if f.WhichOneof("response") == "chunk"
        for t in f.chunk.token_ids
    ]
    # chunks stream a prefix; the final window's tokens arrive with the
    # completion (which always carries the full output)
    assert chunk_toks == list(comp.output_ids)[: len(chunk_toks)]


def test_generate_matches_engine(server):
    """Token-level parity with the in-process engine API; also exercises
    the tokens-in path (pre-tokenized ids)."""
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    gen, *_ = make_channel_stubs(f"127.0.0.1:{server.port}")
    ids = server.engine.tokenizer.encode("determinism")
    req = pb2.GenerateRequest(
        tokenized=pb2.TokenizedInput(input_ids=ids),
        sampling_params=pb2.SamplingParams(
            temperature=0.0, max_new_tokens=8),
    )
    frames = list(gen(req))
    grpc_toks = list(frames[-1].complete.output_ids)
    ref = server.engine.generate(
        input_ids=ids,
        sampling_params=SamplingParams(temperature=0.0, max_new_tokens=8),
    )
    assert grpc_toks == ref["output_ids"]


def test_concurrent_streams(server):
    gen, *_ = make_channel_stubs(f"127.0.0.1:{server.port}")
    results = {}

    def run(i):
        frames = list(gen(_gen_req(f"concurrent {i}", 5)))
        results[i] = list(frames[-1].complete.output_ids)

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 4
    assert all(len(v) == 5 for v in results.values())


def test_embed(server):
    gen, health, abort, model_info, loads = make_channel_stubs(
        f"127.0.0.1:{server.port}")
    import grpc

    channel = grpc.insecure_channel(f"127.0.0.1:{server.port}")
    embed = channel.unary_unary(
        "/sgld.grpc.scheduler.SglangScheduler/Embed",
        request_serializer=pb2.EmbedRequest.SerializeToString,
        response_deserializer=pb2.EmbedResponse.FromString,
    )
    resp = embed(pb2.EmbedRequest(
        request_id="e1",
        tokenized=pb2.TokenizedInput(input_ids=[1, 2, 3, 4])))
    assert resp.WhichOneof("response") == "complete"
    assert len(resp.complete.embedding) > 0
    assert resp.complete.prompt_tokens == 4
