"""gRPC serving endpoint (reference analog: srt/entrypoints/grpc_server.py
+ grpc_request_manager — the gateway-facing token-level RPC)."""

import threading

import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.server.grpc_server import GrpcServer, make_channel_stubs


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


def test_health(server):
    _, health, _ = make_channel_stubs(f"127.0.0.1:{server.port}")
    assert health({})["status"] == "ok"


def test_generate_stream(server):
    gen, _, _ = make_channel_stubs(f"127.0.0.1:{server.port}")
    frames = list(gen({
        "text": "hello grpc",
        "sampling_params": {"max_new_tokens": 6, "temperature": 0.0},
    }))
    assert frames[-1]["finished"]
    toks = [t for f in frames for t in f["token_ids"]]
    assert len(toks) == 6
    meta = frames[-1]["meta"]
    assert meta["completion_tokens"] == 6
    assert meta["prompt_tokens"] == len("hello grpc") + 1
    text = "".join(f["text_delta"] for f in frames)
    assert isinstance(text, str)


def test_generate_matches_http_engine(server):
    """Token-level parity with the in-process engine API."""
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    gen, _, _ = make_channel_stubs(f"127.0.0.1:{server.port}")
    frames = list(gen({
        "text": "determinism",
        "sampling_params": {"max_new_tokens": 8, "temperature": 0.0},
    }))
    grpc_toks = [t for f in frames for t in f["token_ids"]]
    ref = server.engine.generate(
        "determinism", SamplingParams(temperature=0.0, max_new_tokens=8)
    )
    assert grpc_toks == ref["output_ids"]


def test_concurrent_streams(server):
    gen, _, _ = make_channel_stubs(f"127.0.0.1:{server.port}")
    results = {}

    def run(i):
        frames = list(gen({
            "text": f"concurrent {i}",
            "sampling_params": {"max_new_tokens": 5, "temperature": 0.0},
        }))
        results[i] = [t for f in frames for t in f["token_ids"]]

    threads = [threading.Thread(target=run, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert len(results) == 4
    assert all(len(v) == 5 for v in results.values())
