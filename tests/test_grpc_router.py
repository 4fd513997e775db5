"""Gateway gRPC pipeline router (gateway/grpc_router.py): native
tokenization, tokens-in/tokens-out over the protobuf scheduler protocol,
cache-aware LB across two engine workers.

Reference analog: sgl-model-gateway/src/routers/grpc/ e2e.
"""

import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.gateway.grpc_router import GrpcRouter
from sglang_diffusion_tpu.server.grpc_server import GrpcServer


@pytest.fixture(scope="module")
def two_workers():
    servers = []
    for _ in range(2):
        args = ServerArgs(
            model_path="", tokenizer_path="byte", page_size=8,
            max_total_tokens=4096, attention_backend="xla",
            context_length=512, host="127.0.0.1",
        )
        eng = Engine(server_args=args,
                     model_config=ModelConfig.tiny_llama(),
                     tokenizer=ByteTokenizer())
        srv = GrpcServer(eng, args)
        srv.start()
        servers.append(srv)
    yield servers
    for s in servers:
        s.stop()


def test_router_health_and_generate(two_workers):
    router = GrpcRouter(
        [f"127.0.0.1:{s.port}" for s in two_workers], ByteTokenizer(),
        policy="round_robin",
    )
    assert router.health() == [True, True]
    out = router.generate(
        "hello router",
        sampling_params={"max_new_tokens": 6, "temperature": 0.0})
    assert out["meta_info"]["completion_tokens"] == 6
    # router-side detokenization matches worker-side engine output
    ref = two_workers[0].engine.generate(
        "hello router",
        sampling_params={"max_new_tokens": 6, "temperature": 0.0})
    assert out["text"] == ref["text"]


def test_router_round_robin_spreads(two_workers):
    router = GrpcRouter(
        [f"127.0.0.1:{s.port}" for s in two_workers], ByteTokenizer(),
        policy="round_robin",
    )
    used = {
        router.generate(
            f"prompt {i}",
            sampling_params={"max_new_tokens": 2, "temperature": 0.0},
        )["worker"]
        for i in range(4)
    }
    assert used == {0, 1}


def test_router_cache_aware_sticks_to_prefix(two_workers):
    router = GrpcRouter(
        [f"127.0.0.1:{s.port}" for s in two_workers], ByteTokenizer(),
        policy="cache_aware", balance_abs_threshold=1024,
    )
    if router.policy != "cache_aware":
        pytest.skip("ApproxTree native lib unavailable")
    long_prefix = "the quick brown fox jumps over the lazy dog " * 4
    sp = {"max_new_tokens": 2, "temperature": 0.0}
    first = router.generate(long_prefix + "one", sampling_params=sp)
    # repeats sharing the long prefix must route to the same worker
    for suffix in ("two", "three", "four"):
        out = router.generate(long_prefix + suffix, sampling_params=sp)
        assert out["worker"] == first["worker"]
    # an unrelated prompt is free to go elsewhere (most-available tenant)
    other = router.generate("zzz completely different", sampling_params=sp)
    assert other["worker"] != first["worker"]


def test_router_shortest_queue_probe(two_workers):
    router = GrpcRouter(
        [f"127.0.0.1:{s.port}" for s in two_workers], ByteTokenizer(),
        policy="shortest_queue",
    )
    out = router.generate(
        "probe", sampling_params={"max_new_tokens": 2, "temperature": 0.0})
    assert out["meta_info"]["completion_tokens"] == 2
