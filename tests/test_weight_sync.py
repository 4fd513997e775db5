"""Bucketed weight synchronization (reference analog:
srt/weight_sync/tensor_bucket.py + RL weight-update transports)."""

import asyncio
import base64
import json

import numpy as np
import pytest

from sglang_diffusion_tpu.engine.weight_sync import FlattenedTensorBucket


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    named = {
        "a/b": rng.standard_normal((3, 4)).astype(np.float32),
        "c": rng.standard_normal((5,)).astype(np.float32),
        "d/e/f": rng.standard_normal((2, 2, 2)).astype(np.float32),
    }
    bucket = FlattenedTensorBucket.pack(named)
    assert bucket.flat.shape == (12 + 5 + 8,)
    out = bucket.unpack()
    for k in named:
        np.testing.assert_array_equal(out[k], named[k])
    # wire roundtrip
    blob, metas = bucket.to_wire()
    b2 = FlattenedTensorBucket.from_wire(blob, metas)
    out2 = b2.unpack()
    for k in named:
        np.testing.assert_array_equal(out2[k], named[k])


def test_engine_bucket_update_changes_output():
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
        disable_radix_cache=True,
    )
    eng = Engine(server_args=args, model_config=ModelConfig.tiny_llama(),
                 tokenizer=ByteTokenizer())
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    before = eng.generate("bucket test", sp)["output_ids"]
    rng = np.random.default_rng(1)
    new_embed = rng.standard_normal((512, 64)).astype(np.float32) * 0.05
    bucket = FlattenedTensorBucket.pack({"embed": new_embed})
    blob, metas = bucket.to_wire()
    out = eng.update_weights_from_bucket(blob, metas)
    assert out["success"], out
    after = eng.generate("bucket test", sp)["output_ids"]
    assert before != after


def test_http_bucket_route():
    from tests.test_http_server import http_request, make_server

    server = make_server()

    async def scenario():
        await server.start()
        port = server.http.port
        emb = np.zeros((512, 64), np.float32)
        bucket = FlattenedTensorBucket.pack({"embed": emb})
        blob, metas = bucket.to_wire()
        st, _, data = await http_request(
            port, "POST", "/update_weights_from_bucket",
            {"metas": metas, "blob_b64": base64.b64encode(blob).decode()},
        )
        assert st == 200 and json.loads(data)["success"]
        # bad metas -> 400
        st, _, _ = await http_request(
            port, "POST", "/update_weights_from_bucket",
            {"metas": [{"name": "nope/x", "shape": [1], "dtype": "float32",
                        "offset": 0, "numel": 1}],
             "blob_b64": base64.b64encode(b"\x00" * 4).decode()},
        )
        assert st == 400
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))
