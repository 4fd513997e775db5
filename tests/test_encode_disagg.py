"""Encoder disaggregation: a standalone vision-encode server feeds
precomputed embeddings into the language engine; outputs must be identical
to in-process encoding (reference analog: srt/disaggregation/
encode_server.py + encode_receiver.py)."""

import asyncio
import base64
import io
import json

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.disagg.encode_server import (
    EncodeServer,
    unpack_embed_items,
)
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams
from tests.test_http_server import http_request

IMG_TOK = 500


def _vlm_engine():
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
        random_seed=0,
    )
    return Engine(server_args=args, model_config=ModelConfig.tiny_llava(),
                  tokenizer=ByteTokenizer())


def _png_b64(seed=0):
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(30, 30, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode(), arr


def test_encode_server_roundtrip_matches_local():
    eng = _vlm_engine()  # serves as both encoder and LM (weights shared)
    srv = EncodeServer(eng)
    b64, arr = _png_b64(7)

    async def scenario():
        await srv.http.start()
        port = srv.http.port
        st, _, data = await http_request(port, "POST", "/encode",
                                         {"image_data": [b64]})
        assert st == 200, data
        return json.loads(data)["items"]

    items = asyncio.run(asyncio.wait_for(scenario(), timeout=300))
    embeds, digests, grids = unpack_embed_items(items)
    assert embeds[0].shape == (4, 64)  # 4 image tokens, LM width

    ids = [ord(c) for c in "see "] + [IMG_TOK] + [ord("!")]
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    # path A: local in-process vision encode
    local = eng.generate(input_ids=ids, sampling_params=sp, image_data=arr)
    # path B: precomputed embeddings from the encode server
    pre = eng.generate(
        input_ids=ids, sampling_params=sp,
        image_embeds=[(embeds[0], digests[0], grids[0])],
    )
    assert local["output_ids"] == pre["output_ids"]
    assert local["meta_info"]["prompt_tokens"] == pre["meta_info"]["prompt_tokens"]


def test_encode_server_bad_input():
    eng = _vlm_engine()
    srv = EncodeServer(eng)

    async def scenario():
        await srv.http.start()
        port = srv.http.port
        st, _, data = await http_request(port, "POST", "/encode",
                                         {"image_data": ["!!notbase64!!"]})
        assert st == 400
        st, _, data = await http_request(port, "GET", "/health")
        assert st == 200
        await srv.http.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=120))
