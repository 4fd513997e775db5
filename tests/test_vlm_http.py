"""Multimodal chat over the OpenAI HTTP API (image_url content parts,
reference analog: srt/entrypoints/openai/serving_chat.py mm handling)."""

import asyncio
import base64
import io
import json

import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.server.api_server import ApiServer
from tests.test_http_server import http_request


def make_vlm_server():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        chunked_prefill_size=64,
        max_prefill_tokens=128,
        attention_backend="xla",
        context_length=512,
        host="127.0.0.1",
        port=0,
        max_new_tokens_default=8,
    )
    cfg = ModelConfig.tiny_llava()
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    return ApiServer(eng, args)


def _png_data_uri(seed=0) -> str:
    from PIL import Image

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 255, size=(30, 30, 3), dtype=np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return "data:image/png;base64," + base64.b64encode(buf.getvalue()).decode()


async def _scenario(server):
    await server.start()
    port = server.http.port

    # chat with an image_url content part
    st, _, data = await http_request(
        port,
        "POST",
        "/v1/chat/completions",
        {
            "model": "default",
            "messages": [
                {
                    "role": "user",
                    "content": [
                        {"type": "text", "text": "what is this? "},
                        {"type": "image_url",
                         "image_url": {"url": _png_data_uri(1)}},
                    ],
                }
            ],
            "max_tokens": 4,
            "temperature": 0,
        },
    )
    out = json.loads(data)
    assert st == 200, data
    assert out["choices"][0]["message"]["role"] == "assistant"
    # 4 image tokens (28/14)^2 got injected into the prompt
    assert out["usage"]["prompt_tokens"] > len("user: what is this? ")

    # native /generate with image_data + <image> marker
    st, _, data = await http_request(
        port,
        "POST",
        "/generate",
        {
            "text": "look <image> ok",
            "image_data": [_png_data_uri(2)],
            "sampling_params": {"max_new_tokens": 3, "temperature": 0.0},
        },
    )
    out = json.loads(data)
    assert st == 200, data
    assert len(out["output_ids"]) == 3

    await server.stop()


def test_vlm_http_chat():
    server = make_vlm_server()
    asyncio.run(asyncio.wait_for(_scenario(server), timeout=300))
