"""OpenAI Images API test (reference analog: multimodal_gen image_api)."""

import asyncio
import base64
import json

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
from sglang_diffusion_tpu.diffusion.models.text_encoder import TextEncoderConfig
from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.server.api_server import ApiServer
from tests.test_http_server import http_request


def test_images_generations_route():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=1024,
        attention_backend="xla",
        context_length=128,
        host="127.0.0.1",
        port=0,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    gen = DiffGenerator.from_config(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=1, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3),
        te_cfg=TextEncoderConfig(hidden_size=64, num_layers=1, num_heads=2),
    )
    server = ApiServer(eng, args, diff_generator=gen)

    async def scenario():
        await server.start()
        port = server.http.port
        st, _, data = await http_request(
            port,
            "POST",
            "/v1/images/generations",
            {"prompt": "a cat", "size": "32x32", "num_inference_steps": 2, "seed": 1},
        )
        assert st == 200, data
        out = json.loads(data)
        assert len(out["data"]) == 1
        png = base64.b64decode(out["data"][0]["b64_json"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        assert "e2e_s" in out["meta_info"]
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))


def test_images_edits_route():
    import io

    import numpy as np
    from PIL import Image

    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=1024,
        attention_backend="xla",
        context_length=128,
        host="127.0.0.1",
        port=0,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    gen = DiffGenerator.from_config(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=1, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3),
        te_cfg=TextEncoderConfig(hidden_size=64, num_layers=1, num_heads=2),
    )
    server = ApiServer(eng, args, diff_generator=gen)

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), dtype=np.uint8)
    ).save(buf, format="PNG")
    img_b64 = base64.b64encode(buf.getvalue()).decode()

    async def scenario():
        await server.start()
        port = server.http.port
        st, _, data = await http_request(
            port,
            "POST",
            "/v1/images/edits",
            {"prompt": "edit", "image": img_b64, "num_inference_steps": 2, "seed": 3},
        )
        assert st == 200, data
        out = json.loads(data)
        png = base64.b64decode(out["data"][0]["b64_json"])
        assert png[:8] == b"\x89PNG\r\n\x1a\n"
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))


def test_videos_api_job_lifecycle():
    """POST /v1/videos/generations -> poll GET /v1/videos/{id} ->
    GET .../content returns a GIF (reference analog: video_api.py polling
    contract)."""
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=1024,
        attention_backend="xla",
        context_length=128,
        host="127.0.0.1",
        port=0,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    gen = DiffGenerator.from_config(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=1, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3),
        te_cfg=TextEncoderConfig(hidden_size=64, num_layers=1, num_heads=2),
    )
    server = ApiServer(eng, args, diff_generator=gen)

    async def scenario():
        await server.start()
        port = server.http.port
        st, _, data = await http_request(
            port, "POST", "/v1/videos/generations",
            {"prompt": "a rotating cube", "size": "32x32", "num_frames": 3,
             "num_inference_steps": 2, "seed": 5},
        )
        assert st == 200, data
        job = json.loads(data)
        vid = job["id"]
        assert job["status"] == "queued"

        # content before completion -> 400
        st, _, data = await http_request(
            port, "GET", f"/v1/videos/{vid}/content", None
        )
        if st == 200:  # may already have completed on a fast machine
            pass
        else:
            assert st == 400, data

        for _ in range(600):
            st, _, data = await http_request(port, "GET", f"/v1/videos/{vid}", None)
            assert st == 200, data
            status = json.loads(data)["status"]
            assert status in ("queued", "in_progress", "completed"), data
            if status == "completed":
                break
            await asyncio.sleep(0.5)
        assert status == "completed"

        st, hdrs, data = await http_request(
            port, "GET", f"/v1/videos/{vid}/content", None
        )
        assert st == 200
        assert data[:6] in (b"GIF87a", b"GIF89a"), data[:16]

        # unknown id -> 404
        st, _, _ = await http_request(port, "GET", "/v1/videos/nope", None)
        assert st == 404
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))
