"""Image-to-video generation (reference analog: Wan-I2V pipelines +
/v1/videos input_reference)."""

import asyncio
import base64
import io
import json

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.pipeline import (
    DiffusionPipeline,
    GenerationParams,
)


def _img(seed=0, h=32, w=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 255, size=(h, w, 3), dtype=np.uint8)


def test_i2v_pipeline_conditions_on_image():
    pipe = DiffusionPipeline(dtype=jnp.float32)
    base = dict(prompt="a walk", height=32, width=32, num_frames=3,
                num_inference_steps=3, seed=0)
    a = pipe.forward(GenerationParams(image=_img(1), **base))
    b = pipe.forward(GenerationParams(image=_img(2), **base))
    c = pipe.forward(GenerationParams(image=_img(1), **base))
    assert a.images.shape == (1, 3, 32, 32, 3)
    assert np.array_equal(a.images, c.images)  # deterministic
    assert not np.array_equal(a.images, b.images)  # image matters


def test_i2v_http_route():
    from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
    from sglang_diffusion_tpu.server.httpd import HTTPServer
    from sglang_diffusion_tpu.server.video_api import register_video_routes
    from tests.test_http_server import http_request
    from PIL import Image

    gen = DiffGenerator(DiffusionPipeline(dtype=jnp.float32))
    http = HTTPServer("127.0.0.1", 0)
    register_video_routes(http, gen)

    buf = io.BytesIO()
    Image.fromarray(_img(3)).save(buf, format="PNG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    async def scenario():
        await http.start()
        port = http.port
        st, _, data = await http_request(
            port, "POST", "/v1/videos/generations",
            {"prompt": "x", "size": "32x32", "num_frames": 2,
             "num_inference_steps": 2, "image": b64, "sampler": "euler"},
        )
        assert st == 200
        job = json.loads(data)["id"]
        for _ in range(240):
            st, _, data = await http_request(port, "GET", f"/v1/videos/{job}")
            d = json.loads(data)
            if d["status"] in ("completed", "failed"):
                break
            await asyncio.sleep(0.5)
        assert d["status"] == "completed", d
        st, hdr, content = await http_request(
            port, "GET", f"/v1/videos/{job}/content"
        )
        assert st == 200 and len(content) > 100
        await http.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))


def test_causal_chunked_video():
    """Streaming/AR chunked video (reference analog: causal_denoising.py):
    total frames assembled from conditioned chunks; deterministic."""
    from sglang_diffusion_tpu.diffusion.generator import DiffGenerator

    gen = DiffGenerator(DiffusionPipeline(dtype=jnp.float32))
    out = gen.generate("walk", height=32, width=32, num_frames=5,
                       num_inference_steps=2, causal_chunk_frames=2, seed=0)
    assert out["frames"].shape == (1, 5, 32, 32, 3)
    assert out["meta_info"]["causal_chunks"] == 3
    out2 = gen.generate("walk", height=32, width=32, num_frames=5,
                        num_inference_steps=2, causal_chunk_frames=2, seed=0)
    np.testing.assert_array_equal(out["frames"], out2["frames"])
    # chunking changes the result vs one-shot (different conditioning path)
    one = gen.generate("walk", height=32, width=32, num_frames=5,
                       num_inference_steps=2, seed=0)
    assert not np.array_equal(out["frames"], one["frames"])
