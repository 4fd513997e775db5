"""/v1/meshes job API (reference analog:
multimodal_gen/runtime/entrypoints/openai/mesh_api.py:41)."""

import asyncio
import base64
import io
import json

import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.diffusion.hunyuan3d import (
    Hunyuan3DConfig,
    Hunyuan3DPipeline,
    ShapeVAEConfig,
)
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.server.api_server import ApiServer
from tests.test_http_server import http_request


def _tiny_pipeline():
    return Hunyuan3DPipeline(
        Hunyuan3DConfig(
            in_channels=8, context_in_dim=16, hidden_size=64, num_heads=4,
            depth=1, depth_single_blocks=1, num_latents=16,
        ),
        ShapeVAEConfig(
            num_latents=16, embed_dim=8, width=64, heads=4,
            num_decoder_layers=1, num_freqs=4,
        ),
        dtype=jnp.float32,
        guidance_scale=1.0,
    )


def test_mesh_generations_job_flow():
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=1024, attention_backend="xla",
        context_length=128, host="127.0.0.1", port=0,
    )
    eng = Engine(server_args=args,
                 model_config=ModelConfig.tiny_llama(vocab_size=512),
                 tokenizer=ByteTokenizer())
    server = ApiServer(eng, args, mesh_pipeline=_tiny_pipeline())

    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.full((32, 32, 3), 128, np.uint8)).save(buf, format="PNG")
    img_b64 = base64.b64encode(buf.getvalue()).decode()

    async def scenario():
        await server.start()
        port = server.http.port
        st, _, data = await http_request(
            port, "POST", "/v1/meshes/generations",
            {"image": img_b64, "num_inference_steps": 2,
             "octree_resolution": 8, "seed": 3, "output_format": "obj"},
        )
        assert st == 200, data
        job = json.loads(data)
        assert job["object"] == "mesh" and job["status"] == "queued"
        jid = job["id"]
        for _ in range(120):
            st, _, data = await http_request(
                port, "GET", f"/v1/meshes/{jid}", None)
            assert st == 200, data
            job = json.loads(data)
            if job["status"] in ("completed", "failed"):
                break
            await asyncio.sleep(0.25)
        assert job["status"] == "completed", job.get("error")
        assert job["meta_info"]["num_vertices"] >= 0
        st, _, data = await http_request(
            port, "GET", f"/v1/meshes/{jid}/content", None)
        assert st == 200
        text = data.decode()
        # OBJ: every vertex/face line well-formed (possibly zero of each
        # with random weights, but the file must parse)
        for line in text.splitlines():
            assert line.startswith(("v ", "f ")) or not line
        # bad format rejected
        st, _, data = await http_request(
            port, "POST", "/v1/meshes/generations",
            {"output_format": "stl"})
        assert st == 400
        # unknown job 404
        st, _, _ = await http_request(
            port, "GET", "/v1/meshes/nope", None)
        assert st == 404
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))
