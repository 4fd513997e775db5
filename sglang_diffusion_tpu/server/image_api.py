"""OpenAI Images API for the diffusion runtime.

Reference analog: multimodal_gen/runtime/entrypoints/openai/image_api.py
(POST /v1/images/generations, /v1/images/edits) and http_server.py:214-223.
Round 1: generations with b64_json response format; edits/videos follow
with the model-family pipelines.
"""

from __future__ import annotations

import base64
import io
import time
from typing import Any, Dict

import numpy as np

from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
from sglang_diffusion_tpu.server.httpd import HTTPServer, Request, Response
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("image_api")


def png_b64(img: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode()


def register_image_routes(http: HTTPServer, generator: DiffGenerator) -> None:
    @http.route("POST", "/v1/images/generations")
    async def generations(req: Request) -> Response:
        body = req.json()
        prompt = body.get("prompt", "")
        n = int(body.get("n", 1))
        size = body.get("size", "256x256")
        try:
            w, h = (int(x) for x in size.lower().split("x"))
        except ValueError:
            return Response({"error": f"bad size {size!r}"}, 400)
        steps = int(body.get("num_inference_steps", 20))
        guidance = float(body.get("guidance_scale", 1.0))
        seed = int(body.get("seed", int(time.time()) & 0xFFFF))
        sampler = body.get("sampler", "euler")
        if sampler not in ("euler", "unipc"):
            return Response({"error": f"unknown sampler {sampler!r}"}, 400)

        import asyncio

        out = await asyncio.get_running_loop().run_in_executor(
            None,
            lambda: generator.generate(
                prompt,
                height=h,
                width=w,
                num_inference_steps=steps,
                guidance_scale=guidance,
                seed=seed,
                num_images=n,
                sampler=sampler,
            ),
        )
        data = [{"b64_json": png_b64(img)} for img in out["images"]]
        return Response(
            {
                "created": int(time.time()),
                "data": data,
                "meta_info": out["meta_info"],
            }
        )

    @http.route("POST", "/v1/images/edits")
    async def edits(req: Request) -> Response:
        """Image-to-image (JSON body with base64 "image"; the reference
        accepts multipart — JSON keeps the dependency-free server simple)."""
        import io

        from PIL import Image

        body = req.json()
        b64_img = body.get("image", "")
        try:
            raw = base64.b64decode(b64_img)
            img = np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))
        except Exception:
            return Response({"error": "invalid base64 image"}, 400)
        prompt = body.get("prompt", "")
        size = body.get("size")
        if size:
            w, h = (int(x) for x in size.lower().split("x"))
        else:
            h, w = img.shape[0], img.shape[1]
        steps = int(body.get("num_inference_steps", 20))
        strength = float(body.get("strength", 0.6))
        seed = int(body.get("seed", int(time.time()) & 0xFFFF))

        import asyncio

        out = await asyncio.get_running_loop().run_in_executor(
            None,
            lambda: generator.generate(
                prompt,
                height=h,
                width=w,
                num_inference_steps=steps,
                seed=seed,
                image=img,
                strength=strength,
            ),
        )
        data = [{"b64_json": png_b64(im)} for im in out["images"]]
        return Response({"created": int(time.time()), "data": data})

    @http.route("GET", "/v1/loras")
    async def list_loras(_req: Request) -> Response:
        return Response({"data": generator.pipeline.lora.list()})

    @http.route("POST", "/v1/loras")
    async def manage_lora(req: Request) -> Response:
        """LoRA control requests (reference analog: the diffusion runtime's
        merge/unmerge/set control reqs). Body:
        {action: load|unload|set_scale, name, path (npz with X.A/X.B keys),
        scale}."""
        body = req.json()
        action = body.get("action", "load")
        name = body.get("name", "")
        ctl = generator.pipeline.lora
        if action == "unload":
            return Response({"ok": ctl.unload(name)})
        if action == "set_scale":
            return Response({"ok": ctl.set_scale(name,
                                                 float(body.get("scale", 1.0)))})
        path = body.get("path", "")
        try:
            flat = {}
            data = np.load(path)
            for key in data.files:
                if key.endswith(".A"):
                    base = key[:-2]
                    flat[base] = (data[base + ".A"], data[base + ".B"])
        except Exception as e:  # noqa: BLE001
            return Response({"error": f"cannot load lora: {e}"}, 400)
        from sglang_diffusion_tpu.diffusion.lora import LoRAAdapter

        ctl.load(LoRAAdapter.from_flat(name, flat,
                                       float(body.get("scale", 1.0))))
        return Response({"ok": True, "tensors": len(flat)})
