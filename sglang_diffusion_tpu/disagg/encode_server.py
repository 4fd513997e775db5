"""Multimodal encoder disaggregation.

Reference analog: srt/disaggregation/encode_server.py + encode_receiver.py
— a separate fleet runs the vision encoder and ships projected embeddings
to the language servers, so ViT FLOPs don't contend with decode steps.

Here: EncodeServer exposes the vision tower over HTTP (embeddings return
base64-packed); the language engine accepts precomputed embeddings via
Engine.generate(image_embeds=...), which skips its own vision tower
entirely. Content hashes travel with the embeddings so radix-prefix
keying stays content-addressed.
"""

from __future__ import annotations

import base64
from typing import Any, Dict, List

import numpy as np

from sglang_diffusion_tpu.server.httpd import HTTPServer, Request, Response
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("encode_server")


class EncodeServer:
    """Standalone vision-encode service over an engine's runner (the engine
    may be vision-only: language weights unused)."""

    def __init__(self, engine, host: str = "127.0.0.1", port: int = 0):
        self.engine = engine
        self.http = HTTPServer(host, port)
        self._register()

    def _register(self) -> None:
        @self.http.route("GET", "/health")
        async def health(_req: Request) -> Response:
            return Response({"status": "ok"})

        @self.http.route("POST", "/encode")
        async def encode(req: Request) -> Response:
            """{image_data: [b64/dataURI...]} ->
            {items: [{embeds_b64, shape, dtype, digest_hex}]}"""
            import asyncio

            body = req.json()
            images = body.get("image_data", [])
            if not isinstance(images, list):
                images = [images]
            loop = asyncio.get_running_loop()
            try:
                items = await loop.run_in_executor(
                    None, lambda: self._encode(images)
                )
            except Exception as e:  # noqa: BLE001
                return Response({"error": str(e)}, 400)
            return Response({"items": items})

    def _encode(self, images: List[Any]) -> List[Dict[str, Any]]:
        eng = self.engine
        out = []
        if getattr(eng.runner.model_cls, "uses_mrope", False):
            from sglang_diffusion_tpu.multimodal.processor import (
                Qwen2VLImageProcessor,
            )

            vc = eng.model_config.raw.get("vision_config", {})
            proc = Qwen2VLImageProcessor(
                patch_size=vc.get("patch_size", 14),
                merge_size=vc.get("spatial_merge_size", 2),
                temporal_patch_size=vc.get("temporal_patch_size", 2),
            )
            for im in images:
                patches, (gh, gw), digest = proc.preprocess(im)
                emb = np.asarray(
                    eng.runner.encode_images_mrope(patches, (gh, gw)),
                    np.float32,
                )
                m = proc.merge_size
                out.append(self._pack(emb, digest,
                                      grid=(gh // m, gw // m)))
        else:
            from sglang_diffusion_tpu.multimodal import ImageProcessor

            v = eng.model_config.vision
            proc = ImageProcessor(v.image_size, v.patch_size)
            for im in images:
                px, digest = proc.preprocess(im)
                emb = np.asarray(
                    eng.runner.encode_images(px[None]), np.float32
                )[0]
                out.append(self._pack(emb, digest))
        return out

    @staticmethod
    def _pack(emb: np.ndarray, digest: bytes, grid=None) -> Dict[str, Any]:
        item = {
            "embeds_b64": base64.b64encode(
                np.ascontiguousarray(emb).tobytes()
            ).decode(),
            "shape": list(emb.shape),
            "dtype": str(emb.dtype),
            "digest_hex": digest.hex(),
        }
        if grid is not None:
            item["grid"] = list(grid)
        return item


def unpack_embed_items(items: List[Dict[str, Any]]):
    """Client-side: wire items -> (embeds [np arrays], digests, grids)."""
    embeds, digests, grids = [], [], []
    for it in items:
        arr = np.frombuffer(
            base64.b64decode(it["embeds_b64"]), np.dtype(it["dtype"])
        ).reshape(it["shape"])
        embeds.append(arr)
        digests.append(bytes.fromhex(it["digest_hex"]))
        grids.append(tuple(it["grid"]) if "grid" in it else None)
    return embeds, digests, grids
