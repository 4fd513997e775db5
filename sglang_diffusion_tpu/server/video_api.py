"""OpenAI Videos API for the diffusion runtime.

Reference analog: multimodal_gen/runtime/entrypoints/openai/video_api.py
(POST /v1/videos/generations; GET /v1/videos/{id} status polling; GET
/v1/videos/{id}/content bytes download — the reference serves mp4; this
dependency-free build serves animated GIF, same polling contract).

Jobs run on a background thread (video generation takes seconds-to-minutes)
and are polled by id, exactly like the reference's async video jobs.
"""

from __future__ import annotations

import asyncio
import io
import time
import uuid
from typing import Any, Dict

from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
from sglang_diffusion_tpu.server.httpd import HTTPServer, Request, Response
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("video_api")


def gif_bytes(frames, fps: int = 8) -> bytes:
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    buf = io.BytesIO()
    imgs[0].save(
        buf, format="GIF", save_all=True, append_images=imgs[1:],
        duration=int(1000 / fps), loop=0,
    )
    return buf.getvalue()


def register_video_routes(http: HTTPServer, generator: DiffGenerator) -> None:
    jobs: Dict[str, Dict[str, Any]] = {}

    def _run_job(job_id: str, kw: Dict[str, Any]) -> None:
        job = jobs[job_id]
        job["status"] = "in_progress"
        try:
            out = generator.generate(**kw)
            job["content"] = gif_bytes(out["frames"][0])
            job["meta_info"] = out["meta_info"]
            job["status"] = "completed"
        except Exception as e:  # noqa: BLE001
            logger.error("video job %s failed: %s", job_id, e)
            job["status"] = "failed"
            job["error"] = str(e)
        job["completed_at"] = int(time.time())

    @http.route("POST", "/v1/videos/generations")
    async def generations(req: Request) -> Response:
        body = req.json()
        size = body.get("size", "64x64")
        try:
            w, h = (int(x) for x in size.lower().split("x"))
        except ValueError:
            return Response({"error": f"bad size {size!r}"}, 400)
        kw = dict(
            prompt=body.get("prompt", ""),
            negative_prompt=body.get("negative_prompt", ""),
            height=h,
            width=w,
            num_frames=int(body.get("num_frames", 8)),
            num_inference_steps=int(body.get("num_inference_steps", 10)),
            guidance_scale=float(body.get("guidance_scale", 1.0)),
            seed=int(body.get("seed", int(time.time()) & 0xFFFF)),
            sampler=body.get("sampler", "unipc"),  # Wan's default scheduler
            causal_chunk_frames=int(body.get("causal_chunk_frames", 0)),
        )
        if kw["num_frames"] < 1:
            return Response({"error": "num_frames must be >= 1"}, 400)
        if kw["sampler"] not in ("euler", "unipc"):
            return Response({"error": f"unknown sampler {kw['sampler']!r}"}, 400)
        if body.get("image"):
            # image-to-video: base64 conditioning image (reference analog:
            # Wan-I2V; the reference accepts input_reference uploads)
            import base64
            import io

            import numpy as _np
            from PIL import Image

            try:
                raw = base64.b64decode(body["image"])
                img = Image.open(io.BytesIO(raw)).convert("RGB")
                img = img.resize((w, h))
                kw["image"] = _np.asarray(img)
            except Exception:
                return Response({"error": "invalid base64 image"}, 400)
        job_id = "video_" + uuid.uuid4().hex[:12]
        public_kw = {k: v for k, v in kw.items() if k != "image"}
        if "image" in kw:
            public_kw["image"] = "<conditioning image>"
        jobs[job_id] = {
            "id": job_id,
            "object": "video.generation",
            "status": "queued",
            "created_at": int(time.time()),
            "params": public_kw,
        }
        loop = asyncio.get_running_loop()
        loop.run_in_executor(None, _run_job, job_id, kw)
        return Response({"id": job_id, "status": "queued",
                         "object": "video.generation"})

    def _public(job: Dict[str, Any]) -> Dict[str, Any]:
        return {k: v for k, v in job.items() if k != "content"}

    @http.prefix_route("GET", "/v1/videos/")
    async def video_status(req: Request) -> Response:
        rest = req.path[len("/v1/videos/"):]
        if rest.endswith("/content"):
            job_id = rest[: -len("/content")]
            job = jobs.get(job_id)
            if job is None:
                return Response({"error": f"unknown video {job_id}"}, 404)
            if job["status"] != "completed":
                return Response(
                    {"error": f"video {job_id} is {job['status']}"}, 400
                )
            return Response(job["content"], content_type="image/gif")
        job = jobs.get(rest)
        if job is None:
            return Response({"error": f"unknown video {rest}"}, 404)
        return Response(_public(job))
