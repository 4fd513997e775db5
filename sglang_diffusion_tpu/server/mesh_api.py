"""OpenAI-style Meshes API (Hunyuan3D image-to-3D).

Reference analog: multimodal_gen/runtime/entrypoints/openai/mesh_api.py:41
(POST /v1/meshes/generations job submit; job store polled by id; the
finished artifact is a mesh file). The reference serves glb via trimesh;
this dependency-free build serves OBJ or ascii PLY (mesh.py exporters),
same job/polling contract as the videos API.
"""

from __future__ import annotations

import asyncio
import base64
import time
import uuid
from typing import Any, Callable, Dict, Optional

import numpy as np

from sglang_diffusion_tpu.server.httpd import HTTPServer, Request, Response
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("mesh_api")

_MIME = {"obj": "text/plain", "ply": "text/plain"}


def default_conditioner(cfg) -> Callable[[np.ndarray], np.ndarray]:
    """Image [H, W, 3] uint8 -> conditioner tokens [1, Tc, context_in_dim]:
    16x16 patch means projected through a fixed seeded matrix. Stands in
    for the reference's DINOv2 conditioner module boundary
    (hy3dshape_conditioner) when no trained encoder is loaded; swap in a
    models/vision.py ViT forward for real checkpoints."""
    rng = np.random.RandomState(0)
    proj = rng.randn(768, cfg.context_in_dim).astype(np.float32) / 28.0

    def encode(img: np.ndarray) -> np.ndarray:
        from PIL import Image

        im = Image.fromarray(img).convert("RGB").resize((224, 224))
        x = np.asarray(im, np.float32) / 127.5 - 1.0
        p = x.reshape(14, 16, 14, 16, 3).transpose(0, 2, 1, 3, 4)
        tokens = p.reshape(196, 16 * 16 * 3)
        # fixed projection 768 -> context dim
        return (tokens @ proj)[None]

    return encode


def register_mesh_routes(
    http: HTTPServer,
    pipeline,
    conditioner: Optional[Callable[[np.ndarray], np.ndarray]] = None,
) -> None:
    """pipeline: diffusion/hunyuan3d.py Hunyuan3DPipeline."""
    jobs: Dict[str, Dict[str, Any]] = {}
    conditioner = conditioner or default_conditioner(pipeline.cfg)

    def _run_job(job_id: str, kw: Dict[str, Any]) -> None:
        import jax.numpy as jnp

        from sglang_diffusion_tpu.diffusion.mesh import export_mesh

        job = jobs[job_id]
        job["status"] = "in_progress"
        try:
            t0 = time.perf_counter()
            img = kw.pop("image", None)
            if img is not None:
                cond = jnp.asarray(conditioner(img))
            else:  # unconditional: seeded random conditioner tokens
                import jax

                cond = jax.random.normal(
                    jax.random.PRNGKey(kw["seed"]),
                    (1, 196, pipeline.cfg.context_in_dim), jnp.float32)
            meshes = pipeline.generate(
                cond.astype(jnp.bfloat16), num_steps=kw["num_steps"],
                resolution=kw["resolution"], seed=kw["seed"],
            )
            verts, faces = meshes[0]
            job["content"] = export_mesh(verts, faces, kw["format"])
            job["meta_info"] = {
                "e2e_s": time.perf_counter() - t0,
                "num_vertices": int(len(verts)),
                "num_faces": int(len(faces)),
            }
            job["status"] = "completed"
        except Exception as e:  # noqa: BLE001
            logger.error("mesh job %s failed: %s", job_id, e)
            job["status"] = "failed"
            job["error"] = str(e)
        job["completed_at"] = int(time.time())

    @http.route("POST", "/v1/meshes/generations")
    async def generations(req: Request) -> Response:
        body = req.json()
        fmt = (body.get("output_format") or "obj").lower()
        if fmt not in _MIME:
            return Response(
                {"error": f"unsupported output_format {fmt!r}; "
                          "have obj/ply"}, 400)
        kw: Dict[str, Any] = dict(
            num_steps=int(body.get("num_inference_steps", 30)),
            resolution=int(body.get("octree_resolution", 64)),
            seed=int(body.get("seed", int(time.time()) & 0xFFFF)),
            format=fmt,
        )
        if body.get("image"):
            try:
                from io import BytesIO

                from PIL import Image

                raw = base64.b64decode(body["image"])
                kw["image"] = np.asarray(
                    Image.open(BytesIO(raw)).convert("RGB"))
            except Exception:
                return Response({"error": "invalid base64 image"}, 400)
        job_id = "mesh_" + uuid.uuid4().hex[:12]
        jobs[job_id] = {
            "id": job_id,
            "object": "mesh",
            "status": "queued",
            "created_at": int(time.time()),
            "format": fmt,
            "params": {k: v for k, v in kw.items() if k != "image"},
        }
        loop = asyncio.get_running_loop()
        loop.run_in_executor(None, _run_job, job_id, kw)
        return Response({"id": job_id, "status": "queued",
                         "object": "mesh"})

    def _public(job: Dict[str, Any]) -> Dict[str, Any]:
        return {k: v for k, v in job.items() if k != "content"}

    @http.prefix_route("GET", "/v1/meshes/")
    async def mesh_status(req: Request) -> Response:
        rest = req.path[len("/v1/meshes/"):]
        if rest.endswith("/content"):
            job_id = rest[: -len("/content")]
            job = jobs.get(job_id)
            if job is None:
                return Response({"error": "no such mesh job"}, 404)
            if job["status"] != "completed":
                return Response(
                    {"error": f"job is {job['status']}"}, 409)
            return Response(
                job["content"], 200,
                content_type=_MIME[job["format"]])
        job = jobs.get(rest)
        if job is None:
            return Response({"error": "no such mesh job"}, 404)
        return Response(_public(job))
