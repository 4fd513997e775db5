"""DiffGenerator: the offline diffusion SDK.

Reference analog: multimodal_gen/runtime/entrypoints/diffusion_generator.py:58
(DiffGenerator.from_pretrained / generate). Single-controller: no server
spawn needed for offline use — the pipeline runs in-process; the HTTP
Images API wraps this same object (server-side analog of the reference's
local-server indirection).
"""

from __future__ import annotations

import time
from dataclasses import asdict
from typing import Any, Dict, List, Optional

import numpy as np

from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
from sglang_diffusion_tpu.diffusion.models.text_encoder import TextEncoderConfig
from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig
from sglang_diffusion_tpu.diffusion.pipeline import (
    DiffusionPipeline,
    GenerationParams,
)
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("diff_generator")


class DiffGenerator:
    def __init__(self, pipeline: DiffusionPipeline):
        self.pipeline = pipeline

    @classmethod
    def from_config(
        cls,
        dit_cfg: Optional[DiTConfig] = None,
        vae_cfg: Optional[VAEConfig] = None,
        te_cfg: Optional[TextEncoderConfig] = None,
        **kw,
    ) -> "DiffGenerator":
        return cls(DiffusionPipeline(dit_cfg, vae_cfg, te_cfg, **kw))

    @classmethod
    def from_pretrained(cls, model_path: str, **kw) -> "DiffGenerator":
        """Load a saved pipeline directory (diffusion/loader.py layout:
        model_index.json + per-component config.json/model.safetensors)."""
        from sglang_diffusion_tpu.diffusion.loader import load_pipeline

        return cls(load_pipeline(model_path, **kw))

    def save_pretrained(self, path: str) -> None:
        from sglang_diffusion_tpu.diffusion.loader import save_pipeline

        save_pipeline(self.pipeline, path)

    def generate(
        self,
        prompt,
        negative_prompt: str = "",
        height: int = 256,
        width: int = 256,
        num_inference_steps: int = 20,
        guidance_scale: float = 1.0,
        seed: int = 0,
        num_images: int = 1,
        num_frames: int = 0,
        image=None,
        strength: float = 0.6,
        sampler: str = "euler",
        causal_chunk_frames: int = 0,  # >0: streaming/AR chunked video
        dmd_steps=None,  # DMD distilled few-step denoising (turbo-Wan)
    ) -> Dict[str, Any]:
        gp = GenerationParams(
            prompt=prompt,
            negative_prompt=negative_prompt,
            height=height,
            width=width,
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            seed=seed,
            num_images=num_images,
            num_frames=num_frames,
            image=image,
            strength=strength,
            sampler=sampler,
            dmd_steps=dmd_steps,
        )
        t0 = time.perf_counter()
        if num_frames > 0 and causal_chunk_frames > 0:
            return self._generate_causal(gp, causal_chunk_frames, t0)
        batch = self.pipeline.forward(gp)
        elapsed = time.perf_counter() - t0
        denoise_t = batch.stage_timings.get("denoising", 0.0)
        meta_params = asdict(gp)
        if meta_params.get("image") is not None:
            meta_params["image"] = "<conditioning image>"  # keep JSON-safe
        out: Dict[str, Any] = {
            "meta_info": {
                "e2e_s": elapsed,
                "stage_timings": dict(batch.stage_timings),
                "avg_denoise_step_ms": 1000.0
                * denoise_t
                / max(1, gp.num_inference_steps),
                "params": meta_params,
            },
        }
        if num_frames > 0:
            out["frames"] = batch.images  # [B, F, H, W, 3] uint8
        else:
            out["images"] = batch.images  # [B, H, W, 3] uint8
        return out

    def _generate_causal(self, gp: GenerationParams, chunk: int,
                         t0: float) -> Dict[str, Any]:
        """Causal / streaming video (reference analog: self-forcing
        causal_denoising.py + causal Wan pipelines): frames are generated in
        temporal chunks; each chunk is conditioned on the previous chunk's
        last decoded frame (image-to-video chaining), so video length is
        unbounded by the per-call frame window and chunks can stream out as
        they finish."""
        import dataclasses

        total = gp.num_frames
        frames_out = []
        cond_img = gp.image
        done = 0
        chunk_idx = 0
        while done < total:
            n = min(chunk, total - done)
            cgp = dataclasses.replace(
                gp, num_frames=n, image=cond_img,
                seed=gp.seed + chunk_idx,
                # conditioned chunks re-noise from the context frame
                strength=gp.strength if cond_img is not None else 1.0,
            )
            batch = self.pipeline.forward(cgp)
            frames_out.append(batch.images)  # [B, n, H, W, 3]
            cond_img = batch.images[0, -1]  # last decoded frame conditions next
            done += n
            chunk_idx += 1
        import numpy as _np

        frames = _np.concatenate(frames_out, axis=1)
        elapsed = time.perf_counter() - t0
        return {
            "frames": frames,
            "meta_info": {
                "e2e_s": elapsed,
                "causal_chunks": chunk_idx,
                "params": {
                    **{k: v for k, v in asdict(gp).items() if k != "image"},
                    "causal_chunk_frames": chunk,
                },
            },
        }

    @staticmethod
    def save_video(frames, path: str, fps: int = 8) -> None:
        """Save [F, H, W, 3] uint8 frames (gif/webp via PIL; the reference
        writes mp4/webp, multimodal_gen/runtime/postprocess)."""
        from PIL import Image

        imgs = [Image.fromarray(f) for f in frames]
        imgs[0].save(
            path,
            save_all=True,
            append_images=imgs[1:],
            duration=int(1000 / fps),
            loop=0,
        )
