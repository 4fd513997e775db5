"""Qwen-Image text-to-image pipeline.

Reference analog: multimodal_gen/runtime/pipelines/qwen_image.py
(QwenImagePipeline: Qwen2.5-VL text encoding -> flow-match timesteps ->
packed-latent prep -> denoise with true CFG -> VAE decode). The TPU
build reuses DiffusionPipeline's compiled lax.scan denoise loop via the
model-family hooks (same pattern as FluxPipeline/WanVideoPipeline); the
conditioning trunk is the causal Llama-style encoder
(text_encoder_type="llama", the closest in-tree analog of Qwen2.5-VL's
text tower)."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
from sglang_diffusion_tpu.diffusion.models.qwen_image import (
    QwenImageConfig,
    QwenImageDiT,
)
from sglang_diffusion_tpu.diffusion.pipeline import DiffusionPipeline


def tiny_qwen_image_config() -> QwenImageConfig:
    """Test-scale Qwen-Image shape (CI: CPU devices)."""
    return QwenImageConfig(
        in_channels=16, out_channels=4, num_layers=2,
        attention_head_dim=16, num_attention_heads=4,
        joint_attention_dim=64, axes_dims_rope=(4, 6, 6),
    )


class QwenImagePipeline(DiffusionPipeline):
    """Qwen-Image family pipeline: double-stream MMDiT over packed 2x2
    latent patches, sequence-only text conditioning, true CFG."""

    def __init__(self, qwen_cfg: Optional[QwenImageConfig] = None, **kw):
        self.qwen_cfg = qwen_cfg or QwenImageConfig()
        q = self.qwen_cfg
        view = DiTConfig(
            in_channels=q.out_channels,
            patch_size=q.patch_size,
            hidden_size=q.dim,
            depth=q.num_layers,
            num_heads=q.num_attention_heads,
            text_dim=q.joint_attention_dim,
        )
        kw.setdefault("text_encoder_type", "llama")
        super().__init__(dit_cfg=view, **kw)

    # ---- family hooks ----
    def _init_dit_params(self, key, dtype):
        return QwenImageDiT.init_params(key, self.qwen_cfg, dtype)

    def _make_dit_forward(self, attn_fn):
        return QwenImageDiT.make_forward(self.qwen_cfg, attn_fn=attn_fn)

    def _make_forward_parts(self, attn_fn, front_blocks: int):
        return QwenImageDiT.make_forward_parts(
            self.qwen_cfg, attn_fn=attn_fn, front_blocks=front_blocks)

    def _cond_signal(self, dit_params, t):
        from sglang_diffusion_tpu.diffusion.models.dit import (
            timestep_embedding,
        )

        te = timestep_embedding(t[:1], 256)
        h = jax.nn.silu(
            jnp.dot(te, dit_params["time_w1"].astype(jnp.float32))
            + dit_params["time_b1"].astype(jnp.float32))
        h = jnp.dot(h, dit_params["time_w2"].astype(jnp.float32)) + (
            dit_params["time_b2"].astype(jnp.float32))
        return h[0]

    def _cond_dim(self, dit_params) -> int:
        return dit_params["time_w2"].shape[-1]

    def _stream_len(self, t_txt: int, t_img: int) -> int:
        return t_txt + t_img
