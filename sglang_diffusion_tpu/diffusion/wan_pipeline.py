"""Wan2.x text-to-video / image-to-video pipeline.

Reference analog: multimodal_gen/runtime/pipelines/wan_pipeline.py:45-49
(stage composition: UMT5 text encoding -> flow-match timesteps -> latent
prep -> denoise -> VAE decode) with the WanVideoConfig component set.
The TPU build reuses DiffusionPipeline's compiled lax.scan denoise loop
and swaps the model family via the hook methods."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.dit import (
    DiTConfig,
    timestep_embedding,
)
from sglang_diffusion_tpu.diffusion.models.wan import WanConfig, WanDiT
from sglang_diffusion_tpu.diffusion.pipeline import DiffusionPipeline


def tiny_wan_config() -> WanConfig:
    """Test-scale Wan shape (CI: CPU devices)."""
    return WanConfig(
        dim=64, ffn_dim=128, num_heads=4, num_layers=2,
        in_channels=4, out_channels=4, text_dim=64, freq_dim=32,
    )


class WanVideoPipeline(DiffusionPipeline):
    """Wan family pipeline: cross-attention DiT over video tokens, UMT5
    text conditioning, UniPC default sampler (the reference Wan default,
    configs/sample — per-request GenerationParams.sampler still wins)."""

    def __init__(self, wan_cfg: Optional[WanConfig] = None, **kw):
        self.wan_cfg = wan_cfg or WanConfig()
        w = self.wan_cfg
        # DiTConfig view for the base pipeline's generic paths (spatial
        # patch size, latent channels, text dim, attention head dim)
        view = DiTConfig(
            in_channels=w.in_channels,
            patch_size=w.patch_size[1],
            hidden_size=w.dim,
            depth=w.num_layers,
            num_heads=w.num_heads,
            text_dim=w.text_dim,
            rope_theta=w.rope_theta,
        )
        kw.setdefault("text_encoder_type", "t5")
        super().__init__(dit_cfg=view, **kw)

    # ---- family hooks ----
    def _init_dit_params(self, key, dtype):
        return WanDiT.init_params(key, self.wan_cfg, dtype)

    def _make_dit_forward(self, attn_fn):
        return WanDiT.make_forward(self.wan_cfg, attn_fn=attn_fn)

    def _make_forward_parts(self, attn_fn, front_blocks: int):
        return WanDiT.make_forward_parts(self.wan_cfg, attn_fn=attn_fn,
                                         front_blocks=front_blocks)

    def _cond_signal(self, dit_params, t):
        te = timestep_embedding(t[:1], self.wan_cfg.freq_dim)
        h = jax.nn.silu(
            jnp.dot(te, dit_params["time_w1"].astype(jnp.float32))
            + dit_params["time_b1"].astype(jnp.float32))
        h = jnp.dot(h, dit_params["time_w2"].astype(jnp.float32)) + (
            dit_params["time_b2"].astype(jnp.float32))
        return h[0]

    def _cond_dim(self, dit_params) -> int:
        return dit_params["time_w2"].shape[-1]

    def _stream_len(self, t_txt: int, t_img: int) -> int:
        return t_img  # text enters via cross-attention only


def load_wan_pipeline(path: str, **kw) -> WanVideoPipeline:
    """Build a WanVideoPipeline from a diffusers-format checkpoint
    directory (model_index.json + transformer/ + text_encoder/ + vae/).
    Reference analog: runtime/loader/ component loaders."""
    from sglang_diffusion_tpu.diffusion.diffusers_loader import (
        load_diffusers_wan,
    )

    return load_diffusers_wan(path, **kw)
