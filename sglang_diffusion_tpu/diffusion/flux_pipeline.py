"""Flux text-to-image pipeline.

Reference analog: multimodal_gen/runtime/pipelines/flux.py (stage
composition: CLIP pooled + T5 sequence encoding -> flow-match timesteps
-> packed-latent prep -> denoise with distilled guidance embedding ->
VAE decode) over the FluxTransformer2DModel component set. The TPU build
reuses DiffusionPipeline's compiled lax.scan denoise loop and swaps the
model family via hook methods (like WanVideoPipeline).

Flux-dev is guidance-distilled: the requested guidance_scale enters the
model through the guidance embedder instead of CFG batch doubling
(reference flux.py:838-888 forward(guidance=...)). Schnell-style configs
(guidance_embeds=False) fall back to ordinary CFG.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
from sglang_diffusion_tpu.diffusion.models.flux import FluxConfig, FluxDiT
from sglang_diffusion_tpu.diffusion.models.text_encoder import (
    TextEncoder,
    TextEncoderConfig,
)
from sglang_diffusion_tpu.diffusion.pipeline import (
    DiffusionPipeline,
    _select_dit_attention,
)


def tiny_flux_config() -> FluxConfig:
    """Test-scale Flux shape (CI: CPU devices)."""
    return FluxConfig(
        in_channels=16, num_layers=2, num_single_layers=2,
        attention_head_dim=16, num_attention_heads=4,
        joint_attention_dim=64, pooled_projection_dim=32,
        guidance_embeds=True, axes_dims_rope=(4, 6, 6),
    )


class FluxPipeline(DiffusionPipeline):
    """Flux family pipeline: double+single-stream DiT over packed 2x2
    latent patches, T5 sequence + CLIP pooled conditioning."""

    def __init__(self, flux_cfg: Optional[FluxConfig] = None,
                 clip_cfg: Optional[TextEncoderConfig] = None, **kw):
        self.flux_cfg = flux_cfg or FluxConfig()
        f = self.flux_cfg
        # latent-space view for the generic pipeline: the VAE latent has
        # in_channels/4 channels; patchify(p=2) packs 2x2 into in_channels
        lat_ch = f.in_channels // 4
        view = DiTConfig(
            in_channels=lat_ch,
            patch_size=2,
            hidden_size=f.dim,
            depth=f.num_layers,
            num_heads=f.num_attention_heads,
            text_dim=f.joint_attention_dim,
        )
        self.clip_cfg = clip_cfg or TextEncoderConfig(
            hidden_size=f.pooled_projection_dim, num_layers=2,
            num_heads=max(1, f.pooled_projection_dim // 16),
        )
        self._flux_guidance: Optional[float] = None
        kw.setdefault("text_encoder_type", "t5")
        super().__init__(dit_cfg=view, **kw)
        if "text_encoder_2" not in self.params:
            from sglang_diffusion_tpu.diffusion.models.clip_encoder import (
                CLIPTextConfig,
                CLIPTextEncoder,
            )

            cls = (CLIPTextEncoder
                   if isinstance(self.clip_cfg, CLIPTextConfig)
                   else TextEncoder)
            self.params["text_encoder_2"] = cls.init_params(
                jax.random.PRNGKey(11), self.clip_cfg, jnp.float32
            )
        self._clip_jit = None

    # ---- family hooks ----
    def _init_dit_params(self, key, dtype):
        return FluxDiT.init_params(key, self.flux_cfg, dtype)

    def _make_dit_forward(self, attn_fn):
        return FluxDiT.make_forward(
            self.flux_cfg, attn_fn=attn_fn, guidance=self._flux_guidance)

    def _make_forward_parts(self, attn_fn, front_blocks: int):
        return FluxDiT.make_forward_parts(
            self.flux_cfg, attn_fn=attn_fn, front_blocks=front_blocks,
            guidance=self._flux_guidance)

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
        # joint [txt; img] stream; text_emb row 0 (pooled) is not a token
        return t_txt - 1 + t_img

    # ---- conditioning: T5 sequence + CLIP pooled folded into one tensor
    def text_encode(self, ids: jax.Array):
        """Returns ([B, 1+Tc, joint_dim], None): row 0 = CLIP pooled
        projection zero-padded to joint_dim, rows 1.. = T5 features."""
        seq, _ = super().text_encode(ids)
        if self._clip_jit is None:
            from sglang_diffusion_tpu.diffusion.models.clip_encoder import (
                CLIPTextConfig,
                CLIPTextEncoder,
            )

            # real CLIPTextModel config (diffusers loader) vs CLIP-lite
            cls = (CLIPTextEncoder
                   if isinstance(self.clip_cfg, CLIPTextConfig)
                   else TextEncoder)
            self._clip_jit = jax.jit(
                lambda p, i: cls.apply(p, i, self.clip_cfg)[1]
            )
        clip_ids = ids[:, : self.clip_cfg.max_len] % self.clip_cfg.vocab_size
        pooled = self._clip_jit(self.params["text_encoder_2"], clip_ids)
        pad = seq.shape[-1] - pooled.shape[-1]
        pooled = jnp.pad(pooled, ((0, 0), (0, pad))).astype(seq.dtype)
        return jnp.concatenate([pooled[:, None], seq], axis=1), pooled

    # ---- distilled guidance: requested scale enters the model, not CFG
    def run_denoise(self, latents, text_emb, neg_emb, sigmas, guidance_scale,
                    sampler: str = "euler"):
        if not self.flux_cfg.guidance_embeds:
            return super().run_denoise(
                latents, text_emb, neg_emb, sigmas, guidance_scale, sampler)
        g = float(guidance_scale)
        if g != self._flux_guidance:
            # the guidance value is baked into the forward closure as a
            # traced constant — one recompile per distinct value (the
            # reference treats it as a per-request tensor; serving uses a
            # stable default so this compiles once in practice)
            self._flux_guidance = g
            self.dit_forward = self._make_dit_forward(
                _select_dit_attention(self.dit_cfg, self.sp_mesh,
                                      self.attention_backend))
            self._denoise_jit = None
        return super().run_denoise(
            latents, text_emb, neg_emb, sigmas, 1.0, sampler)


def load_flux_pipeline(path: str, **kw) -> FluxPipeline:
    """Build a FluxPipeline from a diffusers-format checkpoint directory
    (model_index.json + transformer/ + text_encoder(_2)/ + vae/).
    Reference analog: runtime/loader/component_loaders/."""
    from sglang_diffusion_tpu.diffusion.diffusers_loader import (
        load_diffusers_flux,
    )

    return load_diffusers_flux(path, **kw)
