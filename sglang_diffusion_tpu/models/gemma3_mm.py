"""Gemma3 multimodal (Gemma3ForConditionalGeneration).

Reference analog: srt/models/gemma3_mm.py — SigLIP vision tower ->
Gemma3MultiModalProjector (4x4 average pool over the patch grid,
Gemma RMS norm, shared projection matmul) -> image embeddings injected
at <image_soft_token> positions of the Gemma3 text model. The language
half is the shared functional LlamaFamily step (gemma_style norms,
sandwich norms, alternating local/global rope) — only image prefills run
the mm-injected forward (same integration pattern as models/llava.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.models.vision import (
    init_siglip_params,
    make_siglip_forward,
    siglip_hf_weight_map,
)


@register_model("Gemma3ForConditionalGeneration")
class Gemma3MMFamily:
    """Params: language under "language", SigLIP under "vision",
    projector = {"proj": [Ve, E], "norm": [Ve]}."""

    supports_eagle = False
    is_multimodal = True
    mm_tiled = "pan_and_scan"  # engine picks the multi-view preprocessor

    @staticmethod
    def _mm_tokens(cfg: ModelConfig) -> int:
        return int((cfg.raw or {}).get("mm_tokens_per_image", 256))

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        k_lang, k_vis, k1 = jax.random.split(rng, 3)
        ve = cfg.vision.hidden_size
        e = cfg.hidden_size
        return {
            "language": LlamaFamily.init_params(k_lang, cfg, dtype),
            "vision": init_siglip_params(k_vis, cfg.vision, dtype),
            "projector": {
                "proj": (jax.random.normal(k1, (ve, e), jnp.float32)
                         * 0.02).astype(dtype),
                "norm": jnp.ones((ve,), dtype),
            },
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        vspecs = jax.tree.map(
            lambda _: P(),
            init_siglip_params(jax.random.PRNGKey(0), cfg.vision),
            is_leaf=lambda x: not isinstance(x, dict),
        )
        return {
            "language": LlamaFamily.partition_specs(cfg),
            "vision": vspecs,
            "projector": {"proj": P(None, "tp"), "norm": P(None)},
        }

    # ------------- vision encode (runs once per image) -------------
    @staticmethod
    def make_encode_images(cfg: ModelConfig) -> Callable:
        """encode(params, pixel_values [N,3,H,W]) -> [N, mm_tokens, E]."""
        vis_fwd = make_siglip_forward(cfg.vision)
        v = cfg.vision
        grid = v.image_size // v.patch_size
        import math

        tokens_side = int(math.isqrt(Gemma3MMFamily._mm_tokens(cfg)))
        kernel = grid // tokens_side
        eps = v.layer_norm_eps

        def encode(params, pixel_values):
            feats = vis_fwd(params["vision"], pixel_values)  # [N, g*g, Ve]
            n, t, ve = feats.shape
            # 4x4 avg pool over the patch grid (Gemma3MultiModalProjector)
            x = feats.reshape(n, grid, grid, ve)
            x = x.reshape(n, tokens_side, kernel, tokens_side, kernel, ve)
            x = x.mean(axis=(2, 4)).reshape(n, tokens_side * tokens_side, ve)
            # Gemma RMS norm: scale by (1 + w), f32 accumulation
            xf = x.astype(jnp.float32)
            nrm = xf * jax.lax.rsqrt(
                jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps)
            w = params["projector"]["norm"].astype(jnp.float32)
            x = (nrm * (1.0 + w)).astype(feats.dtype)
            return x @ params["projector"]["proj"]

        return encode

    # ------------- language forward with mm injection -------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", use_lora: bool = False):
        lm_fwd = LlamaFamily.make_forward(cfg, attn_fn, logits_mode,
                                          use_lora)
        layer_body = LlamaFamily.make_layer_body(cfg, attn_fn)
        embed, head = LlamaFamily.make_embed_and_head(cfg)

        def forward(params, input_ids, positions, kv_cache, meta,
                    lora_tree=None, lora_ids=None,
                    mm_embeds=None, mm_mask=None):
            lang = params["language"]
            if mm_embeds is None:
                return lm_fwd(lang, input_ids, positions, kv_cache, meta,
                              lora_tree, lora_ids)
            hidden = embed(lang, input_ids)
            hidden = jnp.where(
                mm_mask[..., None], mm_embeds.astype(hidden.dtype), hidden
            )

            def body(l, carry):
                h, kv = carry
                return layer_body(l, h, kv, lang["layers"], positions, meta)

            hidden, new_kv = jax.lax.fori_loop(
                0, cfg.num_hidden_layers, body, (hidden, kv_cache)
            )
            b = hidden.shape[0]
            if logits_mode == "last":
                hidden = hidden[jnp.arange(b), meta.logit_idx]
            return head(lang, hidden), new_kv

        return forward

    # ------------- HF checkpoint mapping -------------
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        m: Dict[Any, Any] = {}
        for path, (tmpl, tf) in LlamaFamily.hf_weight_map(cfg).items():
            if tmpl == "lm_head.weight":
                m[("language",) + path] = (tmpl, tf)
            else:
                assert tmpl.startswith("model.")
                m[("language",) + path] = (
                    "model.language_model." + tmpl[len("model."):], tf,
                )
        for path, (tmpl, tf) in siglip_hf_weight_map().items():
            m[path] = ("model." + tmpl, tf)
        m[("projector", "proj")] = (
            "model.multi_modal_projector.mm_input_projection_weight", None)
        m[("projector", "norm")] = (
            "model.multi_modal_projector.mm_soft_emb_norm.weight", None)
        return m
