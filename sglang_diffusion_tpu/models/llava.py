"""LLaVA-family vision-language model.

TPU-native re-design of the reference srt/models/llava.py: vision tower
(CLIP ViT) -> 2-layer MLP projector -> image embeddings injected into the
language model's input embedding sequence at the placeholder positions.
The language half is the same functional LlamaFamily step (shared compiled
decode path); only prefill batches that actually contain images run the
mm variant with an embeds-override input (reference analog: ForwardBatch
input_embeds / mm inputs, srt/managers/mm_utils.py).
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
    init_vision_params,
    make_vision_forward,
    vision_hf_weight_map,
    vision_partition_specs,
)


@register_model("LlavaForConditionalGeneration", "LlavaLlamaForCausalLM")
class LlavaFamily:
    """Functional LLaVA: language params under "language", vision tower under
    "vision", projector under "projector"."""

    supports_eagle = False
    is_multimodal = True

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        k_lang, k_vis, k1, k2 = jax.random.split(rng, 4)
        ve = cfg.vision.hidden_size
        e = cfg.hidden_size

        def init(key, shape):
            return (jax.random.normal(key, shape, jnp.float32) * 0.02).astype(dtype)

        return {
            "language": LlamaFamily.init_params(k_lang, cfg, dtype),
            "vision": init_vision_params(k_vis, cfg.vision, dtype),
            "projector": {
                "w1": init(k1, (ve, e)),
                "b1": jnp.zeros((e,), dtype),
                "w2": init(k2, (e, e)),
                "b2": jnp.zeros((e,), dtype),
            },
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        vspecs = vision_partition_specs(cfg.vision)
        return {
            "language": LlamaFamily.partition_specs(cfg),
            "vision": vspecs["vision"] if "vision" in vspecs else vspecs,
            "projector": {
                "w1": P(None, "tp"),
                "b1": P("tp"),
                "w2": P("tp", None),
                "b2": P(None),
            },
        }

    # ---------------- vision encode (runs once per image) ----------------
    @staticmethod
    def make_encode_images(cfg: ModelConfig) -> Callable:
        """encode(params, pixel_values [N,3,H,W]) -> [N, T_img, E_lm]."""
        vis_fwd = make_vision_forward(cfg.vision)

        def encode(params, pixel_values):
            feats = vis_fwd(params["vision"], pixel_values)
            p = params["projector"]
            h = feats @ p["w1"] + p["b1"]
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(
                feats.dtype
            )
            return h @ p["w2"] + p["b2"]

        return encode

    # ---------------- language forward with mm injection ----------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable, logits_mode: str = "last",
                     use_lora: bool = False):
        lm_fwd = LlamaFamily.make_forward(cfg, attn_fn, logits_mode, use_lora)

        def forward(params, input_ids, positions, kv_cache, meta,
                    lora_tree=None, lora_ids=None,
                    mm_embeds=None, mm_mask=None):
            lang = params["language"]
            if mm_embeds is None:
                return lm_fwd(lang, input_ids, positions, kv_cache, meta,
                              lora_tree, lora_ids)
            # inject: token embedding where mask=0, image embedding where 1.
            # Implemented by patching the embed table lookup: we can't splice
            # inside lm_fwd, so rebuild hidden here and run the layer loop
            # via a dedicated forward below.
            return _mm_forward(lang, input_ids, positions, kv_cache, meta,
                               mm_embeds, mm_mask)

        # dedicated mm prefill forward: same layer loop as LlamaFamily but
        # with the input hidden states overridden at image positions
        layer_body = LlamaFamily.make_layer_body(cfg, attn_fn)
        embed, head = LlamaFamily.make_embed_and_head(cfg)

        def _mm_forward(lang, input_ids, positions, kv_cache, meta,
                        mm_embeds, mm_mask):
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
                # select the logit token BEFORE the vocab matmul
                hidden = hidden[jnp.arange(b), meta.logit_idx]
            return head(lang, hidden), new_kv

        return forward

    # ---------------- HF checkpoint mapping ----------------
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        """New-style HF layout (transformers >= 4.52: model.language_model.*,
        model.vision_tower.*, top-level lm_head). Legacy llava-1.5
        checkpoints (language_model.model.*) resolve through the loader's
        alias rewrites (engine/weight_loader.py HF_NAME_ALIASES)."""
        m: Dict[Any, Any] = {}
        for path, (tmpl, tf) in LlamaFamily.hf_weight_map(cfg).items():
            if tmpl == "lm_head.weight":
                m[("language",) + path] = (tmpl, tf)  # stays top-level
            else:
                # "model.layers.{i}..." -> "model.language_model.layers..."
                assert tmpl.startswith("model.")
                m[("language",) + path] = (
                    "model.language_model." + tmpl[len("model."):], tf,
                )
        for path, (tmpl, tf) in vision_hf_weight_map().items():
            m[path] = ("model." + tmpl, tf)
        m[("projector", "w1")] = ("model.multi_modal_projector.linear_1.weight", "t")
        m[("projector", "b1")] = ("model.multi_modal_projector.linear_1.bias", None)
        m[("projector", "w2")] = ("model.multi_modal_projector.linear_2.weight", "t")
        m[("projector", "b2")] = ("model.multi_modal_projector.linear_2.bias", None)
        return m
