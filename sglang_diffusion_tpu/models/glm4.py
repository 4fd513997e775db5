"""GLM-4 family.

Reference analog: srt/models/glm4.py / glm4_moe.py. Structure = sandwich
norms (same residual pattern as gemma-2: post-attention and post-MLP norms
on the branch outputs) + partial interleaved rotary (rot_dim = head_dim *
partial_rotary_factor, GLM pairing) + fused gate_up MLP. The functional
forward is LlamaFamily's (sandwich_norms + partial_rotary_factor flags);
only the HF name mapping differs.
"""

from __future__ import annotations

from typing import Any, Dict

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model


@register_model("Glm4ForCausalLM")
class Glm4Family(LlamaFamily):
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        fi = cfg.intermediate_size

        def gate_of(w):  # fused [2F, E] -> [E, F]
            return w[:fi].T

        def up_of(w):
            return w[fi:].T

        lyr = "model.layers.{i}"
        m: Dict[Any, Any] = {
            ("embed",): ("model.embed_tokens.weight", None),
            ("final_norm",): ("model.norm.weight", None),
            ("layers", "input_norm"): (lyr + ".input_layernorm.weight", None),
            # glm4 sandwich: post_self_attn -> our post_norm (branch),
            # post_attention -> our pre_ffw (pre-MLP), post_mlp -> post_ffw
            ("layers", "post_norm"): (
                lyr + ".post_self_attn_layernorm.weight", None),
            ("layers", "pre_ffw_norm"): (
                lyr + ".post_attention_layernorm.weight", None),
            ("layers", "post_ffw_norm"): (
                lyr + ".post_mlp_layernorm.weight", None),
            ("layers", "wq"): (lyr + ".self_attn.q_proj.weight", "t"),
            ("layers", "wk"): (lyr + ".self_attn.k_proj.weight", "t"),
            ("layers", "wv"): (lyr + ".self_attn.v_proj.weight", "t"),
            ("layers", "wo"): (lyr + ".self_attn.o_proj.weight", "t"),
            ("layers", "w_gate"): (lyr + ".mlp.gate_up_proj.weight", gate_of),
            ("layers", "w_up"): (lyr + ".mlp.gate_up_proj.weight", up_of),
            ("layers", "w_down"): (lyr + ".mlp.down_proj.weight", "t"),
        }
        if cfg.attention_bias:
            m[("layers", "bq")] = (lyr + ".self_attn.q_proj.bias", None)
            m[("layers", "bk")] = (lyr + ".self_attn.k_proj.bias", None)
            m[("layers", "bv")] = (lyr + ".self_attn.v_proj.bias", None)
        if not cfg.tie_word_embeddings:
            m[("lm_head",)] = ("lm_head.weight", "t")
        return m
