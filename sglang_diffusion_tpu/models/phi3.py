"""Phi-3 family.

Reference analog: srt/models/phi3.py / phi3_small. Architecture is
llama-shaped, but checkpoints fuse projections: self_attn.qkv_proj holds
[q; k; v] rows and mlp.gate_up_proj holds [gate; up] rows. The family
reuses LlamaFamily's functional forward verbatim — only the HF weight map
differs (callable transforms slice the fused tensors into our separate
stacked leaves). LongRoPE ("longrope" su-scaling) lands with a dedicated
inv_freq table in a later round; standard/linear scaling works today.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model


@register_model("Phi3ForCausalLM")
class Phi3Family(LlamaFamily):
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        hq = cfg.num_attention_heads * cfg.actual_head_dim
        hkv = cfg.num_key_value_heads * cfg.actual_head_dim
        fi = cfg.intermediate_size

        def q_of(w):  # fused [(Hq+2Hkv)*D, E] -> our [E, Hq*D]
            return w[:hq].T

        def k_of(w):
            return w[hq : hq + hkv].T

        def v_of(w):
            return w[hq + hkv : hq + 2 * hkv].T

        def gate_of(w):  # fused [2F, E] -> [E, F]
            return w[:fi].T

        def up_of(w):
            return w[fi:].T

        m: Dict[Any, Any] = {
            ("embed",): ("model.embed_tokens.weight", None),
            ("final_norm",): ("model.norm.weight", None),
            ("layers", "input_norm"): (
                "model.layers.{i}.input_layernorm.weight", None),
            ("layers", "post_norm"): (
                "model.layers.{i}.post_attention_layernorm.weight", None),
            ("layers", "wq"): (
                "model.layers.{i}.self_attn.qkv_proj.weight", q_of),
            ("layers", "wk"): (
                "model.layers.{i}.self_attn.qkv_proj.weight", k_of),
            ("layers", "wv"): (
                "model.layers.{i}.self_attn.qkv_proj.weight", v_of),
            ("layers", "wo"): (
                "model.layers.{i}.self_attn.o_proj.weight", "t"),
            ("layers", "w_gate"): (
                "model.layers.{i}.mlp.gate_up_proj.weight", gate_of),
            ("layers", "w_up"): (
                "model.layers.{i}.mlp.gate_up_proj.weight", up_of),
            ("layers", "w_down"): (
                "model.layers.{i}.mlp.down_proj.weight", "t"),
        }
        if not cfg.tie_word_embeddings:
            m[("lm_head",)] = ("lm_head.weight", "t")
        return m
