"""OLMo2 family.

Reference analog: srt/models/olmo2.py. Llama-shaped, but:
- NO input layernorms: each block reads the raw residual stream and
  applies post_attention_layernorm / post_feedforward_layernorm to the
  branch OUTPUT before the residual add (olmo2.py:302-319)
- q/k RMSNorm over the FLAT projection dims (hidden_size for q,
  Hkv*D for k), before the head reshape (olmo2.py:117-121)
The functional forward is LlamaFamily's with cfg.norm_after=True; only the
HF name mapping differs.
"""

from __future__ import annotations

from typing import Any, Dict

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model


@register_model("Olmo2ForCausalLM")
class Olmo2Family(LlamaFamily):
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        lyr = "model.layers.{i}"
        m: Dict[Any, Any] = {
            ("embed",): ("model.embed_tokens.weight", None),
            ("final_norm",): ("model.norm.weight", None),
            ("layers", "post_norm"): (
                lyr + ".post_attention_layernorm.weight", None),
            ("layers", "post_ffw_norm"): (
                lyr + ".post_feedforward_layernorm.weight", None),
            ("layers", "q_norm"): (lyr + ".self_attn.q_norm.weight", None),
            ("layers", "k_norm"): (lyr + ".self_attn.k_norm.weight", None),
            ("layers", "wq"): (lyr + ".self_attn.q_proj.weight", "t"),
            ("layers", "wk"): (lyr + ".self_attn.k_proj.weight", "t"),
            ("layers", "wv"): (lyr + ".self_attn.v_proj.weight", "t"),
            ("layers", "wo"): (lyr + ".self_attn.o_proj.weight", "t"),
            ("layers", "w_gate"): (lyr + ".mlp.gate_proj.weight", "t"),
            ("layers", "w_up"): (lyr + ".mlp.up_proj.weight", "t"),
            ("layers", "w_down"): (lyr + ".mlp.down_proj.weight", "t"),
        }
        if cfg.attention_bias:
            m[("layers", "bq")] = (lyr + ".self_attn.q_proj.bias", None)
            m[("layers", "bk")] = (lyr + ".self_attn.k_proj.bias", None)
            m[("layers", "bv")] = (lyr + ".self_attn.v_proj.bias", None)
        if not cfg.tie_word_embeddings:
            m[("lm_head",)] = ("lm_head.weight", "t")
        return m
