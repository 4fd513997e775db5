"""LLaDA masked-diffusion LM family (LLaDAModelLM).

Reference analog: srt/models/llada2.py + the dLLM runtime (srt/dllm/).
LLaDA checkpoints are llama-shaped trunks trained for masked-diffusion
decoding: generation runs block-wise through the dLLM generator
(dllm/generator.py DLLMGenerator — block-causal attention, iterative
reveal), not the autoregressive paged runner. This family provides the
registry entry + weight ingestion so an LLaDA checkpoint is SERVABLE:
the engine routes its generate() calls through the dLLM path (see
engine.Engine is_dllm wiring).

Weight layouts accepted:
- llama-style ("model.layers.{i}.self_attn.q_proj...") via
  LlamaFamily.hf_weight_map, and
- the OLMo-style names of the original LLaDA release
  ("model.transformer.blocks.{i}...."), renamed before mapping.
"""

from __future__ import annotations

from typing import Any, Dict

import jax

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model

_OLMO_RENAMES = {
    "model.transformer.wte.weight": "model.embed_tokens.weight",
    "model.transformer.ln_f.weight": "model.norm.weight",
    "model.transformer.ff_out.weight": "lm_head.weight",
}
_OLMO_BLOCK_RENAMES = {
    "q_proj.weight": "self_attn.q_proj.weight",
    "k_proj.weight": "self_attn.k_proj.weight",
    "v_proj.weight": "self_attn.v_proj.weight",
    "attn_out.weight": "self_attn.o_proj.weight",
    "ff_proj.weight": "mlp.gate_proj.weight",
    "up_proj.weight": "mlp.up_proj.weight",
    "ff_out.weight": "mlp.down_proj.weight",
    "attn_norm.weight": "input_layernorm.weight",
    "ff_norm.weight": "post_attention_layernorm.weight",
}


def normalize_llada_state_dict(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Rename OLMo-style LLaDA tensors to llama-style; llama-style passes
    through untouched."""
    if not any(k.startswith("model.transformer.") for k in sd):
        return sd
    out = {}
    for k, v in sd.items():
        if k in _OLMO_RENAMES:
            out[_OLMO_RENAMES[k]] = v
            continue
        if k.startswith("model.transformer.blocks."):
            parts = k.split(".")
            i = parts[3]
            rest = ".".join(parts[4:])
            mapped = _OLMO_BLOCK_RENAMES.get(rest, rest)
            out[f"model.layers.{i}.{mapped}"] = v
            continue
        out[k] = v
    return out


@register_model("LLaDAModelLM")
@register_model("LLaDA2MoeModelLM")
class LLaDAFamily(LlamaFamily):
    """Llama param tree; decoding runs through the dLLM generator."""

    is_dllm = True
    supports_eagle = False

    @staticmethod
    def mask_token_id(cfg: ModelConfig) -> int:
        return int((cfg.raw or {}).get("mask_token_id", 126336))

    @staticmethod
    def make_dllm_generator(cfg: ModelConfig, params,
                            block_size: int = 32,
                            algorithm: str = "low_confidence"):
        from sglang_diffusion_tpu.dllm import DLLMGenerator

        return DLLMGenerator(
            cfg, params, mask_token_id=LLaDAFamily.mask_token_id(cfg),
            block_size=block_size, algorithm=algorithm,
        )
