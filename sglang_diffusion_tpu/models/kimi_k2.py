"""Kimi-K2 family (KimiK2ForCausalLM / KimiK25ForCausalLM text stack).

Reference analog: srt/models/kimi_k25.py — Moonshot's K2/K2.5 text
backbone IS the DeepSeek-V3 architecture (the reference imports and
subclasses DeepseekV3ForCausalLM; the public K2 checkpoints even declare
`architectures: ["DeepseekV3ForCausalLM"]` with model_type kimi_k2:
MLA attention, noaux_tc sigmoid MoE routing with grouped top-k, shared
experts, MTP NextN head). The TPU family therefore delegates to the
DeepseekFamily implementation (models/deepseek.py) — same functional
blocks, same checkpoint layout — and only registers the Kimi
architecture strings so K2 configs resolve without aliasing games.

K2-specific config values (384 routed experts, 64-way expert groups,
rope theta 50000, 7168 hidden) flow through ModelConfig.raw exactly like
DeepSeek-V3's; nothing in the block math differs.
"""

from __future__ import annotations

from sglang_diffusion_tpu.models.deepseek import DeepseekFamily
from sglang_diffusion_tpu.models.registry import register_model

# register the Kimi arch strings onto the shared implementation
KimiK2Family = register_model(
    "KimiK2ForCausalLM", "KimiK25ForCausalLM")(DeepseekFamily)
