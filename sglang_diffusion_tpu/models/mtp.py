"""MTP / NextN draft-model architectures (registry entries).

Reference analog: srt/models/deepseek_nextn.py, srt/models/mimo_mtp.py,
srt/models/glm4_moe_nextn.py — these architectures are draft heads, not
standalone language models: the engine consumes them through
--speculative-algorithm mtp (spec/mtp.py MTPDrafter), which loads their
weights directly. The registry entries let ModelConfig resolution and
the CLI recognize a draft checkpoint directory's architecture string.
"""

from __future__ import annotations

import jax.numpy as jnp

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.registry import register_model


@register_model(
    "DeepseekV3ForCausalLMNextN",
    "MiMoMTP",
    "Glm4MoeForCausalLMNextN",
    "LlamaForCausalLMEagle3",
)
class MTPDraftArch:
    """Draft-only architecture: no standalone serving forward."""

    supports_eagle = False
    is_draft_only = True

    @staticmethod
    def init_params(rng, cfg: ModelConfig, dtype=jnp.bfloat16):
        from sglang_diffusion_tpu.spec.mtp import init_mtp_params

        return init_mtp_params(rng, cfg, dtype)

    @staticmethod
    def load_draft_params(path: str, cfg: ModelConfig, dtype=jnp.bfloat16):
        from sglang_diffusion_tpu.spec.mtp import load_mtp_params

        return load_mtp_params(path, cfg, dtype)

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn, logits_mode: str = "last",
                     **kw):
        raise NotImplementedError(
            f"{cfg.architecture} is a speculative draft head; serve the "
            "target model with --speculative-algorithm mtp and "
            "--speculative-draft-model-path pointing here"
        )
