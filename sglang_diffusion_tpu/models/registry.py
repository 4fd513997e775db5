"""Model registry (reference analog: srt/models/registry.py:18,128).

Models register themselves by HF architecture string. A "model" here is a
namespace object with the functional API:

    init_params(rng, cfg, dtype)        -> params pytree
    partition_specs(cfg)                -> PartitionSpec pytree matching params
    forward(params, cfg, attn_fn, input_ids, positions, kv_cache, meta)
                                        -> (logits, new_kv_cache)
    hf_weight_map(cfg)                  -> mapping for the checkpoint loader
"""

from __future__ import annotations

from typing import Dict

_REGISTRY: Dict[str, object] = {}


def register_model(*arch_names: str):
    def deco(cls):
        for name in arch_names:
            _REGISTRY[name] = cls
        return cls

    return deco


def get_model_cls(architecture: str):
    # import model modules lazily so registration happens on first use
    import sglang_diffusion_tpu.models.cohere2  # noqa: F401
    import sglang_diffusion_tpu.models.deepseek  # noqa: F401
    import sglang_diffusion_tpu.models.glm4  # noqa: F401
    import sglang_diffusion_tpu.models.glm4_moe  # noqa: F401
    import sglang_diffusion_tpu.models.exaone4  # noqa: F401
    import sglang_diffusion_tpu.models.falcon_h1  # noqa: F401
    import sglang_diffusion_tpu.models.whisper  # noqa: F401
    import sglang_diffusion_tpu.models.llada  # noqa: F401
    import sglang_diffusion_tpu.models.bamba  # noqa: F401
    import sglang_diffusion_tpu.models.llama  # noqa: F401
    import sglang_diffusion_tpu.models.llava  # noqa: F401
    import sglang_diffusion_tpu.models.lfm2  # noqa: F401
    import sglang_diffusion_tpu.models.minimax  # noqa: F401
    import sglang_diffusion_tpu.models.mixtral  # noqa: F401
    import sglang_diffusion_tpu.models.phi3  # noqa: F401
    import sglang_diffusion_tpu.models.olmo2  # noqa: F401
    import sglang_diffusion_tpu.models.olmoe  # noqa: F401
    import sglang_diffusion_tpu.models.granitemoe  # noqa: F401
    import sglang_diffusion_tpu.models.qwen3_next  # noqa: F401
    import sglang_diffusion_tpu.models.starcoder2  # noqa: F401
    import sglang_diffusion_tpu.models.gpt_oss  # noqa: F401
    import sglang_diffusion_tpu.models.granite  # noqa: F401
    import sglang_diffusion_tpu.models.qwen2_audio  # noqa: F401
    import sglang_diffusion_tpu.models.qwen2_vl  # noqa: F401
    import sglang_diffusion_tpu.models.gemma3_mm  # noqa: F401
    import sglang_diffusion_tpu.models.internvl  # noqa: F401
    import sglang_diffusion_tpu.models.heads  # noqa: F401
    import sglang_diffusion_tpu.models.mtp  # noqa: F401
    import sglang_diffusion_tpu.models.nemotron_h  # noqa: F401
    import sglang_diffusion_tpu.models.kimi_k2  # noqa: F401
    import sglang_diffusion_tpu.models.glm4v  # noqa: F401
    import sglang_diffusion_tpu.models.deepseek_vl2  # noqa: F401
    import sglang_diffusion_tpu.models.step3_vl  # noqa: F401

    if architecture not in _REGISTRY:
        raise KeyError(
            f"architecture {architecture} not registered; have {sorted(_REGISTRY)}"
        )
    return _REGISTRY[architecture]
