"""Qwen2-Audio family: whisper-architecture audio tower + Qwen2 LM with
audio-embedding injection.

Reference analog: the audio-LLM entries of the reference zoo
(srt/models/glmasr.py, gemma3n_audio — audio towers feeding the LM exactly
like vision towers). The language path and injection machinery are shared
with the VLM families (models/llava.py): audio placeholder tokens expand
into content-hash pseudo-ids and the mm prefill step overrides their
embeddings.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.audio_encoder import (
    AudioEncoderConfig,
    WhisperEncoder,
)
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.llava import LlavaFamily
from sglang_diffusion_tpu.models.registry import register_model


@register_model("Qwen2AudioForConditionalGeneration")
class Qwen2AudioFamily:
    supports_eagle = False
    is_multimodal = True
    is_audio = True

    @staticmethod
    def _audio_cfg(cfg: ModelConfig) -> AudioEncoderConfig:
        ac = AudioEncoderConfig.from_hf(cfg.raw.get("audio_config", {}))
        ac.avg_pool = True  # qwen2-audio pools 2x before the final LN
        return ac

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        k1, k2, k3 = jax.random.split(rng, 3)
        ac = Qwen2AudioFamily._audio_cfg(cfg)

        def init(key, shape):
            import numpy as np

            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        return {
            "language": LlamaFamily.init_params(k1, cfg, dtype),
            "audio": WhisperEncoder.init_params(k2, ac, dtype),
            "projector": {
                "w": init(k3, (ac.d_model, cfg.hidden_size)),
                "b": jnp.zeros((cfg.hidden_size,), dtype),
            },
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        ac = Qwen2AudioFamily._audio_cfg(cfg)
        aspecs = jax.tree.map(
            lambda _: P(),
            WhisperEncoder.init_params(jax.random.PRNGKey(0), ac),
            is_leaf=lambda x: not isinstance(x, dict),
        )
        return {
            "language": LlamaFamily.partition_specs(cfg),
            "audio": aspecs,
            "projector": {"w": P(None, "tp"), "b": P("tp")},
        }

    # ---------------- audio encode ----------------
    @staticmethod
    def make_encode_audio(cfg: ModelConfig) -> Callable:
        """encode(params, input_features [N, mel, frames]) -> [N, T_a, E]."""
        ac = Qwen2AudioFamily._audio_cfg(cfg)

        def encode(params, feats):
            h = WhisperEncoder.apply(params["audio"], feats, ac)
            p = params["projector"]
            return h @ p["w"] + p["b"]

        return encode

    # the injection forward is identical to the VLM path
    make_forward = LlavaFamily.make_forward

    # ---------------- HF checkpoint mapping ----------------
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
        for path, (tmpl, tf) in WhisperEncoder.hf_weight_map().items():
            # whisper map uses "model.encoder."; qwen2-audio nests the tower
            # at model.audio_tower
            m[("audio",) + path] = (
                tmpl.replace("model.encoder.", "model.audio_tower."), tf,
            )
        m[("projector", "w")] = (
            "model.multi_modal_projector.linear.weight", "t",
        )
        m[("projector", "b")] = (
            "model.multi_modal_projector.linear.bias", None,
        )
        return m
