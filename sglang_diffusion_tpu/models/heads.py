"""Embedding trunks and reward/classification heads.

Reference analog: srt/models/llama_classification.py,
qwen2_classification.py, and the `*Model` embedding trunks served by the
reference's /v1/embeddings + /classify endpoints (e5-mistral,
gte-Qwen2, reward models).

- EmbeddingTrunkFamily ("LlamaModel"/"Qwen2Model"/"MistralModel"/
  "Qwen3Model"): the dense trunk without an lm head; the engine's
  /v1/embeddings path pools the last-token hidden state.
- SequenceClassificationFamily ("*ForSequenceClassification"): trunk +
  `score` linear head -> per-class logits at the last token (reward
  models are num_labels=1), served by Engine.classify / POST /classify.

Both reuse LlamaFamily's compute path — only the head and the HF tensor
names differ.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model


def _trunk_map(cfg: ModelConfig, strip_model_prefix: bool) -> Dict:
    """LlamaFamily's map minus lm_head, optionally without the "model."
    prefix (`*Model` checkpoints saved from AutoModel drop it)."""
    m = {}
    for path, (tmpl, tf) in LlamaFamily.hf_weight_map(cfg).items():
        if tmpl == "lm_head.weight":
            continue
        if strip_model_prefix and tmpl.startswith("model."):
            tmpl = tmpl[len("model."):]
        m[path] = (tmpl, tf)
    return m


@register_model("LlamaModel", "Qwen2Model", "Qwen3Model", "MistralModel",
                "GemmaModel")
class EmbeddingTrunkFamily:
    """Headless dense trunk for embedding serving."""

    supports_eagle = False
    is_embedding = True

    @staticmethod
    def _tie(cfg: ModelConfig) -> ModelConfig:
        import dataclasses

        # no lm_head tensor exists; tie so init/make_forward skip it
        return (cfg if cfg.tie_word_embeddings
                else dataclasses.replace(cfg, tie_word_embeddings=True))

    @staticmethod
    def init_params(rng, cfg: ModelConfig, dtype=jnp.bfloat16):
        return LlamaFamily.init_params(
            rng, EmbeddingTrunkFamily._tie(cfg), dtype)

    @staticmethod
    def partition_specs(cfg: ModelConfig):
        return LlamaFamily.partition_specs(EmbeddingTrunkFamily._tie(cfg))

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", use_lora: bool = False):
        return LlamaFamily.make_forward(
            EmbeddingTrunkFamily._tie(cfg), attn_fn, logits_mode, use_lora)

    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        return _trunk_map(EmbeddingTrunkFamily._tie(cfg),
                          strip_model_prefix=True)


@register_model(
    "LlamaForSequenceClassification",
    "Qwen2ForSequenceClassification",
    "Qwen3ForSequenceClassification",
    "MistralForSequenceClassification",
    "Qwen2ForRewardModel",
)
class SequenceClassificationFamily:
    """Trunk + score head; hidden mode returns trunk features, and
    make_score_head applies the per-class projection."""

    supports_eagle = False
    is_classification = True

    @staticmethod
    def _num_labels(cfg: ModelConfig) -> int:
        return int((cfg.raw or {}).get("num_labels", 1))

    @staticmethod
    def _tie(cfg: ModelConfig) -> ModelConfig:
        import dataclasses

        return (cfg if cfg.tie_word_embeddings
                else dataclasses.replace(cfg, tie_word_embeddings=True))

    @staticmethod
    def init_params(rng, cfg: ModelConfig, dtype=jnp.bfloat16):
        k1, k2 = jax.random.split(rng)
        params = LlamaFamily.init_params(
            k1, SequenceClassificationFamily._tie(cfg), dtype)
        n = SequenceClassificationFamily._num_labels(cfg)
        params["score_w"] = (
            jax.random.normal(k2, (cfg.hidden_size, n), jnp.float32) * 0.02
        ).astype(dtype)
        return params

    @staticmethod
    def partition_specs(cfg: ModelConfig):
        specs = LlamaFamily.partition_specs(
            SequenceClassificationFamily._tie(cfg))
        specs["score_w"] = P(None, None)
        return specs

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", use_lora: bool = False):
        return LlamaFamily.make_forward(
            SequenceClassificationFamily._tie(cfg), attn_fn, logits_mode,
            use_lora)

    @staticmethod
    def make_score_head(cfg: ModelConfig):
        """hidden [.., E] -> class logits [.., num_labels] f32."""

        def score(params, hidden):
            return jnp.dot(hidden.astype(jnp.float32),
                           params["score_w"].astype(jnp.float32))

        return score

    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        m = _trunk_map(SequenceClassificationFamily._tie(cfg),
                       strip_model_prefix=False)
        m[("score_w",)] = ("score.weight", "t")
        return m
