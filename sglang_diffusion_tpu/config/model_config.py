"""Model configuration, loaded from HuggingFace-format config.json.

TPU-native analog of the reference's ModelConfig (srt/configs/model_config.py).
We read the raw config.json (no transformers dependency on the hot path) and
normalize across the llama/qwen2/qwen3/mistral/mixtral families.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional


@dataclass
class VisionConfig:
    """Vision tower config (CLIP-ViT style) for VLM architectures.

    Reference analog: the vision_config half of HF Llava/Qwen2-VL configs
    consumed by srt/configs/model_config.py + srt/multimodal/processors."""

    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    hidden_act: str = "gelu_pytorch_tanh"
    # llava feature selection: index of the hidden layer whose output feeds
    # the projector (-2 = penultimate), and whether to drop the CLS token
    feature_layer: int = -2
    drop_cls: bool = True

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_hf(cls, cfg: Dict[str, Any], outer: Dict[str, Any]) -> "VisionConfig":
        strategy = outer.get("vision_feature_select_strategy", "default")

        def scalar(v, default):
            # some towers (InternViT) store image/patch size as [h, w]
            if isinstance(v, (list, tuple)):
                v = v[0]
            return v if v is not None else default

        return cls(
            hidden_size=cfg.get("hidden_size", 1024),
            intermediate_size=cfg.get("intermediate_size", 4096),
            num_hidden_layers=cfg.get("num_hidden_layers", 24),
            num_attention_heads=cfg.get("num_attention_heads", 16),
            image_size=scalar(cfg.get("image_size"), 336),
            patch_size=scalar(cfg.get("patch_size"), 14),
            layer_norm_eps=cfg.get("layer_norm_eps", 1e-5),
            hidden_act=cfg.get("hidden_act", "gelu_pytorch_tanh"),
            feature_layer=outer.get("vision_feature_layer", -2),
            drop_cls=strategy == "default",
        )


@dataclass
class ModelConfig:
    architecture: str = "LlamaForCausalLM"
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 32
    head_dim: Optional[int] = None
    max_position_embeddings: int = 4096
    rms_norm_eps: float = 1e-6
    rope_theta: float = 10000.0
    rope_scaling: Optional[Dict[str, Any]] = None
    tie_word_embeddings: bool = False
    attention_bias: bool = False  # qwen2 uses bias on qkv
    qk_norm: bool = False  # qwen3 uses per-head q/k RMSNorm
    # olmo2: no input norms; post-attn/post-ffw norms on the branch OUTPUT
    # before the residual add, and q/k RMSNorm over the FLAT projection dim
    norm_after: bool = False
    hidden_act: str = "silu"
    # gemma-family quirks: rmsnorm scales by (1 + w); embeddings scaled by
    # sqrt(hidden_size)
    gemma_style: bool = False
    # gemma2/3: sandwich norms (post-attention/post-ffw norms applied to the
    # residual branch output), logit softcapping, custom attention scale,
    # and a second rope base for sliding (local) layers (gemma3)
    sandwich_norms: bool = False
    attn_logit_softcapping: Optional[float] = None
    final_logit_softcapping: Optional[float] = None
    query_pre_attn_scalar: Optional[float] = None
    rope_local_base_freq: Optional[float] = None
    # MoE fields (mixtral/qwen-moe style)
    num_experts: int = 0
    num_experts_per_tok: int = 2
    moe_intermediate_size: Optional[int] = None
    # DeepSeek-style MoE routing (reference: srt/models/deepseek_v2.py,
    # srt/layers/moe/topk.py noaux_tc): sigmoid scoring + correction bias +
    # group-limited top-k + shared experts; first k layers stay dense
    scoring_func: str = "softmax"  # softmax | sigmoid (v3)
    n_group: int = 1
    topk_group: int = 1
    norm_topk_prob: bool = False
    routed_scaling_factor: float = 1.0
    n_shared_experts: int = 0
    first_k_dense_replace: int = 0
    # MLA (multi-head latent attention, deepseek v2/v3): the KV cache holds
    # one compressed latent per token instead of per-head K/V
    q_lora_rank: Optional[int] = None
    kv_lora_rank: Optional[int] = None
    qk_nope_head_dim: int = 0
    qk_rope_head_dim: int = 0
    v_head_dim: int = 0
    rope_interleave: bool = True
    # partial rotary (glm4/phi-2 style: only head_dim*factor dims rotate,
    # interleaved pairing)
    partial_rotary_factor: float = 1.0
    # sliding-window attention (mistral / gemma-2/3-style local layers).
    # layer_types: optional per-layer "sliding_attention"/"full_attention"
    # pattern (HF layer_types); None = all layers sliding when sliding_window
    # is set.
    sliding_window: Optional[int] = None
    layer_types: Optional[List[str]] = None
    # multimodal (VLM) fields
    vision: Optional[VisionConfig] = None
    image_token_id: Optional[int] = None
    # multimodal (audio) fields (models/qwen2_audio.py reads raw audio_config)
    audio_token_id: Optional[int] = None
    video_token_id: Optional[int] = None
    # misc
    bos_token_id: Optional[int] = None
    eos_token_ids: List[int] = field(default_factory=list)
    torch_dtype: str = "bfloat16"
    raw: Dict[str, Any] = field(default_factory=dict, repr=False)

    @property
    def actual_head_dim(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    def layer_windows(self):
        """Per-layer attention window, -1 = full attention. Returns None when
        no layer is sliding (fast path: no window plumbing at all)."""
        if self.sliding_window is None:
            return None
        import numpy as _np

        w = _np.full((self.num_hidden_layers,), int(self.sliding_window),
                     _np.int32)
        if self.layer_types is not None:
            for i, lt in enumerate(self.layer_types[: self.num_hidden_layers]):
                if lt != "sliding_attention":
                    w[i] = -1
        if _np.all(w < 0):
            return None
        return w

    # ---- KV cache geometry (MLA stores a single shared latent plane) ----
    @property
    def is_mla(self) -> bool:
        return self.kv_lora_rank is not None

    @property
    def kv_cache_heads(self) -> int:
        """Size of the cache's combined-head axis (2*Hkv, or 1 latent)."""
        return 1 if self.is_mla else 2 * self.num_key_value_heads

    @property
    def kv_cache_head_dim(self) -> int:
        if self.is_mla:
            # round the latent width (r_kv + dr, e.g. 512+64=576 for
            # DeepSeek-V3) up to a 128 multiple: Mosaic page DMA requires
            # lane-aligned slices (ops/mla_pallas.py); pad lanes stay zero
            r = self.kv_lora_rank + self.qk_rope_head_dim
            return (r + 127) // 128 * 128
        return self.actual_head_dim

    @classmethod
    def from_hf_config(cls, cfg: Dict[str, Any]) -> "ModelConfig":
        # audio-LLM configs (qwen2-audio style): hoist text_config, keep the
        # audio tower config in raw (models/qwen2_audio.py reads it)
        if "text_config" in cfg and "audio_config" in cfg:
            outer = cfg
            inner = dict(cfg["text_config"])
            inner.setdefault("architectures", ["Qwen2ForCausalLM"])
            mc = cls.from_hf_config(inner)
            arch = (outer.get("architectures") or [None])[0]
            if arch is None:
                mt = outer.get("model_type", "qwen2_audio")
                camel = "".join(p.capitalize() for p in mt.split("_"))
                arch = camel + "ForConditionalGeneration"
            mc.architecture = arch
            mc.audio_token_id = outer.get(
                "audio_token_index", outer.get("audio_token_id")
            )
            mc.raw = outer
            return mc
        # DeepSeek-VL2 nests its MLA LM under language_config (reference
        # configs/deepseekvl2.py); hoist like the text_config VLMs below.
        if "language_config" in cfg and "vision_config" in cfg:
            outer = cfg
            inner = dict(cfg["language_config"])
            inner.setdefault("architectures", ["DeepseekV2ForCausalLM"])
            mc = cls.from_hf_config(inner)
            mc.architecture = (outer.get("architectures")
                               or ["DeepseekVL2ForCausalLM"])[0]
            mc.vision = VisionConfig.from_hf(outer["vision_config"], outer)
            mc.image_token_id = outer.get("image_token_id")
            mc.raw = outer
            return mc
        # VLM configs nest the language model under text_config; hoist it so
        # the LM fields live at the top level (the runner's KV geometry and
        # layer loop read them there) and attach the vision half.
        if "text_config" in cfg and "vision_config" in cfg:
            outer = cfg
            inner = dict(cfg["text_config"])
            # text_config rarely carries architectures; derive the LM family
            # from its model_type so family quirks (gemma norms, qwen bias)
            # apply inside MM models
            _mt_arch = {
                "gemma3_text": "Gemma3ForCausalLM",
                "gemma2": "Gemma2ForCausalLM",
                "qwen2": "Qwen2ForCausalLM",
                "qwen3": "Qwen3ForCausalLM",
                "mistral": "MistralForCausalLM",
            }
            inner.setdefault(
                "architectures",
                [_mt_arch.get(inner.get("model_type"), "LlamaForCausalLM")],
            )
            mc = cls.from_hf_config(inner)
            arch = (outer.get("architectures") or [None])[0]
            if arch is None:
                mt = outer.get("model_type", "llava")
                camel = "".join(p.capitalize() for p in mt.split("_"))
                arch = camel + "ForConditionalGeneration"
            mc.architecture = arch
            mc.vision = VisionConfig.from_hf(outer["vision_config"], outer)
            mc.image_token_id = outer.get(
                "image_token_index", outer.get("image_token_id")
            )
            mc.video_token_id = outer.get(
                "video_token_index", outer.get("video_token_id")
            )
            mc.raw = outer
            return mc
        archs = cfg.get("architectures")
        if not archs:
            # programmatic HF configs often omit architectures; derive from
            # model_type ("deepseek_v3" -> "DeepseekV3ForCausalLM")
            mt = cfg.get("model_type")
            if mt:
                camel = "".join(p.capitalize() for p in mt.split("_"))
                archs = [camel + "ForCausalLM"]
            else:
                archs = ["LlamaForCausalLM"]
        eos = cfg.get("eos_token_id")
        if eos is None:
            eos_list = []
        elif isinstance(eos, list):
            eos_list = list(eos)
        else:
            eos_list = [eos]
        # synthesize per-layer attention types for gemma families when the
        # config predates HF layer_types: gemma2 alternates (even layers
        # sliding), gemma3 is sliding except every Nth (sliding_window_pattern)
        layer_types = cfg.get("layer_types")
        n_layers = cfg.get("num_hidden_layers", 32)
        if layer_types is None and cfg.get("sliding_window"):
            if archs[0].startswith("Gemma2"):
                layer_types = [
                    "sliding_attention" if i % 2 == 0 else "full_attention"
                    for i in range(n_layers)
                ]
            elif archs[0].startswith("Gemma3"):
                pat = cfg.get("sliding_window_pattern", 6)
                layer_types = [
                    "sliding_attention" if (i + 1) % pat else "full_attention"
                    for i in range(n_layers)
                ]
        return cls(
            architecture=archs[0],
            vocab_size=cfg.get("vocab_size", 32000),
            hidden_size=cfg.get("hidden_size", 4096),
            intermediate_size=cfg.get("intermediate_size", 11008),
            num_hidden_layers=cfg.get("num_hidden_layers", 32),
            num_attention_heads=cfg.get("num_attention_heads", 32),
            num_key_value_heads=cfg.get(
                "num_key_value_heads", cfg.get("num_attention_heads", 32)
            ),
            head_dim=cfg.get("head_dim"),
            max_position_embeddings=cfg.get("max_position_embeddings", 4096),
            rms_norm_eps=cfg.get(
                "rms_norm_eps", cfg.get("layer_norm_epsilon", 1e-6)
            ),
            rope_theta=cfg.get("rope_theta", 10000.0),
            rope_scaling=cfg.get("rope_scaling"),
            tie_word_embeddings=cfg.get("tie_word_embeddings", False),
            scoring_func=cfg.get(
                "scoring_func",
                # HF DeepseekV3 and Glm4Moe hardcode sigmoid router scoring
                "sigmoid"
                if archs[0].startswith(("DeepseekV3", "Glm4Moe"))
                else "softmax",
            ),
            n_group=cfg.get("n_group", 1) or 1,
            topk_group=cfg.get("topk_group", 1) or 1,
            norm_topk_prob=cfg.get("norm_topk_prob", False),
            routed_scaling_factor=cfg.get("routed_scaling_factor", 1.0) or 1.0,
            n_shared_experts=cfg.get("n_shared_experts", 0) or 0,
            first_k_dense_replace=cfg.get("first_k_dense_replace", 0) or 0,
            q_lora_rank=cfg.get("q_lora_rank"),
            kv_lora_rank=cfg.get("kv_lora_rank"),
            qk_nope_head_dim=cfg.get("qk_nope_head_dim", 0) or 0,
            qk_rope_head_dim=cfg.get("qk_rope_head_dim", 0) or 0,
            v_head_dim=cfg.get("v_head_dim", 0) or 0,
            rope_interleave=cfg.get("rope_interleave", True),
            partial_rotary_factor=cfg.get("partial_rotary_factor", 1.0),
            attention_bias=cfg.get(
                "attention_bias",
                archs[0].startswith("Qwen2"),  # qwen2 family defaults to qkv bias
            ),
            qk_norm=archs[0].startswith("Qwen3")
            or archs[0].startswith(("Gemma3", "Olmo2")),
            norm_after=archs[0].startswith("Olmo2"),
            hidden_act=cfg.get(
                "hidden_act", cfg.get("hidden_activation", "silu")
            ),
            gemma_style=archs[0].startswith("Gemma"),
            sandwich_norms=archs[0].startswith(("Gemma2", "Gemma3", "Glm4")),
            attn_logit_softcapping=cfg.get("attn_logit_softcapping"),
            final_logit_softcapping=cfg.get("final_logit_softcapping"),
            query_pre_attn_scalar=cfg.get("query_pre_attn_scalar"),
            rope_local_base_freq=cfg.get("rope_local_base_freq"),
            num_experts=cfg.get(
                "num_local_experts",
                cfg.get("num_experts", cfg.get("n_routed_experts", 0)),
            ),
            num_experts_per_tok=cfg.get("num_experts_per_tok", 2),
            moe_intermediate_size=cfg.get("moe_intermediate_size"),
            sliding_window=(
                cfg.get("sliding_window")
                if cfg.get("use_sliding_window", True)
                else None
            ),
            layer_types=layer_types,
            bos_token_id=cfg.get("bos_token_id"),
            eos_token_ids=eos_list,
            torch_dtype=cfg.get("torch_dtype", "bfloat16"),
            raw=cfg,
        )

    @classmethod
    def from_pretrained(cls, model_path: str) -> "ModelConfig":
        cfg_path = os.path.join(model_path, "config.json")
        with open(cfg_path) as f:
            return cls.from_hf_config(json.load(f))

    # -- tiny test configs ---------------------------------------------
    @classmethod
    def tiny_llama(cls, **overrides) -> "ModelConfig":
        kw = dict(
            architecture="LlamaForCausalLM",
            vocab_size=512,
            hidden_size=64,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=1024,
            rope_theta=10000.0,
            rms_norm_eps=1e-6,
        )
        kw.update(overrides)
        return cls(**kw)

    @classmethod
    def tiny_llava(cls, **overrides) -> "ModelConfig":
        kw = dict(
            architecture="LlavaForConditionalGeneration",
            vision=VisionConfig(
                hidden_size=32,
                intermediate_size=64,
                num_hidden_layers=2,
                num_attention_heads=2,
                image_size=28,
                patch_size=14,
            ),
            image_token_id=500,
        )
        kw.update(overrides)
        base = cls.tiny_llama()
        for k, v in kw.items():
            setattr(base, k, v)
        return base
