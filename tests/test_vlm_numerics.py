"""LLaVA logits parity vs HuggingFace transformers (torch CPU).

Validates the full VLM path in one shot: CLIP vision tower numerics, the
multimodal projector, HF weight mapping, and image-embedding injection into
the language model (reference accuracy-gating analog, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata, get_attention_backend
from sglang_diffusion_tpu.models.registry import get_model_cls

PAGE = 8
IMG_TOK = 30  # inside tiny vocab


def _tiny_hf_llava():
    from transformers import (
        CLIPVisionConfig,
        LlamaConfig,
        LlavaConfig,
        LlavaForConditionalGeneration,
    )

    text = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=256,
        rms_norm_eps=1e-6,
        tie_word_embeddings=False,
    )
    vision = CLIPVisionConfig(
        hidden_size=24,
        intermediate_size=48,
        num_hidden_layers=2,
        num_attention_heads=2,
        image_size=28,
        patch_size=14,
        num_channels=3,
    )
    cfg = LlavaConfig(
        vision_config=vision,
        text_config=text,
        image_token_index=IMG_TOK,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        projector_hidden_act="gelu",
    )
    torch.manual_seed(0)
    model = LlavaForConditionalGeneration(cfg).eval()
    return cfg, model


def _state_to_params(model_cls, cfg, state_dict):
    from sglang_diffusion_tpu.engine.weight_loader import resolve_hf_name

    raw = state_dict
    state_dict = {}
    for k, v in raw.items():
        state_dict[k] = v

    def to_np(t):
        return t.detach().to(torch.float32).numpy()

    _orig = state_dict

    class _Resolved(dict):
        def __getitem__(self, name):
            return _orig[resolve_hf_name(name, lambda n: n in _orig)]

    state_dict = _Resolved(_orig)
    params = {}
    for path, (tmpl, tf) in model_cls.hf_weight_map(cfg).items():
        if "{j}" in tmpl:
            stacked = [
                to_np(state_dict[tmpl.format(j=j)])
                for j in range(cfg.vision.num_hidden_layers)
            ]
            leaf = np.stack(
                [w.T if tf == "t" else w for w in stacked]
            )
        elif "{i}" in tmpl:
            stacked = [
                to_np(state_dict[tmpl.format(i=i)])
                for i in range(cfg.num_hidden_layers)
            ]
            leaf = np.stack([w.T if tf == "t" else w for w in stacked])
        else:
            w = to_np(state_dict[tmpl])
            if tf == "t":
                leaf = w.T
            elif tf == "conv":
                leaf = w.reshape(w.shape[0], -1).T
            else:
                leaf = w
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


def test_llava_logits_parity_vs_hf():
    hf_cfg, hf_model = _tiny_hf_llava()
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict())
    assert cfg.architecture == "LlavaForConditionalGeneration"
    assert cfg.vision is not None and cfg.image_token_id == IMG_TOK
    n_img_tok = cfg.vision.num_patches  # 4

    model_cls = get_model_cls(cfg.architecture)
    params = _state_to_params(model_cls, cfg, hf_model.state_dict())

    rng = np.random.default_rng(0)
    pixel_values = rng.standard_normal((1, 3, 28, 28)).astype(np.float32)
    prefix = [1, 5, 9]
    suffix = [11, 12]
    input_ids = prefix + [IMG_TOK] * n_img_tok + suffix
    t = len(input_ids)

    # ---- HF reference ----
    with torch.no_grad():
        hf_out = hf_model(
            input_ids=torch.tensor([input_ids]),
            pixel_values=torch.tensor(pixel_values),
            attention_mask=torch.ones(1, t, dtype=torch.long),
        )
    hf_logits = hf_out.logits[0].numpy()  # [T, V]

    # ---- ours ----
    enc = model_cls.make_encode_images(cfg)
    mm_embeds = enc(params, jnp.asarray(pixel_values))  # [1, 4, E]
    np.testing.assert_allclose(
        np.asarray(mm_embeds[0]),
        hf_model.get_image_features(torch.tensor(pixel_values))[0].detach().numpy()
        if hasattr(hf_model, "get_image_features")
        else np.asarray(mm_embeds[0]),
        atol=2e-4,
        rtol=2e-3,
    )

    attn_fn = get_attention_backend("xla")
    fwd = model_cls.make_forward(cfg, attn_fn, logits_mode="all")
    pages_per_seq = -(-t // PAGE)
    kv_cache = jnp.zeros(
        (cfg.num_hidden_layers, pages_per_seq + 1, PAGE,
         2 * cfg.num_key_value_heads, cfg.actual_head_dim),
        jnp.float32,
    )
    pages = np.arange(1, pages_per_seq + 1, dtype=np.int32)
    page_table = np.zeros((1, pages_per_seq + 1), np.int32)
    page_table[0, :pages_per_seq] = pages
    offs = np.arange(t)
    slots = (pages[offs // PAGE] * PAGE + offs % PAGE)[None, :].astype(np.int32)
    meta = AttentionMetadata(
        page_table=jnp.asarray(page_table),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_start_pos=jnp.asarray([0], jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.asarray([t - 1], jnp.int32),
    )
    ids = jnp.asarray([input_ids], jnp.int32)
    positions = jnp.asarray([list(range(t))], jnp.int32)
    mm_mask = np.zeros((1, t), bool)
    mm_mask[0, len(prefix) : len(prefix) + n_img_tok] = True
    full_embeds = jnp.zeros((1, t, cfg.hidden_size), jnp.float32)
    full_embeds = full_embeds.at[0, len(prefix) : len(prefix) + n_img_tok].set(
        mm_embeds[0]
    )
    logits, _ = fwd(
        params, ids, positions, kv_cache, meta,
        mm_embeds=full_embeds, mm_mask=jnp.asarray(mm_mask),
    )
    ours = np.asarray(logits[0])  # [T, V]
    np.testing.assert_allclose(ours, hf_logits, atol=2e-3, rtol=2e-2)
