"""Round-3 model-zoo additions, each parity-tested vs HF transformers:

- Gemma3ForConditionalGeneration (SigLIP tower + avg-pool projector)
- InternVLForConditionalGeneration (InternViT + pixel shuffle projector)
- embedding trunks (LlamaModel et al.) via the engine /v1/embeddings path
- sequence-classification / reward heads (Qwen2ForSequenceClassification)
- MTP (NextN) speculative drafting: greedy-lossless vs the plain engine

Reference analog: srt/models/{gemma3_mm,internvl,llama_classification,
deepseek_nextn}.py."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import (
    AttentionMetadata,
    get_attention_backend,
)
from sglang_diffusion_tpu.models.registry import get_model_cls
from tests.test_vlm_numerics import _state_to_params

PAGE = 8


def _run_mm(cfg, model_cls, params, input_ids, mm_embeds, mm_span):
    """Forward with image embeddings injected over mm_span positions."""
    t = len(input_ids)
    attn_fn = get_attention_backend("xla")
    fwd = model_cls.make_forward(cfg, attn_fn, logits_mode="all")
    pages_per_seq = -(-t // PAGE)
    kv_cache = jnp.zeros(
        (cfg.num_hidden_layers, pages_per_seq + 1,
         PAGE, 2 * cfg.num_key_value_heads, cfg.actual_head_dim),
        jnp.float32)
    pages = np.arange(1, pages_per_seq + 1, dtype=np.int32)
    page_table = np.zeros((1, pages_per_seq + 1), np.int32)
    page_table[0, :pages_per_seq] = pages
    offs = np.arange(t)
    slots = (pages[offs // PAGE] * PAGE + offs % PAGE)[None, :].astype(
        np.int32)
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
    lo, n = mm_span
    mm_mask[0, lo:lo + n] = True
    full = jnp.zeros((1, t, cfg.hidden_size), jnp.float32)
    full = full.at[0, lo:lo + n].set(mm_embeds[0])
    logits, _ = fwd(params, ids, positions, kv_cache, meta,
                    mm_embeds=full, mm_mask=jnp.asarray(mm_mask))
    return np.asarray(logits[0])


# ---------------- Gemma3 MM ----------------


def test_gemma3_mm_parity_vs_hf():
    from transformers import Gemma3Config, Gemma3ForConditionalGeneration

    IMG = 60
    cfg_hf = Gemma3Config(
        text_config=dict(
            model_type="gemma3_text", vocab_size=64, hidden_size=32,
            intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, head_dim=8,
            max_position_embeddings=256, rope_theta=10000.0,
            sliding_window=16, sliding_window_pattern=2,
        ),
        vision_config=dict(
            model_type="siglip_vision_model", hidden_size=24,
            intermediate_size=48, num_hidden_layers=2,
            num_attention_heads=2, image_size=32, patch_size=8,
        ),
        image_token_index=IMG,
        mm_tokens_per_image=4,
        boi_token_index=61, eoi_token_index=62,
    )
    torch.manual_seed(2)
    model = Gemma3ForConditionalGeneration(cfg_hf).eval()
    cfg = ModelConfig.from_hf_config(cfg_hf.to_dict())
    assert cfg.architecture == "Gemma3ForConditionalGeneration"
    assert cfg.gemma_style  # text half resolves to the gemma family
    model_cls = get_model_cls(cfg.architecture)
    params = _state_to_params(model_cls, cfg, model.state_dict())

    rng = np.random.default_rng(0)
    pixel_values = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    enc = model_cls.make_encode_images(cfg)
    mm = enc(params, jnp.asarray(pixel_values))
    ref_feats = model.get_image_features(
        torch.tensor(pixel_values)).detach().numpy()
    np.testing.assert_allclose(np.asarray(mm), ref_feats, atol=3e-4,
                               rtol=2e-3)

    prefix = [2, 5, 9]
    suffix = [11, 3]
    input_ids = prefix + [IMG] * 4 + suffix
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor([input_ids]),
            pixel_values=torch.tensor(pixel_values),
            attention_mask=torch.ones(1, len(input_ids), dtype=torch.long),
        ).logits[0].numpy()
    ours = _run_mm(cfg, model_cls, params, input_ids, mm, (3, 4))
    np.testing.assert_allclose(ours, ref, atol=4e-3, rtol=2e-2)


# ---------------- InternVL ----------------


def test_internvl_parity_vs_hf():
    from transformers import InternVLConfig, InternVLForConditionalGeneration

    IMG = 120
    cfg_hf = InternVLConfig(
        vision_config=dict(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
            use_absolute_position_embeddings=True,
        ),
        text_config=dict(
            model_type="qwen2", vocab_size=128, hidden_size=48,
            intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2,
            max_position_embeddings=64,
        ),
        image_token_id=IMG,
        downsample_ratio=0.5,
    )
    torch.manual_seed(4)
    model = InternVLForConditionalGeneration(cfg_hf).eval()
    cfg = ModelConfig.from_hf_config(
        cfg_hf.to_dict() | {"architectures": ["InternVLForConditionalGeneration"]})
    assert cfg.attention_bias  # qwen2 text half
    model_cls = get_model_cls(cfg.architecture)
    params = _state_to_params(model_cls, cfg, model.state_dict())

    rng = np.random.default_rng(1)
    pixel_values = rng.standard_normal((1, 3, 32, 32)).astype(np.float32)
    enc = model_cls.make_encode_images(cfg)
    mm = enc(params, jnp.asarray(pixel_values))  # [1, 4, 48]
    ref_feats = model.get_image_features(
        torch.tensor(pixel_values)).detach().numpy()
    np.testing.assert_allclose(np.asarray(mm), ref_feats, atol=3e-4,
                               rtol=2e-3)

    n_img = mm.shape[1]
    prefix = [1, 7]
    suffix = [9]
    input_ids = prefix + [IMG] * n_img + suffix
    with torch.no_grad():
        ref = model(
            input_ids=torch.tensor([input_ids]),
            pixel_values=torch.tensor(pixel_values),
            attention_mask=torch.ones(1, len(input_ids), dtype=torch.long),
        ).logits[0].numpy()
    ours = _run_mm(cfg, model_cls, params, input_ids, mm, (2, n_img))
    np.testing.assert_allclose(ours, ref, atol=4e-3, rtol=2e-2)


# ---------------- embedding trunk ----------------


def test_embedding_trunk_parity_vs_hf():
    from transformers import LlamaConfig, LlamaModel

    hf_cfg = LlamaConfig(
        vocab_size=310, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128,
    )
    torch.manual_seed(6)
    model = LlamaModel(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["LlamaModel"]})
    model_cls = get_model_cls("LlamaModel")
    params = _state_to_params(model_cls, cfg, model.state_dict())

    # engine-level: /v1/embeddings path with these weights
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer

    eng = Engine(
        server_args=ServerArgs(model_path="", tokenizer_path="byte",
                               page_size=8, max_total_tokens=1024,
                               attention_backend="xla", context_length=128),
        model_config=cfg, tokenizer=ByteTokenizer(), params=params)
    out = eng.encode("embed me")
    ids = ByteTokenizer().encode("embed me")
    with torch.no_grad():
        ref = model(torch.tensor([[min(i, 309) for i in ids]])
                    ).last_hidden_state[0, -1].numpy()
    np.testing.assert_allclose(
        np.asarray(out["embedding"], np.float32), ref, atol=2e-2, rtol=2e-2)


# ---------------- reward / classification head ----------------


def test_reward_head_parity_vs_hf():
    from transformers import Qwen2Config, Qwen2ForSequenceClassification

    hf_cfg = Qwen2Config(
        vocab_size=310, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=128, num_labels=3, pad_token_id=0,
    )
    torch.manual_seed(8)
    model = Qwen2ForSequenceClassification(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Qwen2ForSequenceClassification"]})
    model_cls = get_model_cls("Qwen2ForSequenceClassification")
    assert model_cls.is_classification
    params = _state_to_params(model_cls, cfg, model.state_dict())

    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer

    eng = Engine(
        server_args=ServerArgs(model_path="", tokenizer_path="byte",
                               page_size=8, max_total_tokens=1024,
                               attention_backend="xla", context_length=128),
        model_config=cfg, tokenizer=ByteTokenizer(), params=params)
    out = eng.classify("rate this answer")
    ids = [min(i, 309) for i in ByteTokenizer().encode("rate this answer")]
    with torch.no_grad():
        ref = model(torch.tensor([ids])).logits[0].numpy()
    np.testing.assert_allclose(
        np.asarray(out["embedding"], np.float32), ref, atol=2e-2, rtol=2e-2)
    assert len(out["embedding"]) == 3


# ---------------- MTP speculative drafting ----------------


def test_mtp_lossless_vs_plain():
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams
    from sglang_diffusion_tpu.spec.mtp import MTPDrafter

    def mk(**kw):
        return Engine(
            server_args=ServerArgs(
                model_path="", tokenizer_path="byte", page_size=8,
                max_total_tokens=4096, chunked_prefill_size=32,
                attention_backend="xla", context_length=512, **kw),
            model_config=ModelConfig.tiny_llama(vocab_size=512),
            tokenizer=ByteTokenizer())

    prompts = ["the quick brown fox jumps over the lazy dog. " * 3,
               "hello world"]
    sp = SamplingParams(max_new_tokens=24, temperature=0.0)
    plain = mk()
    mtp = mk(speculative_algorithm="mtp", speculative_num_draft_tokens=3)
    assert isinstance(mtp.scheduler.drafter, MTPDrafter)
    assert "enorm" in mtp.scheduler.drafter.draft_params
    ref = [r["output_ids"] for r in plain.generate(prompts, sp)]
    out = [r["output_ids"] for r in mtp.generate(prompts, sp)]
    assert ref == out


def test_mtp_param_loading(tmp_path):
    """DeepSeek-NextN-style tensor names load into the drafter tree."""
    from safetensors.numpy import save_file

    from sglang_diffusion_tpu.spec.mtp import load_mtp_params

    cfg = ModelConfig.tiny_llama(vocab_size=64)
    E = cfg.hidden_size
    Hq = cfg.num_attention_heads * cfg.actual_head_dim
    Hkv = cfg.num_key_value_heads * cfg.actual_head_dim
    F = cfg.intermediate_size
    L = cfg.num_hidden_layers  # NextN layer index = num_hidden_layers
    rng = np.random.default_rng(0)
    sd = {
        f"model.layers.{L}.enorm.weight": rng.standard_normal(E),
        f"model.layers.{L}.hnorm.weight": rng.standard_normal(E),
        f"model.layers.{L}.eh_proj.weight": rng.standard_normal((E, 2 * E)),
        f"model.layers.{L}.shared_head.norm.weight": rng.standard_normal(E),
        f"model.layers.{L}.input_layernorm.weight": rng.standard_normal(E),
        f"model.layers.{L}.self_attn.q_proj.weight":
            rng.standard_normal((Hq, E)),
        f"model.layers.{L}.self_attn.k_proj.weight":
            rng.standard_normal((Hkv, E)),
        f"model.layers.{L}.self_attn.v_proj.weight":
            rng.standard_normal((Hkv, E)),
        f"model.layers.{L}.self_attn.o_proj.weight":
            rng.standard_normal((E, Hq)),
    }
    save_file({k: v.astype(np.float32) for k, v in sd.items()},
              str(tmp_path / "model.safetensors"))
    params = load_mtp_params(str(tmp_path), cfg, jnp.float32)
    np.testing.assert_allclose(
        np.asarray(params["enorm"]),
        sd[f"model.layers.{L}.enorm.weight"], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["fc"]),
        sd[f"model.layers.{L}.eh_proj.weight"].T, rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params["layers"]["wq"][0]),
        sd[f"model.layers.{L}.self_attn.q_proj.weight"].T, rtol=1e-6)
