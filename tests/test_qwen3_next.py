"""Qwen3-Next hybrid (Gated DeltaNet + gated attention + MoE) parity vs HF
transformers (reference analog: srt/models/qwen3_next.py)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.qwen3_next import (
    Qwen3NextFamily,
    Qwen3NextGenerator,
)


def _tiny_hf(num_experts=4):
    from transformers import Qwen3NextConfig, Qwen3NextForCausalLM

    hf_cfg = Qwen3NextConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        partial_rotary_factor=0.25,
        max_position_embeddings=128,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        linear_num_key_heads=2,
        linear_num_value_heads=4,
        linear_key_head_dim=8,
        linear_value_head_dim=8,
        linear_conv_kernel_dim=3,
        num_experts=num_experts,
        num_experts_per_tok=2,
        decoder_sparse_step=1,
        moe_intermediate_size=32,
        shared_expert_intermediate_size=48,
        norm_topk_prob=True,
        mlp_only_layers=[0],
        tie_word_embeddings=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(6)
    model = Qwen3NextForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Qwen3NextForCausalLM"]}
    )
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}
    params = Qwen3NextFamily.params_from_state_dict(cfg, sd)
    return hf_cfg, model, cfg, params


@pytest.fixture(scope="module")
def setup():
    return _tiny_hf()


def test_full_forward_parity(setup):
    hf_cfg, model, cfg, params = setup
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 128, size=(2, 21))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    fwd = Qwen3NextFamily.make_forward(cfg, logits_mode="all")
    got, _ = fwd(params, jnp.asarray(ids, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-3, atol=2e-3)


def test_generator_matches_hf_greedy(setup):
    hf_cfg, model, cfg, params = setup
    prompt = [5, 9, 17, 33, 64, 12, 7]
    with torch.no_grad():
        ref = model.generate(
            torch.tensor([prompt]), max_new_tokens=8, do_sample=False,
        )[0, len(prompt):].tolist()
    gen = Qwen3NextGenerator(cfg, params, max_len=64)
    got = gen.generate(prompt, max_new_tokens=8)
    assert got == ref
