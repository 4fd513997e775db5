"""Gemma-2 / Gemma-3 logits parity vs HF transformers.

Covers: sandwich norms (pre/post-ffw layernorms), attention + final logit
softcapping, query_pre_attn_scalar, alternating sliding-window layers, and
gemma3's dual rope base + qk-norm. Reference analog: srt/models/gemma2.py,
gemma3_causal.py."""

import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from tests.test_model_numerics import check_model


def test_gemma2_parity():
    from transformers import Gemma2Config, Gemma2ForCausalLM

    hf_cfg = Gemma2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=64,
        sliding_window=6,
        query_pre_attn_scalar=16,
        attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
        hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(4)
    model = Gemma2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Gemma2ForCausalLM"]}
    )
    assert cfg.sandwich_norms and cfg.attn_logit_softcapping == 50.0
    w = cfg.layer_windows()
    assert list(w) == [6, -1, 6, -1]  # even layers sliding
    check_model(model, cfg)


def test_gemma3_parity():
    from transformers import Gemma3TextConfig, Gemma3ForCausalLM

    hf_cfg = Gemma3TextConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=64,
        sliding_window=6,
        sliding_window_pattern=2,
        query_pre_attn_scalar=16,
        rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0,
    )
    torch.manual_seed(5)
    model = Gemma3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Gemma3ForCausalLM"]}
    )
    assert cfg.qk_norm and cfg.sandwich_norms
    assert cfg.rope_local_base_freq == 10_000.0
    w = cfg.layer_windows()
    assert w is not None and (w >= 0).any() and (w < 0).any()
    check_model(model, cfg)


def test_glm4_parity():
    """GLM-4: sandwich norms + partial interleaved rotary + fused gate_up
    (reference: srt/models/glm4.py)."""
    from transformers import Glm4Config, Glm4ForCausalLM

    hf_cfg = Glm4Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=64,
        partial_rotary_factor=0.5,
        attention_bias=False,
        tie_word_embeddings=False,
        pad_token_id=0,
    )
    torch.manual_seed(8)
    model = Glm4ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Glm4ForCausalLM"]}
    )
    assert cfg.sandwich_norms and cfg.partial_rotary_factor == 0.5
    from tests.test_model_numerics import run_ours
    import numpy as _np
    import jax.numpy as _jnp
    from sglang_diffusion_tpu.models.registry import get_model_cls

    model_cls = get_model_cls(cfg.architecture)
    sd = model.state_dict()
    params = {}
    for path, (tmpl, tf) in model_cls.hf_weight_map(cfg).items():
        def fetch(name):
            w = sd[name].detach().float().numpy()
            if callable(tf):
                return _np.ascontiguousarray(tf(w))
            return w.T if tf == "t" else w

        if "{i}" in tmpl:
            leaf = _np.stack(
                [fetch(tmpl.format(i=i)) for i in range(cfg.num_hidden_layers)]
            )
        else:
            leaf = fetch(tmpl)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = _jnp.asarray(leaf, _jnp.float32)

    rng = np.random.default_rng(0)
    ids = rng.integers(1, 128, size=(2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits[:, -1, :].numpy()
    got = run_ours(cfg, params, ids)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)
