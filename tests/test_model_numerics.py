"""Model forward numerics vs HuggingFace torch implementations.

The analog of the reference's accuracy gating strategy (SURVEY.md §4): since
no pretrained checkpoints are available in CI, we instantiate tiny
random-weight HF models on torch-CPU, convert their state dicts into our
param layout, and require logits parity. This validates the weight mapping
(hf_weight_map) and the full forward path (embed, RoPE, GQA paged attention,
RMSNorm, SwiGLU, lm_head) in one shot.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata, get_attention_backend
from sglang_diffusion_tpu.models.registry import get_model_cls

PAGE = 8


def hf_state_to_params(model_cls, cfg, state_dict, dtype=jnp.float32):
    """Convert an HF state_dict to our stacked-layer param pytree."""
    L = cfg.num_hidden_layers
    wmap = model_cls.hf_weight_map(cfg)
    params = {}

    def to_np(t):
        return t.detach().to(torch.float32).numpy()

    for path, (tmpl, tf) in wmap.items():
        if "{i}" in tmpl:
            per_layer = []
            for i in range(L):
                if "{x}" in tmpl:  # stacked experts
                    per_exp = []
                    x = 0
                    while tmpl.format(i=i, x=x) in state_dict:
                        w = to_np(state_dict[tmpl.format(i=i, x=x)])
                        per_exp.append(w.T if tf == "t" else w)
                        x += 1
                    per_layer.append(np.stack(per_exp))
                else:
                    w = to_np(state_dict[tmpl.format(i=i)])
                    per_layer.append(w.T if tf == "t" else w)
            leaf = np.stack(per_layer)
        else:
            w = to_np(state_dict[tmpl])
            leaf = w.T if tf == "t" else w
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, dtype)
    return params


def run_ours(cfg, params, input_ids_np, dtype=jnp.float32):
    model_cls = get_model_cls(cfg.architecture)
    attn_fn = get_attention_backend("xla")
    fwd = model_cls.make_forward(cfg, attn_fn)
    b, t = input_ids_np.shape
    pages_per_seq = -(-t // PAGE)
    num_pages = b * pages_per_seq + 1
    kv_cache = jnp.zeros(
        (
            cfg.num_hidden_layers,
            num_pages,
            PAGE,
            2 * cfg.num_key_value_heads,
            cfg.actual_head_dim,
        ),
        dtype,
    )
    page_table = jnp.arange(b * pages_per_seq, dtype=jnp.int32).reshape(
        b, pages_per_seq
    )
    offs = jnp.arange(t)[None, :]
    slots = (
        jnp.take_along_axis(page_table, offs // PAGE, axis=1) * PAGE + offs % PAGE
    ).astype(jnp.int32)
    meta = AttentionMetadata(
        page_table=page_table,
        kv_lens=jnp.full((b,), t, jnp.int32),
        q_start_pos=jnp.zeros((b,), jnp.int32),
        slot_ids=slots,
        logit_idx=jnp.full((b,), t - 1, jnp.int32),
    )
    positions = jnp.tile(jnp.arange(t)[None, :], (b, 1))
    logits, _ = fwd(params, jnp.asarray(input_ids_np), positions, kv_cache, meta)
    return np.asarray(logits)


def check_model(hf_model, cfg, atol=2e-3):
    torch.manual_seed(0)
    rng = np.random.default_rng(0)
    input_ids = rng.integers(0, cfg.vocab_size, size=(2, 12))
    with torch.no_grad():
        out = hf_model(torch.tensor(input_ids))
    ref = out.logits[:, -1, :].numpy()

    params = hf_state_to_params(
        get_model_cls(cfg.architecture), cfg, hf_model.state_dict()
    )
    got = run_ours(cfg, params, input_ids)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=atol)


def test_llama_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
    )
    torch.manual_seed(1)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]})
    check_model(model, cfg)


def test_llama3_rope_scaling_parity():
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=128,
        rope_scaling={
            "rope_type": "llama3",
            "factor": 8.0,
            "low_freq_factor": 1.0,
            "high_freq_factor": 4.0,
            "original_max_position_embeddings": 32,
        },
    )
    torch.manual_seed(2)
    model = LlamaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]})
    check_model(model, cfg)


def test_qwen2_parity():
    from transformers import Qwen2Config, Qwen2ForCausalLM

    hf_cfg = Qwen2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=True,
    )
    torch.manual_seed(3)
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Qwen2ForCausalLM"]}
    )
    check_model(model, cfg)


def test_qwen3_parity():
    from transformers import Qwen3Config, Qwen3ForCausalLM

    hf_cfg = Qwen3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=64,
    )
    torch.manual_seed(4)
    model = Qwen3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Qwen3ForCausalLM"]}
    )
    check_model(model, cfg)


def test_mixtral_parity():
    from transformers import MixtralConfig, MixtralForCausalLM

    hf_cfg = MixtralConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(5)
    model = MixtralForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["MixtralForCausalLM"]}
    )
    check_model(model, cfg)


def test_gemma_parity():
    from transformers import GemmaConfig, GemmaForCausalLM

    hf_cfg = GemmaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=64,
        hidden_act="gelu_pytorch_tanh",
        hidden_activation="gelu_pytorch_tanh",
    )
    torch.manual_seed(6)
    model = GemmaForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["GemmaForCausalLM"]}
    )
    check_model(model, cfg, atol=4e-3)


def test_phi3_parity():
    """Fused qkv_proj / gate_up_proj slicing (reference: srt/models/phi3)."""
    from transformers import Phi3Config, Phi3ForCausalLM

    hf_cfg = Phi3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(7)
    model = Phi3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Phi3ForCausalLM"]}
    )
    # the parity helper mirrors the loader's transforms, incl. callables
    sd = model.state_dict()
    from sglang_diffusion_tpu.models.registry import get_model_cls
    import numpy as _np
    import jax.numpy as _jnp

    model_cls = get_model_cls(cfg.architecture)
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
    input_ids = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(input_ids)).logits[:, -1, :].numpy()
    got = run_ours(cfg, params, input_ids)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)

def _params_via_weight_map(model_cls, cfg, sd):
    import jax.numpy as _jnp

    params = {}
    for path, (tmpl, tf) in model_cls.hf_weight_map(cfg).items():
        def fetch(name):
            w = sd[name].detach().float().numpy()
            if callable(tf):
                return np.ascontiguousarray(tf(w))
            return w.T if tf == "t" else w

        if "{i}" in tmpl:
            leaf = np.stack(
                [fetch(tmpl.format(i=i)) for i in range(cfg.num_hidden_layers)]
            )
        else:
            leaf = fetch(tmpl)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = _jnp.asarray(leaf, _jnp.float32)
    return params


def test_phi3_longrope_parity():
    """LongRoPE short-context path + mscale vs HF (reference
    Phi3LongRoPEScaledRotaryEmbedding, rope_variant.py:36). The sequence
    stays below original_max_position_embeddings so HF's whole-sequence
    table selection and our per-position selection agree; mscale != 1
    because max_position_embeddings > original."""
    from transformers import Phi3Config, Phi3ForCausalLM

    hf_cfg = Phi3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        original_max_position_embeddings=32,
        rope_scaling={
            "type": "longrope",
            "short_factor": [1.0 + 0.05 * i for i in range(8)],
            "long_factor": [2.0 + 0.25 * i for i in range(8)],
        },
        tie_word_embeddings=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(9)
    model = Phi3ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Phi3ForCausalLM"]}
    )
    from sglang_diffusion_tpu.models.registry import get_model_cls

    model_cls = get_model_cls(cfg.architecture)
    params = _params_via_weight_map(model_cls, cfg, model.state_dict())
    rng = np.random.default_rng(1)
    input_ids = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(input_ids)).logits[:, -1, :].numpy()
    got = run_ours(cfg, params, input_ids)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


def test_longrope_long_branch_selects_per_position():
    """Positions straddling orig_ctx: below uses short table, at/above uses
    the long table (reference long_short_cos_sin_cache indexing)."""
    import jax.numpy as jnp

    from sglang_diffusion_tpu.ops.rope import (
        apply_rope_longrope,
        longrope_inv_freqs,
    )

    D = 16
    scaling = {
        "short_factor": [1.0] * (D // 2),
        "long_factor": [4.0] * (D // 2),
        "original_max_position_embeddings": 8,
    }
    inv_s, inv_l, orig, ms, ml = longrope_inv_freqs(D, 10000.0, scaling, 32)
    assert orig == 8 and ms == ml and ms > 1.0
    rng = np.random.default_rng(0)
    q = rng.standard_normal((1, 2, 1, D)).astype(np.float32)
    positions = np.array([[7, 8]], dtype=np.int32)  # short, long
    qo, _ = apply_rope_longrope(
        jnp.asarray(q), jnp.asarray(q), jnp.asarray(positions),
        jnp.asarray(inv_s), jnp.asarray(inv_l), orig, ms, ml,
    )
    qo = np.asarray(qo)

    def manual(x, p, inv):
        fr = p * inv
        cos = np.concatenate([np.cos(fr), np.cos(fr)]) * ms
        sin = np.concatenate([np.sin(fr), np.sin(fr)]) * ms
        h = D // 2
        rotated = np.concatenate([-x[h:], x[:h]])
        return x * cos + rotated * sin

    np.testing.assert_allclose(
        qo[0, 0, 0], manual(q[0, 0, 0], 7, inv_s), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        qo[0, 1, 0], manual(q[0, 1, 0], 8, inv_l), rtol=1e-5, atol=1e-5
    )


def test_olmo2_parity():
    """Post-norm-only blocks + flat-dim q/k norms (reference:
    srt/models/olmo2.py)."""
    from transformers import Olmo2Config, Olmo2ForCausalLM

    hf_cfg = Olmo2Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        tie_word_embeddings=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
    )
    torch.manual_seed(11)
    model = Olmo2ForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["Olmo2ForCausalLM"]}
    )
    assert cfg.norm_after and cfg.qk_norm
    from sglang_diffusion_tpu.models.registry import get_model_cls

    model_cls = get_model_cls(cfg.architecture)
    params = _params_via_weight_map(model_cls, cfg, model.state_dict())
    rng = np.random.default_rng(2)
    input_ids = rng.integers(0, 128, size=(2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(input_ids)).logits[:, -1, :].numpy()
    got = run_ours(cfg, params, input_ids)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)
