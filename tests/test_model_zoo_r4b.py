"""Round-4 (continuation) model zoo additions, parity-tested against REAL
transformers modules at tiny config: MiniMax hybrid lightning-attention
family and LFM2 conv-hybrid family.

Reference analog: srt/models/{minimax_m2,lfm2}.py.
"""

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

PAGE = 8


def _paged_ctx(cfg, t, n_layers=None, extra_steps=0):
    nl = n_layers if n_layers is not None else cfg.num_hidden_layers
    total = t + extra_steps
    pages_per_seq = (total + PAGE - 1) // PAGE + 1
    kv_cache = jnp.zeros(
        (nl, pages_per_seq + 1, PAGE, 2 * cfg.num_key_value_heads,
         cfg.actual_head_dim), jnp.float32)
    pages = np.arange(1, pages_per_seq + 1, dtype=np.int32)
    page_table = np.zeros((1, pages_per_seq + 1), np.int32)
    page_table[0, :pages_per_seq] = pages
    offs = np.arange(t)
    slots = (pages[offs // PAGE] * PAGE + offs % PAGE)[None].astype(np.int32)
    meta = AttentionMetadata(
        page_table=jnp.asarray(page_table),
        kv_lens=jnp.asarray([t]),
        q_start_pos=jnp.asarray([0]),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.asarray([t - 1]),
    )
    return kv_cache, meta


def _decode_meta(meta, pos):
    pt = np.asarray(meta.page_table)
    slot = pt[0, pos // PAGE] * PAGE + pos % PAGE
    return AttentionMetadata(
        page_table=meta.page_table,
        kv_lens=jnp.asarray([pos + 1]),
        q_start_pos=jnp.asarray([pos]),
        slot_ids=jnp.asarray([[slot]], jnp.int32),
        logit_idx=jnp.asarray([0]),
    )


def _minimax_cfg():
    from transformers import MiniMaxConfig

    return MiniMaxConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, num_local_experts=6, num_experts_per_tok=2,
        layer_types=["linear_attention", "full_attention",
                     "linear_attention", "full_attention"],
        block_size=256, full_attn_alpha_factor=1.2, full_attn_beta_factor=0.9,
        linear_attn_alpha_factor=0.8, linear_attn_beta_factor=1.1,
        mlp_alpha_factor=1.05, mlp_beta_factor=0.95,
        max_position_embeddings=128, tie_word_embeddings=False,
        rope_theta=10000.0,
    )


def test_minimax_prefill_parity_vs_hf():
    from transformers import MiniMaxForCausalLM

    hf = _minimax_cfg()
    torch.manual_seed(11)
    model = MiniMaxForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["MiniMaxForCausalLM"]})
    cls = get_model_cls("MiniMaxForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t = 12
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        ref = model(input_ids=ids).logits[0].numpy()
    fwd = cls.make_forward(cfg, get_attention_backend("xla"),
                           logits_mode="all")
    kv_pages, meta = _paged_ctx(cfg, t, n_layers=cls.kv_layers(cfg))
    kv = {"pages": kv_pages, **cls.init_linear_state(cfg, 12, jnp.float32)}
    logits, _ = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                    jnp.asarray(np.arange(t)[None]), kv, meta)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3,
                               rtol=2e-2)


def test_minimax_decode_parity_vs_hf():
    """Greedy continuation through the recurrent lightning state matches
    HF generate (state carry across prefill -> decode steps)."""
    from transformers import MiniMaxForCausalLM

    hf = _minimax_cfg()
    torch.manual_seed(12)
    model = MiniMaxForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["MiniMaxForCausalLM"]})
    cls = get_model_cls("MiniMaxForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t, steps = 9, 4
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=steps, do_sample=False)
    ref_tokens = out[0, t:].numpy()

    fwd = cls.make_forward(cfg, get_attention_backend("xla"))
    kv_pages, meta = _paged_ctx(cfg, t, n_layers=cls.kv_layers(cfg),
                                extra_steps=steps)
    kv = {"pages": kv_pages, **cls.init_linear_state(cfg, 12, jnp.float32)}
    logits, kv = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                     jnp.asarray(np.arange(t)[None]), kv, meta)
    got = []
    tok = int(np.argmax(np.asarray(logits[0])))
    got.append(tok)
    for s in range(steps - 1):
        pos = t + s
        dm = _decode_meta(meta, pos)
        logits, kv = fwd(params, jnp.asarray([[tok]], jnp.int32),
                         jnp.asarray([[pos]]), kv, dm)
        tok = int(np.argmax(np.asarray(logits[0])))
        got.append(tok)
    np.testing.assert_array_equal(np.asarray(got), ref_tokens)


def test_minimax_chunked_lightning_matches_recurrence():
    """Blockwise-exact chunked lightning attention == per-token scan,
    including right-padding state correction."""
    from sglang_diffusion_tpu.models.minimax import (
        lightning_attention_chunked,
        lightning_attention_step,
    )

    rng = np.random.default_rng(0)
    b, t, H, D = 2, 70, 3, 8  # crosses the 64-block boundary
    q = jnp.asarray(rng.standard_normal((b, t, H, D)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, H, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, H, D)), jnp.float32)
    slope = jnp.asarray([0.05, 0.2, 0.7], jnp.float32)
    lens = np.array([70, 53])
    valid = jnp.asarray(np.arange(t)[None] < lens[:, None])
    st0 = jnp.zeros((b, H, D, D), jnp.float32)
    out_c, st_c = lightning_attention_chunked(q, k, v, st0, slope, valid)

    st = st0
    outs = []
    sts = [None, None]
    for i in range(t):
        o, st = lightning_attention_step(q[:, i], k[:, i], v[:, i], st,
                                         slope)
        outs.append(o)
        for bi in range(b):
            if i == lens[bi] - 1:
                sts[bi] = st[bi]
    out_r = jnp.stack(outs, axis=1)
    for bi in range(b):
        np.testing.assert_allclose(
            np.asarray(out_c[bi, :lens[bi]]), np.asarray(out_r[bi, :lens[bi]]),
            atol=1e-4, rtol=1e-4)
        np.testing.assert_allclose(np.asarray(st_c[bi]),
                                   np.asarray(sts[bi]), atol=1e-4, rtol=1e-4)


def test_lfm2_prefill_parity_vs_hf():
    from transformers import Lfm2Config, Lfm2ForCausalLM

    hf = Lfm2Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=3, conv_bias=True, block_auto_adjust_ff_dim=True,
        block_multiple_of=16, block_ffn_dim_multiplier=1.0,
        layer_types=["conv", "full_attention", "conv", "full_attention"],
        max_position_embeddings=128, tie_word_embeddings=True,
        rope_theta=10000.0, norm_eps=1e-5,
    )
    torch.manual_seed(21)
    model = Lfm2ForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["Lfm2ForCausalLM"]})
    cls = get_model_cls("Lfm2ForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t = 12
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        ref = model(input_ids=ids).logits[0].numpy()
    fwd = cls.make_forward(cfg, get_attention_backend("xla"),
                           logits_mode="all")
    kv_pages, meta = _paged_ctx(cfg, t, n_layers=cls.kv_layers(cfg))
    kv = {"pages": kv_pages, **cls.init_linear_state(cfg, 12, jnp.float32)}
    logits, _ = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                    jnp.asarray(np.arange(t)[None]), kv, meta)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3,
                               rtol=2e-2)


def test_lfm2_decode_parity_vs_hf():
    from transformers import Lfm2Config, Lfm2ForCausalLM

    hf = Lfm2Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        conv_L_cache=4, conv_bias=False, block_auto_adjust_ff_dim=False,
        layer_types=["conv", "conv", "full_attention"],
        max_position_embeddings=128, tie_word_embeddings=True,
        rope_theta=10000.0, norm_eps=1e-5,
    )
    torch.manual_seed(22)
    model = Lfm2ForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["Lfm2ForCausalLM"]})
    cls = get_model_cls("Lfm2ForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t, steps = 9, 4
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        out = model.generate(ids, max_new_tokens=steps, do_sample=False)
    ref_tokens = out[0, t:].numpy()

    fwd = cls.make_forward(cfg, get_attention_backend("xla"))
    kv_pages, meta = _paged_ctx(cfg, t, n_layers=cls.kv_layers(cfg),
                                extra_steps=steps)
    kv = {"pages": kv_pages, **cls.init_linear_state(cfg, 12, jnp.float32)}
    logits, kv = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                     jnp.asarray(np.arange(t)[None]), kv, meta)
    got = []
    tok = int(np.argmax(np.asarray(logits[0])))
    got.append(tok)
    for s in range(steps - 1):
        pos = t + s
        dm = _decode_meta(meta, pos)
        logits, kv = fwd(params, jnp.asarray([[tok]], jnp.int32),
                         jnp.asarray([[pos]]), kv, dm)
        tok = int(np.argmax(np.asarray(logits[0])))
        got.append(tok)
    np.testing.assert_array_equal(np.asarray(got), ref_tokens)


def test_olmoe_parity_vs_hf():
    from transformers import OlmoeConfig, OlmoeForCausalLM

    hf = OlmoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=6, num_experts_per_tok=2, norm_topk_prob=False,
        clip_qkv=8.0, max_position_embeddings=128,
        tie_word_embeddings=False, rope_theta=10000.0,
    )
    torch.manual_seed(31)
    model = OlmoeForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["OlmoeForCausalLM"]})
    cls = get_model_cls("OlmoeForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t = 12
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        ref = model(input_ids=ids).logits[0].numpy()
    fwd = cls.make_forward(cfg, get_attention_backend("xla"),
                           logits_mode="all")
    kv, meta = _paged_ctx(cfg, t)
    logits, _ = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                    jnp.asarray(np.arange(t)[None]), kv, meta)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3,
                               rtol=2e-2)


def test_granite_parity_vs_hf():
    from transformers import GraniteConfig, GraniteForCausalLM

    hf = GraniteConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        embedding_multiplier=6.0, residual_multiplier=0.22,
        attention_multiplier=0.02, logits_scaling=3.0,
        max_position_embeddings=128, tie_word_embeddings=True,
        rope_theta=10000.0, attention_bias=False,
    )
    torch.manual_seed(41)
    model = GraniteForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["GraniteForCausalLM"]})
    cls = get_model_cls("GraniteForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t = 12
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        ref = model(input_ids=ids).logits[0].numpy()
    fwd = cls.make_forward(cfg, get_attention_backend("xla"),
                           logits_mode="all")
    kv, meta = _paged_ctx(cfg, t)
    logits, _ = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                    jnp.asarray(np.arange(t)[None]), kv, meta)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3,
                               rtol=2e-2)


def test_cohere2_parity_vs_hf():
    from transformers import Cohere2Config, Cohere2ForCausalLM

    hf = Cohere2Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        sliding_window=6, sliding_window_pattern=2,
        layer_types=["sliding_attention", "full_attention",
                     "sliding_attention", "full_attention"],
        logit_scale=0.125, layer_norm_eps=1e-5,
        max_position_embeddings=128, tie_word_embeddings=True,
        rope_theta=10000.0, attention_bias=False,
    )
    torch.manual_seed(51)
    model = Cohere2ForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["Cohere2ForCausalLM"]})
    cls = get_model_cls("Cohere2ForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t = 12  # > sliding_window so the window mask matters
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        ref = model(input_ids=ids).logits[0].numpy()
    fwd = cls.make_forward(cfg, get_attention_backend("xla"),
                           logits_mode="all")
    kv, meta = _paged_ctx(cfg, t)
    logits, _ = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                    jnp.asarray(np.arange(t)[None]), kv, meta)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3,
                               rtol=2e-2)


def test_starcoder2_parity_vs_hf():
    from transformers import Starcoder2Config, Starcoder2ForCausalLM

    hf = Starcoder2Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        use_bias=True, sliding_window=None, norm_epsilon=1e-5,
        max_position_embeddings=128, rope_theta=10000.0,
        tie_word_embeddings=True,
    )
    torch.manual_seed(61)
    model = Starcoder2ForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["Starcoder2ForCausalLM"]})
    cls = get_model_cls("Starcoder2ForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t = 12
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        ref = model(input_ids=ids).logits[0].numpy()
    fwd = cls.make_forward(cfg, get_attention_backend("xla"),
                           logits_mode="all")
    kv, meta = _paged_ctx(cfg, t)
    logits, _ = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                    jnp.asarray(np.arange(t)[None]), kv, meta)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3,
                               rtol=2e-2)


def test_exaone4_parity_vs_hf():
    from transformers import Exaone4Config, Exaone4ForCausalLM

    hf = Exaone4Config(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=8, sliding_window=6, sliding_window_pattern=2,
        layer_types=["sliding_attention", "full_attention",
                     "sliding_attention", "full_attention"],
        max_position_embeddings=128, tie_word_embeddings=False,
        rope_theta=10000.0, rms_norm_eps=1e-5,
    )
    torch.manual_seed(71)
    model = Exaone4ForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["Exaone4ForCausalLM"]})
    cls = get_model_cls("Exaone4ForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t = 12
    ids = torch.randint(0, 96, (1, t))
    with torch.no_grad():
        ref = model(input_ids=ids).logits[0].numpy()
    fwd = cls.make_forward(cfg, get_attention_backend("xla"),
                           logits_mode="all")
    kv, meta = _paged_ctx(cfg, t)
    logits, _ = fwd(params, jnp.asarray(ids.numpy().astype(np.int32)),
                    jnp.asarray(np.arange(t)[None]), kv, meta)
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3,
                               rtol=2e-2)
