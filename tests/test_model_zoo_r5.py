"""Round-5 model zoo additions: GLM4V (parity vs REAL transformers),
Nemotron-H (prefill/decode state-carry consistency + block mirrors —
transformers 4.57 has no nemotron_h module), Kimi-K2 (DeepSeek-V3
architecture registration).

Reference analog: srt/models/{glm4v,nemotron_h,kimi_k25}.py.
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


def _paged_ctx(cfg, t, n_layers=None, kv_heads=None, head_dim=None):
    nl = n_layers if n_layers is not None else cfg.num_hidden_layers
    hkv = kv_heads if kv_heads is not None else cfg.num_key_value_heads
    hd = head_dim if head_dim is not None else cfg.actual_head_dim
    pages_per_seq = (t + PAGE - 1) // PAGE + 2
    kv_cache = jnp.zeros(
        (nl, pages_per_seq + 1, PAGE, 2 * hkv, hd), jnp.float32)
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


# ---------------- GLM4V ----------------
def _glm4v_hf():
    from transformers.models.glm4v import (
        Glm4vForConditionalGeneration,
        configuration_glm4v as cc,
    )

    vis = dict(
        hidden_size=64, depth=2, num_heads=2, intermediate_size=96,
        out_hidden_size=48, patch_size=4, temporal_patch_size=2,
        spatial_merge_size=2, image_size=16, in_channels=3,
    )
    txt = dict(
        hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=None,
        vocab_size=256, rope_theta=10000.0, attention_bias=True,
        partial_rotary_factor=0.5,
        rope_scaling={"rope_type": "default", "mrope_section": [1, 1, 1]},
        max_position_embeddings=512,
    )
    cfg = cc.Glm4vConfig(
        text_config=txt, vision_config=vis,
        image_token_id=250, video_token_id=251,
    )
    torch.manual_seed(0)
    model = Glm4vForConditionalGeneration(cfg).eval().float()
    return model, cfg


def _glm4v_model_config(hfcfg):
    t = hfcfg.text_config
    raw = {
        "vision_config": hfcfg.vision_config.to_dict(),
        "image_token_id": hfcfg.image_token_id,
        "video_token_id": hfcfg.video_token_id,
    }
    return ModelConfig(
        architecture="Glm4vForConditionalGeneration",
        vocab_size=t.vocab_size,
        hidden_size=t.hidden_size,
        intermediate_size=t.intermediate_size,
        num_hidden_layers=t.num_hidden_layers,
        num_attention_heads=t.num_attention_heads,
        num_key_value_heads=t.num_key_value_heads,
        max_position_embeddings=512,
        rms_norm_eps=t.rms_norm_eps,
        rope_theta=t.rope_theta,
        rope_scaling=t.rope_scaling,
        partial_rotary_factor=0.5,
        attention_bias=True,
        sandwich_norms=True,
        raw=raw,
    )


def _convert(cls, cfg, state_dict):
    """Apply hf_weight_map to a torch state dict (test-local mirror of
    weight_loader.load_hf_params fetch logic)."""
    from sglang_diffusion_tpu.engine.weight_loader import resolve_hf_name

    def to_np(t):
        return t.detach().to(torch.float32).numpy()

    has = lambda n: n in state_dict  # noqa: E731
    params = {}
    vis_layers = cfg.raw["vision_config"]["depth"]
    for path, (tmpl, tf) in cls.hf_weight_map(cfg).items():
        def fetch(name):
            w = to_np(state_dict[resolve_hf_name(name, has)])
            if callable(tf):
                return tf(w)
            if tf == "t":
                return w.T
            if tf == "conv":
                return w.reshape(w.shape[0], -1).T
            if tf == "conv2d_hwio":
                return w.transpose(2, 3, 1, 0)
            return w

        if "{j}" in tmpl:
            leaf = np.stack(
                [fetch(tmpl.format(j=j)) for j in range(vis_layers)])
        elif "{i}" in tmpl:
            leaf = np.stack(
                [fetch(tmpl.format(i=i))
                 for i in range(cfg.num_hidden_layers)])
        else:
            leaf = fetch(tmpl)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


@pytest.fixture(scope="module")
def glm4v():
    model, hfcfg = _glm4v_hf()
    cfg = _glm4v_model_config(hfcfg)
    cls = get_model_cls("Glm4vForConditionalGeneration")
    params = _convert(cls, cfg, dict(model.state_dict()))
    return model, hfcfg, cfg, cls, params


def test_glm4v_vision_tower_parity(glm4v):
    model, hfcfg, cfg, cls, params = glm4v
    v = hfcfg.vision_config
    gh = gw = 4  # == image_size/patch_size: no pos-embed interpolation
    n_patch = gh * gw
    rng = np.random.default_rng(0)
    patches = rng.standard_normal(
        (n_patch, v.in_channels * v.temporal_patch_size * v.patch_size ** 2)
    ).astype(np.float32)
    with torch.no_grad():
        want = model.model.visual(
            torch.from_numpy(patches),
            grid_thw=torch.tensor([[1, gh, gw]]),
        ).numpy()
    enc = cls.make_encode_images(cfg)
    got = np.asarray(enc(params, jnp.asarray(patches), (gh, gw))[0])
    np.testing.assert_allclose(got, want, atol=2e-3, rtol=2e-3)


def test_glm4v_text_mrope_parity(glm4v):
    model, hfcfg, cfg, cls, params = glm4v
    t = 12
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 200, (1, t))
    # distinct (t, h, w) streams exercise the section selection
    pos3 = np.stack([
        np.arange(t), np.arange(t) // 2, np.arange(t) // 3])[:, None, :]
    with torch.no_grad():
        out = model.model.language_model(
            input_ids=torch.from_numpy(ids),
            position_ids=torch.from_numpy(pos3),
        )
        h = out.last_hidden_state
        want = model.lm_head(h).numpy()[0]
    kv, meta = _paged_ctx(cfg, t)
    fwd = cls.make_forward(cfg, get_attention_backend("xla"),
                           logits_mode="all")
    got, _ = fwd(params, jnp.asarray(ids), jnp.asarray(
        np.arange(t)[None]), kv, meta,
        positions_3d=jnp.asarray(pos3[:, 0][:, None, :].transpose(0, 1, 2)))
    got = np.asarray(got)[0]
    np.testing.assert_allclose(got, want, atol=2e-2, rtol=2e-2)


# ---------------- Nemotron-H ----------------
def _nemotron_cfg():
    return ModelConfig(
        architecture="NemotronHForCausalLM",
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=6,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        raw={
            "hybrid_override_pattern": "M*-M*-",
            "mamba_num_heads": 4,
            "mamba_head_dim": 16,
            "ssm_state_size": 16,
            "conv_kernel": 4,
            "n_groups": 2,
        },
    )


def test_nemotron_h_prefill_decode_consistency():
    """Prefill in one pass vs token-by-token decode must produce the same
    final-position logits (exercises NoPE attention paged writes, mamba
    conv/SSM state carry, and the ReLU^2 MLP layers)."""
    cfg = _nemotron_cfg()
    cls = get_model_cls("NemotronHForCausalLM")
    params = cls.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    t = 11
    rng = np.random.default_rng(2)
    ids = rng.integers(0, 250, (1, t))
    n_attn = cls.kv_layers(cfg)
    kv, meta = _paged_ctx(cfg, t, n_layers=n_attn, kv_heads=2, head_dim=16)
    pools = cls.init_linear_state(cfg, 64, jnp.float32)
    cache = {"pages": kv, **pools}
    fwd = cls.make_forward(cfg, get_attention_backend("xla"))
    logits_pre, _ = fwd(params, jnp.asarray(ids),
                        jnp.asarray(np.arange(t)[None]), cache, meta)

    # decode path: feed tokens one at a time, carrying state
    cache2 = {"pages": jnp.zeros_like(kv), **cls.init_linear_state(
        cfg, 64, jnp.float32)}
    logits_dec = None
    for pos in range(t):
        m = _decode_meta(meta, pos)
        logits_dec, cache2 = fwd(
            params, jnp.asarray(ids[:, pos:pos + 1]),
            jnp.asarray([[pos]]), cache2, m)
    np.testing.assert_allclose(
        np.asarray(logits_pre), np.asarray(logits_dec),
        atol=2e-3, rtol=2e-3)


def test_nemotron_h_relu2_mlp_matches_torch():
    cfg = _nemotron_cfg()
    cls = get_model_cls("NemotronHForCausalLM")
    params = cls.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    # layer 2 is '-' (ReLU^2 MLP) in the pattern
    lp = params["layers"][2]
    x = np.random.default_rng(3).standard_normal((4, 64)).astype(np.float32)
    xt = torch.from_numpy(x)
    w_up = torch.from_numpy(np.asarray(lp["w_up"]))
    w_down = torch.from_numpy(np.asarray(lp["w_down"]))
    want = (torch.relu(xt @ w_up) ** 2 @ w_down).numpy()
    got = np.asarray(jnp.dot(
        jnp.square(jax.nn.relu(jnp.dot(jnp.asarray(x), lp["w_up"]))),
        lp["w_down"]))
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_nemotron_h_engine_e2e():
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = _nemotron_cfg()
    args = ServerArgs(model_path="", tokenizer_path="byte", page_size=8,
                      max_total_tokens=2048, attention_backend="xla",
                      context_length=256)
    eng = Engine(server_args=args, model_config=cfg,
                 tokenizer=ByteTokenizer())
    out = eng.generate("hello nemotron", SamplingParams(
        max_new_tokens=8, temperature=0.0))
    assert len(out["output_ids"]) == 8
    out2 = eng.generate("hello nemotron", SamplingParams(
        max_new_tokens=8, temperature=0.0))
    assert out["output_ids"] == out2["output_ids"]


# ---------------- Kimi-K2 ----------------
def test_kimi_k2_resolves_to_deepseek_family():
    from sglang_diffusion_tpu.models.deepseek import DeepseekFamily

    assert get_model_cls("KimiK2ForCausalLM") is DeepseekFamily
    assert get_model_cls("KimiK25ForCausalLM") is DeepseekFamily


def test_granitemoe_parity_vs_hf():
    from transformers import GraniteMoeConfig, GraniteMoeForCausalLM

    hf = GraniteMoeConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=6, num_experts_per_tok=2,
        embedding_multiplier=6.0, residual_multiplier=0.22,
        attention_multiplier=0.02, logits_scaling=3.0,
        max_position_embeddings=128, tie_word_embeddings=False,
        rope_theta=10000.0, attention_bias=False,
    )
    torch.manual_seed(47)
    model = GraniteMoeForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["GraniteMoeForCausalLM"]})
    cls = get_model_cls("GraniteMoeForCausalLM")
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


def test_granitemoe_shared_parity_vs_hf():
    from transformers import (
        GraniteMoeSharedConfig,
        GraniteMoeSharedForCausalLM,
    )

    hf = GraniteMoeSharedConfig(
        vocab_size=96, hidden_size=32, intermediate_size=48,
        shared_intermediate_size=40,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_local_experts=4, num_experts_per_tok=2,
        embedding_multiplier=2.0, residual_multiplier=0.5,
        attention_multiplier=0.03, logits_scaling=2.0,
        max_position_embeddings=128, tie_word_embeddings=True,
        rope_theta=10000.0, attention_bias=False,
    )
    torch.manual_seed(53)
    model = GraniteMoeSharedForCausalLM(hf).eval()
    cfg = ModelConfig.from_hf_config(
        hf.to_dict() | {"architectures": ["GraniteMoeSharedForCausalLM"]})
    cls = get_model_cls("GraniteMoeSharedForCausalLM")
    sd = {k: v.detach().float().numpy()
          for k, v in model.state_dict().items()}
    params = cls.params_from_state_dict(cfg, sd)
    t = 10
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
