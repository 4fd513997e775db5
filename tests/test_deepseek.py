"""DeepSeek-V3 MLA + MoE: logits parity vs HF transformers, cache
consistency (prefill-then-decode == one-shot prefill), and e2e engine run.

Reference analog: srt/models/deepseek_v2.py accuracy tests. Validates MLA's
absorbed-attention equivalence, the latent KV cache, interleaved rope,
sigmoid+bias group-limited routing, and shared experts in one shot.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.models.registry import get_model_cls

PAGE = 8


def _tiny_hf_config():
    from transformers.models.deepseek_v3 import DeepseekV3Config

    return DeepseekV3Config(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=96,
        moe_intermediate_size=32,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=4,
        q_lora_rank=24,
        kv_lora_rank=16,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        head_dim=8,
        n_routed_experts=8,
        num_experts_per_tok=2,
        n_group=2,
        topk_group=1,
        n_shared_experts=1,
        first_k_dense_replace=1,
        routed_scaling_factor=2.5,
        norm_topk_prob=True,
        attention_bias=False,
        attn_implementation="eager",
    )


def _to_our_config(hf) -> ModelConfig:
    return ModelConfig.from_hf_config(hf.to_dict())


def _convert_state(cfg: ModelConfig, state_dict):
    """HF state dict -> our two-group stacked params."""
    model_cls = get_model_cls(cfg.architecture)
    wmap = model_cls.hf_weight_map(cfg)
    ld = cfg.first_k_dense_replace
    L = cfg.num_hidden_layers
    params = {}

    def to_np(t):
        return t.detach().to(torch.float32).numpy()

    for path, (tmpl, tf) in wmap.items():
        group = path[0]
        if "{i}" in tmpl:
            rng = range(ld) if group == "dense_layers" else range(ld, L)
            per_layer = []
            for i in rng:
                if "{x}" in tmpl:
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
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


def _run_ours(cfg, params, ids_np, ctx_np=None):
    """Run our forward; if ctx_np given, first prefill ctx then ids (cache
    consistency path). Returns last-token logits [B, V]."""
    model_cls = get_model_cls(cfg.architecture)
    fwd = model_cls.make_forward(cfg, None)
    b, t = ids_np.shape
    tot = t + (ctx_np.shape[1] if ctx_np is not None else 0)
    pps = -(-tot // PAGE)
    num_pages = b * pps + 1
    kv = jnp.zeros(
        (cfg.num_hidden_layers, num_pages, PAGE, cfg.kv_cache_heads,
         cfg.kv_cache_head_dim), jnp.float32,
    )
    pt = jnp.asarray(
        np.arange(1, 1 + b * pps).reshape(b, pps), jnp.int32
    )

    def meta_for(start, tq, total):
        offs = start + np.arange(tq)[None, :]
        slots = (
            np.take_along_axis(np.asarray(pt), offs // PAGE, axis=1) * PAGE
            + offs % PAGE
        ).astype(np.int32)
        return AttentionMetadata(
            page_table=pt,
            kv_lens=jnp.full((b,), start + tq, jnp.int32),
            q_start_pos=jnp.full((b,), start, jnp.int32),
            slot_ids=jnp.asarray(slots),
            logit_idx=jnp.full((b,), tq - 1, jnp.int32),
        )

    start = 0
    if ctx_np is not None:
        tctx = ctx_np.shape[1]
        pos = jnp.tile(jnp.arange(tctx)[None], (b, 1)).astype(jnp.int32)
        _, kv = jax.jit(fwd)(params, jnp.asarray(ctx_np), pos, kv,
                             meta_for(0, tctx, tctx))
        start = tctx
    pos = jnp.tile(start + jnp.arange(t)[None], (b, 1)).astype(jnp.int32)
    logits, _ = jax.jit(fwd)(params, jnp.asarray(ids_np), pos, kv,
                             meta_for(start, t, start + t))
    return np.asarray(logits)


@pytest.fixture(scope="module")
def hf_setup():
    from transformers.models.deepseek_v3 import DeepseekV3ForCausalLM

    torch.manual_seed(0)
    hf_cfg = _tiny_hf_config()
    model = DeepseekV3ForCausalLM(hf_cfg).eval()
    # make routing bias nontrivial
    with torch.no_grad():
        for layer in model.model.layers[hf_cfg.first_k_dense_replace:]:
            layer.mlp.gate.e_score_correction_bias.uniform_(-0.1, 0.1)
    return hf_cfg, model


def test_deepseek_v3_logits_match_hf(hf_setup):
    hf_cfg, model = hf_setup
    cfg = _to_our_config(hf_cfg)
    assert cfg.is_mla and cfg.kv_cache_heads == 1
    params = _convert_state(cfg, model.state_dict())

    rng = np.random.default_rng(0)
    ids = rng.integers(0, hf_cfg.vocab_size, (2, 7))
    with torch.no_grad():
        hf_logits = model(torch.from_numpy(ids)).logits[:, -1].numpy()
    ours = _run_ours(cfg, params, ids)
    np.testing.assert_allclose(ours, hf_logits, rtol=2e-4, atol=2e-4)


def test_deepseek_cache_consistency(hf_setup):
    """Chunked prefill through the latent cache == one-shot prefill."""
    hf_cfg, model = hf_setup
    cfg = _to_our_config(hf_cfg)
    params = _convert_state(cfg, model.state_dict())
    rng = np.random.default_rng(1)
    full = rng.integers(0, hf_cfg.vocab_size, (2, 9))
    one_shot = _run_ours(cfg, params, full)
    chunked = _run_ours(cfg, params, full[:, 6:], ctx_np=full[:, :6])
    np.testing.assert_allclose(chunked, one_shot, rtol=2e-4, atol=2e-4)


def test_deepseek_engine_e2e(hf_setup):
    """Full engine (scheduler + paged latent cache + sampler) runs and is
    deterministic with the MLA cache geometry."""
    hf_cfg, _ = hf_setup
    cfg = _to_our_config(hf_cfg)
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = dataclasses.replace(cfg, vocab_size=512)
    args = ServerArgs(model_path="", tokenizer_path="byte", page_size=8,
                      max_total_tokens=2048, attention_backend="xla",
                      context_length=256)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    out1 = eng.generate("deepseek mla", SamplingParams(temperature=0.0,
                                                       max_new_tokens=6))
    out2 = eng.generate("deepseek mla", SamplingParams(temperature=0.0,
                                                       max_new_tokens=6))
    assert out1["output_ids"] == out2["output_ids"]
    assert len(out1["output_ids"]) == 6
