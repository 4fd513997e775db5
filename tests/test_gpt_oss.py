"""GPT-OSS parity vs HF transformers: attention sinks, alternating sliding
windows, yarn rope scaling, clamped-swiglu MoE with biases (reference
analog: srt/models/gpt_oss.py)."""

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


def _tiny_hf(rope_scaling=None):
    from transformers import GptOssConfig, GptOssForCausalLM

    kw = {}
    if rope_scaling is not None:
        kw["rope_scaling"] = rope_scaling
    hf_cfg = GptOssConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=48,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        sliding_window=6,
        num_local_experts=4,
        num_experts_per_tok=2,
        max_position_embeddings=256,
        tie_word_embeddings=False,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        **kw,
    )
    torch.manual_seed(12)
    model = GptOssForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["GptOssForCausalLM"]}
    )
    return hf_cfg, model, cfg


def _params(cfg, model):
    model_cls = get_model_cls(cfg.architecture)
    sd = model.state_dict()
    params = {}
    for path, (tmpl, tf) in model_cls.hf_weight_map(cfg).items():
        def fetch(name):
            w = sd[name].detach().float().numpy()
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
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


def _run(cfg, params, ids):
    model_cls = get_model_cls(cfg.architecture)
    fwd = model_cls.make_forward(cfg, get_attention_backend("xla"),
                                 logits_mode="all")
    b, t = ids.shape
    pages_per_seq = -(-t // PAGE)
    kv = jnp.zeros((cfg.num_hidden_layers, b * pages_per_seq + 1,
                    PAGE, 2 * cfg.num_key_value_heads, cfg.actual_head_dim),
                   jnp.float32)
    pt = np.zeros((b, pages_per_seq + 1), np.int32)
    for i in range(b):
        pt[i, :pages_per_seq] = np.arange(
            1 + i * pages_per_seq, 1 + (i + 1) * pages_per_seq
        )
    offs = np.arange(t)[None, :]
    slots = (np.take_along_axis(pt[:, :pages_per_seq], offs // PAGE, 1) * PAGE
             + offs % PAGE).astype(np.int32)
    meta = AttentionMetadata(
        page_table=jnp.asarray(pt),
        kv_lens=jnp.full((b,), t, jnp.int32),
        q_start_pos=jnp.zeros((b,), jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.full((b,), t - 1, jnp.int32),
    )
    pos = jnp.tile(jnp.arange(t)[None], (b, 1)).astype(jnp.int32)
    logits, _ = fwd(params, jnp.asarray(ids, jnp.int32), pos, kv, meta)
    return np.asarray(logits)


def test_gpt_oss_parity_default_rope():
    """Sinks + sliding windows + clamped MoE, plain rope (rope_scaling off
    isolates the attention/MoE math)."""
    hf_cfg, model, cfg = _tiny_hf(
        rope_scaling={"rope_type": "default"}
    )
    assert cfg.layer_windows() is not None  # alternating sliding layers
    params = _params(cfg, model)
    rng = np.random.default_rng(0)
    ids = rng.integers(3, 128, size=(2, 12))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got = _run(cfg, params, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_gpt_oss_parity_yarn():
    """Default gpt-oss yarn scaling (factor 32, attention_scaling on
    cos/sin) must match HF."""
    hf_cfg, model, cfg = _tiny_hf()  # default config: yarn
    rs = cfg.rope_scaling
    assert rs and rs.get("rope_type") == "yarn"
    params = _params(cfg, model)
    rng = np.random.default_rng(1)
    ids = rng.integers(3, 128, size=(1, 16))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits.numpy()
    got = _run(cfg, params, ids)
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=2e-3)


def test_gpt_oss_engine_e2e():
    """GPT-OSS runs in the full paged-KV engine (scheduler, radix cache,
    bucketed steps) — deterministic greedy output."""
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    _, model, cfg = _tiny_hf(rope_scaling={"rope_type": "default"})
    params = _params(cfg, model)
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=2048, attention_backend="xla",
        context_length=128, random_seed=0,
    )
    eng = Engine(server_args=args, model_config=cfg,
                 tokenizer=ByteTokenizer(), params=params)
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    out = eng.generate(["sink test", "windowed attention"], sp)
    assert all(len(o["output_ids"]) == 8 for o in out)
    again = eng.generate(["sink test", "windowed attention"], sp)
    for a, b in zip(out, again):
        assert a["output_ids"] == b["output_ids"]

    # engine greedy continuation matches HF teacher-forced argmax chain
    # (manual loop: engine ignores eos, HF generate would stop on it)
    import torch as _t

    prompt = [ord(c) for c in "abcd"]
    cur = list(prompt)
    ref = []
    with _t.no_grad():
        for _ in range(6):
            nxt = int(model(_t.tensor([cur])).logits[0, -1].argmax())
            ref.append(nxt)
            cur.append(nxt)
    got = eng.generate(input_ids=prompt,
                       sampling_params=SamplingParams(
                           temperature=0.0, max_new_tokens=6,
                           ignore_eos=True))
    assert got["output_ids"] == ref
