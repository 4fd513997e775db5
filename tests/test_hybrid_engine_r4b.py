"""MiniMax (lightning linear attention) and LFM2 (short conv) in the
PAGED engine: continuous batching + chunked-prefill state carry over the
linear-state pools (reference analog: HybridLinear KV pools,
srt/mem_cache/memory_pool.py:1757).

Ground truth: a manual forward loop over the same (HF-parity-tested)
family forward with a private cache — the engine's batching/scheduling
path must emit identical greedy tokens.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.layers.attention import (
    AttentionMetadata,
    get_attention_backend,
)
from sglang_diffusion_tpu.sampling.params import SamplingParams

PAGE = 8


def _ref_generate(cls, cfg, params, prompt, steps):
    """Greedy decode with a private single-sequence paged cache."""
    fwd = cls.make_forward(cfg, get_attention_backend("xla"))
    total = len(prompt) + steps
    pages_per_seq = -(-total // PAGE) + 1
    kv = {
        "pages": jnp.zeros(
            (cls.kv_layers(cfg), pages_per_seq + 1, PAGE,
             2 * cfg.num_key_value_heads, cfg.actual_head_dim),
            jnp.float32),
        **cls.init_linear_state(cfg, pages_per_seq + 2, jnp.float32),
    }
    pt = np.zeros((1, pages_per_seq + 1), np.int32)
    pt[0, :pages_per_seq] = np.arange(1, pages_per_seq + 1)
    pt_j = jnp.asarray(pt)

    def slot(pos):
        return int(pt[0, pos // PAGE] * PAGE + pos % PAGE)

    t = len(prompt)
    offs = np.arange(t)
    slots = np.array([[slot(p) for p in offs]], np.int32)
    meta = AttentionMetadata(
        page_table=pt_j, kv_lens=jnp.asarray([t]),
        q_start_pos=jnp.asarray([0]), slot_ids=jnp.asarray(slots),
        logit_idx=jnp.asarray([t - 1]))
    logits, kv = fwd(params, jnp.asarray([prompt], jnp.int32),
                     jnp.asarray(offs[None]), kv, meta)
    out = [int(np.argmax(np.asarray(logits[0])))]
    for s in range(steps - 1):
        pos = t + s
        meta = AttentionMetadata(
            page_table=pt_j, kv_lens=jnp.asarray([pos + 1]),
            q_start_pos=jnp.asarray([pos]),
            slot_ids=jnp.asarray([[slot(pos)]], jnp.int32),
            logit_idx=jnp.asarray([0]))
        logits, kv = fwd(params, jnp.asarray([[out[-1]]], jnp.int32),
                         jnp.asarray([[pos]]), kv, meta)
        out.append(int(np.argmax(np.asarray(logits[0]))))
    return out


def _engine_for(arch_cfg, params):
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=PAGE,
        max_total_tokens=2048, chunked_prefill_size=32,
        max_prefill_tokens=64, attention_backend="xla",
        context_length=128, random_seed=0,
    )
    return Engine(server_args=args, model_config=arch_cfg,
                  tokenizer=ByteTokenizer(), params=params)


@pytest.fixture(scope="module")
def minimax_setup():
    cfg = ModelConfig.from_hf_config({
        "architectures": ["MiniMaxForCausalLM"],
        "vocab_size": 128, "hidden_size": 32, "intermediate_size": 48,
        "num_hidden_layers": 4, "num_attention_heads": 4,
        "num_key_value_heads": 2, "head_dim": 8,
        "num_local_experts": 4, "num_experts_per_tok": 2,
        "layer_types": ["linear_attention", "full_attention",
                        "linear_attention", "full_attention"],
        "rms_norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
    })
    from sglang_diffusion_tpu.models.minimax import MiniMaxFamily

    params = MiniMaxFamily.init_params(jax.random.PRNGKey(1), cfg,
                                       jnp.float32)
    return cfg, MiniMaxFamily, params


def test_minimax_engine_matches_manual(minimax_setup):
    cfg, cls, params = minimax_setup
    eng = _engine_for(cfg, params)
    assert eng.runner.has_linear_state
    assert eng.runner.kv_cache["pages"].shape[0] == 2
    assert "recur" in eng.runner.kv_cache
    sp = SamplingParams(temperature=0.0, max_new_tokens=10,
                        ignore_eos=True)
    prompts = [[3, 17, 42, 9, 88], [101, 7, 23, 56, 2, 19, 77]]
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    host_params = jax.device_get(eng.runner.params)
    for p, out in zip(prompts, outs):
        ref = _ref_generate(cls, cfg, host_params, p, 10)
        assert out["output_ids"] == ref


def test_minimax_engine_chunked_prefill_state_carry(minimax_setup):
    """Prompt > chunked_prefill_size: the lightning state must resume
    across chunks (exercises the right-padding decay correction at
    q_start > 0)."""
    cfg, cls, params = minimax_setup
    eng = _engine_for(cfg, params)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6,
                        ignore_eos=True)
    long_prompt = [(i * 11 + 5) % 128 for i in range(50)]
    out = eng.generate(input_ids=long_prompt, sampling_params=sp)
    ref = _ref_generate(cls, cfg, jax.device_get(eng.runner.params),
                        long_prompt, 6)
    assert out["output_ids"] == ref


def test_lfm2_engine_matches_manual():
    cfg = ModelConfig.from_hf_config({
        "architectures": ["Lfm2ForCausalLM"],
        "vocab_size": 128, "hidden_size": 32, "intermediate_size": 48,
        "num_hidden_layers": 3, "num_attention_heads": 4,
        "num_key_value_heads": 2, "conv_L_cache": 3, "conv_bias": False,
        "block_auto_adjust_ff_dim": False,
        "layer_types": ["conv", "full_attention", "conv"],
        "norm_eps": 1e-5, "rope_theta": 10000.0,
        "max_position_embeddings": 256, "tie_word_embeddings": False,
    })
    from sglang_diffusion_tpu.models.lfm2 import Lfm2Family

    params = Lfm2Family.init_params(jax.random.PRNGKey(2), cfg,
                                    jnp.float32)
    eng = _engine_for(cfg, params)
    assert eng.runner.kv_cache["pages"].shape[0] == 1
    assert "conv" in eng.runner.kv_cache
    sp = SamplingParams(temperature=0.0, max_new_tokens=8,
                        ignore_eos=True)
    prompts = [[4, 40, 44, 48, 52], list(range(20, 60))]  # short + chunked
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    host_params = jax.device_get(eng.runner.params)
    for p, out in zip(prompts, outs):
        ref = _ref_generate(Lfm2Family, cfg, host_params, p, 8)
        assert out["output_ids"] == ref
