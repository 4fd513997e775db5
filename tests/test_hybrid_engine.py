"""Hybrid linear-attention models in the PAGED engine (VERDICT r3 weak #7:
qwen3-next/mamba2 ran only as standalone generators). Reference analog:
HybridLinear KV pools (srt/mem_cache/memory_pool.py:1757) + mamba radix
cache — here the conv/recurrent state pools ride the donated KV-cache
pytree, slot-indexed by each request's first page id, reset at prefill
start (q_start == 0).

Ground truth: the standalone Qwen3NextGenerator (itself HF-parity-tested
in test_qwen3_next.py) — the engine's continuous-batching path must emit
the same greedy tokens.
"""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.models.qwen3_next import (
    Qwen3NextFamily,
    Qwen3NextGenerator,
)
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _cfg():
    return ModelConfig.from_hf_config({
        "architectures": ["Qwen3NextForCausalLM"],
        "vocab_size": 128,
        "hidden_size": 64,
        "intermediate_size": 96,
        "num_hidden_layers": 4,
        "num_attention_heads": 4,
        "num_key_value_heads": 2,
        "head_dim": 16,
        "partial_rotary_factor": 0.25,
        "max_position_embeddings": 256,
        "layer_types": ["linear_attention", "full_attention",
                        "linear_attention", "full_attention"],
        "linear_num_key_heads": 2,
        "linear_num_value_heads": 4,
        "linear_key_head_dim": 8,
        "linear_value_head_dim": 8,
        "linear_conv_kernel_dim": 3,
        "num_experts": 0,
        "rms_norm_eps": 1e-6,
        "rope_theta": 10000.0,
        "tie_word_embeddings": False,
    })


@pytest.fixture(scope="module")
def engine():
    import jax
    import jax.numpy as jnp

    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=2048, chunked_prefill_size=32,
        max_prefill_tokens=64, attention_backend="xla",
        context_length=128, random_seed=0,
    )
    # f32 params shared with the standalone-generator ground truth (bf16
    # would drift the greedy argmax after a few steps on random weights)
    params = Qwen3NextFamily.init_params(
        jax.random.PRNGKey(0), _cfg(), jnp.float32)
    return Engine(server_args=args, model_config=_cfg(),
                  tokenizer=ByteTokenizer(), params=params)


def test_radix_disabled_for_hybrid(engine):
    assert engine.radix is None
    assert engine.runner.has_linear_state
    assert isinstance(engine.runner.kv_cache, dict)
    # paged cache only holds the 2 full-attention layers
    assert engine.runner.kv_cache["pages"].shape[0] == 2


def test_engine_matches_standalone_generator(engine):
    import jax

    sp = SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)
    prompts = [
        [3, 17, 42, 9, 88, 54, 11],
        [101, 7, 7, 23],
        [64, 65, 66, 67, 68, 69, 70, 71, 72, 73, 74],
    ]
    outs = engine.generate(input_ids=prompts, sampling_params=sp)
    # standalone generator on the SAME params (device -> host -> rebuilt)
    params = jax.device_get(engine.runner.params)
    gen = Qwen3NextGenerator(_cfg(), params, max_len=64)
    for p, out in zip(prompts, outs):
        ref = gen.generate(p, max_new_tokens=12)
        assert out["output_ids"] == list(ref), (p, out["output_ids"], ref)


def test_chunked_prefill_state_carry(engine):
    """A prompt longer than chunked_prefill_size exercises the
    state-carry across prefill chunks (q_start > 0 reads the pool)."""
    import jax

    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    long_prompt = [(i * 7 + 3) % 128 for i in range(50)]  # > 32-token chunk
    out = engine.generate(input_ids=long_prompt, sampling_params=sp)
    params = jax.device_get(engine.runner.params)
    gen = Qwen3NextGenerator(_cfg(), params, max_len=96)
    ref = gen.generate(long_prompt, max_new_tokens=8)
    assert out["output_ids"] == list(ref)


def test_sequential_batches_reuse_slots(engine):
    """Slot (first-page) reuse across request generations must not leak
    state: repeated identical requests give identical outputs."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    a = engine.generate(input_ids=[5, 6, 7, 8], sampling_params=sp)
    b = engine.generate(input_ids=[5, 6, 7, 8], sampling_params=sp)
    assert a["output_ids"] == b["output_ids"]
