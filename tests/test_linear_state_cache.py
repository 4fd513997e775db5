"""Hybrid linear-state prefix cache (kv/linear_state_cache.py; reference
analog: srt/mem_cache/mamba_radix_cache.py).

Invariants:
- multi-turn: a request extending a previous request's full prefix
  reuses its pages + state snapshot (cached_tokens > 0) and produces
  EXACTLY the tokens a cold engine produces;
- page accounting stays leak-free through save/restore/evict;
- eviction under memory pressure frees entries and the engine recovers.
"""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _qwen3_next_cfg():
    return ModelConfig(
        architecture="Qwen3NextForCausalLM",
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=4,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=512,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        raw={
            "full_attention_interval": 2,
            "linear_conv_kernel_dim": 4,
            "linear_key_head_dim": 16,
            "linear_value_head_dim": 16,
            "linear_num_key_heads": 2,
            "linear_num_value_heads": 4,
            "partial_rotary_factor": 0.25,
        },
    )


def _engine(**kw):
    kw.setdefault("max_total_tokens", 2048)
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        attention_backend="xla", context_length=512,
        enable_decode_pipelining=False, **kw,
    )
    return Engine(server_args=args, model_config=_qwen3_next_cfg(),
                  tokenizer=ByteTokenizer())


def test_multi_turn_reuse_exact():
    sp = SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)
    eng = _engine()
    assert eng.scheduler.linear_cache is not None

    turn1 = "the quick brown fox jumps over it"
    out1 = eng.generate(turn1, sp)
    assert len(eng.scheduler.linear_cache.entries) == 1

    # turn 2 extends turn 1's (prompt + output); prefix must hit
    hist = eng.tokenizer.encode(turn1) + out1["output_ids"]
    turn2_ids = hist + eng.tokenizer.encode(" tell me more",
                                            add_bos=False)
    out2 = eng.generate(input_ids=turn2_ids, sampling_params=sp)
    assert out2["meta_info"]["cached_tokens"] > 0
    assert eng.scheduler.linear_cache.hits == 1

    # a COLD engine given the same turn-2 ids must produce the same tokens
    cold = _engine()
    ref = cold.generate(input_ids=turn2_ids, sampling_params=sp)
    assert out2["output_ids"] == ref["output_ids"]

    # accounting stays clean
    eng.scheduler.self_check_idle()


def test_chained_turns_and_accounting():
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    eng = _engine()
    ids = eng.tokenizer.encode("base prompt for chaining")
    for turn in range(3):
        out = eng.generate(input_ids=ids, sampling_params=sp)
        ids = ids + out["output_ids"] + eng.tokenizer.encode(
            f" turn {turn}", add_bos=False)
    # ladder built: 3 entries chained, later turns hit earlier ones
    assert len(eng.scheduler.linear_cache.entries) == 3
    assert eng.scheduler.linear_cache.hits >= 2
    eng.scheduler.self_check_idle()


def test_eviction_under_pressure():
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    # small pool: 32 pages of 8 tokens
    eng = _engine(max_total_tokens=256)
    rng = np.random.default_rng(0)
    for i in range(6):
        ids = [int(t) for t in rng.integers(0, 500, size=(60,))]
        eng.generate(input_ids=ids, sampling_params=sp)
    # pool pressure forced evictions; engine still healthy + leak-free
    out = eng.generate("after the pressure", sp)
    assert len(out["output_ids"]) == 8
    eng.scheduler.self_check_idle()


def test_no_reuse_when_disabled():
    eng = _engine(disable_radix_cache=True)
    assert eng.scheduler.linear_cache is None
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    eng.generate("plain run", sp)
    eng.scheduler.self_check_idle()
