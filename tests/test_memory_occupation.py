"""RL memory release/resume (reference analog:
srt/entrypoints/engine.py:948 release/resume_memory_occupation)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _mk():
    return Engine(
        server_args=ServerArgs(
            model_path="", tokenizer_path="byte", page_size=8,
            max_total_tokens=2048, attention_backend="xla",
            context_length=256, random_seed=0),
        model_config=ModelConfig.tiny_llama(vocab_size=512),
        tokenizer=ByteTokenizer())


PROMPTS = ["release me", "and resume"]
SP = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)


def test_release_resume_roundtrip():
    eng = _mk()
    ref = [r["output_ids"] for r in eng.generate(PROMPTS, SP)]

    out = eng.release_memory_occupation()
    assert set(out["released"]) == {"kv_cache", "weights"}
    assert eng.runner.kv_cache is None
    assert eng.runner.params is None
    # all pages returned to the allocator (radix flushed)
    assert eng.scheduler.allocator.free_pages == eng.runner.num_pages - 1

    eng.resume_memory_occupation()
    assert eng.runner.kv_cache is not None and eng.runner.params is not None
    # weights round-tripped through host RAM: outputs identical
    again = [r["output_ids"] for r in eng.generate(PROMPTS, SP)]
    assert again == ref


def test_release_kv_only():
    eng = _mk()
    eng.generate(PROMPTS, SP)
    out = eng.release_memory_occupation(["kv_cache"])
    assert out["released"] == ["kv_cache"]
    assert eng.runner.kv_cache is None
    assert eng.runner.params is not None  # weights untouched
    eng.resume_memory_occupation(["kv_cache"])
    outs = eng.generate(["after kv resume"], SP)
    assert len(outs[0]["output_ids"]) == 8


def test_release_requires_idle():
    eng = _mk()
    from sglang_diffusion_tpu.sched.req import Req

    eng.scheduler.waiting.append(
        Req(rid="x", input_ids=[1, 2], sampling_params=SP,
            eos_token_ids=[]))
    with pytest.raises(RuntimeError):
        eng.release_memory_occupation()
