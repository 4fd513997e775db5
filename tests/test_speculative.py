"""Ngram speculative decoding: outputs must be IDENTICAL to plain greedy
decoding (greedy verify is lossless), with accepted tokens > 0 on
repetitive text (reference analog: test/registered/speculative)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.spec.ngram import NgramDrafter
from sglang_diffusion_tpu.sched.req import Req


def make_engine(spec=None):
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        attention_backend="xla",
        context_length=512,
        speculative_algorithm=spec,
        speculative_num_draft_tokens=4,
        # bf16 produces exact logit ties on random weights; tie-breaking is
        # then shape-dependent (decode [B,V] vs verify [B,T,V] matmuls),
        # breaking the greedy-equality invariant this test checks
        dtype="float32",
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    return Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())


def test_drafter_proposes_from_history():
    d = NgramDrafter(ngram=2, num_draft_tokens=3)
    req = Req(
        rid="x",
        input_ids=[1, 2, 3, 4, 5, 1, 2],
        sampling_params=SamplingParams(),
    )
    # trailing bigram (1,2) occurred at position 0 followed by 3,4,5
    assert d.propose(req) == [3, 4, 5]
    req2 = Req(rid="y", input_ids=[9, 8, 7], sampling_params=SamplingParams())
    assert d.propose(req2) == []


def test_spec_matches_plain_greedy():
    sp = SamplingParams(temperature=0.0, max_new_tokens=24, ignore_eos=True)
    prompts = [
        "abcabcabcabc",  # repetitive: drafts should hit
        "the quick brown fox the quick brown fox",
        "xyz",  # no ngram repeats
    ]
    ref = make_engine(None).generate(prompts, sp)
    eng = make_engine("ngram")
    got = eng.generate(prompts, sp)
    for a, b in zip(ref, got):
        assert a["output_ids"] == b["output_ids"]
    # greedy output of a repetitive prompt loops -> drafter must score
    assert eng.scheduler.spec_draft_tokens > 0
    assert eng.scheduler.spec_accepted_tokens > 0


def test_spec_with_radix_cache_roundtrip():
    eng = make_engine("ngram")
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    p = "cache me repeatedly cache me repeatedly"
    out1 = eng.generate(p, sp)
    out2 = eng.generate(p, sp)
    assert out1["output_ids"] == out2["output_ids"]
    assert out2["meta_info"]["cached_tokens"] > 0


def test_draft_model_lossless():
    """Standalone draft-model speculation must be lossless vs plain greedy
    (reference: srt/speculative/ standalone draft path)."""
    plain = make_engine()
    spec = make_engine(spec="draft_model")
    sp = SamplingParams(max_new_tokens=20, temperature=0.0)
    prompts = ["the quick brown fox " * 3, "abc abc abc abc"]
    ref = [r["output_ids"] for r in plain.generate(prompts, sp)]
    out = [r["output_ids"] for r in spec.generate(prompts, sp)]
    assert ref == out
    assert spec.scheduler.spec_draft_tokens > 0
