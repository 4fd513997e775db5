"""End-to-end Engine tests on CPU devices with a tiny random model and the
byte tokenizer (analog of the reference's GPU-free CI engine suite,
SURVEY.md §4: CPU backend + naive_distributed)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


@pytest.fixture(scope="module")
def engine():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        chunked_prefill_size=32,
        max_prefill_tokens=64,
        attention_backend="xla",
        context_length=512,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    return Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())


def test_single_greedy(engine):
    out = engine.generate(
        "hello world", SamplingParams(temperature=0.0, max_new_tokens=8)
    )
    assert len(out["output_ids"]) == 8
    assert out["meta_info"]["finish_reason"] in ("length", "stop")
    assert out["meta_info"]["prompt_tokens"] == len("hello world") + 1


def test_batch_generate(engine):
    prompts = [f"prompt number {i} with some text" for i in range(5)]
    outs = engine.generate(prompts, SamplingParams(temperature=0.0, max_new_tokens=6))
    assert len(outs) == 5
    for o in outs:
        assert len(o["output_ids"]) <= 6


def test_greedy_deterministic_and_prefix_cached(engine):
    sp = SamplingParams(temperature=0.0, max_new_tokens=10)
    prompt = "the quick brown fox jumps over the lazy dog" * 2
    out1 = engine.generate(prompt, sp)
    out2 = engine.generate(prompt, sp)
    assert out1["output_ids"] == out2["output_ids"]
    # second run should hit the radix cache
    assert out2["meta_info"]["cached_tokens"] > 0


def test_chunked_prefill_long_prompt(engine):
    # prompt longer than chunked_prefill_size forces multi-chunk prefill
    prompt = "a" * 200
    out = engine.generate(prompt, SamplingParams(temperature=0.0, max_new_tokens=4))
    assert len(out["output_ids"]) == 4
    assert out["meta_info"]["prompt_tokens"] == 201


def test_sampling_with_seed_params(engine):
    out = engine.generate(
        "sample this",
        SamplingParams(temperature=0.8, top_p=0.9, top_k=40, max_new_tokens=12),
    )
    assert 0 < len(out["output_ids"]) <= 12


def test_stop_token(engine):
    # find which token greedy decoding emits, then use it as a stop token
    probe = engine.generate("abcabc", SamplingParams(temperature=0.0, max_new_tokens=5))
    stop_tok = probe["output_ids"][2]
    out = engine.generate(
        "abcabc",
        SamplingParams(temperature=0.0, max_new_tokens=5, stop_token_ids=[stop_tok]),
    )
    # generation must halt at the first occurrence of the stop token
    first_idx = probe["output_ids"].index(stop_tok)
    assert out["output_ids"][-1] == stop_tok
    assert len(out["output_ids"]) == first_idx + 1
    assert out["meta_info"]["finish_reason"] == "stop"


def test_streaming(engine):
    chunks = list(
        engine.stream_generate(
            "stream me", SamplingParams(temperature=0.0, max_new_tokens=6)
        )
    )
    assert chunks[-1]["finished"]
    full = "".join(c["text"] for c in chunks)
    ref = engine.generate("stream me", SamplingParams(temperature=0.0, max_new_tokens=6))
    assert full == ref["text"]


def test_mixed_continuous_batching(engine):
    """Interleave requests of different lengths through the raw step API."""
    sp_short = SamplingParams(temperature=0.0, max_new_tokens=3)
    sp_long = SamplingParams(temperature=0.0, max_new_tokens=12)
    r1 = engine._make_req("first request", None, sp_long)
    r2 = engine._make_req("second", None, sp_short)
    engine.scheduler.add_request(r1)
    done = []
    for i in range(40):
        done += engine.step()
        if i == 2:
            engine.scheduler.add_request(r2)
        if len(done) == 2:
            break
    assert {r.rid for r in done} == {r1.rid, r2.rid}
    assert len(r1.output_ids) == 12 and len(r2.output_ids) == 3


def test_retraction_under_memory_pressure():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=360,  # tiny pool to force retraction
        chunked_prefill_size=64,
        max_prefill_tokens=64,
        attention_backend="xla",
        context_length=256,
        disable_radix_cache=True,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    prompts = ["x" * 60, "y" * 60, "z" * 60]
    outs = eng.generate(prompts, SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True))
    for o in outs:
        assert len(o["output_ids"]) == 40
    # with 360 tokens for 3 x (61+40) = 303 plus padding-page slack the
    # scheduler may or may not retract, but it must never corrupt outputs:
    # verify against sequential runs
    eng2 = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    for p, o in zip(prompts, outs):
        ref = eng2.generate(p, SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True))
        assert ref["output_ids"] == o["output_ids"]


def test_no_page_leaks_after_mixed_workload(engine):
    """Idle-state page accounting (reference: self_check_during_idle)."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=5)
    engine.generate(["leak check one", "leak check two " * 10], sp)
    engine.generate("leak check one", sp)  # cache hit path
    engine.scheduler.self_check_idle()


def test_no_page_leaks_with_stops_and_aborts(engine):
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, stop=["zz"])
    engine.generate("stop strings and pages", sp)
    r = engine._make_req("to be aborted", None,
                         SamplingParams(temperature=0.0, max_new_tokens=50))
    engine.scheduler.add_request(r)
    engine.step()
    engine.abort_request(r.rid)
    for _ in range(10):
        if not engine.scheduler.has_work():
            break
        engine.step()
    engine.scheduler.self_check_idle()
