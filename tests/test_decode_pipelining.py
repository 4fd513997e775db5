"""Cross-call decode pipelining must be output-identical to the sync path
(reference analog: overlap-scheduler equivalence tests)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def make_engine(pipelining, **over):
    kw = dict(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        attention_backend="xla",
        context_length=512,
        decode_horizon=4,
        enable_decode_pipelining=pipelining,
        random_seed=0,
    )
    kw.update(over)
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    return Engine(
        server_args=ServerArgs(**kw), model_config=cfg, tokenizer=ByteTokenizer()
    )


CASES = [
    # (prompts, sampling kwargs)
    (["pipeline me please"], dict(temperature=0.0, max_new_tokens=24, ignore_eos=True)),
    (
        ["a" * 40, "different prompt"],
        dict(temperature=0.0, max_new_tokens=17, ignore_eos=True),
    ),
    # EOS can fire mid-window (drain path)
    (["eos midwindow"], dict(temperature=0.0, max_new_tokens=64)),
    # seeded sampling through the pipelined path
    (["sampled run"], dict(temperature=0.8, max_new_tokens=20, seed=5, ignore_eos=True)),
]


@pytest.mark.parametrize("case_idx", range(len(CASES)))
def test_pipelined_matches_sync(case_idx):
    prompts, sp_kw = CASES[case_idx]
    sp = SamplingParams(**sp_kw)
    ref = make_engine(False).generate(list(prompts), sp)
    got = make_engine(True).generate(list(prompts), sp)
    if isinstance(ref, dict):
        ref, got = [ref], [got]
    for a, b in zip(ref, got):
        assert a["output_ids"] == b["output_ids"]
        assert a["meta_info"]["finish_reason"] == b["meta_info"]["finish_reason"]


def test_pipelined_stop_token_and_leak_check():
    eng_ref = make_engine(False)
    probe = eng_ref.generate(
        "probe stop", SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)
    )
    stop_tok = probe["output_ids"][5]
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=12, stop_token_ids=[stop_tok], ignore_eos=True
    )
    ref = eng_ref.generate("probe stop", sp)
    eng = make_engine(True)
    got = eng.generate("probe stop", sp)
    assert got["output_ids"] == ref["output_ids"]
    eng.scheduler.self_check_idle()


def test_pipelined_interleaved_arrivals():
    """New arrivals break the pipelined phase cleanly and still prefill."""
    eng = make_engine(True)
    sp = SamplingParams(temperature=0.0, max_new_tokens=20, ignore_eos=True)
    r1 = eng._make_req("first long running request", None, sp)
    r2 = eng._make_req("late arrival", None, sp)
    eng.scheduler.add_request(r1)
    for i in range(60):
        eng.step()
        if i == 1:
            eng.scheduler.add_request(r2)
        if r1.finished and r2.finished:
            break
    assert r1.finished and r2.finished
    ref = make_engine(False)
    a = ref.generate("first long running request", sp)
    # r1 ran partially batched with r2; greedy output must match solo run
    assert r1.output_ids == a["output_ids"]
    eng.scheduler.self_check_idle()
