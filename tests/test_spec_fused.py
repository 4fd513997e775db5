"""Fused multi-round speculative decoding (spec/fused_eagle.py).

Invariants:
- losslessness: greedy output with the fused spec phase enabled is
  bit-identical to the plain engine AND to the per-round EAGLE path
  (reference analog: the overlap-capable eagle_worker_v2 must match the
  non-overlap worker's outputs).
- the fused phase actually engages (device rounds run, acceptance
  bookkeeping advances).
"""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams

PROMPTS = [
    "the quick brown fox jumps over the lazy dog. " * 3,
    "aaaa bbbb aaaa bbbb aaaa",
    "hello world",
]


def _make_engine(**kw):
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, chunked_prefill_size=32,
        attention_backend="xla", context_length=512, **kw,
    )
    return Engine(server_args=args, model_config=cfg,
                  tokenizer=ByteTokenizer())


def test_fused_spec_lossless_and_engaged():
    plain = _make_engine(enable_decode_pipelining=False)
    fused = _make_engine(
        speculative_algorithm="eagle", speculative_num_draft_tokens=3,
        enable_decode_pipelining=True, speculative_fused_rounds=2,
    )
    sp = SamplingParams(max_new_tokens=24, temperature=0.0)
    ref = [r["output_ids"] for r in plain.generate(PROMPTS, sp)]
    out = [r["output_ids"] for r in fused.generate(PROMPTS, sp)]
    import os
    if os.environ.get("SPEC_DEBUG") and ref != out:
        for i, (a, b) in enumerate(zip(ref, out)):
            d = next((j for j, (x, y) in enumerate(zip(a, b)) if x != y), None)
            print(f"prompt {i} diverge {d}")
            if d is not None:
                print(" ref", a[max(0,d-4):d+6]); print(" out", b[max(0,d-4):d+6])
        print("spec:", fused.scheduler.spec_draft_tokens,
              fused.scheduler.spec_accepted_tokens)
    assert ref == out
    # the fused phase ran device rounds (draft counters advanced well past
    # what the single seeding verify round could account for)
    assert fused.scheduler.spec_draft_tokens > 3 * len(PROMPTS)


def test_fused_spec_matches_per_round_path():
    per_round = _make_engine(
        speculative_algorithm="eagle", speculative_num_draft_tokens=3,
        enable_decode_pipelining=False,
    )
    fused = _make_engine(
        speculative_algorithm="eagle", speculative_num_draft_tokens=3,
        enable_decode_pipelining=True, speculative_fused_rounds=3,
    )
    sp = SamplingParams(max_new_tokens=24, temperature=0.0)
    ref = [r["output_ids"] for r in per_round.generate(PROMPTS, sp)]
    out = [r["output_ids"] for r in fused.generate(PROMPTS, sp)]
    assert ref == out


def test_fused_spec_mtp_lossless():
    plain = _make_engine(enable_decode_pipelining=False)
    fused = _make_engine(
        speculative_algorithm="mtp", speculative_num_draft_tokens=2,
        enable_decode_pipelining=True, speculative_fused_rounds=2,
    )
    sp = SamplingParams(max_new_tokens=24, temperature=0.0)
    ref = [r["output_ids"] for r in plain.generate(PROMPTS[:2], sp)]
    out = [r["output_ids"] for r in fused.generate(PROMPTS[:2], sp)]
    assert ref == out


def test_fused_spec_eos_and_stop():
    """A request finishing mid-window (max_new_tokens) must not corrupt
    neighbours; mixed output lengths exercise overshoot dropping."""
    fused = _make_engine(
        speculative_algorithm="eagle", speculative_num_draft_tokens=3,
        enable_decode_pipelining=True, speculative_fused_rounds=2,
    )
    plain = _make_engine(enable_decode_pipelining=False)
    sp_short = SamplingParams(max_new_tokens=5, temperature=0.0)
    sp_long = SamplingParams(max_new_tokens=23, temperature=0.0)
    for sp in (sp_short, sp_long):
        ref = [r["output_ids"] for r in plain.generate(PROMPTS, sp)]
        out = [r["output_ids"] for r in fused.generate(PROMPTS, sp)]
        assert ref == out
