"""Native C++ ngram trie drafter (reference analog:
srt/speculative/cpp_ngram/ngram.cpp) — differential vs the Python drafter
and e2e speculative decoding through the engine."""

import numpy as np
import pytest

from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.sched.req import Req
from sglang_diffusion_tpu.spec.ngram import NgramDrafter, NgramTrieDrafter


def _req(ids, rid="r0"):
    return Req(rid=rid, input_ids=list(ids),
               sampling_params=SamplingParams(max_new_tokens=8))


def test_trie_proposes_repeated_continuation():
    d = NgramTrieDrafter(ngram=2, num_draft_tokens=3)
    # history: the bigram (1,2) is always followed by 3,4,5
    hist = [1, 2, 3, 4, 5, 9, 1, 2, 3, 4, 5, 9, 1, 2]
    out = d.propose(_req(hist))
    assert out == [3, 4, 5]
    assert d.size > 0


def test_trie_counts_prefer_majority_branch():
    d = NgramTrieDrafter(ngram=2, num_draft_tokens=1)
    # (7,8) -> 9 twice, -> 5 once
    hist = [7, 8, 9, 0, 7, 8, 9, 0, 7, 8, 5, 0, 7, 8]
    out = d.propose(_req(hist))
    assert out == [9]


def test_trie_no_match_returns_empty():
    d = NgramTrieDrafter(ngram=2, num_draft_tokens=4)
    out = d.propose(_req([1, 2, 3, 4, 5]))
    # trailing bigram (4,5) never seen before -> no proposal
    assert out == []


def test_trie_incremental_observe_dedup():
    """observe() twice on the same history must not double-feed windows
    beyond the boundary overlap re-feed."""
    d = NgramTrieDrafter(ngram=2, num_draft_tokens=2)
    r = _req([1, 2, 3, 4])
    d.observe(r)
    s1 = d.size
    d.observe(r)  # no new tokens
    assert d.size == s1


def test_trie_shared_across_requests():
    """A pattern learned from one request drafts for another (the shared
    global trie is what the Python per-request matcher cannot do)."""
    d = NgramTrieDrafter(ngram=2, num_draft_tokens=2)
    d.observe(_req([11, 12, 13, 14, 11, 12, 13, 14], rid="a"))
    out = d.propose(_req([99, 11, 12], rid="b"))
    assert out == [13, 14]


def test_engine_e2e_with_trie_drafter():
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer

    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
        speculative_algorithm="ngram", speculative_num_draft_tokens=3,
    )
    eng = Engine(server_args=args, model_config=ModelConfig.tiny_llama(),
                 tokenizer=ByteTokenizer())
    assert isinstance(eng.scheduler.drafter, NgramTrieDrafter)
    sp = SamplingParams(temperature=0.0, max_new_tokens=24)
    out = eng.generate("abcabcabcabcabc", sp)
    assert len(out["output_ids"]) == 24
    # speculative decoding must be lossless vs plain greedy decode
    args2 = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
    )
    eng2 = Engine(server_args=args2, model_config=ModelConfig.tiny_llama(),
                  tokenizer=ByteTokenizer())
    out2 = eng2.generate("abcabcabcabcabc", sp)
    assert out["output_ids"] == out2["output_ids"]
