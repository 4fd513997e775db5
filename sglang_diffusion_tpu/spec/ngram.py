"""N-gram speculative drafting.

Reference analog: srt/speculative/ngram_worker.py + cpp_ngram/ngram.cpp
(a C++ trie over recent token history proposing draft continuations).
Round 1: a per-request suffix-match drafter in Python — propose the tokens
that followed the most recent occurrence of the current (n)-gram in the
request's own prompt+output history. Verification happens on device in one
compiled step (see engine/model_runner.py verify path); greedy acceptance.
"""

from __future__ import annotations

from typing import Dict, List, Tuple

from sglang_diffusion_tpu.sched.req import Req


class NgramDrafter:
    def __init__(self, ngram: int = 2, num_draft_tokens: int = 4):
        self.n = ngram
        self.k = num_draft_tokens

    def propose_all(self, reqs: List[Req]) -> List[List[int]]:
        """Batched interface shared with EagleDrafter."""
        return [self.propose(r) for r in reqs]

    def propose(self, req: Req) -> List[int]:
        """Draft up to k tokens by matching the trailing n-gram against the
        request's history (most recent match wins)."""
        hist = req.all_ids()
        if len(hist) <= self.n:
            return []
        key = tuple(hist[-self.n:])
        # scan backwards for the previous occurrence of the n-gram
        # (excluding the trailing position itself)
        limit = len(hist) - self.n
        for start in range(limit - 1, -1, -1):
            if tuple(hist[start : start + self.n]) == key:
                cont = hist[start + self.n : start + self.n + self.k]
                if cont:
                    return list(cont)
        return []
