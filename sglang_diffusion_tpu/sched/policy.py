"""Scheduling policy + prefill admission budgeting.

Reference analog: srt/managers/schedule_policy.py:77 (policies) and :372
(PrefillAdder). Reproduces the behavioral invariants from SURVEY.md
Appendix A:

- LPM (longest-prefix-match) re-sorts the waiting queue by radix-cache match
  length each admission pass; falls back to FCFS above 128 waiting requests
  to bound sort cost (schedule_policy.py:159-161).
- PrefillAdder enforces budgets: total KV tokens discounted by
  new_token_ratio, per-pass input tokens, and the chunked-prefill chunk size.
  A partially admitted request becomes the chunked request and is re-added
  first on the next pass.
"""

from __future__ import annotations

import random
from dataclasses import dataclass
from typing import List, Optional, Tuple

from sglang_diffusion_tpu.kv.radix_cache import RadixCache
from sglang_diffusion_tpu.sched.req import Req

LPM_FALLBACK_THRESHOLD = 128


def sort_waiting_queue(
    policy: str, queue: List[Req], radix: Optional[RadixCache]
) -> List[Req]:
    # explicit request priority dominates every policy (reference:
    # Req.priority, schedule_batch.py:489-560 + priority scheduling in
    # schedule_policy.py); higher value = served first, FIFO within a tier
    if any(getattr(r, "priority", 0) for r in queue):
        order = {id(r): i for i, r in enumerate(queue)}
        queue = sorted(
            queue, key=lambda r: (-getattr(r, "priority", 0), order[id(r)])
        )
    if policy == "fcfs" or radix is None:
        return queue
    if policy == "lpm":
        if len(queue) > LPM_FALLBACK_THRESHOLD:
            return queue
        scored: List[Tuple[int, int, int, Req]] = []
        for i, r in enumerate(queue):
            pages, _ = radix.match_prefix(r.input_ids)
            scored.append((-getattr(r, "priority", 0), -len(pages), i, r))
        scored.sort(key=lambda t: (t[0], t[1], t[2]))
        return [r for _, _, _, r in scored]
    if policy == "lof":  # longest output first
        return sorted(
            queue, key=lambda r: (-getattr(r, "priority", 0),
                                  -r.sampling_params.max_new_tokens)
        )
    if policy == "random":
        q = list(queue)
        random.shuffle(q)
        if any(getattr(r, "priority", 0) for r in q):
            q.sort(key=lambda r: -getattr(r, "priority", 0))
        return q
    raise ValueError(f"unknown policy {policy}")


@dataclass
class PrefillBudget:
    rem_total_tokens: float  # KV headroom, discounted per running req
    rem_input_tokens: int  # per-pass prefill token budget
    rem_chunk_tokens: int  # chunked prefill budget (-1 = disabled)
    rem_reqs: int  # request-count cap


class PrefillAdder:
    """Decides which waiting requests join the next prefill batch."""

    def __init__(
        self,
        free_kv_tokens: int,
        running_reqs: List[Req],
        new_token_ratio: float,
        max_prefill_tokens: int,
        chunked_prefill_size: int,
        max_batch_reqs: int,
        page_size: int,
    ):
        # discount headroom by the expected decode growth of running reqs
        # (reference: schedule_policy.py:380-524)
        reserved = sum(
            int(r.remaining_new_tokens() * new_token_ratio) for r in running_reqs
        )
        self.budget = PrefillBudget(
            rem_total_tokens=free_kv_tokens - reserved,
            rem_input_tokens=max_prefill_tokens,
            rem_chunk_tokens=chunked_prefill_size,
            rem_reqs=max_batch_reqs - len(running_reqs),
        )
        self.new_token_ratio = new_token_ratio
        self.page_size = page_size
        self.admitted: List[Tuple[Req, int]] = []  # (req, extend_len this pass)
        self.chunked_req: Optional[Req] = None

    def try_add(self, req: Req, cached_prefix_len: int) -> str:
        """Returns "added", "chunked" (partially added), or "full" (stop)."""
        if self.budget.rem_reqs <= 0:
            return "full"
        # fill covers prompt + already-sampled outputs (retracted requests
        # re-prefill their generated tokens too; disagg-imported requests
        # carry a first token) — using input_ids alone undercounts and can
        # strand the request un-sampled
        extend = len(req.all_ids()) - cached_prefix_len
        # new KV this req will need overall (extend + expected decode)
        need = extend + int(
            req.sampling_params.max_new_tokens * self.new_token_ratio
        )
        if need > self.budget.rem_total_tokens:
            return "full"
        take = min(extend, self.budget.rem_input_tokens)
        if self.budget.rem_chunk_tokens >= 0:
            take = min(take, self.budget.rem_chunk_tokens)
        # chunk boundaries page-aligned so cached prefixes stay page-aligned
        if take < extend:
            take = take // self.page_size * self.page_size
        if take <= 0:
            return "full"
        self.budget.rem_total_tokens -= need
        self.budget.rem_input_tokens -= take
        if self.budget.rem_chunk_tokens >= 0:
            self.budget.rem_chunk_tokens -= take
        self.budget.rem_reqs -= 1
        self.admitted.append((req, take))
        if take < extend:
            self.chunked_req = req
            return "chunked"
        return "added"
