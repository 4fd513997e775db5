"""Continuous-batching scheduler (single-controller).

Reference analog: Scheduler in srt/managers/scheduler.py:251 with its
event loops (:1154/:1181), get_new_batch_prefill (:2015),
update_running_batch (:2247) and the retraction feedback loop
(SURVEY.md Appendix A). Differences by design:

- Single controller: there is one scheduler in the engine process driving
  SPMD jit steps — no per-device scheduler processes, no ZMQ/shm fan-out
  (reference needed one scheduler per GPU rank + shm broadcast).
- Batches are host-side numpy plans; the ModelRunner pads them to bucketed
  static shapes for the compiled step (replacing CUDA-graph capture).

Behavioral invariants kept from the reference:
- prefill admission with PrefillAdder budgets + chunked prefill
- LPM cache-aware policy with FCFS fallback
- decode-OOM retraction (longest output first), new_token_ratio feedback:
  jumps on retraction, decays toward the floor on success
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field
from typing import Deque, Dict, List, Optional, Tuple

import numpy as np

from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.kv.allocator import PageAllocator
from sglang_diffusion_tpu.kv.radix_cache import RadixCache
from sglang_diffusion_tpu.sched.policy import PrefillAdder, sort_waiting_queue
from sglang_diffusion_tpu.sched.req import FinishReason, Req, ReqStatus
from sglang_diffusion_tpu.utils.common import cdiv, get_logger

logger = get_logger("scheduler")


@dataclass
class BatchPlan:
    """Host-side plan for one forward step (numpy, unpadded)."""

    kind: str  # "prefill" | "decode"
    reqs: List[Req]
    token_ids: np.ndarray  # prefill: [B, Lq]; decode: [B, 1]
    positions: np.ndarray  # same shape
    page_table: np.ndarray  # [B, max_pages]
    kv_lens: np.ndarray  # [B]
    q_start: np.ndarray  # [B]
    slots: np.ndarray  # prefill: [B, Lq]; decode: [B, horizon]
    logit_idx: np.ndarray  # [B]
    sample_mask: np.ndarray  # [B] bool — whether the sampled token is kept
    # decode only: number of fused decode steps in this plan (device-side
    # token feedback; KV may be written for overshoot tokens past a stop —
    # harmless, the pages belong to the request)
    horizon: int = 1
    # verify only: per-request draft lengths (ngram speculative decoding)
    draft_lens: Optional[np.ndarray] = None
    # tree verify (EAGLE topk>1): per-request alternate-first-token counts
    # and the in-batch ancestor mask [B, T, T] (reference analog: tree
    # masks in TARGET_VERIFY, sgl-kernel speculative/eagle_utils.cu)
    alt_lens: Optional[np.ndarray] = None
    tree_mask: Optional[np.ndarray] = None


class Scheduler:
    def __init__(
        self,
        args: ServerArgs,
        allocator: PageAllocator,
        radix: Optional[RadixCache],
        max_pages_per_seq: int,
    ):
        self.args = args
        self.allocator = allocator
        self.radix = radix
        self.page_size = args.page_size
        self.max_pages_per_seq = max_pages_per_seq

        self.waiting: Deque[Req] = deque()
        self.running: List[Req] = []
        self.chunked_req: Optional[Req] = None

        # retraction feedback (reference scheduler.py new_token_ratio decay)
        self.min_new_token_ratio = 0.2 * args.schedule_conservativeness
        self.max_new_token_ratio = 0.9
        self.new_token_ratio = 0.5 * args.schedule_conservativeness
        self.new_token_ratio_decay = 0.95

        # stats
        self.num_retracted = 0
        self.num_finished = 0
        self.cached_tokens_served = 0
        self.total_prompt_tokens = 0
        self.spec_draft_tokens = 0
        self.spec_accepted_tokens = 0
        self.jump_forward_tokens = 0

        # speculative decoding (reference: srt/speculative/)
        # "eagle": the Engine assigns an EagleDrafter after building the
        # ModelRunner (the draft head shares the runner's attention backend
        # and page geometry)
        self.drafter = None
        # set by the engine: copies one token's KV between flat slots (tree
        # verify acceptance of an alternate branch)
        self.kv_copy_fn = None
        # set by the engine for all-sliding-window models: enables
        # mid-flight reclamation of pages behind the attention window
        self.swa_window = None
        # hybrid linear-attention prefix cache (kv/linear_state_cache.py;
        # reference analog: mamba_radix_cache.py) — set by the engine
        self.linear_cache = None
        self.swa_reclaimed_pages = 0
        if args.speculative_algorithm == "ngram":
            from sglang_diffusion_tpu.spec.ngram import (
                NgramDrafter,
                NgramTrieDrafter,
            )

            try:
                # native shared trie (reference: cpp_ngram/ngram.cpp)
                self.drafter = NgramTrieDrafter(
                    num_draft_tokens=args.speculative_num_draft_tokens
                )
            except Exception:  # toolchain unavailable
                self.drafter = NgramDrafter(
                    num_draft_tokens=args.speculative_num_draft_tokens
                )

    # ------------- intake -------------
    def add_request(self, req: Req) -> None:
        self.waiting.append(req)

    def abort_request(self, rid: str) -> bool:
        for r in self.waiting:
            if r.rid == rid:
                r.status = ReqStatus.ABORTED
                r.finish_reason = FinishReason.ABORT
                self.waiting.remove(r)
                return True
        for r in self.running:
            if r.rid == rid:
                r.status = ReqStatus.ABORTED
                r.finish_reason = FinishReason.ABORT
                # pages are released on the next process_decode_result pass
                return True
        return False

    def has_work(self) -> bool:
        return bool(self.waiting or self.running or self.chunked_req)

    def self_check_idle(self) -> None:
        """Page-accounting invariant when idle: free + tree-held pages must
        equal the pool (reference: scheduler_runtime_checker_mixin.py:342
        self_check_during_idle leak detection). Raises on leaks."""
        if self.has_work():
            return
        tree_pages = 0
        if self.linear_cache is not None:
            tree_pages += self.linear_cache.held_pages()
        if self.radix is not None and hasattr(self.radix, "root"):
            if self.radix.root is not None:
                stack = [self.radix.root]
                while stack:
                    n = stack.pop()
                    tree_pages += len(n.pages)
                    stack.extend(n.children.values())
            else:  # native tree: infer from token accounting
                tree_pages = (
                    self.radix.total_cached_tokens() // self.page_size
                )
        total = self.allocator.free_pages + tree_pages
        expect = self.allocator.num_pages - 1  # page 0 reserved
        if total != expect:
            raise AssertionError(
                f"KV page leak: free={self.allocator.free_pages} "
                f"tree={tree_pages} != pool={expect}"
            )

    def check_timeouts(self) -> List[Req]:
        """Abort requests exceeding waiting/running timeouts (reference:
        scheduler.py:1098 _abort_on_running_timeout, :1827 waiting)."""
        import time as _time

        aborted: List[Req] = []
        now = _time.monotonic()
        wt, rt = self.args.waiting_timeout_s, self.args.running_timeout_s
        if wt > 0:
            for r in list(self.waiting):
                if now - r.created_at > wt:
                    r.status = ReqStatus.ABORTED
                    r.finish_reason = FinishReason.ABORT
                    self.waiting.remove(r)
                    aborted.append(r)
        if rt > 0:
            for r in list(self.running):
                if now - r.created_at > rt:
                    r.status = ReqStatus.ABORTED
                    r.finish_reason = FinishReason.ABORT
                    self.running.remove(r)
                    self._release_pages(r, insert_to_cache=False)
                    aborted.append(r)
        return aborted

    # ------------- batch selection -------------
    def get_next_batch(self) -> Optional[BatchPlan]:
        plan = self._get_prefill_batch()
        if plan is not None:
            return plan
        plan = self._get_jump_forward_batch()
        if plan is not None:
            return plan
        return self._get_decode_batch()

    # ------- grammar jump-forward -------
    def _try_jump_forward(self, req: Req) -> None:
        """When the grammar forces a span, append its tokens WITHOUT model
        forwards (reference: xgrammar jump-forward). Their KV is recomputed
        in one extend batch next round (_get_jump_forward_batch) — same
        re-tokenize-and-extend discipline as the reference."""
        g = req.grammar
        text = getattr(g, "jump_forward_text", lambda: "")()
        if not text:
            return
        rem = req.remaining_new_tokens()
        if rem <= 1:
            return
        tok = g.manager.tokenizer

        def enc(s):
            try:
                return tok.encode(s, add_special_tokens=False)
            except TypeError:
                return tok.encode(s)

        # Re-tokenize a small decoded suffix together with the forced span
        # so BPE merges across the boundary stay canonical (reference:
        # xgrammar jump-forward re-tokenizes text + jump string). Only
        # accepted when the suffix's own tokens survive unchanged —
        # rewriting already-computed tokens would need grammar rollback.
        ids = None
        tail = req.all_ids()[-8:]
        if tail:
            try:
                merged = enc(tok.decode(tail) + text)
                if merged[: len(tail)] == list(tail):
                    ids = merged[len(tail):]
            except Exception:  # noqa: BLE001 — non-round-tripping tokenizer
                ids = None
        if ids is None:
            ids = enc(text)
        # drop specials (BOS etc.): zero-text tokens contribute nothing to
        # the forced span and would fail grammar validation
        strs = g.manager.token_strings()
        ids = [t for t in ids if t < len(strs) and strs[t] is not None]
        ids = ids[: rem - 1]
        if not ids:
            return
        # pages for the forced span + the token sampled after it
        if not self._ensure_pages(req, req.total_len + len(ids) + 1):
            return
        if not g.try_advance_tokens(ids):
            return  # tokenization mismatch: fall back to per-token masking
        req.output_ids.extend(ids)
        if req.sampling_params.return_logprob:
            req.output_logprobs.extend([0.0] * len(ids))
        self.jump_forward_tokens += len(ids)

    def _get_jump_forward_batch(self) -> Optional[BatchPlan]:
        """Extend batch over running reqs with uncomputed forced tokens
        (total_len-1 > num_computed): computes their KV and samples after
        the last forced token. Pages were ensured at append time."""
        pend = [
            r for r in self.running
            if r.is_prefill_done and r.total_len - 1 > r.num_computed
        ]
        if not pend:
            return None
        b = len(pend)
        lq = max(r.total_len - r.num_computed for r in pend)
        token_ids = np.zeros((b, lq), np.int32)
        positions = np.zeros((b, lq), np.int32)
        slots = np.full((b, lq), -1, np.int32)
        page_table = np.zeros((b, self.max_pages_per_seq), np.int32)
        kv_lens = np.zeros((b,), np.int32)
        q_start = np.zeros((b,), np.int32)
        logit_idx = np.zeros((b,), np.int32)
        for i, req in enumerate(pend):
            start = req.num_computed
            take = req.total_len - start
            chunk = req.all_ids()[start:]
            token_ids[i, :take] = chunk
            positions[i, :take] = np.arange(start, start + take)
            pv = np.asarray(req.pages, np.int32)
            page_table[i, : len(pv)] = pv
            kv_lens[i] = start + take
            q_start[i] = start
            abs_pos = np.arange(start, start + take)
            slots[i, :take] = pv[abs_pos // self.page_size] * self.page_size + (
                abs_pos % self.page_size
            )
            logit_idx[i] = take - 1
        return BatchPlan(
            kind="prefill",
            reqs=pend,
            token_ids=token_ids,
            positions=positions,
            page_table=page_table,
            kv_lens=kv_lens,
            q_start=q_start,
            slots=slots,
            logit_idx=logit_idx,
            sample_mask=np.ones((b,), bool),
        )

    # ------- prefill -------
    def _get_prefill_batch(self) -> Optional[BatchPlan]:
        if not self.waiting and self.chunked_req is None:
            return None
        adder = PrefillAdder(
            free_kv_tokens=self.allocator.free_tokens
            + (self.radix.evictable_tokens if self.radix else 0)
            + (self.linear_cache.evictable_tokens()
               if self.linear_cache else 0),
            running_reqs=self.running,
            new_token_ratio=self.new_token_ratio,
            max_prefill_tokens=self.args.max_prefill_tokens,
            chunked_prefill_size=(
                self.args.chunked_prefill_size
                if self.args.chunked_prefill_size > 0
                else -1
            ),
            max_batch_reqs=self.args.max_running_requests,
            page_size=self.page_size,
        )

        # resume the in-flight chunked request first (reference :2104-2106)
        if self.chunked_req is not None:
            req = self.chunked_req
            self.chunked_req = None
            res = adder.try_add(req, req.num_computed)
            if res == "full":
                # cannot continue now; keep it chunked for next round
                self.chunked_req = req
                return None

        if adder.chunked_req is None and self.waiting:
            queue = sort_waiting_queue(
                self.args.schedule_policy, list(self.waiting), self.radix
            )
            for req in queue:
                if adder.budget.rem_reqs <= 0 or adder.budget.rem_input_tokens <= 0:
                    break
                cached = self._match_and_lock_prefix(req)
                res = adder.try_add(req, req.num_computed)
                if res == "full":
                    self._unlock_prefix(req)
                    break
                self.waiting.remove(req)
                if res == "chunked":
                    break

        if not adder.admitted:
            return None
        # a partially-admitted request stays "chunked" and resumes first
        # next round (reference scheduler.py:2104-2106)
        self.chunked_req = adder.chunked_req
        return self._build_prefill_plan(adder)

    def _match_and_lock_prefix(self, req: Req) -> int:
        """Radix prefix match at admission; returns cached token count."""
        if req.num_computed > 0:
            return req.num_computed  # resumed chunked/retracted req
        if self.linear_cache is not None:
            # hybrid families: exact-prefix entries with state snapshots
            if req.lora_slot:
                return req.num_computed
            entry = self.linear_cache.match(req.all_ids())
            if entry is not None:
                self.linear_cache.restore(entry, req)
                req.prefix_entry = entry
                self.cached_tokens_served += req.num_computed
            else:
                self.linear_cache.misses += 1
            return req.num_computed
        if self.radix is None:
            return req.num_computed
        if req.lora_slot:
            # adapter-specific KV must not mix with base-model cache entries
            return req.num_computed
        fill = req.all_ids()
        # never reuse the whole prompt: the last token must be recomputed so
        # prefill produces logits for the first new token (reference:
        # schedule_batch.py init_next_round_input caps prefix at len-1)
        pages, node = self.radix.match_prefix(fill[: len(fill) - 1])
        if pages:
            self.radix.inc_lock_ref(node)
            req.prefix_node = node
            req.pages = list(pages)
            req.cached_prefix_len = len(pages) * self.page_size
            req.num_computed = req.cached_prefix_len
            self.cached_tokens_served += req.cached_prefix_len
        return req.num_computed

    def _unlock_prefix(self, req: Req) -> None:
        if req.prefix_entry is not None:
            self.linear_cache.release(req.prefix_entry)
            req.prefix_entry = None
            req.pages = []
            req.cached_prefix_len = 0
            req.num_computed = 0
        if req.prefix_node is not None:
            self.radix.dec_lock_ref(req.prefix_node)
            req.prefix_node = None
            req.pages = []
            req.cached_prefix_len = 0
            req.num_computed = 0

    def _ensure_pages(self, req: Req, new_total_tokens: int) -> bool:
        """Grow req.pages to cover new_total_tokens; may evict caches."""
        need = cdiv(new_total_tokens, self.page_size) - len(req.pages)
        if need <= 0:
            return True
        if self.allocator.free_pages < need and self.radix is not None:
            self.radix.evict(need - self.allocator.free_pages)
        if self.allocator.free_pages < need and self.linear_cache is not None:
            self.linear_cache.evict(need - self.allocator.free_pages)
        got = self.allocator.try_alloc(need)
        if got is None:
            return False
        req.pages.extend(got)
        return True

    def _build_prefill_plan(self, adder: PrefillAdder) -> Optional[BatchPlan]:
        admitted: List[Tuple[Req, int]] = []
        for req, take in adder.admitted:
            if not self._ensure_pages(req, req.num_computed + take):
                # out of pages: put back to waiting
                if self.chunked_req is req:
                    self.chunked_req = None
                if req.num_computed == req.cached_prefix_len:
                    self._unlock_prefix(req)
                    self.waiting.appendleft(req)
                else:
                    self.chunked_req = req  # mid-chunk, must resume later
                continue
            admitted.append((req, take))
        if not admitted:
            return None

        b = len(admitted)
        lq = max(take for _, take in admitted)
        token_ids = np.zeros((b, lq), np.int32)
        positions = np.zeros((b, lq), np.int32)
        slots = np.full((b, lq), -1, np.int32)
        page_table = np.zeros((b, self.max_pages_per_seq), np.int32)
        kv_lens = np.zeros((b,), np.int32)
        q_start = np.zeros((b,), np.int32)
        logit_idx = np.zeros((b,), np.int32)
        sample_mask = np.zeros((b,), bool)

        for i, (req, take) in enumerate(admitted):
            fill = req.all_ids()
            start = req.num_computed
            chunk = fill[start : start + take]
            token_ids[i, :take] = chunk
            positions[i, :take] = np.arange(start, start + take)
            pv = np.asarray(req.pages, np.int32)
            page_table[i, : len(pv)] = pv
            kv_lens[i] = start + take
            q_start[i] = start
            abs_pos = np.arange(start, start + take)
            slots[i, :take] = pv[abs_pos // self.page_size] * self.page_size + (
                abs_pos % self.page_size
            )
            logit_idx[i] = take - 1
            sample_mask[i] = start + take >= len(fill)
            self.total_prompt_tokens += take
            req.status = ReqStatus.RUNNING

        return BatchPlan(
            kind="prefill",
            reqs=[r for r, _ in admitted],
            token_ids=token_ids,
            positions=positions,
            page_table=page_table,
            kv_lens=kv_lens,
            q_start=q_start,
            slots=slots,
            logit_idx=logit_idx,
            sample_mask=sample_mask,
        )

    # ------- decode -------
    def _decode_horizon(self) -> int:
        """Fused decode steps for the next call.

        The horizon deliberately OVERSHOOTS requests that are about to
        finish: tokens sampled past a stop/eos/max_new_tokens are dropped
        host-side and their KV writes land in pages the request owns.
        Clamping to min(remaining) would (a) let one nearly-done request
        force every other request to single-token steps and (b) multiply
        the compiled-executable set by every power of two — the round-4
        online-serving TTFT collapse was decode buckets compiling inside
        the timed run. Keeping h fixed means the executable lattice is
        {1, decode_horizon} and can be precompiled at startup (the CUDA-
        graph-capture analog, reference cuda_graph_runner.py:673)."""
        if not self.running:
            return 1
        h = max(1, self.args.decode_horizon)
        # speculative decoding replaces fused multi-token decode: the
        # drafter must see the history after EVERY accepted token
        if self.drafter is not None:
            h = 1
        # penalties depend on counts of tokens sampled so far; keep them
        # exact by stepping one token at a time when active
        if any(
            r.sampling_params.frequency_penalty != 0.0
            or r.sampling_params.presence_penalty != 0.0
            or r.grammar is not None
            for r in self.running
        ):
            h = 1
        # never overshoot past the KV capacity of the page table
        cap = self.max_pages_per_seq * self.page_size
        room = min(cap - r.num_computed for r in self.running)
        h = max(1, min(h, room))
        # hybrid linear-state models with the prefix cache: overshoot
        # would advance the recurrent state past the finish point and
        # poison snapshots — clamp to the shortest remaining budget
        if self.linear_cache is not None:
            h = min(h, min(r.remaining_new_tokens()
                           for r in self.running))
            h = max(1, h)
        # round down to a power of two so the compiled-shape set stays small
        return 1 << (h.bit_length() - 1)

    def _get_decode_batch(self) -> Optional[BatchPlan]:
        if not self.running:
            return None
        if self.drafter is not None and all(
            r.sampling_params.temperature == 0.0
            and r.grammar is None
            and r.lora_slot == 0
            for r in self.running
        ):
            plan = self._get_verify_batch()
            if plan is not None:
                return plan
        horizon = self._decode_horizon()
        self._retract_if_needed(horizon)
        reqs = self.running
        if not reqs:
            return None
        b = len(reqs)
        token_ids = np.zeros((b, 1), np.int32)
        positions = np.zeros((b, 1), np.int32)
        slots = np.full((b, horizon), -1, np.int32)
        page_table = np.zeros((b, self.max_pages_per_seq), np.int32)
        kv_lens = np.zeros((b,), np.int32)
        q_start = np.zeros((b,), np.int32)

        for i, req in enumerate(reqs):
            pos = req.num_computed  # == total_len - 1
            token_ids[i, 0] = req.output_ids[-1]
            positions[i, 0] = pos
            pv = np.asarray(req.pages, np.int32)
            page_table[i, : len(pv)] = pv
            kv_lens[i] = pos + 1
            q_start[i] = pos
            steps = np.arange(pos, pos + horizon)
            slots[i] = pv[steps // self.page_size] * self.page_size + (
                steps % self.page_size
            )

        return BatchPlan(
            kind="decode",
            reqs=list(reqs),
            token_ids=token_ids,
            positions=positions,
            page_table=page_table,
            kv_lens=kv_lens,
            q_start=q_start,
            slots=slots,
            logit_idx=np.zeros((b,), np.int32),
            sample_mask=np.ones((b,), bool),
            horizon=horizon,
        )

    def _get_verify_batch(self) -> Optional[BatchPlan]:
        """Speculative verify batch: [last_token, draft...] per request; the
        device returns greedy predictions at every position and acceptance
        happens in process_batch_result (reference: eagle/ngram verify,
        srt/speculative/; greedy-only in round 1)."""
        topk = getattr(self.drafter, "topk", 1)
        self._retract_if_needed(self.drafter.k + topk)
        reqs = list(self.running)
        if not reqs:
            return None
        all_drafts = self.drafter.propose_all(reqs)
        drafts = []
        for r, d in zip(reqs, all_drafts):
            cap = max(0, r.remaining_new_tokens() - 1)
            drafts.append(d[: min(self.drafter.k, cap)])
        use_tree = topk > 1
        alt_map = getattr(self.drafter, "last_alts", {}) if use_tree else {}
        alts = [
            alt_map.get(r.rid, []) if d else [] for r, d in zip(reqs, drafts)
        ]
        t = 1 + max(
            (len(d) + len(a) for d, a in zip(drafts, alts)), default=0
        )
        # nothing drafted: plain decode is cheaper — except for EAGLE, which
        # still runs verify to capture the step's hidden features and keep
        # the draft state fresh
        if t == 1 and not getattr(self.drafter, "captures_hidden", False):
            return None
        b = len(reqs)
        token_ids = np.zeros((b, t), np.int32)
        positions = np.zeros((b, t), np.int32)
        slots = np.full((b, t), -1, np.int32)
        page_table = np.zeros((b, self.max_pages_per_seq), np.int32)
        kv_lens = np.zeros((b,), np.int32)
        q_start = np.zeros((b,), np.int32)
        draft_lens = np.zeros((b,), np.int32)
        alt_lens = np.zeros((b,), np.int32)
        tree_mask = (
            np.zeros((b, t, t), bool) if use_tree else None
        )
        for i, (req, d, a) in enumerate(zip(reqs, drafts, alts)):
            pos = req.num_computed
            m = len(d)
            na = len(a)
            token_ids[i, 0] = req.output_ids[-1]
            token_ids[i, 1 : 1 + m] = d
            pv = np.asarray(req.pages, np.int32)
            page_table[i, : len(pv)] = pv
            n_nodes = 1 + m + na
            # slots are node-indexed: node j lives at sequential slot pos+j
            steps = np.arange(pos, pos + n_nodes)
            slots[i, :n_nodes] = pv[steps // self.page_size] * self.page_size + (
                steps % self.page_size
            )
            positions[i, : 1 + m] = np.arange(pos, pos + 1 + m)
            kv_lens[i] = pos + n_nodes
            q_start[i] = pos
            draft_lens[i] = m
            self.spec_draft_tokens += m
            if use_tree:
                # rope positions: alternates sit at depth 1 (same as d[0])
                token_ids[i, 1 + m : n_nodes] = a
                positions[i, 1 + m : n_nodes] = pos + 1
                alt_lens[i] = na
                self.spec_draft_tokens += na
                # ancestor mask: root+chain causal; alts attend {root, self}
                for qi in range(1 + m):
                    tree_mask[i, qi, : qi + 1] = True
                for ai in range(na):
                    idx = 1 + m + ai
                    tree_mask[i, idx, 0] = True
                    tree_mask[i, idx, idx] = True
        return BatchPlan(
            kind="verify",
            reqs=list(reqs),
            token_ids=token_ids,
            positions=positions,
            page_table=page_table,
            kv_lens=kv_lens,
            q_start=q_start,
            slots=slots,
            logit_idx=np.zeros((b,), np.int32),
            sample_mask=np.ones((b,), bool),
            draft_lens=draft_lens,
            alt_lens=alt_lens if use_tree else None,
            tree_mask=tree_mask,
        )

    def _retract_if_needed(self, horizon: int = 1) -> None:
        """Ensure every running req has page slots for its next `horizon`
        tokens; retract (longest output first) until memory fits, keeping
        >= 1 req (reference scheduler.py:2247-2310)."""
        while len(self.running) > 1:
            need = 0
            for req in self.running:
                need += max(
                    0,
                    cdiv(req.num_computed + horizon, self.page_size)
                    - len(req.pages),
                )
            free = self.allocator.free_pages + (
                self.radix.evictable_tokens // self.page_size if self.radix else 0
            ) + (self.linear_cache.evictable_tokens() // self.page_size
                 if self.linear_cache else 0)
            if need <= free:
                break
            victim = max(
                self.running,
                key=lambda r: (len(r.output_ids), -len(r.input_ids)),
            )
            self._retract_req(victim)
        # grow page lists now (decode slots must exist before forward)
        for req in list(self.running):
            if not self._ensure_pages(req, req.num_computed + horizon):
                if len(self.running) > 1:
                    self._retract_req(req)
                else:
                    raise MemoryError("single running request exceeds KV capacity")

    def _retract_req(self, req: Req) -> None:
        logger.info("retracting req %s (out=%d)", req.rid, len(req.output_ids))
        self.running.remove(req)
        self._release_pages(req, insert_to_cache=False)
        req.num_computed = 0
        req.cached_prefix_len = 0
        req.is_retracted = True
        req.status = ReqStatus.WAITING
        self.waiting.appendleft(req)
        self.num_retracted += 1
        self.new_token_ratio = min(
            self.new_token_ratio + 0.2, self.max_new_token_ratio
        )

    def _reclaim_swa_pages(self, req: Req) -> int:
        """SWA models (every layer windowed): pages whose tokens all lie
        before the attention window can be returned to the allocator while
        the request is still running (reference analog: swa_memory_pool.py /
        swa_radix_cache.py window-bounded KV). The page-table entries stay
        (slot math needs the indices) — windowed attention never reads
        those positions, and the Pallas kernel's page-skip never DMAs them.
        Returns pages freed."""
        if self.swa_window is None:
            return 0
        # pages shared with the radix tree are not ours to free
        shared = req.cached_prefix_len // self.page_size
        if req.swa_freed < shared:
            req.swa_freed = shared
        # margin: the fused decode horizon may advance q positions before
        # the next reclaim point; keep one extra page of history
        keep_from = req.num_computed - self.swa_window - self.page_size
        n_freeable = max(0, keep_from // self.page_size)
        n_freeable = min(n_freeable, len(req.pages))
        freed = 0
        while req.swa_freed < n_freeable:
            self.allocator.free([req.pages[req.swa_freed]])
            req.swa_freed += 1
            freed += 1
        return freed

    def _release_pages(self, req: Req, insert_to_cache: bool) -> None:
        """Give back req's pages; optionally publish KV into the radix tree.
        Ownership: the first cached_prefix_len/page pages belong to the tree
        (shared); insert() may dedup more (reference radix_cache.py:459)."""
        if self.linear_cache is not None:
            # hybrid prefix entries: the cache may take ownership of ALL
            # pages (state snapshot + exact prefix); otherwise free the
            # pages beyond the matched chain
            entry = req.prefix_entry
            n_chain = len(self.linear_cache._all_pages(entry)) if entry \
                else 0
            saved = False
            if insert_to_cache and not req.lora_slot \
                    and req.status != ReqStatus.ABORTED:
                saved = self.linear_cache.save(req, entry)
            if entry is not None:
                self.linear_cache.release(entry)
                req.prefix_entry = None
            if not saved:
                self.allocator.free(req.pages[n_chain:])
            req.pages = []
            return
        shared_pages = req.cached_prefix_len // self.page_size
        if req.lora_slot:
            insert_to_cache = False
        if req.swa_freed > shared_pages:
            # leading pages already reclaimed mid-flight: nothing before
            # swa_freed is ours anymore, and the KV is incomplete -> no
            # radix publication
            self.allocator.free(req.pages[req.swa_freed :])
            req.pages = []
            req.swa_freed = 0
            if req.prefix_node is not None:
                self.radix.dec_lock_ref(req.prefix_node)
                req.prefix_node = None
            if getattr(self.drafter, "captures_hidden", False):
                self.drafter.drop(req.rid)
            return
        if self.radix is not None and insert_to_cache:
            toks = req.all_ids()
            computed = toks[: req.num_computed]
            dup_tokens = self.radix.insert(computed, req.pages)
            dup_pages = dup_tokens // self.page_size
            aligned_pages = req.num_computed // self.page_size
            # free duplicates discovered by insert (beyond our shared prefix)
            if dup_pages > shared_pages:
                self.allocator.free(req.pages[shared_pages:dup_pages])
            # free the partial tail page (never enters the tree)
            if len(req.pages) > aligned_pages:
                self.allocator.free(req.pages[aligned_pages:])
        else:
            if len(req.pages) > shared_pages:
                self.allocator.free(req.pages[shared_pages:])
        if req.prefix_node is not None:
            self.radix.dec_lock_ref(req.prefix_node)
            req.prefix_node = None
        req.pages = []
        if self.drafter is not None and hasattr(self.drafter, "drop"):
            # draft KV / feature state is tied to the released pages
            self.drafter.drop(req.rid)

    # ------------- result processing -------------
    def process_batch_result(
        self, plan: BatchPlan, next_tokens: np.ndarray,
        logprobs: Optional[np.ndarray], hidden: Optional[np.ndarray] = None,
    ) -> List[Req]:
        """Apply sampled tokens; returns requests that finished this step.

        next_tokens: [B, K] (K = plan.horizon; 1 for prefill).
        hidden: [B, T, E] target features (EAGLE only) for the drafter hooks.
        """
        eagle = (
            self.drafter if getattr(self.drafter, "captures_hidden", False)
            else None
        )
        finished: List[Req] = []
        for i, req in enumerate(plan.reqs):
            if req.status == ReqStatus.ABORTED:
                self._release_pages(req, insert_to_cache=False)
                if req in self.running:
                    self.running.remove(req)
                finished.append(req)
                continue
            if req.finished:
                # already finished before this plan's results arrived
                # (overlap pipelining drain): discard this row
                continue
            if plan.kind == "prefill":
                take = int(np.sum(plan.slots[i] >= 0))
                req.num_computed += take
                if plan.sample_mask[i]:
                    self._append_token(
                        req, int(next_tokens[i, 0]),
                        float(logprobs[i, 0]) if logprobs is not None else None,
                    )
                    if req not in self.running and not req.finished:
                        self.running.append(req)
                # else: chunked request continues next round
                if eagle is not None and hidden is not None and not req.lora_slot:
                    eagle.on_prefill_chunk(
                        req, int(plan.q_start[i]), take, hidden[i],
                        int(next_tokens[i, 0]) if plan.sample_mask[i] else None,
                    )
            elif plan.kind == "verify":
                # greedy acceptance: draft j survives iff it equals the
                # model's prediction at the previous position
                m = int(plan.draft_lens[i])
                req.num_computed += 1  # KV of the input token
                acc = 0
                while acc < m and not req.finished:
                    draft_tok = int(plan.token_ids[i, 1 + acc])
                    if draft_tok != int(next_tokens[i, acc]):
                        break
                    self._append_token(
                        req, draft_tok,
                        float(logprobs[i, acc]) if logprobs is not None else None,
                    )
                    req.num_computed += 1
                    acc += 1
                    self.spec_accepted_tokens += 1
                alt_hit = -1
                if (
                    acc == 0
                    and not req.finished
                    and plan.alt_lens is not None
                    and plan.alt_lens[i] > 0
                ):
                    # tree fallback: the chain's first token was rejected —
                    # an alternate first token may match the target's greedy
                    root_greedy = int(next_tokens[i, 0])
                    for ai in range(int(plan.alt_lens[i])):
                        idx = 1 + m + ai
                        if int(plan.token_ids[i, idx]) == root_greedy:
                            alt_hit = idx
                            break
                    if alt_hit >= 0:
                        self._append_token(
                            req, root_greedy,
                            float(logprobs[i, 0]) if logprobs is not None else None,
                        )
                        req.num_computed += 1
                        acc = 1
                        self.spec_accepted_tokens += 1
                        # the accepted node's KV sits at its node slot; move
                        # it to the sequential position pos+1 (reference:
                        # eagle_utils.cu tree KV reorder)
                        if self.kv_copy_fn is not None:
                            self.kv_copy_fn(
                                int(plan.slots[i, alt_hit]),
                                int(plan.slots[i, 1]),
                            )
                bonus_idx = alt_hit if alt_hit >= 0 else acc
                if not req.finished:
                    # correction / bonus token from the first mismatch
                    self._append_token(
                        req, int(next_tokens[i, bonus_idx]),
                        float(logprobs[i, bonus_idx]) if logprobs is not None else None,
                    )
                if eagle is not None and hidden is not None and not req.finished:
                    if alt_hit >= 0:
                        # synthesize the chain-layout row for the alt path
                        tok_row = np.array(
                            [plan.token_ids[i, 0], plan.token_ids[i, alt_hit]],
                            np.int32,
                        )
                        hid_row = np.stack([hidden[i][0], hidden[i][alt_hit]])
                        eagle.on_verify(
                            req, tok_row, 1, int(next_tokens[i, alt_hit]),
                            hid_row, int(plan.q_start[i]),
                        )
                    else:
                        eagle.on_verify(
                            req, plan.token_ids[i], acc,
                            int(next_tokens[i, acc]), hidden[i],
                            int(plan.q_start[i]),
                        )
            else:
                for k in range(plan.horizon):
                    if req.finished:
                        # overshoot tokens past stop/eos are dropped; for
                        # hybrids the state slot has advanced past the
                        # finish point — mark unsound for snapshots
                        req.state_dirty = True
                        break
                    req.num_computed += 1
                    self._append_token(
                        req, int(next_tokens[i, k]),
                        float(logprobs[i, k]) if logprobs is not None else None,
                    )
                if eagle is not None:
                    # positions advanced without feature capture; the draft
                    # state is stale — drop it (rebuilt at the next verify)
                    eagle.drop(req.rid)
            if req.finished:
                if req in self.running:
                    self.running.remove(req)
                self._release_pages(req, insert_to_cache=(self.radix is not None or self.linear_cache is not None))
                self.num_finished += 1
                finished.append(req)
        if plan.kind == "decode":
            self.new_token_ratio = max(
                self.new_token_ratio * self.new_token_ratio_decay,
                self.min_new_token_ratio,
            )
        if self.swa_window is not None and plan.kind in ("decode", "verify"):
            for req in plan.reqs:
                if not req.finished:
                    self.swa_reclaimed_pages += self._reclaim_swa_pages(req)
        return finished

    def _append_token(self, req: Req, token: int, logprob: Optional[float]) -> None:
        import time as _time

        if req.first_token_at is None:
            req.first_token_at = _time.monotonic()
        req.output_ids.append(token)
        if logprob is not None:
            req.output_logprobs.append(logprob)
        if req.grammar is not None:
            req.grammar.advance_token(token)
            self._try_jump_forward(req)
        req.check_finished()
        if req.finished:
            req.finished_at = _time.monotonic()
