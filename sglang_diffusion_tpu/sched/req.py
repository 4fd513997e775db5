"""Request state.

Reference analog: Req in srt/managers/schedule_batch.py:486. Carries the KV
accounting split the reference relies on (SURVEY.md Appendix A: committed vs
allocated) so chunked prefill + retraction + prefix caching compose.
"""

from __future__ import annotations

import enum
import time
from dataclasses import dataclass, field
from typing import List, Optional

from sglang_diffusion_tpu.sampling.params import SamplingParams


class ReqStatus(enum.Enum):
    WAITING = "waiting"
    RUNNING = "running"
    FINISHED = "finished"
    ABORTED = "aborted"


class FinishReason(enum.Enum):
    NONE = None
    STOP = "stop"  # eos or stop token/string
    LENGTH = "length"  # max_new_tokens reached
    ABORT = "abort"


@dataclass
class Req:
    rid: str
    input_ids: List[int]
    sampling_params: SamplingParams
    eos_token_ids: List[int] = field(default_factory=list)

    # runtime state
    status: ReqStatus = ReqStatus.WAITING
    output_ids: List[int] = field(default_factory=list)
    output_logprobs: List[float] = field(default_factory=list)

    # KV accounting
    pages: List[int] = field(default_factory=list)  # pages owned/used (prefix first)
    cached_prefix_len: int = 0  # tokens served from radix cache (page-aligned)
    num_computed: int = 0  # tokens whose KV is in cache and attended
    prefix_node: Optional[object] = None  # radix TreeNode, locked while running
    # hybrid linear-state prefix entry (kv/linear_state_cache.py)
    prefix_entry: Optional[object] = None
    # hybrid models: the live state slot advanced past num_computed
    # (decode overshoot) — snapshot would be unsound
    state_dirty: bool = False

    is_retracted: bool = False
    # SWA window reclamation: leading pages already returned to the
    # allocator (sched/scheduler.py _reclaim_swa_pages)
    swa_freed: int = 0
    finish_reason: FinishReason = FinishReason.NONE

    # multimodal: projected image embeddings (device array [n_img, T_img, E]
    # or a list of per-image [T_i, E] arrays for dynamic-resolution models)
    # and their spans in input_ids (multimodal/processor.py MMSpan)
    mm_embeds: Optional[object] = None
    mm_spans: List[object] = field(default_factory=list)
    # M-RoPE (qwen2-vl): 3D rope positions for the prompt [3, T_prompt] and
    # the rope-vs-sequence offset applied to decode positions
    mm_positions: Optional[object] = None
    rope_delta: int = 0

    # scheduling priority (higher first; reference schedule_batch.py Req)
    priority: int = 0
    # constrained decoding session (constrained/manager.py GrammarSession)
    grammar: Optional[object] = None
    # LoRA adapter slot (0 = base model; see lora/manager.py)
    lora_slot: int = 0

    # streaming / detokenization state
    stream: bool = False
    surr_offset: int = 0  # decoded-text offset already emitted
    decoded_text: str = ""

    # timing
    created_at: float = field(default_factory=time.monotonic)
    first_token_at: Optional[float] = None
    finished_at: Optional[float] = None

    def __post_init__(self):
        self._all_ids_cache: Optional[List[int]] = None

    # ---- derived ----
    @property
    def total_len(self) -> int:
        return len(self.input_ids) + len(self.output_ids)

    @property
    def prompt_len(self) -> int:
        return len(self.input_ids)

    @property
    def extend_len(self) -> int:
        """Prompt tokens still to prefill."""
        return max(0, len(self.input_ids) - self.num_computed)

    @property
    def is_prefill_done(self) -> bool:
        return self.num_computed >= len(self.input_ids)

    @property
    def finished(self) -> bool:
        return self.status in (ReqStatus.FINISHED, ReqStatus.ABORTED)

    def all_ids(self) -> List[int]:
        return self.input_ids + self.output_ids

    def remaining_new_tokens(self) -> int:
        return self.sampling_params.max_new_tokens - len(self.output_ids)

    def check_finished(self) -> None:
        """Token-level stop conditions (string stops are checked in the
        detokenizer, reference: detokenizer_manager.py:154)."""
        if self.finish_reason != FinishReason.NONE:
            return
        sp = self.sampling_params
        if len(self.output_ids) >= sp.max_new_tokens:
            self.finish_reason = FinishReason.LENGTH
            self.status = ReqStatus.FINISHED
            return
        if self.output_ids:
            last = self.output_ids[-1]
            if not sp.ignore_eos and last in self.eos_token_ids:
                self.finish_reason = FinishReason.STOP
                self.status = ReqStatus.FINISHED
                return
            if last in sp.stop_token_ids:
                self.finish_reason = FinishReason.STOP
                self.status = ReqStatus.FINISHED
