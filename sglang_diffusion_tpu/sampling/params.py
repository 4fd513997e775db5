"""Per-request sampling parameters.

Reference analog: srt/sampling/sampling_params.py:31. Same user-facing field
names; validation normalizes into the batched device arrays consumed by
sampling/sampler.py.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Union


@dataclass
class SamplingParams:
    max_new_tokens: int = 128
    temperature: float = 1.0
    top_p: float = 1.0
    top_k: int = -1  # -1 = disabled
    min_p: float = 0.0
    frequency_penalty: float = 0.0
    presence_penalty: float = 0.0
    repetition_penalty: float = 1.0
    stop: Union[None, str, List[str]] = None
    stop_token_ids: Optional[List[int]] = None
    ignore_eos: bool = False
    n: int = 1
    seed: Optional[int] = None
    # logprobs
    return_logprob: bool = False
    top_logprobs_num: int = 0
    # LoRA adapter name for this request (reference: lora_path)
    lora_path: Optional[str] = None
    # scheduling priority: higher = served first (reference: Req.priority)
    priority: int = 0
    # constrained decoding (reference: sampling_params.py regex/
    # json_schema/ebnf — the xgrammar-backend grammar types)
    regex: Optional[str] = None
    json_schema: Optional[str] = None  # any value enables JSON-mode grammar
    ebnf: Optional[str] = None  # GBNF-style CFG (constrained/ebnf.py)

    @property
    def grammar_spec(self):
        if self.regex:
            return {"regex": self.regex}
        if self.ebnf:
            return {"ebnf": self.ebnf}
        if self.json_schema is not None:
            return {"json": True}
        return None

    def __post_init__(self):
        if self.temperature < 0:
            raise ValueError("temperature must be >= 0")
        if not 0 < self.top_p <= 1:
            raise ValueError("top_p must be in (0, 1]")
        if self.top_k == 0 or self.top_k < -1:
            raise ValueError("top_k must be -1 (disable) or >= 1")
        if self.max_new_tokens < 0:
            raise ValueError("max_new_tokens must be >= 0")
        if isinstance(self.stop, str):
            self.stop = [self.stop]
        self.stop = self.stop or []
        self.stop_token_ids = self.stop_token_ids or []

    @property
    def is_greedy(self) -> bool:
        return self.temperature == 0.0
