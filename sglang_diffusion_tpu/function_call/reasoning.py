"""Reasoning-content separation (thinking models).

Reference analog: srt/parser/reasoning_parser.py — splits model output into
`reasoning_content` (the <think>...</think> span) and the normal content,
with both one-shot and streaming-incremental interfaces. Family table maps
model names to think-token pairs and whether reasoning is implicit-on from
the first token (DeepSeek-R1 omits the opening <think>).
"""

from __future__ import annotations

from typing import Optional, Tuple


class ReasoningParser:
    """One reasoning format: (start_token, end_token, force_reasoning).

    force_reasoning=True means the model starts inside the thinking block
    without emitting the start token (DeepSeek-R1, Qwen3-thinking)."""

    FAMILIES = {
        # name -> (start, end, force_reasoning)
        "deepseek-r1": ("<think>", "</think>", True),
        "deepseek-v3": ("<think>", "</think>", True),
        "qwen3": ("<think>", "</think>", False),
        "qwen3-thinking": ("<think>", "</think>", True),
        "glm45": ("<think>", "</think>", False),
        "kimi": ("◁think▷", "◁/think▷", False),
        "kimi-k2": ("<think>", "</think>", False),
        "minimax": ("<think>", "</think>", True),
        "gpt-oss": ("<|channel|>analysis<|message|>", "<|end|>", False),
        "step3": ("<think>", "</think>", True),
    }

    def __init__(self, family: str, stream_reasoning: bool = True):
        if family not in self.FAMILIES:
            raise KeyError(
                f"unknown reasoning parser {family!r}; "
                f"have {sorted(self.FAMILIES)}"
            )
        self.family = family
        self.start, self.end, self.force = self.FAMILIES[family]
        self.stream_reasoning = stream_reasoning
        # streaming state
        self._in_reasoning = self.force
        self._buffer = ""
        self._done = False

    # ---------- one-shot ----------
    def parse(self, text: str) -> Tuple[Optional[str], str]:
        """Returns (reasoning_content or None, normal_content).

        Text preceding the start token stays normal content (the reference
        keeps pre-start text outside the reasoning span)."""
        if self.start in text:
            pre, _, body = text.partition(self.start)
        elif self.force:
            pre, body = "", text
        else:
            return None, text
        if self.end not in body:
            return body.strip() or None, pre.strip()
        reasoning, normal = body.split(self.end, 1)
        normal = (pre + normal).strip() if pre.strip() else normal.strip()
        return reasoning.strip() or None, normal

    # ---------- streaming ----------
    def parse_stream_chunk(self, delta: str) -> Tuple[str, str]:
        """Feed one decoded delta; returns (reasoning_delta, normal_delta).
        Holds back partial think-token matches across chunk boundaries
        (reference: BaseReasoningFormatDetector.parse_streaming_increment).
        """
        if self._done:
            return "", delta
        self._buffer += delta
        text = self._buffer
        if not self._in_reasoning:
            idx = text.find(self.start)
            if idx >= 0:
                self._in_reasoning = True
                pre = text[:idx]
                self._buffer = text[idx + len(self.start):]
                r, n = self._drain_reasoning()
                return r, pre + n
            # hold back a possible partial start token at the tail
            keep = self._partial_tail(text, self.start)
            out = text[: len(text) - keep]
            self._buffer = text[len(text) - keep:]
            return "", out
        return self._drain_reasoning()

    def _drain_reasoning(self) -> Tuple[str, str]:
        text = self._buffer
        idx = text.find(self.end)
        if idx >= 0:
            reasoning = text[:idx]
            normal = text[idx + len(self.end):]
            self._buffer = ""
            self._in_reasoning = False
            self._done = True
            return (reasoning if self.stream_reasoning else ""), normal
        keep = self._partial_tail(text, self.end)
        out = text[: len(text) - keep]
        self._buffer = text[len(text) - keep:]
        return (out if self.stream_reasoning else ""), ""

    def flush(self) -> Tuple[str, str]:
        """Release any residual held-back buffer at end of stream.

        Characters retained as a potential partial think-token match (e.g. a
        trailing "</think" when the model hits max_tokens) are returned here,
        classified by the current in/out-of-reasoning state, so the final
        delta does not silently drop them."""
        text, self._buffer = self._buffer, ""
        if not text:
            return "", ""
        if self._in_reasoning and not self._done:
            return (text if self.stream_reasoning else ""), ""
        return "", text

    @staticmethod
    def _partial_tail(text: str, token: str) -> int:
        """Length of the longest suffix of text that is a prefix of token."""
        for k in range(min(len(text), len(token) - 1), 0, -1):
            if token.startswith(text[-k:]):
                return k
        return 0
