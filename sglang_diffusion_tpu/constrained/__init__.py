"""Constrained decoding (structured outputs).

Reference analog: srt/constrained/ (xgrammar/outlines/llguidance backends +
token-bitmask application kernel). This image has none of those libraries,
so the TPU build ships its own engines:

- RegexGrammar: a Thompson-NFA regex subset compiled to char-set
  transitions; token masks computed by simulating each candidate token's
  string (with per-(state,token) memoization).
- JsonGrammar: a character-level pushdown automaton accepting JSON.

Masks are applied in the compiled sampler as an additive -inf bias
(the analog of sgl-kernel's apply_token_bitmask_inplace_cuda).
"""

from sglang_diffusion_tpu.constrained.manager import GrammarManager

__all__ = ["GrammarManager"]
