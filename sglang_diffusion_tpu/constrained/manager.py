"""Grammar sessions + token-mask computation.

Reference analog: srt/constrained/grammar_manager.py + the backends'
fill_vocab_mask. Token transitions are memoized per (grammar, state,
token); masks per (grammar, state) — repetitive structures (JSON) reuse a
small number of states so steady-state masking is cheap. Regex grammars get a NATIVE fast path: a
char-class DFA + C++ table-walk kernel (constrained/dfa_mask.py +
cpp/dfa_mask.cpp — the analog of xgrammar's native bitmask); JSON's PDA
keeps the memoized Python path.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import numpy as np

from sglang_diffusion_tpu.constrained.json_grammar import JsonGrammar
from sglang_diffusion_tpu.constrained.regex_nfa import RegexNFA
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("constrained")


class GrammarSession:
    __slots__ = ("grammar", "gkey", "state", "manager")

    def __init__(self, manager: "GrammarManager", grammar, gkey: str):
        self.manager = manager
        self.grammar = grammar
        self.gkey = gkey
        self.state = grammar.start_state()

    def allowed_mask(self) -> np.ndarray:
        return self.manager._mask(self)

    def advance_token(self, token_id: int) -> None:
        s = self.manager._advance(self, token_id)
        if s is not None:
            self.state = s

    @property
    def is_accepting(self) -> bool:
        return self.grammar.is_accepting(self.state)

    def jump_forward_text(self) -> str:
        """Forced continuation span from the current state ('' when the
        grammar doesn't support it or nothing is forced). Reference:
        xgrammar find_jump_forward_string (srt/constrained/
        xgrammar_backend.py); the scheduler appends the span's tokens
        without model forwards and recomputes their KV in one extend."""
        jf = getattr(self.grammar, "jump_forward", None)
        if jf is None:
            return ""
        return jf(self.state)

    def try_advance_tokens(self, token_ids) -> bool:
        """Validate-and-advance a forced token span atomically: either all
        tokens advance (state mutated, True) or none do (False)."""
        s = self.state
        for t in token_ids:
            txt = self.manager.token_strings()[t]
            if txt is None:
                return False
            s2 = self.grammar.advance(s, txt)
            if s2 is None:
                return False
            s = s2
        self.state = s
        return True


class GrammarManager:
    def __init__(self, tokenizer, eos_token_id: Optional[int]):
        self.tokenizer = tokenizer
        self.eos_token_id = eos_token_id
        self._token_strs: Optional[List[Optional[str]]] = None
        self._grammars: Dict[str, Any] = {}
        self._mask_cache: Dict[Any, np.ndarray] = {}
        self._trans_cache: Dict[Any, Any] = {}
        self._dfa_cache: Dict[str, Any] = {}
        self._trie = None
        self._char_memo: Dict[str, Dict[Any, Any]] = {}

    # ---------- vocabulary ----------
    def token_strings(self) -> List[Optional[str]]:
        if self._token_strs is None:
            v = self.tokenizer.vocab_size
            strs: List[Optional[str]] = []
            for t in range(v):
                try:
                    s = self.tokenizer.decode([t])
                except Exception:
                    s = None
                # tokens that decode to nothing or contain replacement chars
                # cannot be validated char-wise; disallow under grammars
                if not s or "�" in s:
                    s = None
                strs.append(s)
            self._token_strs = strs
        return self._token_strs

    # ---------- sessions ----------
    def create_session(self, spec: Dict[str, Any]) -> GrammarSession:
        if spec.get("regex"):
            key = "re:" + spec["regex"]
            if key not in self._grammars:
                self._grammars[key] = RegexNFA(spec["regex"])
        elif spec.get("ebnf"):
            key = "ebnf:" + spec["ebnf"]
            if key not in self._grammars:
                from sglang_diffusion_tpu.constrained.ebnf import EbnfGrammar

                self._grammars[key] = EbnfGrammar(spec["ebnf"])
        elif spec.get("json"):
            key = "json"
            if key not in self._grammars:
                self._grammars[key] = JsonGrammar()
        else:
            raise ValueError(f"unknown grammar spec {spec}")
        return GrammarSession(self, self._grammars[key], key)

    # ---------- internals ----------
    def _advance(self, sess: GrammarSession, token_id: int):
        ck = (sess.gkey, sess.state, token_id)
        if ck in self._trans_cache:
            return self._trans_cache[ck]
        s = self.token_strings()[token_id]
        out = sess.grammar.advance(sess.state, s) if s is not None else None
        self._trans_cache[ck] = out
        return out

    def _mask(self, sess: GrammarSession) -> np.ndarray:
        ck = (sess.gkey, sess.state)
        cached = self._mask_cache.get(ck)
        if cached is not None:
            return cached
        native = self._native_mask(sess)
        if native is not None:
            self._mask_cache[ck] = native
            return native
        mask = self._trie_mask(sess)
        if self.eos_token_id is not None and sess.is_accepting:
            mask[self.eos_token_id] = True
        self._mask_cache[ck] = mask
        return mask

    # ---------- vocabulary trie ----------
    def _token_trie(self):
        """Prefix trie over the vocabulary's token strings: mask filling
        advances each DISTINCT prefix once instead of re-walking every
        token string (xgrammar's token-trie idea; at 128k vocab this cuts
        first-mask latency from seconds to tens of ms). children[n] maps
        char -> node; tokens_at[n] lists token ids ending at node n."""
        if getattr(self, "_trie", None) is None:
            strs = self.token_strings()
            children: List[Dict[str, int]] = [{}]
            tokens_at: List[List[int]] = [[]]
            for t, s in enumerate(strs):
                if s is None:
                    continue
                cur = 0
                for ch in s:
                    nxt = children[cur].get(ch)
                    if nxt is None:
                        nxt = len(children)
                        children[cur][ch] = nxt
                        children.append({})
                        tokens_at.append([])
                    cur = nxt
                tokens_at[cur].append(t)
            self._trie = (children, tokens_at)
        return self._trie

    def _trie_mask(self, sess: GrammarSession) -> np.ndarray:
        """Token mask via trie DFS with a persistent per-grammar
        (state, char) transition memo — each unique single-char PDA step
        is computed once across all states ever visited."""
        children, tokens_at = self._token_trie()
        memo = self._char_memo.setdefault(sess.gkey, {})
        grammar = sess.grammar
        mask = np.zeros((len(self.token_strings()),), bool)
        missing = object()
        stack = [(0, sess.state)]
        while stack:
            node, state = stack.pop()
            for ch, child in children[node].items():
                k = (state, ch)
                ns = memo.get(k, missing)
                if ns is missing:
                    ns = grammar.advance(state, ch)
                    memo[k] = ns
                if ns is None:
                    continue
                toks = tokens_at[child]
                if toks:
                    mask[toks] = True
                if children[child]:
                    stack.append((child, ns))
        return mask

    def _native_mask(self, sess: GrammarSession) -> Optional[np.ndarray]:
        """Fast path for regex grammars: char-class DFA + C++ table-walk
        kernel (constrained/dfa_mask.py; reference analog: xgrammar's
        native bitmask). Returns None when unavailable (JSON PDA, DFA
        blow-up) — callers fall back to the memoized Python path."""
        if not isinstance(sess.grammar, RegexNFA):
            return None
        ent = self._dfa_cache.get(sess.gkey)
        if ent is None:
            from sglang_diffusion_tpu.constrained.dfa_mask import RegexDFA

            dfa = RegexDFA.compile(sess.grammar)
            if dfa is None:
                self._dfa_cache[sess.gkey] = False
                return None
            prep = dfa.prep_vocab(self.token_strings())
            ent = (dfa, prep)
            self._dfa_cache[sess.gkey] = ent
        if ent is False:
            return None
        dfa, (classes, offsets, valid) = ent
        sid = dfa.state_ids.get(sess.state)
        if sid is None:  # state reached via a path the DFA didn't see
            return None
        mask = dfa.fill_mask(classes, offsets, valid, sid).astype(bool)
        if self.eos_token_id is not None and sess.is_accepting:
            mask[self.eos_token_id] = True
        return mask

    def _advance_cached(self, sess, token_id):
        ck = (sess.gkey, sess.state, token_id)
        if ck in self._trans_cache:
            return self._trans_cache[ck]
        s = self.token_strings()[token_id]
        out = sess.grammar.advance(sess.state, s) if s is not None else None
        self._trans_cache[ck] = out
        return out
