"""Regex NFA -> char-class DFA compiler + native mask kernel binding.

Reference analog: the reference's xgrammar-backed fill_vocab_mask
(srt/constrained/) whose hot path is a native bitmask kernel. Pipeline:

1. Collect the NFA's alphabet and partition chars into EQUIVALENCE CLASSES
   (chars with identical edge membership behave identically) — the DFA
   alphabet is tiny regardless of unicode.
2. Subset-construct a DFA over class ids (bounded; falls back to the
   Python path if the regex explodes).
3. Map every vocab token to its class-id sequence once (numpy-vectorized
   via a sorted-chars lookup).
4. Per decode state, one C++ call (constrained/cpp/dfa_mask.cpp) walks all
   tokens through the transition table -> uint8 mask over the vocab.

Masks are exactly those of RegexNFA.advance (differential-tested)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_diffusion_tpu.constrained.regex_nfa import EPS, RegexNFA
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("dfa_mask")

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libdfamask.so")
MAX_DFA_STATES = 4096


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _CPP_DIR], check=True, capture_output=True
            )
        except Exception as e:  # noqa: BLE001
            logger.warning("native dfa mask build failed: %s", e)
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.dfa_fill_mask.argtypes = [
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS"),
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
        ctypes.c_int64,
        ctypes.c_int32,
        np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS"),
    ]
    return lib


_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_lib()
        _LIB_TRIED = True
    return _LIB


class RegexDFA:
    """Char-class DFA for a RegexNFA; states are ints, -1 rejects.

    Compilation can refuse (None from `compile`) when subset construction
    exceeds MAX_DFA_STATES — callers fall back to the Python NFA path."""

    def __init__(self, trans: np.ndarray, accept: np.ndarray,
                 class_of: Dict[str, int], num_classes: int,
                 state_ids: Dict[frozenset, int]):
        self.trans = trans  # [S, C] int32
        self.accept = accept  # [S] bool
        self.class_of = class_of  # char -> class id (0 = dead)
        self.num_classes = num_classes
        self.state_ids = state_ids  # NFA frozenset -> DFA id

    @classmethod
    def compile(cls, nfa: RegexNFA) -> Optional["RegexDFA"]:
        # ---- char equivalence classes ----
        labels: List[frozenset] = []
        for edges in nfa.edges:
            for label, _ in edges:
                if label is not EPS:
                    labels.append(label)
        alphabet = sorted(set().union(*labels)) if labels else []
        sig_to_class: Dict[Tuple[bool, ...], int] = {}
        class_of: Dict[str, int] = {}
        for ch in alphabet:
            sig = tuple(ch in lab for lab in labels)
            cid = sig_to_class.setdefault(sig, len(sig_to_class) + 1)
            class_of[ch] = cid  # class 0 reserved: "dead" (no edge)
        num_classes = len(sig_to_class) + 1
        # one representative char per class (for NFA stepping)
        rep: Dict[int, str] = {}
        for ch, cid in class_of.items():
            rep.setdefault(cid, ch)

        # ---- subset construction over class ids ----
        start = nfa.start_state()
        state_ids: Dict[frozenset, int] = {start: 0}
        rows: List[np.ndarray] = []
        work = [start]
        while work:
            st = work.pop()
            sid = state_ids[st]
            while len(rows) <= sid:
                rows.append(np.full((num_classes,), -1, np.int32))
            row = rows[sid]
            for cid, ch in rep.items():
                nxt = nfa.advance(st, ch)
                if nxt is None:
                    continue
                nid = state_ids.get(nxt)
                if nid is None:
                    if len(state_ids) >= MAX_DFA_STATES:
                        logger.warning(
                            "regex DFA exceeds %d states; native path off",
                            MAX_DFA_STATES,
                        )
                        return None
                    nid = len(state_ids)
                    state_ids[nxt] = nid
                    work.append(nxt)
                row[cid] = nid
        trans = np.stack(rows)
        accept = np.zeros((len(rows),), bool)
        for st, sid in state_ids.items():
            accept[sid] = nfa.is_accepting(st)
        return cls(trans, accept, class_of, num_classes, state_ids)

    # ---- vocab preparation (once per (grammar, tokenizer)) ----
    def prep_vocab(self, token_strs: List[Optional[str]]):
        seqs: List[np.ndarray] = []
        offsets = np.zeros((len(token_strs) + 1,), np.int64)
        valid = np.zeros((len(token_strs),), np.uint8)
        pos = 0
        for i, s in enumerate(token_strs):
            if s is not None:
                ids = np.fromiter(
                    (self.class_of.get(ch, 0) for ch in s), np.int32,
                    count=len(s),
                )
                # a dead char (class 0, trans always -1) rejects the token;
                # keep it in the walk so the kernel handles it uniformly
                seqs.append(ids)
                valid[i] = 1
                pos += len(ids)
            offsets[i + 1] = pos
        classes = (
            np.concatenate(seqs) if seqs else np.zeros((0,), np.int32)
        )
        return np.ascontiguousarray(classes), offsets, valid

    def fill_mask(self, classes, offsets, valid, dfa_state: int) -> np.ndarray:
        lib = get_lib()
        n = len(valid)
        out = np.zeros((n,), np.uint8)
        if lib is not None:
            lib.dfa_fill_mask(
                np.ascontiguousarray(self.trans.reshape(-1)),
                self.num_classes, classes, offsets, valid, n,
                dfa_state, out,
            )
            return out
        # pure-python fallback (same table walk)
        flat = self.trans
        for t in range(n):
            if not valid[t]:
                continue
            s = dfa_state
            for i in range(offsets[t], offsets[t + 1]):
                s = flat[s, classes[i]]
                if s < 0:
                    break
            out[t] = s >= 0
        return out
