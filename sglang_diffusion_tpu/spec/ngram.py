"""N-gram speculative drafting.

Reference analog: srt/speculative/ngram_worker.py + cpp_ngram/ngram.cpp
(a C++ trie over recent token history proposing draft continuations).

Two drafters:
- NgramDrafter: per-request backwards suffix match in Python (zero state).
- NgramTrieDrafter: the native C++ trie (spec/cpp/ngram_trie.cpp, ctypes
  binding like kv/cpp) — a shared trie over ALL request histories with
  hit-count-weighted continuations, amortized O(n+k) per propose. Falls
  back to the Python drafter if the toolchain is unavailable.

Verification happens on device in one compiled step (see
engine/model_runner.py verify path); greedy acceptance.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, List, Optional, Tuple

import numpy as np

from sglang_diffusion_tpu.sched.req import Req
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("ngram")

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libngramtrie.so")


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _CPP_DIR], check=True, capture_output=True
            )
        except Exception as e:  # noqa: BLE001
            logger.warning("native ngram trie build failed: %s", e)
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.ngram_trie_create.restype = ctypes.c_void_p
    lib.ngram_trie_create.argtypes = [
        ctypes.c_int, ctypes.c_int, ctypes.c_int64,
    ]
    lib.ngram_trie_destroy.argtypes = [ctypes.c_void_p]
    lib.ngram_trie_insert.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
    ]
    lib.ngram_trie_propose.restype = ctypes.c_int
    lib.ngram_trie_propose.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
        ctypes.c_int,
        np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS"),
    ]
    lib.ngram_trie_size.restype = ctypes.c_int64
    lib.ngram_trie_size.argtypes = [ctypes.c_void_p]
    return lib


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


class NgramTrieDrafter:
    """Native shared-trie drafter (reference: cpp_ngram/ngram.cpp)."""

    def __init__(self, ngram: int = 2, num_draft_tokens: int = 4,
                 capacity: int = 1_000_000):
        self.n = ngram
        self.k = num_draft_tokens
        self._lib = _load_lib()
        if self._lib is None:
            raise RuntimeError("native ngram trie unavailable")
        self._h = self._lib.ngram_trie_create(ngram, num_draft_tokens,
                                              capacity)
        # per-request watermark of history already inserted
        self._seen: Dict[str, int] = {}

    def __del__(self):
        try:
            if getattr(self, "_h", None):
                self._lib.ngram_trie_destroy(self._h)
        except Exception:  # noqa: BLE001
            pass

    def observe(self, req: Req) -> None:
        """Feed new history into the trie (incremental; overlapping windows
        at the boundary are re-fed so cross-boundary n-grams are indexed)."""
        hist = req.all_ids()
        start = self._seen.get(req.rid, 0)
        if len(hist) <= start:
            return  # nothing new
        lo = max(0, start - (self.n + self.k))
        if len(hist) > lo + self.n:
            chunk = np.asarray(hist[lo:], np.int32)
            self._lib.ngram_trie_insert(self._h, chunk, len(chunk))
        self._seen[req.rid] = len(hist)

    def propose(self, req: Req) -> List[int]:
        self.observe(req)
        hist = req.all_ids()
        if len(hist) < self.n:
            return []
        key = np.asarray(hist[-self.n:], np.int32)
        out = np.zeros((self.k,), np.int32)
        m = self._lib.ngram_trie_propose(self._h, key, self.n, out)
        return [int(t) for t in out[:m]]

    def propose_all(self, reqs: List[Req]) -> List[List[int]]:
        return [self.propose(r) for r in reqs]

    def forget(self, rid: str) -> None:
        self._seen.pop(rid, None)

    @property
    def size(self) -> int:
        return int(self._lib.ngram_trie_size(self._h))
