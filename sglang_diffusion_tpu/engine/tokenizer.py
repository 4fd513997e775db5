"""Tokenizer adapters.

Reference analog: the tokenizer side of srt/managers/tokenizer_manager.py
plus srt/tokenizer/. Two backends:

- HFTokenizer: wraps a local HuggingFace tokenizer directory.
- ByteTokenizer: dependency-free byte-level tokenizer (vocab = 256 bytes +
  bos/eos) used by tests and the random-weight benchmark path, mirroring the
  reference's GPU-free CI strategy.
"""

from __future__ import annotations

from typing import List, Optional


class ByteTokenizer:
    BOS = 256
    EOS = 257

    vocab_size = 258
    bos_token_id = BOS
    eos_token_id = EOS

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        ids = list(text.encode("utf-8"))
        return ([self.BOS] if add_bos else []) + ids

    def decode(self, ids: List[int]) -> str:
        data = bytes(i for i in ids if 0 <= i < 256)
        return data.decode("utf-8", errors="replace")


class HFTokenizer:
    def __init__(self, path: str):
        from transformers import AutoTokenizer

        self.tk = AutoTokenizer.from_pretrained(path, use_fast=True)
        self.vocab_size = len(self.tk)
        self.bos_token_id = self.tk.bos_token_id
        self.eos_token_id = self.tk.eos_token_id

    def encode(self, text: str, add_bos: bool = True) -> List[int]:
        return self.tk.encode(text, add_special_tokens=add_bos)

    def decode(self, ids: List[int]) -> str:
        return self.tk.decode(ids, skip_special_tokens=True)

    def apply_chat_template(self, messages, add_generation_prompt=True) -> str:
        return self.tk.apply_chat_template(
            messages, tokenize=False, add_generation_prompt=add_generation_prompt
        )


def get_tokenizer(path: Optional[str]):
    if not path or path == "byte":
        return ByteTokenizer()
    return HFTokenizer(path)


class IncrementalDetokenizer:
    """Incremental detokenization with stable-prefix emission and stop-string
    trimming (reference: srt/managers/detokenizer_manager.py:74,144,154)."""

    def __init__(self, tokenizer, stop_strs: List[str]):
        self.tokenizer = tokenizer
        self.stop_strs = stop_strs
        self.emitted = ""  # text already surfaced to the user

    def step(self, output_ids: List[int]) -> tuple:
        """Returns (new_text_delta, matched_stop_str_or_None, full_text)."""
        text = self.tokenizer.decode(output_ids)
        # Hold back trailing replacement chars that may be a PARTIAL utf-8
        # sequence still being produced — but at most 3 (the longest
        # incomplete sequence is 3 continuation-pending bytes). Anything
        # beyond that is genuinely invalid bytes and must stream out:
        # unbounded stripping starved streaming entirely for byte-level
        # models emitting non-ASCII runs (every delta came out empty and
        # the text arrived in one burst at completion).
        stable = text
        held = 0
        while stable.endswith("�") and held < 3:
            stable = stable[:-1]
            held += 1
        # stop-string scan over the full decoded text
        for s in self.stop_strs:
            idx = stable.find(s)
            if idx >= 0:
                stable = stable[:idx]
                delta = stable[len(self.emitted):]
                self.emitted = stable
                return delta, s, stable
        # hold back a partial stop-string suffix so we never stream half of one
        hold = 0
        for s in self.stop_strs:
            for k in range(1, len(s)):
                if stable.endswith(s[:k]):
                    hold = max(hold, k)
        safe = stable[: len(stable) - hold] if hold else stable
        delta = safe[len(self.emitted):]
        if delta:
            self.emitted = safe
        return delta, None, stable


class TokenizerPool:
    """Parallel tokenization pool (reference analog:
    srt/managers/multi_tokenizer_mixin.py — the reference fans
    tokenization out over worker PROCESSES behind a router; in the
    single-controller design the same scaling comes from N tokenizer
    replicas on a thread pool: HF fast tokenizers release the GIL in
    their Rust core, so replica threads tokenize truly in parallel).

    Presents the same encode/decode/apply_chat_template interface as a
    single tokenizer, plus batch APIs that fan out across replicas:

        pool = TokenizerPool(lambda: HFTokenizer(path), n=4)
        ids_lists = pool.encode_batch(prompts)
    """

    def __init__(self, factory, n: int = 4):
        import threading
        from concurrent.futures import ThreadPoolExecutor

        self._replicas = [factory() for _ in range(max(1, n))]
        self._locks = [threading.Lock() for _ in self._replicas]
        self._pool = ThreadPoolExecutor(max_workers=len(self._replicas),
                                        thread_name_prefix="tokenizer")
        self._rr = 0

    # -- single-item API (delegates round-robin; replica-safe) --
    def _with_replica(self, fn):
        i = self._rr % len(self._replicas)
        self._rr += 1
        with self._locks[i]:
            return fn(self._replicas[i])

    def encode(self, text: str, add_bos: bool = True):
        return self._with_replica(lambda t: t.encode(text, add_bos=add_bos))

    def decode(self, ids):
        return self._with_replica(lambda t: t.decode(ids))

    def apply_chat_template(self, messages, add_generation_prompt=True):
        with self._locks[0]:
            return self._replicas[0].apply_chat_template(
                messages, add_generation_prompt=add_generation_prompt)

    def __getattr__(self, name):
        # passthrough for tokenizer attributes (eos_token_id, vocab, ...)
        return getattr(self._replicas[0], name)

    # -- batch API: fan out across replicas --
    def _map(self, fn, items):
        n = len(self._replicas)

        def run(i_item):
            i, item = i_item
            r = i % n
            with self._locks[r]:
                return fn(self._replicas[r], item)

        return list(self._pool.map(run, enumerate(items)))

    def encode_batch(self, texts, add_bos: bool = True):
        return self._map(lambda t, s: t.encode(s, add_bos=add_bos), texts)

    def decode_batch(self, ids_lists):
        return self._map(lambda t, ids: t.decode(ids), ids_lists)
