"""KV-cache storage backends (tier 3 of the hierarchical cache).

Reference analog: srt/mem_cache/hicache_storage.py:67,187 (HiCacheStorage
API + HiCacheFile) and the backend factory (mem_cache/storage/
backend_factory.py). Pages are stored as individual blobs keyed by the
SHA-256 of the full token prefix up to and including that page — the same
content-addressed chaining the reference uses, so identical prefixes share
storage across engine restarts.

Backends: "file" (directory of blobs with LRU eviction by access time).
Network backends (mooncake/3fs-style) plug in behind the same interface.
"""

from __future__ import annotations

import hashlib
import os
import threading
import time
from typing import List, Optional

import numpy as np

from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("kv_storage")


def prefix_page_key(tokens_through_page: List[int]) -> str:
    """Content-addressed key for one page: hash of the whole prefix."""
    arr = np.asarray(tokens_through_page, np.int32)
    return hashlib.sha256(arr.tobytes()).hexdigest()


class KVStorage:
    def get(self, key: str) -> Optional[bytes]:
        raise NotImplementedError

    def set(self, key: str, blob: bytes) -> bool:
        raise NotImplementedError

    def exists(self, key: str) -> bool:
        return self.get(key) is not None

    def clear(self) -> None:
        pass


class FileKVStorage(KVStorage):
    """Directory-of-blobs backend (reference: HiCacheFile,
    hicache_storage.py:187) with byte-budget LRU eviction."""

    def __init__(self, path: str, max_bytes: int = 16 << 30):
        self.path = path
        self.max_bytes = max_bytes
        self._lock = threading.Lock()
        os.makedirs(path, exist_ok=True)
        self._bytes = sum(
            os.path.getsize(os.path.join(path, f))
            for f in os.listdir(path)
        )
        self.hits = 0
        self.misses = 0

    def _fp(self, key: str) -> str:
        return os.path.join(self.path, key + ".bin")

    def get(self, key: str) -> Optional[bytes]:
        fp = self._fp(key)
        try:
            with open(fp, "rb") as f:
                data = f.read()
            os.utime(fp)  # refresh LRU clock
            self.hits += 1
            return data
        except FileNotFoundError:
            self.misses += 1
            return None

    def set(self, key: str, blob: bytes) -> bool:
        with self._lock:
            if self._bytes + len(blob) > self.max_bytes:
                self._evict(self._bytes + len(blob) - self.max_bytes)
            if self._bytes + len(blob) > self.max_bytes:
                return False
            fp = self._fp(key)
            if os.path.exists(fp):
                return True
            tmp = fp + ".tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, fp)
            self._bytes += len(blob)
            return True

    def _evict(self, need: int) -> None:
        entries = []
        for f in os.listdir(self.path):
            fp = os.path.join(self.path, f)
            try:
                st = os.stat(fp)
                entries.append((st.st_atime, st.st_size, fp))
            except OSError:
                continue
        entries.sort()
        freed = 0
        for _, size, fp in entries:
            if freed >= need:
                break
            try:
                os.remove(fp)
                freed += size
                self._bytes -= size
            except OSError:
                pass

    def clear(self) -> None:
        with self._lock:
            for f in os.listdir(self.path):
                try:
                    os.remove(os.path.join(self.path, f))
                except OSError:
                    pass
            self._bytes = 0


def get_storage_backend(backend: str, path: str, max_bytes: int) -> KVStorage:
    """Factory (reference: mem_cache/storage/backend_factory.py)."""
    if backend == "file":
        return FileKVStorage(path, max_bytes)
    raise ValueError(f"unknown kv storage backend {backend}")
