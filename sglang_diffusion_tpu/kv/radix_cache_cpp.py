"""ctypes wrapper for the native radix tree (drop-in for RadixCache).

Reference analog: srt/mem_cache/radix_cache_cpp.py wrapping the pybind
cpp_radix_tree. Here the binding is ctypes over a plain C ABI (no pybind11
in this image). The shared library is built on first use via make; if the
toolchain is unavailable we fall back to the pure-Python tree.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Callable, List, Optional, Tuple

import numpy as np

from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("radix_cpp")

_CPP_DIR = os.path.join(os.path.dirname(__file__), "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libradixtree.so")


def _load_lib() -> Optional[ctypes.CDLL]:
    if not os.path.exists(_LIB_PATH):
        try:
            subprocess.run(
                ["make", "-C", _CPP_DIR], check=True, capture_output=True
            )
        except Exception as e:  # noqa: BLE001
            logger.warning("native radix tree build failed: %s", e)
            return None
    lib = ctypes.CDLL(_LIB_PATH)
    lib.radix_tree_create.restype = ctypes.c_void_p
    lib.radix_tree_create.argtypes = [ctypes.c_int64]
    lib.radix_tree_destroy.argtypes = [ctypes.c_void_p]
    lib.radix_tree_evictable_tokens.restype = ctypes.c_int64
    lib.radix_tree_evictable_tokens.argtypes = [ctypes.c_void_p]
    lib.radix_tree_protected_tokens.restype = ctypes.c_int64
    lib.radix_tree_protected_tokens.argtypes = [ctypes.c_void_p]
    lib.radix_tree_match_prefix.restype = ctypes.c_int64
    lib.radix_tree_match_prefix.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.radix_tree_insert.restype = ctypes.c_int64
    lib.radix_tree_insert.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    lib.radix_tree_inc_lock.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.radix_tree_dec_lock.argtypes = [ctypes.c_void_p, ctypes.c_void_p]
    lib.radix_tree_evict.restype = ctypes.c_int64
    lib.radix_tree_evict.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.radix_tree_take_freed.restype = ctypes.c_int64
    lib.radix_tree_take_freed.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64,
    ]
    return lib


_LIB: Optional[ctypes.CDLL] = None


def native_available() -> bool:
    global _LIB
    if _LIB is None:
        _LIB = _load_lib()
    return _LIB is not None


class RadixCacheCpp:
    """Same interface as kv.radix_cache.RadixCache; node handles are opaque
    C pointers."""

    def __init__(self, page_size: int, free_pages_fn: Callable[[List[int]], None]):
        if not native_available():
            raise RuntimeError("native radix tree unavailable")
        self.lib = _LIB
        self.page_size = page_size
        self.free_pages_fn = free_pages_fn
        self.h = ctypes.c_void_p(self.lib.radix_tree_create(page_size))
        self.root = None  # parity with the Python tree's API

    def __del__(self):
        try:
            if getattr(self, "h", None):
                self.lib.radix_tree_destroy(self.h)
        except Exception:
            pass

    @property
    def evictable_tokens(self) -> int:
        return self.lib.radix_tree_evictable_tokens(self.h)

    @property
    def protected_tokens(self) -> int:
        return self.lib.radix_tree_protected_tokens(self.h)

    def total_cached_tokens(self) -> int:
        return self.evictable_tokens + self.protected_tokens

    def match_prefix(self, tokens: List[int]) -> Tuple[List[int], object]:
        arr = np.asarray(tokens, np.int32)
        max_pages = max(1, len(arr) // self.page_size)
        out = np.zeros((max_pages,), np.int32)
        node = ctypes.c_void_p()
        n = self.lib.radix_tree_match_prefix(
            self.h,
            arr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(arr),
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            max_pages,
            ctypes.byref(node),
        )
        return out[:n].tolist(), node

    def insert(self, tokens: List[int], pages: List[int]) -> int:
        t = np.asarray(tokens, np.int32)
        p = np.asarray(pages, np.int32)
        dup = self.lib.radix_tree_insert(
            self.h,
            t.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(t),
            p.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            len(p),
        )
        if dup < 0:
            raise AssertionError("not enough pages for tokens")
        return int(dup)

    def inc_lock_ref(self, node) -> None:
        if node and node.value:
            self.lib.radix_tree_inc_lock(self.h, node)

    def dec_lock_ref(self, node) -> None:
        if node and node.value:
            self.lib.radix_tree_dec_lock(self.h, node)

    def evict(self, num_pages: int) -> int:
        n = self.lib.radix_tree_evict(self.h, num_pages)
        if n > 0:
            out = np.zeros((n,), np.int32)
            got = self.lib.radix_tree_take_freed(
                self.h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), n
            )
            self.free_pages_fn(out[:got].tolist())
        return int(n)
