"""Native model gateway: C++ reverse proxy + cache-aware LB policy core.

Reference analog: sgl-model-gateway/ (Rust; OpenAI-compatible routing,
LB policies, health checks, circuit breaker, Prometheus metrics). The TPU
build implements it in C++ (csrc/gateway.cpp, csrc/tree.cpp) with a ctypes
binding over the policy core for differential testing, plus a launcher.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import time
from typing import List, Optional, Sequence

import numpy as np

from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("gateway")

_CSRC = os.path.join(os.path.dirname(__file__), "csrc")
_LIB = os.path.join(_CSRC, "libgwpolicy.so")
_BIN = os.path.join(_CSRC, "sgld-gateway")


def build(force: bool = False) -> bool:
    """Build the gateway binary + policy library via make."""
    if not force and os.path.exists(_LIB) and os.path.exists(_BIN):
        return True
    try:
        subprocess.run(["make", "-C", _CSRC], check=True, capture_output=True)
        return True
    except Exception as e:  # noqa: BLE001
        logger.warning("gateway build failed: %s", e)
        return False


_lib = None


def _load_lib() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not build():
        return None
    lib = ctypes.CDLL(_LIB)
    lib.gw_tree_new.restype = ctypes.c_void_p
    lib.gw_tree_free.argtypes = [ctypes.c_void_p]
    lib.gw_tree_insert.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
    ]
    lib.gw_tree_match_best.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int64),
    ]
    lib.gw_tree_tenant_chars.restype = ctypes.c_int64
    lib.gw_tree_tenant_chars.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gw_tree_evict_by_size.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.gw_tree_remove_tenant.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.gw_tree_total_nodes.restype = ctypes.c_int64
    lib.gw_tree_total_nodes.argtypes = [ctypes.c_void_p]
    lib.gw_cache_aware_select.restype = ctypes.c_int
    lib.gw_cache_aware_select.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_uint8),
        ctypes.c_int, ctypes.c_double, ctypes.c_int64, ctypes.c_double,
    ]
    _lib = lib
    return lib


class ApproxTree:
    """Python handle over the native approximate radix tree (tenant=worker).

    Mirrors sgl-model-gateway/src/policies/tree.rs behavior."""

    def __init__(self):
        self._lib = _load_lib()
        if self._lib is None:
            raise RuntimeError("gateway policy library unavailable")
        self._h = self._lib.gw_tree_new()

    def __del__(self):
        if getattr(self, "_h", None) and self._lib:
            self._lib.gw_tree_free(self._h)
            self._h = None

    def insert(self, text: str, tenant: int) -> None:
        b = text.encode()
        self._lib.gw_tree_insert(self._h, b, len(b), tenant)

    def match_best(self, text: str, allowed: Sequence[int]):
        b = text.encode()
        arr = (ctypes.c_int * len(allowed))(*allowed)
        t = ctypes.c_int(-1)
        n = ctypes.c_int64(0)
        self._lib.gw_tree_match_best(
            self._h, b, len(b), arr, len(allowed),
            ctypes.byref(t), ctypes.byref(n),
        )
        return t.value, n.value

    def tenant_chars(self, tenant: int) -> int:
        return self._lib.gw_tree_tenant_chars(self._h, tenant)

    def evict_by_size(self, max_chars: int) -> None:
        self._lib.gw_tree_evict_by_size(self._h, max_chars)

    def remove_tenant(self, tenant: int) -> None:
        self._lib.gw_tree_remove_tenant(self._h, tenant)

    def total_nodes(self) -> int:
        return self._lib.gw_tree_total_nodes(self._h)

    def cache_aware_select(
        self, text: str, loads: Sequence[int], healthy: Sequence[bool],
        cache_threshold: float = 0.5, abs_threshold: int = 32,
        rel_threshold: float = 1.0001,
    ) -> int:
        b = text.encode()
        n = len(loads)
        la = (ctypes.c_int64 * n)(*loads)
        ha = (ctypes.c_uint8 * n)(*[1 if h else 0 for h in healthy])
        return self._lib.gw_cache_aware_select(
            self._h, b, len(b), la, ha, n,
            cache_threshold, abs_threshold, rel_threshold,
        )


class GatewayProcess:
    """Launch/manage the sgld-gateway binary (reference: sglang_router CLI,
    sgl-model-gateway/bindings)."""

    def __init__(self, port: int, workers: List[str], policy: str = "cache_aware",
                 **kw):
        if not build():
            raise RuntimeError("gateway binary unavailable")
        cmd = [_BIN, "--port", str(port), "--policy", policy]
        for w in workers:
            cmd += ["--worker", w]
        for k, v in kw.items():
            cmd += [f"--{k.replace('_', '-')}", str(v)]
        self.port = port
        self.proc = subprocess.Popen(
            cmd, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL
        )

    def wait_ready(self, timeout: float = 10.0) -> bool:
        import urllib.request

        t0 = time.monotonic()
        while time.monotonic() - t0 < timeout:
            try:
                urllib.request.urlopen(
                    f"http://127.0.0.1:{self.port}/gateway/health", timeout=1
                )
                return True
            except Exception:  # noqa: BLE001
                time.sleep(0.1)
        return False

    def shutdown(self) -> None:
        if self.proc.poll() is None:
            self.proc.terminate()
            try:
                self.proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self.proc.kill()
