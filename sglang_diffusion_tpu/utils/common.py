"""Common helpers (reference analog: srt/utils/ grab-bag, kept minimal)."""

from __future__ import annotations

import logging
import os
import sys
import time
from contextlib import contextmanager


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_LOG_CONFIGURED = False


def get_logger(name: str = "sgld_tpu") -> logging.Logger:
    global _LOG_CONFIGURED
    if not _LOG_CONFIGURED:
        level = os.environ.get("SGLD_TPU_LOG_LEVEL", "INFO").upper()
        logging.basicConfig(
            level=getattr(logging, level, logging.INFO),
            format="[%(asctime)s %(name)s %(levelname)s] %(message)s",
            stream=sys.stderr,
        )
        _LOG_CONFIGURED = True
    return logging.getLogger(name)


@contextmanager
def time_block(logger: logging.Logger, label: str, enabled: bool = True):
    t0 = time.perf_counter()
    yield
    if enabled:
        logger.info("%s took %.3f s", label, time.perf_counter() - t0)


def select_bucket(buckets, value: int) -> int:
    """Smallest bucket >= value, else the largest bucket."""
    for b in buckets:
        if b >= value:
            return b
    return buckets[-1]


_CACHE_CONFIGURED = False


def setup_compilation_cache(cache_dir: str | None = None) -> str | None:
    """Enable JAX's persistent compilation cache (reference analog: CUDA
    graph capture-once discipline, srt/model_executor/cuda_graph_runner.py:673
    — compile cost is paid once, not per process start).

    Remote-TPU compiles in this environment take minutes per executable;
    the on-disk cache turns repeat engine warmup into cache reads. Default
    location is <repo>/.xla_cache (persists across rounds); override with
    SGLD_TPU_XLA_CACHE_DIR, disable with SGLD_TPU_XLA_CACHE_DIR=off."""
    global _CACHE_CONFIGURED
    if _CACHE_CONFIGURED:
        return None
    cache_dir = cache_dir or os.environ.get("SGLD_TPU_XLA_CACHE_DIR")
    if cache_dir == "off":
        return None
    if not cache_dir:
        pkg_root = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        cache_dir = os.path.join(pkg_root, ".xla_cache")
    import jax

    try:
        backend = jax.default_backend()
        if backend == "cpu" and not os.environ.get("SGLD_TPU_XLA_CACHE_CPU"):
            # No persistent cache on CPU by default: XLA:CPU AOT entries are
            # ISA-specific (SIGILL risk across hosts) and a CPU-feature
            # fingerprint proved insufficient to isolate hosts (MULTICHIP_r03
            # still drowned in cpu_aot_loader.cc feature-mismatch spam).
            # CPU compiles are local and fast; the cache only pays for the
            # remote-TPU tunnel. Opt back in with SGLD_TPU_XLA_CACHE_CPU=1.
            return None
        cache_dir = os.path.join(cache_dir, backend)
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Over the remote-TPU tunnel even "fast" compiles cost seconds of
        # round trips that jax's measured compile time does not see; cache
        # everything (min compile time 0).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        _CACHE_CONFIGURED = True
        get_logger().info("persistent XLA compilation cache: %s", cache_dir)
        return cache_dir
    except Exception as e:  # noqa: BLE001 — cache is best-effort
        get_logger().warning("compilation cache unavailable: %s", e)
        return None
