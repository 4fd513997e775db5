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
