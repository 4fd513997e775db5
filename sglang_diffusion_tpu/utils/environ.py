"""Typed environment-variable registry.

Reference analog: srt/environ.py — a class of typed EnvField descriptors
(EnvBool/EnvInt/EnvFloat/EnvStr) with parse-or-default semantics and a
temporary-override context manager, so every environment knob the runtime
reads is declared, typed, and discoverable in ONE place instead of
scattered os.environ.get calls.

Usage:

    from sglang_diffusion_tpu.utils.environ import envs

    if envs.SGLD_TPU_ALLOW_CODE_EXEC.get():
        ...
    with envs.SGLD_TPU_LOG_LEVEL.override("debug"):
        ...
"""

from __future__ import annotations

import os
import warnings
from contextlib import contextmanager
from typing import Any, Optional


class EnvField:
    def __init__(self, default: Any, help: str = ""):
        self.default = default
        self.help = help
        self.name: Optional[str] = None

    def __set_name__(self, owner, name):
        self.name = name

    def parse(self, value: str) -> Any:
        raise NotImplementedError

    def get(self) -> Any:
        raw = os.getenv(self.name)
        if raw is None:
            return self.default
        try:
            return self.parse(raw)
        except ValueError as e:
            warnings.warn(
                f"invalid value for {self.name}: {e}; "
                f"using default {self.default!r}"
            )
            return self.default

    def is_set(self) -> bool:
        return os.getenv(self.name) is not None

    @contextmanager
    def override(self, value: Any):
        old = os.getenv(self.name)
        os.environ[self.name] = str(value)
        try:
            yield
        finally:
            if old is None:
                os.environ.pop(self.name, None)
            else:
                os.environ[self.name] = old


class EnvStr(EnvField):
    def parse(self, value: str) -> str:
        return value


class EnvBool(EnvField):
    def parse(self, value: str) -> bool:
        v = value.strip().lower()
        if v in ("1", "true", "yes", "on"):
            return True
        if v in ("0", "false", "no", "off", ""):
            return False
        raise ValueError(f"not a boolean: {value!r}")


class EnvInt(EnvField):
    def parse(self, value: str) -> int:
        return int(value)


class EnvFloat(EnvField):
    def parse(self, value: str) -> float:
        return float(value)


class _Envs:
    """Every environment knob the runtime reads (reference: srt/environ.py
    Envs). Names keep the SGLD_TPU_ prefix; adding a knob here is the only
    sanctioned way to read the environment from library code."""

    SGLD_TPU_LOG_LEVEL = EnvStr(
        "info", "root logger level for sglang_diffusion_tpu loggers")
    SGLD_TPU_XLA_CACHE_DIR = EnvStr(
        None, "persistent XLA compilation cache dir; 'off' disables")
    SGLD_TPU_XLA_CACHE_CPU = EnvBool(
        False, "also persist CPU-backend executables in the cache")
    SGLD_TPU_ALLOW_CODE_EXEC = EnvBool(
        False, "allow the HumanEval harness to exec model-written code")
    SGLD_TPU_HBM_BW = EnvFloat(
        None, "override measured HBM bandwidth (bytes/s) in bench roofline")
    SGLD_TPU_DETERMINISTIC = EnvBool(
        False, "pin decode to one executable (batch-size + page-hint "
        "buckets fixed at their maxima) so results are batch-composition "
        "invariant by construction")

    def fields(self):
        return {
            k: v for k, v in type(self).__dict__.items()
            if isinstance(v, EnvField)
        }

    def describe(self) -> str:
        lines = []
        for name, f in sorted(self.fields().items()):
            cur = f.get()
            lines.append(f"{name}={cur!r} (default {f.default!r}) — {f.help}")
        return "\n".join(lines)


envs = _Envs()
