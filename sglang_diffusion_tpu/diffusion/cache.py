"""Denoising-step caching accelerations.

Reference analog: multimodal_gen/runtime/cache/teacache.py:59 (TeaCache —
skip DiT forwards when consecutive timestep conditioning barely changes,
reusing the previous velocity) and cache_dit_integration.py.

TPU twist: the whole denoise loop is one lax.scan, so the skip decision is
a scalar lax.cond inside the scan — the DiT branch simply doesn't execute
on skipped steps (XLA conds with scalar predicates branch at runtime).
The similarity proxy is the relative L1 change of the timestep embedding's
modulation signal, accumulated until it crosses the threshold (same
accumulate-and-reset policy as the reference's rescaled distance).
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass
class TeaCacheConfig:
    enabled: bool = False
    # skip while the accumulated relative conditioning change stays below
    # this (reference default ~0.2 for Wan at 50 steps)
    threshold: float = 0.2


@dataclass
class CacheDiTConfig:
    """DBCache / TaylorSeer block caching (reference:
    multimodal_gen/runtime/cache/cache_dit_integration.py:177,220).

    Every step runs the first `front_blocks` transformer blocks; when their
    output moved less than `threshold` (relative L1 vs the previous step),
    the remaining blocks are skipped and the cached tail residual
    (full_hidden - front_hidden) is added instead. With `taylorseer`, the
    residual is first-order extrapolated from its last two values instead
    of held constant."""

    enabled: bool = False
    front_blocks: int = 1
    threshold: float = 0.05
    taylorseer: bool = True
    # never skip the first/last steps (reference warmup/cooldown windows)
    warmup_steps: int = 1
