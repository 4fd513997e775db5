"""Rotary position embeddings.

TPU-native analog of the reference's RoPE family (srt/layers/rotary_embedding/).
Numerics match HF transformers' llama implementation (rotate-half convention)
so that HF checkpoints produce identical outputs.

Supports: default llama/qwen RoPE, llama3 frequency scaling, linear scaling.
Computed on the fly from positions (no precomputed table needed — XLA fuses
the sin/cos into the surrounding ops; positions are int32 arrays).
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _base_inv_freq(head_dim: int, rope_theta: float) -> np.ndarray:
    return 1.0 / (
        rope_theta ** (np.arange(0, head_dim, 2, dtype=np.float64) / head_dim)
    )


def compute_inv_freq(
    head_dim: int, rope_theta: float, rope_scaling: Optional[Dict[str, Any]]
) -> np.ndarray:
    """Host-side inv_freq computation incl. llama3 scaling
    (reference: srt/layers/rotary_embedding/ llama3 variant)."""
    inv_freq = _base_inv_freq(head_dim, rope_theta)
    if not rope_scaling:
        return inv_freq.astype(np.float32)
    rtype = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
    if rtype == "llama3":
        factor = rope_scaling["factor"]
        low = rope_scaling["low_freq_factor"]
        high = rope_scaling["high_freq_factor"]
        orig_ctx = rope_scaling["original_max_position_embeddings"]
        wavelen = 2 * math.pi / inv_freq
        low_wl = orig_ctx / low
        high_wl = orig_ctx / high
        scaled = np.where(wavelen > low_wl, inv_freq / factor, inv_freq)
        smooth = (orig_ctx / wavelen - low) / (high - low)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        is_mid = (wavelen <= low_wl) & (wavelen >= high_wl)
        scaled = np.where(is_mid, smoothed, scaled)
        return scaled.astype(np.float32)
    elif rtype == "linear":
        return (inv_freq / rope_scaling["factor"]).astype(np.float32)
    elif rtype == "default":
        return inv_freq.astype(np.float32)
    else:
        raise NotImplementedError(f"rope_type {rtype} not supported yet")


def apply_rope(
    q: jax.Array,  # [..., T, H, D] or [B, T, H, D]
    k: jax.Array,
    positions: jax.Array,  # [..., T]
    inv_freq: jax.Array,  # [D/2] float32
) -> Tuple[jax.Array, jax.Array]:
    """HF rotate-half RoPE: x * cos + rotate_half(x) * sin."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [..., T, D/2]
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    cos = jnp.concatenate([cos, cos], axis=-1)[..., None, :]  # [..., T, 1, D]
    sin = jnp.concatenate([sin, sin], axis=-1)[..., None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        half = x.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (xf * cos + rotated * sin).astype(x.dtype)

    return rot(q), rot(k)
