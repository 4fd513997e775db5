"""Rotary position embeddings.

TPU-native analog of the reference's RoPE family (srt/layers/rotary_embedding/).
Numerics match HF transformers' llama implementation (rotate-half convention)
so that HF checkpoints produce identical outputs.

Supports: default llama/qwen RoPE, llama3 frequency scaling, linear scaling,
YaRN (NTK-by-parts + attention temperature, reference
srt/layers/rotary_embedding/ YaRNScalingRotaryEmbedding), and M-RoPE
(multimodal 3D rotary used by Qwen2-VL, reference MRotaryEmbedding).
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
    elif rtype == "yarn":
        return _yarn_inv_freq(inv_freq, head_dim, rope_theta, rope_scaling)
    elif rtype in ("default", "mrope"):
        # mrope uses unscaled frequencies; the 3D section split happens in
        # apply_mrope, not in the frequency table.
        return inv_freq.astype(np.float32)
    else:
        raise NotImplementedError(f"rope_type {rtype} not supported yet")


def _yarn_find_dim(
    num_rot: float, head_dim: int, base: float, max_pos: int
) -> float:
    """Inverse of the wavelength formula: dim index whose rotations == num_rot."""
    return (head_dim * math.log(max_pos / (num_rot * 2 * math.pi))) / (
        2 * math.log(base)
    )


def _yarn_inv_freq(
    inv_freq: np.ndarray,
    head_dim: int,
    rope_theta: float,
    rope_scaling: Dict[str, Any],
) -> np.ndarray:
    """YaRN NTK-by-parts interpolation (reference yarn variant in
    srt/layers/rotary_embedding/): low-frequency dims are position-interpolated
    by `factor`, high-frequency dims keep extrapolation, with a linear ramp
    between `beta_fast` and `beta_slow` rotation counts."""
    factor = float(rope_scaling["factor"])
    orig_ctx = int(
        rope_scaling.get("original_max_position_embeddings", 4096)
    )
    beta_fast = float(rope_scaling.get("beta_fast", 32))
    beta_slow = float(rope_scaling.get("beta_slow", 1))
    low = _yarn_find_dim(beta_fast, head_dim, rope_theta, orig_ctx)
    high = _yarn_find_dim(beta_slow, head_dim, rope_theta, orig_ctx)
    low = max(math.floor(low), 0)
    high = min(math.ceil(high), head_dim // 2 - 1)
    # ramp: 0 -> pure extrapolation (keep inv_freq), 1 -> pure interpolation
    dims = np.arange(head_dim // 2, dtype=np.float64)
    ramp = np.clip((dims - low) / max(high - low, 1e-3), 0.0, 1.0)
    interp = inv_freq / factor
    mixed = inv_freq * (1 - ramp) + interp * ramp
    return mixed.astype(np.float32)


def longrope_inv_freqs(
    head_dim: int,
    rope_theta: float,
    rope_scaling: Dict[str, Any],
    max_position_embeddings: int,
) -> Tuple[np.ndarray, np.ndarray, int, float, float]:
    """Phi-3 LongRoPE (reference Phi3LongRoPEScaledRotaryEmbedding,
    srt/layers/rotary_embedding/rope_variant.py:36): two per-dim rescale
    tables divide the base frequencies; positions below
    original_max_position_embeddings rotate with short_factor, positions at
    or beyond it with long_factor; cos/sin are multiplied by an mscale
    temperature sqrt(1 + ln(scale)/ln(orig)). Returns
    (inv_freq_short, inv_freq_long, orig_ctx, short_mscale, long_mscale)."""
    base = _base_inv_freq(head_dim, rope_theta)
    sf = np.asarray(rope_scaling["short_factor"], np.float64)
    lf = np.asarray(rope_scaling["long_factor"], np.float64)
    orig = int(
        rope_scaling.get(
            "original_max_position_embeddings", max_position_embeddings
        )
    )
    scale = max_position_embeddings / orig
    if scale <= 1.0:
        mscale = 1.0
    else:
        mscale = math.sqrt(1.0 + math.log(scale) / math.log(orig))
    short_mscale = float(rope_scaling.get("short_mscale") or mscale)
    long_mscale = float(rope_scaling.get("long_mscale") or mscale)
    return (
        (base / sf).astype(np.float32),
        (base / lf).astype(np.float32),
        orig,
        short_mscale,
        long_mscale,
    )


def apply_rope_longrope(
    q: jax.Array,  # [..., T, H, D]
    k: jax.Array,
    positions: jax.Array,  # [..., T]
    inv_freq_short: jax.Array,  # [D/2]
    inv_freq_long: jax.Array,  # [D/2]
    orig_ctx: int,
    short_mscale: float,
    long_mscale: float,
) -> Tuple[jax.Array, jax.Array]:
    """LongRoPE with PER-POSITION table selection, matching the reference's
    concatenated long_short cos/sin cache indexed by position (reference
    rope_variant.py:95 long_short_cos_sin_cache): position p < orig_ctx uses
    the short table, p >= orig_ctx the long table."""
    pos = positions[..., None].astype(jnp.float32)
    is_long = (positions >= orig_ctx)[..., None]
    freqs = jnp.where(is_long, pos * inv_freq_long, pos * inv_freq_short)
    mscale = jnp.where(is_long, long_mscale, short_mscale)
    cos = (jnp.cos(freqs) * mscale)[..., None, :]
    sin = (jnp.sin(freqs) * mscale)[..., None, :]
    cos = jnp.concatenate([cos, cos], axis=-1)
    sin = jnp.concatenate([sin, sin], axis=-1)

    def rot(x):
        xf = x.astype(jnp.float32)
        half = x.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (xf * cos + rotated * sin).astype(x.dtype)

    return rot(q), rot(k)


def yarn_attention_scale(rope_scaling: Optional[Dict[str, Any]]) -> float:
    """YaRN mscale: multiply q (or attention logits) by this temperature.
    Returns 1.0 when not using yarn."""
    if not rope_scaling:
        return 1.0
    rtype = rope_scaling.get("rope_type", rope_scaling.get("type", "default"))
    if rtype != "yarn":
        return 1.0
    factor = float(rope_scaling["factor"])
    mscale = float(rope_scaling.get("mscale", 1.0))
    if factor <= 1.0:
        return 1.0
    return float(0.1 * mscale * math.log(factor) + 1.0)


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


def apply_rope_partial(
    q: jax.Array,  # [..., T, H, D]
    k: jax.Array,
    positions: jax.Array,  # [..., T]
    inv_freq: jax.Array,  # [rot_dim/2]
    rot_dim: int,
) -> Tuple[jax.Array, jax.Array]:
    """Partial rotary, rotate-half convention (Qwen3-Next style,
    HF apply_rotary_pos_emb with rotary_dim < head_dim): only the first
    rot_dim dims rotate with halves split at rot_dim/2; the rest pass
    through unchanged."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq
    cos = jnp.concatenate([jnp.cos(freqs)] * 2, -1)[..., None, :]
    sin = jnp.concatenate([jnp.sin(freqs)] * 2, -1)[..., None, :]

    def rot(x):
        xr = x[..., :rot_dim].astype(jnp.float32)
        xp = x[..., rot_dim:]
        half = rot_dim // 2
        x1, x2 = xr[..., :half], xr[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        out = (xr * cos + rotated * sin).astype(x.dtype)
        return jnp.concatenate([out, xp], axis=-1)

    return rot(q), rot(k)


def apply_rope_partial_interleaved(
    q: jax.Array,  # [..., T, H, D]
    k: jax.Array,
    positions: jax.Array,  # [..., T]
    inv_freq: jax.Array,  # [rot_dim/2]
    rot_dim: int,
) -> Tuple[jax.Array, jax.Array]:
    """GLM-4 style rope: only the first rot_dim dims rotate, with
    INTERLEAVED pairing (x[2i], x[2i+1]); the rest pass through
    (reference analog: partial-rotary models in srt/layers/rotary_embedding)."""
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # [.., T, r/2]
    cos = jnp.repeat(jnp.cos(freqs), 2, axis=-1)[..., None, :]  # [.., T, 1, r]
    sin = jnp.repeat(jnp.sin(freqs), 2, axis=-1)[..., None, :]

    def rot(x):
        xr = x[..., :rot_dim].astype(jnp.float32)
        xp = x[..., rot_dim:]
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        half = jnp.stack([-x2, x1], axis=-1).reshape(xr.shape)
        out = (xr * cos + half * sin).astype(x.dtype)
        return jnp.concatenate([out, xp], axis=-1)

    return rot(q), rot(k)


def apply_mrope(
    q: jax.Array,  # [..., T, H, D]
    k: jax.Array,
    positions_3d: jax.Array,  # [3, ..., T] int32: (temporal, height, width)
    inv_freq: jax.Array,  # [D/2] float32
    mrope_section: Tuple[int, int, int],  # sums to D/2
) -> Tuple[jax.Array, jax.Array]:
    """Qwen2-VL multimodal RoPE (reference MRotaryEmbedding,
    srt/layers/rotary_embedding/): the D/2 frequency dims are split into
    three contiguous sections driven by temporal / height / width position
    streams. Text tokens carry identical values in all three streams, which
    makes this reduce exactly to standard RoPE for pure-text tokens.
    """
    assert sum(mrope_section) == inv_freq.shape[0], (
        mrope_section,
        inv_freq.shape,
    )
    # freqs per stream: [3, ..., T, D/2]
    freqs = positions_3d[..., None].astype(jnp.float32) * inv_freq
    # select section s of the frequency dims from position stream s
    sec_ids = np.repeat(np.arange(3), np.array(mrope_section))  # [D/2]
    onehot = (sec_ids[None, :] == np.arange(3)[:, None]).astype(np.float32)
    onehot = jnp.asarray(onehot)  # [3, D/2]
    sel = onehot.reshape((3,) + (1,) * (freqs.ndim - 2) + (-1,))
    freqs = (freqs * sel).sum(axis=0)  # [..., T, D/2]
    cos = jnp.cos(freqs)
    sin = jnp.sin(freqs)
    cos = jnp.concatenate([cos, cos], axis=-1)[..., None, :]
    sin = jnp.concatenate([sin, sin], axis=-1)[..., None, :]

    def rot(x):
        xf = x.astype(jnp.float32)
        half = x.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (xf * cos + rotated * sin).astype(x.dtype)

    return rot(q), rot(k)


def apply_rope_dual_chunk(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,  # [B, T, Hkv, D]
    positions: jax.Array,  # [B, T] absolute positions
    inv_freq: jax.Array,  # [D/2]
    chunk_size: int,
    local_size: int,
):
    """Dual Chunk Attention rope (reference analog:
    srt/layers/rotary_embedding/rope_variant.py:677
    DualChunkRotaryEmbedding): keys and intra-queries are roped at
    ``p % chunk_len``; succ-queries at ``min(p % chunk_len + chunk_len,
    chunk_size)``; inter-queries at the constant
    ``min(2*chunk_len - 1, chunk_size)``. Returns (q_intra, q_succ,
    q_inter, k_roped)."""
    chunk_len = chunk_size - local_size
    p_mod = positions % chunk_len

    def rope_at(x, pos):
        freqs = pos[..., None].astype(jnp.float32) * inv_freq
        cos = jnp.cos(freqs)
        sin = jnp.sin(freqs)
        cos = jnp.concatenate([cos, cos], axis=-1)[..., None, :]
        sin = jnp.concatenate([sin, sin], axis=-1)[..., None, :]
        xf = x.astype(jnp.float32)
        half = x.shape[-1] // 2
        x1, x2 = xf[..., :half], xf[..., half:]
        rotated = jnp.concatenate([-x2, x1], axis=-1)
        return (xf * cos + rotated * sin).astype(x.dtype)

    k_r = rope_at(k, p_mod)
    q_intra = rope_at(q, p_mod)
    q_succ = rope_at(q, jnp.minimum(p_mod + chunk_len, chunk_size))
    p_inter = jnp.full_like(positions,
                            min(2 * chunk_len - 1, chunk_size))
    q_inter = rope_at(q, p_inter)
    return q_intra, q_succ, q_inter, k_r
