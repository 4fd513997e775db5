"""SageAttention: INT8-quantized attention for diffusion DiTs.

TPU-native analog of the reference's SageAttention/SageAttention3 backends
(multimodal_gen/runtime/layers/attention/backends/sage*.py, per
docs/diffusion/performance/attention_backends.md): Q and K are quantized to
INT8 with per-token scales (K additionally mean-centered, the Sage trick
that preserves accuracy because softmax is shift-invariant), and QK^T runs
as an INT8 matmul — on TPU that feeds the MXU at double the bf16 MAC rate.
P·V stays in bf16/f32 (V quantization costs accuracy disproportionately).

Numerics: max |sage - dense| stays within ~1e-2 for unit-scale inputs
(tested); the reference reports visually lossless generation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _quant_per_token(x: jax.Array):
    """[B, T, H, D] -> (int8 values, scales [B, T, H, 1])."""
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scale = jnp.maximum(amax, 1e-8) / 127.0
    q = jnp.clip(jnp.round(x / scale), -127, 127).astype(jnp.int8)
    return q, scale


def sage_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                   sm_scale: float) -> jax.Array:
    """Drop-in for joint_attention (full bidirectional, [B, T, H, D])."""
    f32 = jnp.float32
    # shift-invariance of softmax: subtract K's per-head mean before
    # quantization — removes the large common-mode component (Sage trick)
    k_mean = jnp.mean(k.astype(f32), axis=1, keepdims=True)
    kc = k.astype(f32) - k_mean
    qq, qs = _quant_per_token(q.astype(f32))
    kq, ks = _quant_per_token(kc)
    # INT8 x INT8 -> INT32 scores on the MXU
    s_int = jnp.einsum(
        "bthd,bshd->bhts", qq.astype(jnp.int8), kq.astype(jnp.int8),
        preferred_element_type=jnp.int32,
    )
    # dequant: scores *= qs[t] * ks[s]
    s = s_int.astype(f32)
    s = s * qs[:, :, :, 0].transpose(0, 2, 1)[:, :, :, None]
    s = s * ks[:, :, :, 0].transpose(0, 2, 1)[:, :, None, :]
    s = s * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", p, v.astype(f32))
    return o.astype(q.dtype)
