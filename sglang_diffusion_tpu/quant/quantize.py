"""Quantized inference: W8A8 (int8), FP8, and W4A16 checkpoint ingestion.

Reference analog: srt/layers/quantization/ (fp8.py, w8a8_int8.py, awq/gptq)
and the sgl-kernel fused dequant GEMMs (SURVEY.md §2.3 gemm/). TPU-native
design:

- W8A8-int8: per-output-channel symmetric weight quant + per-token dynamic
  activation quant; the int8 x int8 contraction runs natively on the MXU
  (preferred_element_type=int32) — no dequant-matmul needed, XLA fuses the
  scales into the epilogue.
- FP8 (e4m3): same shape, float8 operands, f32 accumulation.
- W4A16 (AWQ/GPTQ checkpoints): ingested by unpacking to bf16 at load time
  for functional parity; the fused Pallas dequant-matmul kernel is the
  round-2 fast path.

A "quantized leaf" in a params tree is a dict {"qweight", "scale"}; the
model's dense() dispatches on leaf type, so every model (LLM + DiT) gets
quantization for free.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

# weights that get quantized (matmul weights; norms/embeddings stay high-prec)
_QUANT_KEYS = {
    "wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down", "lm_head",
    "wqkv", "mod",
}


def _quantize_leaf_int8(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8: w [..., K, N] -> int8 + scale[..., N]."""
    wf = np.asarray(w, np.float32)
    amax = np.abs(wf).max(axis=-2, keepdims=True)  # reduce over K
    amax = np.maximum(amax, 1e-8)
    scale = (amax / 127.0).astype(np.float32)
    q = np.clip(np.round(wf / scale), -127, 127).astype(np.int8)
    return {"qweight": jnp.asarray(q), "scale": jnp.asarray(np.squeeze(scale, -2))}


def _quantize_leaf_fp8(w: jax.Array) -> Dict[str, jax.Array]:
    wf = np.asarray(w, np.float32)
    amax = np.abs(wf).max(axis=-2, keepdims=True)
    amax = np.maximum(amax, 1e-8)
    scale = (amax / 448.0).astype(np.float32)  # e4m3 max ~448
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return {"qweight": jnp.asarray(q), "scale": jnp.asarray(np.squeeze(scale, -2))}


def quantize_params(params: Dict[str, Any], method: str) -> Dict[str, Any]:
    """Quantize matmul weights in a model param tree. method: int8 | fp8."""
    fn = {"int8": _quantize_leaf_int8, "w8a8_int8": _quantize_leaf_int8,
          "fp8": _quantize_leaf_fp8}[method]

    def walk(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk(v)
            elif k in _QUANT_KEYS and hasattr(v, "ndim") and v.ndim >= 2:
                out[k] = fn(v)
            else:
                out[k] = v
        return out

    return walk(params)


def quant_partition_specs(specs: Dict[str, Any]) -> Dict[str, Any]:
    """Derive specs for a quantized tree: scale inherits the output-dim axis."""

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        if isinstance(node, P):
            return node
        return node

    def walk_with_keys(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk_with_keys(v)
            elif k in _QUANT_KEYS and isinstance(v, P) and len(v) >= 2:
                # w spec (..., K_axis, N_axis) -> scale spec (..., N_axis)
                out[k] = {"qweight": v, "scale": P(*(v[:-2] + (v[-1],)))}
            else:
                out[k] = v
        return out

    return walk_with_keys(specs)


# ---------------- runtime matmuls ----------------

def w8a8_int8_matmul(x: jax.Array, qw: jax.Array, w_scale: jax.Array) -> jax.Array:
    """x [..., K] (bf16/f32), qw [K, N] int8, w_scale [N] -> [..., N].

    Per-token dynamic activation quant; int8 contraction on the MXU."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(ax, 1e-8) / 127.0
    xq = jnp.clip(
        jnp.round(x.astype(jnp.float32) / x_scale), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        qw,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    out = acc.astype(jnp.float32) * x_scale * w_scale.astype(jnp.float32)
    return out.astype(x.dtype)


def fp8_matmul(x: jax.Array, qw: jax.Array, w_scale: jax.Array) -> jax.Array:
    """x [..., K], qw [K, N] f8e4m3, w_scale [N]."""
    ax = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True)
    x_scale = jnp.maximum(ax, 1e-8) / 448.0
    xq = (x.astype(jnp.float32) / x_scale).astype(jnp.float8_e4m3fn)
    acc = jax.lax.dot_general(
        xq,
        qw,
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out = acc * x_scale * w_scale.astype(jnp.float32)
    return out.astype(x.dtype)


def dense_maybe_quantized(
    x: jax.Array, w: Any, b: Optional[jax.Array] = None
) -> jax.Array:
    """Dense layer dispatching on leaf type (plain array vs quantized dict)."""
    if isinstance(w, dict):
        qw = w["qweight"]
        if qw.dtype == jnp.int8:
            out = w8a8_int8_matmul(x, qw, w["scale"])
        else:
            out = fp8_matmul(x, qw, w["scale"])
    else:
        out = jnp.dot(x, w)
    if b is not None:
        out = out + b
    return out


# ---------------- W4A16 checkpoint ingestion ----------------

def awq_dequantize(
    qweight: np.ndarray,  # [K, N/8] int32 packed 4-bit
    qzeros: np.ndarray,  # [K/G, N/8] int32 packed
    scales: np.ndarray,  # [K/G, N] f16
) -> np.ndarray:
    """Unpack AWQ 4-bit (reference: sgl-kernel csrc/gemm/awq_kernel.cu
    behavior) into f32 [K, N]."""
    order = np.array([0, 4, 1, 5, 2, 6, 3, 7])  # AWQ interleave order
    shifts = (order * 4)[None, None, :]

    def unpack(p):  # [..., N/8] int32 -> [..., N]
        exp = (p[..., None] >> shifts) & 0xF
        return exp.reshape(*p.shape[:-1], p.shape[-1] * 8)

    w = unpack(qweight).astype(np.float32)  # [K, N]
    z = unpack(qzeros).astype(np.float32)  # [K/G, N]
    group = qweight.shape[0] // qzeros.shape[0]
    z = np.repeat(z, group, axis=0)
    s = np.repeat(scales.astype(np.float32), group, axis=0)
    return (w - z) * s


def gptq_dequantize(
    qweight: np.ndarray,  # [K/8, N] int32 packed 4-bit along K
    qzeros: np.ndarray,  # [K/G, N/8] int32
    scales: np.ndarray,  # [K/G, N] f16
    g_idx: Optional[np.ndarray] = None,  # [K] group index (act-order)
) -> np.ndarray:
    """Unpack GPTQ 4-bit into f32 [K, N]."""
    shifts = (np.arange(8) * 4)[None, :, None]
    w = ((qweight[:, None, :] >> shifts) & 0xF).reshape(-1, qweight.shape[1])
    zshifts = (np.arange(8) * 4)[None, None, :]
    z = ((qzeros[..., None] >> zshifts) & 0xF).reshape(
        qzeros.shape[0], qzeros.shape[1] * 8
    )
    k = w.shape[0]
    group = k // scales.shape[0]
    if g_idx is None:
        g_idx = np.arange(k) // group
    s = scales.astype(np.float32)[g_idx]  # [K, N]
    zz = z.astype(np.float32)[g_idx] + 1.0  # gptq stores zero-1
    return (w.astype(np.float32) - zz) * s
