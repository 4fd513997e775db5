"""Quantized inference: W8A8 (int8), FP8, and W4A16 checkpoint ingestion.

Reference analog: srt/layers/quantization/ (fp8.py, w8a8_int8.py, awq/gptq)
and the sgl-kernel fused dequant GEMMs (SURVEY.md §2.3 gemm/). TPU-native
design:

- W8A8-int8: per-output-channel symmetric weight quant + per-token dynamic
  activation quant; the int8 x int8 contraction runs natively on the MXU
  (preferred_element_type=int32) — no dequant-matmul needed, XLA fuses the
  scales into the epilogue.
- FP8 (e4m3): same shape, float8 operands, f32 accumulation.
- W4A16: weights stay packed 4-bit in HBM (ksplit nibble layout) and are
  served by the fused Pallas dequant-GEMM (ops/w4a16_pallas.py) — the
  speed-of-light path for weight-bandwidth-bound decode. AWQ/GPTQ
  checkpoints can also be unpacked to bf16 for functional parity.

A "quantized leaf" in a params tree is a dict {"qweight", "scale"}; the
model's dense() dispatches on leaf type, so every model (LLM + DiT) gets
quantization for free.
"""

from __future__ import annotations

import functools

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


# Quantization runs ON DEVICE (jit'd jnp, no host round-trip): pulling a
# TPU-resident param tree to host for numpy quant costs minutes through a
# remote-device transport, and the reference's quant configs also quantize
# on-GPU (srt/layers/quantization/fp8.py process_weights_after_loading).


@jax.jit
def _int8_quant_device(w):
    wf = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-8)
    scale = amax / 127.0
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return q, jnp.squeeze(scale, -2)


def _quantize_leaf_int8(w: jax.Array) -> Dict[str, jax.Array]:
    """Per-output-channel symmetric int8: w [..., K, N] -> int8 + scale[..., N]."""
    q, scale = _int8_quant_device(jnp.asarray(w))
    return {"qweight": q, "scale": scale}


@jax.jit
def _fp8_quant_device(w):
    wf = w.astype(jnp.float32)
    amax = jnp.maximum(jnp.max(jnp.abs(wf), axis=-2, keepdims=True), 1e-8)
    scale = amax / 448.0  # e4m3 max ~448
    q = (wf / scale).astype(jnp.float8_e4m3fn)
    return q, jnp.squeeze(scale, -2)


def _quantize_leaf_fp8(w: jax.Array) -> Dict[str, jax.Array]:
    q, scale = _fp8_quant_device(jnp.asarray(w))
    return {"qweight": q, "scale": scale}


@functools.partial(jax.jit, static_argnames=("group",))
def _w4_quant_device(w, group: int):
    wf = w.astype(jnp.float32)
    *lead, k, n = wf.shape
    wg = wf.reshape(*lead, k // group, group, n)
    mx = wg.max(axis=-2)
    mn = wg.min(axis=-2)
    s = jnp.maximum((mx - mn) / 15.0, 1e-8)  # [..., K//g, N]
    z = -mn / s
    q = jnp.clip(
        jnp.round(wg / s[..., None, :] + z[..., None, :]), 0, 15
    ).astype(jnp.uint8)
    q = q.reshape(*lead, k, n)
    lo = q[..., : k // 2, :]
    hi = q[..., k // 2 :, :]
    packed = lo | (hi << 4)
    return packed, s, z


def _quantize_leaf_w4a16(w: jax.Array, group: int = 128) -> Dict[str, jax.Array]:
    """Per-group asymmetric 4-bit: w [..., K, N] -> ksplit-packed uint8 +
    per-group scale/zero (dequant = (q - z) * s). Served by the fused Pallas
    dequant-GEMM (ops/w4a16_pallas.py) — the TPU analog of the reference's
    Marlin W4A16 kernels (sgl-kernel csrc/gemm/gptq_kernel.cu)."""
    k = w.shape[-2]
    g = group
    while k % (2 * g) != 0 and g > 8:  # tiny test models: shrink the group
        g //= 2
    packed, s, z = _w4_quant_device(jnp.asarray(w), g)
    return {"qweight4": packed, "scale4": s, "zero4": z}


def quantize_params(params: Dict[str, Any], method: str) -> Dict[str, Any]:
    """Quantize matmul weights in a model param tree. method: int8 | fp8 | w4a16."""
    fn = {"int8": _quantize_leaf_int8, "w8a8_int8": _quantize_leaf_int8,
          "fp8": _quantize_leaf_fp8, "w4a16": _quantize_leaf_w4a16,
          "awq": _quantize_leaf_w4a16, "gptq": _quantize_leaf_w4a16}[method]

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


def quant_partition_specs(
    specs: Dict[str, Any], method: str = "int8"
) -> Dict[str, Any]:
    """Derive specs for a quantized tree: scale inherits the output-dim axis.

    w4a16 leaves keep the full (K, N) spec on all three parts — scale/zero
    are [K//G, N], same axis order as the weight."""
    w4 = method in ("w4a16", "awq", "gptq")

    def walk_with_keys(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = walk_with_keys(v)
            elif k in _QUANT_KEYS and isinstance(v, P) and len(v) >= 2:
                if w4:
                    out[k] = {"qweight4": v, "scale4": v, "zero4": v}
                else:
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


def w4a16_dense(x: jax.Array, w: Dict[str, jax.Array]) -> jax.Array:
    """Fused 4-bit dequant-GEMM (Pallas). Single-chip fast path; under TP the
    packed ksplit layout must be packed per-shard (round-2 shard_map path)."""
    from sglang_diffusion_tpu.ops.w4a16_pallas import w4a16_matmul

    packed = w["qweight4"]
    s = w["scale4"]
    k = 2 * packed.shape[-2]
    group = k // s.shape[-2]
    return w4a16_matmul(
        x, packed, s, w["zero4"], group=group,
        interpret=jax.default_backend() != "tpu",
    )


def dense_maybe_quantized(
    x: jax.Array, w: Any, b: Optional[jax.Array] = None
) -> jax.Array:
    """Dense layer dispatching on leaf type (plain array vs quantized dict)."""
    if isinstance(w, dict):
        if "qweight4" in w:
            out = w4a16_dense(x, w)
        else:
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


# ---------------- bitsandbytes NF4 ingest ----------------

# The 16-entry NF4 codebook (bitsandbytes functional.py create_normal_map;
# quantiles of a standard normal, normalized to [-1, 1]).
NF4_CODE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], np.float32)


def nf4_quantize(w: np.ndarray, blocksize: int = 64):
    """Blockwise NF4 quantization (bitsandbytes quantize_4bit layout):
    flatten, per-block absmax scaling, nearest-codebook nibble, two nibbles
    per byte with the FIRST element in the high nibble. Returns
    (packed uint8 [ceil(n/2)], absmax f32 [nblocks], shape)."""
    shape = w.shape
    flat = w.reshape(-1).astype(np.float32)
    n = flat.size
    pad = (-n) % blocksize
    if pad:
        flat = np.pad(flat, (0, pad))
    blocks = flat.reshape(-1, blocksize)
    absmax = np.abs(blocks).max(axis=1)
    scaled = blocks / np.maximum(absmax[:, None], 1e-12)
    idx = np.abs(scaled[..., None] - NF4_CODE).argmin(-1).astype(np.uint8)
    q = idx.reshape(-1)[:n]
    if n % 2:
        q = np.append(q, 0)
    packed = (q[0::2] << 4) | q[1::2]
    return packed.astype(np.uint8), absmax.astype(np.float32), shape


def nf4_dequantize(packed: np.ndarray, absmax: np.ndarray, shape,
                   blocksize: int = 64) -> np.ndarray:
    """Inverse of nf4_quantize / bitsandbytes dequantize_4bit."""
    hi = (packed >> 4) & 0xF
    lo = packed & 0xF
    q = np.stack([hi, lo], axis=1).reshape(-1)
    n = int(np.prod(shape))
    vals = NF4_CODE[q[:n]]
    nblocks = -(-n // blocksize)
    scale = np.repeat(absmax[:nblocks], blocksize)[:n]
    return (vals * scale).reshape(shape).astype(np.float32)


def bnb_nf4_state_dict_dequant(sd: Dict[str, Any]) -> Dict[str, Any]:
    """Dequantize a bitsandbytes-4bit checkpoint state dict in place of its
    quantized entries (reference: srt loaders' bnb support,
    model_loader/loader.py BitsAndBytesModelLoader): every
    '<p>.weight' with a companion '<p>.weight.quant_state.bitsandbytes__nf4'
    is replaced by its f32 dequantization; double (nested) absmax
    quantization is unrolled first."""
    import json as _json

    out = dict(sd)
    for key in list(sd.keys()):
        if not key.endswith(".quant_state.bitsandbytes__nf4"):
            continue
        base = key[: -len(".quant_state.bitsandbytes__nf4")]
        st = sd[key]
        if isinstance(st, (bytes, bytearray, np.ndarray)):
            st = _json.loads(bytes(np.asarray(st).tobytes()).decode())
        shape = tuple(st["shape"])
        blocksize = int(st.get("blocksize", 64))
        packed = np.asarray(sd[base]).reshape(-1)
        absmax = np.asarray(sd[base + ".absmax"])
        if absmax.dtype == np.uint8:
            # double quantization: absmax itself is int8-quantized
            nmap = np.asarray(sd[base + ".nested_quant_map"], np.float32)
            nabs = np.asarray(sd[base + ".nested_absmax"], np.float32)
            nbs = int(st.get("nested_blocksize", 256))
            offset = np.float32(st.get("offset", 0.0))
            scale = np.repeat(nabs, nbs)[: absmax.size]
            absmax = nmap[absmax] * scale + offset
        w = nf4_dequantize(packed, absmax.astype(np.float32), shape,
                           blocksize)
        out[base] = w
        for suffix in (".absmax", ".quant_map", ".nested_absmax",
                       ".nested_quant_map",
                       ".quant_state.bitsandbytes__nf4"):
            out.pop(base + suffix, None)
    return out
