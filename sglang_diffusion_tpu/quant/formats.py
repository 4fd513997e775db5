"""Checkpoint quantization-format ingest: MXFP4, NVFP4, compressed-tensors.

Reference analogs: srt/layers/quantization/{mxfp4,modelopt_quant,
compressed_tensors/}.py. These are pure-numpy unpack/dequant paths run at
load time; the resulting f32 weights then flow through the normal TPU
pipeline (and can be re-quantized on device to W4A16/int8/FP8 via
quant/quantize.py for the MXU-native serving path).

Formats:

- **MXFP4** (OCP microscaling, gpt-oss checkpoints): FP4 e2m1 values in
  blocks of 32 sharing one e8m0 power-of-two scale. Stored as
  ``<name>_blocks`` (uint8, two nibbles per byte, low nibble first) +
  ``<name>_scales`` (uint8, biased exponent).
- **NVFP4** (NVIDIA modelopt): FP4 e2m1 in blocks of 16 with an FP8-e4m3
  per-block scale plus one f32 global scale (``weight_scale_2``).
- **compressed-tensors** (vLLM/llm-compressor): symmetric int-quantized
  (``weight`` int8 + ``weight_scale``) and pack-quantized (``weight_packed``
  int32 nibbles + ``weight_scale`` [+ ``weight_zero_point``], group or
  per-channel).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import numpy as np

# FP4 e2m1 magnitudes, indexed by the low 3 bits; bit 3 is the sign.
E2M1_CODE = np.array([0.0, 0.5, 1.0, 1.5, 2.0, 3.0, 4.0, 6.0],
                     dtype=np.float32)


def e2m1_decode(nibbles: np.ndarray) -> np.ndarray:
    """uint nibble values [0, 16) -> f32 e2m1 values."""
    mag = E2M1_CODE[nibbles & 0x7]
    return np.where(nibbles & 0x8, -mag, mag)


def e2m1_encode(x: np.ndarray) -> np.ndarray:
    """f32 -> nearest-even e2m1 nibble (uint8)."""
    sign = (x < 0).astype(np.uint8) << 3
    ax = np.abs(x.astype(np.float32))
    # midpoints between consecutive code values; ties round to even code
    mids = (E2M1_CODE[:-1] + E2M1_CODE[1:]) / 2.0
    idx = np.searchsorted(mids, ax, side="left").astype(np.uint8)
    # ties-to-even at exact midpoints
    for i, m in enumerate(mids):
        at_mid = ax == m
        if np.any(at_mid):
            even = np.uint8(i if i % 2 == 0 else i + 1)
            idx = np.where(at_mid, even, idx)
    return (sign | idx).astype(np.uint8)


def unpack_nibbles_u8(packed: np.ndarray) -> np.ndarray:
    """uint8 [..., B/2] -> nibbles [..., B], LOW nibble first."""
    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    out = np.stack([lo, hi], axis=-1)
    return out.reshape(*packed.shape[:-1], packed.shape[-1] * 2)


# ---------------- MXFP4 ----------------

MXFP4_BLOCK = 32


def mxfp4_dequantize(blocks: np.ndarray, scales: np.ndarray) -> np.ndarray:
    """blocks uint8 [..., G, B/2] + scales uint8 e8m0 [..., G]
    -> f32 [..., G*B]. e8m0: value = 2^(u8 - 127); 255 is NaN."""
    nib = unpack_nibbles_u8(blocks)  # [..., G, B]
    vals = e2m1_decode(nib)
    exp = scales.astype(np.int32) - 127
    vals = vals * np.exp2(exp.astype(np.float32))[..., None]
    return vals.reshape(*vals.shape[:-2], vals.shape[-2] * vals.shape[-1])


def mxfp4_quantize(w: np.ndarray):
    """f32 [..., K] (K % 32 == 0) -> (blocks u8 [..., K/32, 16],
    scales u8 [..., K/32]). Power-of-two e8m0 scale chosen so the block
    max maps into the e2m1 range [0, 6]."""
    *lead, K = w.shape
    assert K % MXFP4_BLOCK == 0
    wb = w.reshape(*lead, K // MXFP4_BLOCK, MXFP4_BLOCK).astype(np.float32)
    amax = np.max(np.abs(wb), axis=-1)
    with np.errstate(divide="ignore"):
        exp = np.floor(np.log2(np.where(amax > 0, amax, 1.0))) - 2.0
    exp = np.clip(exp, -127, 127)
    scale = np.exp2(exp)
    nib = e2m1_encode(wb / scale[..., None])
    lo = nib[..., 0::2]
    hi = nib[..., 1::2]
    blocks = (lo | (hi << 4)).astype(np.uint8)
    scales = (exp + 127).astype(np.uint8)
    return blocks, scales


# ---------------- NVFP4 ----------------

NVFP4_BLOCK = 16
_E4M3_MAX = 448.0


def _e4m3_decode(u8: np.ndarray) -> np.ndarray:
    """uint8 -> f32 value of the fp8 e4m3 (fn) encoding."""
    u = u8.astype(np.uint32)
    sign = np.where(u & 0x80, -1.0, 1.0).astype(np.float32)
    exp = (u >> 3) & 0xF
    man = u & 0x7
    normal = exp > 0
    val = np.where(
        normal,
        np.exp2(exp.astype(np.float32) - 7.0) * (1.0 + man / 8.0),
        np.exp2(-6.0) * (man / 8.0),
    )
    return sign * val.astype(np.float32)


def _e4m3_encode(x: np.ndarray) -> np.ndarray:
    """f32 -> nearest fp8 e4m3 byte (saturating, no NaN payloads)."""
    import ml_dtypes

    return np.asarray(x, dtype=np.float32).astype(
        ml_dtypes.float8_e4m3fn).view(np.uint8)


def nvfp4_dequantize(
    packed: np.ndarray,      # uint8 [N, K/2]
    block_scales: np.ndarray,  # uint8(e4m3) or f32 [N, K/16]
    global_scale: float,
) -> np.ndarray:
    """modelopt NVFP4 weight -> f32 [N, K]."""
    nib = unpack_nibbles_u8(packed)  # [N, K]
    vals = e2m1_decode(nib)
    if block_scales.dtype == np.uint8:
        bs = _e4m3_decode(block_scales)
    else:
        bs = block_scales.astype(np.float32)
    n, k = vals.shape
    vals = vals.reshape(n, k // NVFP4_BLOCK, NVFP4_BLOCK)
    vals = vals * bs[..., None] * np.float32(global_scale)
    return vals.reshape(n, k)


def nvfp4_quantize(w: np.ndarray):
    """f32 [N, K] -> (packed u8 [N, K/2], block_scales u8 e4m3 [N, K/16],
    global_scale f32). modelopt recipe: global = amax / (6 * 448)."""
    n, k = w.shape
    assert k % NVFP4_BLOCK == 0
    amax = float(np.max(np.abs(w)))
    global_scale = amax / (6.0 * _E4M3_MAX) if amax > 0 else 1.0
    wb = w.reshape(n, k // NVFP4_BLOCK, NVFP4_BLOCK).astype(np.float32)
    bmax = np.max(np.abs(wb), axis=-1)
    bs = bmax / 6.0 / global_scale
    bs_u8 = _e4m3_encode(bs)
    bs_dec = _e4m3_decode(bs_u8)
    denom = np.where(bs_dec > 0, bs_dec, 1.0) * global_scale
    nib = e2m1_encode(wb / denom[..., None])
    lo = nib[..., 0::2]
    hi = nib[..., 1::2]
    packed = (lo | (hi << 4)).astype(np.uint8).reshape(n, k // 2)
    return packed, bs_u8, np.float32(global_scale)


# ---------------- compressed-tensors ----------------

def unpack_int32_nibbles(packed: np.ndarray, signed: bool = True
                         ) -> np.ndarray:
    """int32 [..., K/8] -> int nibbles [..., K] (low nibble first;
    signed: two's-complement 4-bit -> [-8, 7])."""
    p = packed.astype(np.uint32)
    shifts = np.arange(8, dtype=np.uint32) * 4
    nib = (p[..., None] >> shifts) & 0xF
    nib = nib.reshape(*packed.shape[:-1], packed.shape[-1] * 8)
    if signed:
        return np.where(nib >= 8, nib.astype(np.int32) - 16,
                        nib.astype(np.int32))
    return nib.astype(np.int32)


def compressed_tensors_dequantize(
    tensors: Dict[str, np.ndarray],
    num_bits: int = 4,
    group_size: Optional[int] = None,
) -> np.ndarray:
    """Dequantize one compressed-tensors linear weight to f32 [N, K].

    Accepts the two on-disk layouts llm-compressor emits:
    - int-quantized:  ``weight`` int8 [N, K] + ``weight_scale`` ([N,1] or
      [N, K/G]).
    - pack-quantized: ``weight_packed`` int32 [N, K/8] (4-bit
      two's-complement nibbles along K) + ``weight_scale`` +
      optional ``weight_zero_point`` + ``weight_shape``.
    """
    scale = tensors["weight_scale"].astype(np.float32)
    if "weight_packed" in tensors:
        q = unpack_int32_nibbles(tensors["weight_packed"], signed=True)
        if "weight_shape" in tensors:
            n, k = [int(x) for x in np.asarray(tensors["weight_shape"])]
            q = q[..., :k].reshape(n, k)
    else:
        q = tensors["weight"].astype(np.int32)
    n, k = q.shape
    zp = tensors.get("weight_zero_point")
    if scale.ndim == 0:
        scale = scale.reshape(1, 1)
    if scale.ndim == 1:
        scale = scale[:, None]
    g = scale.shape[1]
    if g > 1:  # group-quantized along K
        gs = k // g
        q = q.reshape(n, g, gs)
        if zp is not None:
            q = q - zp.astype(np.int32).reshape(n, g, 1)
        out = q.astype(np.float32) * scale[..., None]
        return out.reshape(n, k)
    if zp is not None:
        q = q - zp.astype(np.int32).reshape(-1, 1)
    return q.astype(np.float32) * scale


def compressed_tensors_quantize_pack(w: np.ndarray, group_size: int = 32):
    """f32 [N, K] -> pack-quantized compressed-tensors layout (symmetric
    4-bit, grouped): dict(weight_packed, weight_scale, weight_shape)."""
    n, k = w.shape
    assert k % group_size == 0
    g = k // group_size
    wg = w.reshape(n, g, group_size).astype(np.float32)
    scale = np.max(np.abs(wg), axis=-1) / 7.0
    scale = np.where(scale > 0, scale, 1.0)
    q = np.clip(np.rint(wg / scale[..., None]), -8, 7).astype(np.int32)
    q = q.reshape(n, k)
    qu = (q & 0xF).astype(np.uint32).reshape(n, k // 8, 8)
    shifts = np.arange(8, dtype=np.uint32) * 4
    packed = np.zeros((n, k // 8), dtype=np.uint32)
    for j in range(8):
        packed |= qu[..., j] << shifts[j]
    return {
        "weight_packed": packed.view(np.int32),
        "weight_scale": scale.astype(np.float32),
        "weight_shape": np.array([n, k], dtype=np.int64),
    }


# ---------------- loader integration ----------------

def maybe_format_get(get, has):
    """Wrap a checkpoint `get(name)` so that MXFP4 / NVFP4 /
    compressed-tensors weights dequantize transparently when the logical
    f32 tensor name is requested (loader analog of _maybe_bnb_get,
    engine/weight_loader.py)."""

    def get2(name: str) -> np.ndarray:
        if not has(name):
            # gpt-oss MXFP4: "<base>" stored as "<base>_blocks/_scales"
            if has(name + "_blocks") and has(name + "_scales"):
                return mxfp4_dequantize(get(name + "_blocks"),
                                        get(name + "_scales"))
            base = name[:-len(".weight")] if name.endswith(".weight") else name
            # compressed-tensors pack-quantized
            if has(base + ".weight_packed"):
                mini = {"weight_packed": get(base + ".weight_packed"),
                        "weight_scale": get(base + ".weight_scale")}
                for sfx in ("weight_zero_point", "weight_shape"):
                    if has(base + "." + sfx):
                        mini[sfx] = get(base + "." + sfx)
                # HF layout [N, K]; the loader applies its own
                # transpose transform afterwards
                return compressed_tensors_dequantize(mini)
            return get(name)  # raise the loader's own KeyError
        w = get(name)
        base = name[:-len(".weight")] if name.endswith(".weight") else name
        # NVFP4: packed fp4 "weight" + per-block e4m3 + global scale
        if (w.dtype == np.uint8 and has(base + ".weight_scale")
                and has(base + ".weight_scale_2")):
            return nvfp4_dequantize(
                w, get(base + ".weight_scale"),
                float(np.asarray(get(base + ".weight_scale_2"))))
        # compressed-tensors int-quantized
        if w.dtype == np.int8 and has(base + ".weight_scale"):
            return compressed_tensors_dequantize(
                {"weight": w, "weight_scale": get(base + ".weight_scale")}
            )
        return w

    return get2
