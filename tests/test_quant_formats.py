"""MXFP4 / NVFP4 / compressed-tensors checkpoint ingest
(quant/formats.py; reference analogs srt/layers/quantization/
{mxfp4,modelopt_quant,compressed_tensors/}.py)."""

import numpy as np

from sglang_diffusion_tpu.quant.formats import (
    compressed_tensors_dequantize,
    compressed_tensors_quantize_pack,
    e2m1_decode,
    e2m1_encode,
    maybe_format_get,
    mxfp4_dequantize,
    mxfp4_quantize,
    nvfp4_dequantize,
    nvfp4_quantize,
    unpack_int32_nibbles,
    unpack_nibbles_u8,
)


def test_e2m1_roundtrip_exact():
    codes = np.arange(16, dtype=np.uint8)
    vals = e2m1_decode(codes)
    # all 16 fp4 values decode to the OCP table and re-encode to
    # themselves (the two zeros collapse to +0)
    expect = np.array([0, .5, 1, 1.5, 2, 3, 4, 6,
                       -0., -.5, -1, -1.5, -2, -3, -4, -6], np.float32)
    np.testing.assert_array_equal(vals, expect)
    re = e2m1_encode(vals)
    re[8] = 8  # -0 encodes as +0; restore for comparison
    np.testing.assert_array_equal(re[1:8], codes[1:8])
    np.testing.assert_array_equal(re[9:], codes[9:])


def test_mxfp4_roundtrip():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((8, 128)).astype(np.float32)
    blocks, scales = mxfp4_quantize(w)
    assert blocks.shape == (8, 4, 16) and scales.shape == (8, 4)
    deq = mxfp4_dequantize(blocks, scales)
    assert deq.shape == w.shape
    # fp4 with power-of-two block scales: max relative block error is
    # bounded by half the largest code gap (1 ulp at 6 is 2)
    err = np.abs(deq - w)
    bmax = np.abs(w).reshape(8, 4, 32).max(-1)
    assert np.all(err.reshape(8, 4, 32) <= bmax[..., None] * 0.34 + 1e-6)
    # exactly-representable values survive round-trip bit-exact
    exact = np.array([[0.5, -3.0, 6.0, 0.0] * 8], np.float32)
    b2, s2 = mxfp4_quantize(exact)
    np.testing.assert_array_equal(mxfp4_dequantize(b2, s2), exact)


def test_nvfp4_roundtrip():
    rng = np.random.default_rng(1)
    w = (rng.standard_normal((4, 64)) * 3).astype(np.float32)
    packed, bs, gs = nvfp4_quantize(w)
    assert packed.shape == (4, 32) and bs.shape == (4, 4)
    deq = nvfp4_dequantize(packed, bs, gs)
    bmax = np.abs(w).reshape(4, 4, 16).max(-1)
    err = np.abs(deq - w).reshape(4, 4, 16)
    assert np.all(err <= bmax[..., None] * 0.35 + 1e-6)


def test_compressed_tensors_pack_roundtrip():
    rng = np.random.default_rng(2)
    w = rng.standard_normal((16, 64)).astype(np.float32)
    ct = compressed_tensors_quantize_pack(w, group_size=32)
    assert ct["weight_packed"].dtype == np.int32
    deq = compressed_tensors_dequantize(ct)
    # symmetric int4 grouped: error <= scale/2
    scale = np.repeat(ct["weight_scale"], 32, axis=1)
    assert np.all(np.abs(deq - w) <= scale / 2 + 1e-6)


def test_compressed_tensors_int8():
    rng = np.random.default_rng(3)
    w = rng.standard_normal((8, 16)).astype(np.float32)
    scale = np.abs(w).max(axis=1, keepdims=True) / 127.0
    q = np.clip(np.rint(w / scale), -128, 127).astype(np.int8)
    deq = compressed_tensors_dequantize(
        {"weight": q, "weight_scale": scale})
    assert np.all(np.abs(deq - w) <= scale / 2 + 1e-6)


def test_unpack_nibble_order():
    p = np.array([[0x21, 0x43]], np.uint8)  # low nibble first
    np.testing.assert_array_equal(unpack_nibbles_u8(p),
                                  [[1, 2, 3, 4]])
    p32 = np.array([[0x87654321]], np.uint32).view(np.int32)
    np.testing.assert_array_equal(
        unpack_int32_nibbles(p32, signed=False)[0],
        [1, 2, 3, 4, 5, 6, 7, 8])


def test_loader_transparent_dequant():
    """maybe_format_get resolves gpt-oss-style _blocks/_scales, NVFP4
    companions, and compressed-tensors packs under their logical names."""
    rng = np.random.default_rng(4)
    w_moe = rng.standard_normal((2, 6, 64)).astype(np.float32)
    blocks, scales = mxfp4_quantize(w_moe)
    w_lin = rng.standard_normal((8, 64)).astype(np.float32)
    packed, bs, gs = nvfp4_quantize(w_lin)
    w_ct = rng.standard_normal((8, 64)).astype(np.float32)
    ct = compressed_tensors_quantize_pack(w_ct, group_size=32)

    store = {
        "mlp.experts.gate_up_proj_blocks": blocks,
        "mlp.experts.gate_up_proj_scales": scales,
        "model.layers.0.self_attn.q_proj.weight": packed,
        "model.layers.0.self_attn.q_proj.weight_scale": bs,
        "model.layers.0.self_attn.q_proj.weight_scale_2":
            np.asarray(gs),
        "model.layers.1.mlp.up_proj.weight_packed": ct["weight_packed"],
        "model.layers.1.mlp.up_proj.weight_scale": ct["weight_scale"],
        "model.layers.1.mlp.up_proj.weight_shape": ct["weight_shape"],
        "plain.weight": np.ones((2, 2), np.float32),
    }
    get2 = maybe_format_get(store.__getitem__, store.__contains__)

    moe = get2("mlp.experts.gate_up_proj")
    assert moe.shape == (2, 6, 64)
    np.testing.assert_allclose(moe, mxfp4_dequantize(blocks, scales))

    qp = get2("model.layers.0.self_attn.q_proj.weight")
    np.testing.assert_allclose(qp, nvfp4_dequantize(packed, bs, gs))

    up = get2("model.layers.1.mlp.up_proj.weight")
    np.testing.assert_allclose(up, compressed_tensors_dequantize(ct))

    np.testing.assert_array_equal(get2("plain.weight"),
                                  np.ones((2, 2), np.float32))
