"""Quantization tests: kernel-level accuracy, AWQ/GPTQ unpack roundtrips,
and e2e quantized engine vs bf16 reference (reference analog:
test/registered/quant + srt/layers/quantization tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.quant.quantize import (
    _quantize_leaf_fp8,
    _quantize_leaf_int8,
    awq_dequantize,
    fp8_matmul,
    gptq_dequantize,
    quantize_params,
    w8a8_int8_matmul,
)


def test_int8_matmul_close_to_f32():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    ref = np.asarray(jnp.dot(x, w))
    q = _quantize_leaf_int8(w)
    got = np.asarray(w8a8_int8_matmul(x, q["qweight"], q["scale"]))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.05, rel


def test_fp8_matmul_close_to_f32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(64, 32)), jnp.float32)
    ref = np.asarray(jnp.dot(x, w))
    q = _quantize_leaf_fp8(w)
    got = np.asarray(fp8_matmul(x, q["qweight"], q["scale"]))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.06, rel


def test_quantize_params_walks_tree():
    params = {
        "embed": jnp.ones((8, 4)),
        "layers": {"wq": jnp.ones((2, 4, 8)), "input_norm": jnp.ones((2, 4))},
    }
    q = quantize_params(params, "int8")
    assert isinstance(q["layers"]["wq"], dict)
    assert q["layers"]["wq"]["qweight"].dtype == jnp.int8
    assert q["layers"]["wq"]["scale"].shape == (2, 8)
    # non-matmul leaves untouched
    assert not isinstance(q["embed"], dict)
    assert not isinstance(q["layers"]["input_norm"], dict)


def _pack4(vals, order):
    """Pack int4 values [..., 8] into int32: logical column j goes to nibble
    position order[j] (matching the unpacker's read of column j from nibble
    order[j])."""
    out = np.zeros(vals.shape[:-1], np.int64)
    for j, nib in enumerate(order):
        out |= vals[..., j].astype(np.int64) << (4 * nib)
    return out.astype(np.uint32).view(np.int32)


def test_awq_dequant_roundtrip():
    rng = np.random.default_rng(2)
    k, n, g = 16, 16, 8
    w4 = rng.integers(0, 16, size=(k, n))
    zeros4 = rng.integers(0, 16, size=(k // g, n))
    scales = rng.normal(size=(k // g, n)).astype(np.float32) ** 2 + 0.1
    order = [0, 4, 1, 5, 2, 6, 3, 7]
    # pack: column j sits at lane position where order[pos] == j%8
    qweight = _pack4(w4.reshape(k, n // 8, 8), order)
    qzeros = _pack4(zeros4.reshape(k // g, n // 8, 8), order)
    got = awq_dequantize(qweight, qzeros, scales)
    ref = (w4 - np.repeat(zeros4, g, 0)) * np.repeat(scales, g, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_gptq_dequant_roundtrip():
    rng = np.random.default_rng(3)
    k, n, g = 16, 16, 8
    w4 = rng.integers(0, 16, size=(k, n))
    zeros4 = rng.integers(0, 15, size=(k // g, n))
    scales = rng.normal(size=(k // g, n)).astype(np.float32) ** 2 + 0.1
    qweight = _pack4(
        w4.reshape(k // 8, 8, n).transpose(0, 2, 1), list(range(8))
    )  # [K/8, N]
    qzeros = _pack4(zeros4.reshape(k // g, n // 8, 8), list(range(8)))
    got = gptq_dequantize(qweight, qzeros, scales)
    ref = (w4 - (np.repeat(zeros4, g, 0) + 1)) * np.repeat(scales, g, 0)
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_e2e_quantized_engine_matches_bf16_top_token():
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = ModelConfig.tiny_llama(vocab_size=512, hidden_size=128)

    def run(quant):
        args = ServerArgs(
            model_path="",
            tokenizer_path="byte",
            page_size=8,
            max_total_tokens=2048,
            attention_backend="xla",
            context_length=256,
            quantization=quant,
        )
        eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
        return eng.generate(
            "hello quantization", SamplingParams(temperature=0.0, max_new_tokens=6)
        )

    ref = run(None)
    for method in ("int8", "fp8"):
        got = run(method)
        # random tiny models are noisy; require the first tokens to agree
        assert got["output_ids"][0] == ref["output_ids"][0], method
        assert len(got["output_ids"]) == 6


# ---------------- W4A16 fused Pallas dequant-GEMM ----------------

def _w4_ref_dequant(q):
    """Reference dequant of a w4a16 quantized leaf -> f32 [K, N]."""
    packed = np.asarray(q["qweight4"])
    s = np.asarray(q["scale4"], np.float32)
    z = np.asarray(q["zero4"], np.float32)
    k2, n = packed.shape
    lo = (packed & 0xF).astype(np.float32)
    hi = ((packed >> 4) & 0xF).astype(np.float32)
    w4 = np.concatenate([lo, hi], axis=0)  # [K, N]
    g = 2 * k2 // s.shape[0]
    return (w4 - np.repeat(z, g, 0)) * np.repeat(s, g, 0)


@pytest.mark.parametrize(
    "m,k,n,group",
    [(4, 128, 128, 32), (16, 256, 384, 64), (33, 512, 256, 128), (1, 256, 128, 128)],
)
def test_w4a16_matmul_matches_dequant_reference(m, k, n, group):
    from sglang_diffusion_tpu.ops.w4a16_pallas import w4a16_matmul
    from sglang_diffusion_tpu.quant.quantize import _quantize_leaf_w4a16

    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(m, k)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(k, n)), jnp.float32)
    q = _quantize_leaf_w4a16(w, group=group)
    ref = np.asarray(x, np.float32) @ _w4_ref_dequant(q)
    got = np.asarray(
        w4a16_matmul(
            x, q["qweight4"], q["scale4"], q["zero4"],
            group=2 * q["qweight4"].shape[0] // q["scale4"].shape[0],
            interpret=True,
        )
    )
    # bf16 MXU accumulation inside the kernel vs f32 reference
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
    assert rel < 0.02, rel


def test_w4a16_quantize_accuracy():
    """4-bit group quant keeps the matmul within a few percent of f32."""
    from sglang_diffusion_tpu.quant.quantize import (
        _quantize_leaf_w4a16,
        dense_maybe_quantized,
    )

    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(8, 256)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(256, 128)), jnp.float32)
    q = _quantize_leaf_w4a16(w, group=64)
    ref = np.asarray(jnp.dot(x, w))
    got = np.asarray(dense_maybe_quantized(x, q))
    rel = np.abs(got - ref).max() / np.abs(ref).max()
    assert rel < 0.15, rel  # 4-bit group quant on gaussian weights


def test_w4a16_3d_input_and_stacked_layers():
    """Stacked [L, K, N] leaves (the model layout) slice per layer and serve
    batched [B, T, K] activations."""
    from sglang_diffusion_tpu.quant.quantize import (
        _quantize_leaf_w4a16,
        dense_maybe_quantized,
    )

    rng = np.random.default_rng(9)
    w = jnp.asarray(rng.normal(size=(2, 128, 128)), jnp.float32)
    q = _quantize_leaf_w4a16(w, group=32)
    x = jnp.asarray(rng.normal(size=(3, 5, 128)), jnp.float32)
    for l in range(2):
        ql = jax.tree.map(lambda a: a[l], q)
        got = np.asarray(dense_maybe_quantized(x, ql))
        ref = np.asarray(jnp.einsum("btk,kn->btn", x, w[l]))
        rel = np.abs(got - ref).max() / np.abs(ref).max()
        assert got.shape == (3, 5, 128)
        assert rel < 0.15, rel


def test_e2e_w4a16_engine_runs_and_is_deterministic():
    """4-bit error on an untrained random model can flip near-uniform argmax,
    so (unlike int8/fp8) top-token parity vs bf16 isn't meaningful here;
    kernel accuracy is asserted above. This covers the full engine path."""
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = ModelConfig.tiny_llama(vocab_size=512, hidden_size=128)

    def run(quant):
        args = ServerArgs(
            model_path="",
            tokenizer_path="byte",
            page_size=8,
            max_total_tokens=2048,
            attention_backend="xla",
            context_length=256,
            quantization=quant,
        )
        eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
        return eng.generate(
            "hello quantization", SamplingParams(temperature=0.0, max_new_tokens=4)
        )

    a = run("w4a16")
    b = run("w4a16")
    assert a["output_ids"] == b["output_ids"]
    assert len(a["output_ids"]) == 4
