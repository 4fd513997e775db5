"""bitsandbytes NF4 checkpoint ingest (reference analog:
model_loader/loader.py BitsAndBytesModelLoader): packed-nibble layout,
blockwise absmax, double (nested) absmax quantization, and transparent
dequantization inside load_hf_params."""

import json
import os

import numpy as np

from sglang_diffusion_tpu.quant.quantize import (
    NF4_CODE,
    bnb_nf4_state_dict_dequant,
    nf4_dequantize,
    nf4_quantize,
)


def test_nf4_roundtrip_error_bounded():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((64, 96)).astype(np.float32)
    p, a, s = nf4_quantize(w)
    w2 = nf4_dequantize(p, a, s)
    assert w2.shape == w.shape
    # 4-bit normal-float: ~10% mean relative error on gaussian weights
    rel = np.abs(w2 - w).mean() / np.abs(w).mean()
    assert rel < 0.15
    # exact fixed point: re-quantizing the dequantized values is stable
    p2, a2, _ = nf4_quantize(w2)
    np.testing.assert_array_equal(p, p2)


def test_state_dict_dequant_simple_and_nested():
    rng = np.random.default_rng(1)
    w = rng.standard_normal((32, 48)).astype(np.float32)
    packed, absmax, shape = nf4_quantize(w, blocksize=64)
    st = json.dumps({"shape": list(shape), "blocksize": 64}).encode()
    sd = {
        "x.weight": packed,
        "x.weight.absmax": absmax,
        "x.weight.quant_map": NF4_CODE,
        "x.weight.quant_state.bitsandbytes__nf4": np.frombuffer(
            st, np.uint8
        ),
    }
    out = bnb_nf4_state_dict_dequant(sd)
    np.testing.assert_allclose(
        out["x.weight"], nf4_dequantize(packed, absmax, shape), rtol=0, atol=0
    )
    assert "x.weight.absmax" not in out

    # nested (double) quantization of absmax
    nbs = 8
    offset = np.float32(absmax.mean())
    centered = absmax - offset
    pad = (-centered.size) % nbs
    cpad = np.pad(centered, (0, pad))
    nabs = np.abs(cpad.reshape(-1, nbs)).max(1).astype(np.float32)
    code = np.linspace(-1, 1, 256).astype(np.float32)
    scaled = cpad.reshape(-1, nbs) / np.maximum(nabs[:, None], 1e-12)
    a_u8 = np.abs(scaled[..., None] - code).argmin(-1).astype(np.uint8)
    a_u8 = a_u8.reshape(-1)[: absmax.size]
    st2 = json.dumps({
        "shape": list(shape), "blocksize": 64,
        "nested_blocksize": nbs, "offset": float(offset),
    }).encode()
    sd2 = {
        "y.weight": packed,
        "y.weight.absmax": a_u8,
        "y.weight.nested_quant_map": code,
        "y.weight.nested_absmax": nabs,
        "y.weight.quant_state.bitsandbytes__nf4": np.frombuffer(
            st2, np.uint8
        ),
    }
    out2 = bnb_nf4_state_dict_dequant(sd2)
    absmax_rec = code[a_u8] * np.repeat(nabs, nbs)[: absmax.size] + offset
    np.testing.assert_allclose(
        out2["y.weight"],
        nf4_dequantize(packed, absmax_rec.astype(np.float32), shape),
        rtol=1e-6, atol=1e-6,
    )


def test_load_hf_params_transparent_dequant(tmp_path):
    """A checkpoint dir with NF4-packed projections loads through
    load_hf_params and matches direct dequantization."""
    import jax
    import jax.numpy as jnp
    from safetensors.numpy import save_file

    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.engine.weight_loader import load_hf_params
    from sglang_diffusion_tpu.models.registry import get_model_cls

    cfg = ModelConfig.tiny_llama(
        vocab_size=64, hidden_size=32, intermediate_size=48,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    rng = np.random.default_rng(2)
    names_full = {
        "model.embed_tokens.weight": rng.standard_normal((64, 32)),
        "model.norm.weight": np.ones((32,)),
        "lm_head.weight": rng.standard_normal((64, 32)),
        "model.layers.0.input_layernorm.weight": np.ones((32,)),
        "model.layers.0.post_attention_layernorm.weight": np.ones((32,)),
    }
    quant_names = {
        "model.layers.0.self_attn.q_proj.weight": (32, 32),
        "model.layers.0.self_attn.k_proj.weight": (32, 32),
        "model.layers.0.self_attn.v_proj.weight": (32, 32),
        "model.layers.0.self_attn.o_proj.weight": (32, 32),
        "model.layers.0.mlp.gate_proj.weight": (48, 32),
        "model.layers.0.mlp.up_proj.weight": (48, 32),
        "model.layers.0.mlp.down_proj.weight": (32, 48),
    }
    sd = {k: v.astype(np.float32) for k, v in names_full.items()}
    expected = {}
    for name, shp in quant_names.items():
        w = rng.standard_normal(shp).astype(np.float32)
        packed, absmax, shape = nf4_quantize(w)
        expected[name] = nf4_dequantize(packed, absmax, shape)
        st = json.dumps({"shape": list(shape), "blocksize": 64}).encode()
        sd[name] = packed
        sd[name + ".absmax"] = absmax
        sd[name + ".quant_map"] = NF4_CODE
        sd[name + ".quant_state.bitsandbytes__nf4"] = np.frombuffer(
            st, np.uint8
        )
    d = tmp_path / "ckpt"
    os.makedirs(d)
    save_file(sd, str(d / "model.safetensors"))
    with open(d / "config.json", "w") as f:
        json.dump({"architectures": ["LlamaForCausalLM"]}, f)

    params = load_hf_params(str(d), cfg, dtype=jnp.float32)
    got_q = np.asarray(params["layers"]["wq"][0])  # transposed by loader
    np.testing.assert_allclose(
        got_q, expected["model.layers.0.self_attn.q_proj.weight"].T,
        rtol=1e-6, atol=1e-6,
    )
    got_gate = np.asarray(params["layers"]["w_gate"][0])
    np.testing.assert_allclose(
        got_gate, expected["model.layers.0.mlp.gate_proj.weight"].T,
        rtol=1e-6, atol=1e-6,
    )
