"""GGUF checkpoint ingestion (reference analog: GGUF path of
srt/model_loader + gguf dequant kernels). A test-local writer builds real
GGUF v3 files (same permutes as llama.cpp's convert_hf_to_gguf.py) so the
reader/loader round-trips against HF logits."""

import struct

import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.engine.gguf_loader import (
    T_F32,
    T_Q4_0,
    T_Q8_0,
    load_gguf_params,
    read_gguf,
)

ALIGN = 32


def _w_str(f, s: str):
    b = s.encode()
    f.write(struct.pack("<Q", len(b)) + b)


def _quant_q8_0(x: np.ndarray) -> bytes:
    flat = x.astype(np.float32).reshape(-1, 32)
    scale = np.abs(flat).max(axis=1) / 127.0
    scale = np.where(scale == 0, 1e-8, scale)
    q = np.clip(np.round(flat / scale[:, None]), -127, 127).astype(np.int8)
    out = bytearray()
    for s, row in zip(scale.astype(np.float16), q):
        out += s.tobytes() + row.tobytes()
    return bytes(out)


def _quant_q4_0(x: np.ndarray) -> bytes:
    flat = x.astype(np.float32).reshape(-1, 32)
    scale = np.abs(flat).max(axis=1) / 7.0  # llama.cpp uses max/-8 variant
    scale = np.where(scale == 0, 1e-8, scale)
    q = np.clip(np.round(flat / scale[:, None]) + 8, 0, 15).astype(np.uint8)
    out = bytearray()
    for s, row in zip(scale.astype(np.float16), q):
        packed = (row[:16] | (row[16:] << 4)).astype(np.uint8)
        out += s.tobytes() + packed.tobytes()
    return bytes(out)


def write_gguf(path, meta, tensors):
    """tensors: {name: (np_array_torch_shape, ttype)}"""
    with open(path, "wb") as f:
        f.write(b"GGUF")
        f.write(struct.pack("<I", 3))
        f.write(struct.pack("<QQ", len(tensors), len(meta)))
        for k, v in meta.items():
            _w_str(f, k)
            if isinstance(v, bool):
                f.write(struct.pack("<I", 7) + struct.pack("<B", v))
            elif isinstance(v, int):
                f.write(struct.pack("<I", 4) + struct.pack("<I", v))
            elif isinstance(v, float):
                f.write(struct.pack("<I", 6) + struct.pack("<f", v))
            else:
                f.write(struct.pack("<I", 8))
                _w_str(f, str(v))
        blobs = []
        offset = 0
        for name, (arr, ttype) in tensors.items():
            if ttype == T_F32:
                blob = arr.astype(np.float32).tobytes()
            elif ttype == T_Q8_0:
                blob = _quant_q8_0(arr)
            elif ttype == T_Q4_0:
                blob = _quant_q4_0(arr)
            else:
                raise ValueError(ttype)
            _w_str(f, name)
            dims = tuple(reversed(arr.shape))  # ne[0] innermost
            f.write(struct.pack("<I", len(dims)))
            f.write(struct.pack("<" + "Q" * len(dims), *dims))
            f.write(struct.pack("<IQ", ttype, offset))
            pad = (-len(blob)) % ALIGN
            blobs.append(blob + b"\x00" * pad)
            offset += len(blob) + pad
        pos = f.tell()
        f.write(b"\x00" * ((-pos) % ALIGN))
        for b in blobs:
            f.write(b)


def _permute(w, n_head):
    """llama.cpp convert_hf_to_gguf permute for q/k weights."""
    out, nin = w.shape
    return (
        w.reshape(n_head, 2, out // n_head // 2, nin)
        .swapaxes(1, 2)
        .reshape(out, nin)
    )


def test_quant_dequant_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((4, 64)).astype(np.float32)
    write_gguf(
        str(tmp_path / "q.gguf"), {"general.alignment": 32},
        {"a": (x, T_Q8_0), "b": (x, T_Q4_0), "c": (x, T_F32)},
    )
    _, t = read_gguf(str(tmp_path / "q.gguf"))
    np.testing.assert_array_equal(t["c"], x)
    assert np.abs(t["a"] - x).max() < 0.02  # q8 error
    assert np.abs(t["b"] - x).max() < 0.35  # q4 error
    assert t["a"].shape == x.shape


def test_gguf_llama_logits_parity(tmp_path):
    from transformers import LlamaConfig, LlamaForCausalLM

    hf_cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.detach().float().numpy() for k, v in model.state_dict().items()}

    tensors = {
        "token_embd.weight": (sd["model.embed_tokens.weight"], T_F32),
        "output_norm.weight": (sd["model.norm.weight"], T_F32),
        "output.weight": (sd["lm_head.weight"], T_F32),
    }
    for i in range(2):
        p = f"model.layers.{i}."
        tensors.update({
            f"blk.{i}.attn_norm.weight": (sd[p + "input_layernorm.weight"], T_F32),
            f"blk.{i}.ffn_norm.weight": (
                sd[p + "post_attention_layernorm.weight"], T_F32),
            f"blk.{i}.attn_q.weight": (
                _permute(sd[p + "self_attn.q_proj.weight"], 4), T_F32),
            f"blk.{i}.attn_k.weight": (
                _permute(sd[p + "self_attn.k_proj.weight"], 2), T_F32),
            f"blk.{i}.attn_v.weight": (sd[p + "self_attn.v_proj.weight"], T_F32),
            f"blk.{i}.attn_output.weight": (
                sd[p + "self_attn.o_proj.weight"], T_F32),
            f"blk.{i}.ffn_gate.weight": (sd[p + "mlp.gate_proj.weight"], T_F32),
            f"blk.{i}.ffn_up.weight": (sd[p + "mlp.up_proj.weight"], T_F32),
            f"blk.{i}.ffn_down.weight": (sd[p + "mlp.down_proj.weight"], T_F32),
        })
    meta = {
        "general.architecture": "llama",
        "llama.embedding_length": 64,
        "llama.block_count": 2,
        "llama.attention.head_count": 4,
        "llama.attention.head_count_kv": 2,
        "llama.feed_forward_length": 128,
        "llama.context_length": 64,
        "llama.attention.layer_norm_rms_epsilon": 1e-6,
        "llama.rope.freq_base": 10000.0,
    }
    path = str(tmp_path / "tiny.gguf")
    write_gguf(path, meta, tensors)

    import jax.numpy as jnp

    cfg = ModelConfig.from_hf_config(
        hf_cfg.to_dict() | {"architectures": ["LlamaForCausalLM"]}
    )
    params = load_gguf_params(path, cfg, dtype=jnp.float32)

    from tests.test_model_numerics import run_ours

    rng = np.random.default_rng(0)
    ids = rng.integers(0, 128, size=(2, 10))
    with torch.no_grad():
        ref = model(torch.tensor(ids)).logits[:, -1, :].numpy()
    got = run_ours(cfg, params, ids)
    np.testing.assert_allclose(got, ref, rtol=1e-3, atol=2e-3)


def test_tied_embeddings_gguf(tmp_path):
    """A GGUF without output.weight (tied embeddings, common for small
    models): config derives tie_word_embeddings from the tensor directory
    (header-only parse — no dequantization) and loading must not KeyError."""
    from sglang_diffusion_tpu.engine.gguf_loader import (
        config_from_gguf,
        read_gguf_header,
    )

    E, V, L, H = 16, 64, 1, 2
    rng = np.random.default_rng(0)
    meta = {
        "general.architecture": "llama",
        "llama.embedding_length": E,
        "llama.feed_forward_length": 2 * E,
        "llama.block_count": L,
        "llama.attention.head_count": H,
        "llama.attention.head_count_kv": H,
        "llama.context_length": 64,
        "llama.attention.layer_norm_rms_epsilon": 1e-6,
        "llama.rope.freq_base": 10000.0,
        "llama.vocab_size": V,
    }
    hd = E // H
    tensors = {
        "token_embd.weight": (rng.standard_normal((V, E)).astype(np.float32), T_F32),
        "output_norm.weight": (np.ones(E, np.float32), T_F32),
        "blk.0.attn_norm.weight": (np.ones(E, np.float32), T_F32),
        "blk.0.ffn_norm.weight": (np.ones(E, np.float32), T_F32),
        "blk.0.attn_q.weight": (rng.standard_normal((H * hd, E)).astype(np.float32), T_F32),
        "blk.0.attn_k.weight": (rng.standard_normal((H * hd, E)).astype(np.float32), T_F32),
        "blk.0.attn_v.weight": (rng.standard_normal((H * hd, E)).astype(np.float32), T_F32),
        "blk.0.attn_output.weight": (rng.standard_normal((E, E)).astype(np.float32), T_F32),
        "blk.0.ffn_gate.weight": (rng.standard_normal((2 * E, E)).astype(np.float32), T_F32),
        "blk.0.ffn_up.weight": (rng.standard_normal((2 * E, E)).astype(np.float32), T_F32),
        "blk.0.ffn_down.weight": (rng.standard_normal((E, 2 * E)).astype(np.float32), T_F32),
    }
    p = tmp_path / "tied.gguf"
    write_gguf(p, meta, tensors)

    hmeta, infos, _ = read_gguf_header(str(p))
    assert "output.weight" not in hmeta["__tensors__"]
    cfg = config_from_gguf(hmeta)
    assert cfg.tie_word_embeddings is True
    params = load_gguf_params(str(p), cfg)
    assert "lm_head" not in params  # tied: forward reuses embed
    assert params["embed"].shape == (V, E)

    # untied config against the same (tied) file must fall back, not raise
    cfg2 = ModelConfig(
        architecture="LlamaForCausalLM", vocab_size=V, hidden_size=E,
        intermediate_size=2 * E, num_hidden_layers=L,
        num_attention_heads=H, num_key_value_heads=H,
        max_position_embeddings=64, tie_word_embeddings=False,
    )
    params2 = load_gguf_params(str(p), cfg2)
    np.testing.assert_allclose(
        np.asarray(params2["lm_head"], np.float32),
        np.asarray(params2["embed"], np.float32).T, rtol=1e-2, atol=1e-2)
