"""GGUF checkpoint loader (llama.cpp format).

Reference analog: the GGUF path of srt/model_loader/loader.py +
sgl-kernel's gguf dequant kernels (csrc/quantization/gguf/gguf_kernel.cu).
Pure-Python reader for the GGUF v2/v3 container; dequantization of the
common block formats happens vectorized in numpy at load time (weights are
then requantized to the engine's own W8A8/W4A16 formats if requested —
the TPU has no scalar-block GGUF kernels, and our Pallas W4A16 path wants
its own packed layout).

Supported tensor types: F32, F16, BF16, Q8_0, Q4_0, Q4_1.
Name translation + inverse rope permute map llama.cpp tensors onto the
LlamaFamily tree.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Tuple

import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("gguf")

GGUF_MAGIC = b"GGUF"

# ggml tensor types
T_F32, T_F16, T_Q4_0, T_Q4_1, T_Q8_0, T_BF16 = 0, 1, 2, 3, 8, 30

# metadata value types
_MV_FMT = {0: "B", 1: "b", 2: "H", 3: "h", 4: "I", 5: "i", 6: "f",
           10: "Q", 11: "q", 12: "d"}


def _read_str(f) -> str:
    (n,) = struct.unpack("<Q", f.read(8))
    return f.read(n).decode("utf-8")


def _read_value(f, vtype: int):
    if vtype in _MV_FMT:
        fmt = _MV_FMT[vtype]
        return struct.unpack("<" + fmt, f.read(struct.calcsize(fmt)))[0]
    if vtype == 7:  # bool
        return bool(f.read(1)[0])
    if vtype == 8:  # string
        return _read_str(f)
    if vtype == 9:  # array
        (etype,) = struct.unpack("<I", f.read(4))
        (n,) = struct.unpack("<Q", f.read(8))
        return [_read_value(f, etype) for _ in range(n)]
    raise ValueError(f"unknown gguf metadata type {vtype}")


def _dequant(raw: bytes, ttype: int, n_elems: int) -> np.ndarray:
    if ttype == T_F32:
        return np.frombuffer(raw, np.float32, n_elems).copy()
    if ttype == T_F16:
        return np.frombuffer(raw, np.float16, n_elems).astype(np.float32)
    if ttype == T_BF16:
        import ml_dtypes

        return np.frombuffer(raw, ml_dtypes.bfloat16, n_elems).astype(
            np.float32
        )
    if ttype == T_Q8_0:
        # blocks of 32: f16 scale + 32 x int8
        nb = n_elems // 32
        blk = np.frombuffer(raw, np.uint8, nb * 34).reshape(nb, 34)
        scale = blk[:, :2].copy().view(np.float16).astype(np.float32)
        qs = blk[:, 2:].copy().view(np.int8).astype(np.float32)
        return (qs * scale).reshape(-1)
    if ttype == T_Q4_0:
        # blocks of 32: f16 scale + 16 bytes; elem j = lo nibble, j+16 = hi
        nb = n_elems // 32
        blk = np.frombuffer(raw, np.uint8, nb * 18).reshape(nb, 18)
        scale = blk[:, :2].copy().view(np.float16).astype(np.float32)
        qs = blk[:, 2:]
        lo = (qs & 0x0F).astype(np.float32) - 8.0
        hi = (qs >> 4).astype(np.float32) - 8.0
        out = np.concatenate([lo, hi], axis=1) * scale
        return out.reshape(-1)
    if ttype == T_Q4_1:
        # blocks of 32: f16 scale + f16 min + 16 bytes
        nb = n_elems // 32
        blk = np.frombuffer(raw, np.uint8, nb * 20).reshape(nb, 20)
        scale = blk[:, :2].copy().view(np.float16).astype(np.float32)
        mn = blk[:, 2:4].copy().view(np.float16).astype(np.float32)
        qs = blk[:, 4:]
        lo = (qs & 0x0F).astype(np.float32)
        hi = (qs >> 4).astype(np.float32)
        out = np.concatenate([lo, hi], axis=1) * scale + mn
        return out.reshape(-1)
    raise ValueError(f"unsupported gguf tensor type {ttype}")


def _type_bytes(ttype: int, n_elems: int) -> int:
    if ttype == T_F32:
        return 4 * n_elems
    if ttype in (T_F16, T_BF16):
        return 2 * n_elems
    if ttype == T_Q8_0:
        return n_elems // 32 * 34
    if ttype == T_Q4_0:
        return n_elems // 32 * 18
    if ttype == T_Q4_1:
        return n_elems // 32 * 20
    raise ValueError(f"unsupported gguf tensor type {ttype}")


def read_gguf_header(
    path: str,
) -> Tuple[Dict[str, Any], List[Tuple[str, Tuple[int, ...], int, int]], int]:
    """Parse only the GGUF metadata + tensor directory (no tensor data).
    Returns (meta, infos, data_base). meta gains "__tensors__": the tensor
    name list — used by config_from_gguf to detect tied embeddings (no
    output.weight tensor) without dequantizing any weights."""
    with open(path, "rb") as f:
        if f.read(4) != GGUF_MAGIC:
            raise ValueError("not a GGUF file")
        (version,) = struct.unpack("<I", f.read(4))
        if version < 2:
            raise ValueError(f"gguf version {version} unsupported")
        n_tensors, n_kv = struct.unpack("<QQ", f.read(16))
        meta: Dict[str, Any] = {}
        for _ in range(n_kv):
            key = _read_str(f)
            (vtype,) = struct.unpack("<I", f.read(4))
            meta[key] = _read_value(f, vtype)
        infos: List[Tuple[str, Tuple[int, ...], int, int]] = []
        for _ in range(n_tensors):
            name = _read_str(f)
            (nd,) = struct.unpack("<I", f.read(4))
            dims = struct.unpack("<" + "Q" * nd, f.read(8 * nd))
            ttype, offset = struct.unpack("<IQ", f.read(12))
            infos.append((name, dims, ttype, offset))
        align = meta.get("general.alignment", 32)
        base = (f.tell() + align - 1) // align * align
        meta["__tensors__"] = [name for name, _, _, _ in infos]
        meta["__version__"] = version
        return meta, infos, base


def read_gguf(path: str) -> Tuple[Dict[str, Any], Dict[str, np.ndarray]]:
    """Parse a GGUF file -> (metadata, {tensor_name: f32 ndarray}).
    Tensor arrays come back in torch-style shape (GGUF ne[] reversed)."""
    meta, infos, base = read_gguf_header(path)
    with open(path, "rb") as f:
        tensors: Dict[str, np.ndarray] = {}
        for name, dims, ttype, offset in infos:
            n_elems = int(np.prod(dims))
            f.seek(base + offset)
            raw = f.read(_type_bytes(ttype, n_elems))
            arr = _dequant(raw, ttype, n_elems)
            # ne[0] is innermost: numpy shape = reversed dims
            tensors[name] = arr.reshape(tuple(reversed(dims)))
        logger.info("gguf: %d tensors, %d metadata keys (v%d)",
                    len(tensors), len(meta), meta["__version__"])
        return meta, tensors


def _unpermute(w: np.ndarray, n_head: int) -> np.ndarray:
    """Invert llama.cpp's rope permute (convert_hf_to_gguf permute()):
    gguf stores q/k rows interleaved for its rope; restore HF rotate-half
    row order. w: [out, in]."""
    out, nin = w.shape
    hd = out // n_head
    return (
        w.reshape(n_head, hd // 2, 2, nin)
        .swapaxes(1, 2)
        .reshape(out, nin)
    )


# llama.cpp tensor name -> (our path, transform)
def _gguf_weight_map(cfg: ModelConfig):
    m = {
        "token_embd.weight": (("embed",), None),
        "output_norm.weight": (("final_norm",), None),
        "blk.{i}.attn_norm.weight": (("layers", "input_norm"), None),
        "blk.{i}.ffn_norm.weight": (("layers", "post_norm"), None),
        "blk.{i}.attn_q.weight": (("layers", "wq"), "tq"),
        "blk.{i}.attn_k.weight": (("layers", "wk"), "tk"),
        "blk.{i}.attn_v.weight": (("layers", "wv"), "t"),
        "blk.{i}.attn_output.weight": (("layers", "wo"), "t"),
        "blk.{i}.ffn_gate.weight": (("layers", "w_gate"), "t"),
        "blk.{i}.ffn_up.weight": (("layers", "w_up"), "t"),
        "blk.{i}.ffn_down.weight": (("layers", "w_down"), "t"),
    }
    if not cfg.tie_word_embeddings:
        m["output.weight"] = (("lm_head",), "t")
    return m


def config_from_gguf(meta: Dict[str, Any]) -> ModelConfig:
    """Build a ModelConfig from GGUF metadata (llama.cpp key names)."""
    arch = meta.get("general.architecture", "llama")

    def g(key, default=None):
        return meta.get(f"{arch}.{key}", default)

    n_head = g("attention.head_count", 32)
    return ModelConfig(
        architecture="LlamaForCausalLM",
        vocab_size=len(meta.get("tokenizer.ggml.tokens", []))
        or g("vocab_size", 32000),
        hidden_size=g("embedding_length", 4096),
        intermediate_size=g("feed_forward_length", 11008),
        num_hidden_layers=g("block_count", 32),
        num_attention_heads=n_head,
        num_key_value_heads=g("attention.head_count_kv", n_head),
        max_position_embeddings=g("context_length", 4096),
        rms_norm_eps=g("attention.layer_norm_rms_epsilon", 1e-6),
        rope_theta=g("rope.freq_base", 10000.0),
        # tied embeddings <=> no separate output.weight tensor in the file
        # (common for small models; llama.cpp then reuses token_embd)
        tie_word_embeddings=(
            "output.weight" not in meta["__tensors__"]
            if "__tensors__" in meta else False
        ),
    )


def load_gguf_params(path: str, cfg: ModelConfig, dtype=None):
    """Load a llama-family GGUF file into our stacked-layer param tree."""
    import jax.numpy as jnp

    dtype = dtype or jnp.bfloat16
    _, tensors = read_gguf(path)
    if "output.weight" not in tensors:
        # tied embeddings stored once as token_embd: reuse for lm_head
        tensors["output.weight"] = tensors["token_embd.weight"]
    hq = cfg.num_attention_heads
    hkv = cfg.num_key_value_heads
    params: Dict[str, Any] = {}
    for tmpl, (pth, tf) in _gguf_weight_map(cfg).items():
        def fetch(name):
            w = tensors[name]
            if tf == "tq":
                w = _unpermute(w, hq).T
            elif tf == "tk":
                w = _unpermute(w, hkv).T
            elif tf == "t":
                w = w.T
            return np.ascontiguousarray(w)

        if "{i}" in tmpl:
            leaf = np.stack(
                [fetch(tmpl.format(i=i)) for i in range(cfg.num_hidden_layers)]
            )
        else:
            leaf = fetch(tmpl)
        node = params
        for k in pth[:-1]:
            node = node.setdefault(k, {})
        node[pth[-1]] = jnp.asarray(leaf, dtype)
    return params
