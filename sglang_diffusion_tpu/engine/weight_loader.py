"""HF checkpoint loader: safetensors -> stacked-layer JAX param pytrees.

Reference analog: srt/model_loader/loader.py:280-702 (DefaultModelLoader) and
weight_utils.py. Reads *.safetensors shards (index file or single file),
applies each model's hf_weight_map (name templates with {i}=layer,
{x}=expert; "t" transform = transpose 2D torch weight into our [in, out]
layout), and stacks per-layer tensors along a leading L axis for
scan-over-layers execution.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.registry import get_model_cls
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("weight_loader")


def _open_shards(model_path: str):
    """Returns {tensor_name: (shard_path)} and an accessor."""
    from safetensors import safe_open

    index_path = os.path.join(model_path, "model.safetensors.index.json")
    name_to_file: Dict[str, str] = {}
    if os.path.exists(index_path):
        with open(index_path) as f:
            index = json.load(f)
        for name, fname in index["weight_map"].items():
            name_to_file[name] = os.path.join(model_path, fname)
    else:
        files = sorted(glob.glob(os.path.join(model_path, "*.safetensors")))
        if not files:
            raise FileNotFoundError(f"no safetensors found in {model_path}")
        for fp in files:
            with safe_open(fp, framework="pt") as f:
                for name in f.keys():
                    name_to_file[name] = fp

    handles: Dict[str, Any] = {}

    def get(name: str) -> np.ndarray:
        # torch framework handles bf16/fp16 natively (numpy cannot)
        import torch

        fp = name_to_file[name]
        if fp not in handles:
            handles[fp] = safe_open(fp, framework="pt")
        t = handles[fp].get_tensor(name)
        if t.dtype in (torch.bfloat16, torch.float16):
            t = t.float()
        return t.numpy()

    def has(name: str) -> bool:
        return name in name_to_file

    return get, has


# VLM checkpoints exist in two layouts: post-4.52 transformers
# ("model.language_model.*", top-level lm_head) and legacy llava-1.5
# ("language_model.model.*"). Maps are written new-style; these prefix
# rewrites resolve legacy files.
HF_NAME_ALIASES = [
    ("model.language_model.", "language_model.model."),
    ("model.encoder.", "encoder."),  # WhisperModel vs ForConditionalGeneration
    ("model.audio_tower.", "audio_tower."),  # qwen2-audio legacy layout
    ("model.vision_tower.", "vision_tower."),
    ("model.multi_modal_projector.", "multi_modal_projector."),
    ("lm_head.", "language_model.lm_head."),
]


def resolve_hf_name(name: str, has) -> str:
    """Return the stored tensor name for `name`, trying layout aliases."""
    if has(name):
        return name
    for new, old in HF_NAME_ALIASES:
        if name.startswith(new):
            cand = old + name[len(new):]
            if has(cand):
                return cand
    raise KeyError(name)


def _maybe_bnb_get(get, has):
    """Transparent bitsandbytes-NF4 dequantization (reference:
    model_loader/loader.py BitsAndBytesModelLoader): a checkpoint tensor
    accompanied by '<name>.quant_state.bitsandbytes__nf4' is packed 4-bit;
    fetch its companions and dequantize on the fly (quant/quantize.py)."""

    def get2(name: str) -> np.ndarray:
        qs = name + ".quant_state.bitsandbytes__nf4"
        if not has(qs):
            return get(name)
        from sglang_diffusion_tpu.quant.quantize import (
            bnb_nf4_state_dict_dequant,
        )

        mini = {name: get(name), qs: get(qs)}
        for sfx in (".absmax", ".quant_map", ".nested_absmax",
                    ".nested_quant_map"):
            if has(name + sfx):
                mini[name + sfx] = get(name + sfx)
        return bnb_nf4_state_dict_dequant(mini)[name]

    return get2


def load_hf_params(
    model_path: str, cfg: ModelConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    model_cls = get_model_cls(cfg.architecture)
    wmap = model_cls.hf_weight_map(cfg)
    get, has = _open_shards(model_path)
    get = _maybe_bnb_get(get, has)
    from sglang_diffusion_tpu.quant.formats import maybe_format_get
    get = maybe_format_get(get, has)
    L = cfg.num_hidden_layers
    params: Dict[str, Any] = {}

    def fetch(name: str, tf) -> np.ndarray:
        w = get(resolve_hf_name(name, has))
        if callable(tf):  # model-specific slice/reshape (e.g. fused qkv)
            w = np.ascontiguousarray(tf(w))
        elif tf == "t":
            w = np.ascontiguousarray(w.T)
        elif tf == "conv":
            # patch-conv weight [E, C, p, p] -> dense [C*p*p, E]
            w = np.ascontiguousarray(w.reshape(w.shape[0], -1).T)
        elif tf == "conv2d_hwio":
            # conv2d weight [O, I, kh, kw] -> HWIO [kh, kw, I, O]
            w = np.ascontiguousarray(w.transpose(2, 3, 1, 0))
        return w

    for path, entry in wmap.items():
        tmpl, tf = entry[0], entry[1]
        lrange = entry[2] if len(entry) > 2 else None
        if "{j}" in tmpl:
            # vision-tower layer index (separate depth from the LM)
            per_layer = [
                fetch(tmpl.format(j=j), tf)
                for j in range(cfg.vision.num_hidden_layers)
            ]
            leaf = np.stack(per_layer)
            node = params
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = jnp.asarray(leaf, dtype)
            continue
        if "{i}" in tmpl:
            # optional third map element: (start, stop) layer range for
            # split layer groups (deepseek dense_layers/moe_layers,
            # step3 moe tail) — default is all L layers
            per_layer = []
            for i in range(*(lrange if lrange is not None else (L,))):
                if "{x}" in tmpl:
                    per_exp = []
                    x = 0
                    while has(tmpl.format(i=i, x=x)):
                        per_exp.append(fetch(tmpl.format(i=i, x=x), tf))
                        x += 1
                    per_layer.append(np.stack(per_exp))
                else:
                    per_layer.append(fetch(tmpl.format(i=i), tf))
            leaf = np.stack(per_layer)
        else:
            leaf = fetch(tmpl, tf)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, dtype)
        logger.debug("loaded %s <- %s %s", path, tmpl, leaf.shape)
    logger.info("loaded %d param groups from %s", len(wmap), model_path)
    return params
