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


def load_hf_params(
    model_path: str, cfg: ModelConfig, dtype=jnp.bfloat16
) -> Dict[str, Any]:
    model_cls = get_model_cls(cfg.architecture)
    wmap = model_cls.hf_weight_map(cfg)
    get, has = _open_shards(model_path)
    L = cfg.num_hidden_layers
    params: Dict[str, Any] = {}

    def fetch(name: str, tf) -> np.ndarray:
        w = get(name)
        if tf == "t":
            w = np.ascontiguousarray(w.T)
        return w

    for path, (tmpl, tf) in wmap.items():
        if "{i}" in tmpl:
            per_layer = []
            for i in range(L):
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
