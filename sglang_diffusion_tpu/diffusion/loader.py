"""Diffusion pipeline checkpoint save/load.

Reference analog: multimodal_gen/runtime/loader/ + the diffusers-style
model_index.json layout the reference pipelines consume. A saved pipeline
directory contains:

    model_index.json            component class names + text_encoder_type
    transformer/config.json     DiTConfig fields
    transformer/model.safetensors
    vae/config.json             VAEConfig fields
    vae/model.safetensors
    text_encoder/config.json    encoder config fields (family-specific)
    text_encoder/model.safetensors

Param trees flatten to "/"-joined safetensors keys; jnp arrays round-trip
through numpy (bf16 via ml_dtypes)."""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("diffusion_loader")


def _flatten(tree, prefix: str = "") -> Dict[str, Any]:
    """Lists flatten as "#<index>" path components (VAE stage lists)."""
    out = {}
    items = (
        enumerate(tree) if isinstance(tree, list) else tree.items()
    )
    for k, v in items:
        name = f"#{k}" if isinstance(tree, list) else str(k)
        key = f"{prefix}/{name}" if prefix else name
        if isinstance(v, (dict, list)):
            out.update(_flatten(v, key))
        else:
            out[key] = v
    return out


def _unflatten(flat: Dict[str, Any]) -> Dict[str, Any]:
    tree: Dict[str, Any] = {}
    for key, v in flat.items():
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v

    def listify(node):
        if not isinstance(node, dict):
            return node
        node = {k: listify(v) for k, v in node.items()}
        if node and all(k.startswith("#") for k in node):
            return [node[f"#{i}"] for i in range(len(node))]
        return node

    return listify(tree)


def _save_component(dirpath: str, cfg, params: Dict[str, Any]) -> None:
    os.makedirs(dirpath, exist_ok=True)
    with open(os.path.join(dirpath, "config.json"), "w") as f:
        json.dump(dataclasses.asdict(cfg), f, indent=1)
    flat = _flatten(params)
    from safetensors.numpy import save_file

    arrays = {}
    for k, v in flat.items():
        a = np.asarray(v)
        if a.dtype == jnp.bfloat16:
            # safetensors-numpy has no bf16: store as f32 view-upcast
            a = a.astype(np.float32)
        arrays[k] = a
    save_file(arrays, os.path.join(dirpath, "model.safetensors"))


def _load_component(dirpath: str, cfg_cls, dtype=jnp.float32):
    with open(os.path.join(dirpath, "config.json")) as f:
        cfg = cfg_cls(**json.load(f))
    from safetensors.numpy import load_file

    flat = load_file(os.path.join(dirpath, "model.safetensors"))
    params = _unflatten(
        {k: jnp.asarray(v, dtype) for k, v in flat.items()}
    )
    return cfg, params


def save_pipeline(pipe, path: str) -> None:
    """Serialize a DiffusionPipeline's configs + weights."""
    os.makedirs(path, exist_ok=True)
    index = {
        "_class_name": "DiffusionPipeline",
        "text_encoder_type": pipe.text_encoder_type,
        "transformer": type(pipe.dit_cfg).__name__,
        "vae": type(pipe.vae_cfg).__name__,
        "text_encoder": type(pipe.te_cfg).__name__,
    }
    with open(os.path.join(path, "model_index.json"), "w") as f:
        json.dump(index, f, indent=1)
    _save_component(
        os.path.join(path, "transformer"), pipe.dit_cfg, pipe.params["dit"]
    )
    _save_component(os.path.join(path, "vae"), pipe.vae_cfg, pipe.params["vae"])
    _save_component(
        os.path.join(path, "text_encoder"), pipe.te_cfg,
        pipe.params["text_encoder"],
    )
    logger.info("saved pipeline to %s", path)


def load_pipeline(path: str, dtype=jnp.float32, **pipeline_kw):
    """Build a DiffusionPipeline from a saved directory."""
    from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
    from sglang_diffusion_tpu.diffusion.models.llama_encoder import (
        LlamaEncoderConfig,
    )
    from sglang_diffusion_tpu.diffusion.models.t5_encoder import T5Config
    from sglang_diffusion_tpu.diffusion.models.text_encoder import (
        TextEncoderConfig,
    )
    from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig
    from sglang_diffusion_tpu.diffusion.pipeline import DiffusionPipeline

    with open(os.path.join(path, "model_index.json")) as f:
        index = json.load(f)
    te_type = index.get("text_encoder_type", "clip")
    te_cfg_cls = {
        "t5": T5Config,
        "llama": LlamaEncoderConfig,
    }.get(te_type, TextEncoderConfig)

    dit_cfg, dit_p = _load_component(
        os.path.join(path, "transformer"), DiTConfig, dtype
    )
    vae_cfg, vae_p = _load_component(os.path.join(path, "vae"), VAEConfig, dtype)
    te_cfg, te_p = _load_component(
        os.path.join(path, "text_encoder"), te_cfg_cls, dtype
    )
    return DiffusionPipeline(
        dit_cfg=dit_cfg,
        vae_cfg=vae_cfg,
        te_cfg=te_cfg,
        params={"dit": dit_p, "vae": vae_p, "text_encoder": te_p},
        text_encoder_type=te_type,
        **pipeline_kw,
    )
