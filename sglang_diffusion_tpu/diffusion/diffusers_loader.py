"""Diffusers-format checkpoint directory ingestion.

Reference analog: multimodal_gen/runtime/loader/component_loaders/ and
weight_utils.py — load a whole diffusers pipeline directory
(model_index.json + transformer/ + text_encoder*/ + vae/ + scheduler/)
into our functional-JAX component set.

Supported pipelines:
  FluxPipeline        -> diffusion/flux_pipeline.FluxPipeline
  WanPipeline,
  WanImageToVideoPipeline -> diffusion/wan_pipeline.WanVideoPipeline

Components:
  transformer      FluxTransformer2DModel / WanTransformer3DModel weights
  text_encoder     CLIPTextModel (Flux) / UMT5EncoderModel (Wan)
  text_encoder_2   T5EncoderModel (Flux)
  vae              AutoencoderKL (Flux). AutoencoderKLWan (3D causal) is
                   not yet ported: the loader warns and keeps the built-in
                   conv VAE for Wan.
  scheduler        FlowMatch shift parameters
  tokenizer*       HF AutoTokenizer from the subdirectory when present
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable, Dict, Optional

import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("diffusers_loader")


# ---------------- safetensors plumbing ----------------


def _component_files(comp_dir: str) -> list:
    """All safetensors files for one component (sharded or single)."""
    idx = None
    for name in os.listdir(comp_dir):
        if name.endswith(".safetensors.index.json"):
            idx = os.path.join(comp_dir, name)
    if idx is not None:
        with open(idx) as f:
            shards = sorted(set(json.load(f)["weight_map"].values()))
        return [os.path.join(comp_dir, s) for s in shards]
    return sorted(
        os.path.join(comp_dir, n) for n in os.listdir(comp_dir)
        if n.endswith(".safetensors")
    )


def make_getter(comp_dir: str) -> Callable[[str], np.ndarray]:
    """`get(name) -> np.ndarray` over a component's safetensors shard set
    (lazy per-tensor reads; large checkpoints never fully materialize)."""
    from safetensors import safe_open

    handles = [
        safe_open(p, framework="np") for p in _component_files(comp_dir)
    ]
    index: Dict[str, Any] = {}
    for fh in handles:
        for name in fh.keys():
            index[name] = fh

    def get(name: str) -> np.ndarray:
        return index[name].get_tensor(name)

    get.names = list(index)  # type: ignore[attr-defined]
    return get


def _config(path: str, comp: str) -> Dict[str, Any]:
    with open(os.path.join(path, comp, "config.json")) as f:
        return json.load(f)


def _try_tokenizer(path: str, sub: str):
    d = os.path.join(path, sub)
    if not os.path.isdir(d):
        return None
    try:
        from transformers import AutoTokenizer

        return AutoTokenizer.from_pretrained(d)
    except Exception as e:  # noqa: BLE001 — tokenizer is optional
        logger.warning("tokenizer %s unavailable: %s", sub, e)
        return None


# ---------------- component loaders ----------------


def load_t5_component(path: str, comp: str, dtype=jnp.float32):
    """UMT5/T5 encoder directory -> (T5Config, params)."""
    from sglang_diffusion_tpu.diffusion.models.t5_encoder import (
        T5Config,
        T5Encoder,
    )

    cfg = T5Config.from_hf(_config(path, comp))
    get = make_getter(os.path.join(path, comp))
    return cfg, T5Encoder.convert_hf_weights(cfg, get, dtype)


def load_clip_component(path: str, comp: str, dtype=jnp.float32):
    from sglang_diffusion_tpu.diffusion.models.clip_encoder import (
        CLIPTextConfig,
        CLIPTextEncoder,
    )

    cfg = CLIPTextConfig.from_hf(_config(path, comp))
    get = make_getter(os.path.join(path, comp))
    return cfg, CLIPTextEncoder.convert_hf_weights(cfg, get, dtype)


def load_vae_component(path: str, dtype=jnp.float32):
    """vae/ -> (AutoencoderKLConfig, params) or (None, None) for
    unsupported VAE classes."""
    from sglang_diffusion_tpu.diffusion.models.autoencoder_kl import (
        AutoencoderKLConfig,
        AutoencoderKLDecoder,
    )

    hf = _config(path, "vae")
    cls = hf.get("_class_name", "AutoencoderKL")
    if cls != "AutoencoderKL":
        logger.warning(
            "VAE class %s not yet ported; keeping built-in conv VAE", cls)
        return None, None
    cfg = AutoencoderKLConfig.from_hf(hf)
    get = make_getter(os.path.join(path, "vae"))
    return cfg, AutoencoderKLDecoder.convert_diffusers_weights(
        cfg, get, dtype)


def _scheduler_shift(path: str) -> Optional[float]:
    p = os.path.join(path, "scheduler", "scheduler_config.json")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f).get("shift")


# ---------------- pipeline loaders ----------------


def load_diffusers_flux(path: str, dtype=jnp.bfloat16, **kw):
    """FluxPipeline from a diffusers directory."""
    from sglang_diffusion_tpu.diffusion.flux_pipeline import FluxPipeline
    from sglang_diffusion_tpu.diffusion.models.flux import FluxDiT

    tcfg = FluxDiT.config_from_diffusers(_config(path, "transformer"))
    get = make_getter(os.path.join(path, "transformer"))
    dit_params = FluxDiT.convert_diffusers_weights(tcfg, get, dtype)

    clip_cfg, clip_params = load_clip_component(path, "text_encoder")
    t5_cfg, t5_params = load_t5_component(path, "text_encoder_2")
    vae_cfg, vae_params = load_vae_component(path)

    params = {
        "dit": dit_params,
        "text_encoder": t5_params,
        "text_encoder_2": clip_params,
    }
    pipe = FluxPipeline(
        flux_cfg=tcfg, clip_cfg=clip_cfg, te_cfg=t5_cfg, params=params,
        dtype=dtype, tokenizer=_try_tokenizer(path, "tokenizer_2"), **kw)
    if vae_params is not None:
        pipe.params["vae"] = vae_params
        pipe.vae_kl_cfg = vae_cfg
        pipe._decode_jit = None
    else:
        from sglang_diffusion_tpu.diffusion.models.vae import VAEDecoder
        import jax

        pipe.params["vae"] = VAEDecoder.init_params(
            jax.random.PRNGKey(2), pipe.vae_cfg, dtype)
    return pipe


def load_diffusers_wan(path: str, dtype=jnp.bfloat16, **kw):
    """WanVideoPipeline from a diffusers directory."""
    from sglang_diffusion_tpu.diffusion.models.wan import WanDiT
    from sglang_diffusion_tpu.diffusion.wan_pipeline import WanVideoPipeline

    tcfg = WanDiT.config_from_diffusers(_config(path, "transformer"))
    get = make_getter(os.path.join(path, "transformer"))
    dit_params = WanDiT.convert_diffusers_weights(tcfg, get, dtype)

    t5_cfg, t5_params = load_t5_component(path, "text_encoder")
    vae_cfg, vae_params = load_vae_component(path)

    params = {"dit": dit_params, "text_encoder": t5_params}
    pipe = WanVideoPipeline(
        wan_cfg=tcfg, te_cfg=t5_cfg, params=params, dtype=dtype,
        tokenizer=_try_tokenizer(path, "tokenizer"), **kw)
    if vae_params is not None:
        pipe.params["vae"] = vae_params
        pipe.vae_kl_cfg = vae_cfg
        pipe._decode_jit = None
    else:
        from sglang_diffusion_tpu.diffusion.models.vae import VAEDecoder
        import jax

        pipe.params["vae"] = VAEDecoder.init_params(
            jax.random.PRNGKey(2), pipe.vae_cfg, dtype)
    shift = _scheduler_shift(path)
    if shift is not None:
        pipe.scheduler.shift = shift
    return pipe


def load_diffusers_dir(path: str, **kw):
    """Dispatch on model_index.json `_class_name` (reference analog:
    loader/fsdp_load.py pipeline class resolution)."""
    with open(os.path.join(path, "model_index.json")) as f:
        cls = json.load(f)["_class_name"]
    if "Flux" in cls:
        return load_diffusers_flux(path, **kw)
    if "Wan" in cls:
        return load_diffusers_wan(path, **kw)
    raise ValueError(f"unsupported diffusers pipeline class {cls!r}")
