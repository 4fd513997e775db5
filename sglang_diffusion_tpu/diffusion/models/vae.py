"""Convolutional VAE decoder/encoder (functional JAX, NHWC).

Reference analog: multimodal_gen/runtime/models/vaes/ (wan/flux/qwenimage
VAEs). Round 1: a compact AutoencoderKL-style decoder (conv_in -> resnet
stack -> N x (nearest-upsample + conv) -> groupnorm -> conv_out) that maps
[B, h, w, C_lat] latents to [B, 8h, 8w, 3] images, plus the matching
encoder for image-to-image paths. Checkpoint import for real VAEs arrives
with the model-family pipelines.

Convs are XLA conv_general_dilated in NHWC — on TPU these lower onto the
MXU; no Pallas needed for round 1.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class VAEConfig:
    latent_channels: int = 16
    base_channels: int = 64
    num_upsamples: int = 3  # 2^3 = 8x spatial scale
    num_res_blocks: int = 1
    scaling_factor: float = 1.0  # latent scaling (model-family specific)
    shift_factor: float = 0.0


def conv2d(x, w, b, stride=1):
    out = jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride, stride),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def group_norm(x, gamma, beta, groups=8, eps=1e-6):
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    mean = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mean) * jax.lax.rsqrt(var + eps)
    return (xf.reshape(b, h, w, c) * gamma + beta).astype(x.dtype)


def _conv_init(key, kh, kw, cin, cout, dtype):
    scale = 1.0 / np.sqrt(kh * kw * cin)
    return (jax.random.normal(key, (kh, kw, cin, cout), jnp.float32) * scale).astype(
        dtype
    )


class VAEDecoder:
    @staticmethod
    def init_params(rng, cfg: VAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
        ks = iter(jax.random.split(rng, 64))
        ch = cfg.base_channels * (2 ** cfg.num_upsamples)
        p: Dict[str, Any] = {
            "conv_in": _conv_init(next(ks), 3, 3, cfg.latent_channels, ch, dtype),
            "conv_in_b": jnp.zeros((ch,), dtype),
            "stages": [],
        }
        for s in range(cfg.num_upsamples):
            cout = ch // 2
            stage = {"res": [], "up": _conv_init(next(ks), 3, 3, ch, cout, dtype),
                     "up_b": jnp.zeros((cout,), dtype)}
            for _ in range(cfg.num_res_blocks):
                stage["res"].append(
                    {
                        "n1": jnp.ones((ch,), dtype),
                        "n1_b": jnp.zeros((ch,), dtype),
                        "c1": _conv_init(next(ks), 3, 3, ch, ch, dtype),
                        "c1_b": jnp.zeros((ch,), dtype),
                        "n2": jnp.ones((ch,), dtype),
                        "n2_b": jnp.zeros((ch,), dtype),
                        "c2": _conv_init(next(ks), 3, 3, ch, ch, dtype),
                        "c2_b": jnp.zeros((ch,), dtype),
                    }
                )
            p["stages"].append(stage)
            ch = cout
        p["norm_out"] = jnp.ones((ch,), dtype)
        p["norm_out_b"] = jnp.zeros((ch,), dtype)
        p["conv_out"] = _conv_init(next(ks), 3, 3, ch, 3, dtype)
        p["conv_out_b"] = jnp.zeros((3,), dtype)
        return p

    @staticmethod
    def apply(params, latents: jax.Array, cfg: VAEConfig) -> jax.Array:
        """latents [B, h, w, C_lat] -> images [B, 8h, 8w, 3] in [-1, 1]."""
        z = latents / cfg.scaling_factor + cfg.shift_factor
        x = conv2d(z, params["conv_in"], params["conv_in_b"])
        for stage in params["stages"]:
            for rp in stage["res"]:
                h = group_norm(x, rp["n1"], rp["n1_b"])
                h = conv2d(jax.nn.silu(h), rp["c1"], rp["c1_b"])
                h = group_norm(h, rp["n2"], rp["n2_b"])
                h = conv2d(jax.nn.silu(h), rp["c2"], rp["c2_b"])
                x = x + h
            b, hh, ww, c = x.shape
            x = jax.image.resize(x, (b, hh * 2, ww * 2, c), "nearest")
            x = conv2d(x, stage["up"], stage["up_b"])
        x = group_norm(x, params["norm_out"], params["norm_out_b"])
        x = conv2d(jax.nn.silu(x), params["conv_out"], params["conv_out_b"])
        return jnp.tanh(x)


class VAEEncoder:
    @staticmethod
    def init_params(rng, cfg: VAEConfig, dtype=jnp.float32) -> Dict[str, Any]:
        ks = iter(jax.random.split(rng, 64))
        ch = cfg.base_channels
        p: Dict[str, Any] = {
            "conv_in": _conv_init(next(ks), 3, 3, 3, ch, dtype),
            "conv_in_b": jnp.zeros((ch,), dtype),
            "downs": [],
        }
        for s in range(cfg.num_upsamples):
            cout = ch * 2
            p["downs"].append(
                {
                    "c": _conv_init(next(ks), 3, 3, ch, cout, dtype),
                    "c_b": jnp.zeros((cout,), dtype),
                }
            )
            ch = cout
        p["conv_out"] = _conv_init(next(ks), 3, 3, ch, cfg.latent_channels, dtype)
        p["conv_out_b"] = jnp.zeros((cfg.latent_channels,), dtype)
        return p

    @staticmethod
    def apply(params, images: jax.Array, cfg: VAEConfig) -> jax.Array:
        x = conv2d(images, params["conv_in"], params["conv_in_b"])
        for dp in params["downs"]:
            x = conv2d(jax.nn.silu(x), dp["c"], dp["c_b"], stride=2)
        z = conv2d(jax.nn.silu(x), params["conv_out"], params["conv_out_b"])
        return (z - cfg.shift_factor) * cfg.scaling_factor
