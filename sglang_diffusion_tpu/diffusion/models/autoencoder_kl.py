"""AutoencoderKL decoder (diffusers-layout) — functional JAX.

Reference analog: multimodal_gen/runtime/models/vaes/ (the Flux/SD VAE;
diffusers AutoencoderKL). Implements the decoder half faithfully so real
checkpoint directories (`vae/` with diffusers config.json +
safetensors) decode through our pipeline:

  z / scaling_factor + shift -> post_quant_conv(1x1) -> conv_in(3x3)
  -> mid: resnet, single-head spatial attention, resnet
  -> up blocks (reversed block_out_channels; layers_per_block+1 resnets,
     nearest-2x upsample + conv except after the last)
  -> group_norm(32) -> silu -> conv_out(3x3)

ResnetBlock: GN32 -> silu -> conv3x3 -> GN32 -> silu -> conv3x3 with a
1x1 shortcut when channels change. All convs NHWC with HWIO kernels
(TPU-native layout; diffusers' OIHW kernels are transposed on ingest).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class AutoencoderKLConfig:
    latent_channels: int = 16
    out_channels: int = 3
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.3611
    shift_factor: float = 0.1159
    use_post_quant_conv: bool = True
    sample_size: int = 1024

    @classmethod
    def from_hf(cls, d: Dict[str, Any]) -> "AutoencoderKLConfig":
        return cls(
            latent_channels=d.get("latent_channels", 4),
            out_channels=d.get("out_channels", 3),
            block_out_channels=tuple(d.get("block_out_channels",
                                           (128, 256, 512, 512))),
            layers_per_block=d.get("layers_per_block", 2),
            norm_num_groups=d.get("norm_num_groups", 32),
            scaling_factor=d.get("scaling_factor", 0.18215),
            shift_factor=d.get("shift_factor") or 0.0,
            use_post_quant_conv=d.get("use_post_quant_conv", True),
            sample_size=d.get("sample_size", 1024),
        )


def _conv(x, w, b):
    """NHWC 3x3/1x1 same-pad conv; w is HWIO."""
    pad = (w.shape[0] - 1) // 2
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return out + b


def _gn(x, g, b, groups, eps=1e-6):
    n, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(n, h, w, groups, c // groups)
    mu = xf.mean(axis=(1, 2, 4), keepdims=True)
    var = xf.var(axis=(1, 2, 4), keepdims=True)
    xf = (xf - mu) * jax.lax.rsqrt(var + eps)
    xf = xf.reshape(n, h, w, c)
    return (xf * g.astype(jnp.float32) + b.astype(jnp.float32)).astype(x.dtype)


def _resnet(x, p, groups):
    h = jax.nn.silu(_gn(x, p["norm1_g"], p["norm1_b"], groups))
    h = _conv(h, p["conv1_w"], p["conv1_b"])
    h = jax.nn.silu(_gn(h, p["norm2_g"], p["norm2_b"], groups))
    h = _conv(h, p["conv2_w"], p["conv2_b"])
    if "shortcut_w" in p:
        x = _conv(x, p["shortcut_w"], p["shortcut_b"])
    return x + h


def _attn(x, p, groups):
    """Single-head spatial self-attention over H*W tokens (diffusers
    Attention with GroupNorm, used in the VAE mid block)."""
    n, h, w, c = x.shape
    hn = _gn(x, p["norm_g"], p["norm_b"], groups).reshape(n, h * w, c)
    q = hn @ p["q_w"] + p["q_b"]
    k = hn @ p["k_w"] + p["k_b"]
    v = hn @ p["v_w"] + p["v_b"]
    s = jnp.einsum("ntc,nsc->nts", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(c)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("nts,nsc->ntc", a, v.astype(jnp.float32)).astype(x.dtype)
    o = o @ p["out_w"] + p["out_b"]
    return x + o.reshape(n, h, w, c)


class AutoencoderKLDecoder:
    @staticmethod
    def apply(params, z: jax.Array, cfg: AutoencoderKLConfig) -> jax.Array:
        """[B, h, w, latent_ch] -> [B, H, W, 3] in [-1, 1]."""
        g = cfg.norm_num_groups
        x = z / cfg.scaling_factor + cfg.shift_factor
        if cfg.use_post_quant_conv:
            x = _conv(x, params["post_quant_w"], params["post_quant_b"])
        x = _conv(x, params["conv_in_w"], params["conv_in_b"])
        x = _resnet(x, params["mid_res1"], g)
        x = _attn(x, params["mid_attn"], g)
        x = _resnet(x, params["mid_res2"], g)
        n_up = len(cfg.block_out_channels)
        for i in range(n_up):
            for r in params[f"up{i}_res"]:
                x = _resnet(x, r, g)
            if i < n_up - 1:
                b, hh, ww, c = x.shape
                x = jax.image.resize(x, (b, hh * 2, ww * 2, c), "nearest")
                x = _conv(x, params[f"up{i}_upw"], params[f"up{i}_upb"])
        x = jax.nn.silu(_gn(x, params["out_norm_g"], params["out_norm_b"], g))
        return _conv(x, params["conv_out_w"], params["conv_out_b"])

    # ---------------- diffusers ingestion ----------------

    @staticmethod
    def convert_diffusers_weights(cfg: AutoencoderKLConfig, get,
                                  dtype=jnp.float32) -> Dict[str, Any]:
        """Map a diffusers AutoencoderKL state dict (decoder half) to our
        tree. `get(name) -> np.ndarray`; conv kernels OIHW -> HWIO."""

        def conv(name):
            w = np.asarray(get(f"{name}.weight"))
            return w.transpose(2, 3, 1, 0), np.asarray(get(f"{name}.bias"))

        def lin(name):
            w = np.asarray(get(f"{name}.weight"))
            return w.T, np.asarray(get(f"{name}.bias"))

        def vec(name):
            return np.asarray(get(name))

        def resnet(prefix, cin, cout):
            p = {}
            p["norm1_g"] = vec(f"{prefix}.norm1.weight")
            p["norm1_b"] = vec(f"{prefix}.norm1.bias")
            p["conv1_w"], p["conv1_b"] = conv(f"{prefix}.conv1")
            p["norm2_g"] = vec(f"{prefix}.norm2.weight")
            p["norm2_b"] = vec(f"{prefix}.norm2.bias")
            p["conv2_w"], p["conv2_b"] = conv(f"{prefix}.conv2")
            if cin != cout:
                p["shortcut_w"], p["shortcut_b"] = conv(
                    f"{prefix}.conv_shortcut")
            return p

        ch = list(cfg.block_out_channels)
        rev = list(reversed(ch))
        params: Dict[str, Any] = {}
        if cfg.use_post_quant_conv:
            params["post_quant_w"], params["post_quant_b"] = conv(
                "post_quant_conv")
        params["conv_in_w"], params["conv_in_b"] = conv("decoder.conv_in")
        mid_c = rev[0]
        params["mid_res1"] = resnet("decoder.mid_block.resnets.0",
                                    mid_c, mid_c)
        params["mid_res2"] = resnet("decoder.mid_block.resnets.1",
                                    mid_c, mid_c)
        at = "decoder.mid_block.attentions.0"
        params["mid_attn"] = {
            "norm_g": vec(f"{at}.group_norm.weight"),
            "norm_b": vec(f"{at}.group_norm.bias"),
        }
        for ours, theirs in [("q", "to_q"), ("k", "to_k"), ("v", "to_v"),
                             ("out", "to_out.0")]:
            w, b = lin(f"{at}.{theirs}")
            params["mid_attn"][f"{ours}_w"] = w
            params["mid_attn"][f"{ours}_b"] = b
        n_res = cfg.layers_per_block + 1
        for i in range(len(rev)):
            cin = rev[i - 1] if i > 0 else rev[0]
            cout = rev[i]
            res = []
            for j in range(n_res):
                rc_in = cin if j == 0 else cout
                res.append(resnet(f"decoder.up_blocks.{i}.resnets.{j}",
                                  rc_in, cout))
            params[f"up{i}_res"] = res
            if i < len(rev) - 1:
                w, b = conv(f"decoder.up_blocks.{i}.upsamplers.0.conv")
                params[f"up{i}_upw"] = w
                params[f"up{i}_upb"] = b
        params["out_norm_g"] = vec("decoder.conv_norm_out.weight")
        params["out_norm_b"] = vec("decoder.conv_norm_out.bias")
        params["conv_out_w"], params["conv_out_b"] = conv("decoder.conv_out")
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)

    @staticmethod
    def init_params(rng, cfg: AutoencoderKLConfig, dtype=jnp.float32):
        """Random weights in the ingested layout (tests / random bench)."""
        ks = [rng]

        def key():
            ks[0], k = jax.random.split(ks[0])
            return k

        def conv(kh, cin, cout):
            w = jax.random.normal(key(), (kh, kh, cin, cout), jnp.float32)
            return (w / np.sqrt(kh * kh * cin)).astype(dtype), jnp.zeros(
                (cout,), dtype)

        def lin(cin, cout):
            w = jax.random.normal(key(), (cin, cout), jnp.float32)
            return (w / np.sqrt(cin)).astype(dtype), jnp.zeros((cout,), dtype)

        def resnet(cin, cout):
            p = {}
            p["norm1_g"] = jnp.ones((cin,), dtype)
            p["norm1_b"] = jnp.zeros((cin,), dtype)
            p["conv1_w"], p["conv1_b"] = conv(3, cin, cout)
            p["norm2_g"] = jnp.ones((cout,), dtype)
            p["norm2_b"] = jnp.zeros((cout,), dtype)
            p["conv2_w"], p["conv2_b"] = conv(3, cout, cout)
            if cin != cout:
                p["shortcut_w"], p["shortcut_b"] = conv(1, cin, cout)
            return p

        rev = list(reversed(cfg.block_out_channels))
        params: Dict[str, Any] = {}
        if cfg.use_post_quant_conv:
            params["post_quant_w"], params["post_quant_b"] = conv(
                1, cfg.latent_channels, cfg.latent_channels)
        params["conv_in_w"], params["conv_in_b"] = conv(
            3, cfg.latent_channels, rev[0])
        params["mid_res1"] = resnet(rev[0], rev[0])
        params["mid_res2"] = resnet(rev[0], rev[0])
        qw, qb = lin(rev[0], rev[0])
        kw, kb = lin(rev[0], rev[0])
        vw, vb = lin(rev[0], rev[0])
        ow, ob = lin(rev[0], rev[0])
        params["mid_attn"] = {
            "norm_g": jnp.ones((rev[0],), dtype),
            "norm_b": jnp.zeros((rev[0],), dtype),
            "q_w": qw, "q_b": qb, "k_w": kw, "k_b": kb,
            "v_w": vw, "v_b": vb, "out_w": ow, "out_b": ob,
        }
        n_res = cfg.layers_per_block + 1
        for i in range(len(rev)):
            cin = rev[i - 1] if i > 0 else rev[0]
            cout = rev[i]
            params[f"up{i}_res"] = [
                resnet(cin if j == 0 else cout, cout) for j in range(n_res)
            ]
            if i < len(rev) - 1:
                params[f"up{i}_upw"], params[f"up{i}_upb"] = conv(
                    3, cout, cout)
        params["out_norm_g"] = jnp.ones((rev[-1],), dtype)
        params["out_norm_b"] = jnp.zeros((rev[-1],), dtype)
        params["conv_out_w"], params["conv_out_b"] = conv(
            3, rev[-1], cfg.out_channels)
        return params
