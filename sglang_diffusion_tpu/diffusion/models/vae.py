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
        z = z.astype(params["conv_in"].dtype)  # bf16 params take bf16 input
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


def make_parallel_decode(cfg: VAEConfig, mesh, axis: str = "sp",
                         halo: int = 8):
    """Spatially-tiled VAE decode over a mesh axis (reference analog:
    multimodal_gen/runtime/models/vaes/parallel/ — each rank decodes one
    horizontal strip of the latent).

    Exactness: each rank takes its strip plus a `halo` of latent rows
    (>= the decoder's total receptive radius, ~6 latent px for the default
    config), so conv outputs in the interior are bit-identical to the
    serial decode; GroupNorm statistics are computed over interior pixels
    only and psum'd across the axis, making them exactly the global stats.
    The returned function must be called under jit with `mesh` visible.
    """
    n = mesh.shape[axis]

    def gn_sp(x, gamma, beta, off, interior_rows, scale, groups=8, eps=1e-6):
        b, h, w, c = x.shape
        rows = jax.lax.broadcasted_iota(jnp.int32, (h,), 0)
        lo = off * scale
        hi = (off + interior_rows) * scale
        m = ((rows >= lo) & (rows < hi)).astype(jnp.float32)[None, :, None, None]
        xf = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
        mf = m[..., None]
        s1 = (xf * mf).sum(axis=(1, 2, 4), keepdims=True)
        s2 = (jnp.square(xf) * mf).sum(axis=(1, 2, 4), keepdims=True)
        s1 = jax.lax.psum(s1, axis)
        s2 = jax.lax.psum(s2, axis)
        count = float(n * interior_rows * scale * w * (c // groups))
        mean = s1 / count
        var = s2 / count - jnp.square(mean)
        xf = (xf - mean) * jax.lax.rsqrt(var + eps)
        return (xf.reshape(b, h, w, c) * gamma + beta).astype(x.dtype)

    def local_decode(params, z):
        """z: full latents [B, H, W, C] (replicated). Returns this rank's
        output strip [B, strip*8, W*8, 3]."""
        b, h, w, c = z.shape
        strip = h // n
        tile_h = min(h, strip + 2 * halo)
        idx = jax.lax.axis_index(axis)
        start = idx * strip
        lo = jnp.clip(start - halo, 0, h - tile_h)
        zt = jax.lax.dynamic_slice(z, (0, lo, 0, 0), (b, tile_h, w, c))
        off = start - lo  # interior offset inside the tile (latent rows)

        x = zt / cfg.scaling_factor + cfg.shift_factor
        x = conv2d(x, params["conv_in"], params["conv_in_b"])
        scale = 1
        for stage in params["stages"]:
            for rp in stage["res"]:
                hdd = gn_sp(x, rp["n1"], rp["n1_b"], off, strip, scale)
                hdd = conv2d(jax.nn.silu(hdd), rp["c1"], rp["c1_b"])
                hdd = gn_sp(hdd, rp["n2"], rp["n2_b"], off, strip, scale)
                hdd = conv2d(jax.nn.silu(hdd), rp["c2"], rp["c2_b"])
                x = x + hdd
            bb, hh, ww, cc = x.shape
            x = jax.image.resize(x, (bb, hh * 2, ww * 2, cc), "nearest")
            x = conv2d(x, stage["up"], stage["up_b"])
            scale *= 2
        x = gn_sp(x, params["norm_out"], params["norm_out_b"], off, strip, scale)
        x = conv2d(jax.nn.silu(x), params["conv_out"], params["conv_out_b"])
        x = jnp.tanh(x)
        # crop the interior strip at the output scale
        return jax.lax.dynamic_slice(
            x, (0, off * scale, 0, 0),
            (b, strip * scale, x.shape[2], 3),
        )

    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def decode(params, z):
        import functools

        f = functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(P(), P()),
            out_specs=P(None, axis, None, None),
            check_vma=False,
        )(local_decode)
        return f(params, z)

    return decode


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
        images = images.astype(params["conv_in"].dtype)
        x = conv2d(images, params["conv_in"], params["conv_in_b"])
        for dp in params["downs"]:
            x = conv2d(jax.nn.silu(x), dp["c"], dp["c_b"], stride=2)
        z = conv2d(jax.nn.silu(x), params["conv_out"], params["conv_out_b"])
        return (z - cfg.shift_factor) * cfg.scaling_factor
