"""Wan 3D causal VAE (AutoencoderKLWan) — TPU-native JAX implementation.

Reference behavior:
/root/reference/python/sglang/multimodal_gen/runtime/models/vaes/wanvae.py:805
(AutoencoderKLWan; encoder :281, decoder :579, causal conv + feature-cache
semantics in runtime/models/vaes/parallel/wan_common_utils.py:109-312), which
is itself the diffusers AutoencoderKLWan layout — the state-dict names here
follow the public checkpoint format.

TPU-first redesign (not a port):
- channels-last [B, T, H, W, C] so lax.conv_general_dilated ("NDHWC") maps
  straight onto the MXU; torch uses NCTHW.
- the reference's per-conv python feature-cache (contextvars + module
  traversal) becomes an explicit FIFO-state PYTREE: every causal conv with
  temporal extent carries its last-2-input-frames buffer (zeros-initialized,
  which reproduces the reference's zero-padding + "cache last frame of last
  two chunks" behavior exactly — see _causal_conv3d), and
- decode/encode run chunk 0 through one jitted program, then lax.scan the
  remaining chunks with the state pytree as carry: two compiled programs
  total regardless of video length, no per-frame re-tracing.

Supports the Wan 2.1 family config (base_dim 96, z_dim 16, non-residual) and
the Wan 2.2 residual-block variant (AvgDown3D/DupUp3D shortcuts, patchify).
"""

from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CACHE_T = 2


@dataclasses.dataclass
class WanVAEConfig:
    base_dim: int = 96
    decoder_base_dim: Optional[int] = None
    z_dim: int = 16
    dim_mult: Tuple[int, ...] = (1, 2, 4, 4)
    num_res_blocks: int = 2
    attn_scales: Tuple[float, ...] = ()
    temperal_downsample: Tuple[bool, ...] = (False, True, True)
    latents_mean: Tuple[float, ...] = tuple([0.0] * 16)
    latents_std: Tuple[float, ...] = tuple([1.0] * 16)
    is_residual: bool = False  # Wan 2.2 ti2v VAE
    patch_size: Optional[int] = None
    in_channels: int = 3
    out_channels: int = 3

    @classmethod
    def from_hf(cls, hf: dict) -> "WanVAEConfig":
        """diffusers AutoencoderKLWan vae/config.json fields."""
        z = int(hf.get("z_dim", 16))
        return cls(
            base_dim=int(hf.get("base_dim", 96)),
            decoder_base_dim=hf.get("decoder_base_dim"),
            z_dim=z,
            dim_mult=tuple(hf.get("dim_mult", (1, 2, 4, 4))),
            num_res_blocks=int(hf.get("num_res_blocks", 2)),
            attn_scales=tuple(hf.get("attn_scales", ())),
            temperal_downsample=tuple(
                hf.get("temperal_downsample", (False, True, True))),
            latents_mean=tuple(hf.get("latents_mean", (0.0,) * z)),
            latents_std=tuple(hf.get("latents_std", (1.0,) * z)),
            is_residual=bool(hf.get("is_residual", False)),
            patch_size=hf.get("patch_size"),
            in_channels=int(hf.get("in_channels", 3)),
            out_channels=int(hf.get("out_channels", 3)),
        )

    @property
    def temporal_compression(self) -> int:
        return 2 ** sum(self.temperal_downsample)

    @property
    def spatial_compression(self) -> int:
        return 2 ** (len(self.dim_mult) - 1) * (self.patch_size or 1)


class _StateIO:
    """Functional analog of the reference's feat_cache idx walk: each
    temporal-state site pulls its incoming state (None on the first chunk,
    meaning 'create zeros') and pushes the updated one; sites execute in a
    fixed traversal order so the pushed list is a stable pytree."""

    def __init__(self, states: Optional[List[jax.Array]]):
        self._in = states
        self.out: List[jax.Array] = []
        self._i = 0

    def pull(self):
        if self._in is None:
            return None
        s = self._in[self._i]
        self._i += 1
        return s

    def push(self, s):
        self.out.append(s)


# ---------------------------------------------------------------------------
# primitive layers (params are dicts of arrays)
# ---------------------------------------------------------------------------


def _conv3d(p, x, stride=(1, 1, 1), pad_hw=None):
    """Plain 3D conv, NDHWC x DHWIO. pad_hw: ((top,bot),(l,r)) or None=same."""
    kt, kh, kw = p["w"].shape[:3]
    if pad_hw is None:
        pad_hw = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    out = jax.lax.conv_general_dilated(
        x.astype(p["w"].dtype),
        p["w"],
        window_strides=stride,
        padding=((0, 0),) + tuple(pad_hw),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return out + p["b"]


def _causal_conv3d(p, x, io: _StateIO):
    """WanCausalConv3d (wan_common_utils.py:109): causal in time via a
    2-frame FIFO of past input frames (zeros before the clip starts).

    Equivalence with the reference cache: chunk 0 pads 2 zero frames; the
    stored cache is always the last two frames seen (zero-filled when
    fewer) — i.e. cat([state, x])[:, -2:] with zeros init."""
    kt = p["w"].shape[0]
    if kt == 1:
        return _conv3d(p, x)
    state = io.pull()
    if state is None:
        b, _, h, w, c = x.shape
        state = jnp.zeros((b, CACHE_T, h, w, c), x.dtype)
    full = jnp.concatenate([state.astype(x.dtype), x], axis=1)
    y = _conv3d(p, full)
    io.push(full[:, -CACHE_T:])
    return y


def _rms_norm(p, x):
    # WanRMS_norm (wan_common_utils.py:157): L2-normalize over channels,
    # times sqrt(C), times gamma (channels-last here).
    c = x.shape[-1]
    xf = x.astype(jnp.float32)
    n = xf * jax.lax.rsqrt(jnp.sum(xf * xf, axis=-1, keepdims=True) + 1e-12)
    return (n * np.sqrt(c) * p["gamma"].astype(jnp.float32)).astype(x.dtype)


def _spatial_conv2d(p, x, stride=1, pad=None):
    """Per-frame 2D conv on [B, T, H, W, C] (fold T into batch)."""
    b, t, h, w, c = x.shape
    kh, kw = p["w"].shape[:2]
    if pad is None:
        pad = ((kh // 2, kh // 2), (kw // 2, kw // 2))
    y = jax.lax.conv_general_dilated(
        x.reshape(b * t, h, w, c).astype(p["w"].dtype),
        p["w"],
        window_strides=(stride, stride),
        padding=pad,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + p["b"]
    return y.reshape(b, t, *y.shape[1:])


def _upsample2x(x):
    """nearest-exact 2x spatial upsample on [B, T, H, W, C]."""
    b, t, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, t, h, 2, w, 2, c))
    return x.reshape(b, t, h * 2, w * 2, c)


# ---------------------------------------------------------------------------
# blocks
# ---------------------------------------------------------------------------


def _residual_block(p, x, io):
    h = _conv3d(p["conv_shortcut"], x) if "conv_shortcut" in p else x
    y = _rms_norm(p["norm1"], x)
    y = jax.nn.silu(y)
    y = _causal_conv3d(p["conv1"], y, io)
    y = _rms_norm(p["norm2"], y)
    y = jax.nn.silu(y)
    y = _causal_conv3d(p["conv2"], y, io)
    return y + h


def _attention_block(p, x):
    """Single-head spatial attention per frame (wan_common_utils.py:379)."""
    b, t, h, w, c = x.shape
    y = _rms_norm(p["norm"], x)
    qkv = _spatial_conv2d(p["to_qkv"], y)  # 1x1 conv -> 3c
    qkv = qkv.reshape(b * t, h * w, 3, c)
    q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
    scores = jnp.einsum(
        "bnc,bmc->bnm", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(c)
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    o = jnp.einsum("bnm,bmc->bnc", probs, v)
    o = o.reshape(b, t, h, w, c)
    o = _spatial_conv2d(p["proj"], o)
    return o + x


def _mid_block(p, x, io):
    x = _residual_block(p["resnets"][0], x, io)
    for attn, res in zip(p["attentions"], p["resnets"][1:]):
        x = _attention_block(attn, x)
        x = _residual_block(res, x, io)
    return x


def _upsample3d(p, x, io, first_chunk):
    """WanResample upsample3d (wan_common_utils.py:241-293). First chunk:
    no temporal doubling, time-conv state frozen (the reference's "Rep"
    marker); later chunks zero-pad where the Rep marker stood — which the
    zeros-initialized FIFO reproduces."""
    b, t, h, w, c = x.shape
    state = io.pull()
    if state is None:
        state = jnp.zeros((b, CACHE_T, h, w, c), x.dtype)
    if first_chunk:
        io.push(state)  # frozen: slot reserved, value untouched
    else:
        full = jnp.concatenate([state.astype(x.dtype), x], axis=1)
        y = _conv3d(p["time_conv"], full)  # [B, T, H, W, 2C]
        io.push(full[:, -CACHE_T:])
        # interleave the two c-channel halves along time: T -> 2T
        y = y.reshape(b, t, h, w, 2, c)
        x = y.transpose(0, 1, 4, 2, 3, 5).reshape(b, t * 2, h, w, c)
    x = _upsample2x(x)
    return _spatial_conv2d(p["resample_conv"], x)


def _upsample2d(p, x):
    return _spatial_conv2d(p["resample_conv"], _upsample2x(x))


def _downsample2d(p, x):
    # ZeroPad2d((0,1,0,1)) + stride-2 3x3 conv
    return _spatial_conv2d(p["resample_conv"], x, stride=2,
                           pad=((0, 1), (0, 1)))


def _downsample3d(p, x, io, first_chunk):
    """WanResample downsample3d (wan_common_utils.py:297-311): spatial
    downsample always; temporal stride-2 conv with a 1-frame cache. The
    first chunk passes through the time conv untouched (cache primed)."""
    x = _downsample2d(p, x)
    state = io.pull()
    if first_chunk:
        io.push(x[:, -1:])
        return x
    full = jnp.concatenate([state.astype(x.dtype), x], axis=1)
    io.push(full[:, -1:])
    return _conv3d(p["time_conv"], full, stride=(2, 1, 1),
                   pad_hw=((0, 0), (0, 0)))


def _avg_down3d(x, out_c, factor_t, factor_s):
    """AvgDown3D (wan_common_utils.py:10) — weightless shortcut."""
    b, t, h, w, c = x.shape
    pad_t = (factor_t - t % factor_t) % factor_t
    if pad_t:
        x = jnp.pad(x, ((0, 0), (pad_t, 0), (0, 0), (0, 0), (0, 0)))
        t = t + pad_t
    x = x.reshape(b, t // factor_t, factor_t, h // factor_s, factor_s,
                  w // factor_s, factor_s, c)
    # torch groups channels as [C, ft, fh, fw] (channel-major) then averages
    # group_size consecutive entries; channels-last transpose reproduces it
    x = x.transpose(0, 1, 3, 5, 7, 2, 4, 6)  # [B,T',H',W',C,ft,fh,fw]
    factor = factor_t * factor_s * factor_s
    x = x.reshape(b, t // factor_t, h // factor_s, w // factor_s, c * factor)
    group = (c * factor) // out_c
    return x.reshape(*x.shape[:4], out_c, group).mean(axis=-1)


def _dup_up3d(x, out_c, factor_t, factor_s, first_chunk):
    """DupUp3D (wan_common_utils.py:63) — weightless shortcut."""
    b, t, h, w, c = x.shape
    factor = factor_t * factor_s * factor_s
    repeats = out_c * factor // c
    x = jnp.repeat(x, repeats, axis=-1)  # [B,T,H,W, C*rep]
    x = x.reshape(b, t, h, w, out_c, factor_t, factor_s, factor_s)
    x = x.transpose(0, 1, 5, 2, 6, 3, 7, 4)
    x = x.reshape(b, t * factor_t, h * factor_s, w * factor_s, out_c)
    if first_chunk:
        x = x[:, factor_t - 1:]
    return x


# ---------------------------------------------------------------------------
# decoder / encoder chunk programs
# ---------------------------------------------------------------------------


def _decoder_dims(cfg: WanVAEConfig) -> List[int]:
    dim = cfg.decoder_base_dim or cfg.base_dim
    mult = list(cfg.dim_mult)
    return [dim * u for u in [mult[-1]] + mult[::-1]]


def decoder_forward(p, cfg: WanVAEConfig, z, states, first_chunk):
    """One chunk through WanDecoder3d (wanvae.py:579). z [B, t, h, w, z_dim]
    channels-last. Returns (pixels in [-1,1], new_states)."""
    t_up = list(cfg.temperal_downsample)[::-1]
    io = _StateIO(states)
    x = _causal_conv3d(p["conv_in"], z, io)
    x = _mid_block(p["mid_block"], x, io)
    dims = _decoder_dims(cfg)
    for i, blk in enumerate(p["up_blocks"]):
        up_flag = i != len(cfg.dim_mult) - 1
        shortcut_in = x if (cfg.is_residual and up_flag) else None
        for res in blk["resnets"]:
            x = _residual_block(res, x, io)
        if up_flag:
            if t_up[i]:
                x = _upsample3d(blk["upsampler"], x, io, first_chunk)
            else:
                x = _upsample2d(blk["upsampler"], x)
        if shortcut_in is not None:
            x = x + _dup_up3d(shortcut_in, dims[i + 1],
                              2 if t_up[i] else 1, 2, first_chunk)
    x = _rms_norm(p["norm_out"], x)
    x = jax.nn.silu(x)
    x = _causal_conv3d(p["conv_out"], x, io)
    return jnp.clip(x, -1.0, 1.0), io.out


def encoder_forward(p, cfg: WanVAEConfig, x, states, first_chunk):
    """One chunk through WanEncoder3d (wanvae.py:281). x [B, t, H, W, 3].
    Returns (mu_logvar [B, t', h, w, 2*z_dim], new_states)."""
    io = _StateIO(states)
    y = _causal_conv3d(p["conv_in"], x, io)
    dims = [cfg.base_dim * u for u in [1] + list(cfg.dim_mult)]
    for i, blk in enumerate(p["down_blocks"]):
        down_flag = i != len(cfg.dim_mult) - 1
        shortcut_in = y if cfg.is_residual else None
        for res in blk["resnets"]:
            y = _residual_block(res, y, io)
        if down_flag:
            if cfg.temperal_downsample[i]:
                y = _downsample3d(blk["downsampler"], y, io, first_chunk)
            else:
                y = _downsample2d(blk["downsampler"], y)
        if shortcut_in is not None:
            factor_t = 2 if (down_flag and cfg.temperal_downsample[i]) else 1
            factor_s = 2 if down_flag else 1
            y = y + _avg_down3d(shortcut_in, dims[i + 1], factor_t, factor_s)
    y = _mid_block(p["mid_block"], y, io)
    y = _rms_norm(p["norm_out"], y)
    y = jax.nn.silu(y)
    y = _causal_conv3d(p["conv_out"], y, io)
    return y, io.out


# ---------------------------------------------------------------------------
# public chunked API (wanvae.py:886 encode / :944 decode with feature cache)
# ---------------------------------------------------------------------------


def _patchify(x, ps):
    if not ps or ps == 1:
        return x
    b, t, h, w, c = x.shape
    x = x.reshape(b, t, h // ps, ps, w // ps, ps, c)
    # torch rearrange "b c f (h q) (w r) -> b (c r q) f h w": output channel
    # order is (c slowest, r, q fastest); dims here are
    # (b, t, h', q, w', r, c) -> (b, t, h', w', c, r, q)
    x = x.transpose(0, 1, 2, 4, 6, 5, 3)
    return x.reshape(b, t, h // ps, w // ps, ps * ps * c)


def _unpatchify(x, ps, out_c):
    if not ps or ps == 1:
        return x
    b, t, h, w, _ = x.shape
    # inverse of _patchify: channels ordered (c, r, q)
    x = x.reshape(b, t, h, w, out_c, ps, ps)  # (..., c, r, q)
    x = x.transpose(0, 1, 2, 6, 3, 5, 4)  # (b, t, h, q, w, r, c)
    return x.reshape(b, t, h * ps, w * ps, out_c)


def decode(params, cfg: WanVAEConfig, z: jax.Array) -> jax.Array:
    """z [B, T_lat, h, w, z_dim] -> pixels [B, T_pix, H, W, out_c] in
    [-1, 1]. T_pix = 1 + (T_lat - 1) * temporal_compression.

    Two compiled programs: latent frame 0, then lax.scan over the rest with
    the conv-state pytree as carry (the reference loops python-side per
    frame, wanvae.py:952)."""
    z = z.astype(jnp.float32)
    b, t_lat = z.shape[0], z.shape[1]
    pq = _conv3d(params["post_quant_conv"], z)
    y0, states = decoder_forward(
        params["decoder"], cfg, pq[:, :1], None, True)

    if t_lat == 1:
        out = y0
    else:
        def body(states, zi):
            yi, states = decoder_forward(
                params["decoder"], cfg, zi[:, None], states, False)
            return states, yi

        # scan over latent frames: [T-1, B, 1...] slices
        zs = jnp.moveaxis(pq[:, 1:], 1, 0)  # [T-1, B, h, w, c]
        _, ys = jax.lax.scan(body, states, zs)
        # ys [T-1, B, tc, H, W, C] -> [B, (T-1)*tc, H, W, C]
        tc = ys.shape[2]
        ys = jnp.moveaxis(ys, 0, 1).reshape(b, (t_lat - 1) * tc,
                                            *ys.shape[3:])
        out = jnp.concatenate([y0, ys], axis=1)
    return _unpatchify(out, cfg.patch_size, cfg.out_channels)


def encode(params, cfg: WanVAEConfig, x: jax.Array) -> jax.Array:
    """x [B, T_pix, H, W, in_c] -> mu+logvar [B, T_lat, h, w, 2*z_dim].
    T_pix must be 1 + 4k (the reference encodes frame 0 then 4-frame
    chunks, wanvae.py:895)."""
    x = _patchify(x.astype(jnp.float32), cfg.patch_size)
    b, t = x.shape[0], x.shape[1]
    assert (t - 1) % 4 == 0, f"T={t} must be 1+4k"
    y0, states = encoder_forward(params["encoder"], cfg, x[:, :1], None, True)
    if t > 1:
        n_chunks = (t - 1) // 4
        xs = x[:, 1:].reshape(b, n_chunks, 4, *x.shape[2:])
        xs = jnp.moveaxis(xs, 1, 0)  # [N, B, 4, H, W, C]

        def body(states, xi):
            yi, states = encoder_forward(
                params["encoder"], cfg, xi, states, False)
            return states, yi

        _, ys = jax.lax.scan(body, states, xs)
        ys = jnp.moveaxis(ys, 0, 1).reshape(b, -1, *ys.shape[3:])
        y = jnp.concatenate([y0, ys], axis=1)
    else:
        y = y0
    return _conv3d(params["quant_conv"], y)


def decode_mode(params, cfg: WanVAEConfig, z):
    """Denormalize latents (diffusers scaling) then decode."""
    mean = jnp.asarray(cfg.latents_mean).reshape(1, 1, 1, 1, -1)
    std = jnp.asarray(cfg.latents_std).reshape(1, 1, 1, 1, -1)
    return decode(params, cfg, z * std + mean)


# ---------------------------------------------------------------------------
# params: random init + torch/diffusers state-dict conversion
# ---------------------------------------------------------------------------


def _conv3d_p(key, kt, kh, kw, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(cin * kt * kh * kw)
    return {
        "w": jax.random.uniform(k1, (kt, kh, kw, cin, cout), dtype,
                                -scale, scale),
        "b": jax.random.uniform(k2, (cout,), dtype, -scale, scale),
    }


def _conv2d_p(key, kh, kw, cin, cout, dtype):
    k1, k2 = jax.random.split(key)
    scale = 1.0 / np.sqrt(cin * kh * kw)
    return {
        "w": jax.random.uniform(k1, (kh, kw, cin, cout), dtype,
                                -scale, scale),
        "b": jax.random.uniform(k2, (cout,), dtype, -scale, scale),
    }


def _res_p(key, cin, cout, dtype):
    ks = jax.random.split(key, 3)
    p = {
        "norm1": {"gamma": jnp.ones((cin,), dtype)},
        "conv1": _conv3d_p(ks[0], 3, 3, 3, cin, cout, dtype),
        "norm2": {"gamma": jnp.ones((cout,), dtype)},
        "conv2": _conv3d_p(ks[1], 3, 3, 3, cout, cout, dtype),
    }
    if cin != cout:
        p["conv_shortcut"] = _conv3d_p(ks[2], 1, 1, 1, cin, cout, dtype)
    return p


def _attn_p(key, c, dtype):
    ks = jax.random.split(key, 2)
    return {
        "norm": {"gamma": jnp.ones((c,), dtype)},
        "to_qkv": _conv2d_p(ks[0], 1, 1, c, 3 * c, dtype),
        "proj": _conv2d_p(ks[1], 1, 1, c, c, dtype),
    }


def _mid_p(key, c, dtype):
    ks = jax.random.split(key, 3)
    return {
        "resnets": [_res_p(ks[0], c, c, dtype), _res_p(ks[1], c, c, dtype)],
        "attentions": [_attn_p(ks[2], c, dtype)],
    }


def init_params(key, cfg: WanVAEConfig, dtype=jnp.float32):
    keys = iter(jax.random.split(key, 256))
    in_c = cfg.in_channels * (cfg.patch_size or 1) ** 2
    out_c = cfg.out_channels * (cfg.patch_size or 1) ** 2

    # encoder
    dims = [cfg.base_dim * u for u in [1] + list(cfg.dim_mult)]
    enc = {"conv_in": _conv3d_p(next(keys), 3, 3, 3, in_c, dims[0], dtype),
           "down_blocks": []}
    for i, (ci, co) in enumerate(zip(dims[:-1], dims[1:])):
        blk = {"resnets": []}
        cur = ci
        for _ in range(cfg.num_res_blocks):
            blk["resnets"].append(_res_p(next(keys), cur, co, dtype))
            cur = co
        if i != len(cfg.dim_mult) - 1:
            ds = {"resample_conv": _conv2d_p(next(keys), 3, 3, co, co, dtype)}
            if cfg.temperal_downsample[i]:
                ds["time_conv"] = _conv3d_p(next(keys), 3, 1, 1, co, co,
                                            dtype)
            blk["downsampler"] = ds
        enc["down_blocks"].append(blk)
    enc["mid_block"] = _mid_p(next(keys), dims[-1], dtype)
    enc["norm_out"] = {"gamma": jnp.ones((dims[-1],), dtype)}
    enc["conv_out"] = _conv3d_p(next(keys), 3, 3, 3, dims[-1],
                                2 * cfg.z_dim, dtype)

    # decoder
    ddims = _decoder_dims(cfg)
    t_up = list(cfg.temperal_downsample)[::-1]
    dec = {"conv_in": _conv3d_p(next(keys), 3, 3, 3, cfg.z_dim, ddims[0],
                                dtype),
           "mid_block": _mid_p(next(keys), ddims[0], dtype),
           "up_blocks": []}
    for i, (ci, co) in enumerate(zip(ddims[:-1], ddims[1:])):
        up_flag = i != len(cfg.dim_mult) - 1
        if i > 0 and not cfg.is_residual:
            ci = ci // 2
        blk = {"resnets": []}
        cur = ci
        for _ in range(cfg.num_res_blocks + 1):
            blk["resnets"].append(_res_p(next(keys), cur, co, dtype))
            cur = co
        if up_flag:
            # non-residual halves channels through the upsample conv;
            # residual (2.2) keeps out_dim (wanvae.py:516-520)
            up_out = co if cfg.is_residual else co // 2
            up = {"resample_conv": _conv2d_p(next(keys), 3, 3, co, up_out,
                                             dtype)}
            if t_up[i]:
                up["time_conv"] = _conv3d_p(next(keys), 3, 1, 1, co, 2 * co,
                                            dtype)
            blk["upsampler"] = up
        dec["up_blocks"].append(blk)
    dec["norm_out"] = {"gamma": jnp.ones((ddims[-1],), dtype)}
    dec["conv_out"] = _conv3d_p(next(keys), 3, 3, 3, ddims[-1], out_c, dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _conv3d_p(next(keys), 1, 1, 1, 2 * cfg.z_dim,
                                2 * cfg.z_dim, dtype),
        "post_quant_conv": _conv3d_p(next(keys), 1, 1, 1, cfg.z_dim,
                                     cfg.z_dim, dtype),
    }


# ---- torch/diffusers state-dict conversion --------------------------------


def _cv3(sd, name, dtype):
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    b = np.asarray(sd[f"{name}.bias"], np.float32)
    # torch [Cout, Cin, kt, kh, kw] -> DHWIO
    return {"w": jnp.asarray(w.transpose(2, 3, 4, 1, 0), dtype),
            "b": jnp.asarray(b, dtype)}


def _cv2(sd, name, dtype):
    w = np.asarray(sd[f"{name}.weight"], np.float32)
    b = np.asarray(sd[f"{name}.bias"], np.float32)
    return {"w": jnp.asarray(w.transpose(2, 3, 1, 0), dtype),
            "b": jnp.asarray(b, dtype)}


def _gamma(sd, name, dtype):
    g = np.asarray(sd[f"{name}.gamma"], np.float32).reshape(-1)
    return {"gamma": jnp.asarray(g, dtype)}


def _res_from_sd(sd, pref, dtype):
    p = {
        "norm1": _gamma(sd, f"{pref}.norm1", dtype),
        "conv1": _cv3(sd, f"{pref}.conv1", dtype),
        "norm2": _gamma(sd, f"{pref}.norm2", dtype),
        "conv2": _cv3(sd, f"{pref}.conv2", dtype),
    }
    if f"{pref}.conv_shortcut.weight" in sd:
        p["conv_shortcut"] = _cv3(sd, f"{pref}.conv_shortcut", dtype)
    return p


def _attn_from_sd(sd, pref, dtype):
    return {
        "norm": _gamma(sd, f"{pref}.norm", dtype),
        "to_qkv": _cv2(sd, f"{pref}.to_qkv", dtype),
        "proj": _cv2(sd, f"{pref}.proj", dtype),
    }


def _mid_from_sd(sd, pref, dtype):
    return {
        "resnets": [_res_from_sd(sd, f"{pref}.resnets.{j}", dtype)
                    for j in range(2)],
        "attentions": [_attn_from_sd(sd, f"{pref}.attentions.0", dtype)],
    }


def convert_torch_state_dict(sd, cfg: WanVAEConfig, dtype=jnp.float32):
    """Map the diffusers AutoencoderKLWan checkpoint layout (also the
    reference's, wanvae.py) onto this module's pytree. The encoder's
    down_blocks are a FLAT ModuleList in the non-residual (2.1) layout —
    resnets and resamples interleaved — and structured (.resnets/.
    downsampler) in the residual (2.2) layout."""
    enc = {"conv_in": _cv3(sd, "encoder.conv_in", dtype), "down_blocks": []}
    if cfg.is_residual:
        for i in range(len(cfg.dim_mult)):
            blk = {"resnets": [
                _res_from_sd(sd, f"encoder.down_blocks.{i}.resnets.{j}",
                             dtype)
                for j in range(cfg.num_res_blocks)]}
            ds_pref = f"encoder.down_blocks.{i}.downsampler"
            if f"{ds_pref}.resample.1.weight" in sd:
                ds = {"resample_conv": _cv2(sd, f"{ds_pref}.resample.1",
                                            dtype)}
                if f"{ds_pref}.time_conv.weight" in sd:
                    ds["time_conv"] = _cv3(sd, f"{ds_pref}.time_conv", dtype)
                blk["downsampler"] = ds
            enc["down_blocks"].append(blk)
    else:
        flat = 0
        for i in range(len(cfg.dim_mult)):
            blk = {"resnets": []}
            for _ in range(cfg.num_res_blocks):
                blk["resnets"].append(
                    _res_from_sd(sd, f"encoder.down_blocks.{flat}", dtype))
                flat += 1
            if i != len(cfg.dim_mult) - 1:
                ds_pref = f"encoder.down_blocks.{flat}"
                ds = {"resample_conv": _cv2(sd, f"{ds_pref}.resample.1",
                                            dtype)}
                if f"{ds_pref}.time_conv.weight" in sd:
                    ds["time_conv"] = _cv3(sd, f"{ds_pref}.time_conv", dtype)
                blk["downsampler"] = ds
                flat += 1
            enc["down_blocks"].append(blk)
    enc["mid_block"] = _mid_from_sd(sd, "encoder.mid_block", dtype)
    enc["norm_out"] = _gamma(sd, "encoder.norm_out", dtype)
    enc["conv_out"] = _cv3(sd, "encoder.conv_out", dtype)

    dec = {"conv_in": _cv3(sd, "decoder.conv_in", dtype),
           "mid_block": _mid_from_sd(sd, "decoder.mid_block", dtype),
           "up_blocks": []}
    for i in range(len(cfg.dim_mult)):
        blk = {"resnets": [
            _res_from_sd(sd, f"decoder.up_blocks.{i}.resnets.{j}", dtype)
            for j in range(cfg.num_res_blocks + 1)]}
        # diffusers names the upsampler "upsamplers.0" (non-residual) or
        # "upsampler" (residual layout in the reference)
        for up_pref in (f"decoder.up_blocks.{i}.upsamplers.0",
                        f"decoder.up_blocks.{i}.upsampler"):
            if f"{up_pref}.resample.1.weight" in sd:
                up = {"resample_conv": _cv2(sd, f"{up_pref}.resample.1",
                                            dtype)}
                if f"{up_pref}.time_conv.weight" in sd:
                    up["time_conv"] = _cv3(sd, f"{up_pref}.time_conv", dtype)
                blk["upsampler"] = up
                break
        dec["up_blocks"].append(blk)
    dec["norm_out"] = _gamma(sd, "decoder.norm_out", dtype)
    dec["conv_out"] = _cv3(sd, "decoder.conv_out", dtype)

    return {
        "encoder": enc,
        "decoder": dec,
        "quant_conv": _cv3(sd, "quant_conv", dtype),
        "post_quant_conv": _cv3(sd, "post_quant_conv", dtype),
    }
