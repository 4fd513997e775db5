"""Parity tests for the Wan 3D causal VAE vs a torch re-implementation.

diffusers is not installed in this environment, so the ground truth is a
compact torch mirror of the reference semantics
(/root/reference/python/sglang/multimodal_gen/runtime/models/vaes/wanvae.py
+ parallel/wan_common_utils.py): NCTHW causal convs with the per-conv
feature cache, chunked decode (1 latent frame at a time) and chunked encode
(first frame, then 4-frame chunks). Weights flow torch -> JAX through
convert_torch_state_dict, exactly the path a real diffusers checkpoint
takes.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as F  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from sglang_diffusion_tpu.diffusion.models import wan_vae as wv  # noqa: E402

CACHE_T = 2


# ---------------- torch mirror of the reference semantics ----------------


class TCausalConv3d(nn.Conv3d):
    def __init__(self, cin, cout, k, stride=1, padding=0):
        super().__init__(cin, cout, k, stride=stride, padding=padding)
        self._pad = (self.padding[2], self.padding[2], self.padding[1],
                     self.padding[1], 2 * self.padding[0], 0)
        self.padding = (0, 0, 0)

    def forward(self, x, cache=None):
        pad = list(self._pad)
        if cache is not None and self._pad[4] > 0:
            x = torch.cat([cache, x], dim=2)
            pad[4] -= cache.shape[2]
        x = F.pad(x, pad)
        return super().forward(x)


class TRms(nn.Module):
    def __init__(self, dim, images=False):
        super().__init__()
        self.gamma = nn.Parameter(torch.ones(
            (dim, 1, 1) if images else (dim, 1, 1, 1)))
        self.scale = dim ** 0.5

    def forward(self, x):
        return F.normalize(x, dim=1) * self.scale * self.gamma


class Ctx:
    """feature-cache walk (contextvars analog)."""

    def __init__(self):
        self.cache = None
        self.idx = 0
        self.first_chunk = False

    def step(self, conv, x):
        if self.cache is None:
            return conv(x)
        i = self.idx
        cx = x[:, :, -CACHE_T:].clone()
        if cx.shape[2] < 2 and self.cache[i] is not None and \
                not isinstance(self.cache[i], str):
            cx = torch.cat(
                [self.cache[i][:, :, -1:].clone(), cx], dim=2)
        y = conv(x, None if isinstance(self.cache[i], str) else self.cache[i])
        self.cache[i] = cx
        self.idx += 1
        return y


class TRes(nn.Module):
    def __init__(self, cin, cout):
        super().__init__()
        self.norm1 = TRms(cin)
        self.conv1 = TCausalConv3d(cin, cout, 3, padding=1)
        self.norm2 = TRms(cout)
        self.conv2 = TCausalConv3d(cout, cout, 3, padding=1)
        self.conv_shortcut = (TCausalConv3d(cin, cout, 1)
                              if cin != cout else nn.Identity())

    def forward(self, x, ctx):
        h = self.conv_shortcut(x)
        y = ctx.step(self.conv1, F.silu(self.norm1(x)))
        y = ctx.step(self.conv2, F.silu(self.norm2(y)))
        return y + h


class TAttn(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.norm = TRms(dim, images=True)
        self.to_qkv = nn.Conv2d(dim, dim * 3, 1)
        self.proj = nn.Conv2d(dim, dim, 1)

    def forward(self, x):
        idt = x
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.norm(x)
        qkv = self.to_qkv(x).reshape(b * t, 1, c * 3, h * w)
        qkv = qkv.permute(0, 1, 3, 2)
        q, k, v = qkv.chunk(3, dim=-1)
        x = F.scaled_dot_product_attention(q, k, v)
        x = x.squeeze(1).permute(0, 2, 1).reshape(b * t, c, h, w)
        x = self.proj(x)
        x = x.view(b, t, c, h, w).permute(0, 2, 1, 3, 4)
        return x + idt


class TMid(nn.Module):
    def __init__(self, dim):
        super().__init__()
        self.resnets = nn.ModuleList([TRes(dim, dim), TRes(dim, dim)])
        self.attentions = nn.ModuleList([TAttn(dim)])

    def forward(self, x, ctx):
        x = self.resnets[0](x, ctx)
        x = self.attentions[0](x)
        x = self.resnets[1](x, ctx)
        return x


class TUpsample(nn.Module):
    """WanResample upsample2d/3d (wan_common_utils.py:233-293)."""

    def __init__(self, dim, mode, out_dim=None):
        super().__init__()
        self.mode = mode
        out_dim = out_dim or dim // 2
        self.resample = nn.Sequential(
            nn.Upsample(scale_factor=(2.0, 2.0), mode="nearest-exact"),
            nn.Conv2d(dim, out_dim, 3, padding=1))
        if mode == "upsample3d":
            self.time_conv = TCausalConv3d(dim, dim * 2, (3, 1, 1),
                                           padding=(1, 0, 0))

    def forward(self, x, ctx):
        b, c, t, h, w = x.shape
        if self.mode == "upsample3d" and ctx.cache is not None:
            i = ctx.idx
            if ctx.cache[i] is None:
                ctx.cache[i] = "Rep"
                ctx.idx += 1
            else:
                cx = x[:, :, -CACHE_T:].clone()
                if cx.shape[2] < 2 and ctx.cache[i] != "Rep":
                    cx = torch.cat(
                        [ctx.cache[i][:, :, -1:].clone(), cx], dim=2)
                if cx.shape[2] < 2 and ctx.cache[i] == "Rep":
                    cx = torch.cat([torch.zeros_like(cx), cx], dim=2)
                if ctx.cache[i] == "Rep":
                    x = self.time_conv(x)
                else:
                    x = self.time_conv(x, ctx.cache[i])
                ctx.cache[i] = cx
                ctx.idx += 1
                x = x.reshape(b, 2, c, t, h, w)
                x = torch.stack((x[:, 0], x[:, 1]), 3)
                x = x.reshape(b, c, t * 2, h, w)
        t = x.shape[2]
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.resample(x)
        x = x.view(b, t, x.size(1), x.size(2), x.size(3)).permute(
            0, 2, 1, 3, 4)
        return x


class TDownsample(nn.Module):
    def __init__(self, dim, mode):
        super().__init__()
        self.mode = mode
        self.resample = nn.Sequential(
            nn.ZeroPad2d((0, 1, 0, 1)), nn.Conv2d(dim, dim, 3, stride=(2, 2)))
        if mode == "downsample3d":
            self.time_conv = TCausalConv3d(dim, dim, (3, 1, 1),
                                           stride=(2, 1, 1), padding=0)

    def forward(self, x, ctx):
        b, c, t, h, w = x.shape
        x = x.permute(0, 2, 1, 3, 4).reshape(b * t, c, h, w)
        x = self.resample(x)
        x = x.view(b, t, x.size(1), x.size(2), x.size(3)).permute(
            0, 2, 1, 3, 4)
        if self.mode == "downsample3d" and ctx.cache is not None:
            i = ctx.idx
            if ctx.cache[i] is None:
                ctx.cache[i] = x.clone()
                ctx.idx += 1
            else:
                cx = x[:, :, -1:].clone()
                x = self.time_conv(
                    torch.cat([ctx.cache[i][:, :, -1:], x], 2))
                ctx.cache[i] = cx
                ctx.idx += 1
        return x


def build_torch_vae(cfg: wv.WanVAEConfig, seed=0):
    """Non-residual (2.1-style) torch VAE with reference module names."""
    torch.manual_seed(seed)
    dims_e = [cfg.base_dim * u for u in [1] + list(cfg.dim_mult)]

    enc = nn.Module()
    enc.conv_in = TCausalConv3d(cfg.in_channels, dims_e[0], 3, padding=1)
    blocks = []
    for i, (ci, co) in enumerate(zip(dims_e[:-1], dims_e[1:])):
        cur = ci
        for _ in range(cfg.num_res_blocks):
            blocks.append(TRes(cur, co))
            cur = co
        if i != len(cfg.dim_mult) - 1:
            mode = ("downsample3d" if cfg.temperal_downsample[i]
                    else "downsample2d")
            blocks.append(TDownsample(co, mode))
    enc.down_blocks = nn.ModuleList(blocks)
    enc.mid_block = TMid(dims_e[-1])
    enc.norm_out = TRms(dims_e[-1])
    enc.conv_out = TCausalConv3d(dims_e[-1], 2 * cfg.z_dim, 3, padding=1)

    dims_d = [cfg.base_dim * u
              for u in [cfg.dim_mult[-1]] + list(cfg.dim_mult)[::-1]]
    t_up = list(cfg.temperal_downsample)[::-1]
    dec = nn.Module()
    dec.conv_in = TCausalConv3d(cfg.z_dim, dims_d[0], 3, padding=1)
    dec.mid_block = TMid(dims_d[0])
    ups = []
    for i, (ci, co) in enumerate(zip(dims_d[:-1], dims_d[1:])):
        if i > 0:
            ci = ci // 2
        blk = nn.Module()
        rs, cur = [], ci
        for _ in range(cfg.num_res_blocks + 1):
            rs.append(TRes(cur, co))
            cur = co
        blk.resnets = nn.ModuleList(rs)
        if i != len(cfg.dim_mult) - 1:
            mode = "upsample3d" if t_up[i] else "upsample2d"
            blk.upsamplers = nn.ModuleList([TUpsample(co, mode)])
        ups.append(blk)
    dec.up_blocks = nn.ModuleList(ups)
    dec.norm_out = TRms(dims_d[-1])
    dec.conv_out = TCausalConv3d(dims_d[-1], cfg.out_channels, 3, padding=1)

    vae = nn.Module()
    vae.encoder = enc
    vae.decoder = dec
    vae.quant_conv = TCausalConv3d(2 * cfg.z_dim, 2 * cfg.z_dim, 1)
    vae.post_quant_conv = TCausalConv3d(cfg.z_dim, cfg.z_dim, 1)
    return vae


def torch_decode(vae, cfg, z):
    """wanvae.py:944 decode with feature cache: 1 latent frame per chunk."""
    ctx = Ctx()
    x = vae.post_quant_conv(z)
    n_convs = sum(1 for m in vae.decoder.modules()
                  if isinstance(m, (TCausalConv3d,)))
    outs = []
    ctx.cache = [None] * (n_convs + 8)
    for i in range(z.shape[2]):
        ctx.idx = 0
        outs.append(_torch_dec_chunk(vae.decoder, x[:, :, i:i + 1], ctx))
    out = torch.cat(outs, dim=2)
    return torch.clamp(out, -1, 1)


def _torch_dec_chunk(dec, x, ctx):
    x = ctx.step(dec.conv_in, x)
    x = dec.mid_block(x, ctx)
    for blk in dec.up_blocks:
        for r in blk.resnets:
            x = r(x, ctx)
        if hasattr(blk, "upsamplers"):
            x = blk.upsamplers[0](x, ctx)
    x = F.silu(dec.norm_out(x))
    x = ctx.step(dec.conv_out, x)
    return x


def torch_encode(vae, cfg, x):
    """wanvae.py:886 encode with feature cache: frame 0 then 4-frame
    chunks."""
    ctx = Ctx()
    n_convs = sum(1 for m in vae.encoder.modules()
                  if isinstance(m, (TCausalConv3d,)))
    ctx.cache = [None] * (n_convs + 8)
    t = x.shape[2]
    outs = []
    for i in range(1 + (t - 1) // 4):
        ctx.idx = 0
        xi = x[:, :, :1] if i == 0 else x[:, :, 1 + 4 * (i - 1): 1 + 4 * i]
        outs.append(_torch_enc_chunk(vae.encoder, xi, ctx))
    out = torch.cat(outs, dim=2)
    return vae.quant_conv(out)


def _torch_enc_chunk(enc, x, ctx):
    x = ctx.step(enc.conv_in, x)
    for blk in enc.down_blocks:
        if isinstance(blk, TRes):
            x = blk(x, ctx)
        else:
            x = blk(x, ctx)
    x = enc.mid_block(x, ctx)
    x = F.silu(enc.norm_out(x))
    x = ctx.step(enc.conv_out, x)
    return x


TINY = wv.WanVAEConfig(
    base_dim=8, z_dim=4, dim_mult=(1, 2, 2, 2), num_res_blocks=1,
    temperal_downsample=(False, True, True),
    latents_mean=(0.0,) * 4, latents_std=(1.0,) * 4,
)


def _params_from_torch(vae, cfg):
    sd = {k: v.detach().numpy() for k, v in vae.state_dict().items()}
    return wv.convert_torch_state_dict(sd, cfg)


def test_decode_parity():
    cfg = TINY
    vae = build_torch_vae(cfg)
    params = _params_from_torch(vae, cfg)
    rng = np.random.default_rng(0)
    z = rng.standard_normal((1, cfg.z_dim, 3, 4, 4)).astype(np.float32) * 0.4
    with torch.no_grad():
        ref = torch_decode(vae, cfg, torch.from_numpy(z)).numpy()
    # JAX is channels-last [B, T, H, W, C]
    out = wv.decode(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 4, 1)))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    assert ref.shape == out.shape, (ref.shape, out.shape)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)


def test_encode_parity():
    cfg = TINY
    vae = build_torch_vae(cfg)
    params = _params_from_torch(vae, cfg)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 3, 9, 16, 16)).astype(np.float32) * 0.3
    with torch.no_grad():
        ref = torch_encode(vae, cfg, torch.from_numpy(x)).numpy()
    enc = wv.encode(params, cfg, jnp.asarray(x.transpose(0, 2, 3, 4, 1)))
    enc = np.asarray(enc).transpose(0, 4, 1, 2, 3)
    assert ref.shape == enc.shape, (ref.shape, enc.shape)
    np.testing.assert_allclose(enc, ref, rtol=2e-4, atol=2e-4)


def test_decode_single_frame_image():
    cfg = TINY
    vae = build_torch_vae(cfg, seed=3)
    params = _params_from_torch(vae, cfg)
    rng = np.random.default_rng(2)
    z = rng.standard_normal((1, cfg.z_dim, 1, 4, 4)).astype(np.float32) * 0.4
    with torch.no_grad():
        ref = torch_decode(vae, cfg, torch.from_numpy(z)).numpy()
    out = wv.decode(params, cfg, jnp.asarray(z.transpose(0, 2, 3, 4, 1)))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
