"""Qwen-Image DiT parity vs an independent torch implementation of the
diffusers QwenImageTransformer2DModel math (reference analog:
multimodal_gen/runtime/models/dits/qwen_image.py:987). diffusers is not
installed; the ground truth is a torch eager re-implementation with
diffusers state-dict names (same approach as tests/test_flux_dit.py)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.qwen_image import (
    QwenImageConfig,
    QwenImageDiT,
    qwen_rope,
)

CFG = QwenImageConfig(
    in_channels=16, out_channels=4, num_layers=2, attention_head_dim=16,
    num_attention_heads=4, joint_attention_dim=48, axes_dims_rope=(4, 6, 6),
)


def sinusoid(t, dim=256):
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half)
    args = t.double()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1).float()


def rope_tables(grid, t_txt, cfg):
    """QwenEmbedRope(scale_rope=True): frame 0, centered h/w for the
    image; text at 1D offset max(h//2, w//2)."""
    gh, gw = grid

    def axis(positions, dim_ax):
        k = dim_ax // 2
        freqs = 1.0 / (cfg.rope_theta ** (
            torch.arange(k, dtype=torch.float64) * 2 / dim_ax))
        return positions.double()[:, None] * freqs[None]

    hs = torch.arange(gh) - (gh - gh // 2)
    ws = torch.arange(gw) - (gw - gw // 2)
    hh, wwg = torch.meshgrid(hs, ws, indexing="ij")
    n = gh * gw
    img = torch.cat([
        axis(torch.zeros(n), cfg.axes_dims_rope[0]),
        axis(hh.reshape(-1), cfg.axes_dims_rope[1]),
        axis(wwg.reshape(-1), cfg.axes_dims_rope[2]),
    ], dim=-1)
    base = max(gh // 2, gw // 2)
    tpos = base + torch.arange(t_txt)
    txt = torch.cat([axis(tpos, d) for d in cfg.axes_dims_rope], dim=-1)
    ang = torch.cat([txt, img], dim=0)
    return torch.cos(ang).float(), torch.sin(ang).float()


def apply_rope_t(x, cos, sin):
    b, t, h, d = x.shape
    xf = x.reshape(b, t, h, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return torch.stack([x0 * c - x1 * s, x0 * s + x1 * c],
                       dim=-1).reshape(b, t, h, d)


def rmsn(x, w, eps=1e-6):
    v = x.float()
    return v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps) * w.float()


class TBlock(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        E = cfg.num_attention_heads * cfg.attention_head_dim
        F_ = int(E * cfg.mlp_ratio)
        D = cfg.attention_head_dim
        self.img_mod = nn.Sequential(nn.SiLU(), nn.Linear(E, 6 * E))
        self.txt_mod = nn.Sequential(nn.SiLU(), nn.Linear(E, 6 * E))

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                for n_ in ("to_q", "to_k", "to_v", "add_q_proj",
                           "add_k_proj", "add_v_proj", "to_add_out"):
                    setattr(self, n_, nn.Linear(E, E))
                self.to_out = nn.ModuleList([nn.Linear(E, E)])
                self.norm_q = nn.Parameter(torch.randn(D).abs() + 0.5)
                self.norm_k = nn.Parameter(torch.randn(D).abs() + 0.5)
                self.norm_added_q = nn.Parameter(torch.randn(D).abs() + 0.5)
                self.norm_added_k = nn.Parameter(torch.randn(D).abs() + 0.5)

        self.attn = Attn()

        class FF(nn.Module):
            def __init__(self):
                super().__init__()
                self.net = nn.ModuleList(
                    [nn.Module(), nn.Identity(), nn.Linear(F_, E)])
                self.net[0].proj = nn.Linear(E, F_)

        self.img_mlp, self.txt_mlp = FF(), FF()
        self.H, self.D, self.E = cfg.num_attention_heads, D, E

    def forward(self, x, ctx, temb_silu, cos, sin):
        b, t, _ = x.shape
        tc = ctx.shape[1]
        im = self.img_mod[1](temb_silu)
        tm = self.txt_mod[1](temb_silu)
        im1, im2 = im.chunk(2, -1)
        tm1, tm2 = tm.chunk(2, -1)
        ish1, isc1, ig1 = im1.chunk(3, -1)
        ish2, isc2, ig2 = im2.chunk(3, -1)
        tsh1, tsc1, tg1 = tm1.chunk(3, -1)
        tsh2, tsc2, tg2 = tm2.chunk(3, -1)
        nx = F.layer_norm(x, (self.E,), eps=1e-6) * (
            1 + isc1[:, None]) + ish1[:, None]
        nc = F.layer_norm(ctx, (self.E,), eps=1e-6) * (
            1 + tsc1[:, None]) + tsh1[:, None]

        def heads(z):
            return z.unflatten(-1, (self.H, self.D))

        q = rmsn(heads(self.attn.to_q(nx)), self.attn.norm_q)
        k = rmsn(heads(self.attn.to_k(nx)), self.attn.norm_k)
        v = heads(self.attn.to_v(nx))
        cq = rmsn(heads(self.attn.add_q_proj(nc)), self.attn.norm_added_q)
        ck = rmsn(heads(self.attn.add_k_proj(nc)), self.attn.norm_added_k)
        cv = heads(self.attn.add_v_proj(nc))
        qj = apply_rope_t(torch.cat([cq, q], 1), cos, sin)
        kj = apply_rope_t(torch.cat([ck, k], 1), cos, sin)
        vj = torch.cat([cv, v], 1)
        o = F.scaled_dot_product_attention(
            qj.transpose(1, 2), kj.transpose(1, 2), vj.transpose(1, 2)
        ).transpose(1, 2).flatten(2)
        co, io = o[:, :tc], o[:, tc:]
        x = x + ig1[:, None] * self.attn.to_out[0](io)
        h = F.layer_norm(x, (self.E,), eps=1e-6) * (
            1 + isc2[:, None]) + ish2[:, None]
        x = x + ig2[:, None] * self.img_mlp.net[2](
            F.gelu(self.img_mlp.net[0].proj(h), approximate="tanh"))
        ctx = ctx + tg1[:, None] * self.attn.to_add_out(co)
        ch = F.layer_norm(ctx, (self.E,), eps=1e-6) * (
            1 + tsc2[:, None]) + tsh2[:, None]
        ctx = ctx + tg2[:, None] * self.txt_mlp.net[2](
            F.gelu(self.txt_mlp.net[0].proj(ch), approximate="tanh"))
        return x, ctx


class TQwenImage(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        E = cfg.num_attention_heads * cfg.attention_head_dim
        self.cfg = cfg
        self.img_in = nn.Linear(cfg.in_channels, E)
        self.txt_in = nn.Linear(cfg.joint_attention_dim, E)
        self.txt_norm = nn.Parameter(
            torch.randn(cfg.joint_attention_dim).abs() + 0.5)

        class MLP(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear_1 = nn.Linear(256, E)
                self.linear_2 = nn.Linear(E, E)

            def forward(self, x):
                return self.linear_2(F.silu(self.linear_1(x)))

        class TTE(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = MLP()

        self.time_text_embed = TTE()
        self.transformer_blocks = nn.ModuleList(
            [TBlock(cfg) for _ in range(cfg.num_layers)])

        class NOut(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(E, 2 * E)

        self.norm_out = NOut()
        self.proj_out = nn.Linear(E, cfg.out_patch_dim)
        self.E = E

    def forward(self, tokens, ctx_in, t, grid):
        temb = self.time_text_embed.timestep_embedder(sinusoid(t))
        ts = F.silu(temb)
        x = self.img_in(tokens)
        ctx = self.txt_in(rmsn(ctx_in, self.txt_norm))
        cos, sin = rope_tables(grid, ctx.shape[1], self.cfg)
        for blk in self.transformer_blocks:
            x, ctx = blk(x, ctx, ts, cos, sin)
        e = self.norm_out.linear(ts)
        scale, shift = e.chunk(2, -1)
        x = F.layer_norm(x, (self.E,), eps=1e-6) * (
            1 + scale[:, None]) + shift[:, None]
        return self.proj_out(x)


def _convert(model):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    def get(name):
        if name in sd:
            return sd[name]
        return sd[name.replace(".weight", "")]  # bare-Parameter norms

    return QwenImageDiT.convert_diffusers_weights(CFG, get,
                                                  dtype=jnp.float32)


def test_qwen_image_parity():
    torch.manual_seed(11)
    model = TQwenImage(CFG).eval()
    params = _convert(model)
    rng = np.random.default_rng(0)
    b, gh, gw, tc = 2, 4, 6, 5
    tokens = rng.standard_normal((b, gh * gw, CFG.in_channels)).astype(
        np.float32)
    ctx = rng.standard_normal((b, tc, CFG.joint_attention_dim)).astype(
        np.float32)
    t = np.array([611.0, 47.0], np.float32)
    with torch.no_grad():
        ref = model(torch.tensor(tokens), torch.tensor(ctx),
                    torch.tensor(t), (gh, gw)).numpy()
    fwd = QwenImageDiT.make_forward(CFG)
    got = np.asarray(fwd(params, jnp.asarray(tokens), jnp.asarray(ctx),
                         jnp.asarray(t), (gh, gw)))
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_qwen_rope_centered():
    """scale_rope: image h/w indices are centered around zero and text
    positions start past max(h//2, w//2)."""
    cos, sin = qwen_rope((4, 4), 3, CFG)
    # text token 0 sits at position 2 on every axis: angle of axis-0
    # column 0 equals 2 * theta^0 = 2
    np.testing.assert_allclose(float(cos[0, 0]), np.cos(2.0), rtol=1e-6)
    # the image token at the grid center row/col (index (2,2)) has h=w=0:
    # pure frame-0 rotation = identity
    img0 = 3 + 2 * 4 + 2  # txt_len + row 2 * gw + col 2
    np.testing.assert_allclose(np.asarray(cos[img0]), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(sin[img0]), 0.0, atol=1e-9)


def test_qwen_image_pipeline_smoke():
    from sglang_diffusion_tpu.diffusion.pipeline import GenerationParams
    from sglang_diffusion_tpu.diffusion.qwen_image_pipeline import (
        QwenImagePipeline,
        tiny_qwen_image_config,
    )

    pipe = QwenImagePipeline(qwen_cfg=tiny_qwen_image_config(),
                             dtype=jnp.float32)
    gp = GenerationParams(
        prompt="a tiny qwen image", height=64, width=64,
        num_inference_steps=2, guidance_scale=2.0,
        negative_prompt="blurry", seed=4,
    )
    out = pipe.forward(gp)
    assert out.images.shape == (1, 64, 64, 3)
    out2 = pipe.forward(gp)
    np.testing.assert_array_equal(out.images, out2.images)
