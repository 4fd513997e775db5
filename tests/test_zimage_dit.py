"""Z-Image DiT parity vs a torch mirror of the reference semantics
(multimodal_gen/runtime/models/dits/zimage.py:478; diffusers is not
installed, so the ground truth is a compact torch re-implementation).
Weights flow torch -> JAX through convert_checkpoint_weights (the same
path a real Z-Image checkpoint takes)."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.zimage import (
    ZImageConfig,
    ZImageDiT,
)

CFG = ZImageConfig(
    dim=48, num_layers=2, n_refiner_layers=1, num_attention_heads=4,
    n_kv_heads=2, cap_feat_dim=24, axes_dims=(4, 4, 4),
    axes_lens=(64, 32, 32), in_channels=4, out_channels=4, patch_size=2,
    adaln_dim=256, t_mid=32, seq_multiple=8,
)


class TRms(nn.Module):
    def __init__(self, d, eps):
        super().__init__()
        self.weight = nn.Parameter(torch.ones(d))
        self.eps = eps

    def forward(self, x):
        xf = x.float()
        var = xf.pow(2).mean(-1, keepdim=True)
        return (xf * torch.rsqrt(var + self.eps) * self.weight).type_as(x)


class TAttn(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        E, D = cfg.dim, cfg.head_dim
        self.hq, self.hkv, self.d = cfg.num_attention_heads, cfg.n_kv_heads, D
        self.to_q = nn.Linear(E, self.hq * D, bias=False)
        self.to_k = nn.Linear(E, self.hkv * D, bias=False)
        self.to_v = nn.Linear(E, self.hkv * D, bias=False)
        self.norm_q = TRms(D, 1e-5)
        self.norm_k = TRms(D, 1e-5)
        self.to_out = nn.ModuleList([nn.Linear(E, E, bias=False)])

    def forward(self, x, cos, sin):
        b, t, _ = x.shape
        q = self.to_q(x).view(b, t, self.hq, self.d)
        k = self.to_k(x).view(b, t, self.hkv, self.d)
        v = self.to_v(x).view(b, t, self.hkv, self.d)
        q = self.norm_q(q)
        k = self.norm_k(k)

        def rope(x):
            x0, x1 = x[..., 0::2].float(), x[..., 1::2].float()
            c = cos[None, :, None, :]
            s = sin[None, :, None, :]
            o = torch.stack([x0 * c - x1 * s, x1 * c + x0 * s], dim=-1)
            return o.reshape(x.shape).type_as(x)

        q, k = rope(q), rope(k)
        rep = self.hq // self.hkv
        k = k.repeat_interleave(rep, dim=2)
        v = v.repeat_interleave(rep, dim=2)
        s = torch.einsum("bqhd,bkhd->bhqk", q.float(), k.float()) / \
            math.sqrt(self.d)
        p = s.softmax(-1)
        o = torch.einsum("bhqk,bkhd->bqhd", p, v.float())
        return self.to_out[0](o.reshape(b, t, -1).type_as(x))


class TBlock(nn.Module):
    def __init__(self, cfg, modulated):
        super().__init__()
        E = cfg.dim
        self.modulated = modulated
        self.attention = TAttn(cfg)
        self.attention_norm1 = TRms(E, cfg.norm_eps)
        self.attention_norm2 = TRms(E, cfg.norm_eps)
        self.ffn_norm1 = TRms(E, cfg.norm_eps)
        self.ffn_norm2 = TRms(E, cfg.norm_eps)
        H = cfg.ffn_hidden
        self.feed_forward = nn.Module()
        self.feed_forward.w1 = nn.Linear(E, H, bias=False)
        self.feed_forward.w3 = nn.Linear(E, H, bias=False)
        self.feed_forward.w2 = nn.Linear(H, E, bias=False)
        if modulated:
            self.adaLN_modulation = nn.Sequential(
                nn.Linear(cfg.adaln, 4 * E, bias=True))

    def _ffn(self, x):
        return self.feed_forward.w2(
            F.silu(self.feed_forward.w1(x)) * self.feed_forward.w3(x))

    def forward(self, x, cos, sin, adaln=None):
        if self.modulated:
            mod = self.adaLN_modulation(adaln).unsqueeze(1)
            s_msa, g_msa, s_mlp, g_mlp = mod.chunk(4, dim=2)
            g_msa, g_mlp = g_msa.tanh(), g_mlp.tanh()
            a = self.attention(self.attention_norm1(x) * (1 + s_msa),
                               cos, sin)
            x = x + g_msa * self.attention_norm2(a)
            f = self._ffn(self.ffn_norm1(x) * (1 + s_mlp))
            x = x + g_mlp * self.ffn_norm2(f)
        else:
            a = self.attention(self.attention_norm1(x), cos, sin)
            x = x + self.attention_norm2(a)
            f = self._ffn(self.ffn_norm1(x))
            x = x + self.ffn_norm2(f)
        return x


class TZImage(nn.Module):
    def __init__(self, cfg):
        super().__init__()
        E = cfg.dim
        self.cfg = cfg
        ps = cfg.patch_size
        key = f"{ps}-1"
        self.all_x_embedder = nn.ModuleDict({
            key: nn.Linear(ps * ps * cfg.in_channels, E, bias=True)})
        fl = nn.Module()
        fl.linear = nn.Linear(E, ps * ps * cfg.out_channels, bias=True)
        fl.adaLN_modulation = nn.Sequential(
            nn.SiLU(), nn.Linear(cfg.adaln, E, bias=True))
        self.all_final_layer = nn.ModuleDict({key: fl})
        self.t_embedder = nn.Module()
        self.t_embedder.mlp = nn.ModuleList([
            nn.Linear(256, cfg.t_mid, bias=True), nn.SiLU(),
            nn.Linear(cfg.t_mid, cfg.adaln, bias=True)])
        self.cap_embedder = nn.Sequential(
            TRms(cfg.cap_feat_dim, cfg.norm_eps),
            nn.Linear(cfg.cap_feat_dim, E, bias=True))
        self.noise_refiner = nn.ModuleList(
            [TBlock(cfg, True) for _ in range(cfg.n_refiner_layers)])
        self.context_refiner = nn.ModuleList(
            [TBlock(cfg, False) for _ in range(cfg.n_refiner_layers)])
        self.layers = nn.ModuleList(
            [TBlock(cfg, True) for _ in range(cfg.num_layers)])

    def t_embed(self, t):
        half = 128
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half).float() / half)
        ang = t.float()[:, None] * freqs[None]
        emb = torch.cat([ang.cos(), ang.sin()], dim=-1)
        return self.t_embedder.mlp[2](
            self.t_embedder.mlp[1](self.t_embedder.mlp[0](emb)))

    def forward(self, latent, cap, t, cos_img, sin_img, cos_cap, sin_cap):
        cfg = self.cfg
        ps = cfg.patch_size
        b, c, h, w = latent.shape
        ht, wt = h // ps, w // ps
        adaln = self.t_embed(1000.0 - t)
        x = latent.view(b, c, ht, ps, wt, ps)
        x = x.permute(0, 2, 4, 3, 5, 1).reshape(b, ht * wt, ps * ps * c)
        n_img = x.shape[1]
        img_pad = (-n_img) % cfg.seq_multiple
        if img_pad:
            x = torch.cat([x, x[:, -1:].repeat(1, img_pad, 1)], dim=1)
        x = self.all_x_embedder[f"{ps}-1"](x)
        for blk in self.noise_refiner:
            x = blk(x, cos_img, sin_img, adaln)
        capf = self.cap_embedder(cap)
        tc = capf.shape[1]
        cap_pad = (-tc) % cfg.seq_multiple
        if cap_pad:
            capf = torch.cat([capf, capf[:, -1:].repeat(1, cap_pad, 1)],
                             dim=1)
        for blk in self.context_refiner:
            capf = blk(capf, cos_cap, sin_cap)
        uni = torch.cat([x, capf], dim=1)
        cos_u = torch.cat([cos_img, cos_cap], dim=0)
        sin_u = torch.cat([sin_img, sin_cap], dim=0)
        for blk in self.layers:
            uni = blk(uni, cos_u, sin_u, adaln)
        fl = self.all_final_layer[f"{ps}-1"]
        scale = 1.0 + fl.adaLN_modulation(adaln)
        xo = uni[:, :n_img]
        xo = F.layer_norm(xo, (cfg.dim,), eps=1e-6) * scale.unsqueeze(1)
        xo = fl.linear(xo)
        out = xo.view(b, ht, wt, ps, ps, cfg.out_channels)
        out = out.permute(0, 5, 1, 3, 2, 4).reshape(b, cfg.out_channels,
                                                    h, w)
        return -out


def test_zimage_parity():
    from sglang_diffusion_tpu.diffusion.models.zimage import rope_cos_sin

    torch.manual_seed(2)
    m = TZImage(CFG).eval()
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    # rms norms in the mirror are named ".weight" under attention.norm_q
    # etc — already matching the converter's expectations
    def get(name):
        return sd[name]

    get.names = list(sd)
    params = ZImageDiT.convert_checkpoint_weights(CFG, get)

    rng = np.random.default_rng(0)
    h = w = 8  # latent pixels -> 4x4=16 tokens, pad to 16 (mult 8)
    lat = rng.standard_normal((1, CFG.in_channels, h, w)).astype(
        np.float32) * 0.5
    cap = rng.standard_normal((1, 5, CFG.cap_feat_dim)).astype(
        np.float32) * 0.5
    t = np.array([437.0], np.float32)

    # rope tables shared verbatim between mirror and JAX
    ht = wt = h // CFG.patch_size
    n_img = ht * wt
    img_pad = (-n_img) % CFG.seq_multiple
    cap_pad = (-5) % CFG.seq_multiple
    cap_total = 5 + cap_pad
    cap_ids = np.zeros((cap_total, 3), np.int64)
    cap_ids[:, 0] = np.arange(1, cap_total + 1)
    grid = np.stack(np.meshgrid(np.arange(ht), np.arange(wt),
                                indexing="ij"), -1)
    img_ids = np.zeros((n_img + img_pad, 3), np.int64)
    img_ids[:n_img, 0] = cap_total + 1
    img_ids[:n_img, 1] = grid[..., 0].reshape(-1)
    img_ids[:n_img, 2] = grid[..., 1].reshape(-1)
    cc, cs = rope_cos_sin(cap_ids, CFG)
    ic, isn = rope_cos_sin(img_ids, CFG)

    with torch.no_grad():
        ref = m(torch.from_numpy(lat), torch.from_numpy(cap),
                torch.from_numpy(t),
                torch.from_numpy(ic), torch.from_numpy(isn),
                torch.from_numpy(cc), torch.from_numpy(cs)).numpy()

    fwd = ZImageDiT.make_forward(CFG)
    out = fwd(params, jnp.asarray(lat.transpose(0, 2, 3, 1)),
              jnp.asarray(cap), jnp.asarray(t))
    out = np.asarray(out).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(out, ref, atol=3e-4, rtol=2e-3)
