"""Wan video DiT parity vs an independent torch implementation of the
diffusers WanTransformer3DModel math (reference analog:
multimodal_gen/runtime/models/dits/wanvideo.py). diffusers is not
installed in this environment, so the ground truth is a torch eager
transcription of its published op order: FP32LayerNorm modulation,
rms_norm_across_heads qk-norm, 3D complex rope, gelu-tanh FFN,
scale_shift_table adaLN."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as torchF

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.dit import patchify_video
from sglang_diffusion_tpu.diffusion.models.wan import (
    WanConfig,
    WanDiT,
    wan_rope_3d,
)

TINY = WanConfig(
    dim=48, ffn_dim=96, num_heads=4, num_layers=2, in_channels=4,
    out_channels=4, text_dim=32, freq_dim=32,
)


# ---------------- torch reference (diffusers semantics) ----------------


def t_rope_3d(grid, head_dim, theta=10000.0):
    """diffusers WanRotaryPosEmbed: per-axis complex freqs, dims split
    [d-4(d//6), 2(d//6), 2(d//6)]."""
    d = head_dim
    h_dim = w_dim = 2 * (d // 6)
    t_dim = d - h_dim - w_dim
    f, gh, gw = grid
    out = []
    for n, dim_ax in zip(grid, (t_dim, h_dim, w_dim)):
        freqs = 1.0 / theta ** (
            torch.arange(0, dim_ax, 2)[: dim_ax // 2].double() / dim_ax
        )
        ang = torch.outer(torch.arange(n).double(), freqs)
        out.append(torch.polar(torch.ones_like(ang), ang))  # [n, dim_ax/2]
    ff = out[0][:, None, None].expand(f, gh, gw, -1)
    fh = out[1][None, :, None].expand(f, gh, gw, -1)
    fw = out[2][None, None, :].expand(f, gh, gw, -1)
    return torch.cat([ff, fh, fw], dim=-1).reshape(f * gh * gw, -1)


def t_apply_rope(x, freqs):
    # x [B, T, H, D] -> complex pairs rotated
    xc = torch.view_as_complex(x.double().unflatten(-1, (-1, 2)))
    out = torch.view_as_real(xc * freqs[None, :, None, :]).flatten(-2)
    return out.to(x.dtype)


class TorchWanBlock(nn.Module):
    def __init__(self, cfg: WanConfig, i2v: bool = False):
        super().__init__()
        E = cfg.dim
        self.h, self.d = cfg.num_heads, cfg.head_dim
        self.norm1 = nn.LayerNorm(E, cfg.eps, elementwise_affine=False)
        self.to_q = nn.Linear(E, E)
        self.to_k = nn.Linear(E, E)
        self.to_v = nn.Linear(E, E)
        self.to_o = nn.Linear(E, E)
        self.norm_q = nn.RMSNorm(E, cfg.eps)
        self.norm_k = nn.RMSNorm(E, cfg.eps)
        self.norm2 = nn.LayerNorm(E, cfg.eps, elementwise_affine=True)
        self.xq = nn.Linear(E, E)
        self.xk = nn.Linear(E, E)
        self.xv = nn.Linear(E, E)
        self.xo = nn.Linear(E, E)
        self.xnorm_q = nn.RMSNorm(E, cfg.eps)
        self.xnorm_k = nn.RMSNorm(E, cfg.eps)
        self.ff1 = nn.Linear(E, cfg.ffn_dim)
        self.ff2 = nn.Linear(cfg.ffn_dim, E)
        self.norm3 = nn.LayerNorm(E, cfg.eps, elementwise_affine=False)
        self.table = nn.Parameter(torch.randn(1, 6, E) / E ** 0.5)
        self.i2v = i2v
        if i2v:
            self.add_k = nn.Linear(E, E)
            self.add_v = nn.Linear(E, E)
            self.add_norm_k = nn.RMSNorm(E, cfg.eps)

    def heads(self, x):
        b, t, _ = x.shape
        return x.view(b, t, self.h, self.d).transpose(1, 2)

    def attn(self, q, k, v):
        o = torchF.scaled_dot_product_attention(
            self.heads(q.float()), self.heads(k.float()),
            self.heads(v.float()))
        return o.transpose(1, 2).flatten(2)

    def forward(self, x, ctx, temb6, freqs, n_img_ctx=0):
        e = (self.table + temb6.float()).chunk(6, dim=1)
        sh1, sc1, g1, sh2, sc2, g2 = e
        h = (self.norm1(x.float()) * (1 + sc1) + sh1).to(x.dtype)
        q = self.norm_q(self.to_q(h))
        k = self.norm_k(self.to_k(h))
        v = self.to_v(h)
        b, t, _ = q.shape
        q = t_apply_rope(q.view(b, t, self.h, self.d), freqs)
        k = t_apply_rope(k.view(b, t, self.h, self.d), freqs)
        o = torchF.scaled_dot_product_attention(
            q.transpose(1, 2).float(), k.transpose(1, 2).float(),
            self.heads(v.float()))
        o = self.to_o(o.transpose(1, 2).flatten(2).to(x.dtype))
        x = (x.float() + o.float() * g1).to(x.dtype)

        h = self.norm2(x.float()).to(x.dtype)
        xq = self.xnorm_q(self.xq(h))
        if self.i2v:
            ctx_img, ctx_txt = ctx[:, :n_img_ctx], ctx[:, n_img_ctx:]
        else:
            ctx_txt = ctx
        xk = self.xnorm_k(self.xk(ctx_txt))
        xv = self.xv(ctx_txt)
        o = self.attn(xq, xk, xv)
        if self.i2v:
            ik = self.add_norm_k(self.add_k(ctx_img))
            iv = self.add_v(ctx_img)
            o = o + self.attn(xq, ik, iv)
        x = (x.float() + self.xo(o.to(x.dtype)).float()).to(x.dtype)

        h = (self.norm3(x.float()) * (1 + sc2) + sh2).to(x.dtype)
        h = self.ff2(torchF.gelu(self.ff1(h), approximate="tanh"))
        x = (x.float() + h.float() * g2).to(x.dtype)
        return x


class TorchWan(nn.Module):
    def __init__(self, cfg: WanConfig, i2v: bool = False):
        super().__init__()
        E = cfg.dim
        self.cfg = cfg
        self.patch = nn.Conv3d(cfg.in_channels, E, cfg.patch_size,
                               stride=cfg.patch_size)
        self.t1 = nn.Linear(cfg.freq_dim, E)
        self.t2 = nn.Linear(E, E)
        self.tproj = nn.Linear(E, 6 * E)
        self.tx1 = nn.Linear(cfg.text_dim, E)
        self.tx2 = nn.Linear(E, E)
        self.blocks = nn.ModuleList(
            [TorchWanBlock(cfg, i2v) for _ in range(cfg.num_layers)]
        )
        self.head_table = nn.Parameter(torch.randn(1, 2, E) / E ** 0.5)
        self.norm_out = nn.LayerNorm(E, cfg.eps, elementwise_affine=False)
        self.proj_out = nn.Linear(E, cfg.out_patch_dim)
        self.i2v = i2v
        if i2v:
            I = cfg.image_embed_dim
            self.img_norm1 = nn.LayerNorm(I, cfg.eps)
            self.img_ff1 = nn.Linear(I, I)
            self.img_ff2 = nn.Linear(I, E)
            self.img_norm2 = nn.LayerNorm(E, cfg.eps)

    def time_emb(self, t):
        half = self.cfg.freq_dim // 2
        freqs = torch.exp(
            -math.log(10000.0) * torch.arange(half).float() / half
        )
        args = t.float()[:, None] * freqs[None]
        return torch.cat([torch.cos(args), torch.sin(args)], dim=-1)

    def forward(self, lat, ctx_txt, t, img_emb=None):
        # lat [B, C, F, H, W] (torch layout)
        x = self.patch(lat).flatten(2).transpose(1, 2)
        temb = self.t2(torchF.silu(self.t1(self.time_emb(t))))
        temb6 = self.tproj(torchF.silu(temb)).unflatten(1, (6, -1))
        ctx = self.tx2(torchF.gelu(self.tx1(ctx_txt), approximate="tanh"))
        n_img = 0
        if self.i2v and img_emb is not None:
            ih = self.img_ff2(torchF.gelu(
                self.img_ff1(self.img_norm1(img_emb.float()))))
            ih = self.img_norm2(ih).to(ctx.dtype)
            ctx = torch.cat([ih, ctx], dim=1)
            n_img = img_emb.shape[1]
        f = lat.shape[2] // self.cfg.patch_size[0]
        gh = lat.shape[3] // self.cfg.patch_size[1]
        gw = lat.shape[4] // self.cfg.patch_size[2]
        freqs = t_rope_3d((f, gh, gw), self.cfg.head_dim)
        for blk in self.blocks:
            x = blk(x, ctx, temb6, freqs, n_img_ctx=n_img)
        e = (self.head_table + temb.unsqueeze(1).float()).chunk(2, dim=1)
        x = (self.norm_out(x.float()) * (1 + e[1]) + e[0]).to(x.dtype)
        return self.proj_out(x)


RENAME = {
        "patch_embedding.weight": "patch.weight",
        "patch_embedding.bias": "patch.bias",
        "condition_embedder.time_embedder.linear_1.weight": "t1.weight",
        "condition_embedder.time_embedder.linear_1.bias": "t1.bias",
        "condition_embedder.time_embedder.linear_2.weight": "t2.weight",
        "condition_embedder.time_embedder.linear_2.bias": "t2.bias",
        "condition_embedder.time_proj.weight": "tproj.weight",
        "condition_embedder.time_proj.bias": "tproj.bias",
        "condition_embedder.text_embedder.linear_1.weight": "tx1.weight",
        "condition_embedder.text_embedder.linear_1.bias": "tx1.bias",
        "condition_embedder.text_embedder.linear_2.weight": "tx2.weight",
        "condition_embedder.text_embedder.linear_2.bias": "tx2.bias",
        "scale_shift_table": "head_table",
        "proj_out.weight": "proj_out.weight",
        "proj_out.bias": "proj_out.bias",
}
RENAME_I2V = {
            "condition_embedder.image_embedder.norm1.weight": "img_norm1.weight",
            "condition_embedder.image_embedder.norm1.bias": "img_norm1.bias",
            "condition_embedder.image_embedder.ff.net.0.proj.weight": "img_ff1.weight",
            "condition_embedder.image_embedder.ff.net.0.proj.bias": "img_ff1.bias",
            "condition_embedder.image_embedder.ff.net.2.weight": "img_ff2.weight",
            "condition_embedder.image_embedder.ff.net.2.bias": "img_ff2.bias",
            "condition_embedder.image_embedder.norm2.weight": "img_norm2.weight",
            "condition_embedder.image_embedder.norm2.bias": "img_norm2.bias",
}
PER_BLOCK = {
        "attn1.to_q": "to_q", "attn1.to_k": "to_k", "attn1.to_v": "to_v",
        "attn1.to_out.0": "to_o", "attn1.norm_q": "norm_q",
        "attn1.norm_k": "norm_k", "norm2": "norm2",
        "attn2.to_q": "xq", "attn2.to_k": "xk", "attn2.to_v": "xv",
        "attn2.to_out.0": "xo", "attn2.norm_q": "xnorm_q",
        "attn2.norm_k": "xnorm_k", "ffn.net.0.proj": "ff1",
        "ffn.net.2": "ff2",
}
PER_BLOCK_I2V = {
    "attn2.add_k_proj": "add_k", "attn2.add_v_proj": "add_v",
    "attn2.norm_added_k": "add_norm_k",
}


def diffusers_named_sd(m: TorchWan, i2v=False):
    """TorchWan state dict re-keyed with the public diffusers names (the
    layout convert_diffusers_weights expects)."""
    sd = {k: v.detach() for k, v in m.state_dict().items()}
    rename = dict(RENAME)
    per_block = dict(PER_BLOCK)
    if i2v:
        rename.update(RENAME_I2V)
        per_block.update(PER_BLOCK_I2V)
    out = {}
    for dn, tn in rename.items():
        out[dn] = sd[tn]
    nblocks = len(m.blocks)
    for i in range(nblocks):
        out[f"blocks.{i}.scale_shift_table"] = sd[f"blocks.{i}.table"].reshape(6, -1)
        for dk, tk in per_block.items():
            for suff in (".weight", ".bias"):
                if f"blocks.{i}.{tk}{suff}" in sd:
                    out[f"blocks.{i}.{dk}{suff}"] = sd[f"blocks.{i}.{tk}{suff}"]
    return out


def _params_from_torch(cfg: WanConfig, m: TorchWan, i2v=False):
    """state-dict -> our tree, via the same rename the diffusers ingester
    uses (exercises convert_diffusers_weights)."""
    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}
    rename = dict(RENAME)
    per_block = dict(PER_BLOCK)
    if i2v:
        rename.update(RENAME_I2V)
        per_block.update(PER_BLOCK_I2V)

    def get(name):
        if name in rename:
            return sd[rename[name]]
        parts = name.split(".")
        assert parts[0] == "blocks", name
        i = parts[1]
        rest = ".".join(parts[2:])
        if rest == "scale_shift_table":
            return sd[f"blocks.{i}.table"].reshape(6, -1)
        for dk, tk in per_block.items():
            for suff in (".weight", ".bias"):
                if rest == dk + suff:
                    return sd[f"blocks.{i}.{tk}{suff}"]
        raise KeyError(name)

    return WanDiT.convert_diffusers_weights(cfg, get, dtype=jnp.float32)


@pytest.mark.parametrize("i2v", [False, True])
def test_wan_forward_parity(i2v):
    cfg = TINY if not i2v else WanConfig(
        dim=48, ffn_dim=96, num_heads=4, num_layers=2, in_channels=4,
        out_channels=4, text_dim=32, freq_dim=32, image_embed_dim=24,
    )
    torch.manual_seed(0)
    tm = TorchWan(cfg, i2v=i2v).eval()
    params = _params_from_torch(cfg, tm, i2v=i2v)

    b, f, hh, ww = 2, 4, 8, 8
    rng = np.random.default_rng(0)
    lat = rng.standard_normal((b, f, hh, ww, cfg.in_channels)).astype(
        np.float32)
    txt = rng.standard_normal((b, 7, cfg.text_dim)).astype(np.float32)
    ts = np.array([250.0, 900.0], np.float32)
    img = (rng.standard_normal((b, 5, cfg.image_embed_dim)).astype(
        np.float32) if i2v else None)

    with torch.no_grad():
        ref = tm(
            torch.tensor(lat).permute(0, 4, 1, 2, 3),
            torch.tensor(txt), torch.tensor(ts),
            img_emb=torch.tensor(img) if i2v else None,
        ).numpy()

    fwd = WanDiT.make_forward(cfg)
    tokens, grid = patchify_video(jnp.asarray(lat), cfg.patch_size[1])
    out = fwd(params, tokens, jnp.asarray(txt), jnp.asarray(ts), grid,
              image_emb=jnp.asarray(img) if i2v else None)
    np.testing.assert_allclose(np.asarray(out), ref, atol=2e-4, rtol=2e-3)


def test_wan_rope_matches_torch_complex():
    cos, sin = wan_rope_3d((3, 4, 5), 24, 10000.0)
    freqs = t_rope_3d((3, 4, 5), 24)
    np.testing.assert_allclose(np.asarray(cos), freqs.real.numpy(),
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), freqs.imag.numpy(),
                               atol=1e-6)


def test_wan_grid_token_order_matches_conv_patchify():
    """patchify_video token order must equal Conv3d-flatten order (frame
    major, then h, then w) — the rope tables assume it."""
    cfg = TINY
    torch.manual_seed(1)
    tm = TorchWan(cfg).eval()
    lat = np.arange(2 * 4 * 4 * 4 * cfg.in_channels, dtype=np.float32)
    lat = lat.reshape(2, 4, 4, 4, cfg.in_channels) / lat.size
    with torch.no_grad():
        ref = tm.patch(
            torch.tensor(lat).permute(0, 4, 1, 2, 3)
        ).flatten(2).transpose(1, 2).numpy()
    params = _params_from_torch(cfg, tm)
    tokens, grid = patchify_video(jnp.asarray(lat), cfg.patch_size[1])
    ours = np.asarray(
        jnp.dot(tokens, params["patch_embed"]) + params["patch_embed_b"]
    )
    np.testing.assert_allclose(ours, ref, atol=1e-5)
