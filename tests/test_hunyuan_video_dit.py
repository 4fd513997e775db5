"""HunyuanVideo DiT parity vs a torch mirror of the reference semantics
(multimodal_gen/runtime/models/dits/hunyuanvideo.py:413)."""

import math

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.hunyuan_video import (
    HunyuanVideoConfig,
    HunyuanVideoDiT,
    rope_cos_sin_3d,
)

CFG = HunyuanVideoConfig(
    hidden_size=48, num_attention_heads=4, num_layers=2,
    num_single_layers=2, num_refiner_layers=1, mlp_ratio=2.0,
    in_channels=4, out_channels=4, patch_size=2, patch_size_t=1,
    text_embed_dim=32, pooled_projection_dim=16, rope_axes_dim=(4, 4, 4),
    guidance_embeds=True,
)


def _sin_emb(t, dim=256):
    half = dim // 2
    freqs = torch.exp(-math.log(10000.0) * torch.arange(half).float() / half)
    ang = t.float()[:, None] * freqs[None]
    return torch.cat([ang.cos(), ang.sin()], dim=-1)


def _rms(x, w, eps=1e-6):
    var = x.float().pow(2).mean(-1, keepdim=True)
    return (x.float() * torch.rsqrt(var + eps) * w).type_as(x)


def _rope(x, cos, sin):
    x0, x1 = x[..., 0::2].float(), x[..., 1::2].float()
    c, s = cos[None, :, None, :], sin[None, :, None, :]
    return torch.stack([x0 * c - x1 * s, x1 * c + x0 * s],
                       dim=-1).reshape(x.shape).type_as(x)


def _sdpa(q, k, v, heads, d):
    b, t = q.shape[0], q.shape[1]
    s = torch.einsum("bqhd,bkhd->bhqk", q.float(), k.float()) / math.sqrt(d)
    p = s.softmax(-1)
    return torch.einsum("bhqk,bkhd->bqhd", p,
                        v.float()).reshape(b, t, heads * d).type_as(v)


class TDouble(nn.Module):
    def __init__(s, cfg):
        super().__init__()
        E, M, D = cfg.hidden_size, cfg.mlp_dim, cfg.head_dim
        s.H, s.D = cfg.num_attention_heads, D
        s.img_mod = nn.Linear(E, 6 * E)
        s.txt_mod = nn.Linear(E, 6 * E)
        s.img_qkv = nn.Linear(E, 3 * E)
        s.txt_qkv = nn.Linear(E, 3 * E)
        s.img_qn = nn.Parameter(torch.ones(D))
        s.img_kn = nn.Parameter(torch.ones(D))
        s.txt_qn = nn.Parameter(torch.ones(D))
        s.txt_kn = nn.Parameter(torch.ones(D))
        s.img_proj = nn.Linear(E, E)
        s.txt_proj = nn.Linear(E, E)
        s.img_fc1 = nn.Linear(E, M)
        s.img_fc2 = nn.Linear(M, E)
        s.txt_fc1 = nn.Linear(E, M)
        s.txt_fc2 = nn.Linear(M, E)

    def forward(s, img, txt, vec, cos, sin):
        vs = F.silu(vec)
        i = s.img_mod(vs)[:, None].chunk(6, -1)
        t = s.txt_mod(vs)[:, None].chunk(6, -1)
        b, ti = img.shape[0], img.shape[1]
        tt = txt.shape[1]
        qkv = s.img_qkv(F.layer_norm(img, img.shape[-1:], eps=1e-6)
                        * (1 + i[1]) + i[0]).view(b, ti, 3, s.H, s.D)
        iq = _rope(_rms(qkv[:, :, 0], s.img_qn), cos, sin)
        ik = _rope(_rms(qkv[:, :, 1], s.img_kn), cos, sin)
        iv = qkv[:, :, 2]
        tqkv = s.txt_qkv(F.layer_norm(txt, txt.shape[-1:], eps=1e-6)
                         * (1 + t[1]) + t[0]).view(b, tt, 3, s.H, s.D)
        tq = _rms(tqkv[:, :, 0], s.txt_qn)
        tk = _rms(tqkv[:, :, 1], s.txt_kn)
        tv = tqkv[:, :, 2]
        o = _sdpa(torch.cat([iq, tq], 1), torch.cat([ik, tk], 1),
                  torch.cat([iv, tv], 1), s.H, s.D)
        io, to = o[:, :ti], o[:, ti:]
        img = img + i[2] * s.img_proj(io)
        txt = txt + t[2] * s.txt_proj(to)
        img = img + i[5] * s.img_fc2(F.gelu(s.img_fc1(
            F.layer_norm(img, img.shape[-1:], eps=1e-6) * (1 + i[4])
            + i[3]), approximate="tanh"))
        txt = txt + t[5] * s.txt_fc2(F.gelu(s.txt_fc1(
            F.layer_norm(txt, txt.shape[-1:], eps=1e-6) * (1 + t[4])
            + t[3]), approximate="tanh"))
        return img, txt


class TSingle(nn.Module):
    def __init__(s, cfg):
        super().__init__()
        E, M, D = cfg.hidden_size, cfg.mlp_dim, cfg.head_dim
        s.E, s.M = E, M
        s.H, s.D = cfg.num_attention_heads, D
        s.mod = nn.Linear(E, 3 * E)
        s.linear1 = nn.Linear(E, 3 * E + M)
        s.linear2 = nn.Linear(E + M, E)
        s.qn = nn.Parameter(torch.ones(D))
        s.kn = nn.Parameter(torch.ones(D))

    def forward(s, x, vec, txt_len, cos, sin):
        sh, sc, g = s.mod(F.silu(vec))[:, None].chunk(3, -1)
        b, t = x.shape[0], x.shape[1]
        l1 = s.linear1(F.layer_norm(x, x.shape[-1:], eps=1e-6)
                       * (1 + sc) + sh)
        qkv, mlp = l1[..., :3 * s.E], l1[..., 3 * s.E:]
        qkv = qkv.view(b, t, 3, s.H, s.D)
        q = _rms(qkv[:, :, 0], s.qn)
        k = _rms(qkv[:, :, 1], s.kn)
        v = qkv[:, :, 2]
        ti = t - txt_len
        q = torch.cat([_rope(q[:, :ti], cos, sin), q[:, ti:]], 1)
        k = torch.cat([_rope(k[:, :ti], cos, sin), k[:, ti:]], 1)
        o = _sdpa(q, k, v, s.H, s.D)
        return x + g * s.linear2(torch.cat(
            [o, F.gelu(mlp, approximate="tanh")], -1))


class TRefiner(nn.Module):
    def __init__(s, cfg):
        super().__init__()
        E, M, D = cfg.hidden_size, cfg.mlp_dim, cfg.head_dim
        s.H, s.D = cfg.num_attention_heads, D
        s.norm1 = nn.LayerNorm(E, eps=1e-6)
        s.norm2 = nn.LayerNorm(E, eps=1e-6)
        s.qkv = nn.Linear(E, 3 * E)
        s.proj = nn.Linear(E, E)
        s.fc1 = nn.Linear(E, M)
        s.fc2 = nn.Linear(M, E)
        s.mod = nn.Linear(E, 2 * E)

    def forward(s, x, c):
        g1, g2 = s.mod(F.silu(c))[:, None].chunk(2, -1)
        b, t, _ = x.shape
        qkv = s.qkv(s.norm1(x)).view(b, t, 3, s.H, s.D)
        o = _sdpa(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], s.H, s.D)
        x = x + s.proj(o) * g1
        return x + s.fc2(F.silu(s.fc1(s.norm2(x)))) * g2


class THunyuan(nn.Module):
    def __init__(s, cfg):
        super().__init__()
        E = cfg.hidden_size
        s.cfg = cfg
        pc = cfg.patch_size_t * cfg.patch_size ** 2 * cfg.in_channels
        s.img_in = nn.Linear(pc, E)
        s.time_w1 = nn.Linear(256, E)
        s.time_w2 = nn.Linear(E, E)
        s.vector_w1 = nn.Linear(cfg.pooled_projection_dim, E)
        s.vector_w2 = nn.Linear(E, E)
        s.guidance_w1 = nn.Linear(256, E)
        s.guidance_w2 = nn.Linear(E, E)
        s.txt_in_input = nn.Linear(cfg.text_embed_dim, E)
        s.txt_in_t_w1 = nn.Linear(256, E)
        s.txt_in_t_w2 = nn.Linear(E, E)
        s.txt_in_c_w1 = nn.Linear(cfg.text_embed_dim, E)
        s.txt_in_c_w2 = nn.Linear(E, E)
        s.ref_blocks = nn.ModuleList(
            [TRefiner(cfg) for _ in range(cfg.num_refiner_layers)])
        s.dbl_blocks = nn.ModuleList(
            [TDouble(cfg) for _ in range(cfg.num_layers)])
        s.sgl_blocks = nn.ModuleList(
            [TSingle(cfg) for _ in range(cfg.num_single_layers)])
        s.final_mod = nn.Linear(E, 2 * E)
        s.final_linear = nn.Linear(
            E, cfg.patch_size_t * cfg.patch_size ** 2 * cfg.out_channels)

    def forward(s, latent, txt, pooled, t, cos, sin, guidance=6.0):
        cfg = s.cfg
        ps, pt = cfg.patch_size, cfg.patch_size_t
        b, c, f, hl, wl = latent.shape
        tt, th, tw = f // pt, hl // ps, wl // ps
        x = latent.view(b, c, tt, pt, th, ps, tw, ps)
        x = x.permute(0, 2, 4, 6, 3, 5, 7, 1).reshape(
            b, tt * th * tw, pt * ps * ps * c)
        x = s.img_in(x)
        vec = s.time_w2(F.silu(s.time_w1(_sin_emb(t))))
        vec = vec + s.vector_w2(F.silu(s.vector_w1(pooled)))
        g = torch.full((b,), guidance * 1000.0)
        vec = vec + s.guidance_w2(F.silu(s.guidance_w1(_sin_emb(g))))
        cvec = s.txt_in_t_w2(F.silu(s.txt_in_t_w1(_sin_emb(t)))) + \
            s.txt_in_c_w2(F.silu(s.txt_in_c_w1(txt.mean(1))))
        txt = s.txt_in_input(txt)
        for blk in s.ref_blocks:
            txt = blk(txt, cvec)
        for blk in s.dbl_blocks:
            x, txt = blk(x, txt, vec, cos, sin)
        st = torch.cat([x, txt], 1)
        for blk in s.sgl_blocks:
            st = blk(st, vec, txt.shape[1], cos, sin)
        x = st[:, : tt * th * tw]
        scale, shift = s.final_mod(F.silu(vec))[:, None].chunk(2, -1)
        x = F.layer_norm(x, x.shape[-1:], eps=1e-6) * (1 + scale) + shift
        x = s.final_linear(x)
        out = x.view(b, tt, th, tw, pt, ps, ps, cfg.out_channels)
        return out.permute(0, 7, 1, 4, 2, 5, 3, 6).reshape(
            b, cfg.out_channels, f, hl, wl)


def _params_from_mirror(m: THunyuan, cfg):
    import jax

    sd = {k: v.detach().numpy() for k, v in m.state_dict().items()}

    def lin(pre):
        return {"w": jnp.asarray(sd[pre + ".weight"].T),
                "b": jnp.asarray(sd[pre + ".bias"])}

    def stack_blocks(mods, build):
        blocks = [build(i) for i in range(len(mods))]
        return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

    def dbl(i):
        p = f"dbl_blocks.{i}"
        return {
            "img_mod": lin(p + ".img_mod"), "txt_mod": lin(p + ".txt_mod"),
            "img_qkv": lin(p + ".img_qkv"), "txt_qkv": lin(p + ".txt_qkv"),
            "img_q_norm": jnp.asarray(sd[p + ".img_qn"]),
            "img_k_norm": jnp.asarray(sd[p + ".img_kn"]),
            "txt_q_norm": jnp.asarray(sd[p + ".txt_qn"]),
            "txt_k_norm": jnp.asarray(sd[p + ".txt_kn"]),
            "img_proj": lin(p + ".img_proj"),
            "txt_proj": lin(p + ".txt_proj"),
            "img_fc1": lin(p + ".img_fc1"), "img_fc2": lin(p + ".img_fc2"),
            "txt_fc1": lin(p + ".txt_fc1"), "txt_fc2": lin(p + ".txt_fc2"),
        }

    def sgl(i):
        p = f"sgl_blocks.{i}"
        return {
            "mod": lin(p + ".mod"), "linear1": lin(p + ".linear1"),
            "linear2": lin(p + ".linear2"),
            "q_norm": jnp.asarray(sd[p + ".qn"]),
            "k_norm": jnp.asarray(sd[p + ".kn"]),
        }

    def ref(i):
        p = f"ref_blocks.{i}"
        return {
            "norm1_w": jnp.asarray(sd[p + ".norm1.weight"]),
            "norm1_b": jnp.asarray(sd[p + ".norm1.bias"]),
            "norm2_w": jnp.asarray(sd[p + ".norm2.weight"]),
            "norm2_b": jnp.asarray(sd[p + ".norm2.bias"]),
            "qkv": lin(p + ".qkv"), "proj": lin(p + ".proj"),
            "fc1": lin(p + ".fc1"), "fc2": lin(p + ".fc2"),
            "mod": lin(p + ".mod"),
        }

    return {
        "img_in": lin("img_in"),
        "time_w1": lin("time_w1"), "time_w2": lin("time_w2"),
        "vector_w1": lin("vector_w1"), "vector_w2": lin("vector_w2"),
        "guidance_w1": lin("guidance_w1"), "guidance_w2": lin("guidance_w2"),
        "txt_in_input": lin("txt_in_input"),
        "txt_in_t_w1": lin("txt_in_t_w1"), "txt_in_t_w2": lin("txt_in_t_w2"),
        "txt_in_c_w1": lin("txt_in_c_w1"), "txt_in_c_w2": lin("txt_in_c_w2"),
        "refiner": stack_blocks(m.ref_blocks, ref),
        "double": stack_blocks(m.dbl_blocks, dbl),
        "single": stack_blocks(m.sgl_blocks, sgl),
        "final_mod": lin("final_mod"),
        "final_linear": lin("final_linear"),
    }


def test_hunyuan_video_parity():
    torch.manual_seed(3)
    m = THunyuan(CFG).eval()
    params = _params_from_mirror(m, CFG)
    rng = np.random.default_rng(0)
    f, hl, wl = 2, 8, 8
    lat = rng.standard_normal((1, CFG.in_channels, f, hl, wl)).astype(
        np.float32) * 0.4
    txt = rng.standard_normal((1, 7, CFG.text_embed_dim)).astype(
        np.float32) * 0.4
    pooled = rng.standard_normal((1, CFG.pooled_projection_dim)).astype(
        np.float32) * 0.4
    t = np.array([613.0], np.float32)
    tt, th, tw = f // CFG.patch_size_t, hl // CFG.patch_size, \
        wl // CFG.patch_size
    cos, sin = rope_cos_sin_3d((tt, th, tw), CFG)
    with torch.no_grad():
        ref = m(torch.from_numpy(lat), torch.from_numpy(txt),
                torch.from_numpy(pooled), torch.from_numpy(t),
                torch.from_numpy(cos), torch.from_numpy(sin)).numpy()
    fwd = HunyuanVideoDiT.make_forward(CFG, guidance=6.0)
    out = fwd(params, jnp.asarray(lat.transpose(0, 2, 3, 4, 1)),
              jnp.asarray(txt), jnp.asarray(pooled), jnp.asarray(t))
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    np.testing.assert_allclose(out, ref, atol=5e-4, rtol=3e-3)
