"""Flux DiT parity vs an independent torch implementation of the
diffusers FluxTransformer2DModel math (reference analog:
multimodal_gen/runtime/models/dits/flux.py:719). diffusers is not
installed in this environment, so the ground truth is a torch eager
re-implementation using the diffusers state-dict names, mirroring
tests/test_wan_dit.py's approach."""

import math

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.flux import (
    FluxConfig,
    FluxDiT,
    flux_rope,
)

CFG = FluxConfig(
    in_channels=16,
    num_layers=2,
    num_single_layers=2,
    attention_head_dim=16,
    num_attention_heads=4,
    joint_attention_dim=48,
    pooled_projection_dim=24,
    guidance_embeds=True,
    axes_dims_rope=(4, 6, 6),
)


# ---------------- torch reference (diffusers semantics) ----------------


def sinusoid(t, dim=256):
    """diffusers get_timestep_embedding(flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = torch.exp(
        -math.log(10000.0) * torch.arange(half, dtype=torch.float64) / half
    )
    args = t.double()[:, None] * freqs[None]
    return torch.cat([torch.cos(args), torch.sin(args)], dim=-1).float()


def rope_tables(grid, t_txt, cfg):
    """FluxPosEmbed: ids (0,0,0) for text, (0,y,x) for image."""
    gh, gw = grid
    ys, xs = torch.meshgrid(
        torch.arange(gh), torch.arange(gw), indexing="ij"
    )
    n = gh * gw
    coords = [torch.zeros(n), ys.reshape(-1), xs.reshape(-1)]
    parts = []
    for ax, dim_ax in enumerate(cfg.axes_dims_rope):
        k = dim_ax // 2
        freqs = 1.0 / (
            cfg.rope_theta
            ** (torch.arange(k, dtype=torch.float64) * 2 / dim_ax)
        )
        img = coords[ax].double()[:, None] * freqs[None]
        parts.append(torch.cat([torch.zeros(t_txt, k).double(), img]))
    ang = torch.cat(parts, dim=-1)
    return torch.cos(ang).float(), torch.sin(ang).float()


def apply_rope_t(x, cos, sin):
    # x [B, T, H, D]; adjacent pairs
    b, t, h, d = x.shape
    xf = x.reshape(b, t, h, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    return torch.stack(
        [x0 * c - x1 * s, x0 * s + x1 * c], dim=-1
    ).reshape(b, t, h, d)


def rmsn(x, w, eps=1e-6):
    v = x.float()
    n = v * torch.rsqrt(v.pow(2).mean(-1, keepdim=True) + eps)
    return n * w.float()


class TDouble(nn.Module):
    """FluxTransformerBlock (flux.py:562)."""

    def __init__(self, cfg):
        super().__init__()
        E = cfg.num_attention_heads * cfg.attention_head_dim
        F_ = int(E * cfg.mlp_ratio)
        D = cfg.attention_head_dim

        class N1(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(E, 6 * E)

        self.norm1, self.norm1_context = N1(), N1()

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.to_q = nn.Linear(E, E)
                self.to_k = nn.Linear(E, E)
                self.to_v = nn.Linear(E, E)
                self.add_q_proj = nn.Linear(E, E)
                self.add_k_proj = nn.Linear(E, E)
                self.add_v_proj = nn.Linear(E, E)
                self.norm_q = nn.Parameter(torch.randn(D).abs() + 0.5)
                self.norm_k = nn.Parameter(torch.randn(D).abs() + 0.5)
                self.norm_added_q = nn.Parameter(torch.randn(D).abs() + 0.5)
                self.norm_added_k = nn.Parameter(torch.randn(D).abs() + 0.5)
                self.to_out = nn.ModuleList([nn.Linear(E, E)])
                self.to_add_out = nn.Linear(E, E)

        self.attn = Attn()

        class FF(nn.Module):
            def __init__(self):
                super().__init__()
                self.net = nn.ModuleList(
                    [nn.Module(), nn.Identity(), nn.Linear(F_, E)]
                )
                self.net[0].proj = nn.Linear(E, F_)

        self.ff, self.ff_context = FF(), FF()
        self.H, self.D, self.E = cfg.num_attention_heads, D, E

    def forward(self, x, ctx, temb_silu, cos, sin):
        b, t, _ = x.shape
        tc = ctx.shape[1]
        e = self.norm1.linear(temb_silu)
        sh, sc, g, shm, scm, gm = e.chunk(6, dim=-1)
        ce = self.norm1_context.linear(temb_silu)
        csh, csc, cg, cshm, cscm, cgm = ce.chunk(6, dim=-1)
        nx = F.layer_norm(x, (self.E,), eps=1e-6) * (
            1 + sc[:, None]) + sh[:, None]
        nc = F.layer_norm(ctx, (self.E,), eps=1e-6) * (
            1 + csc[:, None]) + csh[:, None]

        def heads(z):
            return z.unflatten(-1, (self.H, self.D))

        q = rmsn(heads(self.attn.to_q(nx)), self.attn.norm_q)
        k = rmsn(heads(self.attn.to_k(nx)), self.attn.norm_k)
        v = heads(self.attn.to_v(nx))
        cq = rmsn(heads(self.attn.add_q_proj(nc)), self.attn.norm_added_q)
        ck = rmsn(heads(self.attn.add_k_proj(nc)), self.attn.norm_added_k)
        cv = heads(self.attn.add_v_proj(nc))
        q = apply_rope_t(torch.cat([cq, q], 1), cos, sin)
        k = apply_rope_t(torch.cat([ck, k], 1), cos, sin)
        vj = torch.cat([cv, v], 1)
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), vj.transpose(1, 2)
        ).transpose(1, 2).flatten(2)
        co, io = o[:, :tc], o[:, tc:]
        x = x + g[:, None] * self.attn.to_out[0](io)
        h = F.layer_norm(x, (self.E,), eps=1e-6) * (
            1 + scm[:, None]) + shm[:, None]
        x = x + gm[:, None] * self.ff.net[2](
            F.gelu(self.ff.net[0].proj(h), approximate="tanh"))
        ctx = ctx + cg[:, None] * self.attn.to_add_out(co)
        chh = F.layer_norm(ctx, (self.E,), eps=1e-6) * (
            1 + cscm[:, None]) + cshm[:, None]
        ctx = ctx + cgm[:, None] * self.ff_context.net[2](
            F.gelu(self.ff_context.net[0].proj(chh), approximate="tanh"))
        return x, ctx


class TSingle(nn.Module):
    """FluxSingleTransformerBlock (flux.py:424)."""

    def __init__(self, cfg):
        super().__init__()
        E = cfg.num_attention_heads * cfg.attention_head_dim
        F_ = int(E * cfg.mlp_ratio)
        D = cfg.attention_head_dim

        class N(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(E, 3 * E)

        self.norm = N()

        class Attn(nn.Module):
            def __init__(self):
                super().__init__()
                self.to_q = nn.Linear(E, E)
                self.to_k = nn.Linear(E, E)
                self.to_v = nn.Linear(E, E)
                self.norm_q = nn.Parameter(torch.randn(D).abs() + 0.5)
                self.norm_k = nn.Parameter(torch.randn(D).abs() + 0.5)

        self.attn = Attn()
        self.proj_mlp = nn.Linear(E, F_)
        self.proj_out = nn.Linear(E + F_, E)
        self.H, self.D, self.E = cfg.num_attention_heads, D, E

    def forward(self, s, temb_silu, cos, sin):
        b, t, _ = s.shape
        e = self.norm.linear(temb_silu)
        sh, sc, g = e.chunk(3, dim=-1)
        ns = F.layer_norm(s, (self.E,), eps=1e-6) * (
            1 + sc[:, None]) + sh[:, None]

        def heads(z):
            return z.unflatten(-1, (self.H, self.D))

        q = apply_rope_t(rmsn(heads(self.attn.to_q(ns)), self.attn.norm_q),
                         cos, sin)
        k = apply_rope_t(rmsn(heads(self.attn.to_k(ns)), self.attn.norm_k),
                         cos, sin)
        v = heads(self.attn.to_v(ns))
        o = F.scaled_dot_product_attention(
            q.transpose(1, 2), k.transpose(1, 2), v.transpose(1, 2)
        ).transpose(1, 2).flatten(2)
        mlp = F.gelu(self.proj_mlp(ns), approximate="tanh")
        return s + g[:, None] * self.proj_out(torch.cat([o, mlp], -1))


class TFlux(nn.Module):
    """FluxTransformer2DModel (flux.py:719) with diffusers names."""

    def __init__(self, cfg):
        super().__init__()
        E = cfg.num_attention_heads * cfg.attention_head_dim
        self.cfg = cfg
        self.x_embedder = nn.Linear(cfg.in_channels, E)
        self.context_embedder = nn.Linear(cfg.joint_attention_dim, E)

        class MLP(nn.Module):
            def __init__(self, din):
                super().__init__()
                self.linear_1 = nn.Linear(din, E)
                self.linear_2 = nn.Linear(E, E)

            def forward(self, x):
                return self.linear_2(F.silu(self.linear_1(x)))

        class TTE(nn.Module):
            def __init__(self):
                super().__init__()
                self.timestep_embedder = MLP(256)
                self.guidance_embedder = MLP(256)
                self.text_embedder = MLP(cfg.pooled_projection_dim)

        self.time_text_embed = TTE()
        self.transformer_blocks = nn.ModuleList(
            [TDouble(cfg) for _ in range(cfg.num_layers)]
        )
        self.single_transformer_blocks = nn.ModuleList(
            [TSingle(cfg) for _ in range(cfg.num_single_layers)]
        )

        class NOut(nn.Module):
            def __init__(self):
                super().__init__()
                self.linear = nn.Linear(E, 2 * E)

        self.norm_out = NOut()
        self.proj_out = nn.Linear(E, cfg.in_channels)
        self.E = E

    def forward(self, tokens, ctx_in, pooled, t, guidance, grid):
        temb = self.time_text_embed.timestep_embedder(sinusoid(t))
        temb = temb + self.time_text_embed.guidance_embedder(
            sinusoid(guidance))
        temb = temb + self.time_text_embed.text_embedder(pooled)
        temb_silu = F.silu(temb)
        x = self.x_embedder(tokens)
        ctx = self.context_embedder(ctx_in)
        cos, sin = rope_tables(grid, ctx.shape[1], self.cfg)
        for blk in self.transformer_blocks:
            x, ctx = blk(x, ctx, temb_silu, cos, sin)
        s = torch.cat([ctx, x], 1)
        for blk in self.single_transformer_blocks:
            s = blk(s, temb_silu, cos, sin)
        x = s[:, ctx.shape[1]:]
        e = self.norm_out.linear(temb_silu)
        scale, shift = e.chunk(2, dim=-1)
        x = F.layer_norm(x, (self.E,), eps=1e-6) * (
            1 + scale[:, None]) + shift[:, None]
        return self.proj_out(x)


def _convert(model):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}

    # per-head RMS norms are stored as bare Parameters here; diffusers
    # stores them as norm_q.weight — bridge the name
    def get(name):
        if name in sd:
            return sd[name]
        alt = name.replace(".weight", "")
        return sd[alt]

    return FluxDiT.convert_diffusers_weights(CFG, get, dtype=jnp.float32)


def test_flux_parity():
    torch.manual_seed(3)
    model = TFlux(CFG).eval()
    params = _convert(model)
    rng = np.random.default_rng(0)
    b, gh, gw, tc = 2, 4, 4, 7
    tokens = rng.standard_normal((b, gh * gw, CFG.in_channels)).astype(
        np.float32)
    ctx = rng.standard_normal((b, tc, CFG.joint_attention_dim)).astype(
        np.float32)
    pooled = rng.standard_normal((b, CFG.pooled_projection_dim)).astype(
        np.float32)
    t = np.array([347.0, 81.0], np.float32)
    gs = 3.5
    with torch.no_grad():
        ref = model(
            torch.tensor(tokens), torch.tensor(ctx), torch.tensor(pooled),
            torch.tensor(t), torch.full((b,), gs * 1000.0), (gh, gw)
        ).numpy()

    fwd = FluxDiT.make_forward(CFG, guidance=gs)
    # pipeline text_emb convention: pooled zero-padded as row 0
    pad = CFG.joint_attention_dim - CFG.pooled_projection_dim
    text_emb = np.concatenate(
        [np.pad(pooled, ((0, 0), (0, pad)))[:, None], ctx], axis=1)
    got = np.asarray(
        fwd(params, jnp.asarray(tokens), jnp.asarray(text_emb),
            jnp.asarray(t), (gh, gw)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_flux_rope_text_identity():
    """Text tokens get zero rotation (ids (0,0,0))."""
    cos, sin = flux_rope((2, 3), 5, CFG)
    np.testing.assert_allclose(np.asarray(cos[:5]), 1.0)
    np.testing.assert_allclose(np.asarray(sin[:5]), 0.0)


def test_flux_pipeline_smoke():
    from sglang_diffusion_tpu.diffusion.flux_pipeline import (
        FluxPipeline,
        tiny_flux_config,
    )
    from sglang_diffusion_tpu.diffusion.pipeline import GenerationParams

    pipe = FluxPipeline(flux_cfg=tiny_flux_config(), dtype=jnp.float32)
    gp = GenerationParams(
        prompt="a red square", height=64, width=64, num_inference_steps=2,
        guidance_scale=3.5, seed=5,
    )
    out = pipe.forward(gp)
    assert out.images.shape == (1, 64, 64, 3)
    assert out.images.dtype == np.uint8
    # distilled guidance is deterministic and CFG-free
    out2 = pipe.forward(gp)
    np.testing.assert_array_equal(out.images, out2.images)
    # schnell-style (no guidance embed) falls back to CFG
    schnell_cfg = tiny_flux_config()
    schnell_cfg.guidance_embeds = False
    p2 = FluxPipeline(flux_cfg=schnell_cfg, dtype=jnp.float32)
    out3 = p2.forward(GenerationParams(
        prompt="a red square", negative_prompt="blurry", height=32,
        width=32, num_inference_steps=2, guidance_scale=2.0, seed=1,
    ))
    assert out3.images.shape == (1, 32, 32, 3)


def test_flux_parts_match_forward():
    """Cache-DiT split forward (front/tail/head) == monolithic forward."""
    params = FluxDiT.init_params(jax.random.PRNGKey(0), CFG, jnp.float32)
    rng = np.random.default_rng(1)
    b, gh, gw, tc = 1, 2, 2, 3
    tokens = jnp.asarray(
        rng.standard_normal((b, gh * gw, CFG.in_channels)), jnp.float32)
    text_emb = jnp.asarray(
        rng.standard_normal((b, 1 + tc, CFG.joint_attention_dim)),
        jnp.float32)
    t = jnp.asarray([100.0], jnp.float32)
    fwd = FluxDiT.make_forward(CFG, guidance=2.0)
    full = fwd(params, tokens, text_emb, t, (gh, gw))
    front, tail, head = FluxDiT.make_forward_parts(
        CFG, front_blocks=1, guidance=2.0)
    s, ctx = front(params, tokens, text_emb, t, (gh, gw))
    s = tail(params, s, ctx)
    split = head(params, s, ctx)
    np.testing.assert_allclose(
        np.asarray(split), np.asarray(full), rtol=1e-5, atol=1e-5)
