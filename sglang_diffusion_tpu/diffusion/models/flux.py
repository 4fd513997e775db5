"""Flux image DiT (double-stream + single-stream blocks) — functional JAX.

Reference analog: multimodal_gen/runtime/models/dits/flux.py:719
(FluxTransformer2DModel: FluxTransformerBlock double-stream x N +
FluxSingleTransformerBlock x M, CombinedTimestepGuidanceTextProj
embeddings, FluxPosEmbed 3-axis rope) and the diffusers
FluxTransformer2DModel weight layout. Re-designed TPU-first like
models/wan.py: stacked-parameter trees scanned over blocks with lax.scan
(compile time depth-independent), f32 modulation math, pluggable
attention (dense einsum / Pallas flash / Ulysses SP).

Architecture (per reference flux.py:562-694 double, :424-560 single):
  latents [B,H,W,16] --pack 2x2--> tokens [B, T, 64] --x_embedder--> [B,T,E]
  temb = silu(time_mlp(sinusoid(t*?)) + guidance_mlp(...) + pooled_mlp(CLIP))
  double block: img/txt each AdaLN-Zero (6E) -> joint attention over
      [txt; img] with per-head RMS qk-norm + 3-axis rope -> gated residual
      -> LN*(1+scale)+shift -> gelu_tanh FFN -> gated residual (both streams)
  single block: concat [txt; img] -> AdaLN-Zero-Single (3E) -> attention
      (pre_only, no out proj) || gelu_tanh MLP -> proj_out(concat) ->
      gate * out + residual -> split streams
  head: AdaLN-Continuous (scale, shift order) -> proj_out [B,T,64]
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.diffusion.models.dit import (
    joint_attention,
    timestep_embedding,
)
from sglang_diffusion_tpu.diffusion.models.wan import _gelu_tanh, _ln, _rms


@dataclass
class FluxConfig:
    """Flux.1-dev defaults (diffusers transformer/config.json)."""

    in_channels: int = 64  # packed 2x2 patches of 16 latent channels
    out_channels: Optional[int] = None
    num_layers: int = 19  # double-stream blocks
    num_single_layers: int = 38
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 4096  # T5-XXL features
    pooled_projection_dim: int = 768  # CLIP-L pooled
    guidance_embeds: bool = True  # dev; schnell = False
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    patch_size: int = 1  # tokens arrive pre-packed (pipeline packs 2x2)
    eps: float = 1e-6
    mlp_ratio: float = 4.0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def head_dim(self) -> int:
        return self.attention_head_dim

    @property
    def out_ch(self) -> int:
        return self.out_channels or self.in_channels

    @property
    def mlp_dim(self) -> int:
        return int(self.dim * self.mlp_ratio)


def flux_rope(grid: Tuple[int, int], t_txt: int, cfg: FluxConfig):
    """(cos, sin) [t_txt + gh*gw, head_dim/2] for the joint [txt; img]
    stream. Per reference FluxPosEmbed (flux.py:695-716): ids are
    (0, 0, 0) for text and (0, y, x) for image tokens; per-axis dims
    axes_dims_rope with theta^(-2i/dim_ax) frequencies; pairs rotated
    adjacent-interleaved (rope is_neox=False)."""
    gh, gw = grid
    axes = cfg.axes_dims_rope
    assert sum(axes) == cfg.head_dim, (
        f"axes_dims_rope {axes} must sum to head_dim {cfg.head_dim}")
    n_img = gh * gw
    ys, xs = np.meshgrid(np.arange(gh), np.arange(gw), indexing="ij")
    coords_img = [np.zeros(n_img), ys.reshape(-1), xs.reshape(-1)]
    parts = []
    for ax, dim_ax in enumerate(axes):
        k = dim_ax // 2
        freqs = 1.0 / (
            cfg.rope_theta ** (np.arange(k, dtype=np.float64) * 2 / dim_ax)
        )
        img = coords_img[ax][:, None] * freqs[None, :]
        txt = np.zeros((t_txt, k))
        parts.append(np.concatenate([txt, img], axis=0))
    ang = np.concatenate(parts, axis=1)  # [T, head_dim/2]
    return (
        jnp.asarray(np.cos(ang), jnp.float32),
        jnp.asarray(np.sin(ang), jnp.float32),
    )


def _rope_apply(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, T, H, D]; adjacent-pair rotation in f32."""
    b, t, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(b, t, h, d).astype(x.dtype)


class FluxDiT:
    """Namespace-style functional model (layout mirrors models/wan.py)."""

    # ---------------- params ----------------

    @staticmethod
    def init_params(rng: jax.Array, cfg: FluxConfig, dtype=jnp.bfloat16):
        E, F = cfg.dim, cfg.mlp_dim
        L, L2, D = cfg.num_layers, cfg.num_single_layers, cfg.head_dim
        ks = iter(jax.random.split(rng, 64))

        def init(shape, scale_dim=None):
            scale = 1.0 / math.sqrt(
                scale_dim or (shape[-2] if len(shape) > 1 else shape[-1])
            )
            return (
                jax.random.normal(next(ks), shape, jnp.float32) * scale
            ).astype(dtype)

        def zeros(shape):
            return jnp.zeros(shape, dtype)

        double = {
            "mod_img_w": init((L, E, 6 * E)), "mod_img_b": zeros((L, 6 * E)),
            "mod_txt_w": init((L, E, 6 * E)), "mod_txt_b": zeros((L, 6 * E)),
            "wq": init((L, E, E)), "bq": zeros((L, E)),
            "wk": init((L, E, E)), "bk": zeros((L, E)),
            "wv": init((L, E, E)), "bv": zeros((L, E)),
            "q_norm": jnp.ones((L, D), dtype),
            "k_norm": jnp.ones((L, D), dtype),
            "add_wq": init((L, E, E)), "add_bq": zeros((L, E)),
            "add_wk": init((L, E, E)), "add_bk": zeros((L, E)),
            "add_wv": init((L, E, E)), "add_bv": zeros((L, E)),
            "add_q_norm": jnp.ones((L, D), dtype),
            "add_k_norm": jnp.ones((L, D), dtype),
            "wo": init((L, E, E)), "bo": zeros((L, E)),
            "add_wo": init((L, E, E)), "add_bo": zeros((L, E)),
            "ff_w1": init((L, E, F)), "ff_b1": zeros((L, F)),
            "ff_w2": init((L, F, E)), "ff_b2": zeros((L, E)),
            "ff_ctx_w1": init((L, E, F)), "ff_ctx_b1": zeros((L, F)),
            "ff_ctx_w2": init((L, F, E)), "ff_ctx_b2": zeros((L, E)),
        }
        single = {
            "mod_w": init((L2, E, 3 * E)), "mod_b": zeros((L2, 3 * E)),
            "wq": init((L2, E, E)), "bq": zeros((L2, E)),
            "wk": init((L2, E, E)), "bk": zeros((L2, E)),
            "wv": init((L2, E, E)), "bv": zeros((L2, E)),
            "q_norm": jnp.ones((L2, D), dtype),
            "k_norm": jnp.ones((L2, D), dtype),
            "mlp_w": init((L2, E, F)), "mlp_b": zeros((L2, F)),
            "out_w": init((L2, E + F, E)), "out_b": zeros((L2, E)),
        }
        params: Dict[str, Any] = {
            "x_embed": init((cfg.in_channels, E)), "x_embed_b": zeros((E,)),
            "ctx_embed": init((cfg.joint_attention_dim, E)),
            "ctx_embed_b": zeros((E,)),
            "time_w1": init((256, E)), "time_b1": zeros((E,)),
            "time_w2": init((E, E)), "time_b2": zeros((E,)),
            "pooled_w1": init((cfg.pooled_projection_dim, E)),
            "pooled_b1": zeros((E,)),
            "pooled_w2": init((E, E)), "pooled_b2": zeros((E,)),
            "double": double,
            "single": single,
            "norm_out_w": init((E, 2 * E)), "norm_out_b": zeros((2 * E,)),
            "proj_out": init((E, cfg.out_ch)), "proj_out_b": zeros((cfg.out_ch,)),
        }
        if cfg.guidance_embeds:
            params.update({
                "guid_w1": init((256, E)), "guid_b1": zeros((E,)),
                "guid_w2": init((E, E)), "guid_b2": zeros((E,)),
            })
        return params

    @staticmethod
    def partition_specs(cfg: FluxConfig) -> Dict[str, Any]:
        """TP sharding: qkv/mlp column-sharded in, out-proj row-sharded;
        modulation tables column-sharded on the 6E/3E axis."""
        col = P(None, None, "tp")
        row = P(None, "tp", None)
        colb = P(None, "tp")
        rep2 = P(None, None)
        double = {
            "mod_img_w": col, "mod_img_b": colb,
            "mod_txt_w": col, "mod_txt_b": colb,
            "wq": col, "bq": colb, "wk": col, "bk": colb,
            "wv": col, "bv": colb,
            "q_norm": rep2, "k_norm": rep2,
            "add_wq": col, "add_bq": colb, "add_wk": col, "add_bk": colb,
            "add_wv": col, "add_bv": colb,
            "add_q_norm": rep2, "add_k_norm": rep2,
            "wo": row, "bo": rep2, "add_wo": row, "add_bo": rep2,
            "ff_w1": col, "ff_b1": colb, "ff_w2": row, "ff_b2": rep2,
            "ff_ctx_w1": col, "ff_ctx_b1": colb,
            "ff_ctx_w2": row, "ff_ctx_b2": rep2,
        }
        single = {
            "mod_w": col, "mod_b": colb,
            "wq": col, "bq": colb, "wk": col, "bk": colb,
            "wv": col, "bv": colb, "q_norm": rep2, "k_norm": rep2,
            "mlp_w": col, "mlp_b": colb, "out_w": row, "out_b": rep2,
        }
        specs: Dict[str, Any] = {
            "x_embed": P(None, None), "x_embed_b": P(None),
            "ctx_embed": P(None, None), "ctx_embed_b": P(None),
            "time_w1": P(None, None), "time_b1": P(None),
            "time_w2": P(None, None), "time_b2": P(None),
            "pooled_w1": P(None, None), "pooled_b1": P(None),
            "pooled_w2": P(None, None), "pooled_b2": P(None),
            "double": double, "single": single,
            "norm_out_w": P(None, None), "norm_out_b": P(None),
            "proj_out": P(None, None), "proj_out_b": P(None),
        }
        if cfg.guidance_embeds:
            specs.update({
                "guid_w1": P(None, None), "guid_b1": P(None),
                "guid_w2": P(None, None), "guid_b2": P(None),
            })
        return specs

    # ---------------- blocks ----------------

    @staticmethod
    def _mod6(temb_silu, w, b, E):
        """AdaLayerNormZero table: silu(temb) @ W + b -> 6 x [B,1,E] f32."""
        e = jnp.dot(temb_silu, w.astype(jnp.float32)) + b.astype(jnp.float32)
        return [e[:, None, i * E:(i + 1) * E] for i in range(6)]

    @staticmethod
    def _make_double_body(cfg: FluxConfig, attn_fn):
        E, H, D, eps = cfg.dim, cfg.num_attention_heads, cfg.head_dim, cfg.eps
        sm_scale = 1.0 / math.sqrt(D)

        def body(x, ctx, bp, temb_silu, cos, sin):
            # x [B,T,E] image tokens; ctx [B,Tc,E] text tokens
            b, t, _ = x.shape
            tc = ctx.shape[1]
            sh, sc, g_msa, sh_m, sc_m, g_mlp = FluxDiT._mod6(
                temb_silu, bp["mod_img_w"], bp["mod_img_b"], E)
            csh, csc, cg_msa, csh_m, csc_m, cg_mlp = FluxDiT._mod6(
                temb_silu, bp["mod_txt_w"], bp["mod_txt_b"], E)

            nx = (_ln(x, eps) * (1 + sc) + sh).astype(x.dtype)
            nc = (_ln(ctx, eps) * (1 + csc) + csh).astype(ctx.dtype)

            q = _rms((jnp.dot(nx, bp["wq"]) + bp["bq"]).reshape(b, t, H, D),
                     bp["q_norm"], eps)
            k = _rms((jnp.dot(nx, bp["wk"]) + bp["bk"]).reshape(b, t, H, D),
                     bp["k_norm"], eps)
            v = (jnp.dot(nx, bp["wv"]) + bp["bv"]).reshape(b, t, H, D)
            cq = _rms((jnp.dot(nc, bp["add_wq"]) + bp["add_bq"]).reshape(
                b, tc, H, D), bp["add_q_norm"], eps)
            ck = _rms((jnp.dot(nc, bp["add_wk"]) + bp["add_bk"]).reshape(
                b, tc, H, D), bp["add_k_norm"], eps)
            cv = (jnp.dot(nc, bp["add_wv"]) + bp["add_bv"]).reshape(
                b, tc, H, D)

            # joint stream: text first (reference flux.py:382-385)
            q = _rope_apply(jnp.concatenate([cq, q], axis=1), cos, sin)
            k = _rope_apply(jnp.concatenate([ck, k], axis=1), cos, sin)
            vj = jnp.concatenate([cv, v], axis=1)
            attn = attn_fn(q, k, vj, sm_scale)
            ctx_attn, img_attn = attn[:, :tc], attn[:, tc:]

            o = jnp.dot(img_attn.reshape(b, t, E), bp["wo"]) + bp["bo"]
            x = (x.astype(jnp.float32)
                 + o.astype(jnp.float32) * g_msa).astype(x.dtype)
            h = (_ln(x, eps) * (1 + sc_m) + sh_m).astype(x.dtype)
            ff = jnp.dot(_gelu_tanh(jnp.dot(h, bp["ff_w1"]) + bp["ff_b1"]),
                         bp["ff_w2"]) + bp["ff_b2"]
            x = (x.astype(jnp.float32)
                 + ff.astype(jnp.float32) * g_mlp).astype(x.dtype)

            co = jnp.dot(ctx_attn.reshape(b, tc, E), bp["add_wo"]) + bp[
                "add_bo"]
            ctx = (ctx.astype(jnp.float32)
                   + co.astype(jnp.float32) * cg_msa).astype(ctx.dtype)
            ch = (_ln(ctx, eps) * (1 + csc_m) + csh_m).astype(ctx.dtype)
            cff = jnp.dot(
                _gelu_tanh(jnp.dot(ch, bp["ff_ctx_w1"]) + bp["ff_ctx_b1"]),
                bp["ff_ctx_w2"]) + bp["ff_ctx_b2"]
            ctx = (ctx.astype(jnp.float32)
                   + cff.astype(jnp.float32) * cg_mlp).astype(ctx.dtype)
            return x, ctx

        return body

    @staticmethod
    def _make_single_body(cfg: FluxConfig, attn_fn):
        E, H, D, eps = cfg.dim, cfg.num_attention_heads, cfg.head_dim, cfg.eps
        sm_scale = 1.0 / math.sqrt(D)

        def body(s, bp, temb_silu, cos, sin):
            # s [B, Tc+T, E] joint stream (text first)
            b, t, _ = s.shape
            e = jnp.dot(temb_silu, bp["mod_w"].astype(jnp.float32)) + bp[
                "mod_b"].astype(jnp.float32)
            sh, sc, gate = [e[:, None, i * E:(i + 1) * E] for i in range(3)]
            ns = (_ln(s, eps) * (1 + sc) + sh).astype(s.dtype)
            q = _rms((jnp.dot(ns, bp["wq"]) + bp["bq"]).reshape(b, t, H, D),
                     bp["q_norm"], eps)
            k = _rms((jnp.dot(ns, bp["wk"]) + bp["bk"]).reshape(b, t, H, D),
                     bp["k_norm"], eps)
            v = (jnp.dot(ns, bp["wv"]) + bp["bv"]).reshape(b, t, H, D)
            q = _rope_apply(q, cos, sin)
            k = _rope_apply(k, cos, sin)
            attn = attn_fn(q, k, v, sm_scale).reshape(b, t, E)
            mlp = _gelu_tanh(jnp.dot(ns, bp["mlp_w"]) + bp["mlp_b"])
            out = jnp.dot(jnp.concatenate([attn, mlp], axis=-1),
                          bp["out_w"]) + bp["out_b"]
            s = (s.astype(jnp.float32)
                 + out.astype(jnp.float32) * gate).astype(s.dtype)
            return s

        return body

    # ---------------- conditioning ----------------

    @staticmethod
    def embed_conditioning(params, cfg: FluxConfig, timesteps, pooled,
                           guidance=None):
        """temb [B, E] f32 = time MLP + guidance MLP + pooled-text MLP
        (reference CombinedTimestepGuidanceTextProjEmbeddings)."""
        te = timestep_embedding(timesteps, 256)
        h = jax.nn.silu(
            jnp.dot(te, params["time_w1"].astype(jnp.float32))
            + params["time_b1"].astype(jnp.float32))
        temb = jnp.dot(h, params["time_w2"].astype(jnp.float32)) + params[
            "time_b2"].astype(jnp.float32)
        if cfg.guidance_embeds and guidance is not None:
            ge = timestep_embedding(guidance, 256)
            gh = jax.nn.silu(
                jnp.dot(ge, params["guid_w1"].astype(jnp.float32))
                + params["guid_b1"].astype(jnp.float32))
            temb = temb + jnp.dot(
                gh, params["guid_w2"].astype(jnp.float32)) + params[
                "guid_b2"].astype(jnp.float32)
        ph = jax.nn.silu(
            jnp.dot(pooled.astype(jnp.float32),
                    params["pooled_w1"].astype(jnp.float32))
            + params["pooled_b1"].astype(jnp.float32))
        temb = temb + jnp.dot(
            ph, params["pooled_w2"].astype(jnp.float32)) + params[
            "pooled_b2"].astype(jnp.float32)
        return temb

    # ---------------- forward ----------------

    @staticmethod
    def make_forward(cfg: FluxConfig, attn_fn=joint_attention,
                     guidance: Optional[float] = None):
        """forward(params, tokens [B,T,in_ch], text_emb, timesteps [B],
        grid (gh, gw)) -> [B, T, out_ch].

        text_emb [B, 1+Tc, joint_attention_dim]: row 0 carries the pooled
        CLIP projection (zero-padded to joint_attention_dim), rows 1..Tc
        the T5 sequence — one tensor so the generic pipeline's CFG
        machinery (batch doubling, cfg-mesh sharding) applies unchanged."""
        double_body = FluxDiT._make_double_body(cfg, attn_fn)
        single_body = FluxDiT._make_single_body(cfg, attn_fn)
        E = cfg.dim

        def forward(params, tokens, text_emb, timesteps, grid):
            b, t, _ = tokens.shape
            pooled = text_emb[:, 0, :cfg.pooled_projection_dim]
            ctx_in = text_emb[:, 1:]
            tc = ctx_in.shape[1]
            x = jnp.dot(tokens, params["x_embed"]) + params["x_embed_b"]
            ctx = jnp.dot(ctx_in, params["ctx_embed"]) + params["ctx_embed_b"]
            g = (None if guidance is None
                 else jnp.full((b,), guidance * 1000.0, jnp.float32))
            temb = FluxDiT.embed_conditioning(
                params, cfg, timesteps, pooled, g)
            temb_silu = jax.nn.silu(temb)
            cos, sin = flux_rope(tuple(grid), tc, cfg)

            def dbody(carry, bp):
                x, ctx = carry
                x, ctx = double_body(x, ctx, bp, temb_silu, cos, sin)
                return (x, ctx), None

            (x, ctx), _ = jax.lax.scan(dbody, (x, ctx), params["double"])

            s = jnp.concatenate([ctx, x], axis=1)

            def sbody(c, bp):
                return single_body(c, bp, temb_silu, cos, sin), None

            s, _ = jax.lax.scan(sbody, s, params["single"])
            x = s[:, tc:]

            # AdaLayerNormContinuous: chunk order is (scale, shift)
            e = jnp.dot(temb_silu, params["norm_out_w"].astype(jnp.float32)
                        ) + params["norm_out_b"].astype(jnp.float32)
            scale, shift = e[:, None, :E], e[:, None, E:]
            x = (_ln(x, cfg.eps) * (1 + scale) + shift).astype(x.dtype)
            return jnp.dot(x, params["proj_out"]) + params["proj_out_b"]

        return forward

    @staticmethod
    def make_forward_parts(cfg: FluxConfig, attn_fn=joint_attention,
                           front_blocks: int = 1,
                           guidance: Optional[float] = None):
        """Split forward for Cache-DiT block caching (mirrors
        WanDiT.make_forward_parts). The carried hidden stream is the joint
        [txt; img] stream so both block families slot in."""
        double_body = FluxDiT._make_double_body(cfg, attn_fn)
        single_body = FluxDiT._make_single_body(cfg, attn_fn)
        E = cfg.dim
        assert 0 < front_blocks < cfg.num_layers

        def _dslice(params, lo, hi):
            return jax.tree.map(lambda a: a[lo:hi], params["double"])

        def front(params, tokens, text_emb, timesteps, grid):
            b = tokens.shape[0]
            pooled = text_emb[:, 0, :cfg.pooled_projection_dim]
            ctx_in = text_emb[:, 1:]
            tc = ctx_in.shape[1]
            x = jnp.dot(tokens, params["x_embed"]) + params["x_embed_b"]
            c = jnp.dot(ctx_in, params["ctx_embed"]) + params["ctx_embed_b"]
            g = (None if guidance is None
                 else jnp.full((b,), guidance * 1000.0, jnp.float32))
            temb = FluxDiT.embed_conditioning(params, cfg, timesteps, pooled, g)
            temb_silu = jax.nn.silu(temb)
            cos, sin = flux_rope(tuple(grid), tc, cfg)

            def dbody(carry, bp):
                x, c = carry
                return double_body(x, c, bp, temb_silu, cos, sin), None

            (x, c), _ = jax.lax.scan(
                dbody, (x, c), _dslice(params, 0, front_blocks))
            ctx = {"temb_silu": temb_silu, "cos": cos, "sin": sin, "tc": tc}
            return jnp.concatenate([c, x], axis=1), ctx

        def tail(params, s, ctx):
            temb_silu, cos, sin = ctx["temb_silu"], ctx["cos"], ctx["sin"]
            tc = ctx["tc"]
            c, x = s[:, :tc], s[:, tc:]

            def dbody(carry, bp):
                x, c = carry
                return double_body(x, c, bp, temb_silu, cos, sin), None

            (x, c), _ = jax.lax.scan(
                dbody, (x, c),
                _dslice(params, front_blocks, cfg.num_layers))
            s = jnp.concatenate([c, x], axis=1)

            def sbody(cr, bp):
                return single_body(cr, bp, temb_silu, cos, sin), None

            s, _ = jax.lax.scan(sbody, s, params["single"])
            return s

        def head(params, s, ctx):
            x = s[:, ctx["tc"]:]
            e = jnp.dot(ctx["temb_silu"],
                        params["norm_out_w"].astype(jnp.float32)
                        ) + params["norm_out_b"].astype(jnp.float32)
            scale, shift = e[:, None, :E], e[:, None, E:]
            x = (_ln(x, cfg.eps) * (1 + scale) + shift).astype(x.dtype)
            return jnp.dot(x, params["proj_out"]) + params["proj_out_b"]

        return front, tail, head

    # ---------------- diffusers checkpoint ingestion ----------------

    @staticmethod
    def config_from_diffusers(d: Dict[str, Any]) -> "FluxConfig":
        """diffusers transformer/config.json -> FluxConfig."""
        return FluxConfig(
            in_channels=d.get("in_channels", 64),
            out_channels=d.get("out_channels"),
            num_layers=d.get("num_layers", 19),
            num_single_layers=d.get("num_single_layers", 38),
            attention_head_dim=d.get("attention_head_dim", 128),
            num_attention_heads=d.get("num_attention_heads", 24),
            joint_attention_dim=d.get("joint_attention_dim", 4096),
            pooled_projection_dim=d.get("pooled_projection_dim", 768),
            guidance_embeds=d.get("guidance_embeds", False),
            axes_dims_rope=tuple(d.get("axes_dims_rope", (16, 56, 56))),
            patch_size=d.get("patch_size", 1),
        )

    @staticmethod
    def convert_diffusers_weights(cfg: FluxConfig, get, dtype=jnp.bfloat16):
        """Build our param tree from a diffusers FluxTransformer2DModel
        state dict. `get(name) -> np.ndarray` fetches one tensor (works
        for sharded safetensors without loading everything)."""
        L, L2 = cfg.num_layers, cfg.num_single_layers

        def lin(name):
            return np.asarray(get(f"{name}.weight")).T, np.asarray(
                get(f"{name}.bias"))

        def stack_lin(tmpl, n):
            ws, bs = zip(*(lin(tmpl.format(i=i)) for i in range(n)))
            return np.stack(ws), np.stack(bs)

        def stack_vec(tmpl, n):
            return np.stack(
                [np.asarray(get(tmpl.format(i=i))) for i in range(n)])

        db = "transformer_blocks.{i}"
        double = {}
        for wkey, bkey, theirs in [
            ("mod_img_w", "mod_img_b", f"{db}.norm1.linear"),
            ("mod_txt_w", "mod_txt_b", f"{db}.norm1_context.linear"),
            ("wq", "bq", f"{db}.attn.to_q"),
            ("wk", "bk", f"{db}.attn.to_k"),
            ("wv", "bv", f"{db}.attn.to_v"),
            ("add_wq", "add_bq", f"{db}.attn.add_q_proj"),
            ("add_wk", "add_bk", f"{db}.attn.add_k_proj"),
            ("add_wv", "add_bv", f"{db}.attn.add_v_proj"),
            ("wo", "bo", f"{db}.attn.to_out.0"),
            ("add_wo", "add_bo", f"{db}.attn.to_add_out"),
            ("ff_w1", "ff_b1", f"{db}.ff.net.0.proj"),
            ("ff_w2", "ff_b2", f"{db}.ff.net.2"),
            ("ff_ctx_w1", "ff_ctx_b1", f"{db}.ff_context.net.0.proj"),
            ("ff_ctx_w2", "ff_ctx_b2", f"{db}.ff_context.net.2"),
        ]:
            w, b = stack_lin(theirs, L)
            double[wkey] = w
            double[bkey] = b
        double["q_norm"] = stack_vec(f"{db}.attn.norm_q.weight", L)
        double["k_norm"] = stack_vec(f"{db}.attn.norm_k.weight", L)
        double["add_q_norm"] = stack_vec(f"{db}.attn.norm_added_q.weight", L)
        double["add_k_norm"] = stack_vec(f"{db}.attn.norm_added_k.weight", L)

        sb = "single_transformer_blocks.{i}"
        single = {}
        for wkey, bkey, theirs in [
            ("mod_w", "mod_b", f"{sb}.norm.linear"),
            ("wq", "bq", f"{sb}.attn.to_q"),
            ("wk", "bk", f"{sb}.attn.to_k"),
            ("wv", "bv", f"{sb}.attn.to_v"),
            ("mlp_w", "mlp_b", f"{sb}.proj_mlp"),
            ("out_w", "out_b", f"{sb}.proj_out"),
        ]:
            w, b = stack_lin(theirs, L2)
            single[wkey] = w
            single[bkey] = b
        single["q_norm"] = stack_vec(f"{sb}.attn.norm_q.weight", L2)
        single["k_norm"] = stack_vec(f"{sb}.attn.norm_k.weight", L2)

        tt = "time_text_embed"
        params: Dict[str, Any] = {"double": double, "single": single}
        for ours, theirs in [
            ("x_embed", "x_embedder"),
            ("ctx_embed", "context_embedder"),
            ("time_w1", f"{tt}.timestep_embedder.linear_1"),
            ("time_w2", f"{tt}.timestep_embedder.linear_2"),
            ("pooled_w1", f"{tt}.text_embedder.linear_1"),
            ("pooled_w2", f"{tt}.text_embedder.linear_2"),
            ("norm_out_w", "norm_out.linear"),
            ("proj_out", "proj_out"),
        ]:
            w, b = lin(theirs)
            bkey = {
                "x_embed": "x_embed_b", "ctx_embed": "ctx_embed_b",
                "time_w1": "time_b1", "time_w2": "time_b2",
                "pooled_w1": "pooled_b1", "pooled_w2": "pooled_b2",
                "norm_out_w": "norm_out_b", "proj_out": "proj_out_b",
            }[ours]
            params[ours] = w
            params[bkey] = b
        if cfg.guidance_embeds:
            for ours, theirs in [
                ("guid_w1", f"{tt}.guidance_embedder.linear_1"),
                ("guid_w2", f"{tt}.guidance_embedder.linear_2"),
            ]:
                w, b = lin(theirs)
                params[ours] = w
                params["guid_b" + ours[-1]] = b

        def cast(x):
            return jnp.asarray(x, dtype)

        return jax.tree.map(cast, params)
