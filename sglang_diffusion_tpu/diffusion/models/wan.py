"""Wan2.x video DiT (T2V + I2V) — functional JAX, TPU-first.

Reference analog: multimodal_gen/runtime/models/dits/wanvideo.py
(WanTransformer3DModel) and the diffusers WanTransformer3DModel weight
layout. Re-designed for XLA: one stacked-parameter tree scanned over
blocks (compile time is depth-independent), f32 modulation math fused by
XLA, attention pluggable (dense einsum / Pallas flash / Ulysses SP).

Architecture (per reference wanvideo.py:315-530):
  latents [B, F, H, W, C] --patchify (1,2,2)--> tokens [B, T, C*4]
  cond   = time_embedder(sinusoidal t) ; timestep_proj = 6*dim modulation
  text   = MLP(gelu_tanh) of T5 features ; (I2V: CLIP image ctx via
           WanImageEmbedding, prepended to text context, separate k/v proj)
  block: LN(f32, no affine)*mod -> self-attn (RMS qk-norm across heads,
         3D rope, bias linears) -> gated residual -> LN(affine) ->
         cross-attn on text -> residual -> LN(no affine)*mod ->
         gelu_tanh FFN -> gated residual
  head:  LN(no affine) * (scale_shift_table + temb) -> proj_out -> unpatchify
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.diffusion.models.dit import (
    joint_attention,
    timestep_embedding,
)


@dataclass
class WanConfig:
    """Wan2.1-T2V-1.3B defaults (diffusers transformer/config.json)."""

    dim: int = 1536
    ffn_dim: int = 8960
    num_heads: int = 12
    num_layers: int = 30
    in_channels: int = 16
    out_channels: int = 16
    patch_size: Tuple[int, int, int] = (1, 2, 2)
    text_dim: int = 4096  # UMT5-XXL features
    freq_dim: int = 256
    eps: float = 1e-6
    rope_theta: float = 10000.0
    image_embed_dim: Optional[int] = None  # I2V: CLIP ctx dim (1280)
    rope_max_seq_len: int = 1024

    @property
    def head_dim(self) -> int:
        return self.dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        pt, ph, pw = self.patch_size
        return self.in_channels * pt * ph * pw

    @property
    def out_patch_dim(self) -> int:
        pt, ph, pw = self.patch_size
        return self.out_channels * pt * ph * pw


def wan_rope_3d(grid: Tuple[int, int, int], head_dim: int, theta: float):
    """3D rope tables for the (frames, h, w) patch grid.

    Per diffusers WanRotaryPosEmbed: rotation dims split
    [t: d-4*(d//6), h: 2*(d//6), w: 2*(d//6)]; per-axis inverse
    frequencies theta^(-2i/dim_ax); pairs rotated interleaved
    (view-as-complex). Returns (cos, sin) [T, head_dim/2] f32.
    """
    d = head_dim
    h_dim = w_dim = 2 * (d // 6)
    t_dim = d - h_dim - w_dim
    f, gh, gw = grid
    coords = np.meshgrid(
        np.arange(f), np.arange(gh), np.arange(gw), indexing="ij"
    )
    parts = []
    for ax, dim_ax in enumerate((t_dim, h_dim, w_dim)):
        k = dim_ax // 2
        freqs = 1.0 / (theta ** (np.arange(k, dtype=np.float64) * 2 / dim_ax))
        parts.append(coords[ax].reshape(-1)[:, None] * freqs[None, :])
    ang = np.concatenate(parts, axis=1)  # [T, d/2]
    return (
        jnp.asarray(np.cos(ang), jnp.float32),
        jnp.asarray(np.sin(ang), jnp.float32),
    )


def _rope_pairs(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x [B, T, H, D]; interleaved-pair rotation, f32 math."""
    b, t, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(b, t, h, d).astype(x.dtype)


def _ln(x: jax.Array, eps: float) -> jax.Array:
    """LayerNorm without affine, f32 accumulation (FP32LayerNorm)."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return (xf - mu) * jax.lax.rsqrt(var + eps)


def _rms(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    nrm = xf * jax.lax.rsqrt(
        jnp.mean(jnp.square(xf), axis=-1, keepdims=True) + eps
    )
    return (nrm * w.astype(jnp.float32)).astype(x.dtype)


def _gelu_tanh(x: jax.Array) -> jax.Array:
    return jax.nn.gelu(x, approximate=True)


class WanDiT:
    """Namespace-style functional model (layout mirrors models/dit.py)."""

    @staticmethod
    def init_params(rng: jax.Array, cfg: WanConfig, dtype=jnp.bfloat16):
        E, F, L = cfg.dim, cfg.ffn_dim, cfg.num_layers
        ks = iter(jax.random.split(rng, 48))

        def init(shape, scale_dim=None):
            scale = 1.0 / math.sqrt(scale_dim or shape[-2] if len(shape) > 1
                                    else shape[-1])
            return (
                jax.random.normal(next(ks), shape, jnp.float32) * scale
            ).astype(dtype)

        def zeros(shape):
            return jnp.zeros(shape, dtype)

        blocks = {
            # self-attention
            "wq": init((L, E, E)), "bq": zeros((L, E)),
            "wk": init((L, E, E)), "bk": zeros((L, E)),
            "wv": init((L, E, E)), "bv": zeros((L, E)),
            "wo": init((L, E, E)), "bo": zeros((L, E)),
            "q_norm": jnp.ones((L, E), dtype),
            "k_norm": jnp.ones((L, E), dtype),
            # norm2 (affine LN before cross-attn)
            "norm2_g": jnp.ones((L, E), dtype),
            "norm2_b": zeros((L, E)),
            # cross-attention
            "xwq": init((L, E, E)), "xbq": zeros((L, E)),
            "xwk": init((L, E, E)), "xbk": zeros((L, E)),
            "xwv": init((L, E, E)), "xbv": zeros((L, E)),
            "xwo": init((L, E, E)), "xbo": zeros((L, E)),
            "xq_norm": jnp.ones((L, E), dtype),
            "xk_norm": jnp.ones((L, E), dtype),
            # FFN (gelu_tanh)
            "w1": init((L, E, F)), "b1": zeros((L, F)),
            "w2": init((L, F, E)), "b2": zeros((L, E)),
            # per-block modulation table [L, 6, E]
            "scale_shift_table": (
                jax.random.normal(next(ks), (L, 6, E), jnp.float32)
                / math.sqrt(E)
            ).astype(jnp.float32),
        }
        if cfg.image_embed_dim is not None:
            blocks.update({
                "add_wk": init((L, E, E)), "add_bk": zeros((L, E)),
                "add_wv": init((L, E, E)), "add_bv": zeros((L, E)),
                "add_k_norm": jnp.ones((L, E), dtype),
            })
        params: Dict[str, Any] = {
            "patch_embed": init((cfg.patch_dim, E)),
            "patch_embed_b": zeros((E,)),
            "time_w1": init((cfg.freq_dim, E)), "time_b1": zeros((E,)),
            "time_w2": init((E, E)), "time_b2": zeros((E,)),
            "time_proj_w": init((E, 6 * E)), "time_proj_b": zeros((6 * E,)),
            "text_w1": init((cfg.text_dim, E)), "text_b1": zeros((E,)),
            "text_w2": init((E, E)), "text_b2": zeros((E,)),
            "blocks": blocks,
            "head_table": (
                jax.random.normal(next(ks), (2, E), jnp.float32)
                / math.sqrt(E)
            ).astype(jnp.float32),
            "proj_out": init((E, cfg.out_patch_dim)),
            "proj_out_b": zeros((cfg.out_patch_dim,)),
        }
        if cfg.image_embed_dim is not None:
            I = cfg.image_embed_dim
            params.update({
                "img_norm1_g": jnp.ones((I,), dtype),
                "img_norm1_b": zeros((I,)),
                "img_ff_w1": init((I, I)), "img_ff_b1": zeros((I,)),
                "img_ff_w2": init((I, E)), "img_ff_b2": zeros((E,)),
                "img_norm2_g": jnp.ones((E,), dtype),
                "img_norm2_b": zeros((E,)),
            })
        return params

    @staticmethod
    def partition_specs(cfg: WanConfig) -> Dict[str, Any]:
        """TP sharding: attention/FFN column-sharded in, row-sharded out
        (the adaLN tables and norms replicate)."""
        col = P(None, None, "tp")
        row = P(None, "tp", None)
        colb = P(None, "tp")
        rep2 = P(None, None)
        blocks = {
            "wq": col, "bq": colb, "wk": col, "bk": colb,
            "wv": col, "bv": colb, "wo": row, "bo": rep2,
            "q_norm": rep2, "k_norm": rep2,
            "norm2_g": rep2, "norm2_b": rep2,
            "xwq": col, "xbq": colb, "xwk": col, "xbk": colb,
            "xwv": col, "xbv": colb, "xwo": row, "xbo": rep2,
            "xq_norm": rep2, "xk_norm": rep2,
            "w1": col, "b1": colb, "w2": row, "b2": rep2,
            "scale_shift_table": P(None, None, None),
        }
        if cfg.image_embed_dim is not None:
            blocks.update({
                "add_wk": col, "add_bk": colb,
                "add_wv": col, "add_bv": colb, "add_k_norm": rep2,
            })
        specs: Dict[str, Any] = {
            "patch_embed": P(None, None), "patch_embed_b": P(None),
            "time_w1": P(None, None), "time_b1": P(None),
            "time_w2": P(None, None), "time_b2": P(None),
            "time_proj_w": P(None, None), "time_proj_b": P(None),
            "text_w1": P(None, None), "text_b1": P(None),
            "text_w2": P(None, None), "text_b2": P(None),
            "blocks": blocks,
            "head_table": P(None, None),
            "proj_out": P(None, None), "proj_out_b": P(None),
        }
        if cfg.image_embed_dim is not None:
            specs.update({
                "img_norm1_g": P(None), "img_norm1_b": P(None),
                "img_ff_w1": P(None, None), "img_ff_b1": P(None),
                "img_ff_w2": P(None, None), "img_ff_b2": P(None),
                "img_norm2_g": P(None), "img_norm2_b": P(None),
            })
        return specs

    @staticmethod
    def _make_block_body(cfg: WanConfig, attn_fn, cross_attn_fn,
                         n_img_ctx: int = 0):
        """n_img_ctx: number of leading image-context tokens in ctx (I2V;
        257 for CLIP-penultimate in real checkpoints — static per trace)."""
        E, H, D, eps = cfg.dim, cfg.num_heads, cfg.head_dim, cfg.eps
        sm_scale = 1.0 / math.sqrt(D)

        def block_body(x, bp, temb6, ctx, cos, sin):
            # x [B,T,E]; temb6 [B,6,E] f32; ctx [B,Tc,E]
            b, t, _ = x.shape
            e = bp["scale_shift_table"][None] + temb6  # [B,6,E] f32
            sh1, sc1, g1, sh2, sc2, g2 = [
                e[:, i][:, None] for i in range(6)
            ]  # each [B,1,E]

            # 1. self-attention
            h = (_ln(x, eps) * (1 + sc1) + sh1).astype(x.dtype)
            q = _rms(jnp.dot(h, bp["wq"]) + bp["bq"], bp["q_norm"], eps)
            k = _rms(jnp.dot(h, bp["wk"]) + bp["bk"], bp["k_norm"], eps)
            v = jnp.dot(h, bp["wv"]) + bp["bv"]
            q = _rope_pairs(q.reshape(b, t, H, D), cos, sin)
            k = _rope_pairs(k.reshape(b, t, H, D), cos, sin)
            attn = attn_fn(q, k, v.reshape(b, t, H, D), sm_scale)
            attn = jnp.dot(attn.reshape(b, t, E), bp["wo"]) + bp["bo"]
            x = (x.astype(jnp.float32)
                 + attn.astype(jnp.float32) * g1).astype(x.dtype)

            # 2. cross-attention on text (I2V: + image ctx stream)
            h = (_ln(x, eps) * bp["norm2_g"].astype(jnp.float32)
                 + bp["norm2_b"].astype(jnp.float32)).astype(x.dtype)
            xq = _rms(jnp.dot(h, bp["xwq"]) + bp["xbq"], bp["xq_norm"], eps)
            xq = xq.reshape(b, t, H, D)
            if n_img_ctx:
                ctx_img, ctx_txt = ctx[:, :n_img_ctx], ctx[:, n_img_ctx:]
            else:
                ctx_txt = ctx
            tc = ctx_txt.shape[1]
            xk = _rms(jnp.dot(ctx_txt, bp["xwk"]) + bp["xbk"],
                      bp["xk_norm"], eps).reshape(b, tc, H, D)
            xv = (jnp.dot(ctx_txt, bp["xwv"]) + bp["xbv"]).reshape(
                b, tc, H, D)
            attn = cross_attn_fn(xq, xk, xv, sm_scale)
            if n_img_ctx:
                ik = _rms(jnp.dot(ctx_img, bp["add_wk"]) + bp["add_bk"],
                          bp["add_k_norm"], eps).reshape(b, n_img_ctx, H, D)
                iv = (jnp.dot(ctx_img, bp["add_wv"]) + bp["add_bv"]).reshape(
                    b, n_img_ctx, H, D)
                attn = attn + cross_attn_fn(xq, ik, iv, sm_scale)
            attn = jnp.dot(attn.reshape(b, t, E), bp["xwo"]) + bp["xbo"]
            x = (x.astype(jnp.float32) + attn.astype(jnp.float32)).astype(
                x.dtype)

            # 3. FFN
            h = (_ln(x, eps) * (1 + sc2) + sh2).astype(x.dtype)
            h = jnp.dot(_gelu_tanh(jnp.dot(h, bp["w1"]) + bp["b1"]),
                        bp["w2"]) + bp["b2"]
            x = (x.astype(jnp.float32)
                 + h.astype(jnp.float32) * g2).astype(x.dtype)
            return x

        return block_body

    @staticmethod
    def embed_conditioning(params, cfg: WanConfig, timesteps, text_emb,
                           image_emb=None):
        """(temb [B,E] f32, temb6 [B,6,E] f32, ctx [B,Tc,E])."""
        te = timestep_embedding(timesteps, cfg.freq_dim)
        h = jnp.dot(te, params["time_w1"].astype(jnp.float32))
        h = jax.nn.silu(h + params["time_b1"].astype(jnp.float32))
        temb = jnp.dot(h, params["time_w2"].astype(jnp.float32)) + params[
            "time_b2"].astype(jnp.float32)
        proj = jnp.dot(jax.nn.silu(temb),
                       params["time_proj_w"].astype(jnp.float32)) + params[
            "time_proj_b"].astype(jnp.float32)
        temb6 = proj.reshape(proj.shape[0], 6, cfg.dim)

        ctx = jnp.dot(text_emb, params["text_w1"]) + params["text_b1"]
        ctx = jnp.dot(_gelu_tanh(ctx), params["text_w2"]) + params["text_b2"]
        if image_emb is not None:
            ih = _ln(image_emb, cfg.eps) * params["img_norm1_g"].astype(
                jnp.float32) + params["img_norm1_b"].astype(jnp.float32)
            ih = ih.astype(image_emb.dtype)
            ih = jnp.dot(jax.nn.gelu(
                jnp.dot(ih, params["img_ff_w1"]) + params["img_ff_b1"]),
                params["img_ff_w2"]) + params["img_ff_b2"]
            ih = (_ln(ih, cfg.eps) * params["img_norm2_g"].astype(jnp.float32)
                  + params["img_norm2_b"].astype(jnp.float32)).astype(
                ctx.dtype)
            ctx = jnp.concatenate([ih, ctx], axis=1)
        return temb, temb6, ctx

    @staticmethod
    def make_forward(cfg: WanConfig, attn_fn=joint_attention,
                     cross_attn_fn=None):
        """forward(params, tokens [B,T,patch_dim], text_emb [B,Tc,text_dim],
        timesteps [B], grid (f, gh, gw), image_emb=None) -> [B,T,out_patch].
        Tokens come from patchify_video(latents, p) with the Wan (1,2,2)
        spatial patch."""
        cross_attn_fn = cross_attn_fn or joint_attention

        def forward(params, tokens, text_emb, timesteps, grid,
                    image_emb=None):
            block_body = WanDiT._make_block_body(
                cfg, attn_fn, cross_attn_fn,
                n_img_ctx=0 if image_emb is None else image_emb.shape[1])
            x = jnp.dot(tokens, params["patch_embed"]) + params[
                "patch_embed_b"]
            temb, temb6, ctx = WanDiT.embed_conditioning(
                params, cfg, timesteps, text_emb, image_emb)
            cos, sin = wan_rope_3d(tuple(grid), cfg.head_dim, cfg.rope_theta)

            def body(c, bp):
                return block_body(c, bp, temb6, ctx, cos, sin), None

            x, _ = jax.lax.scan(body, x, params["blocks"])

            # head: LN * (table + temb), proj_out
            e = params["head_table"][None] + temb[:, None]  # [B,2,E]
            shift, scale = e[:, 0][:, None], e[:, 1][:, None]
            x = (_ln(x, cfg.eps) * (1 + scale) + shift).astype(x.dtype)
            return jnp.dot(x, params["proj_out"]) + params["proj_out_b"]

        return forward

    @staticmethod
    def make_forward_parts(cfg: WanConfig, attn_fn=joint_attention,
                           front_blocks: int = 1, cross_attn_fn=None):
        """Split forward for Cache-DiT block caching (mirrors
        MMDiT.make_forward_parts; the hidden stream is video tokens only —
        text enters via cross-attention)."""
        cross_attn_fn = cross_attn_fn or joint_attention
        block_body = WanDiT._make_block_body(cfg, attn_fn, cross_attn_fn)
        assert 0 < front_blocks < cfg.num_layers

        def _slice(params, lo, hi):
            return jax.tree.map(lambda a: a[lo:hi], params["blocks"])

        def front(params, tokens, text_emb, timesteps, grid):
            x = jnp.dot(tokens, params["patch_embed"]) + params[
                "patch_embed_b"]
            temb, temb6, ctx_t = WanDiT.embed_conditioning(
                params, cfg, timesteps, text_emb)
            cos, sin = wan_rope_3d(tuple(grid), cfg.head_dim, cfg.rope_theta)
            ctx = {"temb": temb, "temb6": temb6, "ctx": ctx_t,
                   "cos": cos, "sin": sin}
            bp = _slice(params, 0, front_blocks)
            x, _ = jax.lax.scan(
                lambda c, b: (block_body(c, b, temb6, ctx_t, cos, sin),
                              None), x, bp)
            return x, ctx

        def tail(params, x, ctx):
            bp = _slice(params, front_blocks, cfg.num_layers)
            x, _ = jax.lax.scan(
                lambda c, b: (block_body(c, b, ctx["temb6"], ctx["ctx"],
                                         ctx["cos"], ctx["sin"]), None),
                x, bp)
            return x

        def head(params, x, ctx):
            e = params["head_table"][None] + ctx["temb"][:, None]
            shift, scale = e[:, 0][:, None], e[:, 1][:, None]
            x = (_ln(x, cfg.eps) * (1 + scale) + shift).astype(x.dtype)
            return jnp.dot(x, params["proj_out"]) + params["proj_out_b"]

        return front, tail, head

    # ---------------- diffusers checkpoint ingestion ----------------

    @staticmethod
    def config_from_diffusers(d: Dict[str, Any]) -> "WanConfig":
        """diffusers transformer/config.json -> WanConfig."""
        return WanConfig(
            dim=d.get("num_attention_heads", 12) * d.get(
                "attention_head_dim", 128),
            ffn_dim=d.get("ffn_dim", 8960),
            num_heads=d.get("num_attention_heads", 12),
            num_layers=d.get("num_layers", 30),
            in_channels=d.get("in_channels", 16),
            out_channels=d.get("out_channels", 16),
            patch_size=tuple(d.get("patch_size", (1, 2, 2))),
            text_dim=d.get("text_dim", 4096),
            freq_dim=d.get("freq_dim", 256),
            eps=d.get("eps", 1e-6),
            image_embed_dim=d.get("image_dim"),
            rope_max_seq_len=d.get("rope_max_seq_len", 1024),
        )

    @staticmethod
    def convert_diffusers_weights(cfg: WanConfig, get, dtype=jnp.bfloat16):
        """Build our param tree from a diffusers WanTransformer3DModel
        state dict. `get(name) -> np.ndarray` fetches one tensor
        (works for sharded safetensors without loading everything).

        Linear weights transpose [out,in]->[in,out]; the Conv3d patch
        embedding [E, C, pt, ph, pw] flattens to [C*pt*ph*pw, E] matching
        patchify_video's (c, pt, ph, pw) token layout."""
        L = cfg.num_layers

        def lin(name):
            return np.ascontiguousarray(np.asarray(get(name)).T)

        def vec(name):
            return np.asarray(get(name))

        def stack(fn, tmpl):
            return np.stack([fn(tmpl.format(i=i)) for i in range(L)])

        pe = np.asarray(get("patch_embedding.weight"))  # [E,C,pt,ph,pw]
        e = pe.shape[0]
        # token layout from patchify_video: (ph, pw, c) fastest-last for
        # patch (1,p,p) -> reorder conv kernel to [ph*pw*C, E]
        pe = pe.transpose(3, 4, 1, 2, 0).reshape(-1, e)

        blocks = {
            "wq": stack(lin, "blocks.{i}.attn1.to_q.weight"),
            "bq": stack(vec, "blocks.{i}.attn1.to_q.bias"),
            "wk": stack(lin, "blocks.{i}.attn1.to_k.weight"),
            "bk": stack(vec, "blocks.{i}.attn1.to_k.bias"),
            "wv": stack(lin, "blocks.{i}.attn1.to_v.weight"),
            "bv": stack(vec, "blocks.{i}.attn1.to_v.bias"),
            "wo": stack(lin, "blocks.{i}.attn1.to_out.0.weight"),
            "bo": stack(vec, "blocks.{i}.attn1.to_out.0.bias"),
            "q_norm": stack(vec, "blocks.{i}.attn1.norm_q.weight"),
            "k_norm": stack(vec, "blocks.{i}.attn1.norm_k.weight"),
            "norm2_g": stack(vec, "blocks.{i}.norm2.weight"),
            "norm2_b": stack(vec, "blocks.{i}.norm2.bias"),
            "xwq": stack(lin, "blocks.{i}.attn2.to_q.weight"),
            "xbq": stack(vec, "blocks.{i}.attn2.to_q.bias"),
            "xwk": stack(lin, "blocks.{i}.attn2.to_k.weight"),
            "xbk": stack(vec, "blocks.{i}.attn2.to_k.bias"),
            "xwv": stack(lin, "blocks.{i}.attn2.to_v.weight"),
            "xbv": stack(vec, "blocks.{i}.attn2.to_v.bias"),
            "xwo": stack(lin, "blocks.{i}.attn2.to_out.0.weight"),
            "xbo": stack(vec, "blocks.{i}.attn2.to_out.0.bias"),
            "xq_norm": stack(vec, "blocks.{i}.attn2.norm_q.weight"),
            "xk_norm": stack(vec, "blocks.{i}.attn2.norm_k.weight"),
            "w1": stack(lin, "blocks.{i}.ffn.net.0.proj.weight"),
            "b1": stack(vec, "blocks.{i}.ffn.net.0.proj.bias"),
            "w2": stack(lin, "blocks.{i}.ffn.net.2.weight"),
            "b2": stack(vec, "blocks.{i}.ffn.net.2.bias"),
            "scale_shift_table": stack(
                lambda n: np.asarray(get(n)).reshape(6, -1),
                "blocks.{i}.scale_shift_table"),
        }
        if cfg.image_embed_dim is not None:
            blocks.update({
                "add_wk": stack(lin, "blocks.{i}.attn2.add_k_proj.weight"),
                "add_bk": stack(vec, "blocks.{i}.attn2.add_k_proj.bias"),
                "add_wv": stack(lin, "blocks.{i}.attn2.add_v_proj.weight"),
                "add_bv": stack(vec, "blocks.{i}.attn2.add_v_proj.bias"),
                "add_k_norm": stack(
                    vec, "blocks.{i}.attn2.norm_added_k.weight"),
            })
        params = {
            "patch_embed": pe,
            "patch_embed_b": vec("patch_embedding.bias"),
            "time_w1": lin("condition_embedder.time_embedder.linear_1.weight"),
            "time_b1": vec("condition_embedder.time_embedder.linear_1.bias"),
            "time_w2": lin("condition_embedder.time_embedder.linear_2.weight"),
            "time_b2": vec("condition_embedder.time_embedder.linear_2.bias"),
            "time_proj_w": lin("condition_embedder.time_proj.weight"),
            "time_proj_b": vec("condition_embedder.time_proj.bias"),
            "text_w1": lin("condition_embedder.text_embedder.linear_1.weight"),
            "text_b1": vec("condition_embedder.text_embedder.linear_1.bias"),
            "text_w2": lin("condition_embedder.text_embedder.linear_2.weight"),
            "text_b2": vec("condition_embedder.text_embedder.linear_2.bias"),
            "blocks": blocks,
            "head_table": np.asarray(get("scale_shift_table")).reshape(2, -1),
            "proj_out": lin("proj_out.weight"),
            "proj_out_b": vec("proj_out.bias"),
        }
        if cfg.image_embed_dim is not None:
            params.update({
                "img_norm1_g": vec(
                    "condition_embedder.image_embedder.norm1.weight"),
                "img_norm1_b": vec(
                    "condition_embedder.image_embedder.norm1.bias"),
                "img_ff_w1": lin(
                    "condition_embedder.image_embedder.ff.net.0.proj.weight"),
                "img_ff_b1": vec(
                    "condition_embedder.image_embedder.ff.net.0.proj.bias"),
                "img_ff_w2": lin(
                    "condition_embedder.image_embedder.ff.net.2.weight"),
                "img_ff_b2": vec(
                    "condition_embedder.image_embedder.ff.net.2.bias"),
                "img_norm2_g": vec(
                    "condition_embedder.image_embedder.norm2.weight"),
                "img_norm2_b": vec(
                    "condition_embedder.image_embedder.norm2.bias"),
            })

        def cast(x):
            x = np.asarray(x)
            if x.dtype in (np.float16, np.float32, np.float64):
                return jnp.asarray(x, dtype)
            return jnp.asarray(x)

        # modulation tables stay f32 (the reference computes them in f32)
        f32_keys = {"scale_shift_table", "head_table"}
        out: Dict[str, Any] = {}
        for k, v in params.items():
            if k == "blocks":
                out["blocks"] = {
                    bk: (jnp.asarray(np.asarray(bv), jnp.float32)
                         if bk in f32_keys else cast(bv))
                    for bk, bv in v.items()
                }
            elif k in f32_keys:
                out[k] = jnp.asarray(np.asarray(v), jnp.float32)
            else:
                out[k] = cast(v)
        return out
