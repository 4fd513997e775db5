"""Qwen-Image DiT (double-stream MMDiT) — functional JAX.

Reference analog: multimodal_gen/runtime/models/dits/qwen_image.py:987
(QwenImageTransformer2DModel: QwenImageTransformerBlock x N with
separate img/txt 6E modulation, joint attention with per-head RMS
qk-norm + QwenEmbedRope, AdaLN-continuous head) and the diffusers
QwenImageTransformer2DModel weight layout. TPU-first like
models/flux.py: stacked-parameter blocks under lax.scan, f32 modulation,
pluggable attention.

Rope (reference qwen_image.py:124-283 QwenEmbedRope, scale_rope=True):
per-axis complex freqs theta^(-2i/dim_ax) over axes (frame, h, w);
image tokens use frame index 0 and CENTERED h/w indices
(row i -> i - (h - h//2)); text tokens use 1D position
max(h//2, w//2) + k on all three axes.
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
from sglang_diffusion_tpu.diffusion.models.flux import _rope_apply
from sglang_diffusion_tpu.diffusion.models.wan import _gelu_tanh, _ln, _rms


@dataclass
class QwenImageConfig:
    """Qwen-Image defaults (diffusers transformer/config.json)."""

    in_channels: int = 64  # packed 2x2 patches of 16 latent channels
    out_channels: int = 16
    num_layers: int = 60
    attention_head_dim: int = 128
    num_attention_heads: int = 24
    joint_attention_dim: int = 3584  # Qwen2.5-VL text features
    axes_dims_rope: Tuple[int, ...] = (16, 56, 56)
    rope_theta: float = 10000.0
    patch_size: int = 2
    eps: float = 1e-6
    mlp_ratio: float = 4.0
    zero_cond_t: bool = False  # txt stream modulated at timestep 0

    @property
    def dim(self) -> int:
        return self.num_attention_heads * self.attention_head_dim

    @property
    def head_dim(self) -> int:
        return self.attention_head_dim

    @property
    def mlp_dim(self) -> int:
        return int(self.dim * self.mlp_ratio)

    @property
    def out_patch_dim(self) -> int:
        return self.patch_size * self.patch_size * self.out_channels


def qwen_rope(grid: Tuple[int, int], t_txt: int, cfg: QwenImageConfig):
    """(cos, sin) [t_txt + gh*gw, head_dim/2] for the [txt; img] stream."""
    gh, gw = grid
    axes = cfg.axes_dims_rope
    assert sum(axes) == cfg.head_dim
    n_img = gh * gw

    def axis_angles(positions, dim_ax):
        k = dim_ax // 2
        freqs = 1.0 / (
            cfg.rope_theta ** (np.arange(k, dtype=np.float64) * 2 / dim_ax))
        return positions[:, None] * freqs[None, :]

    # image: frame 0, centered h/w (scale_rope)
    hs = np.arange(gh) - (gh - gh // 2)
    ws = np.arange(gw) - (gw - gw // 2)
    hh, wwg = np.meshgrid(hs, ws, indexing="ij")
    img = np.concatenate([
        axis_angles(np.zeros(n_img), axes[0]),
        axis_angles(hh.reshape(-1).astype(np.float64), axes[1]),
        axis_angles(wwg.reshape(-1).astype(np.float64), axes[2]),
    ], axis=1)
    # text: 1D positions offset past the image extent, on all axes
    base = max(gh // 2, gw // 2)
    tpos = (base + np.arange(t_txt)).astype(np.float64)
    txt = np.concatenate(
        [axis_angles(tpos, d) for d in axes], axis=1)
    ang = np.concatenate([txt, img], axis=0)
    return (jnp.asarray(np.cos(ang), jnp.float32),
            jnp.asarray(np.sin(ang), jnp.float32))


class QwenImageDiT:
    """Namespace-style functional model (layout mirrors models/flux.py)."""

    @staticmethod
    def init_params(rng: jax.Array, cfg: QwenImageConfig,
                    dtype=jnp.bfloat16):
        E, F = cfg.dim, cfg.mlp_dim
        L, D = cfg.num_layers, cfg.head_dim
        ks = iter(jax.random.split(rng, 48))

        def init(shape, scale_dim=None):
            scale = 1.0 / math.sqrt(
                scale_dim or (shape[-2] if len(shape) > 1 else shape[-1]))
            return (jax.random.normal(next(ks), shape, jnp.float32)
                    * scale).astype(dtype)

        def zeros(shape):
            return jnp.zeros(shape, dtype)

        blocks = {
            "img_mod_w": init((L, E, 6 * E)), "img_mod_b": zeros((L, 6 * E)),
            "txt_mod_w": init((L, E, 6 * E)), "txt_mod_b": zeros((L, 6 * E)),
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
            "img_mlp_w1": init((L, E, F)), "img_mlp_b1": zeros((L, F)),
            "img_mlp_w2": init((L, F, E)), "img_mlp_b2": zeros((L, E)),
            "txt_mlp_w1": init((L, E, F)), "txt_mlp_b1": zeros((L, F)),
            "txt_mlp_w2": init((L, F, E)), "txt_mlp_b2": zeros((L, E)),
        }
        return {
            "img_in": init((cfg.in_channels, E)), "img_in_b": zeros((E,)),
            "txt_norm": jnp.ones((cfg.joint_attention_dim,), dtype),
            "txt_in": init((cfg.joint_attention_dim, E)),
            "txt_in_b": zeros((E,)),
            "time_w1": init((256, E)), "time_b1": zeros((E,)),
            "time_w2": init((E, E)), "time_b2": zeros((E,)),
            "blocks": blocks,
            "norm_out_w": init((E, 2 * E)), "norm_out_b": zeros((2 * E,)),
            "proj_out": init((E, cfg.out_patch_dim)),
            "proj_out_b": zeros((cfg.out_patch_dim,)),
        }

    @staticmethod
    def partition_specs(cfg: QwenImageConfig) -> Dict[str, Any]:
        col = P(None, None, "tp")
        row = P(None, "tp", None)
        colb = P(None, "tp")
        rep2 = P(None, None)
        blocks = {
            "img_mod_w": col, "img_mod_b": colb,
            "txt_mod_w": col, "txt_mod_b": colb,
            "wq": col, "bq": colb, "wk": col, "bk": colb,
            "wv": col, "bv": colb, "q_norm": rep2, "k_norm": rep2,
            "add_wq": col, "add_bq": colb, "add_wk": col, "add_bk": colb,
            "add_wv": col, "add_bv": colb,
            "add_q_norm": rep2, "add_k_norm": rep2,
            "wo": row, "bo": rep2, "add_wo": row, "add_bo": rep2,
            "img_mlp_w1": col, "img_mlp_b1": colb,
            "img_mlp_w2": row, "img_mlp_b2": rep2,
            "txt_mlp_w1": col, "txt_mlp_b1": colb,
            "txt_mlp_w2": row, "txt_mlp_b2": rep2,
        }
        return {
            "img_in": P(None, None), "img_in_b": P(None),
            "txt_norm": P(None),
            "txt_in": P(None, None), "txt_in_b": P(None),
            "time_w1": P(None, None), "time_b1": P(None),
            "time_w2": P(None, None), "time_b2": P(None),
            "blocks": blocks,
            "norm_out_w": P(None, None), "norm_out_b": P(None),
            "proj_out": P(None, None), "proj_out_b": P(None),
        }

    @staticmethod
    def _make_block_body(cfg: QwenImageConfig, attn_fn):
        E, H, D, eps = (cfg.dim, cfg.num_attention_heads, cfg.head_dim,
                        cfg.eps)
        sm_scale = 1.0 / math.sqrt(D)

        def mod6(temb_silu, w, b):
            e = jnp.dot(temb_silu, w.astype(jnp.float32)) + b.astype(
                jnp.float32)
            return [e[:, None, i * E:(i + 1) * E] for i in range(6)]

        def body(x, ctx, bp, temb_img_silu, temb_txt_silu, cos, sin):
            b, t, _ = x.shape
            tc = ctx.shape[1]
            ish1, isc1, ig1, ish2, isc2, ig2 = mod6(
                temb_img_silu, bp["img_mod_w"], bp["img_mod_b"])
            tsh1, tsc1, tg1, tsh2, tsc2, tg2 = mod6(
                temb_txt_silu, bp["txt_mod_w"], bp["txt_mod_b"])

            nx = (_ln(x, eps) * (1 + isc1) + ish1).astype(x.dtype)
            nc = (_ln(ctx, eps) * (1 + tsc1) + tsh1).astype(ctx.dtype)

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

            q = _rope_apply(jnp.concatenate([cq, q], axis=1), cos, sin)
            kj = _rope_apply(jnp.concatenate([ck, k], axis=1), cos, sin)
            vj = jnp.concatenate([cv, v], axis=1)
            attn = attn_fn(q, kj, vj, sm_scale)
            ctx_attn, img_attn = attn[:, :tc], attn[:, tc:]

            o = jnp.dot(img_attn.reshape(b, t, E), bp["wo"]) + bp["bo"]
            x = (x.astype(jnp.float32)
                 + o.astype(jnp.float32) * ig1).astype(x.dtype)
            h = (_ln(x, eps) * (1 + isc2) + ish2).astype(x.dtype)
            ff = jnp.dot(
                _gelu_tanh(jnp.dot(h, bp["img_mlp_w1"]) + bp["img_mlp_b1"]),
                bp["img_mlp_w2"]) + bp["img_mlp_b2"]
            x = (x.astype(jnp.float32)
                 + ff.astype(jnp.float32) * ig2).astype(x.dtype)

            co = jnp.dot(ctx_attn.reshape(b, tc, E), bp["add_wo"]) + bp[
                "add_bo"]
            ctx = (ctx.astype(jnp.float32)
                   + co.astype(jnp.float32) * tg1).astype(ctx.dtype)
            ch = (_ln(ctx, eps) * (1 + tsc2) + tsh2).astype(ctx.dtype)
            cff = jnp.dot(
                _gelu_tanh(jnp.dot(ch, bp["txt_mlp_w1"]) + bp["txt_mlp_b1"]),
                bp["txt_mlp_w2"]) + bp["txt_mlp_b2"]
            ctx = (ctx.astype(jnp.float32)
                   + cff.astype(jnp.float32) * tg2).astype(ctx.dtype)
            return x, ctx

        return body

    @staticmethod
    def _temb(params, timesteps):
        te = timestep_embedding(timesteps, 256)
        h = jax.nn.silu(
            jnp.dot(te, params["time_w1"].astype(jnp.float32))
            + params["time_b1"].astype(jnp.float32))
        return jnp.dot(h, params["time_w2"].astype(jnp.float32)) + params[
            "time_b2"].astype(jnp.float32)

    @staticmethod
    def make_forward(cfg: QwenImageConfig, attn_fn=joint_attention):
        """forward(params, tokens [B,T,in_ch], text_emb [B,Tc,joint_dim],
        timesteps [B], grid (gh,gw)) -> [B,T,out_patch_dim]."""
        block_body = QwenImageDiT._make_block_body(cfg, attn_fn)
        E = cfg.dim

        def forward(params, tokens, text_emb, timesteps, grid):
            b = tokens.shape[0]
            x = jnp.dot(tokens, params["img_in"]) + params["img_in_b"]
            ctx = _rms(text_emb, params["txt_norm"], 1e-6)
            ctx = jnp.dot(ctx, params["txt_in"]) + params["txt_in_b"]
            temb = QwenImageDiT._temb(params, timesteps)
            temb_img = jax.nn.silu(temb)
            if cfg.zero_cond_t:
                temb_txt = jax.nn.silu(
                    QwenImageDiT._temb(params, jnp.zeros_like(timesteps)))
            else:
                temb_txt = temb_img
            cos, sin = qwen_rope(tuple(grid), ctx.shape[1], cfg)

            def dbody(carry, bp):
                x, ctx = carry
                return block_body(x, ctx, bp, temb_img, temb_txt, cos,
                                  sin), None

            (x, ctx), _ = jax.lax.scan(dbody, (x, ctx), params["blocks"])

            e = jnp.dot(temb_img, params["norm_out_w"].astype(jnp.float32)
                        ) + params["norm_out_b"].astype(jnp.float32)
            scale, shift = e[:, None, :E], e[:, None, E:]
            x = (_ln(x, cfg.eps) * (1 + scale) + shift).astype(x.dtype)
            return jnp.dot(x, params["proj_out"]) + params["proj_out_b"]

        return forward

    @staticmethod
    def make_forward_parts(cfg: QwenImageConfig, attn_fn=joint_attention,
                           front_blocks: int = 1):
        """Split forward for Cache-DiT block caching (mirrors
        FluxDiT.make_forward_parts). Carried hidden stream is the joint
        [ctx; img] stream."""
        block_body = QwenImageDiT._make_block_body(cfg, attn_fn)
        E = cfg.dim
        assert 0 < front_blocks < cfg.num_layers

        def _bslice(params, lo, hi):
            return jax.tree.map(lambda a: a[lo:hi], params["blocks"])

        def front(params, tokens, text_emb, timesteps, grid):
            x = jnp.dot(tokens, params["img_in"]) + params["img_in_b"]
            ctx = _rms(text_emb, params["txt_norm"], 1e-6)
            ctx = jnp.dot(ctx, params["txt_in"]) + params["txt_in_b"]
            temb = QwenImageDiT._temb(params, timesteps)
            temb_img = jax.nn.silu(temb)
            if cfg.zero_cond_t:
                temb_txt = jax.nn.silu(
                    QwenImageDiT._temb(params, jnp.zeros_like(timesteps)))
            else:
                temb_txt = temb_img
            cos, sin = qwen_rope(tuple(grid), ctx.shape[1], cfg)
            tc = ctx.shape[1]

            def dbody(carry, bp):
                x, c = carry
                return block_body(x, c, bp, temb_img, temb_txt, cos,
                                  sin), None

            (x, ctx), _ = jax.lax.scan(
                dbody, (x, ctx), _bslice(params, 0, front_blocks))
            meta = {"temb_img": temb_img, "temb_txt": temb_txt,
                    "cos": cos, "sin": sin, "tc": tc}
            return jnp.concatenate([ctx, x], axis=1), meta

        def tail(params, s, meta):
            tc = meta["tc"]
            ctx, x = s[:, :tc], s[:, tc:]

            def dbody(carry, bp):
                x, c = carry
                return block_body(x, c, bp, meta["temb_img"],
                                  meta["temb_txt"], meta["cos"],
                                  meta["sin"]), None

            (x, ctx), _ = jax.lax.scan(
                dbody, (x, ctx),
                _bslice(params, front_blocks, cfg.num_layers))
            return jnp.concatenate([ctx, x], axis=1)

        def head(params, s, meta):
            x = s[:, meta["tc"]:]
            e = jnp.dot(meta["temb_img"],
                        params["norm_out_w"].astype(jnp.float32)
                        ) + params["norm_out_b"].astype(jnp.float32)
            scale, shift = e[:, None, :E], e[:, None, E:]
            x = (_ln(x, cfg.eps) * (1 + scale) + shift).astype(x.dtype)
            return jnp.dot(x, params["proj_out"]) + params["proj_out_b"]

        return front, tail, head

    # ---------------- diffusers checkpoint ingestion ----------------

    @staticmethod
    def config_from_diffusers(d: Dict[str, Any]) -> "QwenImageConfig":
        return QwenImageConfig(
            in_channels=d.get("in_channels", 64),
            out_channels=d.get("out_channels", 16),
            num_layers=d.get("num_layers", 60),
            attention_head_dim=d.get("attention_head_dim", 128),
            num_attention_heads=d.get("num_attention_heads", 24),
            joint_attention_dim=d.get("joint_attention_dim", 3584),
            axes_dims_rope=tuple(d.get("axes_dims_rope", (16, 56, 56))),
            patch_size=d.get("patch_size", 2),
            zero_cond_t=d.get("zero_cond_t", False),
        )

    @staticmethod
    def convert_diffusers_weights(cfg: QwenImageConfig, get,
                                  dtype=jnp.bfloat16):
        L = cfg.num_layers

        def lin(name):
            return (np.asarray(get(f"{name}.weight")).T,
                    np.asarray(get(f"{name}.bias")))

        def stack_lin(tmpl):
            ws, bs = zip(*(lin(tmpl.format(i=i)) for i in range(L)))
            return np.stack(ws), np.stack(bs)

        def stack_vec(tmpl):
            return np.stack(
                [np.asarray(get(tmpl.format(i=i))) for i in range(L)])

        db = "transformer_blocks.{i}"
        blocks = {}
        for wkey, bkey, theirs in [
            ("img_mod_w", "img_mod_b", f"{db}.img_mod.1"),
            ("txt_mod_w", "txt_mod_b", f"{db}.txt_mod.1"),
            ("wq", "bq", f"{db}.attn.to_q"),
            ("wk", "bk", f"{db}.attn.to_k"),
            ("wv", "bv", f"{db}.attn.to_v"),
            ("add_wq", "add_bq", f"{db}.attn.add_q_proj"),
            ("add_wk", "add_bk", f"{db}.attn.add_k_proj"),
            ("add_wv", "add_bv", f"{db}.attn.add_v_proj"),
            ("wo", "bo", f"{db}.attn.to_out.0"),
            ("add_wo", "add_bo", f"{db}.attn.to_add_out"),
            ("img_mlp_w1", "img_mlp_b1", f"{db}.img_mlp.net.0.proj"),
            ("img_mlp_w2", "img_mlp_b2", f"{db}.img_mlp.net.2"),
            ("txt_mlp_w1", "txt_mlp_b1", f"{db}.txt_mlp.net.0.proj"),
            ("txt_mlp_w2", "txt_mlp_b2", f"{db}.txt_mlp.net.2"),
        ]:
            w, b = stack_lin(theirs)
            blocks[wkey] = w
            blocks[bkey] = b
        blocks["q_norm"] = stack_vec(f"{db}.attn.norm_q.weight")
        blocks["k_norm"] = stack_vec(f"{db}.attn.norm_k.weight")
        blocks["add_q_norm"] = stack_vec(f"{db}.attn.norm_added_q.weight")
        blocks["add_k_norm"] = stack_vec(f"{db}.attn.norm_added_k.weight")

        params: Dict[str, Any] = {"blocks": blocks}
        for wkey, bkey, theirs in [
            ("img_in", "img_in_b", "img_in"),
            ("txt_in", "txt_in_b", "txt_in"),
            ("time_w1", "time_b1",
             "time_text_embed.timestep_embedder.linear_1"),
            ("time_w2", "time_b2",
             "time_text_embed.timestep_embedder.linear_2"),
            ("norm_out_w", "norm_out_b", "norm_out.linear"),
            ("proj_out", "proj_out_b", "proj_out"),
        ]:
            w, b = lin(theirs)
            params[wkey] = w
            params[bkey] = b
        params["txt_norm"] = np.asarray(get("txt_norm.weight"))
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), params)
