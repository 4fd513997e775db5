"""HunyuanVideo DiT (HunyuanVideoTransformer3DModel).

Reference behavior: multimodal_gen/runtime/models/dits/hunyuanvideo.py:413
— Flux-lineage double-stream + single-stream MMDiT over video latents:

- conditioning vec = t_embed(t) + vector_in(pooled_text) +
  guidance_in(guidance*1000) (distilled CFG),
- text tokens pass through a 2-block SingleTokenRefiner (its own
  modulation from t + mean-pooled text),
- image/video tokens: Conv3d-style (pt, p, p) patchify -> linear,
- double blocks: separate img/txt streams, 6-way modulation
  (shift/scale/gate for attn + mlp), LayerNorm (not RMS) pre-norms,
  fused qkv with bias, per-head RMS qk-norm (eps 1e-6), 3-axis
  INTERLEAVED rotary applied to IMAGE q/k only, joint attention over
  [img; txt], gelu-tanh MLPs,
- single blocks: fused linear1 [3E + mlp] / linear2 [E + mlp], 3-way
  modulation, stream layout [img; txt] with txt last,
- final layer: (scale, shift) modulation (note the swapped order) +
  linear to (pt*p*p*C).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class HunyuanVideoConfig:
    hidden_size: int = 3072
    num_attention_heads: int = 24
    num_layers: int = 20  # double blocks
    num_single_layers: int = 40
    num_refiner_layers: int = 2
    mlp_ratio: float = 4.0
    in_channels: int = 16
    out_channels: int = 16
    patch_size: int = 2
    patch_size_t: int = 1
    text_embed_dim: int = 4096
    pooled_projection_dim: int = 768
    rope_axes_dim: Tuple[int, int, int] = (16, 56, 56)
    rope_theta: float = 256.0
    guidance_embeds: bool = True

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def mlp_dim(self) -> int:
        return int(self.hidden_size * self.mlp_ratio)


def _ln(x, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _rms(x, w, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)).astype(
        x.dtype)


def _sinusoid(t, dim=256, max_period=10000.0):
    half = dim // 2
    freqs = jnp.exp(-np.log(max_period)
                    * jnp.arange(half, dtype=jnp.float32) / half)
    ang = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(ang), jnp.sin(ang)], axis=-1)


def rope_cos_sin_3d(grid: Tuple[int, int, int], cfg: HunyuanVideoConfig):
    """(tt, th, tw) -> (cos, sin) [T, head_dim//2] over the 3 axes
    (hunyuanvideo get_rotary_pos_embed; interleaved application)."""
    tt, th, tw = grid
    ids = np.stack(np.meshgrid(
        np.arange(tt), np.arange(th), np.arange(tw), indexing="ij"),
        -1).reshape(-1, 3)
    outs_c, outs_s = [], []
    for ax, d in enumerate(cfg.rope_axes_dim):
        freqs = 1.0 / cfg.rope_theta ** (np.arange(0, d, 2) / d)
        ang = np.outer(ids[:, ax].astype(np.float64), freqs)
        outs_c.append(np.cos(ang))
        outs_s.append(np.sin(ang))
    return (np.concatenate(outs_c, -1).astype(np.float32),
            np.concatenate(outs_s, -1).astype(np.float32))


def _rope_interleaved(x, cos, sin):
    x0 = x[..., 0::2].astype(jnp.float32)
    x1 = x[..., 1::2].astype(jnp.float32)
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x0 * c - x1 * s, x1 * c + x0 * s], axis=-1)
    return out.reshape(x.shape).astype(x.dtype)


def _attn_joint(q, k, v, heads, d):
    b, t = q.shape[0], q.shape[1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) / np.sqrt(d)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
    return o.reshape(b, t, heads * d).astype(v.dtype)


class HunyuanVideoDiT:
    @staticmethod
    def init_params(rng: jax.Array, cfg: HunyuanVideoConfig,
                    dtype=jnp.float32):
        E, M = cfg.hidden_size, cfg.mlp_dim
        D = cfg.head_dim
        pc = cfg.patch_size_t * cfg.patch_size ** 2 * cfg.in_channels
        n_keys = 48 + 24 * (cfg.num_layers + cfg.num_single_layers
                            + cfg.num_refiner_layers)
        keys = iter(jax.random.split(rng, n_keys))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        def lin(i, o):
            return {"w": init((i, o)), "b": jnp.zeros((o,), dtype)}

        def double_block():
            return {
                "img_mod": lin(E, 6 * E), "txt_mod": lin(E, 6 * E),
                "img_qkv": lin(E, 3 * E), "txt_qkv": lin(E, 3 * E),
                "img_q_norm": jnp.ones((D,), dtype),
                "img_k_norm": jnp.ones((D,), dtype),
                "txt_q_norm": jnp.ones((D,), dtype),
                "txt_k_norm": jnp.ones((D,), dtype),
                "img_proj": lin(E, E), "txt_proj": lin(E, E),
                "img_fc1": lin(E, M), "img_fc2": lin(M, E),
                "txt_fc1": lin(E, M), "txt_fc2": lin(M, E),
            }

        def single_block():
            return {
                "mod": lin(E, 3 * E),
                "linear1": lin(E, 3 * E + M),
                "linear2": lin(E + M, E),
                "q_norm": jnp.ones((D,), dtype),
                "k_norm": jnp.ones((D,), dtype),
            }

        def refiner_block():
            return {
                "norm1_w": jnp.ones((E,), dtype),
                "norm1_b": jnp.zeros((E,), dtype),
                "norm2_w": jnp.ones((E,), dtype),
                "norm2_b": jnp.zeros((E,), dtype),
                "qkv": lin(E, 3 * E), "proj": lin(E, E),
                "fc1": lin(E, M), "fc2": lin(M, E),
                "mod": lin(E, 2 * E),
            }

        def stack(blocks):
            return jax.tree.map(lambda *xs: jnp.stack(xs), *blocks)

        p = {
            "img_in": lin(pc, E),
            "time_w1": lin(256, E), "time_w2": lin(E, E),
            "vector_w1": lin(cfg.pooled_projection_dim, E),
            "vector_w2": lin(E, E),
            "txt_in_input": lin(cfg.text_embed_dim, E),
            "txt_in_t_w1": lin(256, E), "txt_in_t_w2": lin(E, E),
            "txt_in_c_w1": lin(cfg.text_embed_dim, E),
            "txt_in_c_w2": lin(E, E),
            "refiner": stack([refiner_block()
                              for _ in range(cfg.num_refiner_layers)]),
            "double": stack([double_block()
                             for _ in range(cfg.num_layers)]),
            "single": stack([single_block()
                             for _ in range(cfg.num_single_layers)]),
            "final_mod": lin(E, 2 * E),
            "final_linear": lin(E, cfg.patch_size_t * cfg.patch_size ** 2
                                * cfg.out_channels),
        }
        if cfg.guidance_embeds:
            p["guidance_w1"] = lin(256, E)
            p["guidance_w2"] = lin(E, E)
        return p

    @staticmethod
    def make_forward(cfg: HunyuanVideoConfig, guidance: float = 6.0):
        E, M, D = cfg.hidden_size, cfg.mlp_dim, cfg.head_dim
        H = cfg.num_attention_heads
        ps, pt = cfg.patch_size, cfg.patch_size_t
        gelu = lambda x: jax.nn.gelu(x, approximate=True)  # noqa: E731

        def ap(l, x):
            return jnp.dot(x, l["w"]) + l["b"]

        def mlp2(w1, w2, x, act):
            return ap(w2, act(ap(w1, x)))

        def t_embed(w1, w2, t):
            return ap(w2, jax.nn.silu(ap(w1, _sinusoid(t))))

        def double_body(bp, img, txt, vec, cos, sin):
            vecs = jax.nn.silu(vec)
            imod = ap(bp["img_mod"], vecs)[:, None]
            tmod = ap(bp["txt_mod"], vecs)[:, None]
            i_sh, i_sc, i_g, i_msh, i_msc, i_mg = jnp.split(imod, 6, -1)
            t_sh, t_sc, t_g, t_msh, t_msc, t_mg = jnp.split(tmod, 6, -1)
            b, ti = img.shape[0], img.shape[1]
            tt = txt.shape[1]

            qkv = ap(bp["img_qkv"], _ln(img) * (1 + i_sc) + i_sh)
            qkv = qkv.reshape(b, ti, 3, H, D)
            iq = _rms(qkv[:, :, 0], bp["img_q_norm"])
            ik = _rms(qkv[:, :, 1], bp["img_k_norm"])
            iv = qkv[:, :, 2]
            iq = _rope_interleaved(iq, cos, sin)
            ik = _rope_interleaved(ik, cos, sin)

            tqkv = ap(bp["txt_qkv"], _ln(txt) * (1 + t_sc) + t_sh)
            tqkv = tqkv.reshape(b, tt, 3, H, D)
            tq = _rms(tqkv[:, :, 0], bp["txt_q_norm"])
            tk = _rms(tqkv[:, :, 1], bp["txt_k_norm"])
            tv = tqkv[:, :, 2]

            q = jnp.concatenate([iq, tq], axis=1)
            k = jnp.concatenate([ik, tk], axis=1)
            v = jnp.concatenate([iv, tv], axis=1)
            o = _attn_joint(q, k, v, H, D)
            io, to = o[:, :ti], o[:, ti:]
            img = img + i_g * ap(bp["img_proj"], io)
            txt = txt + t_g * ap(bp["txt_proj"], to)
            img = img + i_mg * mlp2(
                bp["img_fc1"], bp["img_fc2"],
                _ln(img) * (1 + i_msc) + i_msh, gelu)
            txt = txt + t_mg * mlp2(
                bp["txt_fc1"], bp["txt_fc2"],
                _ln(txt) * (1 + t_msc) + t_msh, gelu)
            return img, txt

        def single_body(bp, x, vec, txt_len, cos, sin):
            vecs = jax.nn.silu(vec)
            sh, sc, g = jnp.split(ap(bp["mod"], vecs)[:, None], 3, -1)
            b, t = x.shape[0], x.shape[1]
            xm = _ln(x) * (1 + sc) + sh
            l1 = ap(bp["linear1"], xm)
            qkv, mlp = l1[..., :3 * E], l1[..., 3 * E:]
            qkv = qkv.reshape(b, t, 3, H, D)
            q = _rms(qkv[:, :, 0], bp["q_norm"])
            k = _rms(qkv[:, :, 1], bp["k_norm"])
            v = qkv[:, :, 2]
            ti = t - txt_len
            iq, tq = q[:, :ti], q[:, ti:]
            ik, tk = k[:, :ti], k[:, ti:]
            iq = _rope_interleaved(iq, cos, sin)
            ik = _rope_interleaved(ik, cos, sin)
            q = jnp.concatenate([iq, tq], axis=1)
            k = jnp.concatenate([ik, tk], axis=1)
            o = _attn_joint(q, k, v, H, D)
            out = ap(bp["linear2"],
                     jnp.concatenate([o, gelu(mlp)], axis=-1))
            return x + g * out

        def refiner_body(bp, x, c):
            gates = ap(bp["mod"], jax.nn.silu(c))[:, None]
            g_msa, g_mlp = jnp.split(gates, 2, -1)
            b, t, _ = x.shape
            nx = _ln(x) * bp["norm1_w"] + bp["norm1_b"]
            qkv = ap(bp["qkv"], nx).reshape(b, t, 3, H, D)
            o = _attn_joint(qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2], H, D)
            x = x + ap(bp["proj"], o) * g_msa
            nx = _ln(x) * bp["norm2_w"] + bp["norm2_b"]
            x = x + mlp2(bp["fc1"], bp["fc2"], nx, jax.nn.silu) * g_mlp
            return x

        def forward(params, latent, txt_emb, pooled, t):
            """latent [B, T, Hl, Wl, C] channels-last video latents,
            txt_emb [B, Tc, text_dim], pooled [B, pooled_dim], t [B]
            (sigma*1000 convention). Returns velocity, same shape as
            latent."""
            b, f, hl, wl, c = latent.shape
            tt, th, tw = f // pt, hl // ps, wl // ps
            # patchify: (t pt) (h ph) (w pw) c -> (t h w) (pt ph pw c)
            x = latent.reshape(b, tt, pt, th, ps, tw, ps, c)
            x = x.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(
                b, tt * th * tw, pt * ps * ps * c)
            x = ap(params["img_in"], x)

            vec = t_embed(params["time_w1"], params["time_w2"], t)
            vec = vec + mlp2(params["vector_w1"], params["vector_w2"],
                             pooled, jax.nn.silu)
            if cfg.guidance_embeds:
                g = jnp.full((b,), guidance * 1000.0, jnp.float32)
                vec = vec + t_embed(params["guidance_w1"],
                                    params["guidance_w2"], g)

            # text refiner
            c_t = t_embed(params["txt_in_t_w1"], params["txt_in_t_w2"], t)
            c_c = mlp2(params["txt_in_c_w1"], params["txt_in_c_w2"],
                       jnp.mean(txt_emb, axis=1), jax.nn.silu)
            cvec = (c_t + c_c).astype(x.dtype)
            vec = vec.astype(x.dtype)
            txt = ap(params["txt_in_input"], txt_emb)

            def rbody(txtc, bp):
                return refiner_body(bp, txtc, cvec), None

            txt, _ = jax.lax.scan(rbody, txt, params["refiner"])

            cos, sin = rope_cos_sin_3d((tt, th, tw), cfg)
            cos, sin = jnp.asarray(cos), jnp.asarray(sin)

            def dbody(carry, bp):
                img, txtc = carry
                return double_body(bp, img, txtc, vec, cos, sin), None

            (x, txt), _ = jax.lax.scan(dbody, (x, txt), params["double"])

            s = jnp.concatenate([x, txt], axis=1)
            txt_len = txt.shape[1]

            def sbody(sc_, bp):
                return single_body(bp, sc_, vec, txt_len, cos, sin), None

            s, _ = jax.lax.scan(sbody, s, params["single"])
            x = s[:, : tt * th * tw]

            # final layer (hunyuanvideo.py:994: order is scale, shift)
            scale, shift = jnp.split(
                ap(params["final_mod"], jax.nn.silu(vec))[:, None], 2, -1)
            x = _ln(x) * (1 + scale) + shift
            x = ap(params["final_linear"], x)
            out = x.reshape(b, tt, th, tw, pt, ps, ps, cfg.out_channels)
            out = out.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(
                b, f, hl, wl, cfg.out_channels)
            return out

        return forward
