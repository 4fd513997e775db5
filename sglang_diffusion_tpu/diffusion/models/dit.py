"""Generic MMDiT-style diffusion transformer (functional JAX).

Reference analog: the DiT model zoo in multimodal_gen/runtime/models/dits/
(wanvideo, flux, qwen_image, zimage, ...). Round 1 ships one configurable
single-stream MMDiT (SD3/Z-Image-lite style): joint attention over
[text; image] tokens, adaLN-zero modulation from (timestep, pooled text),
QK-norm, 2D rotary embeddings on image tokens, scan-over-blocks like the
LLM side so compile time is depth-independent.

Model-family-specific DiTs (Flux double-stream, Wan video) layer on top of
these blocks in later rounds.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.ops.norms import rms_norm


@dataclass
class DiTConfig:
    in_channels: int = 16  # VAE latent channels
    patch_size: int = 2
    hidden_size: int = 512
    depth: int = 8
    num_heads: int = 8
    text_dim: int = 512  # incoming text-embedding dim
    mlp_ratio: float = 4.0
    rope_theta: float = 10000.0
    guidance_embed: bool = False  # Flux-dev style guidance conditioning

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.patch_size * self.patch_size


def timestep_embedding(t: jax.Array, dim: int, max_period: float = 10000.0):
    """Sinusoidal timestep embedding; t in [0, 1000]-ish. [B] -> [B, dim]."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)


def rope_nd(grid, t_txt: int, head_dim: int, theta: float):
    """Axial RoPE over an N-D latent grid (2D images, 3D video: frame x h x
    w — the Wan/Flux-video convention); text tokens get identity rotation.

    head_dim/2 rotation dims are split evenly across the grid axes (the
    first axis takes any remainder). Returns (cos, sin) [T_total, head_dim/2]
    with the first t_txt rows identity.
    """
    half = head_dim // 2
    nax = len(grid)
    per = [half // nax] * nax
    per[0] += half - sum(per)
    coords = np.meshgrid(*[np.arange(g) for g in grid], indexing="ij")
    parts = []
    for ax in range(nax):
        k = per[ax]
        freqs = 1.0 / (theta ** (np.arange(k, dtype=np.float64) * 2 / head_dim * nax))
        parts.append(coords[ax].reshape(-1)[:, None] * freqs[None, :])
    ang = np.concatenate(parts, axis=1)  # [T_grid, half]
    cos = np.concatenate([np.ones((t_txt, half)), np.cos(ang)], axis=0).astype(
        np.float32
    )
    sin = np.concatenate([np.zeros((t_txt, half)), np.sin(ang)], axis=0).astype(
        np.float32
    )
    return jnp.asarray(cos), jnp.asarray(sin)


def rope_2d(h: int, w: int, t_txt: int, head_dim: int, theta: float):
    return rope_nd((h, w), t_txt, head_dim, theta)


def apply_rope_interleaved(x: jax.Array, cos: jax.Array, sin: jax.Array):
    """x [B, T, H, D]; rotate pairs (x0,x1),(x2,x3)... by (cos,sin) [T, D/2]."""
    b, t, h, d = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, h, d // 2, 2)
    x0, x1 = xf[..., 0], xf[..., 1]
    c = cos[None, :, None, :]
    s = sin[None, :, None, :]
    out = jnp.stack([x0 * c - x1 * s, x0 * s + x1 * c], axis=-1)
    return out.reshape(b, t, h, d).astype(x.dtype)


def joint_attention(q, k, v, sm_scale):
    """Full bidirectional attention [B, T, H, D] (diffusion is non-causal)."""
    b, t, h, d = q.shape
    s = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
    ) * sm_scale
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
    return o.astype(q.dtype)


class MMDiT:
    """Namespace-style functional model (mirrors models/llama.py layout)."""

    @staticmethod
    def init_params(rng: jax.Array, cfg: DiTConfig, dtype=jnp.bfloat16):
        E = cfg.hidden_size
        D = cfg.head_dim
        F = int(E * cfg.mlp_ratio)
        L = cfg.depth
        ks = jax.random.split(rng, 16)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        blocks = {
            "mod": init(ks[0], (L, E, 6 * E)),  # adaLN: shift/scale/gate x2
            "mod_b": jnp.zeros((L, 6 * E), dtype),
            "wqkv": init(ks[1], (L, E, 3 * E)),
            "wo": init(ks[2], (L, E, E)),
            "q_norm": jnp.ones((L, D), dtype),
            "k_norm": jnp.ones((L, D), dtype),
            "w_up": init(ks[3], (L, E, F)),
            "w_down": init(ks[4], (L, F, E)),
        }
        params = {
            "img_in": init(ks[5], (cfg.patch_dim, E)),
            "img_in_b": jnp.zeros((E,), dtype),
            "txt_in": init(ks[6], (cfg.text_dim, E)),
            "txt_in_b": jnp.zeros((E,), dtype),
            "t_mlp1": init(ks[7], (256, E)),
            "t_mlp2": init(ks[8], (E, E)),
            "blocks": blocks,
            "final_mod": init(ks[9], (E, 2 * E)),
            # nonzero init (adaLN-zero is a training-time trick; random-init
            # inference tests need a non-degenerate output head)
            "final_out": init(ks[12], (E, cfg.patch_dim)),
        }
        if cfg.guidance_embed:
            params["g_mlp1"] = init(ks[10], (256, E))
            params["g_mlp2"] = init(ks[11], (E, E))
        return params

    @staticmethod
    def partition_specs(cfg: DiTConfig) -> Dict[str, Any]:
        blocks = {
            "mod": P(None, None, "tp"),
            "mod_b": P(None, "tp"),
            "wqkv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "q_norm": P(None, None),
            "k_norm": P(None, None),
            "w_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
        }
        specs = {
            "img_in": P(None, None),
            "img_in_b": P(None),
            "txt_in": P(None, None),
            "txt_in_b": P(None),
            "t_mlp1": P(None, None),
            "t_mlp2": P(None, None),
            "blocks": blocks,
            "final_mod": P(None, None),
            "final_out": P(None, None),
        }
        if cfg.guidance_embed:
            specs["g_mlp1"] = P(None, None)
            specs["g_mlp2"] = P(None, None)
        return specs

    @staticmethod
    def _make_block_body(cfg: DiTConfig, attn_fn):
        E = cfg.hidden_size
        H = cfg.num_heads
        D = cfg.head_dim
        sm_scale = 1.0 / math.sqrt(D)
        eps = 1e-6

        def block_body(x, bp, cond, cos, sin):
            b, t, _ = x.shape
            mod = jnp.dot(jax.nn.silu(cond), bp["mod"]) + bp["mod_b"]  # [B, 6E]
            sh1, sc1, g1, sh2, sc2, g2 = jnp.split(mod, 6, axis=-1)

            h = rms_norm(x, jnp.ones((E,), x.dtype), eps)
            h = h * (1 + sc1[:, None]) + sh1[:, None]
            qkv = jnp.dot(h, bp["wqkv"]).reshape(b, t, 3, H, D)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            q = rms_norm(q, bp["q_norm"], eps)
            k = rms_norm(k, bp["k_norm"], eps)
            q = apply_rope_interleaved(q, cos, sin)
            k = apply_rope_interleaved(k, cos, sin)
            attn = attn_fn(q, k, v, sm_scale).reshape(b, t, E)
            x = x + g1[:, None] * jnp.dot(attn, bp["wo"])

            h = rms_norm(x, jnp.ones((E,), x.dtype), eps)
            h = h * (1 + sc2[:, None]) + sh2[:, None]
            h = jnp.dot(jax.nn.gelu(jnp.dot(h, bp["w_up"])), bp["w_down"])
            x = x + g2[:, None] * h
            return x

        return block_body

    @staticmethod
    def make_forward(cfg: DiTConfig, attn_fn=joint_attention):
        E = cfg.hidden_size
        D = cfg.head_dim
        eps = 1e-6
        block_body = MMDiT._make_block_body(cfg, attn_fn)

        def forward(
            params,
            img_tokens,  # [B, T_img, patch_dim]
            txt_emb,  # [B, T_txt, text_dim]
            timesteps,  # [B] in train-timestep units (sigma * 1000)
            grid_hw: Tuple[int, int],  # static (h, w) patch-grid shape
            guidance: Optional[jax.Array] = None,  # [B]
        ):
            b, t_img, _ = img_tokens.shape
            t_txt = txt_emb.shape[1]
            cond = jnp.dot(
                jax.nn.silu(
                    jnp.dot(timestep_embedding(timesteps, 256), params["t_mlp1"])
                ),
                params["t_mlp2"],
            )
            if cfg.guidance_embed and guidance is not None:
                cond = cond + jnp.dot(
                    jax.nn.silu(
                        jnp.dot(
                            timestep_embedding(guidance * 1000.0, 256),
                            params["g_mlp1"],
                        )
                    ),
                    params["g_mlp2"],
                )
            img = jnp.dot(img_tokens, params["img_in"]) + params["img_in_b"]
            txt = jnp.dot(txt_emb, params["txt_in"]) + params["txt_in_b"]
            x = jnp.concatenate([txt, img], axis=1)

            cos, sin = rope_nd(tuple(grid_hw), t_txt, D, cfg.rope_theta)

            def body(x, bp):
                return block_body(x, bp, cond, cos, sin), None

            x, _ = jax.lax.scan(body, x, params["blocks"])

            x_img = x[:, t_txt:]
            mod = jnp.dot(jax.nn.silu(cond), params["final_mod"])
            sh, sc = jnp.split(mod, 2, axis=-1)
            x_img = rms_norm(x_img, jnp.ones((E,), x.dtype), eps)
            x_img = x_img * (1 + sc[:, None]) + sh[:, None]
            return jnp.dot(x_img, params["final_out"])  # [B, T_img, patch_dim]

        return forward

    @staticmethod
    def make_forward_parts(cfg: DiTConfig, attn_fn=joint_attention,
                           front_blocks: int = 1):
        """Split forward for Cache-DiT block caching (reference analog:
        multimodal_gen/runtime/cache/cache_dit_integration.py:177 — DBCache
        computes the first F blocks every step and reuses a cached tail
        residual when the front output barely moved).

        Returns (front, tail, head):
          front(params, img_tokens, txt_emb, t, grid_hw) -> (x_front, ctx)
          tail(params, x_front, ctx) -> x_full  (runs blocks F..L)
          head(params, x_full, ctx) -> velocity tokens [B, T_img, patch_dim]
        with x_* the combined [txt; img] hidden stream.
        """
        E = cfg.hidden_size
        D = cfg.head_dim
        eps = 1e-6
        block_body = MMDiT._make_block_body(cfg, attn_fn)
        assert 0 < front_blocks < cfg.depth

        def _embed(params, img_tokens, txt_emb, timesteps, grid_hw):
            t_txt = txt_emb.shape[1]
            cond = jnp.dot(
                jax.nn.silu(
                    jnp.dot(timestep_embedding(timesteps, 256), params["t_mlp1"])
                ),
                params["t_mlp2"],
            )
            img = jnp.dot(img_tokens, params["img_in"]) + params["img_in_b"]
            txt = jnp.dot(txt_emb, params["txt_in"]) + params["txt_in_b"]
            x = jnp.concatenate([txt, img], axis=1)
            cos, sin = rope_nd(tuple(grid_hw), t_txt, D, cfg.rope_theta)
            return x, {"cond": cond, "cos": cos, "sin": sin, "t_txt": t_txt}

        def _block(x, bp, ctx):
            return block_body(x, bp, ctx["cond"], ctx["cos"], ctx["sin"])

        def _slice_blocks(params, lo, hi):
            return jax.tree.map(lambda a: a[lo:hi], params["blocks"])

        def front(params, img_tokens, txt_emb, timesteps, grid_hw):
            x, ctx = _embed(params, img_tokens, txt_emb, timesteps, grid_hw)
            bp = _slice_blocks(params, 0, front_blocks)
            x, _ = jax.lax.scan(lambda c, b: (_block(c, b, ctx), None), x, bp)
            return x, ctx

        def tail(params, x, ctx):
            bp = _slice_blocks(params, front_blocks, cfg.depth)
            x, _ = jax.lax.scan(lambda c, b: (_block(c, b, ctx), None), x, bp)
            return x

        def head(params, x, ctx):
            t_txt = ctx["t_txt"]
            x_img = x[:, t_txt:]
            mod = jnp.dot(jax.nn.silu(ctx["cond"]), params["final_mod"])
            sh, sc = jnp.split(mod, 2, axis=-1)
            x_img = rms_norm(x_img, jnp.ones((E,), x.dtype), eps)
            x_img = x_img * (1 + sc[:, None]) + sh[:, None]
            return jnp.dot(x_img, params["final_out"])

        return front, tail, head


def patchify(latents: jax.Array, p: int) -> Tuple[jax.Array, Tuple[int, int]]:
    """[B, H, W, C] -> ([B, (H/p)(W/p), C*p*p], (H/p, W/p))."""
    b, h, w, c = latents.shape
    gh, gw = h // p, w // p
    x = latents.reshape(b, gh, p, gw, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * gw, p * p * c)
    return x, (gh, gw)


def unpatchify(tokens: jax.Array, grid_hw: Tuple[int, int], p: int, c: int):
    b = tokens.shape[0]
    gh, gw = grid_hw
    x = tokens.reshape(b, gh, gw, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, gh * p, gw * p, c)
    return x


def patchify_video(latents: jax.Array, p: int):
    """[B, F, H, W, C] -> ([B, F*(H/p)*(W/p), C*p*p], (F, H/p, W/p)).
    Patch is spatial-only (1, p, p) like Wan's (1,2,2)."""
    b, f, h, w, c = latents.shape
    gh, gw = h // p, w // p
    x = latents.reshape(b, f, gh, p, gw, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f * gh * gw, p * p * c)
    return x, (f, gh, gw)


def unpatchify_video(tokens: jax.Array, grid, p: int, c: int):
    b = tokens.shape[0]
    f, gh, gw = grid
    x = tokens.reshape(b, f, gh, gw, p, p, c)
    x = x.transpose(0, 1, 2, 4, 3, 5, 6).reshape(b, f, gh * p, gw * p, c)
    return x
