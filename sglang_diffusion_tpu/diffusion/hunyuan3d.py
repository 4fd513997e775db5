"""Hunyuan3D-2 image-to-mesh shape generation, TPU-native.

Reference analog: multimodal_gen/runtime/models/dits/hunyuan3d.py:410
(Hunyuan3D2DiT — a Flux-style double/single-stream DiT over shape latent
tokens with NO positional embedding), vaes/hunyuan3d_vae.py:1143
(ShapeVAE — latent-set transformer + cross-attention geo decoder queried
at Fourier-embedded grid points -> SDF logits), pipelines/
hunyuan3d_pipeline.py:45 (BeforeDenoising -> Denoising -> Export -> Save)
and schedulers/hunyuan3d_scheduler.py:22 (flow-match Euler).

TPU-first design decisions:
- The DiT **reuses FluxDiT's scan-stacked block machinery** with an
  identity rope (cos=1, sin=0): Hunyuan3D's architecture IS Flux minus
  positional encoding, so the same MXU-shaped bodies, partition specs
  and Cache-DiT splits apply. The pooled-text path is zeroed (weights
  are zeros in conversion), which makes its contribution exactly 0.
- The volume decode evaluates the SDF grid **inside one jit** with a
  `lax.map` over fixed-size query chunks (static shapes, MXU-friendly
  [chunk, width] GEMMs) instead of the reference's host-side python
  chunk loop; the KV of the cross-attention decoder is computed once and
  reused across every chunk (the reference recomputes c_kv per chunk
  unless its FlashVDM kv_cache flag is set).
- Surface extraction (marching tetrahedra, mesh.py) is the only
  host-side stage, same as the reference's skimage pass.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.diffusion.mesh import grid_to_mesh
from sglang_diffusion_tpu.diffusion.models.flux import FluxConfig, FluxDiT


# --------------------------------------------------------------------------
# Shape VAE (decoder side: latents -> SDF grid)
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class ShapeVAEConfig:
    # defaults = hunyuan3d-dit-v2-0 (reference configs/models/vaes/
    # hunyuan3d.py:11 latent_shape (1024, 64))
    num_latents: int = 1024
    embed_dim: int = 64
    width: int = 1024
    heads: int = 16
    num_decoder_layers: int = 16
    num_freqs: int = 8
    include_pi: bool = True
    geo_mlp_expand: int = 4
    scale_factor: float = 1.0188
    eps: float = 1e-6

    @property
    def fourier_dim(self) -> int:
        return 3 * (2 * self.num_freqs + 1)

    @property
    def head_dim(self) -> int:
        return self.width // self.heads


def _ln(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g + b).astype(x.dtype)


def fourier_embed(x: jax.Array, num_freqs: int, include_pi: bool) -> jax.Array:
    """[..., 3] -> [..., 3*(2F+1)]: (x, sin(x f), cos(x f)) with
    per-coordinate interleaved frequencies 2^0..2^(F-1) (x pi), matching
    hunyuan3d_vae.py:133 ordering (coordinate-major)."""
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=jnp.float32)
    if include_pi:
        freqs = freqs * jnp.pi
    e = (x[..., None].astype(jnp.float32) * freqs).reshape(
        *x.shape[:-1], 3 * num_freqs)
    return jnp.concatenate([x.astype(jnp.float32), jnp.sin(e), jnp.cos(e)],
                           axis=-1)


class ShapeVAE:
    """Functional decoder: post_kl -> self-attn transformer over the
    latent set -> cross-attention geo decoder at query points."""

    @staticmethod
    def init_params(rng: jax.Array, cfg: ShapeVAEConfig,
                    dtype=jnp.float32) -> Dict[str, Any]:
        W, L, F = cfg.width, cfg.num_decoder_layers, cfg.fourier_dim
        ks = iter(jax.random.split(rng, 32))

        def init(shape):
            scale = 1.0 / math.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(next(ks), shape, jnp.float32)
                    * scale).astype(dtype)

        def zeros(shape):
            return jnp.zeros(shape, dtype)

        def ones(shape):
            return jnp.ones(shape, dtype)

        blocks = {
            "ln1_g": ones((L, W)), "ln1_b": zeros((L, W)),
            "qkv_w": init((L, W, 3 * W)), "qkv_b": zeros((L, 3 * W)),
            "proj_w": init((L, W, W)), "proj_b": zeros((L, W)),
            "ln2_g": ones((L, W)), "ln2_b": zeros((L, W)),
            "fc_w": init((L, W, 4 * W)), "fc_b": zeros((L, 4 * W)),
            "out_w": init((L, 4 * W, W)), "out_b": zeros((L, W)),
        }
        geo = {
            "query_w": init((F, W)), "query_b": zeros((W,)),
            "ln_q_g": ones((W,)), "ln_q_b": zeros((W,)),
            "ln_kv_g": ones((W,)), "ln_kv_b": zeros((W,)),
            "q_w": init((W, W)), "q_b": zeros((W,)),
            "kv_w": init((W, 2 * W)), "kv_b": zeros((2 * W,)),
            "o_w": init((W, W)), "o_b": zeros((W,)),
            "ln_m_g": ones((W,)), "ln_m_b": zeros((W,)),
            "fc_w": init((W, cfg.geo_mlp_expand * W)),
            "fc_b": zeros((cfg.geo_mlp_expand * W,)),
            "out_w": init((cfg.geo_mlp_expand * W, W)), "out_b": zeros((W,)),
            "ln_post_g": ones((W,)), "ln_post_b": zeros((W,)),
            "proj_w": init((W, 1)), "proj_b": zeros((1,)),
        }
        return {
            "post_kl_w": init((cfg.embed_dim, W)), "post_kl_b": zeros((W,)),
            "blocks": blocks, "geo": geo,
        }

    @staticmethod
    def decode_latents(params, cfg: ShapeVAEConfig,
                       latents: jax.Array) -> jax.Array:
        """[B, N, embed_dim] -> [B, N, width]: post_kl + transformer
        (hunyuan3d_vae.py:1218 ShapeVAE.decode)."""
        H, D, eps = cfg.heads, cfg.head_dim, cfg.eps
        x = jnp.dot(latents, params["post_kl_w"]) + params["post_kl_b"]

        def body(x, bp):
            h = _ln(x, bp["ln1_g"], bp["ln1_b"], eps)
            qkv = jnp.dot(h, bp["qkv_w"]) + bp["qkv_b"]
            b, n, _ = qkv.shape
            # reference QKVMultiheadAttention (vae:367): view [B,N,H,3D]
            # then split along the LAST axis — q/k/v interleave per head
            qkv = qkv.reshape(b, n, H, 3 * D)
            q, k, v = jnp.split(qkv, 3, axis=-1)
            o = jax.nn.dot_product_attention(q, k, v)
            o = o.reshape(b, n, -1)
            x = x + jnp.dot(o, bp["proj_w"]) + bp["proj_b"]
            h = _ln(x, bp["ln2_g"], bp["ln2_b"], eps)
            h = jax.nn.gelu(jnp.dot(h, bp["fc_w"]) + bp["fc_b"],
                            approximate=False)
            return x + jnp.dot(h, bp["out_w"]) + bp["out_b"], None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        return x

    @staticmethod
    def geo_kv(params, cfg: ShapeVAEConfig, feats: jax.Array) -> jax.Array:
        """Pre-project the latent features to cross-attn K/V once
        ([B, N, 2W]); reused for every query chunk (the reference's
        FlashVDM kv_cache fast path, vae:276)."""
        g = params["geo"]
        d = _ln(feats, g["ln_kv_g"], g["ln_kv_b"], cfg.eps)
        return jnp.dot(d, g["kv_w"]) + g["kv_b"]

    @staticmethod
    def geo_decode(params, cfg: ShapeVAEConfig, queries: jax.Array,
                   kv: jax.Array) -> jax.Array:
        """SDF logits at query points: [B, P, 3] x KV [B, N, 2W] -> [B, P].
        (CrossAttentionDecoder, vae:474)."""
        g = params["geo"]
        H, D, eps = cfg.heads, cfg.head_dim, cfg.eps
        emb = fourier_embed(queries, cfg.num_freqs, cfg.include_pi)
        x = jnp.dot(emb.astype(kv.dtype), g["query_w"]) + g["query_b"]
        h = _ln(x, g["ln_q_g"], g["ln_q_b"], eps)
        q = jnp.dot(h, g["q_w"]) + g["q_b"]
        b, p, _ = q.shape
        n = kv.shape[1]
        # reference QKVMultiheadCrossAttention splits kv as [B,N,H,2D]
        k, v = jnp.split(kv.reshape(b, n, H, 2 * D), 2, axis=-1)
        o = jax.nn.dot_product_attention(q.reshape(b, p, H, D), k, v)
        x = x + jnp.dot(o.reshape(b, p, -1), g["o_w"]) + g["o_b"]
        h = _ln(x, g["ln_m_g"], g["ln_m_b"], eps)
        h = jax.nn.gelu(jnp.dot(h, g["fc_w"]) + g["fc_b"], approximate=False)
        x = x + jnp.dot(h, g["out_w"]) + g["out_b"]
        x = _ln(x, g["ln_post_g"], g["ln_post_b"], eps)
        return (jnp.dot(x, g["proj_w"]) + g["proj_b"])[..., 0]

    @staticmethod
    def make_sdf_grid_fn(cfg: ShapeVAEConfig, resolution: int,
                         bounds: float = 1.01, chunk: int = 8192):
        """jit-able: latents [B, N, embed_dim] -> SDF grid
        [B, R+1, R+1, R+1]. Grid queries are evaluated chunk-by-chunk via
        lax.map (static [chunk] shapes; one compile covers the whole
        volume). Mirrors VanillaVolumeDecoder (vae:620)."""
        r1 = resolution + 1
        xs = np.linspace(-bounds, bounds, r1, dtype=np.float32)
        pts = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"),
                       axis=-1).reshape(-1, 3)
        total = pts.shape[0]
        n_chunks = -(-total // chunk)
        pad = n_chunks * chunk - total
        pts = np.pad(pts, ((0, pad), (0, 0)))
        pts_dev = jnp.asarray(pts.reshape(n_chunks, chunk, 3))

        def sdf_grid(params, latents):
            feats = ShapeVAE.decode_latents(params, cfg, latents)
            kv = ShapeVAE.geo_kv(params, cfg, feats)
            b = latents.shape[0]

            def one_chunk(q):
                qb = jnp.broadcast_to(q[None], (b, chunk, 3))
                return ShapeVAE.geo_decode(params, cfg, qb, kv)  # [B, chunk]

            logits = jax.lax.map(one_chunk, pts_dev)  # [n_chunks, B, chunk]
            logits = logits.transpose(1, 0, 2).reshape(b, -1)[:, :total]
            return logits.reshape(b, r1, r1, r1).astype(jnp.float32)

        return sdf_grid


# --------------------------------------------------------------------------
# Shape DiT (Flux-minus-rope) + flow-match sampling
# --------------------------------------------------------------------------


@dataclass(frozen=True)
class Hunyuan3DConfig:
    in_channels: int = 64          # = ShapeVAE embed_dim
    context_in_dim: int = 1536     # DINOv2-giant conditioner width
    hidden_size: int = 1024
    num_heads: int = 16
    depth: int = 16
    depth_single_blocks: int = 32
    mlp_ratio: float = 4.0
    guidance_embed: bool = False
    time_factor: float = 1000.0
    num_latents: int = 1024

    def flux_config(self) -> FluxConfig:
        return FluxConfig(
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            num_layers=self.depth,
            num_single_layers=self.depth_single_blocks,
            attention_head_dim=self.hidden_size // self.num_heads,
            num_attention_heads=self.num_heads,
            joint_attention_dim=self.context_in_dim,
            pooled_projection_dim=self.context_in_dim,
            guidance_embeds=self.guidance_embed,
        )


class Hunyuan3DDiT:
    """Flux double/single-stream blocks over latent-set tokens, pe=None
    (dits/hunyuan3d.py:552 `pe = None`). Reuses FluxDiT bodies with an
    identity rotation; the pooled-projection path is zero-initialized so
    it contributes exactly nothing (Hunyuan3D has no pooled input)."""

    @staticmethod
    def init_params(rng: jax.Array, cfg: Hunyuan3DConfig,
                    dtype=jnp.bfloat16) -> Dict[str, Any]:
        p = FluxDiT.init_params(rng, cfg.flux_config(), dtype)
        for k in ("pooled_w1", "pooled_b1", "pooled_w2", "pooled_b2"):
            p[k] = jnp.zeros_like(p[k])
        return p

    @staticmethod
    def partition_specs(cfg: Hunyuan3DConfig) -> Dict[str, Any]:
        return FluxDiT.partition_specs(cfg.flux_config())

    @staticmethod
    def make_forward(cfg: Hunyuan3DConfig,
                     guidance: Optional[float] = None):
        from sglang_diffusion_tpu.diffusion.models.flux import (
            joint_attention,
        )

        fcfg = cfg.flux_config()
        double_body = FluxDiT._make_double_body(fcfg, joint_attention)
        single_body = FluxDiT._make_single_body(fcfg, joint_attention)
        E, D = fcfg.dim, fcfg.head_dim

        def forward(params, latents, cond, timesteps):
            """latents [B, T, in_ch]; cond [B, Tc, context_in_dim];
            timesteps [B] in [0, 1] flow time (x time_factor inside)."""
            b, t, _ = latents.shape
            tc = cond.shape[1]
            x = jnp.dot(latents, params["x_embed"]) + params["x_embed_b"]
            c = jnp.dot(cond, params["ctx_embed"]) + params["ctx_embed_b"]
            g = (None if guidance is None
                 else jnp.full((b,), guidance * 1000.0, jnp.float32))
            temb = FluxDiT.embed_conditioning(
                params, fcfg, timesteps * cfg.time_factor,
                jnp.zeros((b, fcfg.pooled_projection_dim), x.dtype), g)
            temb_silu = jax.nn.silu(temb)
            # identity rope: cos=1, sin=0 over the joint stream
            cos = jnp.ones((tc + t, D // 2), jnp.float32)
            sin = jnp.zeros((tc + t, D // 2), jnp.float32)

            def dbody(carry, bp):
                x, c = carry
                return double_body(x, c, bp, temb_silu, cos, sin), None

            (x, c), _ = jax.lax.scan(dbody, (x, c), params["double"])
            s = jnp.concatenate([c, x], axis=1)

            def sbody(cr, bp):
                return single_body(cr, bp, temb_silu, cos, sin), None

            s, _ = jax.lax.scan(sbody, s, params["single"])
            x = s[:, tc:]
            e = jnp.dot(temb_silu, params["norm_out_w"].astype(jnp.float32)
                        ) + params["norm_out_b"].astype(jnp.float32)
            scale, shift = e[:, None, :E], e[:, None, E:]
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            xn = (xf - mu) * jax.lax.rsqrt(var + fcfg.eps)
            x = (xn * (1 + scale) + shift).astype(x.dtype)
            return jnp.dot(x, params["proj_out"]) + params["proj_out_b"]

        return forward


def flow_match_sigmas(num_steps: int, shift: float = 1.0) -> np.ndarray:
    """sigma schedule 1 -> 0 with the reference's time shift
    (hunyuan3d_scheduler.py: sigma' = shift*s / (1 + (shift-1)*s))."""
    s = np.linspace(1.0, 0.0, num_steps + 1, dtype=np.float32)
    return shift * s / (1.0 + (shift - 1.0) * s)


# --------------------------------------------------------------------------
# Pipeline
# --------------------------------------------------------------------------


class Hunyuan3DPipeline:
    """Image-to-mesh: conditioner tokens -> flow-match Euler denoise of
    the latent set -> ShapeVAE volume decode -> marching tetrahedra.

    The conditioner input is pluggable: pass precomputed image-encoder
    tokens (`cond` [B, Tc, context_in_dim], e.g. from models/vision.py's
    ViT with DINO dims), mirroring the reference's hy3dshape_conditioner
    module boundary."""

    def __init__(self, cfg: Hunyuan3DConfig, vae_cfg: ShapeVAEConfig,
                 rng: Optional[jax.Array] = None, dtype=jnp.bfloat16,
                 guidance_scale: float = 5.0):
        self.cfg = cfg
        self.vae_cfg = vae_cfg
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(rng)
        self.dit_params = Hunyuan3DDiT.init_params(k1, cfg, dtype)
        self.vae_params = ShapeVAE.init_params(k2, vae_cfg, dtype)
        self.guidance_scale = guidance_scale
        self._fwd = jax.jit(Hunyuan3DDiT.make_forward(cfg))
        self._sdf_fns: Dict[Tuple[int, int], Any] = {}

    def denoise(self, cond: jax.Array, num_steps: int = 30,
                seed: int = 0, shift: float = 1.0) -> jax.Array:
        """CFG flow-match Euler over the latent set. cond rows with all
        zeros act as the unconditional branch (classifier-free)."""
        b = cond.shape[0]
        lat = jax.random.normal(
            jax.random.PRNGKey(seed),
            (b, self.cfg.num_latents, self.cfg.in_channels), jnp.float32,
        ).astype(cond.dtype)
        sig = flow_match_sigmas(num_steps, shift)
        uncond = jnp.zeros_like(cond)
        for i in range(num_steps):
            t = jnp.full((b,), sig[i], jnp.float32)
            v_c = self._fwd(self.dit_params, lat, cond, t)
            if self.guidance_scale != 1.0:
                v_u = self._fwd(self.dit_params, lat, uncond, t)
                v = v_u + self.guidance_scale * (v_c - v_u)
            else:
                v = v_c
            lat = (lat.astype(jnp.float32)
                   + (sig[i + 1] - sig[i]) * v.astype(jnp.float32)
                   ).astype(lat.dtype)
        return lat

    def latents_to_mesh(self, latents: jax.Array, resolution: int = 64,
                        bounds: float = 1.01, mc_level: float = 0.0,
                        chunk: int = 8192):
        """[B, N, embed_dim] -> list of (verts, faces)."""
        key = (resolution, chunk)
        if key not in self._sdf_fns:
            self._sdf_fns[key] = jax.jit(ShapeVAE.make_sdf_grid_fn(
                self.vae_cfg, resolution, bounds, chunk))
        scaled = latents.astype(jnp.float32) / self.vae_cfg.scale_factor
        grids = np.asarray(self._sdf_fns[key](
            self.vae_params, scaled.astype(latents.dtype)))
        return [grid_to_mesh(g, mc_level, bounds) for g in grids]

    def generate(self, cond: jax.Array, num_steps: int = 30,
                 resolution: int = 64, seed: int = 0,
                 chunk: int = 8192):
        lat = self.denoise(cond, num_steps=num_steps, seed=seed)
        return self.latents_to_mesh(lat, resolution=resolution, chunk=chunk)
