"""Causal (self-forcing) video denoising for Wan-family DiTs.

Reference analog: CausalDMDDenoisingStage
(multimodal_gen/runtime/pipelines_core/stages/causal_denoising.py:26) +
the causal WanModel (runtime/models/dits/causal_wanvideo.py): video is
generated autoregressively in blocks of latent frames; each block runs a
few-step DMD loop attending (a) bidirectionally within the block and
(b) to a per-layer KV cache holding the finished earlier frames; after a
block converges, one "context pass" over its clean latents (at
context_noise timestep) writes its K/V into the cache.

TPU-native re-design, not a port:
- The per-layer KV cache is a pair of dense [L, B, Tmax, H, D] arrays
  carried through jit (no torch dict-of-tensors state); the DMD loop for
  one block is a single jitted lax.scan over timesteps, and the context
  pass is fused into the same call — one dispatch per frame block.
- During the DMD loop the cache is READ-ONLY (the block's own K/V is
  computed fresh each step); only the final context pass writes. The
  reference writes transient K/V every step and overwrites — same
  semantics, fewer cache mutations.
- Rope positions use absolute frame indices via the full-grid table
  sliced at the block's frame offset, matching `current_start`.

Flow-matching DMD conversions follow the reference's
pred_noise_to_pred_video / add_noise: x_t = (1-s) x0 + s e, model
predicts v = e - x0, so x0 = x_t - s v; renoise at s' with fresh noise.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.models.wan import (
    WanConfig,
    WanDiT,
    _gelu_tanh,
    _ln,
    _rms,
    _rope_pairs,
    wan_rope_3d,
)


def _causal_attention(q, k, v, sm_scale, valid_len):
    """q [B,Tq,H,D] against k/v [B,Tk,H,D] where only the first
    `valid_len` (traced) kv rows are real."""
    b, tq, h, d = q.shape
    tk = k.shape[1]
    s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * sm_scale
    mask = jnp.arange(tk)[None, None, None, :] < valid_len
    s = jnp.where(mask, s, -1e30)
    p = jax.nn.softmax(s, axis=-1).astype(v.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", p, v)


def make_causal_block_forward(cfg: WanConfig, max_ctx_tokens: int):
    """Returns fn(params, kv_k, kv_v, tokens, text_emb, timesteps,
    cos_blk, sin_blk, ctx_len, write, write_start)
      -> (out_tokens [B,T,out_patch], kv_k', kv_v')

    kv_k/kv_v: [L, B, Tmax, H, D] frame-context caches. The block's
    queries attend cache[:ctx_len] ++ the block's own K/V. When `write`
    is true, the block's K/V is stored at write_start (the context pass).
    """
    E, H, D, eps = cfg.dim, cfg.num_heads, cfg.head_dim, cfg.eps
    sm_scale = 1.0 / math.sqrt(D)

    def forward(params, kv_k, kv_v, tokens, text_emb, timesteps,
                cos_blk, sin_blk, ctx_len, write, write_start):
        x = jnp.dot(tokens, params["patch_embed"]) + params["patch_embed_b"]
        temb, temb6, ctx = WanDiT.embed_conditioning(
            params, cfg, timesteps, text_emb)
        b, t, _ = x.shape

        def body(carry, layer_in):
            x, li = carry
            bp = layer_in
            e = bp["scale_shift_table"][None] + temb6
            sh1, sc1, g1, sh2, sc2, g2 = [
                e[:, i][:, None] for i in range(6)
            ]

            # 1. causal self-attention over (cached context ++ block)
            h = (_ln(x, eps) * (1 + sc1) + sh1).astype(x.dtype)
            q = _rms(jnp.dot(h, bp["wq"]) + bp["bq"], bp["q_norm"], eps)
            k = _rms(jnp.dot(h, bp["wk"]) + bp["bk"], bp["k_norm"], eps)
            v = (jnp.dot(h, bp["wv"]) + bp["bv"]).reshape(b, t, H, D)
            q = _rope_pairs(q.reshape(b, t, H, D), cos_blk, sin_blk)
            k = _rope_pairs(k.reshape(b, t, H, D), cos_blk, sin_blk)
            ck = jnp.concatenate(
                [kv_k[li].astype(x.dtype), k], axis=1)
            cv = jnp.concatenate(
                [kv_v[li].astype(x.dtype), v], axis=1)
            # valid kv rows: ctx_len cached + t in-block (cache tail rows
            # beyond ctx_len are masked out)
            valid = jnp.where(
                jnp.arange(max_ctx_tokens + t) < max_ctx_tokens,
                jnp.arange(max_ctx_tokens + t) < ctx_len,
                True,
            )
            s = jnp.einsum(
                "bqhd,bkhd->bhqk", q.astype(jnp.float32),
                ck.astype(jnp.float32)) * sm_scale
            s = jnp.where(valid[None, None, None, :], s, -1e30)
            p = jax.nn.softmax(s, axis=-1).astype(cv.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", p, cv)
            attn = jnp.dot(attn.reshape(b, t, E), bp["wo"]) + bp["bo"]
            x = (x.astype(jnp.float32)
                 + attn.astype(jnp.float32) * g1).astype(x.dtype)

            # context write (the post-block clean pass): store this
            # block's K/V at write_start — updating only this layer's row
            row_k = jax.lax.cond(
                write,
                lambda: jax.lax.dynamic_update_slice(
                    kv_k[li], k.astype(kv_k.dtype),
                    (0, write_start, 0, 0)),
                lambda: kv_k[li],
            )
            row_v = jax.lax.cond(
                write,
                lambda: jax.lax.dynamic_update_slice(
                    kv_v[li], v.astype(kv_v.dtype),
                    (0, write_start, 0, 0)),
                lambda: kv_v[li],
            )

            # 2. cross-attention on text
            h = (_ln(x, eps) * bp["norm2_g"].astype(jnp.float32)
                 + bp["norm2_b"].astype(jnp.float32)).astype(x.dtype)
            xq = _rms(jnp.dot(h, bp["xwq"]) + bp["xbq"], bp["xq_norm"], eps)
            xq = xq.reshape(b, t, H, D)
            tc = ctx.shape[1]
            xk = _rms(jnp.dot(ctx, bp["xwk"]) + bp["xbk"],
                      bp["xk_norm"], eps).reshape(b, tc, H, D)
            xv = (jnp.dot(ctx, bp["xwv"]) + bp["xbv"]).reshape(b, tc, H, D)
            sx = jnp.einsum("bqhd,bkhd->bhqk", xq.astype(jnp.float32),
                            xk.astype(jnp.float32)) * sm_scale
            px = jax.nn.softmax(sx, axis=-1).astype(xv.dtype)
            attn = jnp.einsum("bhqk,bkhd->bqhd", px, xv)
            attn = jnp.dot(attn.reshape(b, t, E), bp["xwo"]) + bp["xbo"]
            x = (x.astype(jnp.float32) + attn.astype(jnp.float32)).astype(
                x.dtype)

            # 3. FFN
            h = (_ln(x, eps) * (1 + sc2) + sh2).astype(x.dtype)
            h = jnp.dot(_gelu_tanh(jnp.dot(h, bp["w1"]) + bp["b1"]),
                        bp["w2"]) + bp["b2"]
            x = (x.astype(jnp.float32)
                 + h.astype(jnp.float32) * g2).astype(x.dtype)
            return (x, li + 1), (row_k, row_v)

        # scan over layers, collecting per-layer cache updates
        (x, _), (kk, vv) = jax.lax.scan(
            body, (x, 0), params["blocks"])
        # kk/vv: [L, B, Tmax, H, D] (already full cache rows per layer)
        e = params["head_table"][None] + temb[:, None]
        shift, scale = e[:, 0][:, None], e[:, 1][:, None]
        x = (_ln(x, cfg.eps) * (1 + scale) + shift).astype(x.dtype)
        out = jnp.dot(x, params["proj_out"]) + params["proj_out_b"]
        return out, kk, vv

    return forward


def generate_causal_video(
    params,
    cfg: WanConfig,
    latents: jax.Array,  # [B, F, Hl, Wl, C] initial noise
    text_emb: jax.Array,  # [B, Tc, text_dim]
    dmd_steps: List[int],
    num_frames_per_block: int = 3,
    context_noise: int = 0,
    key: Optional[jax.Array] = None,
    _compiled_cache: Optional[dict] = None,
) -> jax.Array:
    """Blockwise self-forcing DMD generation. Returns clean latents.

    latents frames F must divide into num_frames_per_block blocks.
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    b, f, hl, wl, c = latents.shape
    p = cfg.patch_size
    gh, gw = hl // p[1], wl // p[2]
    spf = gh * gw  # tokens per latent frame
    if f % num_frames_per_block:
        raise ValueError(
            f"num_frames {f} not divisible by block {num_frames_per_block}")
    n_blocks = f // num_frames_per_block
    t_blk = num_frames_per_block * spf
    max_ctx = f * spf
    L = params["blocks"]["wq"].shape[0]
    H, D = cfg.num_heads, cfg.head_dim

    fwd = make_causal_block_forward(cfg, max_ctx)
    cos_all, sin_all = wan_rope_3d((f, gh, gw), cfg.head_dim, cfg.rope_theta)

    steps = jnp.asarray(dmd_steps, jnp.float32)
    n_steps = len(dmd_steps)

    def block_step(params, kv_k, kv_v, blk_noise, text_emb, cos_blk,
                   sin_blk, ctx_len, write_start, key):
        """One block: DMD loop (cache read-only) + context write pass.
        blk_noise [B, t_blk, patch_dim_tokens...] is pure noise latents
        in token form? — latents stay in [B, Tblk, patch_dim]."""

        def dmd_body(carry, i):
            lat, key = carry
            s = steps[i] / 1000.0
            t_in = jnp.full((b,), steps[i], jnp.float32)
            v_pred, _, _ = fwd(
                params, kv_k, kv_v, lat.astype(jnp.bfloat16), text_emb,
                t_in, cos_blk, sin_blk, ctx_len,
                jnp.asarray(False), 0,
            )
            x0 = lat - s * v_pred.astype(jnp.float32)
            key, sub = jax.random.split(key)
            s_next = jnp.where(i + 1 < n_steps,
                               steps[jnp.minimum(i + 1, n_steps - 1)] / 1000.0,
                               0.0)
            noise = jax.random.normal(sub, lat.shape, jnp.float32)
            lat = jnp.where(i + 1 < n_steps,
                            (1.0 - s_next) * x0 + s_next * noise, x0)
            return (lat, key), None

        (clean, key), _ = jax.lax.scan(
            dmd_body, (blk_noise, key), jnp.arange(n_steps))
        # context pass: write this block's K/V from clean latents
        t_ctx = jnp.full((b,), float(context_noise), jnp.float32)
        _, kv_k, kv_v = fwd(
            params, kv_k, kv_v, clean.astype(jnp.bfloat16), text_emb,
            t_ctx, cos_blk, sin_blk, ctx_len, jnp.asarray(True), write_start,
        )
        return clean, kv_k, kv_v, key

    cache = _compiled_cache if _compiled_cache is not None else {}
    jit_block = cache.get("block_step")
    if jit_block is None:
        jit_block = jax.jit(block_step, donate_argnums=(1, 2))
        cache["block_step"] = jit_block

    kv_k = jnp.zeros((L, b, max_ctx, H, D), jnp.bfloat16)
    kv_v = jnp.zeros((L, b, max_ctx, H, D), jnp.bfloat16)

    from sglang_diffusion_tpu.diffusion.models.dit import patchify_video

    outs = []
    for bi in range(n_blocks):
        f0 = bi * num_frames_per_block
        blk_lat = latents[:, f0 : f0 + num_frames_per_block]
        tokens, _ = patchify_video(blk_lat, p[1])
        tokens = tokens.astype(jnp.float32)
        lo = f0 * spf
        cos_blk = cos_all[lo : lo + t_blk]
        sin_blk = sin_all[lo : lo + t_blk]
        clean, kv_k, kv_v, key = jit_block(
            params, kv_k, kv_v, tokens, text_emb, cos_blk, sin_blk,
            jnp.asarray(lo, jnp.int32), jnp.asarray(lo, jnp.int32), key,
        )
        outs.append(clean)

    from sglang_diffusion_tpu.diffusion.models.dit import unpatchify_video

    toks = jnp.concatenate(outs, axis=1)  # [B, F*spf, out_patch]
    return unpatchify_video(toks, (f, gh, gw), p[1], cfg.out_channels)
