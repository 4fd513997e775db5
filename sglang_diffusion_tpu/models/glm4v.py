"""GLM-4V family (Glm4vForConditionalGeneration).

Reference analog: srt/models/glm4v.py. Numerics defined against HF
transformers' Glm4v implementation:

- Text stack: GLM-4 sandwich-norm blocks (input / post_self_attn /
  post_attention / post_mlp norms), biased qkv, fused-gate MLP — with
  M-RoPE: partial rotary (rot_dim = head_dim * partial_rotary_factor)
  applied with GLM INTERLEAVED pairing (rotate_half_llm), and the
  half-dim frequency axis split into (t, h, w) sections
  (apply_multimodal_rotary_pos_emb: the doubled-frequency copy is
  discarded by the `[..., :dim/2].repeat_interleave(2)` step, so the
  effective selection is per-half-dim stream assignment).
- Vision tower: conv3d patch embed -> post_conv RMSNorm -> learned 2D
  position embedding (bicubically interpolated to the grid) -> blocks of
  {RMSNorm, biased-qkv attention with 2D rope (standard rotate-half),
  RMSNorm, SwiGLU mlp with intermediate = out_hidden_size} ->
  post RMSNorm -> spatial-merge downsample conv2d -> merger
  (proj -> LayerNorm -> gelu -> SwiGLU to out_hidden_size).

Engine integration mirrors models/qwen2_vl.py (uses_mrope): the engine
computes (3, T) position streams and rope_delta; text-only decode runs
the scalar-position path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.rope import compute_inv_freq


# ---------------- vision tower ----------------
@dataclass
class Glm4vVisionConfig:
    hidden_size: int = 1536
    depth: int = 24
    num_heads: int = 12
    intermediate_size: int = 13696
    out_hidden_size: int = 4096
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    image_size: int = 336
    in_channels: int = 3
    rms_norm_eps: float = 1e-5
    attention_bias: bool = False
    hidden_act: str = "silu"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @classmethod
    def from_hf(cls, v: Dict[str, Any]) -> "Glm4vVisionConfig":
        keys = {f for f in cls.__dataclass_fields__}
        return cls(**{k: v[k] for k in v if k in keys})


def _merge_order_pos(grid_hw: Tuple[int, int], merge: int) -> np.ndarray:
    """(h, w) coordinates per token in spatial-merge flattening order
    (HF Glm4vVisionModel.rot_pos_emb)."""
    h, w = grid_hw
    hp = np.arange(h)[:, None].repeat(w, 1)
    wp = np.arange(w)[None, :].repeat(h, 0)

    def reorder(x):
        x = x.reshape(h // merge, merge, w // merge, merge)
        return x.transpose(0, 2, 1, 3).reshape(-1)

    return np.stack([reorder(hp), reorder(wp)], axis=-1)  # [T, 2]


class Glm4vVisionTower:
    @staticmethod
    def init_params(rng, v: Glm4vVisionConfig, dtype=jnp.float32):
        E, F, O = v.hidden_size, v.intermediate_size, v.out_hidden_size
        n_pos = (v.image_size // v.patch_size) ** 2
        keys = iter(jax.random.split(rng, 8 + 10 * v.depth))

        def init(shape, sd=None):
            s = 1.0 / np.sqrt(sd or shape[0])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * s).astype(dtype)

        blocks = []
        for _ in range(v.depth):
            blocks.append({
                "n1": jnp.ones((E,), dtype),
                "n2": jnp.ones((E,), dtype),
                "wqkv": init((E, 3 * E)),
                "bqkv": jnp.zeros((3 * E,), dtype),
                "wo": init((E, E)),
                "w_gate": init((E, F)),
                "w_up": init((E, F)),
                "w_down": init((F, E)),
            })
        stack = {
            k: jnp.stack([b[k] for b in blocks]) for k in blocks[0]
        }
        m = v.spatial_merge_size
        return {
            "patch_embed": init((v.patch_dim, E), sd=v.patch_dim),
            "patch_embed_b": jnp.zeros((E,), dtype),
            "post_conv_norm": jnp.ones((E,), dtype),
            "pos_embed": init((n_pos, E), sd=E),
            "blocks": stack,
            "post_norm": jnp.ones((E,), dtype),
            # downsample conv2d [merge, merge, E, O] (HWIO)
            "downsample": init((m, m, E, O), sd=E * m * m),
            "downsample_b": jnp.zeros((O,), dtype),
            "merger_proj": init((O, O)),
            "merger_ln_w": jnp.ones((O,), dtype),
            "merger_ln_b": jnp.zeros((O,), dtype),
            "merger_gate": init((O, F)),
            "merger_up": init((O, F)),
            "merger_down": init((F, O)),
        }

    @staticmethod
    def apply(params, patches: jax.Array, grid_hw: Tuple[int, int],
              v: Glm4vVisionConfig) -> jax.Array:
        """patches [T, patch_dim] in merge order -> [T/merge^2, out_hidden].
        Single image (t=1)."""
        h, w = grid_hw
        m = v.spatial_merge_size
        E, H, D = v.hidden_size, v.num_heads, v.head_dim
        eps = v.rms_norm_eps

        def rn(x, g):
            xf = x.astype(jnp.float32)
            var = jnp.mean(xf * xf, axis=-1, keepdims=True)
            return (xf * jax.lax.rsqrt(var + eps)
                    * g.astype(jnp.float32)).astype(x.dtype)

        x = jnp.dot(patches, params["patch_embed"]) + params["patch_embed_b"]
        x = rn(x, params["post_conv_norm"])

        # learned 2D pos embedding, bicubically resized to the grid, read
        # at each token's (h, w) coordinate
        pos = _merge_order_pos((h, w), m)  # [T, 2]
        n_orig = int(np.sqrt(params["pos_embed"].shape[0]))
        pe2d = params["pos_embed"].reshape(n_orig, n_orig, E)
        pe = jax.image.resize(
            pe2d.astype(jnp.float32), (h, w, E), method="bicubic")
        x = x + pe[pos[:, 0], pos[:, 1]].astype(x.dtype)

        # 2D rope over (h, w): half the head dims rotate by h-pos, half by
        # w-pos (HF: per-axis tables of head_dim/2/2 freqs, concatenated,
        # then doubled and standard rotate_half)
        inv = 1.0 / (10000.0 ** (np.arange(0, D // 2, 2) / (D // 2)))
        ang_h = pos[:, 0][:, None] * inv[None]
        ang_w = pos[:, 1][:, None] * inv[None]
        ang = np.concatenate([ang_h, ang_w], axis=1)  # [T, D/2]
        cos = jnp.asarray(np.cos(np.concatenate([ang, ang], 1)),
                          jnp.float32)  # [T, D]
        sin = jnp.asarray(np.sin(np.concatenate([ang, ang], 1)), jnp.float32)

        def rot(t):  # [T, H, D] standard rotate-half
            tf = t.astype(jnp.float32)
            t1, t2 = tf[..., : D // 2], tf[..., D // 2:]
            rh = jnp.concatenate([-t2, t1], axis=-1)
            return (tf * cos[:, None] + rh * sin[:, None]).astype(t.dtype)

        def body(x, bp):
            T = x.shape[0]
            hin = rn(x, bp["n1"])
            qkv = jnp.dot(hin, bp["wqkv"])
            if "bqkv" in bp:
                qkv = qkv + bp["bqkv"]
            q, k, vv = jnp.split(qkv.reshape(T, 3, H, D), 3, axis=1)
            q, k, vv = q[:, 0], k[:, 0], vv[:, 0]
            q, k = rot(q), rot(k)
            s = jnp.einsum("qhd,khd->hqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) / math.sqrt(D)
            p_ = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hqk,khd->qhd", p_.astype(vv.dtype), vv)
            x = x + jnp.dot(o.reshape(T, E), bp["wo"])
            hin = rn(x, bp["n2"])
            mlp = jnp.dot(
                jax.nn.silu(jnp.dot(hin, bp["w_gate"]))
                * jnp.dot(hin, bp["w_up"]), bp["w_down"])
            return x + mlp, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = rn(x, params["post_norm"])

        # spatial-merge downsample conv2d: tokens are in merge order, so
        # each consecutive m*m group is one output cell
        O = v.out_hidden_size
        xm = x.reshape(-1, m, m, E)  # [T/m^2, m, m, E]
        xm = jnp.einsum("nijc,ijco->no", xm.astype(jnp.float32),
                        params["downsample"].astype(jnp.float32))
        xm = (xm + params["downsample_b"].astype(jnp.float32)).astype(x.dtype)

        # merger
        g = jnp.dot(xm, params["merger_proj"])
        gf = g.astype(jnp.float32)
        mu = gf.mean(-1, keepdims=True)
        var = ((gf - mu) ** 2).mean(-1, keepdims=True)
        g = ((gf - mu) * jax.lax.rsqrt(var + 1e-5)
             * params["merger_ln_w"].astype(jnp.float32)
             + params["merger_ln_b"].astype(jnp.float32))
        g = jax.nn.gelu(g, approximate=False).astype(xm.dtype)
        out = jnp.dot(
            jax.nn.silu(jnp.dot(g, params["merger_gate"]))
            * jnp.dot(g, params["merger_up"]), params["merger_down"])
        return out


def apply_mrope_glm(q, k, positions_3d, inv_freq, section):
    """GLM M-RoPE: partial rotary with interleaved pairing.

    positions_3d [3, B, T]; inv_freq [rot/2]; section (t, h, w) sums to
    rot/2. Half-dim j takes its angle from stream(j) per the section
    boundaries; application is interleaved (even/odd pairs), q/k dims
    beyond rot pass through.
    """
    rot = 2 * inv_freq.shape[0]
    ang = positions_3d[..., None].astype(jnp.float32) * inv_freq  # [3,B,T,r/2]
    idx = np.concatenate([
        np.full(section[0], 0), np.full(section[1], 1),
        np.full(section[2], 2),
    ])
    # half-dim j takes its angle from stream idx[j]
    sel = jnp.take_along_axis(
        ang.transpose(1, 2, 3, 0),
        jnp.asarray(idx, jnp.int32)[None, None, :, None],
        axis=-1,
    )[..., 0]  # [B, T, rot/2]
    cos = jnp.cos(sel)[:, :, None, :]
    sin = jnp.sin(sel)[:, :, None, :]

    def rope(x):
        xf = x.astype(jnp.float32)
        xr, xp = xf[..., :rot], xf[..., rot:]
        x1 = xr[..., 0::2]
        x2 = xr[..., 1::2]
        o1 = x1 * cos - x2 * sin
        o2 = x2 * cos + x1 * sin
        out = jnp.stack([o1, o2], axis=-1).reshape(xr.shape)
        return jnp.concatenate([out, xp], axis=-1).astype(x.dtype)

    return rope(q), rope(k)


@register_model("Glm4vForConditionalGeneration")
class Glm4vFamily:
    """GLM-4 text blocks + M-RoPE + GLM4V vision tower."""

    supports_eagle = False
    is_multimodal = True
    uses_mrope = True

    @staticmethod
    def _vis_cfg(cfg: ModelConfig) -> Glm4vVisionConfig:
        return Glm4vVisionConfig.from_hf(cfg.raw.get("vision_config", {}))

    @staticmethod
    def _mrope_section(cfg: ModelConfig) -> Tuple[int, int, int]:
        rs = cfg.rope_scaling or {}
        sec = rs.get("mrope_section")
        if sec is None:
            half = int(cfg.actual_head_dim * cfg.partial_rotary_factor) // 2
            sec = [half - 2 * (half * 3 // 8), half * 3 // 8, half * 3 // 8]
        return tuple(sec)

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        k1, k2 = jax.random.split(rng)
        return {
            "language": LlamaFamily.init_params(k1, cfg, dtype),
            "vision": Glm4vVisionTower.init_params(
                k2, Glm4vFamily._vis_cfg(cfg), dtype),
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        vspecs = jax.tree.map(
            lambda _: P(),
            Glm4vVisionTower.init_params(
                jax.random.PRNGKey(0), Glm4vFamily._vis_cfg(cfg)),
            is_leaf=lambda x: not isinstance(x, dict),
        )
        return {
            "language": LlamaFamily.partition_specs(cfg),
            "vision": vspecs,
        }

    @staticmethod
    def make_encode_images(cfg: ModelConfig):
        v = Glm4vFamily._vis_cfg(cfg)

        def encode(params, patches, grid_hw):
            # engine passes (gh, gw) or (gt, gh, gw); vision is spatial
            if len(grid_hw) == 3:
                grid_hw = (grid_hw[1], grid_hw[2])
            return Glm4vVisionTower.apply(
                params["vision"], patches, grid_hw, v)[None]

        return encode

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn, logits_mode: str = "last",
                     use_lora: bool = False):
        lm_fwd = LlamaFamily.make_forward(cfg, attn_fn, logits_mode,
                                          use_lora)
        embed, head = LlamaFamily.make_embed_and_head(cfg)
        section = Glm4vFamily._mrope_section(cfg)
        rot = int(cfg.actual_head_dim * cfg.partial_rotary_factor)
        inv_freq = jnp.asarray(compute_inv_freq(rot, cfg.rope_theta, None))

        def forward(params, input_ids, positions, kv_cache, meta,
                    lora_tree=None, lora_ids=None,
                    mm_embeds=None, mm_mask=None, positions_3d=None):
            lang = params["language"]
            if positions_3d is None:
                return lm_fwd(lang, input_ids, positions, kv_cache, meta,
                              lora_tree, lora_ids)
            return _mrope_forward(lang, input_ids, positions_3d, kv_cache,
                                  meta, mm_embeds, mm_mask)

        def _mrope_forward(lang, input_ids, positions_3d, kv_cache, meta,
                           mm_embeds, mm_mask):
            from sglang_diffusion_tpu.ops.attention_xla import (
                write_kv_pages,
            )
            from sglang_diffusion_tpu.ops.norms import rms_norm
            from sglang_diffusion_tpu.quant.quantize import (
                dense_maybe_quantized as _dense,
            )

            hidden = embed(lang, input_ids)
            if mm_embeds is not None:
                hidden = jnp.where(
                    mm_mask[..., None], mm_embeds.astype(hidden.dtype),
                    hidden)
            Hq = cfg.num_attention_heads
            Hkv = cfg.num_key_value_heads
            D = cfg.actual_head_dim
            eps = cfg.rms_norm_eps
            sm_scale = 1.0 / float(np.sqrt(D))
            has_bias = cfg.attention_bias

            def body(l, carry):
                h_in, kv = carry
                lp = jax.tree.map(lambda x: x[l], lang["layers"])
                b, t, e = h_in.shape
                h = rms_norm(h_in, lp["input_norm"], eps)
                q = _dense(h, lp["wq"], lp.get("bq") if has_bias else None)
                k = _dense(h, lp["wk"], lp.get("bk") if has_bias else None)
                vv = _dense(h, lp["wv"], lp.get("bv") if has_bias else None)
                q = q.reshape(b, t, Hq, D)
                k = k.reshape(b, t, Hkv, D)
                vv = vv.reshape(b, t, Hkv, D)
                q, k = apply_mrope_glm(q, k, positions_3d, inv_freq,
                                       section)
                kv = write_kv_pages(kv, l, k, vv, meta.slot_ids)
                attn = attn_fn(q, kv, l, meta, sm_scale)
                o = _dense(attn.reshape(b, t, Hq * D), lp["wo"])
                # glm4 sandwich: post_self_attn norm on the branch
                o = rms_norm(o, lp["post_norm"], eps)
                h_in = h_in + o
                h = rms_norm(h_in, lp["pre_ffw_norm"], eps)
                gate = _dense(h, lp["w_gate"])
                up = _dense(h, lp["w_up"])
                mlp = _dense(jax.nn.silu(gate) * up, lp["w_down"])
                mlp = rms_norm(mlp, lp["post_ffw_norm"], eps)
                h_in = h_in + mlp
                return h_in, kv

            hidden, new_kv = jax.lax.fori_loop(
                0, cfg.num_hidden_layers, body, (hidden, kv_cache))
            b = hidden.shape[0]
            if logits_mode == "last":
                hidden = hidden[jnp.arange(b), meta.logit_idx]
            return head(lang, hidden), new_kv

        return forward

    # ---------------- HF checkpoint mapping ----------------
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        from sglang_diffusion_tpu.models.glm4 import Glm4Family

        m: Dict[Any, Any] = {}
        for path, (tmpl, tf) in Glm4Family.hf_weight_map(cfg).items():
            if tmpl == "lm_head.weight":
                m[("language",) + path] = (tmpl, tf)
            else:
                m[("language",) + path] = (
                    "model.language_model." + tmpl[len("model."):], tf)
        vt = "model.visual"
        blk = vt + ".blocks.{j}"
        fi = Glm4vFamily._vis_cfg(cfg).intermediate_size

        m.update({
            ("vision", "patch_embed"): (
                vt + ".patch_embed.proj.weight", "conv"),
            ("vision", "patch_embed_b"): (
                vt + ".patch_embed.proj.bias", None),
            ("vision", "post_conv_norm"): (
                vt + ".post_conv_layernorm.weight", None),
            ("vision", "pos_embed"): (
                vt + ".embeddings.position_embedding.weight", None),
            ("vision", "blocks", "n1"): (blk + ".norm1.weight", None),
            ("vision", "blocks", "n2"): (blk + ".norm2.weight", None),
            ("vision", "blocks", "wqkv"): (blk + ".attn.qkv.weight", "t"),
            ("vision", "blocks", "wo"): (blk + ".attn.proj.weight", "t"),
            ("vision", "blocks", "w_gate"): (
                blk + ".mlp.gate_proj.weight", "t"),
            ("vision", "blocks", "w_up"): (blk + ".mlp.up_proj.weight", "t"),
            ("vision", "blocks", "w_down"): (
                blk + ".mlp.down_proj.weight", "t"),
            ("vision", "post_norm"): (vt + ".post_layernorm.weight", None),
            ("vision", "downsample"): (
                vt + ".downsample.weight", "conv2d_hwio"),
            ("vision", "downsample_b"): (vt + ".downsample.bias", None),
            ("vision", "merger_proj"): (vt + ".merger.proj.weight", "t"),
            ("vision", "merger_ln_w"): (
                vt + ".merger.post_projection_norm.weight", None),
            ("vision", "merger_ln_b"): (
                vt + ".merger.post_projection_norm.bias", None),
            ("vision", "merger_gate"): (
                vt + ".merger.gate_proj.weight", "t"),
            ("vision", "merger_up"): (vt + ".merger.up_proj.weight", "t"),
            ("vision", "merger_down"): (
                vt + ".merger.down_proj.weight", "t"),
        })
        if Glm4vFamily._vis_cfg(cfg).attention_bias:
            m[("vision", "blocks", "bqkv")] = (blk + ".attn.qkv.bias", None)
        return m
