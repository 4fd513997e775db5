"""Qwen2-VL vision-language family (M-RoPE).

TPU-native re-design of the reference srt/models/qwen2_vl.py: a Qwen2
language model whose rotary embedding is 3-D (temporal/height/width
position streams, ops/rope.py apply_mrope) plus the Qwen2 vision
transformer (3D-conv patch embed expressed as a dense matmul, 2-D rotary
over patch coordinates in spatial-merge order, LayerNorm blocks, 2x2
PatchMerger projecting into the LM width).

Position semantics (HF Qwen2VLModel.get_rope_index): text tokens advance
all three streams together; an image's tokens use (t, h, w) grid
coordinates offset from the current position; after an image the text
position resumes at max(grid) + 1 — so rope positions LAG sequence indices
by rope_delta, which the engine applies to decode positions.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.multimodal.processor import MMSpan
from sglang_diffusion_tpu.ops.rope import apply_mrope, compute_inv_freq


@dataclass
class Qwen2VLVisionConfig:
    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    mlp_ratio: float = 4.0
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    out_hidden_size: int = 1536  # LM hidden
    hidden_act: str = "quick_gelu"

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @classmethod
    def from_hf(cls, v: Dict[str, Any], lm_hidden: int) -> "Qwen2VLVisionConfig":
        return cls(
            embed_dim=v.get("embed_dim", 1280),
            depth=v.get("depth", 32),
            num_heads=v.get("num_heads", 16),
            mlp_ratio=v.get("mlp_ratio", 4.0),
            patch_size=v.get("patch_size", 14),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            in_channels=v.get("in_channels", 3),
            out_hidden_size=v.get("hidden_size", lm_hidden),
            hidden_act=v.get("hidden_act", "quick_gelu"),
        )


# ---------------- vision tower ----------------


def _vis_rot_pos(grid_hw: Tuple[int, int], merge: int) -> np.ndarray:
    """(h, w) patch-grid positions in spatial-merge order (HF rot_pos_emb):
    patches are serialized so each merge x merge block is contiguous."""
    h, w = grid_hw
    hp = np.arange(h)[:, None].repeat(w, 1)
    wp = np.arange(w)[None, :].repeat(h, 0)

    def reorder(x):
        x = x.reshape(h // merge, merge, w // merge, merge)
        return x.transpose(0, 2, 1, 3).reshape(-1)

    return np.stack([reorder(hp), reorder(wp)], axis=-1)  # [T, 2]


def vis_rope_angles(grid, head_dim: int, merge: int,
                    theta: float = 10000.0) -> np.ndarray:
    """[T, head_dim/2] rotation angles: half the dims rotate by h-pos, half
    by w-pos (HF VisionRotaryEmbedding(dim=head_dim//2) + concat). For
    video grids (gt, gh, gw) the spatial table repeats per temporal group
    (HF rot_pos_emb repeats pos_ids grid_t times)."""
    if len(grid) == 3:
        gt, gh, gw = grid
    else:
        gt, (gh, gw) = 1, grid
    pos = _vis_rot_pos((gh, gw), merge)  # [T_spatial, 2]
    pos = np.tile(pos, (gt, 1))
    quarter = head_dim // 4
    inv = 1.0 / (theta ** (np.arange(quarter, dtype=np.float64) * 2 / (head_dim // 2)))
    hang = pos[:, 0:1] * inv[None]
    wang = pos[:, 1:2] * inv[None]
    return np.concatenate([hang, wang], axis=1).astype(np.float32)  # [T, D/2]


class Qwen2VisionTower:
    @staticmethod
    def init_params(rng, v: Qwen2VLVisionConfig, dtype=jnp.float32):
        E, D = v.embed_dim, v.head_dim
        F = int(E * v.mlp_ratio)
        L = v.depth
        merged = E * v.spatial_merge_size ** 2
        ks = jax.random.split(rng, 10)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        return {
            "patch_embed": init(ks[0], (v.patch_dim, E)),
            "blocks": {
                "ln1_w": jnp.ones((L, E), dtype),
                "ln1_b": jnp.zeros((L, E), dtype),
                "ln2_w": jnp.ones((L, E), dtype),
                "ln2_b": jnp.zeros((L, E), dtype),
                "wqkv": init(ks[1], (L, E, 3 * E)),
                "bqkv": jnp.zeros((L, 3 * E), dtype),
                "wo": init(ks[2], (L, E, E)),
                "bo": jnp.zeros((L, E), dtype),
                "w_fc1": init(ks[3], (L, E, F)),
                "b_fc1": jnp.zeros((L, F), dtype),
                "w_fc2": init(ks[4], (L, F, E)),
                "b_fc2": jnp.zeros((L, E), dtype),
            },
            "merger_ln_w": jnp.ones((E,), dtype),
            "merger_ln_b": jnp.zeros((E,), dtype),
            "merger_w1": init(ks[5], (merged, merged)),
            "merger_b1": jnp.zeros((merged,), dtype),
            "merger_w2": init(ks[6], (merged, v.out_hidden_size)),
            "merger_b2": jnp.zeros((v.out_hidden_size,), dtype),
        }

    @staticmethod
    def apply(params, patches: jax.Array, grid_hw: Tuple[int, int],
              v: Qwen2VLVisionConfig) -> jax.Array:
        """patches [T, patch_dim] in spatial-merge order -> merged image
        embeddings [T / merge^2, out_hidden]."""
        E, H, D = v.embed_dim, v.num_heads, v.head_dim
        eps = 1e-6
        act = (lambda x: x * jax.nn.sigmoid(1.702 * x)) \
            if v.hidden_act == "quick_gelu" else \
            (lambda x: jax.nn.gelu(x, approximate=True))

        def ln(x, w, b):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)

        ang = jnp.asarray(vis_rope_angles(grid_hw, D, v.spatial_merge_size))
        cos, sin = jnp.cos(ang), jnp.sin(ang)  # [T, D/2]

        def rot(x):  # [T, H, D], rotate-half convention over doubled angles
            c = jnp.concatenate([cos, cos], axis=-1)[:, None, :]
            s = jnp.concatenate([sin, sin], axis=-1)[:, None, :]
            xf = x.astype(jnp.float32)
            half = x.shape[-1] // 2
            rotated = jnp.concatenate([-xf[..., half:], xf[..., :half]], -1)
            return (xf * c + rotated * s).astype(x.dtype)

        x = patches @ params["patch_embed"]  # [T, E]

        def body(x, bp):
            t = x.shape[0]
            h = ln(x, bp["ln1_w"], bp["ln1_b"])
            qkv = (h @ bp["wqkv"] + bp["bqkv"]).reshape(t, 3, H, D)
            q, k, val = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = rot(q), rot(k)
            s = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                           k.astype(jnp.float32)) / math.sqrt(D)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hts,shd->thd", p, val.astype(jnp.float32))
            x = x + (o.reshape(t, E).astype(x.dtype) @ bp["wo"] + bp["bo"])
            h = ln(x, bp["ln2_w"], bp["ln2_b"])
            ff = act((h @ bp["w_fc1"] + bp["b_fc1"]).astype(jnp.float32))
            x = x + (ff.astype(x.dtype) @ bp["w_fc2"] + bp["b_fc2"])
            return x, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = ln(x, params["merger_ln_w"], params["merger_ln_b"])
        merged = x.reshape(-1, E * v.spatial_merge_size ** 2)
        # PatchMerger uses exact-erf GELU (HF nn.GELU), unlike the blocks
        h = jax.nn.gelu(
            (merged @ params["merger_w1"] + params["merger_b1"]
             ).astype(jnp.float32), approximate=False,
        ).astype(x.dtype)
        return h @ params["merger_w2"] + params["merger_b2"]


# ---------------- Qwen2.5-VL windowed vision tower ----------------


@dataclass
class Qwen25VLVisionConfig:
    """Qwen2.5-VL ViT (reference srt/models/qwen2_5_vl.py): RMSNorm blocks,
    SwiGLU MLP, and WINDOWED attention everywhere except
    fullatt_block_indexes."""

    embed_dim: int = 1280
    depth: int = 32
    num_heads: int = 16
    intermediate_size: int = 3420
    patch_size: int = 14
    temporal_patch_size: int = 2
    spatial_merge_size: int = 2
    in_channels: int = 3
    out_hidden_size: int = 1536
    window_size: int = 112
    fullatt_block_indexes: Tuple[int, ...] = (7, 15, 23, 31)

    @property
    def head_dim(self) -> int:
        return self.embed_dim // self.num_heads

    @property
    def patch_dim(self) -> int:
        return self.in_channels * self.temporal_patch_size * self.patch_size ** 2

    @classmethod
    def from_hf(cls, v: Dict[str, Any], lm_hidden: int) -> "Qwen25VLVisionConfig":
        return cls(
            embed_dim=v.get("hidden_size", 1280),
            depth=v.get("depth", 32),
            num_heads=v.get("num_heads", 16),
            intermediate_size=v.get("intermediate_size", 3420),
            patch_size=v.get("patch_size", 14),
            temporal_patch_size=v.get("temporal_patch_size", 2),
            spatial_merge_size=v.get("spatial_merge_size", 2),
            in_channels=v.get("in_channels", 3),
            out_hidden_size=v.get("out_hidden_size", lm_hidden),
            window_size=v.get("window_size", 112),
            fullatt_block_indexes=tuple(
                v.get("fullatt_block_indexes", (7, 15, 23, 31))
            ),
        )


def window_ids_for_grid(
    grid, merge: int, patch_size: int, window_size: int
) -> np.ndarray:
    """Per-TOKEN window id [T] in spatial-merge serialization order.

    TPU re-design of HF get_window_index / cu_window_seqlens: instead of
    permuting tokens into variable-length windows and packing cu_seqlens,
    we label each token with its window and run attention under the static
    block mask win_id[t] == win_id[s] — mathematically identical (attention
    is permutation-equivariant within a window) and XLA-friendly (one
    static [T, T] mask, no gather/scatter, no dynamic seqlens)."""
    if len(grid) == 3:
        gt, gh, gw = grid
    else:
        gt, (gh, gw) = 1, grid
    lh, lw = gh // merge, gw // merge
    win_units = window_size // merge // patch_size  # merge-units per window
    nww = -(-lw // win_units)
    nwh = -(-lh // win_units)
    r = np.arange(lh)[:, None].repeat(lw, 1).reshape(-1)  # unit row
    c = np.arange(lw)[None, :].repeat(lh, 0).reshape(-1)  # unit col
    win_rc = (r // win_units) * nww + (c // win_units)  # [lh*lw]
    per_frame = lh * lw
    units = np.concatenate(
        [t * nwh * nww + win_rc for t in range(gt)]
    )  # [gt*lh*lw]
    assert units.shape[0] == gt * per_frame
    return np.repeat(units, merge * merge).astype(np.int32)  # [T]


class Qwen25VisionTower:
    @staticmethod
    def init_params(rng, v: Qwen25VLVisionConfig, dtype=jnp.float32):
        E, F, L = v.embed_dim, v.intermediate_size, v.depth
        merged = E * v.spatial_merge_size ** 2
        ks = jax.random.split(rng, 8)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        return {
            "patch_embed": init(ks[0], (v.patch_dim, E)),
            "blocks": {
                "norm1": jnp.ones((L, E), dtype),
                "norm2": jnp.ones((L, E), dtype),
                "wqkv": init(ks[1], (L, E, 3 * E)),
                "bqkv": jnp.zeros((L, 3 * E), dtype),
                "wo": init(ks[2], (L, E, E)),
                "bo": jnp.zeros((L, E), dtype),
                "w_gate": init(ks[3], (L, E, F)),
                "b_gate": jnp.zeros((L, F), dtype),
                "w_up": init(ks[4], (L, E, F)),
                "b_up": jnp.zeros((L, F), dtype),
                "w_down": init(ks[5], (L, F, E)),
                "b_down": jnp.zeros((L, E), dtype),
            },
            "merger_ln": jnp.ones((E,), dtype),
            "merger_w1": init(ks[6], (merged, merged)),
            "merger_b1": jnp.zeros((merged,), dtype),
            "merger_w2": init(ks[7], (merged, v.out_hidden_size)),
            "merger_b2": jnp.zeros((v.out_hidden_size,), dtype),
        }

    @staticmethod
    def apply(params, patches: jax.Array, grid,
              v: Qwen25VLVisionConfig) -> jax.Array:
        """patches [T, patch_dim] in spatial-merge order -> [T/merge^2,
        out_hidden]. Windowed blocks attend under the block-diagonal
        win_id mask; fullatt_block_indexes attend globally."""
        E, H, D = v.embed_dim, v.num_heads, v.head_dim
        eps = 1e-6

        def rn(x, w):  # RMSNorm (HF Qwen2RMSNorm, eps 1e-6)
            xf = x.astype(jnp.float32)
            var = (xf * xf).mean(-1, keepdims=True)
            return (xf * jax.lax.rsqrt(var + eps) * w).astype(x.dtype)

        ang = jnp.asarray(vis_rope_angles(grid, D, v.spatial_merge_size))
        cos, sin = jnp.cos(ang), jnp.sin(ang)

        def rot(x):
            c = jnp.concatenate([cos, cos], axis=-1)[:, None, :]
            s = jnp.concatenate([sin, sin], axis=-1)[:, None, :]
            xf = x.astype(jnp.float32)
            half = x.shape[-1] // 2
            rotated = jnp.concatenate([-xf[..., half:], xf[..., :half]], -1)
            return (xf * c + rotated * s).astype(x.dtype)

        win_ids = window_ids_for_grid(
            grid, v.spatial_merge_size, v.patch_size, v.window_size
        )
        win_eq = jnp.asarray(win_ids[:, None] == win_ids[None, :])  # [T, T]
        is_full = jnp.zeros((v.depth,), bool).at[
            jnp.asarray(v.fullatt_block_indexes)
        ].set(True)

        x = patches @ params["patch_embed"]  # [T, E]

        def body(x, xs):
            bp, full = xs
            t = x.shape[0]
            h = rn(x, bp["norm1"])
            qkv = (h @ bp["wqkv"] + bp["bqkv"]).reshape(t, 3, H, D)
            q, k, val = qkv[:, 0], qkv[:, 1], qkv[:, 2]
            q, k = rot(q), rot(k)
            s = jnp.einsum("thd,shd->hts", q.astype(jnp.float32),
                           k.astype(jnp.float32)) / math.sqrt(D)
            mask = jnp.logical_or(full, win_eq)  # full layers see all
            s = jnp.where(mask[None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("hts,shd->thd", p, val.astype(jnp.float32))
            x = x + (o.reshape(t, E).astype(x.dtype) @ bp["wo"] + bp["bo"])
            h = rn(x, bp["norm2"])
            gate = (h @ bp["w_gate"] + bp["b_gate"]).astype(jnp.float32)
            up = (h @ bp["w_up"] + bp["b_up"]).astype(jnp.float32)
            ff = (jax.nn.silu(gate) * up).astype(x.dtype)
            x = x + (ff @ bp["w_down"] + bp["b_down"])
            return x, None

        x, _ = jax.lax.scan(body, x, (params["blocks"], is_full))
        x = rn(x, params["merger_ln"])
        merged = x.reshape(-1, E * v.spatial_merge_size ** 2)
        h = jax.nn.gelu(
            (merged @ params["merger_w1"] + params["merger_b1"]
             ).astype(jnp.float32), approximate=False,
        ).astype(x.dtype)
        return h @ params["merger_w2"] + params["merger_b2"]


# ---------------- M-RoPE position computation ----------------


def compute_mrope_positions(
    seq_len: int,
    spans: List[MMSpan],
    grids: List[Tuple[int, ...]],  # per item: merged (h, w) or (t, h, w)
    keeps: Optional[List[Optional[np.ndarray]]] = None,  # EVS masks
    second_per_grid_ts: Optional[List[Optional[float]]] = None,
    tokens_per_second: float = 1.0,
) -> Tuple[np.ndarray, int]:
    """Positions [3, T] (temporal, height, width) for one sequence + the
    rope_delta (rope position of the NEXT token minus seq_len; <= 0).
    Mirrors HF Qwen2VLModel.get_rope_index for image AND video inputs
    ((t, h, w) grids: the temporal stream advances per frame group).
    keeps[i] (EVS, multimodal/evs.py): a bool mask over item i's full grid;
    retained tokens keep their ORIGINAL grid coordinates and the text
    position resumes from the full-grid max as if nothing were pruned.
    second_per_grid_ts[i] (Qwen2.5-VL video, reference
    srt/layers/rotary_embedding/mrope_rope_index.py:154): the temporal
    stream is scaled to absolute time — t_pos = frame_group_index *
    second_per_grid_t * vision_config.tokens_per_second. Qwen2-VL passes
    None entries (unscaled per-frame indices)."""
    pos = np.zeros((3, seq_len), np.int64)
    cur = 0  # next text rope position
    idx = 0  # next sequence index to fill
    for j, (span, grid) in enumerate(zip(spans, grids)):
        gt, gh, gw = (1,) + tuple(grid) if len(grid) == 2 else tuple(grid)
        # text run before the item
        n_text = span.offset - idx
        for ax in range(3):
            pos[ax, idx : span.offset] = cur + np.arange(n_text)
        cur += n_text
        idx = span.offset
        t_idx = np.arange(gt)
        spg = second_per_grid_ts[j] if second_per_grid_ts is not None else None
        if spg is not None:
            t_idx = (t_idx.astype(np.float64) * spg * tokens_per_second
                     ).astype(np.int64)
        tt = t_idx[:, None, None].repeat(gh, 1).repeat(gw, 2).reshape(-1)
        hh = np.arange(gh)[None, :, None].repeat(gt, 0).repeat(gw, 2).reshape(-1)
        ww = np.arange(gw)[None, None, :].repeat(gt, 0).repeat(gh, 1).reshape(-1)
        t_extent = int(t_idx[-1]) + 1 if gt else 1
        keep = keeps[j] if keeps is not None else None
        if keep is not None:
            tt, hh, ww = tt[keep], hh[keep], ww[keep]
        assert span.length == len(tt), (span.length, gt, gh, gw)
        pos[0, idx : idx + span.length] = cur + tt
        pos[1, idx : idx + span.length] = cur + hh
        pos[2, idx : idx + span.length] = cur + ww
        cur += max(t_extent, gh, gw)
        idx += span.length
    n_tail = seq_len - idx
    for ax in range(3):
        pos[ax, idx:] = cur + np.arange(n_tail)
    cur += n_tail
    return pos, cur - seq_len


# ---------------- model family ----------------


@register_model("Qwen2VLForConditionalGeneration")
class Qwen2VLFamily:
    """Qwen2 LM + M-RoPE + Qwen2 vision tower. The language decode path is
    LlamaFamily's (text rope positions are scalar: engine adds rope_delta);
    prefill with images runs the mrope forward with positions_3d."""

    supports_eagle = False
    is_multimodal = True
    uses_mrope = True

    @staticmethod
    def _vis_cfg(cfg: ModelConfig) -> Qwen2VLVisionConfig:
        return Qwen2VLVisionConfig.from_hf(
            cfg.raw.get("vision_config", {}), cfg.hidden_size
        )

    @staticmethod
    def _mrope_section(cfg: ModelConfig) -> Tuple[int, int, int]:
        rs = cfg.rope_scaling or {}
        sec = rs.get("mrope_section")
        if sec is None:
            d4 = cfg.actual_head_dim // 8
            sec = [cfg.actual_head_dim // 2 - 2 * d4, d4, d4]
        return tuple(sec)

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        k1, k2 = jax.random.split(rng)
        return {
            "language": LlamaFamily.init_params(k1, cfg, dtype),
            "vision": Qwen2VisionTower.init_params(
                k2, Qwen2VLFamily._vis_cfg(cfg), dtype
            ),
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        vspecs = jax.tree.map(
            lambda _: P(),
            Qwen2VisionTower.init_params(
                jax.random.PRNGKey(0), Qwen2VLFamily._vis_cfg(cfg)
            ),
            is_leaf=lambda x: not isinstance(x, dict),
        )
        return {
            "language": LlamaFamily.partition_specs(cfg),
            "vision": vspecs,
        }

    # ---------------- vision encode ----------------
    @staticmethod
    def make_encode_images(cfg: ModelConfig):
        """encode(params, patches [T, patch_dim], grid_hw static)
        -> [T/merge^2, E_lm]. Per-image call (grids vary)."""
        v = Qwen2VLFamily._vis_cfg(cfg)

        def encode(params, patches, grid_hw):
            return Qwen2VisionTower.apply(params["vision"], patches, grid_hw, v)

        return encode

    # ---------------- language forward ----------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn, logits_mode: str = "last",
                     use_lora: bool = False):
        lm_fwd = LlamaFamily.make_forward(cfg, attn_fn, logits_mode, use_lora)
        layer_body = LlamaFamily.make_layer_body(cfg, attn_fn)
        embed, head = LlamaFamily.make_embed_and_head(cfg)
        section = Qwen2VLFamily._mrope_section(cfg)
        inv_freq = jnp.asarray(
            compute_inv_freq(cfg.actual_head_dim, cfg.rope_theta, None)
        )

        def forward(params, input_ids, positions, kv_cache, meta,
                    lora_tree=None, lora_ids=None,
                    mm_embeds=None, mm_mask=None, positions_3d=None):
            lang = params["language"]
            if positions_3d is None:
                # text-only path: all three streams equal -> plain rope at
                # the (rope_delta-adjusted) scalar positions
                return lm_fwd(lang, input_ids, positions, kv_cache, meta,
                              lora_tree, lora_ids)
            return _mrope_forward(lang, input_ids, positions_3d, kv_cache,
                                  meta, mm_embeds, mm_mask)

        def _mrope_forward(lang, input_ids, positions_3d, kv_cache, meta,
                           mm_embeds, mm_mask):
            hidden = embed(lang, input_ids)
            if mm_embeds is not None:
                hidden = jnp.where(
                    mm_mask[..., None], mm_embeds.astype(hidden.dtype), hidden
                )

            # mrope layer body: identical to LlamaFamily's except rope
            from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
            from sglang_diffusion_tpu.ops.norms import rms_norm
            from sglang_diffusion_tpu.quant.quantize import (
                dense_maybe_quantized as _dense,
            )

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
                if cfg.qk_norm:
                    q = rms_norm(q, lp["q_norm"], eps)
                    k = rms_norm(k, lp["k_norm"], eps)
                q, k = apply_mrope(q, k, positions_3d, inv_freq, section)
                kv = write_kv_pages(kv, l, k, vv, meta.slot_ids)
                attn = attn_fn(q, kv, l, meta, sm_scale)
                o = _dense(attn.reshape(b, t, Hq * D), lp["wo"])
                h_in = h_in + o
                h = rms_norm(h_in, lp["post_norm"], eps)
                gate = _dense(h, lp["w_gate"])
                up = _dense(h, lp["w_up"])
                h_in = h_in + _dense(jax.nn.silu(gate) * up, lp["w_down"])
                return h_in, kv

            hidden, new_kv = jax.lax.fori_loop(
                0, cfg.num_hidden_layers, body, (hidden, kv_cache)
            )
            b = hidden.shape[0]
            if logits_mode == "last":
                hidden = hidden[jnp.arange(b), meta.logit_idx]
            return head(lang, hidden), new_kv

        return forward

    # ---------------- HF checkpoint mapping ----------------
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        m: Dict[Any, Any] = {}
        for path, (tmpl, tf) in LlamaFamily.hf_weight_map(cfg).items():
            if tmpl == "lm_head.weight":
                m[("language",) + path] = (tmpl, tf)
            else:
                assert tmpl.startswith("model.")
                m[("language",) + path] = (
                    "model.language_model." + tmpl[len("model."):], tf,
                )
        vt = "model.visual"
        blk = vt + ".blocks.{j}"
        m.update({
            ("vision", "patch_embed"): (vt + ".patch_embed.proj.weight", "conv"),
            ("vision", "blocks", "ln1_w"): (blk + ".norm1.weight", None),
            ("vision", "blocks", "ln1_b"): (blk + ".norm1.bias", None),
            ("vision", "blocks", "ln2_w"): (blk + ".norm2.weight", None),
            ("vision", "blocks", "ln2_b"): (blk + ".norm2.bias", None),
            ("vision", "blocks", "wqkv"): (blk + ".attn.qkv.weight", "t"),
            ("vision", "blocks", "bqkv"): (blk + ".attn.qkv.bias", None),
            ("vision", "blocks", "wo"): (blk + ".attn.proj.weight", "t"),
            ("vision", "blocks", "bo"): (blk + ".attn.proj.bias", None),
            ("vision", "blocks", "w_fc1"): (blk + ".mlp.fc1.weight", "t"),
            ("vision", "blocks", "b_fc1"): (blk + ".mlp.fc1.bias", None),
            ("vision", "blocks", "w_fc2"): (blk + ".mlp.fc2.weight", "t"),
            ("vision", "blocks", "b_fc2"): (blk + ".mlp.fc2.bias", None),
            ("vision", "merger_ln_w"): (vt + ".merger.ln_q.weight", None),
            ("vision", "merger_ln_b"): (vt + ".merger.ln_q.bias", None),
            ("vision", "merger_w1"): (vt + ".merger.mlp.0.weight", "t"),
            ("vision", "merger_b1"): (vt + ".merger.mlp.0.bias", None),
            ("vision", "merger_w2"): (vt + ".merger.mlp.2.weight", "t"),
            ("vision", "merger_b2"): (vt + ".merger.mlp.2.bias", None),
        })
        return m


@register_model("Qwen2_5_VLForConditionalGeneration")
class Qwen25VLFamily(Qwen2VLFamily):
    """Qwen2.5-VL: same M-RoPE language path as Qwen2-VL; the vision tower
    swaps LayerNorm->RMSNorm, MLP->SwiGLU, and uses windowed attention
    (reference srt/models/qwen2_5_vl.py). Window packing is re-expressed as
    a block-diagonal mask (see window_ids_for_grid)."""

    @staticmethod
    def _vis_cfg(cfg: ModelConfig) -> Qwen25VLVisionConfig:
        return Qwen25VLVisionConfig.from_hf(
            cfg.raw.get("vision_config", {}), cfg.hidden_size
        )

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        k1, k2 = jax.random.split(rng)
        return {
            "language": LlamaFamily.init_params(k1, cfg, dtype),
            "vision": Qwen25VisionTower.init_params(
                k2, Qwen25VLFamily._vis_cfg(cfg), dtype
            ),
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        vspecs = jax.tree.map(
            lambda _: P(),
            Qwen25VisionTower.init_params(
                jax.random.PRNGKey(0), Qwen25VLFamily._vis_cfg(cfg)
            ),
            is_leaf=lambda x: not isinstance(x, dict),
        )
        return {
            "language": LlamaFamily.partition_specs(cfg),
            "vision": vspecs,
        }

    @staticmethod
    def make_encode_images(cfg: ModelConfig):
        v = Qwen25VLFamily._vis_cfg(cfg)

        def encode(params, patches, grid_hw):
            return Qwen25VisionTower.apply(params["vision"], patches,
                                           grid_hw, v)

        return encode

    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        m: Dict[Any, Any] = {}
        for path, (tmpl, tf) in LlamaFamily.hf_weight_map(cfg).items():
            if tmpl == "lm_head.weight":
                m[("language",) + path] = (tmpl, tf)
            else:
                assert tmpl.startswith("model.")
                m[("language",) + path] = (
                    "model.language_model." + tmpl[len("model."):], tf,
                )
        vt = "model.visual"
        blk = vt + ".blocks.{j}"
        m.update({
            ("vision", "patch_embed"): (vt + ".patch_embed.proj.weight", "conv"),
            ("vision", "blocks", "norm1"): (blk + ".norm1.weight", None),
            ("vision", "blocks", "norm2"): (blk + ".norm2.weight", None),
            ("vision", "blocks", "wqkv"): (blk + ".attn.qkv.weight", "t"),
            ("vision", "blocks", "bqkv"): (blk + ".attn.qkv.bias", None),
            ("vision", "blocks", "wo"): (blk + ".attn.proj.weight", "t"),
            ("vision", "blocks", "bo"): (blk + ".attn.proj.bias", None),
            ("vision", "blocks", "w_gate"): (blk + ".mlp.gate_proj.weight", "t"),
            ("vision", "blocks", "b_gate"): (blk + ".mlp.gate_proj.bias", None),
            ("vision", "blocks", "w_up"): (blk + ".mlp.up_proj.weight", "t"),
            ("vision", "blocks", "b_up"): (blk + ".mlp.up_proj.bias", None),
            ("vision", "blocks", "w_down"): (blk + ".mlp.down_proj.weight", "t"),
            ("vision", "blocks", "b_down"): (blk + ".mlp.down_proj.bias", None),
            ("vision", "merger_ln"): (vt + ".merger.ln_q.weight", None),
            ("vision", "merger_w1"): (vt + ".merger.mlp.0.weight", "t"),
            ("vision", "merger_b1"): (vt + ".merger.mlp.0.bias", None),
            ("vision", "merger_w2"): (vt + ".merger.mlp.2.weight", "t"),
            ("vision", "merger_b2"): (vt + ".merger.mlp.2.bias", None),
        })
        return m
