"""DeepSeek-VL2 family (DeepseekVL2ForCausalLM).

Reference analog: srt/models/deepseek_vl2.py — a SigLIP-so400m vision
tower (timm ``vit_so400m_patch14_siglip_384``, reference line 208) feeding
a ``downsample_mlp_gelu`` MLP projector (reference lines 71-101 / 128-149:
2x2 space-to-depth then a GELU MLP down to the LM width), whose per-tile
embeddings are composed into the "2D tile tag" layout (reference
get_image_feature, lines 260-359): the global view gets an
``image_newline`` column appended to each row, the local tiles are
stitched into one (th*h, tw*w) mosaic that also gets a newline column,
and a ``view_seperator`` token sits between the two views
(``global_view_pos`` picks the order). The language half is the MLA
DeepSeek stack (reference line 194 delegates to DeepseekV2ForCausalLM) —
here the shared :class:`DeepseekFamily` implementation.

TPU-first notes:
- the tile composer is pure static-shape jnp (reshape/transpose/concat):
  one executable per (tw, th) crop config, no per-tile host loop;
- multimodal injection extends the embedding TABLE instead of splicing
  hidden states: the projected image embeddings are appended as rows
  ``[V, V+B*T)`` and masked input ids are remapped to their appended row,
  so the unmodified DeepseekFamily forward (fori_loop over MoE layers,
  latent KV cache) runs untouched. This costs one HBM-sequential copy of
  the embed table on image-bearing prefill steps only — the rare variant
  — and keeps decode on the exact same executable as text-only serving.

The deepseek-vl2-tiny checkpoint forbids MLA (reference line 196) and
uses the classic dense-attention Deepseek LM; that variant is out of
scope here — this family targets the MLA small/base checkpoints.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.deepseek import DeepseekFamily
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.models.vision import (
    init_siglip_params,
    make_siglip_forward,
)


# ---------------- MLP projector ----------------


def _proj_cfg(cfg: ModelConfig) -> Dict[str, Any]:
    pc = dict(cfg.raw.get("projector_config", {}))
    pc.setdefault("projector_type", "downsample_mlp_gelu")
    pc.setdefault("input_dim", cfg.vision.hidden_size)
    pc.setdefault("n_embed", cfg.hidden_size)
    pc.setdefault("depth", 2)
    pc.setdefault("mlp_ratio", 1)
    pc.setdefault("downsample_ratio", 2)
    return pc


def init_projector_params(rng: jax.Array, cfg: ModelConfig,
                          dtype=jnp.bfloat16) -> Dict[str, Any]:
    """Layer list mirrors the reference ModuleList: ``downsample_mlp_gelu``
    is Linear(C*ds^2 -> n*ratio), GELU, [Linear(n*ratio -> n*ratio),
    GELU]*, Linear(n*ratio -> n); ``mlp_gelu`` is Linear(C -> n),
    [GELU, Linear(n -> n)]*."""
    pc = _proj_cfg(cfg)
    n, depth = pc["n_embed"], pc["depth"]

    def init(key, din, dout):
        w = jax.random.normal(key, (din, dout), jnp.float32) * 0.02
        return {"w": w.astype(dtype), "b": jnp.zeros((dout,), dtype)}

    keys = jax.random.split(rng, max(depth, 1))
    if pc["projector_type"] == "downsample_mlp_gelu":
        ds, ratio = pc["downsample_ratio"], pc["mlp_ratio"]
        dims = ([pc["input_dim"] * ds * ds]
                + [n * ratio] * max(depth - 1, 0) + [n])
    elif pc["projector_type"] == "mlp_gelu":
        dims = [pc["input_dim"]] + [n] * depth
    else:
        raise ValueError(f"projector type {pc['projector_type']}")
    return {"layers": {
        str(i): init(keys[i % len(keys)], dims[i], dims[i + 1])
        for i in range(len(dims) - 1)
    }}


def apply_projector(params: Dict[str, Any], cfg: ModelConfig,
                    x: jax.Array) -> jax.Array:
    """x: [N, hw, C] tower features -> [N, hw', n_embed].

    The space-to-depth matches torch ``F.unfold(kernel=ds, stride=ds)``
    channel ordering (C-major then kh, kw — reference lines 141-149):
    [N,h,w,C] -> [N,h/ds,ds,w/ds,ds,C] -> (C, ds_h, ds_w)-ordered last
    axis."""
    pc = _proj_cfg(cfg)
    if pc["projector_type"] == "downsample_mlp_gelu":
        nb, hw, c = x.shape
        h = w = int(round(float(np.sqrt(hw))))
        ds = pc["downsample_ratio"]
        pad = (-h) % ds
        x = x.reshape(nb, h, w, c)
        if pad:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, pad), (0, 0)))
        hp = h + pad
        x = x.reshape(nb, hp // ds, ds, hp // ds, ds, c)
        x = x.transpose(0, 1, 3, 5, 2, 4)  # [N, h', w', C, ds, ds]
        x = x.reshape(nb, (hp // ds) * (hp // ds), c * ds * ds)
    for i in range(len(params["layers"])):
        lp = params["layers"][str(i)]
        if i:
            x = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
        x = (x.astype(lp["w"].dtype) @ lp["w"]) + lp["b"]
    return x


# ---------------- 2D tile-tag composition ----------------


def compose_tiles(embeds: jax.Array, newline: jax.Array, sep: jax.Array,
                  tw: int, th: int, global_view_pos: str = "head"
                  ) -> jax.Array:
    """embeds: [1 + tw*th, hw, D] (global view first, then local tiles,
    row-major th x tw). Returns the flat [T_img, D] sequence of the
    reference's 2D tile tag (lines 296-356): global rows each end with
    ``image_newline``, local tiles form one mosaic whose rows end with
    ``image_newline``, and ``view_seperator`` splits the views."""
    n, hw, d = embeds.shape
    assert n == 1 + tw * th, (n, tw, th)
    h = w = int(round(float(np.sqrt(hw))))
    nl = newline.astype(embeds.dtype)

    g = embeds[0].reshape(h, w, d)
    g = jnp.concatenate([g, jnp.tile(nl, (h, 1, 1))], axis=1)
    g = g.reshape(h * (w + 1), d)

    loc = embeds[1:].reshape(th, tw, h, w, d)
    loc = loc.transpose(0, 2, 1, 3, 4).reshape(th * h, tw * w, d)
    loc = jnp.concatenate([loc, jnp.tile(nl, (th * h, 1, 1))], axis=1)
    loc = loc.reshape(th * h * (tw * w + 1), d)

    s = sep.astype(embeds.dtype).reshape(1, d)
    parts = ([g, s, loc] if global_view_pos == "head" else [loc, s, g])
    return jnp.concatenate(parts, axis=0)


@register_model("DeepseekVL2ForCausalLM")
class DeepseekVL2Family:
    """Params: LM under "language" (DeepseekFamily layout), tower under
    "vision" (SigLIP layout), "projector", "image_newline",
    "view_seperator"."""

    supports_eagle = False
    is_multimodal = True

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        k_lang, k_vis, k_proj, k1, k2 = jax.random.split(rng, 5)
        n = _proj_cfg(cfg)["n_embed"]
        std = 1.0 / float(np.sqrt(n))
        return {
            "language": DeepseekFamily.init_params(k_lang, cfg, dtype),
            "vision": init_siglip_params(k_vis, cfg.vision, dtype),
            "projector": init_projector_params(k_proj, cfg, dtype),
            "image_newline": (
                jax.random.normal(k1, (n,), jnp.float32) * std
            ).astype(dtype),
            "view_seperator": (
                jax.random.normal(k2, (n,), jnp.float32) * std
            ).astype(dtype),
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        reps = jax.tree.map(
            lambda _: P(),
            DeepseekVL2Family.init_params(jax.random.PRNGKey(0), cfg),
        )
        reps["language"] = DeepseekFamily.partition_specs(cfg)
        return reps

    # ---------------- vision encode (runs once per image) ----------------
    @staticmethod
    def make_encode_images(cfg: ModelConfig) -> Callable:
        """encode(params, pixel_values [1+tw*th, 3, H, W], crop=(tw, th))
        -> [T_img, E_lm]; one compiled variant per crop config."""
        vis_fwd = make_siglip_forward(cfg.vision)
        gpos = cfg.raw.get("global_view_pos", "head")
        if cfg.raw.get("tile_tag", "2D") != "2D":
            raise ValueError("tile tag should be 2D")

        def encode(params, pixel_values, crop=(1, 1)):
            tw, th = int(crop[0]), int(crop[1])
            feats = vis_fwd(params["vision"], pixel_values)
            emb = apply_projector(params["projector"], cfg, feats)
            return compose_tiles(emb, params["image_newline"],
                                 params["view_seperator"], tw, th, gpos)

        return encode

    # ---------------- language forward with mm injection ----------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", use_lora: bool = False):
        lm_fwd = DeepseekFamily.make_forward(cfg, attn_fn, logits_mode)

        def forward(params, input_ids, positions, kv_cache, meta,
                    lora_tree=None, lora_ids=None,
                    mm_embeds=None, mm_mask=None):
            lang = params["language"]
            if mm_embeds is None:
                return lm_fwd(lang, input_ids, positions, kv_cache, meta)
            # embed-table extension: mm rows appended at [V, V+B*T),
            # masked ids remapped to their own appended row — the plain
            # LM forward then embeds image positions from the new rows.
            b, t = input_ids.shape
            v = lang["embed"].shape[0]
            flat = mm_embeds.reshape(b * t, -1).astype(lang["embed"].dtype)
            embed2 = jnp.concatenate([lang["embed"], flat], axis=0)
            rows = (v + jnp.arange(b * t, dtype=input_ids.dtype)
                    ).reshape(b, t)
            ids2 = jnp.where(mm_mask, rows, input_ids)
            return lm_fwd({**lang, "embed": embed2}, ids2, positions,
                          kv_cache, meta)

        return forward

    # ---------------- HF checkpoint mapping ----------------
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        """Checkpoint layout: ``language.*`` (DeepseekV2 names),
        ``vision.*`` (timm ViT names: blocks.{j}.attn.qkv fused),
        ``projector.layers.{k}``, top-level ``image_newline`` /
        ``view_seperator`` (reference load_weights, lines 236-254)."""
        e = cfg.vision.hidden_size
        m: Dict[Any, Any] = {}
        for path, (tmpl, tf) in DeepseekFamily.hf_weight_map(cfg).items():
            m[("language",) + path] = ("language." + tmpl, tf)

        vt, blk = "vision", "vision.blocks.{j}"

        def qkv(i):  # timm fused qkv [3E, E] -> our per-slice [E, E]
            return lambda w: np.ascontiguousarray(
                w[i * e:(i + 1) * e].T)

        def qkv_b(i):
            return lambda w: np.ascontiguousarray(w[i * e:(i + 1) * e])

        m.update({
            ("vision", "patch_embed"): (
                vt + ".patch_embed.proj.weight", "conv"),
            ("vision", "patch_embed_b"): (
                vt + ".patch_embed.proj.bias", None),
            ("vision", "pos_embed"): (vt + ".pos_embed", lambda w: w[0]),
            ("vision", "post_ln", "w"): (vt + ".norm.weight", None),
            ("vision", "post_ln", "b"): (vt + ".norm.bias", None),
            ("vision", "layers", "ln1_w"): (blk + ".norm1.weight", None),
            ("vision", "layers", "ln1_b"): (blk + ".norm1.bias", None),
            ("vision", "layers", "ln2_w"): (blk + ".norm2.weight", None),
            ("vision", "layers", "ln2_b"): (blk + ".norm2.bias", None),
            ("vision", "layers", "wq"): (blk + ".attn.qkv.weight", qkv(0)),
            ("vision", "layers", "bq"): (blk + ".attn.qkv.bias", qkv_b(0)),
            ("vision", "layers", "wk"): (blk + ".attn.qkv.weight", qkv(1)),
            ("vision", "layers", "bk"): (blk + ".attn.qkv.bias", qkv_b(1)),
            ("vision", "layers", "wv"): (blk + ".attn.qkv.weight", qkv(2)),
            ("vision", "layers", "bv"): (blk + ".attn.qkv.bias", qkv_b(2)),
            ("vision", "layers", "wo"): (blk + ".attn.proj.weight", "t"),
            ("vision", "layers", "bo"): (blk + ".attn.proj.bias", None),
            ("vision", "layers", "w_fc1"): (blk + ".mlp.fc1.weight", "t"),
            ("vision", "layers", "b_fc1"): (blk + ".mlp.fc1.bias", None),
            ("vision", "layers", "w_fc2"): (blk + ".mlp.fc2.weight", "t"),
            ("vision", "layers", "b_fc2"): (blk + ".mlp.fc2.bias", None),
            ("image_newline",): ("image_newline", None),
            ("view_seperator",): ("view_seperator", None),
        })
        n_proj = len(init_projector_params(
            jax.random.PRNGKey(0), cfg)["layers"])
        for i in range(n_proj):
            # reference ModuleList interleaves GELU modules, so Linear k
            # sits at index 2k
            m[("projector", "layers", str(i), "w")] = (
                f"projector.layers.{2 * i}.weight", "t")
            m[("projector", "layers", str(i), "b")] = (
                f"projector.layers.{2 * i}.bias", None)
        return m
