"""InternVL (InternVLForConditionalGeneration).

Reference analog: srt/models/internvl.py — InternViT vision tower
(cls token, absolute position embeddings, layer-scale lambdas, optional
qk-norm) -> pixel-shuffle 2x2 downsample -> LayerNorm + 2-layer MLP
projector -> image embeddings injected into a Qwen2/Llama LM at
image-token positions (same integration pattern as models/llava.py).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.llama import LlamaFamily
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.models.vision import patchify


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


@register_model("InternVLForConditionalGeneration", "InternVLChatModel")
class InternVLFamily:
    """Params: "language" (LlamaFamily tree), "vision" (InternViT),
    "projector" (LN + linear_1 + gelu + linear_2)."""

    supports_eagle = False
    is_multimodal = True
    mm_tiled = "dynamic_tiling"  # engine picks the multi-view preprocessor

    @staticmethod
    def _downsample(cfg: ModelConfig) -> int:
        ratio = (cfg.raw or {}).get("downsample_ratio", 0.5)
        return int(round(1.0 / ratio))

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        k_lang, k_vis, k1, k2 = jax.random.split(rng, 4)
        v = cfg.vision
        E, F, L = v.hidden_size, v.intermediate_size, v.num_hidden_layers
        e = cfg.hidden_size
        ds = InternVLFamily._downsample(cfg)
        proj_in = E * ds * ds
        ks = iter(jax.random.split(k_vis, 10))

        def init(key, shape, scale=0.02):
            return (jax.random.normal(key, shape, jnp.float32)
                    * scale).astype(dtype)

        Pd = 3 * v.patch_size * v.patch_size
        vision = {
            "patch_embed": init(next(ks), (Pd, E)),
            "patch_embed_b": jnp.zeros((E,), dtype),
            "cls_token": init(next(ks), (E,)),
            "pos_embed": init(next(ks), (v.num_patches + 1, E)),
            "layers": {
                "ln1_w": jnp.ones((L, E), dtype),
                "ln1_b": jnp.zeros((L, E), dtype),
                "ln2_w": jnp.ones((L, E), dtype),
                "ln2_b": jnp.zeros((L, E), dtype),
                "wq": init(next(ks), (L, E, E)),
                "wk": init(next(ks), (L, E, E)),
                "wv": init(next(ks), (L, E, E)),
                "wo": init(next(ks), (L, E, E)),
                "bo": jnp.zeros((L, E), dtype),
                "w_fc1": init(next(ks), (L, E, F)),
                "b_fc1": jnp.zeros((L, F), dtype),
                "w_fc2": init(next(ks), (L, F, E)),
                "b_fc2": jnp.zeros((L, E), dtype),
                "lambda1": jnp.full((L, E), 0.1, dtype),
                "lambda2": jnp.full((L, E), 0.1, dtype),
            },
        }
        return {
            "language": LlamaFamily.init_params(k_lang, cfg, dtype),
            "vision": vision,
            "projector": {
                "ln_w": jnp.ones((proj_in,), dtype),
                "ln_b": jnp.zeros((proj_in,), dtype),
                "w1": init(k1, (proj_in, e)),
                "b1": jnp.zeros((e,), dtype),
                "w2": init(k2, (e, e)),
                "b2": jnp.zeros((e,), dtype),
            },
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        vspecs = jax.tree.map(
            lambda _: P(),
            InternVLFamily.init_params(jax.random.PRNGKey(0), cfg)["vision"],
            is_leaf=lambda x: not isinstance(x, dict),
        )
        return {
            "language": LlamaFamily.partition_specs(cfg),
            "vision": vspecs,
            "projector": {
                "ln_w": P(None), "ln_b": P(None),
                "w1": P(None, "tp"), "b1": P("tp"),
                "w2": P("tp", None), "b2": P(None),
            },
        }

    # ------------- vision encode -------------
    @staticmethod
    def make_encode_images(cfg: ModelConfig) -> Callable:
        """encode(params, pixel_values [N,3,H,W]) -> [N, T/ds^2, E_lm]."""
        v = cfg.vision
        E = v.hidden_size
        H = v.num_attention_heads
        D = E // H
        eps = v.layer_norm_eps
        L = v.num_hidden_layers
        grid = v.image_size // v.patch_size
        ds = InternVLFamily._downsample(cfg)
        scale = 1.0 / np.sqrt(D)

        def block(l, hidden, layers):
            lp = jax.tree.map(lambda x: x[l], layers)
            n, t, _ = hidden.shape
            h = _ln(hidden, lp["ln1_w"], lp["ln1_b"], eps)
            q = (h @ lp["wq"]).reshape(n, t, H, D)
            k = (h @ lp["wk"]).reshape(n, t, H, D)
            val = (h @ lp["wv"]).reshape(n, t, H, D)
            logits = jnp.einsum("nthd,nshd->nhts", q, k) * scale
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                                  ).astype(q.dtype)
            o = jnp.einsum("nhts,nshd->nthd", attn, val).reshape(n, t, E)
            o = (o @ lp["wo"] + lp["bo"]) * lp["lambda1"]
            hidden = hidden + o
            h = _ln(hidden, lp["ln2_w"], lp["ln2_b"], eps)
            m = jax.nn.gelu((h @ lp["w_fc1"] + lp["b_fc1"]
                             ).astype(jnp.float32), approximate=False
                            ).astype(hidden.dtype)
            m = (m @ lp["w_fc2"] + lp["b_fc2"]) * lp["lambda2"]
            return hidden + m

        def encode(params, pixel_values):
            vp = params["vision"]
            patches = patchify(
                pixel_values.astype(vp["patch_embed"].dtype), v.patch_size)
            x = patches @ vp["patch_embed"] + vp["patch_embed_b"]
            n = x.shape[0]
            cls = jnp.broadcast_to(vp["cls_token"], (n, 1, E))
            x = jnp.concatenate([cls, x], axis=1) + vp["pos_embed"]
            x = jax.lax.fori_loop(
                0, L, lambda l, h: block(l, h, vp["layers"]), x)
            x = x[:, 1:]  # drop cls (vision_feature_select_strategy=default)
            # pixel shuffle: fold a ds x ds patch neighbourhood into
            # channels (HF InternVLModel.pixel_shuffle with scale 1/ds)
            x = x.reshape(n, grid, grid, E)
            x = x.reshape(n, grid, grid // ds, E * ds)
            x = x.transpose(0, 2, 1, 3)
            x = x.reshape(n, grid // ds, grid // ds, E * ds * ds)
            x = x.transpose(0, 2, 1, 3)
            x = x.reshape(n, (grid // ds) ** 2, E * ds * ds)
            p = params["projector"]
            h = _ln(x, p["ln_w"], p["ln_b"], 1e-5)
            h = h @ p["w1"] + p["b1"]
            h = jax.nn.gelu(h.astype(jnp.float32), approximate=False
                            ).astype(x.dtype)
            return h @ p["w2"] + p["b2"]

        return encode

    # ------------- language forward with mm injection -------------
    make_forward = None  # assigned below (shared with llava pattern)

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
        vt = "model.vision_tower"
        lyr = vt + ".encoder.layer.{j}"
        m.update({
            ("vision", "patch_embed"): (
                vt + ".embeddings.patch_embeddings.projection.weight",
                "conv"),
            ("vision", "patch_embed_b"): (
                vt + ".embeddings.patch_embeddings.projection.bias", None),
            ("vision", "cls_token"): (
                vt + ".embeddings.cls_token", lambda w: w.reshape(-1)),
            ("vision", "pos_embed"): (
                vt + ".embeddings.position_embeddings", lambda w: w[0]),
            ("vision", "layers", "ln1_w"): (
                lyr + ".layernorm_before.weight", None),
            ("vision", "layers", "ln1_b"): (
                lyr + ".layernorm_before.bias", None),
            ("vision", "layers", "ln2_w"): (
                lyr + ".layernorm_after.weight", None),
            ("vision", "layers", "ln2_b"): (
                lyr + ".layernorm_after.bias", None),
            ("vision", "layers", "wq"): (
                lyr + ".attention.q_proj.weight", "t"),
            ("vision", "layers", "wk"): (
                lyr + ".attention.k_proj.weight", "t"),
            ("vision", "layers", "wv"): (
                lyr + ".attention.v_proj.weight", "t"),
            ("vision", "layers", "wo"): (
                lyr + ".attention.projection_layer.weight", "t"),
            ("vision", "layers", "bo"): (
                lyr + ".attention.projection_layer.bias", None),
            ("vision", "layers", "w_fc1"): (lyr + ".mlp.fc1.weight", "t"),
            ("vision", "layers", "b_fc1"): (lyr + ".mlp.fc1.bias", None),
            ("vision", "layers", "w_fc2"): (lyr + ".mlp.fc2.weight", "t"),
            ("vision", "layers", "b_fc2"): (lyr + ".mlp.fc2.bias", None),
            ("vision", "layers", "lambda1"): (lyr + ".lambda_1", None),
            ("vision", "layers", "lambda2"): (lyr + ".lambda_2", None),
            ("projector", "ln_w"): (
                "model.multi_modal_projector.layer_norm.weight", None),
            ("projector", "ln_b"): (
                "model.multi_modal_projector.layer_norm.bias", None),
            ("projector", "w1"): (
                "model.multi_modal_projector.linear_1.weight", "t"),
            ("projector", "b1"): (
                "model.multi_modal_projector.linear_1.bias", None),
            ("projector", "w2"): (
                "model.multi_modal_projector.linear_2.weight", "t"),
            ("projector", "b2"): (
                "model.multi_modal_projector.linear_2.bias", None),
        })
        return m


def _make_mm_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", use_lora: bool = False):
    """Shared mm-injection forward (identical to LlavaFamily's)."""
    lm_fwd = LlamaFamily.make_forward(cfg, attn_fn, logits_mode, use_lora)
    layer_body = LlamaFamily.make_layer_body(cfg, attn_fn)
    embed, head = LlamaFamily.make_embed_and_head(cfg)

    def forward(params, input_ids, positions, kv_cache, meta,
                lora_tree=None, lora_ids=None, mm_embeds=None, mm_mask=None):
        lang = params["language"]
        if mm_embeds is None:
            return lm_fwd(lang, input_ids, positions, kv_cache, meta,
                          lora_tree, lora_ids)
        hidden = embed(lang, input_ids)
        hidden = jnp.where(
            mm_mask[..., None], mm_embeds.astype(hidden.dtype), hidden)

        def body(l, carry):
            h, kv = carry
            return layer_body(l, h, kv, lang["layers"], positions, meta)

        hidden, new_kv = jax.lax.fori_loop(
            0, cfg.num_hidden_layers, body, (hidden, kv_cache))
        b = hidden.shape[0]
        if logits_mode == "last":
            hidden = hidden[jnp.arange(b), meta.logit_idx]
        return head(lang, hidden), new_kv

    return forward


InternVLFamily.make_forward = staticmethod(_make_mm_forward)
