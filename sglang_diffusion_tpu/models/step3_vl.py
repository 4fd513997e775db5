"""Step3-VL family (Step3VLForConditionalGeneration).

Reference analog: srt/models/step3_vl.py. The text backbone uses
Step-3's MFA (multi-matrix factorized attention, reference
Step3TextAttention lines 171-279): one fused projection produces a
shared low-rank query ``[share_q_dim]`` plus a SINGLE K and V head; the
query is RMS-normed (``inter_norm``) and expanded to all heads by a
second matmul ``wq`` — extreme MQA with a factorized query path, so the
KV cache is one head wide. MLP layers follow ``moe_layers_enum``
(reference lines 322-327, default: every layer except 0 is sparse):
sparse layers run a softmax-over-all-logits top-k router (TopK with
``renormalize=norm_expert_weight``, reference lines 128-133) plus an
always-on shared expert added to the routed output (moe_mlp_forward,
lines 389-396); dense layers are plain SwiGLU.

The vision tower (reference lines 608-732) is a CLS-token ViT with the
class embedding REPLICATED 3 extra times at the front (pad_tp_size=4,
lines 628/652-658) and post-sublayer LayerNorm blocks:
``h = h + LN1(attn(h)); h = h + LN2(mlp(h))`` (line 678-681) — norm on
the branch output, not the input. The projector (lines 752-811) drops
the 4 leading CLS copies, then conv k2/s2 -> conv k3/s2/p1 (channels
doubled) -> linear into the LM width.

TPU-first notes: the layer stack is two fori_loop groups (dense prefix +
sparse rest) over stacked per-layer params; convs run NHWC/HWIO on the
MXU; multimodal injection reuses the embed-table-extension trick from
models/deepseek_vl2.py so text decode stays on the text-only executable.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq


def _tc(cfg: ModelConfig) -> Dict[str, Any]:
    """Step3 text-config extras live in raw.text_config (nested VL
    checkpoint) or raw itself (flat test configs)."""
    return cfg.raw.get("text_config", cfg.raw)


def _moe_split(cfg: ModelConfig) -> int:
    """Number of leading dense layers. moe_layers_enum must be a
    contiguous tail (the released checkpoints use 1..L-1)."""
    tc = _tc(cfg)
    enum = tc.get("moe_layers_enum")
    L = cfg.num_hidden_layers
    if enum is None:
        return 1 if L > 1 else L
    idx = sorted(int(i) for i in str(enum).strip().split(","))
    ld = L - len(idx)
    assert idx == list(range(ld, L)), "moe_layers_enum must be a tail"
    return ld


def step3_route(h2: jax.Array, w_router: jax.Array, top_k: int,
                renorm: bool):
    """Reference TopK numerics (use_grouped_topk=False): softmax over ALL
    router logits, take top-k probabilities, renormalize iff
    norm_expert_weight. With renorm this equals softmax over the top-k
    logits; without it the kept probability mass is used as-is."""
    probs = jax.nn.softmax(
        jnp.dot(h2, w_router).astype(jnp.float32), axis=-1)
    topv, topi = jax.lax.top_k(probs, top_k)
    if renorm:
        topv = topv / jnp.sum(topv, axis=-1, keepdims=True)
    return topi.astype(jnp.int32), topv


# ---------------- vision tower ----------------


class Step3VisionTower:
    """CLS ViT with replicated class token and post-sublayer LayerNorm."""

    PAD_TP = 4  # reference pad_tp_size: 3 extra CLS copies up front

    @staticmethod
    def init_params(rng, v, dtype=jnp.float32):
        E, F, L = v.hidden_size, v.intermediate_size, v.num_hidden_layers
        Pd = 3 * v.patch_size * v.patch_size
        keys = jax.random.split(rng, 8)

        def init(key, shape, sd=0.02):
            return (jax.random.normal(key, shape, jnp.float32) * sd
                    ).astype(dtype)

        return {
            "cls": init(keys[0], (E,)),
            "patch_embed": init(keys[1], (Pd, E)),
            "patch_embed_b": jnp.zeros((E,), dtype),
            "pos_embed": init(keys[2], (v.num_patches + 1, E)),
            "layers": {
                "ln1_w": jnp.ones((L, E), dtype),
                "ln1_b": jnp.zeros((L, E), dtype),
                "ln2_w": jnp.ones((L, E), dtype),
                "ln2_b": jnp.zeros((L, E), dtype),
                "wq": init(keys[3], (L, E, E)),
                "bq": jnp.zeros((L, E), dtype),
                "wk": init(keys[4], (L, E, E)),
                "bk": jnp.zeros((L, E), dtype),
                "wv": init(keys[5], (L, E, E)),
                "bv": jnp.zeros((L, E), dtype),
                "wo": init(keys[6], (L, E, E)),
                "bo": jnp.zeros((L, E), dtype),
                "w_fc1": init(keys[7], (L, E, F)),
                "b_fc1": jnp.zeros((L, F), dtype),
                "w_fc2": init(keys[0], (L, F, E)),
                "b_fc2": jnp.zeros((L, E), dtype),
            },
        }

    @staticmethod
    def apply(params, pixel_values: jax.Array, v) -> jax.Array:
        """pixel_values [N,3,H,W] -> [N, PAD_TP + num_patches, E]."""
        from sglang_diffusion_tpu.models.vision import patchify

        E = v.hidden_size
        H = v.num_attention_heads
        D = E // H
        scale = 1.0 / np.sqrt(D)

        def ln(x, w, b):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + 1e-6) * w + b
                    ).astype(x.dtype)

        def quick_gelu(x):
            return x * jax.nn.sigmoid(1.702 * x)

        patches = patchify(
            pixel_values.astype(params["patch_embed"].dtype), v.patch_size)
        x = patches @ params["patch_embed"] + params["patch_embed_b"]
        n = x.shape[0]
        cls = jnp.broadcast_to(params["cls"], (n, 1, E))
        x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
        # replicate the (pos-embedded) CLS row PAD_TP-1 extra times
        pad = jnp.broadcast_to(
            x[:, :1], (n, Step3VisionTower.PAD_TP - 1, E))
        x = jnp.concatenate([pad, x], axis=1)

        def block(l, hidden):
            lp = jax.tree.map(lambda p: p[l], params["layers"])
            nb, t, _ = hidden.shape
            q = (hidden @ lp["wq"] + lp["bq"]).reshape(nb, t, H, D)
            k = (hidden @ lp["wk"] + lp["bk"]).reshape(nb, t, H, D)
            val = (hidden @ lp["wv"] + lp["bv"]).reshape(nb, t, H, D)
            logits = jnp.einsum("nthd,nshd->nhts", q, k) * scale
            attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1
                                  ).astype(q.dtype)
            o = jnp.einsum("nhts,nshd->nthd", attn, val).reshape(nb, t, E)
            o = o @ lp["wo"] + lp["bo"]
            hidden = hidden + ln(o, lp["ln1_w"], lp["ln1_b"])
            m = quick_gelu((hidden @ lp["w_fc1"] + lp["b_fc1"]
                            ).astype(jnp.float32)).astype(hidden.dtype)
            m = m @ lp["w_fc2"] + lp["b_fc2"]
            return hidden + ln(m, lp["ln2_w"], lp["ln2_b"])

        return jax.lax.fori_loop(0, v.num_hidden_layers, block, x)


@register_model("Step3VLForConditionalGeneration")
class Step3VLFamily:
    """Params: text stack at top level (embed / dense_layers / moe_layers
    / final_norm / lm_head), tower under "vision", projector convs under
    "proj"."""

    supports_eagle = False
    is_multimodal = True

    # ---------------- text init ----------------
    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        tc = _tc(cfg)
        L = cfg.num_hidden_layers
        Ld = _moe_split(cfg)
        E = cfg.hidden_size
        Hq = cfg.num_attention_heads
        D = cfg.actual_head_dim
        Sq = int(tc.get("share_q_dim") or D)
        X = int(tc.get("moe_num_experts", 8))
        Fm = int(tc.get("moe_intermediate_size", cfg.intermediate_size))
        Fs = int(tc.get("share_expert_dim", cfg.intermediate_size))
        V = cfg.vocab_size
        keys = jax.random.split(rng, 16)

        def init(key, shape):
            sd = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * sd
                    ).astype(dtype)

        def attn(nl, ks):
            return {
                "input_norm": jnp.ones((nl, E), dtype),
                "post_norm": jnp.ones((nl, E), dtype),
                "inter_norm": jnp.ones((nl, Sq), dtype),
                "wq_share": init(ks[0], (nl, E, Sq)),
                "wk": init(ks[1], (nl, E, D)),
                "wv": init(ks[2], (nl, E, D)),
                "wq": init(ks[3], (nl, Sq, Hq * D)),
                "wo": init(ks[4], (nl, Hq * D, E)),
            }

        dense = attn(Ld, keys[0:5])
        dense.update({
            "w_gate": init(keys[5], (Ld, E, cfg.intermediate_size)),
            "w_up": init(keys[6], (Ld, E, cfg.intermediate_size)),
            "w_down": init(keys[7], (Ld, cfg.intermediate_size, E)),
        })
        moe = attn(L - Ld, keys[8:13])
        moe.update({
            "w_router": init(keys[13], (L - Ld, E, X)),
            "xw_gate": init(keys[5], (L - Ld, X, E, Fm)),
            "xw_up": init(keys[6], (L - Ld, X, E, Fm)),
            "xw_down": init(keys[7], (L - Ld, X, Fm, E)),
            "sh_gate": init(keys[14], (L - Ld, E, Fs)),
            "sh_up": init(keys[15], (L - Ld, E, Fs)),
            "sh_down": init(keys[14], (L - Ld, Fs, E)),
        })
        params = {
            "embed": init(keys[8], (V, E)),
            "dense_layers": dense,
            "moe_layers": moe,
            "final_norm": jnp.ones((E,), dtype),
            "lm_head": init(keys[9], (E, V)),
        }
        if cfg.vision is not None:
            kv, k1, k2, k3 = jax.random.split(keys[10], 4)
            co = int(cfg.raw.get("vision_config", {}).get(
                "output_hidden_size", cfg.vision.hidden_size))
            ci = cfg.vision.hidden_size
            params["vision"] = Step3VisionTower.init_params(
                kv, cfg.vision, dtype)
            params["proj"] = {
                # HWIO conv kernels
                "down1": init(k1, (2, 2, ci, co)),
                "down1_b": jnp.zeros((co,), dtype),
                "down2": init(k2, (3, 3, co, 2 * co)),
                "down2_b": jnp.zeros((2 * co,), dtype),
                "w": init(k3, (2 * co, E)),
                "b": jnp.zeros((E,), dtype),
            }
        return params

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        def attn():
            return {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "inter_norm": P(None, None),
                "wq_share": P(None, None, None),  # replicated (1 kv head)
                "wk": P(None, None, None),
                "wv": P(None, None, None),
                "wq": P(None, None, "tp"),
                "wo": P(None, "tp", None),
            }

        dense = attn()
        dense.update({
            "w_gate": P(None, None, "tp"),
            "w_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
        })
        moe = attn()
        moe.update({
            "w_router": P(None, None, None),
            "xw_gate": P(None, "tp", None, None),
            "xw_up": P(None, "tp", None, None),
            "xw_down": P(None, "tp", None, None),
            "sh_gate": P(None, None, "tp"),
            "sh_up": P(None, None, "tp"),
            "sh_down": P(None, "tp", None),
        })
        specs = {
            "embed": P("tp", None),
            "dense_layers": dense,
            "moe_layers": moe,
            "final_norm": P(None),
            "lm_head": P(None, "tp"),
        }
        if cfg.vision is not None:
            full = Step3VLFamily.init_params(jax.random.PRNGKey(0), cfg)
            for k in ("vision", "proj"):
                specs[k] = jax.tree.map(lambda _: P(), full[k])
        return specs

    # ---------------- vision encode ----------------
    @staticmethod
    def make_encode_images(cfg: ModelConfig) -> Callable:
        """encode(params, pixel_values [N,3,H,W]) -> [N, T', E_lm]:
        tower -> drop 4 CLS copies -> conv k2/s2 -> conv k3/s2/p1 ->
        linear (reference _get_vision_model_output +
        _process_image_features)."""
        v = cfg.vision
        stride1 = int(cfg.raw.get("understand_projector_stride", 2))

        def encode(params, pixel_values):
            feats = Step3VisionTower.apply(params["vision"], pixel_values,
                                           v)[:, Step3VisionTower.PAD_TP:]
            n, pnum, c = feats.shape
            hw = int(round(float(np.sqrt(pnum))))
            x = feats.reshape(n, hw, hw, c)  # NHWC
            pr = params["proj"]
            x = jax.lax.conv_general_dilated(
                x, pr["down1"].astype(x.dtype), (stride1, stride1),
                "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pr["down1_b"]
            x = jax.lax.conv_general_dilated(
                x, pr["down2"].astype(x.dtype), (2, 2),
                [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + pr["down2_b"]
            x = x.reshape(n, -1, x.shape[-1])
            return x @ pr["w"] + pr["b"]

        return encode

    # ---------------- text forward ----------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", use_lora: bool = False):
        tc = _tc(cfg)
        L = cfg.num_hidden_layers
        Ld = _moe_split(cfg)
        Hq = cfg.num_attention_heads
        D = cfg.actual_head_dim
        eps = cfg.rms_norm_eps
        sm_scale = 1.0 / float(np.sqrt(D))
        top_k = int(tc.get("moe_top_k", 2))
        renorm = bool(tc.get("norm_expert_weight", True))
        inv_freq = jnp.asarray(
            compute_inv_freq(D, cfg.rope_theta, cfg.rope_scaling))

        def attn(lp, hidden, kv_cache, abs_layer, positions, meta):
            b, t, e = hidden.shape
            h = rms_norm(hidden, lp["input_norm"], eps)
            q_share = jnp.dot(h, lp["wq_share"])
            k = jnp.dot(h, lp["wk"]).reshape(b, t, 1, D)
            v = jnp.dot(h, lp["wv"]).reshape(b, t, 1, D)
            q_share = rms_norm(q_share, lp["inter_norm"], eps)
            q = jnp.dot(q_share, lp["wq"]).reshape(b, t, Hq, D)
            q, k = apply_rope(q, k, positions, inv_freq)
            kv_cache = write_kv_pages(kv_cache, abs_layer, k, v,
                                      meta.slot_ids)
            o = attn_fn(q, kv_cache, abs_layer, meta, sm_scale)
            return hidden + jnp.dot(o.reshape(b, t, Hq * D), lp["wo"]), \
                kv_cache

        def swiglu(h, wg, wu, wd):
            return jnp.dot(jax.nn.silu(jnp.dot(h, wg)) * jnp.dot(h, wu),
                           wd)

        def dense_body(l, hidden, kv_cache, layers_p, positions, meta):
            lp = jax.tree.map(lambda x: x[l], layers_p)
            hidden, kv_cache = attn(lp, hidden, kv_cache, l, positions,
                                    meta)
            h = rms_norm(hidden, lp["post_norm"], eps)
            return hidden + swiglu(h, lp["w_gate"], lp["w_up"],
                                   lp["w_down"]), kv_cache

        def moe_body(l, hidden, kv_cache, layers_p, positions, meta):
            from sglang_diffusion_tpu.layers.moe import (
                apply_experts_grouped,
            )

            lp = jax.tree.map(lambda x: x[l], layers_p)
            hidden, kv_cache = attn(lp, hidden, kv_cache, Ld + l,
                                    positions, meta)
            h = rms_norm(hidden, lp["post_norm"], eps)
            b, t, e = h.shape
            h2 = h.reshape(b * t, e)
            ids, weights = step3_route(h2, lp["w_router"], top_k, renorm)
            routed = apply_experts_grouped(
                h2, ids, weights, lp["xw_gate"], lp["xw_up"],
                lp["xw_down"]).reshape(b, t, e).astype(h.dtype)
            shared = swiglu(h, lp["sh_gate"], lp["sh_up"], lp["sh_down"])
            return hidden + routed + shared, kv_cache

        def forward(params, input_ids, positions, kv_cache,
                    meta: AttentionMetadata,
                    lora_tree=None, lora_ids=None,
                    mm_embeds=None, mm_mask=None):
            if mm_embeds is not None:
                # embed-table extension (see models/deepseek_vl2.py)
                b, t = input_ids.shape
                vsz = params["embed"].shape[0]
                flat = mm_embeds.reshape(b * t, -1).astype(
                    params["embed"].dtype)
                params = {**params,
                          "embed": jnp.concatenate(
                              [params["embed"], flat], axis=0)}
                rows = (vsz + jnp.arange(b * t, dtype=input_ids.dtype)
                        ).reshape(b, t)
                input_ids = jnp.where(mm_mask, rows, input_ids)
            hidden = jnp.take(params["embed"], input_ids, axis=0)

            def bodyd(l, carry):
                h, kv = carry
                return dense_body(l, h, kv, params["dense_layers"],
                                  positions, meta)

            hidden, kv_cache = jax.lax.fori_loop(
                0, Ld, bodyd, (hidden, kv_cache))

            def bodym(l, carry):
                h, kv = carry
                return moe_body(l, h, kv, params["moe_layers"],
                                positions, meta)

            hidden, new_kv = jax.lax.fori_loop(
                0, L - Ld, bodym, (hidden, kv_cache))
            hidden = rms_norm(hidden, params["final_norm"], eps)
            b = hidden.shape[0]
            if logits_mode == "hidden":
                return hidden[jnp.arange(b), meta.logit_idx], new_kv
            h_out = (hidden if logits_mode == "all"
                     else hidden[jnp.arange(b), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits, new_kv

        return forward

    # ---------------- HF checkpoint mapping ----------------
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        """Checkpoint layout per reference load_weights (lines 882-992):
        text attention ships UNFUSED (q_proj=shared query, k_proj/v_proj
        single-head) + inter_norm + wq + o_proj; sparse-layer experts are
        STACKED [E, ...] tensors under moe.{gate,up,down}_proj with the
        router at moe.gate; the shared expert keeps per-layer
        share_expert.{gate,up,down}_proj; vision under vision_model (the
        reference renames self_attn->self_attn.attn, out_proj->proj on
        load — we map the on-disk names directly). Text entries carry a
        third (start, stop) element: the loader stacks dense_layers from
        layers [0, Ld) and moe_layers from [Ld, L)."""
        L = cfg.num_hidden_layers
        Ld = _moe_split(cfg)
        lyr_d = "model.layers.{i}"
        lyr_m = "model.layers.{i}"

        def attn_map(group, lyr):
            sa = lyr + ".self_attn"
            return {
                (group, "input_norm"): (
                    lyr + ".input_layernorm.weight", None),
                (group, "post_norm"): (
                    lyr + ".post_attention_layernorm.weight", None),
                (group, "inter_norm"): (sa + ".inter_norm.weight", None),
                (group, "wq_share"): (sa + ".q_proj.weight", "t"),
                (group, "wk"): (sa + ".k_proj.weight", "t"),
                (group, "wv"): (sa + ".v_proj.weight", "t"),
                (group, "wq"): (sa + ".wq.weight", "t"),
                (group, "wo"): (sa + ".o_proj.weight", "t"),
            }

        m: Dict[Any, Any] = {
            ("embed",): ("model.embed_tokens.weight", None),
            ("final_norm",): ("model.norm.weight", None),
            ("lm_head",): ("lm_head.weight", "t"),
        }
        m.update(attn_map("dense_layers", lyr_d))
        m.update(attn_map("moe_layers", lyr_m))
        m.update({
            ("dense_layers", "w_gate"): (
                lyr_d + ".mlp.gate_proj.weight", "t"),
            ("dense_layers", "w_up"): (lyr_d + ".mlp.up_proj.weight", "t"),
            ("dense_layers", "w_down"): (
                lyr_d + ".mlp.down_proj.weight", "t"),
            ("moe_layers", "w_router"): (lyr_m + ".moe.gate.weight", "t"),
            # stacked expert tensors [E, out, in] -> [E, in, out]
            ("moe_layers", "xw_gate"): (
                lyr_m + ".moe.gate_proj.weight",
                lambda w: np.ascontiguousarray(w.transpose(0, 2, 1))),
            ("moe_layers", "xw_up"): (
                lyr_m + ".moe.up_proj.weight",
                lambda w: np.ascontiguousarray(w.transpose(0, 2, 1))),
            ("moe_layers", "xw_down"): (
                lyr_m + ".moe.down_proj.weight",
                lambda w: np.ascontiguousarray(w.transpose(0, 2, 1))),
            ("moe_layers", "sh_gate"): (
                lyr_m + ".share_expert.gate_proj.weight", "t"),
            ("moe_layers", "sh_up"): (
                lyr_m + ".share_expert.up_proj.weight", "t"),
            ("moe_layers", "sh_down"): (
                lyr_m + ".share_expert.down_proj.weight", "t"),
        })
        # attach the loader layer ranges to every text per-layer entry
        m = {
            path: (e + (((0, Ld) if path[0] == "dense_layers"
                         else (Ld, L)),)
                   if "{i}" in e[0] else e)
            for path, e in m.items()
        }
        if cfg.vision is not None:
            vt = "vision_model"
            blk = vt + ".transformer.layers.{j}"
            m.update({
                ("vision", "cls"): (
                    vt + ".embeddings.class_embedding",
                    lambda w: np.ascontiguousarray(w).reshape(-1)),
                ("vision", "patch_embed"): (
                    vt + ".embeddings.patch_embedding.weight", "conv"),
                ("vision", "patch_embed_b"): (
                    vt + ".embeddings.patch_embedding.bias", None),
                ("vision", "pos_embed"): (
                    vt + ".embeddings.position_embedding.weight", None),
                ("vision", "layers", "ln1_w"): (
                    blk + ".layer_norm1.weight", None),
                ("vision", "layers", "ln1_b"): (
                    blk + ".layer_norm1.bias", None),
                ("vision", "layers", "ln2_w"): (
                    blk + ".layer_norm2.weight", None),
                ("vision", "layers", "ln2_b"): (
                    blk + ".layer_norm2.bias", None),
                ("vision", "layers", "wq"): (
                    blk + ".self_attn.q_proj.weight", "t"),
                ("vision", "layers", "bq"): (
                    blk + ".self_attn.q_proj.bias", None),
                ("vision", "layers", "wk"): (
                    blk + ".self_attn.k_proj.weight", "t"),
                ("vision", "layers", "bk"): (
                    blk + ".self_attn.k_proj.bias", None),
                ("vision", "layers", "wv"): (
                    blk + ".self_attn.v_proj.weight", "t"),
                ("vision", "layers", "bv"): (
                    blk + ".self_attn.v_proj.bias", None),
                ("vision", "layers", "wo"): (
                    blk + ".self_attn.out_proj.weight", "t"),
                ("vision", "layers", "bo"): (
                    blk + ".self_attn.out_proj.bias", None),
                ("vision", "layers", "w_fc1"): (
                    blk + ".mlp.gate_proj.weight", "t"),
                ("vision", "layers", "b_fc1"): (
                    blk + ".mlp.gate_proj.bias", None),
                ("vision", "layers", "w_fc2"): (
                    blk + ".mlp.down_proj.weight", "t"),
                ("vision", "layers", "b_fc2"): (
                    blk + ".mlp.down_proj.bias", None),
                ("proj", "down1"): (
                    "vit_downsampler.weight", "conv2d_hwio"),
                ("proj", "down1_b"): ("vit_downsampler.bias", None),
                ("proj", "down2"): (
                    "vit_downsampler2.weight", "conv2d_hwio"),
                ("proj", "down2_b"): ("vit_downsampler2.bias", None),
                ("proj", "w"): ("vit_large_projector.weight", "t"),
                ("proj", "b"): ("vit_large_projector.bias", None),
            })
        return m
