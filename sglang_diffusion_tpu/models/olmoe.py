"""OLMoE family (OlmoeForCausalLM) — AllenAI's MoE with flat-dim q/k
RMSNorm before rope.

Reference analog: srt/models/olmoe.py. Numerics defined against HF
transformers' Olmoe implementation: pre-norm residual layers; q/k norms
applied to the FLAT projections (hidden-wide for q, Hkv*D-wide for k)
BEFORE head reshape + full-dim rotate-half rope; optional clip_qkv;
Mixtral-layout MoE (w1 gate / w3 up / w2 down) routed by
softmax-over-all -> top-k with OPTIONAL renormalization
(``norm_topk_prob``, default False for OLMoE checkpoints).
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.moe import apply_experts_grouped
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq


def _route_olmoe(h2, w_router, top_k, norm_topk_prob):
    """softmax over ALL experts -> top-k; renorm only if norm_topk_prob
    (HF OlmoeSparseMoeBlock)."""
    logits = jnp.dot(h2, w_router).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, top_k)
    if norm_topk_prob:
        topv = topv / topv.sum(axis=-1, keepdims=True)
    return topi.astype(jnp.int32), topv


@register_model("OlmoeForCausalLM")
class OlmoeFamily:
    supports_eagle = False

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        E = cfg.hidden_size
        F = cfg.intermediate_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        X = cfg.raw.get("num_experts", 8)
        keys = iter(jax.random.split(rng, 4 + 6 * cfg.num_hidden_layers))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        layers = []
        for _ in range(cfg.num_hidden_layers):
            layers.append({
                "input_norm": jnp.ones((E,), dtype),
                "post_norm": jnp.ones((E,), dtype),
                "wq": init((E, Hq * D)),
                "wk": init((E, Hkv * D)),
                "wv": init((E, Hkv * D)),
                "wo": init((Hq * D, E)),
                "q_norm": jnp.ones((Hq * D,), dtype),
                "k_norm": jnp.ones((Hkv * D,), dtype),
                "w_router": init((E, X)),
                "w_gate": init((X, E, F), scale_dim=E),
                "w_up": init((X, E, F), scale_dim=E),
                "w_down": init((X, F, E), scale_dim=F),
            })
        return {
            "embed": init((cfg.vocab_size, E), scale_dim=E),
            "final_norm": jnp.ones((E,), dtype),
            "lm_head": init((E, cfg.vocab_size)),
            "layers": layers,
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig):
        def spec(tree):
            if isinstance(tree, dict):
                out = {}
                for kk, vv in tree.items():
                    if kk in ("w_gate", "w_up"):
                        out[kk] = P(None, None, "tp")
                    elif kk == "w_down":
                        out[kk] = P(None, "tp", None)
                    elif kk in ("wq", "wk", "wv"):
                        out[kk] = P(None, "tp")
                    elif kk == "wo":
                        out[kk] = P("tp", None)
                    else:
                        out[kk] = spec(vv)
                return out
            if isinstance(tree, list):
                return [spec(v) for v in tree]
            return P()

        skel = jax.eval_shape(
            lambda: OlmoeFamily.init_params(jax.random.PRNGKey(0), cfg,
                                            jnp.float32))
        return spec(skel)

    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        X = cfg.raw.get("num_experts", 8)

        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        layers = []
        for l in range(cfg.num_hidden_layers):
            pre = f"model.layers.{l}."
            at = pre + "self_attn."
            moe = pre + "mlp."
            lp = {
                "input_norm": raw(pre + "input_layernorm.weight"),
                "post_norm": raw(pre + "post_attention_layernorm.weight"),
                "wq": t(at + "q_proj.weight"),
                "wk": t(at + "k_proj.weight"),
                "wv": t(at + "v_proj.weight"),
                "wo": t(at + "o_proj.weight"),
                "q_norm": raw(at + "q_norm.weight"),
                "k_norm": raw(at + "k_norm.weight"),
                "w_router": t(moe + "gate.weight"),
                "w_gate": np.stack(
                    [t(moe + f"experts.{e}.gate_proj.weight")
                     for e in range(X)]),
                "w_up": np.stack(
                    [t(moe + f"experts.{e}.up_proj.weight")
                     for e in range(X)]),
                "w_down": np.stack(
                    [t(moe + f"experts.{e}.down_proj.weight")
                     for e in range(X)]),
            }
            layers.append(
                {k: jnp.asarray(v, jnp.float32) for k, v in lp.items()})
        p = {
            "embed": jnp.asarray(raw("model.embed_tokens.weight"),
                                 jnp.float32),
            "final_norm": jnp.asarray(raw("model.norm.weight"), jnp.float32),
            "layers": layers,
        }
        if "lm_head.weight" in sd:
            p["lm_head"] = jnp.asarray(t("lm_head.weight"), jnp.float32)
        else:
            p["lm_head"] = jnp.asarray(
                raw("model.embed_tokens.weight").T.copy(), jnp.float32)
        return p

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", **_kw):
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        eps = cfg.rms_norm_eps
        top_k = cfg.raw.get("num_experts_per_tok", 8)
        norm_topk = bool(cfg.raw.get("norm_topk_prob", False))
        clip = cfg.raw.get("clip_qkv")
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))
        sm_scale = 1.0 / float(np.sqrt(D))

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            for l, lp in enumerate(params["layers"]):
                h = rms_norm(hidden, lp["input_norm"], eps)
                q = jnp.dot(h, lp["wq"])
                k = jnp.dot(h, lp["wk"])
                v = jnp.dot(h, lp["wv"])
                if clip is not None:
                    q = jnp.clip(q, -clip, clip)
                    k = jnp.clip(k, -clip, clip)
                    v = jnp.clip(v, -clip, clip)
                q = rms_norm(q, lp["q_norm"], eps).reshape(b, t, Hq, D)
                k = rms_norm(k, lp["k_norm"], eps).reshape(b, t, Hkv, D)
                v = v.reshape(b, t, Hkv, D)
                q, k = apply_rope(q, k, positions, inv_freq)
                pages = write_kv_pages(pages, l, k, v, meta.slot_ids)
                o = attn_fn(q, pages, l, meta, sm_scale)
                o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
                hidden = hidden + o
                h2 = rms_norm(hidden, lp["post_norm"], eps)
                n, e = b * t, h2.shape[-1]
                flat = h2.reshape(n, e)
                ids, weights = _route_olmoe(flat, lp["w_router"], top_k,
                                            norm_topk)
                moe = apply_experts_grouped(
                    flat, ids, weights, lp["w_gate"], lp["w_up"],
                    lp["w_down"]).reshape(b, t, e).astype(hidden.dtype)
                hidden = hidden + moe
            hidden = rms_norm(hidden, params["final_norm"], eps)
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits, pages

        return forward
