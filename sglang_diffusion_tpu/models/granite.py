"""Granite family (GraniteForCausalLM) — IBM's llama-shaped stack with
scalar capacity multipliers.

Reference analog: srt/models/granite.py. Numerics defined against HF
transformers' Granite implementation: llama GQA/SwiGLU blocks with four
deviations — embeddings scaled by ``embedding_multiplier``, every
residual branch scaled by ``residual_multiplier``, attention logits
scaled by ``attention_multiplier`` (instead of 1/sqrt(D)), and final
logits divided by ``logits_scaling``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq


@register_model("GraniteForCausalLM")
class GraniteFamily:
    supports_eagle = False

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        E, F = cfg.hidden_size, cfg.intermediate_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        keys = iter(jax.random.split(rng, 4 + 8 * cfg.num_hidden_layers))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        layers = [{
            "input_norm": jnp.ones((E,), dtype),
            "post_norm": jnp.ones((E,), dtype),
            "wq": init((E, Hq * D)),
            "wk": init((E, Hkv * D)),
            "wv": init((E, Hkv * D)),
            "wo": init((Hq * D, E)),
            "w_gate": init((E, F)),
            "w_up": init((E, F)),
            "w_down": init((F, E)),
        } for _ in range(cfg.num_hidden_layers)]
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
                    if kk in ("wq", "wk", "wv", "w_gate", "w_up"):
                        out[kk] = P(None, "tp")
                    elif kk in ("wo", "w_down"):
                        out[kk] = P("tp", None)
                    else:
                        out[kk] = spec(vv)
                return out
            if isinstance(tree, list):
                return [spec(v) for v in tree]
            return P()

        skel = jax.eval_shape(
            lambda: GraniteFamily.init_params(jax.random.PRNGKey(0), cfg,
                                              jnp.float32))
        return spec(skel)

    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        layers = []
        for l in range(cfg.num_hidden_layers):
            pre = f"model.layers.{l}."
            at = pre + "self_attn."
            lp = {
                "input_norm": raw(pre + "input_layernorm.weight"),
                "post_norm": raw(pre + "post_attention_layernorm.weight"),
                "wq": t(at + "q_proj.weight"),
                "wk": t(at + "k_proj.weight"),
                "wv": t(at + "v_proj.weight"),
                "wo": t(at + "o_proj.weight"),
                "w_gate": t(pre + "mlp.gate_proj.weight"),
                "w_up": t(pre + "mlp.up_proj.weight"),
                "w_down": t(pre + "mlp.down_proj.weight"),
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
        r = cfg.raw
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        eps = cfg.rms_norm_eps
        emb_mult = float(r.get("embedding_multiplier", 1.0))
        res_mult = float(r.get("residual_multiplier", 1.0))
        attn_mult = float(r.get("attention_multiplier",
                                1.0 / np.sqrt(D)))
        logit_div = float(r.get("logits_scaling", 1.0))
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0) * emb_mult
            for l, lp in enumerate(params["layers"]):
                h = rms_norm(hidden, lp["input_norm"], eps)
                q = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, D)
                k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
                v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
                q, k = apply_rope(q, k, positions, inv_freq)
                pages = write_kv_pages(pages, l, k, v, meta.slot_ids)
                o = attn_fn(q, pages, l, meta, attn_mult)
                o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
                hidden = hidden + o * res_mult
                h2 = rms_norm(hidden, lp["post_norm"], eps)
                mlp = jnp.dot(
                    jax.nn.silu(jnp.dot(h2, lp["w_gate"]))
                    * jnp.dot(h2, lp["w_up"]), lp["w_down"])
                hidden = hidden + mlp * res_mult
            hidden = rms_norm(hidden, params["final_norm"], eps)
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits / logit_div, pages

        return forward
