"""Starcoder2 family (Starcoder2ForCausalLM) — BigCode's GQA coder with
biased LayerNorm blocks and a gelu c_fc/c_proj MLP.

Reference analog: srt/models/starcoder2-class in srt/models/. Numerics
defined against HF transformers' Starcoder2 implementation: pre-norm
residual layers with TRUE LayerNorm (weight + bias), biased
q/k/v/o/c_fc/c_proj linears, rotate-half rope, gelu(tanh) activation,
optional sliding window, tied embeddings.
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
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq


def _ln(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


@register_model("Starcoder2ForCausalLM")
class Starcoder2Family:
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
            "ln1_w": jnp.ones((E,), dtype), "ln1_b": jnp.zeros((E,), dtype),
            "ln2_w": jnp.ones((E,), dtype), "ln2_b": jnp.zeros((E,), dtype),
            "wq": init((E, Hq * D)), "bq": jnp.zeros((Hq * D,), dtype),
            "wk": init((E, Hkv * D)), "bk": jnp.zeros((Hkv * D,), dtype),
            "wv": init((E, Hkv * D)), "bv": jnp.zeros((Hkv * D,), dtype),
            "wo": init((Hq * D, E)), "bo": jnp.zeros((E,), dtype),
            "w_fc": init((E, F)), "b_fc": jnp.zeros((F,), dtype),
            "w_proj": init((F, E)), "b_proj": jnp.zeros((E,), dtype),
        } for _ in range(cfg.num_hidden_layers)]
        return {
            "embed": init((cfg.vocab_size, E), scale_dim=E),
            "final_norm_w": jnp.ones((E,), dtype),
            "final_norm_b": jnp.zeros((E,), dtype),
            "layers": layers,
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig):
        def spec(tree):
            if isinstance(tree, dict):
                out = {}
                for kk, vv in tree.items():
                    if kk in ("wq", "wk", "wv", "w_fc"):
                        out[kk] = P(None, "tp")
                    elif kk in ("wo", "w_proj"):
                        out[kk] = P("tp", None)
                    elif kk in ("bq", "bk", "bv", "b_fc"):
                        out[kk] = P("tp")
                    else:
                        out[kk] = spec(vv)
                return out
            if isinstance(tree, list):
                return [spec(v) for v in tree]
            return P()

        skel = jax.eval_shape(
            lambda: Starcoder2Family.init_params(jax.random.PRNGKey(0),
                                                 cfg, jnp.float32))
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
                "ln1_w": raw(pre + "input_layernorm.weight"),
                "ln1_b": raw(pre + "input_layernorm.bias"),
                "ln2_w": raw(pre + "post_attention_layernorm.weight"),
                "ln2_b": raw(pre + "post_attention_layernorm.bias"),
                "wq": t(at + "q_proj.weight"), "bq": raw(at + "q_proj.bias"),
                "wk": t(at + "k_proj.weight"), "bk": raw(at + "k_proj.bias"),
                "wv": t(at + "v_proj.weight"), "bv": raw(at + "v_proj.bias"),
                "wo": t(at + "o_proj.weight"), "bo": raw(at + "o_proj.bias"),
                "w_fc": t(pre + "mlp.c_fc.weight"),
                "b_fc": raw(pre + "mlp.c_fc.bias"),
                "w_proj": t(pre + "mlp.c_proj.weight"),
                "b_proj": raw(pre + "mlp.c_proj.bias"),
            }
            layers.append(
                {k: jnp.asarray(v, jnp.float32) for k, v in lp.items()})
        return {
            "embed": jnp.asarray(raw("model.embed_tokens.weight"),
                                 jnp.float32),
            "final_norm_w": jnp.asarray(raw("model.norm.weight"),
                                        jnp.float32),
            "final_norm_b": jnp.asarray(raw("model.norm.bias"), jnp.float32),
            "layers": layers,
        }

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", **_kw):
        r = cfg.raw
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        eps = r.get("norm_epsilon", 1e-5)
        window = r.get("sliding_window")
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))
        sm_scale = 1.0 / float(np.sqrt(D))

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            for l, lp in enumerate(params["layers"]):
                h = _ln(hidden, lp["ln1_w"], lp["ln1_b"], eps)
                q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(b, t, Hq, D)
                k = (jnp.dot(h, lp["wk"]) + lp["bk"]).reshape(b, t, Hkv, D)
                v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(b, t, Hkv, D)
                q, k = apply_rope(q, k, positions, inv_freq)
                pages = write_kv_pages(pages, l, k, v, meta.slot_ids)
                o = attn_fn(q, pages, l, meta, sm_scale, window=window)
                o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"]) + lp["bo"]
                hidden = hidden + o
                h2 = _ln(hidden, lp["ln2_w"], lp["ln2_b"], eps)
                mlp = jax.nn.gelu(jnp.dot(h2, lp["w_fc"]) + lp["b_fc"],
                                  approximate=True)
                mlp = jnp.dot(mlp, lp["w_proj"]) + lp["b_proj"]
                hidden = hidden + mlp
            hidden = _ln(hidden, params["final_norm_w"],
                         params["final_norm_b"], eps)
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["embed"].T,
                             preferred_element_type=jnp.float32)
            return logits, pages

        return forward
