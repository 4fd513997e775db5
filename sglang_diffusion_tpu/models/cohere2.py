"""Cohere2 family (Cohere2ForCausalLM, Command-R7B) — parallel-residual
blocks with alternating windowed/global attention.

Reference analog: srt/models/cohere2 class in srt/models/. Numerics
defined against HF transformers' Cohere2 implementation:

- parallel residual: ``h = res + attn(norm(h)) + mlp(norm(h))`` — ONE
  shared input LayerNorm feeds both branches, no post-attention norm.
- LayerNorm is mean-subtracted (true LN, no bias), not RMSNorm.
- ``sliding_attention`` layers use INTERLEAVED rotate-half rope + a
  sliding window; ``full_attention`` layers attend globally with NO
  positional rotation (the NoPE global layers of Command-R7B).
- logits = (embed.T @ h) * logit_scale; embeddings tied.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
from sglang_diffusion_tpu.ops.rope import (
    apply_rope_partial_interleaved,
    compute_inv_freq,
)


def _layer_types(cfg: ModelConfig) -> List[str]:
    lt = cfg.raw.get("layer_types")
    if lt:
        return list(lt[: cfg.num_hidden_layers])
    pat = cfg.raw.get("sliding_window_pattern", 4)
    return ["full_attention" if (l + 1) % pat == 0 else "sliding_attention"
            for l in range(cfg.num_hidden_layers)]


def layer_norm(x, w, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mu), axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)
            * w.astype(jnp.float32)).astype(x.dtype)


@register_model("Cohere2ForCausalLM", "CohereForCausalLM")
class Cohere2Family:
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
            lambda: Cohere2Family.init_params(jax.random.PRNGKey(0), cfg,
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
        return {
            "embed": jnp.asarray(raw("model.embed_tokens.weight"),
                                 jnp.float32),
            "final_norm": jnp.asarray(raw("model.norm.weight"), jnp.float32),
            "layers": layers,
        }

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", **_kw):
        r = cfg.raw
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        eps = r.get("layer_norm_eps", 1e-5)
        logit_scale = float(r.get("logit_scale", 1.0))
        window = int(r.get("sliding_window", 4096))
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))
        sm_scale = 1.0 / float(np.sqrt(D))
        types = _layer_types(cfg)

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            for l, lp in enumerate(params["layers"]):
                h = layer_norm(hidden, lp["input_norm"], eps)
                q = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, D)
                k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
                v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
                if types[l] == "sliding_attention":
                    q, k = apply_rope_partial_interleaved(
                        q, k, positions, inv_freq, D)
                    win = window
                else:
                    win = None  # global, NoPE
                pages = write_kv_pages(pages, l, k, v, meta.slot_ids)
                o = attn_fn(q, pages, l, meta, sm_scale, window=win)
                attn_out = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
                mlp = jnp.dot(
                    jax.nn.silu(jnp.dot(h, lp["w_gate"]))
                    * jnp.dot(h, lp["w_up"]), lp["w_down"])
                hidden = hidden + attn_out + mlp
            hidden = layer_norm(hidden, params["final_norm"], eps)
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["embed"].T,
                             preferred_element_type=jnp.float32)
            return logits * logit_scale, pages

        return forward
