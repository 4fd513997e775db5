"""ExaONE 4.0 family (Exaone4ForCausalLM) — LG's post-norm hybrid
sliding/global stack with per-head qk-norm and NoPE global layers.

Reference analog: srt/models/exaone-class in srt/models/. Numerics
defined against HF transformers' Exaone4 implementation: POST-norm-only
residuals (``h = res + norm(attn(h)); h = res + norm(mlp(h))`` — no
input norms), per-head-dim q/k RMSNorm BEFORE rope, rope applied only on
``sliding_attention`` layers when a sliding window is configured (global
layers are NoPE, gemma-style hybrid) and on every layer otherwise,
silu gate/up/down MLP, tied embeddings optional.
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
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq


def _layer_types(cfg: ModelConfig) -> List[str]:
    lt = cfg.raw.get("layer_types")
    if lt:
        return list(lt[: cfg.num_hidden_layers])
    if not cfg.raw.get("sliding_window"):
        return ["full_attention"] * cfg.num_hidden_layers
    pat = cfg.raw.get("sliding_window_pattern", 4)
    return ["full_attention" if (l + 1) % pat == 0 else "sliding_attention"
            for l in range(cfg.num_hidden_layers)]


@register_model("Exaone4ForCausalLM")
class Exaone4Family:
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
            "post_attn_norm": jnp.ones((E,), dtype),
            "post_ff_norm": jnp.ones((E,), dtype),
            "q_norm": jnp.ones((D,), dtype),
            "k_norm": jnp.ones((D,), dtype),
            "wq": init((E, Hq * D)),
            "wk": init((E, Hkv * D)),
            "wv": init((E, Hkv * D)),
            "wo": init((Hq * D, E)),
            "w_gate": init((E, F)),
            "w_up": init((E, F)),
            "w_down": init((F, E)),
        } for _ in range(cfg.num_hidden_layers)]
        p = {
            "embed": init((cfg.vocab_size, E), scale_dim=E),
            "final_norm": jnp.ones((E,), dtype),
            "layers": layers,
        }
        if not cfg.tie_word_embeddings:
            p["lm_head"] = init((E, cfg.vocab_size))
        return p

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
            lambda: Exaone4Family.init_params(jax.random.PRNGKey(0), cfg,
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
                "post_attn_norm": raw(pre + "post_attention_layernorm.weight"),
                "post_ff_norm": raw(pre + "post_feedforward_layernorm.weight"),
                "q_norm": raw(at + "q_norm.weight"),
                "k_norm": raw(at + "k_norm.weight"),
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
        window = r.get("sliding_window")
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))
        sm_scale = 1.0 / float(np.sqrt(D))
        types = _layer_types(cfg)

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            for l, lp in enumerate(params["layers"]):
                q = jnp.dot(hidden, lp["wq"]).reshape(b, t, Hq, D)
                k = jnp.dot(hidden, lp["wk"]).reshape(b, t, Hkv, D)
                v = jnp.dot(hidden, lp["wv"]).reshape(b, t, Hkv, D)
                q = rms_norm(q, lp["q_norm"], eps)
                k = rms_norm(k, lp["k_norm"], eps)
                sliding = types[l] == "sliding_attention"
                if window is None or sliding:
                    q, k = apply_rope(q, k, positions, inv_freq)
                win = window if sliding else None
                pages = write_kv_pages(pages, l, k, v, meta.slot_ids)
                o = attn_fn(q, pages, l, meta, sm_scale, window=win)
                o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
                hidden = hidden + rms_norm(o, lp["post_attn_norm"], eps)
                mlp = jnp.dot(
                    jax.nn.silu(jnp.dot(hidden, lp["w_gate"]))
                    * jnp.dot(hidden, lp["w_up"]), lp["w_down"])
                hidden = hidden + rms_norm(mlp, lp["post_ff_norm"], eps)
            hidden = rms_norm(hidden, params["final_norm"], eps)
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits, pages

        return forward
