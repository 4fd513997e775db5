"""GLM-4.5/4.6 MoE family (Glm4MoeForCausalLM).

Reference analog: srt/models/glm4_moe.py. Numerics defined against HF
transformers' Glm4Moe implementation:

- llama-style GQA attention with QKV biases (attention_bias), optional
  per-head q/k RMSNorm (use_qk_norm), partial NON-interleaved rotary
  (rotate-half on the first head_dim * partial_rotary_factor lanes)
- MLP layers for l < first_k_dense_replace, then MoE: sigmoid router
  with e_score_correction_bias for expert CHOICE only, group-limited
  top-k, original scores as weights (+norm, routed_scaling_factor) —
  identical routing to DeepSeek-V3 (layers/moe.py deepseek_route) —
  plus n_shared_experts running as a plain MLP.

Layers split into two homogeneous stacked groups (dense prefix / MoE
rest) so the forward is two fori_loops over stacked params, like
models/deepseek.py.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.layers.moe import (
    apply_experts_grouped,
    deepseek_route,
)
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope_partial, compute_inv_freq


@register_model("Glm4MoeForCausalLM")
class Glm4MoeFamily:
    supports_eagle = False

    # ------------- init -------------
    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        E = cfg.hidden_size
        F = cfg.intermediate_size
        Fm = cfg.moe_intermediate_size or F
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        X = cfg.num_experts
        Ld = cfg.first_k_dense_replace
        Lm = cfg.num_hidden_layers - Ld
        n_sh = int(cfg.raw.get("n_shared_experts", 1))
        keys = iter(jax.random.split(rng, 64))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        def attn_group(L):
            return {
                "input_norm": jnp.ones((L, E), dtype),
                "post_norm": jnp.ones((L, E), dtype),
                "wq": init((L, E, Hq * D)),
                "bq": jnp.zeros((L, Hq * D), dtype),
                "wk": init((L, E, Hkv * D)),
                "bk": jnp.zeros((L, Hkv * D), dtype),
                "wv": init((L, E, Hkv * D)),
                "bv": jnp.zeros((L, Hkv * D), dtype),
                "wo": init((L, Hq * D, E)),
                "q_norm": jnp.ones((L, D), dtype),
                "k_norm": jnp.ones((L, D), dtype),
            }

        dense = attn_group(Ld) | {
            "w_gate": init((Ld, E, F)),
            "w_up": init((Ld, E, F)),
            "w_down": init((Ld, F, E)),
        } if Ld else None
        moe = attn_group(Lm) | {
            "w_router": init((Lm, E, X)),
            "e_bias": jnp.zeros((Lm, X), jnp.float32),
            "xw_gate": init((Lm, X, E, Fm), scale_dim=E),
            "xw_up": init((Lm, X, E, Fm), scale_dim=E),
            "xw_down": init((Lm, X, Fm, E), scale_dim=Fm),
            "sh_gate": init((Lm, E, Fm * n_sh)),
            "sh_up": init((Lm, E, Fm * n_sh)),
            "sh_down": init((Lm, Fm * n_sh, E)),
        }
        p = {
            "embed": init((cfg.vocab_size, E), scale_dim=E),
            "final_norm": jnp.ones((E,), dtype),
            "lm_head": init((E, cfg.vocab_size)),
            "moe_layers": moe,
        }
        if dense is not None:
            p["dense_layers"] = dense
        return p

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        def group_specs(g):
            out = {}
            for k in g:
                if k in ("wq", "wk", "wv", "w_gate", "w_up", "sh_gate",
                         "sh_up"):
                    out[k] = P(None, None, "tp")
                elif k in ("bq", "bk", "bv"):
                    out[k] = P(None, "tp")
                elif k in ("wo", "w_down", "sh_down"):
                    out[k] = P(None, "tp", None)
                elif k in ("xw_gate", "xw_up"):
                    out[k] = P(None, "tp", None, None)
                elif k == "xw_down":
                    out[k] = P(None, "tp", None, None)
                else:
                    out[k] = P()
            return out

        # build the skeleton from init shapes
        skel = jax.eval_shape(
            lambda: Glm4MoeFamily.init_params(jax.random.PRNGKey(0), cfg))
        specs = {
            "embed": P(), "final_norm": P(), "lm_head": P(None, "tp"),
            "moe_layers": group_specs(skel["moe_layers"]),
        }
        if "dense_layers" in skel:
            specs["dense_layers"] = group_specs(skel["dense_layers"])
        return specs

    # ------------- HF weights -------------
    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        Ld = cfg.first_k_dense_replace
        L = cfg.num_hidden_layers
        X = cfg.num_experts

        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        def attn_of(ls):
            pre = ["model.layers.%d." % i for i in ls]
            g = {
                "input_norm": np.stack(
                    [raw(p + "input_layernorm.weight") for p in pre]),
                "post_norm": np.stack(
                    [raw(p + "post_attention_layernorm.weight")
                     for p in pre]),
                "wq": np.stack([t(p + "self_attn.q_proj.weight")
                                for p in pre]),
                "wk": np.stack([t(p + "self_attn.k_proj.weight")
                                for p in pre]),
                "wv": np.stack([t(p + "self_attn.v_proj.weight")
                                for p in pre]),
                "wo": np.stack([t(p + "self_attn.o_proj.weight")
                                for p in pre]),
            }
            if pre and f"{pre[0]}self_attn.q_proj.bias" in sd:
                g["bq"] = np.stack([raw(p + "self_attn.q_proj.bias")
                                    for p in pre])
                g["bk"] = np.stack([raw(p + "self_attn.k_proj.bias")
                                    for p in pre])
                g["bv"] = np.stack([raw(p + "self_attn.v_proj.bias")
                                    for p in pre])
            if pre and f"{pre[0]}self_attn.q_norm.weight" in sd:
                g["q_norm"] = np.stack(
                    [raw(p + "self_attn.q_norm.weight") for p in pre])
                g["k_norm"] = np.stack(
                    [raw(p + "self_attn.k_norm.weight") for p in pre])
            return g

        p: Dict[str, Any] = {
            "embed": raw("model.embed_tokens.weight"),
            "final_norm": raw("model.norm.weight"),
            "lm_head": (t("lm_head.weight") if "lm_head.weight" in sd
                        else raw("model.embed_tokens.weight").T.copy()),
        }
        if Ld:
            g = attn_of(range(Ld))
            g["w_gate"] = np.stack(
                [t(f"model.layers.{i}.mlp.gate_proj.weight")
                 for i in range(Ld)])
            g["w_up"] = np.stack(
                [t(f"model.layers.{i}.mlp.up_proj.weight")
                 for i in range(Ld)])
            g["w_down"] = np.stack(
                [t(f"model.layers.{i}.mlp.down_proj.weight")
                 for i in range(Ld)])
            p["dense_layers"] = g
        g = attn_of(range(Ld, L))
        g["w_router"] = np.stack(
            [t(f"model.layers.{i}.mlp.gate.weight") for i in range(Ld, L)])
        g["e_bias"] = np.stack(
            [raw(f"model.layers.{i}.mlp.gate.e_score_correction_bias")
             for i in range(Ld, L)])
        for ours, theirs in (("xw_gate", "gate_proj"), ("xw_up", "up_proj"),
                             ("xw_down", "down_proj")):
            g[ours] = np.stack([
                np.stack([t(f"model.layers.{i}.mlp.experts.{x}."
                            f"{theirs}.weight") for x in range(X)])
                for i in range(Ld, L)
            ])
        for ours, theirs in (("sh_gate", "gate_proj"), ("sh_up", "up_proj"),
                             ("sh_down", "down_proj")):
            g[ours] = np.stack(
                [t(f"model.layers.{i}.mlp.shared_experts.{theirs}.weight")
                 for i in range(Ld, L)])
        p["moe_layers"] = g
        return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)

    # ------------- forward -------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", **_kw):
        E = cfg.hidden_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        eps = cfg.rms_norm_eps
        rot_dim = int(D * cfg.partial_rotary_factor)
        inv_freq = jnp.asarray(compute_inv_freq(rot_dim, cfg.rope_theta,
                                                cfg.raw.get("rope_scaling")))
        sm_scale = 1.0 / float(np.sqrt(D))
        use_qk_norm = bool(cfg.raw.get("use_qk_norm", False))
        Ld = cfg.first_k_dense_replace

        def attn(lp, hidden, kv_cache, abs_layer, positions, meta):
            b, t, _ = hidden.shape
            h = rms_norm(hidden, lp["input_norm"], eps)
            q = jnp.dot(h, lp["wq"])
            k = jnp.dot(h, lp["wk"])
            v = jnp.dot(h, lp["wv"])
            if "bq" in lp:
                q, k, v = q + lp["bq"], k + lp["bk"], v + lp["bv"]
            q = q.reshape(b, t, Hq, D)
            k = k.reshape(b, t, Hkv, D)
            v = v.reshape(b, t, Hkv, D)
            if use_qk_norm:
                q = rms_norm(q, lp["q_norm"], eps)
                k = rms_norm(k, lp["k_norm"], eps)
            q, k = apply_rope_partial(q, k, positions, inv_freq, rot_dim)
            kv_cache = write_kv_pages(kv_cache, abs_layer, k, v,
                                      meta.slot_ids)
            o = attn_fn(q, kv_cache, abs_layer, meta, sm_scale)
            o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
            return hidden + o, kv_cache

        def mlp(h, wg, wu, wd):
            return jnp.dot(jax.nn.silu(jnp.dot(h, wg)) * jnp.dot(h, wu), wd)

        def dense_body(l, hidden, kv_cache, layers_p, positions, meta):
            lp = jax.tree.map(lambda x: x[l], layers_p)
            hidden, kv_cache = attn(lp, hidden, kv_cache, l, positions, meta)
            h = rms_norm(hidden, lp["post_norm"], eps)
            return hidden + mlp(h, lp["w_gate"], lp["w_up"],
                                lp["w_down"]), kv_cache

        def moe_body(l, hidden, kv_cache, layers_p, positions, meta):
            lp = jax.tree.map(lambda x: x[l], layers_p)
            hidden, kv_cache = attn(lp, hidden, kv_cache, Ld + l, positions,
                                    meta)
            h = rms_norm(hidden, lp["post_norm"], eps)
            b, t, _ = h.shape
            h2 = h.reshape(b * t, E)
            ids, weights = deepseek_route(h2, lp["w_router"], lp["e_bias"],
                                          cfg)
            routed = apply_experts_grouped(
                h2, ids, weights, lp["xw_gate"], lp["xw_up"], lp["xw_down"]
            ).reshape(b, t, E).astype(h.dtype)
            shared = mlp(h, lp["sh_gate"], lp["sh_up"], lp["sh_down"])
            return hidden + routed + shared, kv_cache

        def forward(params, input_ids, positions, kv_cache,
                    meta: AttentionMetadata):
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            if Ld:
                def bodyd(l, carry):
                    h, kv = carry
                    return dense_body(l, h, kv, params["dense_layers"],
                                      positions, meta)

                hidden, kv_cache = jax.lax.fori_loop(
                    0, Ld, bodyd, (hidden, kv_cache))

            def bodym(l, carry):
                h, kv = carry
                return moe_body(l, h, kv, params["moe_layers"], positions,
                                meta)

            hidden, new_kv = jax.lax.fori_loop(
                0, cfg.num_hidden_layers - Ld, bodym, (hidden, kv_cache))
            hidden = rms_norm(hidden, params["final_norm"], eps)
            b = hidden.shape[0]
            if logits_mode == "hidden":
                return hidden[jnp.arange(b), meta.logit_idx], new_kv
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(b), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits, new_kv

        return forward
