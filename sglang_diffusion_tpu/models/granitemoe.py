"""GraniteMoE family (GraniteMoeForCausalLM / GraniteMoeSharedForCausalLM)
— IBM's MoE stack with Granite's scalar capacity multipliers.

Reference analog: srt/models/granitemoe.py. Numerics defined against HF
transformers' GraniteMoe implementation: granite GQA attention
(attention_multiplier logit scale, embedding/residual multipliers,
logits_scaling) with a sparse-MoE MLP — router top-k THEN softmax over
the selected logits (GraniteMoeTopKGating; olmoe softmaxes first), and
per-expert fused input_linear [E -> 2F] chunked into (gate, up) halves.
The Shared variant adds a dense SwiGLU branch (shared_mlp, also fused
input) summed with the expert output before the residual multiplier.

TPU notes: experts run through layers/moe.py apply_experts_grouped
(ragged_dot grouped GEMM); the fused HF weights are split into
gate/up stacks at load so the hot path is the same MXU-shaped grouped
GEMM every other MoE family uses.
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


def _route_granitemoe(h2, w_router, top_k):
    """top-k over raw logits, then softmax over the k selected logits
    (HF GraniteMoeTopKGating — no full-set softmax, no renorm flag)."""
    logits = jnp.dot(h2, w_router).astype(jnp.float32)
    topv, topi = jax.lax.top_k(logits, top_k)
    weights = jax.nn.softmax(topv, axis=-1)
    return topi.astype(jnp.int32), weights


@register_model("GraniteMoeForCausalLM")
@register_model("GraniteMoeSharedForCausalLM")
class GraniteMoeFamily:
    supports_eagle = False

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        E, F = cfg.hidden_size, cfg.intermediate_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        N = cfg.raw.get("num_local_experts", 8)
        Fs = cfg.raw.get("shared_intermediate_size", 0)
        keys = iter(jax.random.split(rng, 4 + 12 * cfg.num_hidden_layers))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        layers = []
        for _ in range(cfg.num_hidden_layers):
            lp = {
                "input_norm": jnp.ones((E,), dtype),
                "post_norm": jnp.ones((E,), dtype),
                "wq": init((E, Hq * D)),
                "wk": init((E, Hkv * D)),
                "wv": init((E, Hkv * D)),
                "wo": init((Hq * D, E)),
                "w_router": init((E, N)),
                "w_gate": init((N, E, F), scale_dim=E),
                "w_up": init((N, E, F), scale_dim=E),
                "w_down": init((N, F, E), scale_dim=F),
            }
            if Fs:
                lp.update({
                    "sh_gate": init((E, Fs)), "sh_up": init((E, Fs)),
                    "sh_down": init((Fs, E)),
                })
            layers.append(lp)
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
                    if kk in ("wq", "wk", "wv", "sh_gate", "sh_up"):
                        out[kk] = P(None, "tp")
                    elif kk in ("wo", "sh_down"):
                        out[kk] = P("tp", None)
                    elif kk in ("w_gate", "w_up"):
                        out[kk] = P("tp", None, None)  # expert-sharded (EP)
                    elif kk == "w_down":
                        out[kk] = P("tp", None, None)
                    else:
                        out[kk] = spec(vv)
                return out
            if isinstance(tree, list):
                return [spec(v) for v in tree]
            return P()

        skel = jax.eval_shape(
            lambda: GraniteMoeFamily.init_params(
                jax.random.PRNGKey(0), cfg, jnp.float32))
        return spec(skel)

    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        F = cfg.intermediate_size
        Fs = cfg.raw.get("shared_intermediate_size", 0)

        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        layers = []
        for l in range(cfg.num_hidden_layers):
            pre = f"model.layers.{l}."
            at = pre + "self_attn."
            moe = pre + "block_sparse_moe."
            # input_linear [N, 2F, E]: rows 0:F are the activated (gate)
            # half, rows F:2F the multiplicative (up) half
            # (GraniteMoeMoE.forward chunk(2, dim=-1))
            w_in = raw(moe + "input_linear.weight")
            lp = {
                "input_norm": raw(pre + "input_layernorm.weight"),
                "post_norm": raw(pre + "post_attention_layernorm.weight"),
                "wq": t(at + "q_proj.weight"),
                "wk": t(at + "k_proj.weight"),
                "wv": t(at + "v_proj.weight"),
                "wo": t(at + "o_proj.weight"),
                "w_router": t(moe + "router.layer.weight"),
                "w_gate": np.ascontiguousarray(
                    w_in[:, :F, :].transpose(0, 2, 1)),
                "w_up": np.ascontiguousarray(
                    w_in[:, F:, :].transpose(0, 2, 1)),
                "w_down": np.ascontiguousarray(
                    raw(moe + "output_linear.weight").transpose(0, 2, 1)),
            }
            if Fs:
                w_sh = raw(pre + "shared_mlp.input_linear.weight")
                lp.update({
                    "sh_gate": np.ascontiguousarray(w_sh[:Fs, :].T),
                    "sh_up": np.ascontiguousarray(w_sh[Fs:, :].T),
                    "sh_down": t(pre + "shared_mlp.output_linear.weight"),
                })
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
        top_k = r.get("num_experts_per_tok", 8)
        emb_mult = float(r.get("embedding_multiplier", 1.0))
        res_mult = float(r.get("residual_multiplier", 1.0))
        attn_mult = float(r.get("attention_multiplier", 1.0 / np.sqrt(D)))
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
                n, e = b * t, h2.shape[-1]
                flat = h2.reshape(n, e)
                ids, weights = _route_granitemoe(
                    flat, lp["w_router"], top_k)
                mlp = apply_experts_grouped(
                    flat, ids, weights, lp["w_gate"], lp["w_up"],
                    lp["w_down"]).reshape(b, t, e).astype(hidden.dtype)
                if "sh_gate" in lp:
                    mlp = mlp + jnp.dot(
                        jax.nn.silu(jnp.dot(h2, lp["sh_gate"]))
                        * jnp.dot(h2, lp["sh_up"]), lp["sh_down"])
                hidden = hidden + mlp * res_mult
            hidden = rms_norm(hidden, params["final_norm"], eps)
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits / logit_div, pages

        return forward
