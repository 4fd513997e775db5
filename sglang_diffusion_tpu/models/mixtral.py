"""Mixtral-style MoE decoder (reference analog: srt/models/mixtral.py +
srt/layers/moe/).

Round-1 MoE strategy: compute all experts and combine with routing weights
("dense MoE") — correct and XLA-friendly at small batch; the grouped-GEMM
expert-parallel path (reference srt/layers/moe/ep_moe/) lands in a later
round as a Pallas sort-and-group kernel over the "tp"/"ep" mesh axes.

Router numerics follow Mixtral: softmax over top-k router logits.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

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


from sglang_diffusion_tpu.layers.moe import moe_mlp_dense as moe_mlp
from sglang_diffusion_tpu.layers.moe import moe_mlp_grouped


@register_model("MixtralForCausalLM", "Qwen2MoeForCausalLM", "Qwen3MoeForCausalLM")
class MixtralFamily:
    supports_moe_impl = True  # make_forward accepts moe_impl= (engine EP)

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        L = cfg.num_hidden_layers
        E = cfg.hidden_size
        F = cfg.moe_intermediate_size or cfg.intermediate_size
        X = cfg.num_experts
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        V = cfg.vocab_size
        keys = jax.random.split(rng, 12)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        layers = {
            "input_norm": jnp.ones((L, E), dtype),
            "post_norm": jnp.ones((L, E), dtype),
            "wq": init(keys[0], (L, E, Hq * D)),
            "wk": init(keys[1], (L, E, Hkv * D)),
            "wv": init(keys[2], (L, E, Hkv * D)),
            "wo": init(keys[3], (L, Hq * D, E)),
            "w_router": init(keys[4], (L, E, X)),
            "w_gate": init(keys[5], (L, X, E, F)),
            "w_up": init(keys[6], (L, X, E, F)),
            "w_down": init(keys[7], (L, X, F, E)),
        }
        params = {
            "embed": init(keys[8], (V, E)),
            "layers": layers,
            "final_norm": jnp.ones((E,), dtype),
            "lm_head": init(keys[9], (E, V)),
        }
        return params

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        layers = {
            "input_norm": P(None, None),
            "post_norm": P(None, None),
            "wq": P(None, None, "tp"),
            "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "w_router": P(None, None, None),
            # experts sharded over tp on the expert axis (EP-style)
            "w_gate": P(None, "tp", None, None),
            "w_up": P(None, "tp", None, None),
            "w_down": P(None, "tp", None, None),
        }
        return {
            "embed": P("tp", None),
            "layers": layers,
            "final_norm": P(None),
            "lm_head": P(None, "tp"),
        }

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable, logits_mode: str = "last",
                     moe_impl: str = "auto"):
        """moe_impl: "dense" (all-expert, GSPMD-safe under expert sharding),
        "grouped" (sort + ragged_dot grouped GEMM, O(k) FLOPs), "ep"
        (shard_map all-to-all expert dispatch over the tp axis,
        layers/moe.py make_ep_moe — reference ep_moe/ layer analog), or
        "auto" (grouped on a single-device mesh, dense otherwise)."""
        if moe_impl == "auto":
            from sglang_diffusion_tpu.parallel.mesh import get_mesh_context

            moe_impl = (
                "grouped" if get_mesh_context().mesh.size == 1 else "dense"
            )
        if moe_impl == "ep":
            from sglang_diffusion_tpu.layers.moe import make_ep_moe
            from sglang_diffusion_tpu.parallel.mesh import get_mesh_context

            ep_fn = make_ep_moe(
                get_mesh_context().mesh,
                top_k=cfg.num_experts_per_tok,
                num_experts=cfg.num_experts,
            )
            moe_fn = lambda h, wr, wg, wu, wd, k: ep_fn(h, wr, wg, wu, wd)  # noqa: E731
        else:
            moe_fn = moe_mlp_grouped if moe_impl == "grouped" else moe_mlp
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        eps = cfg.rms_norm_eps
        sm_scale = 1.0 / float(np.sqrt(D))
        top_k = cfg.num_experts_per_tok
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, cfg.rope_scaling))

        def layer_body(l, hidden, kv_cache, layers_p, positions, meta):
            lp = jax.tree.map(lambda x: x[l], layers_p)
            b, t, e = hidden.shape
            h = rms_norm(hidden, lp["input_norm"], eps)
            q = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, D)
            k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
            v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
            q, k = apply_rope(q, k, positions, inv_freq)
            kv_cache = write_kv_pages(kv_cache, l, k, v, meta.slot_ids)
            attn_out = attn_fn(q, kv_cache, l, meta, sm_scale)
            hidden = hidden + jnp.dot(attn_out.reshape(b, t, Hq * D), lp["wo"])

            h = rms_norm(hidden, lp["post_norm"], eps)
            hidden = hidden + moe_fn(
                h, lp["w_router"], lp["w_gate"], lp["w_up"], lp["w_down"], top_k
            )
            return hidden, kv_cache

        def forward(params, input_ids, positions, kv_cache, meta: AttentionMetadata):
            hidden = jnp.take(params["embed"], input_ids, axis=0)

            def body(l, carry):
                h, kv = carry
                return layer_body(l, h, kv, params["layers"], positions, meta)

            hidden, new_kv = jax.lax.fori_loop(
                0, cfg.num_hidden_layers, body, (hidden, kv_cache)
            )
            hidden = rms_norm(hidden, params["final_norm"], eps)
            b = hidden.shape[0]
            if logits_mode == "hidden":
                return hidden[jnp.arange(b), meta.logit_idx], new_kv
            h_out = hidden if logits_mode == "all" else hidden[jnp.arange(b), meta.logit_idx]
            logits = jnp.dot(h_out, params["lm_head"], preferred_element_type=jnp.float32)
            return logits, new_kv

        return forward

    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        m = {
            ("embed",): ("model.embed_tokens.weight", None),
            ("final_norm",): ("model.norm.weight", None),
            ("lm_head",): ("lm_head.weight", "t"),
            ("layers", "input_norm"): ("model.layers.{i}.input_layernorm.weight", None),
            ("layers", "post_norm"): (
                "model.layers.{i}.post_attention_layernorm.weight",
                None,
            ),
            ("layers", "wq"): ("model.layers.{i}.self_attn.q_proj.weight", "t"),
            ("layers", "wk"): ("model.layers.{i}.self_attn.k_proj.weight", "t"),
            ("layers", "wv"): ("model.layers.{i}.self_attn.v_proj.weight", "t"),
            ("layers", "wo"): ("model.layers.{i}.self_attn.o_proj.weight", "t"),
            ("layers", "w_router"): (
                "model.layers.{i}.block_sparse_moe.gate.weight",
                "t",
            ),
            # expert tensors: name template with {i}=layer, {x}=expert
            ("layers", "w_gate"): (
                "model.layers.{i}.block_sparse_moe.experts.{x}.w1.weight",
                "t",
            ),
            ("layers", "w_up"): (
                "model.layers.{i}.block_sparse_moe.experts.{x}.w3.weight",
                "t",
            ),
            ("layers", "w_down"): (
                "model.layers.{i}.block_sparse_moe.experts.{x}.w2.weight",
                "t",
            ),
        }
        return m


def make_expert_counts(cfg: ModelConfig, attn_fn: Callable):
    """Counting probe forward for EPLB (reference:
    srt/eplb/expert_distribution.py recorder hooks): runs the model on a
    batch and returns per-(layer, expert) routed-token counts [L, X] —
    everything else matches MixtralFamily.make_forward's layer math. Used
    by the engine at a low cadence (not in the hot step) so recording
    costs nothing at serve time."""
    from sglang_diffusion_tpu.layers.moe import _route

    Hq = cfg.num_attention_heads
    Hkv = cfg.num_key_value_heads
    D = cfg.actual_head_dim
    eps = cfg.rms_norm_eps
    sm_scale = 1.0 / float(np.sqrt(D))
    top_k = cfg.num_experts_per_tok
    X = cfg.num_experts
    inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, cfg.rope_scaling))

    def forward(params, input_ids, positions, kv_cache, meta):
        hidden = jnp.take(params["embed"], input_ids, axis=0)
        counts0 = jnp.zeros((cfg.num_hidden_layers, X), jnp.int32)

        def body(l, carry):
            hidden, kv_cache, counts = carry
            lp = jax.tree.map(lambda x: x[l], params["layers"])
            b, t, e = hidden.shape
            h = rms_norm(hidden, lp["input_norm"], eps)
            q = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, D)
            k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
            v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
            q, k = apply_rope(q, k, positions, inv_freq)
            kv_cache = write_kv_pages(kv_cache, l, k, v, meta.slot_ids)
            attn_out = attn_fn(q, kv_cache, l, meta, sm_scale)
            hidden = hidden + jnp.dot(attn_out.reshape(b, t, Hq * D), lp["wo"])
            h = rms_norm(hidden, lp["post_norm"], eps)
            ids, _ = _route(h.reshape(b * t, e), lp["w_router"], top_k)
            counts = counts.at[l].add(
                jnp.zeros((X,), jnp.int32).at[ids.reshape(-1)].add(1)
            )
            hidden = hidden + moe_mlp_grouped(
                h, lp["w_router"], lp["w_gate"], lp["w_up"], lp["w_down"],
                top_k,
            )
            return hidden, kv_cache, counts

        _, _, counts = jax.lax.fori_loop(
            0, cfg.num_hidden_layers, body, (hidden, kv_cache, counts0)
        )
        return counts

    return forward


def relayout_expert_params(layers_p, p2l_per_layer):
    """Apply a per-layer expert permutation as a RELABELING (reference:
    srt/eplb/expert_location_updater.py): gather the router's output
    columns and the stacked expert tensors by physical_to_logical. Routing
    numerics are invariant (top-k over permuted logits selects permuted
    ids), so the dispatcher and compiled steps are untouched — physical
    slot p now simply lives where the balancer put it.

    layers_p: params["layers"] dict; p2l_per_layer [L, X] int32 (jnp).
    Returns a new layers dict (same shapes/dtypes -> no recompile)."""
    idx = p2l_per_layer  # [L, X]
    out = dict(layers_p)
    out["w_router"] = jnp.take_along_axis(
        layers_p["w_router"], idx[:, None, :], axis=2
    )
    for k in ("w_gate", "w_up", "w_down"):
        w = layers_p[k]  # [L, X, A, B]
        out[k] = jnp.take_along_axis(
            w, idx[:, :, None, None], axis=1
        )
    return out
