"""GPT-OSS family.

Reference analog: srt/models/gpt_oss.py. Llama-shaped trunk with:
- attention SINKS: a learned per-head logit joins the softmax and its
  probability is dropped (ops/attention_xla.py `sinks`)
- alternating sliding/full attention layers (layer_types + sliding_window)
- YaRN rope (attention_scaling multiplies the rotated q/k)
- qkv/o biases
- MoE on EVERY layer: biased router, softmax-over-top-k weights, experts
  with INTERLEAVED fused gate_up + biases and the clamped swiglu
  glu = min(gate, limit) * sigmoid(1.702 * gate), out = (clip(up) + 1)*glu
Checkpoints store expert tensors pre-stacked ([X, E, 2F] Parameters), so
the weight map needs no per-expert templates. Numerics match HF
transformers' GptOss implementation (tests/test_gpt_oss.py).
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
from sglang_diffusion_tpu.ops.rope import (
    apply_rope,
    compute_inv_freq,
    yarn_attention_scale,
)

ALPHA = 1.702  # HF GptOssExperts.alpha
LIMIT = 7.0  # HF GptOssExperts.limit


def _experts_dense(h2, lp, top_k: int):
    """All-expert clamped-swiglu compute + weighted combine (HF
    GptOssExperts inference path; correctness baseline like
    layers/moe.py moe_mlp_dense)."""
    n, e = h2.shape
    x = lp["w_gate_up"].shape[0]
    logits = (
        jnp.dot(h2, lp["w_router"]).astype(jnp.float32) + lp["b_router"]
    )
    topv, topi = jax.lax.top_k(logits, top_k)
    weights = jax.nn.softmax(topv, axis=-1)
    onehot = jax.nn.one_hot(topi, x, dtype=jnp.float32)
    dense_w = jnp.einsum("nk,nkx->nx", weights, onehot)  # [N, X]
    gu = jnp.einsum("ne,xef->xnf", h2, lp["w_gate_up"]) + lp["b_gate_up"][
        :, None, :
    ]
    gate = gu[..., 0::2].astype(jnp.float32)
    up = gu[..., 1::2].astype(jnp.float32)
    gate = jnp.minimum(gate, LIMIT)
    up = jnp.clip(up, -LIMIT, LIMIT)
    glu = gate * jax.nn.sigmoid(gate * ALPHA)
    act = ((up + 1.0) * glu).astype(h2.dtype)
    y = jnp.einsum("xnf,xfe->xne", act, lp["w_down"]) + lp["b_down"][
        :, None, :
    ]
    out = jnp.einsum("xne,nx->ne", y.astype(jnp.float32), dense_w)
    return out.astype(h2.dtype)


@register_model("GptOssForCausalLM")
class GptOssFamily:
    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        L = cfg.num_hidden_layers
        E = cfg.hidden_size
        F = cfg.intermediate_size
        X = cfg.num_experts
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        V = cfg.vocab_size
        ks = jax.random.split(rng, 12)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        layers = {
            "input_norm": jnp.ones((L, E), dtype),
            "post_norm": jnp.ones((L, E), dtype),
            "wq": init(ks[0], (L, E, Hq * D)),
            "bq": jnp.zeros((L, Hq * D), dtype),
            "wk": init(ks[1], (L, E, Hkv * D)),
            "bk": jnp.zeros((L, Hkv * D), dtype),
            "wv": init(ks[2], (L, E, Hkv * D)),
            "bv": jnp.zeros((L, Hkv * D), dtype),
            "wo": init(ks[3], (L, Hq * D, E)),
            "bo": jnp.zeros((L, E), dtype),
            "sinks": jnp.zeros((L, Hq), dtype),
            "w_router": init(ks[4], (L, E, X)),
            "b_router": jnp.zeros((L, X), jnp.float32),
            "w_gate_up": init(ks[5], (L, X, E, 2 * F)),
            "b_gate_up": jnp.zeros((L, X, 2 * F), dtype),
            "w_down": init(ks[6], (L, X, F, E)),
            "b_down": jnp.zeros((L, X, E), dtype),
        }
        return {
            "embed": init(ks[7], (V, E)),
            "layers": layers,
            "final_norm": jnp.ones((E,), dtype),
            "lm_head": init(ks[8], (E, V)),
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        layers = {
            "input_norm": P(None, None),
            "post_norm": P(None, None),
            "wq": P(None, None, "tp"),
            "bq": P(None, "tp"),
            "wk": P(None, None, "tp"),
            "bk": P(None, "tp"),
            "wv": P(None, None, "tp"),
            "bv": P(None, "tp"),
            "wo": P(None, "tp", None),
            "bo": P(None, None),
            "sinks": P(None, "tp"),
            "w_router": P(None, None, None),
            "b_router": P(None, None),
            # experts sharded over tp on the expert axis (EP-style)
            "w_gate_up": P(None, "tp", None, None),
            "b_gate_up": P(None, "tp", None),
            "w_down": P(None, "tp", None, None),
            "b_down": P(None, "tp", None),
        }
        return {
            "embed": P("tp", None),
            "layers": layers,
            "final_norm": P(None),
            "lm_head": P(None, "tp"),
        }

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last"):
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        eps = cfg.rms_norm_eps
        sm_scale = 1.0 / float(np.sqrt(D))
        top_k = cfg.num_experts_per_tok
        inv_freq = jnp.asarray(
            compute_inv_freq(D, cfg.rope_theta, cfg.rope_scaling)
        )
        # yarn attention temperature is baked into cos/sin in HF
        # (attention_scaling): equivalent to scaling rotated q and k
        mscale = yarn_attention_scale(cfg.rope_scaling)
        layer_windows = cfg.layer_windows()
        windows_arr = (
            None if layer_windows is None else jnp.asarray(layer_windows)
        )

        def layer_body(l, hidden, kv_cache, layers_p, positions, meta):
            lp = jax.tree.map(lambda x: x[l], layers_p)
            b, t, e = hidden.shape
            h = rms_norm(hidden, lp["input_norm"], eps)
            q = (jnp.dot(h, lp["wq"]) + lp["bq"]).reshape(b, t, Hq, D)
            k = (jnp.dot(h, lp["wk"]) + lp["bk"]).reshape(b, t, Hkv, D)
            v = (jnp.dot(h, lp["wv"]) + lp["bv"]).reshape(b, t, Hkv, D)
            q, k = apply_rope(q, k, positions, inv_freq)
            if mscale != 1.0:
                q = q * mscale
                k = k * mscale
            kv_cache = write_kv_pages(kv_cache, l, k, v, meta.slot_ids)
            win = None if windows_arr is None else windows_arr[l]
            attn_out = attn_fn(q, kv_cache, l, meta, sm_scale, win,
                               sinks=lp["sinks"])
            o = jnp.dot(attn_out.reshape(b, t, Hq * D), lp["wo"]) + lp["bo"]
            hidden = hidden + o
            h2 = rms_norm(hidden, lp["post_norm"], eps)
            mlp = _experts_dense(h2.reshape(b * t, e), lp, top_k)
            hidden = hidden + mlp.reshape(b, t, e)
            return hidden, kv_cache

        def forward(params, input_ids, positions, kv_cache,
                    meta: AttentionMetadata):
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
            h_out = (
                hidden if logits_mode in ("all", "all_hidden")
                else hidden[jnp.arange(b), meta.logit_idx]
            )
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            if logits_mode == "all_hidden":
                return logits, hidden
            return logits, new_kv

        return forward

    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        lyr = "model.layers.{i}"
        return {
            ("embed",): ("model.embed_tokens.weight", None),
            ("final_norm",): ("model.norm.weight", None),
            ("lm_head",): ("lm_head.weight", "t"),
            ("layers", "input_norm"): (lyr + ".input_layernorm.weight", None),
            ("layers", "post_norm"): (
                lyr + ".post_attention_layernorm.weight", None),
            ("layers", "wq"): (lyr + ".self_attn.q_proj.weight", "t"),
            ("layers", "bq"): (lyr + ".self_attn.q_proj.bias", None),
            ("layers", "wk"): (lyr + ".self_attn.k_proj.weight", "t"),
            ("layers", "bk"): (lyr + ".self_attn.k_proj.bias", None),
            ("layers", "wv"): (lyr + ".self_attn.v_proj.weight", "t"),
            ("layers", "bv"): (lyr + ".self_attn.v_proj.bias", None),
            ("layers", "wo"): (lyr + ".self_attn.o_proj.weight", "t"),
            ("layers", "bo"): (lyr + ".self_attn.o_proj.bias", None),
            ("layers", "sinks"): (lyr + ".self_attn.sinks", None),
            ("layers", "w_router"): (lyr + ".mlp.router.weight", "t"),
            ("layers", "b_router"): (lyr + ".mlp.router.bias", None),
            # expert tensors are stored PRE-STACKED [X, ...] (Parameters)
            ("layers", "w_gate_up"): (lyr + ".mlp.experts.gate_up_proj", None),
            ("layers", "b_gate_up"): (
                lyr + ".mlp.experts.gate_up_proj_bias", None),
            ("layers", "w_down"): (lyr + ".mlp.experts.down_proj", None),
            ("layers", "b_down"): (lyr + ".mlp.experts.down_proj_bias", None),
        }
