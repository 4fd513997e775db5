"""Dense decoder-only transformer family: Llama / Qwen2 / Qwen2.5 / Qwen3 /
Mistral / Gemma-style dense models.

TPU-native re-design of the reference model zoo entries
(srt/models/llama.py, qwen2.py, qwen3.py — torch nn.Modules with per-rank
sharded Linear layers). Here the model is a pure function over a params
pytree; tensor parallelism comes from PartitionSpecs on the params (heads /
ffn / vocab sharded over the "tp" mesh axis) and GSPMD inserts the
collectives. Layers are stacked and iterated with lax.fori_loop (compile
time O(1) in depth; the KV cache carry updates in place).

KV cache layout: [L, num_pages, 2*Hkv, page_size, D] (see ops/__init__.py).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Dict, NamedTuple, Optional, Tuple

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


from sglang_diffusion_tpu.quant.quantize import dense_maybe_quantized as _dense


@register_model(
    "LlamaForCausalLM",
    "Qwen2ForCausalLM",
    "Qwen3ForCausalLM",
    "MistralForCausalLM",
    "GemmaForCausalLM",
    "Gemma2ForCausalLM",
    "Gemma3ForCausalLM",
)
class LlamaFamily:
    """Functional dense-transformer implementation."""

    supports_eagle = True  # implements "all_hidden"/"last+hidden" modes

    # ---------------- params ----------------
    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        L = cfg.num_hidden_layers
        E = cfg.hidden_size
        F = cfg.intermediate_size
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        V = cfg.vocab_size
        keys = jax.random.split(rng, 12)

        def init(key, shape, scale=None):
            scale = scale if scale is not None else 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        layers = {
            "input_norm": jnp.ones((L, E), dtype),
            "post_norm": jnp.ones((L, E), dtype),
            "wq": init(keys[0], (L, E, Hq * D)),
            "wk": init(keys[1], (L, E, Hkv * D)),
            "wv": init(keys[2], (L, E, Hkv * D)),
            "wo": init(keys[3], (L, Hq * D, E)),
            "w_gate": init(keys[4], (L, E, F)),
            "w_up": init(keys[5], (L, E, F)),
            "w_down": init(keys[6], (L, F, E)),
        }
        if cfg.attention_bias:
            layers["bq"] = jnp.zeros((L, Hq * D), dtype)
            layers["bk"] = jnp.zeros((L, Hkv * D), dtype)
            layers["bv"] = jnp.zeros((L, Hkv * D), dtype)
        if cfg.qk_norm:
            layers["q_norm"] = jnp.ones((L, D), dtype)
            layers["k_norm"] = jnp.ones((L, D), dtype)
        if cfg.sandwich_norms:
            layers["pre_ffw_norm"] = jnp.ones((L, E), dtype)
            layers["post_ffw_norm"] = jnp.ones((L, E), dtype)
        params = {
            "embed": init(keys[7], (V, E), scale=0.02),
            "layers": layers,
            "final_norm": jnp.ones((E,), dtype),
        }
        if not cfg.tie_word_embeddings:
            params["lm_head"] = init(keys[8], (E, V))
        return params

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        """PartitionSpecs over mesh axes ("dp","tp"): heads/ffn/vocab on tp.
        Analog of the reference's Column/RowParallelLinear split
        (srt/layers/linear.py)."""
        layers = {
            "input_norm": P(None, None),
            "post_norm": P(None, None),
            "wq": P(None, None, "tp"),
            "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"),
            "wo": P(None, "tp", None),
            "w_gate": P(None, None, "tp"),
            "w_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
        }
        if cfg.attention_bias:
            layers["bq"] = P(None, "tp")
            layers["bk"] = P(None, "tp")
            layers["bv"] = P(None, "tp")
        if cfg.qk_norm:
            layers["q_norm"] = P(None, None)
            layers["k_norm"] = P(None, None)
        if cfg.sandwich_norms:
            layers["pre_ffw_norm"] = P(None, None)
            layers["post_ffw_norm"] = P(None, None)
        specs = {
            "embed": P("tp", None),  # vocab-sharded
            "layers": layers,
            "final_norm": P(None),
        }
        if not cfg.tie_word_embeddings:
            specs["lm_head"] = P(None, "tp")
        return specs

    # ---------------- forward ----------------
    @staticmethod
    def make_layer_body(cfg: ModelConfig, attn_fn: Callable,
                        use_lora: bool = False):
        """Expose the single-layer body for external layer loops (pipeline
        parallelism runs it per stage over a local layer slice;
        parallel/pipeline.py)."""
        fwd_ctx = LlamaFamily.make_forward(cfg, attn_fn, use_lora=use_lora,
                                           _return_parts=True)
        return fwd_ctx["layer_body"]

    @staticmethod
    def make_embed_and_head(cfg: ModelConfig):
        """(embed(params, input_ids) -> hidden, logits(params, h_out) -> f32)."""
        gemma = cfg.gemma_style
        eps = cfg.rms_norm_eps

        def embed(params, input_ids):
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            if gemma:
                hidden = hidden * jnp.asarray(np.sqrt(cfg.hidden_size), hidden.dtype)
            return hidden

        def head(params, h_out):
            w = params["final_norm"]
            h_out = rms_norm(h_out, (1.0 + w) if gemma else w, eps)
            if cfg.tie_word_embeddings:
                logits = jnp.dot(h_out, params["embed"].T,
                                 preferred_element_type=jnp.float32)
            else:
                logits = _dense(h_out, params["lm_head"]).astype(jnp.float32)
            cap = cfg.final_logit_softcapping
            if cap is not None:
                logits = cap * jnp.tanh(logits / cap)
            return logits

        return embed, head

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable, logits_mode: str = "last",
                     use_lora: bool = False, _return_parts: bool = False):
        """Build the jittable forward step.

        forward(params, input_ids [B,T], positions [B,T],
                kv_cache [L,Pg,2Hkv,S,D], meta: AttentionMetadata)
            -> (logits, new_kv_cache)

        logits_mode "last": logits [B, V] at meta.logit_idx (decode/prefill);
        "all": logits [B, T, V] at every position (speculative verify,
        reference ForwardMode.TARGET_VERIFY, forward_batch_info.py:74);
        "last+hidden": (logits [B, V], hidden_all [B, T, E]) — prefill under
        EAGLE (features for the draft model, reference DRAFT_EXTEND mode);
        "all_hidden": (logits [B, T, V], hidden_all [B, T, E]) — EAGLE verify.
        Hidden features are pre-final-norm (the last decoder layer's output),
        matching the reference EAGLE worker's captured hidden_states
        (srt/speculative/eagle_worker.py:79).
        """
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        eps = cfg.rms_norm_eps
        sm_scale = 1.0 / float(np.sqrt(cfg.query_pre_attn_scalar or D))
        attn_softcap = cfg.attn_logit_softcapping
        final_softcap = cfg.final_logit_softcapping
        sandwich = cfg.sandwich_norms
        norm_after = cfg.norm_after
        rot_dim = int(D * cfg.partial_rotary_factor)
        partial_interleaved = cfg.partial_rotary_factor < 1.0
        rs = cfg.rope_scaling or {}
        is_longrope = rs.get("rope_type", rs.get("type")) == "longrope"
        if is_longrope:
            from sglang_diffusion_tpu.ops.rope import longrope_inv_freqs

            _s, _l, lr_orig, lr_ms, lr_ml = longrope_inv_freqs(
                D, cfg.rope_theta, cfg.rope_scaling,
                cfg.max_position_embeddings,
            )
            inv_freq = jnp.asarray(_s)
            inv_freq_long = jnp.asarray(_l)
        else:
            inv_freq = jnp.asarray(
                compute_inv_freq(rot_dim if partial_interleaved else D,
                                 cfg.rope_theta, cfg.rope_scaling)
            )
        # gemma3: sliding (local) layers use a second rope base
        inv_freq_local = (
            jnp.asarray(compute_inv_freq(D, cfg.rope_local_base_freq, None))
            if cfg.rope_local_base_freq is not None
            else None
        )
        has_bias = cfg.attention_bias
        has_qk_norm = cfg.qk_norm
        gemma = cfg.gemma_style
        act_fn = (
            (lambda x: jax.nn.gelu(x, approximate=True))
            if cfg.hidden_act in ("gelu", "gelu_pytorch_tanh")
            else jax.nn.silu
        )
        # sliding-window layers (mistral/gemma-style): per-layer window
        # constant indexed by the traced layer id inside the fori_loop
        layer_windows = cfg.layer_windows()
        windows_arr = (
            None if layer_windows is None else jnp.asarray(layer_windows)
        )

        def norm(x, w):
            # gemma stores zero-centered norm weights: scale = 1 + w
            return rms_norm(x, (1.0 + w) if gemma else w, eps)

        def layer_body(l, hidden, kv_cache, layers_p, positions, meta,
                       lora_tree=None, lora_ids=None):
            # one layer, indexed dynamically: params stream via dynamic
            # slices; the KV cache is scattered into IN PLACE (the cache is
            # the loop carry — no per-layer copies, unlike scan xs/ys)
            lp = jax.tree.map(lambda x: x[l], layers_p)
            b, t, e = hidden.shape

            # olmo2 (norm_after): the attention block reads the raw residual
            # stream — there is no input layernorm (reference
            # srt/models/olmo2.py:302 forward)
            h = hidden if norm_after else norm(hidden, lp["input_norm"])
            q = _dense(h, lp["wq"], lp.get("bq") if has_bias else None)
            k = _dense(h, lp["wk"], lp.get("bk") if has_bias else None)
            v = _dense(h, lp["wv"], lp.get("bv") if has_bias else None)
            if has_qk_norm and norm_after:
                # olmo2 q/k norm runs over the FLAT projection dim, before
                # the head reshape (reference olmo2.py:117-121)
                q = norm(q, lp["q_norm"])
                k = norm(k, lp["k_norm"])
            if use_lora:
                from sglang_diffusion_tpu.lora.manager import apply_lora

                q = apply_lora(h, q, lora_tree, "wq", lora_ids, l)
                k = apply_lora(h, k, lora_tree, "wk", lora_ids, l)
                v = apply_lora(h, v, lora_tree, "wv", lora_ids, l)
            q = q.reshape(b, t, Hq, D)
            k = k.reshape(b, t, Hkv, D)
            v = v.reshape(b, t, Hkv, D)
            if has_qk_norm and not norm_after:
                q = norm(q, lp["q_norm"])
                k = norm(k, lp["k_norm"])
            freq = inv_freq
            if inv_freq_local is not None and windows_arr is not None:
                # local (sliding) layers rotate with the local base (gemma3)
                freq = jnp.where(windows_arr[l] >= 0, inv_freq_local, inv_freq)
            if is_longrope:
                from sglang_diffusion_tpu.ops.rope import apply_rope_longrope

                q, k = apply_rope_longrope(
                    q, k, positions, inv_freq, inv_freq_long,
                    lr_orig, lr_ms, lr_ml,
                )
            elif partial_interleaved:
                from sglang_diffusion_tpu.ops.rope import (
                    apply_rope_partial_interleaved,
                )

                q, k = apply_rope_partial_interleaved(
                    q, k, positions, freq, rot_dim
                )
            else:
                q, k = apply_rope(q, k, positions, freq)
            kv_cache = write_kv_pages(kv_cache, l, k, v, meta.slot_ids)
            akw = {}
            if attn_softcap is not None:
                akw["softcap"] = attn_softcap
            if windows_arr is None:
                attn_out = attn_fn(q, kv_cache, l, meta, sm_scale, **akw)
            else:
                attn_out = attn_fn(q, kv_cache, l, meta, sm_scale,
                                   windows_arr[l], **akw)
            attn_flat = attn_out.reshape(b, t, Hq * D)
            o = _dense(attn_flat, lp["wo"])
            if use_lora:
                from sglang_diffusion_tpu.lora.manager import apply_lora

                o = apply_lora(attn_flat, o, lora_tree, "wo", lora_ids, l)
            if sandwich:
                # gemma2/3: post_attention_layernorm on the branch output
                hidden = hidden + norm(o, lp["post_norm"])
                h = norm(hidden, lp["pre_ffw_norm"])
                gate = _dense(h, lp["w_gate"])
                up = _dense(h, lp["w_up"])
                mlp = _dense(act_fn(gate) * up, lp["w_down"])
                hidden = hidden + norm(mlp, lp["post_ffw_norm"])
                return hidden, kv_cache
            if norm_after:
                # olmo2: norm the branch output, MLP also reads the raw
                # residual stream (reference olmo2.py:309-318)
                hidden = hidden + norm(o, lp["post_norm"])
                gate = _dense(hidden, lp["w_gate"])
                up = _dense(hidden, lp["w_up"])
                mlp = _dense(act_fn(gate) * up, lp["w_down"])
                hidden = hidden + norm(mlp, lp["post_ffw_norm"])
                return hidden, kv_cache
            hidden = hidden + o

            h = norm(hidden, lp["post_norm"])
            gate = _dense(h, lp["w_gate"])
            up = _dense(h, lp["w_up"])
            hidden = hidden + _dense(act_fn(gate) * up, lp["w_down"])
            return hidden, kv_cache

        if _return_parts:
            return {"layer_body": layer_body}

        def forward(params, input_ids, positions, kv_cache, meta: AttentionMetadata,
                    lora_tree=None, lora_ids=None):
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            if gemma:
                hidden = hidden * jnp.asarray(
                    np.sqrt(cfg.hidden_size), hidden.dtype
                )

            def body(l, carry):
                h, kv = carry
                return layer_body(l, h, kv, params["layers"], positions, meta,
                                  lora_tree, lora_ids)

            hidden, new_kv = jax.lax.fori_loop(
                0, cfg.num_hidden_layers, body, (hidden, kv_cache)
            )
            features = hidden  # pre-final-norm (EAGLE draft features)
            hidden = norm(hidden, params["final_norm"])
            b = hidden.shape[0]
            if logits_mode == "hidden":
                # embedding/pooling mode: last-token hidden state
                return hidden[jnp.arange(b), meta.logit_idx], new_kv
            if logits_mode in ("all", "all_hidden"):
                h_out = hidden  # [B, T, E]
            else:
                # logits only for the selected token of each sequence
                h_out = hidden[jnp.arange(b), meta.logit_idx]  # [B, E]
            if cfg.tie_word_embeddings:
                logits = jnp.dot(
                    h_out, params["embed"].T, preferred_element_type=jnp.float32
                )
            else:
                logits = _dense(h_out, params["lm_head"]).astype(jnp.float32)
            if final_softcap is not None:
                logits = final_softcap * jnp.tanh(logits / final_softcap)
            if logits_mode in ("all_hidden", "last+hidden"):
                return (logits, features), new_kv
            return logits, new_kv

        return forward

    # ---------------- HF checkpoint mapping ----------------
    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        """Map our param tree leaves to HF tensor names.

        Returns {param_path: (hf_name_template, transform)} where stacked layer
        params use "{i}" for the layer index and transform is applied per
        layer tensor ("t" = transpose 2D weight, None = as-is)."""
        m = {
            ("embed",): ("model.embed_tokens.weight", None),
            ("final_norm",): ("model.norm.weight", None),
            ("layers", "input_norm"): ("model.layers.{i}.input_layernorm.weight", None),
            ("layers", "post_norm"): (
                "model.layers.{i}.post_attention_layernorm.weight",
                None,
            ),
            ("layers", "wq"): ("model.layers.{i}.self_attn.q_proj.weight", "t"),
            ("layers", "wk"): ("model.layers.{i}.self_attn.k_proj.weight", "t"),
            ("layers", "wv"): ("model.layers.{i}.self_attn.v_proj.weight", "t"),
            ("layers", "wo"): ("model.layers.{i}.self_attn.o_proj.weight", "t"),
            ("layers", "w_gate"): ("model.layers.{i}.mlp.gate_proj.weight", "t"),
            ("layers", "w_up"): ("model.layers.{i}.mlp.up_proj.weight", "t"),
            ("layers", "w_down"): ("model.layers.{i}.mlp.down_proj.weight", "t"),
        }
        if cfg.attention_bias:
            m[("layers", "bq")] = ("model.layers.{i}.self_attn.q_proj.bias", None)
            m[("layers", "bk")] = ("model.layers.{i}.self_attn.k_proj.bias", None)
            m[("layers", "bv")] = ("model.layers.{i}.self_attn.v_proj.bias", None)
        if cfg.qk_norm:
            m[("layers", "q_norm")] = ("model.layers.{i}.self_attn.q_norm.weight", None)
            m[("layers", "k_norm")] = ("model.layers.{i}.self_attn.k_norm.weight", None)
        if cfg.sandwich_norms:
            m[("layers", "pre_ffw_norm")] = (
                "model.layers.{i}.pre_feedforward_layernorm.weight", None,
            )
            m[("layers", "post_ffw_norm")] = (
                "model.layers.{i}.post_feedforward_layernorm.weight", None,
            )
        if not cfg.tie_word_embeddings:
            m[("lm_head",)] = ("lm_head.weight", "t")
        return m
