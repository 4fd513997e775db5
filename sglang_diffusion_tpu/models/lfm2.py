"""LFM2 conv-hybrid family (Lfm2ForCausalLM) — LiquidAI's alternating
gated-short-conv / GQA stack.

Reference analog: srt/models/lfm2.py. Numerics defined against HF
transformers' LFM2 implementation:

- "conv" layers: ``B, C, x = split(in_proj(h)); y = C * depthwise_causal_
  conv(B * x); out_proj(y)`` — kernel ``conv_L_cache``, NO activation.
- "full_attention" layers: GQA with per-head-dim q/k RMSNorm applied
  BEFORE full-dim rotate-half rope; out proj named ``out_proj``.
- decoder layer: pre-norm residual (``operator_norm`` / ``ffn_norm``),
  w1/w3/w2 silu MLP whose width follows the block_auto_adjust_ff_dim
  recomputation; final ``embedding_norm``; tied lm_head by default.

Paged-engine integration follows models/bamba.py: attention layers use
the paged cache with their own ordinals, conv layers carry a
(L_cache-1, E) per-request conv state pool slot-indexed by the request's
first page id.
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
from sglang_diffusion_tpu.ops.mamba import causal_conv1d
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq


def _layer_types(cfg: ModelConfig) -> List[str]:
    lt = cfg.raw.get("layer_types")
    if lt:
        return list(lt[: cfg.num_hidden_layers])
    fa = cfg.raw.get("full_attn_idxs")
    fa = set(fa if fa is not None else range(cfg.num_hidden_layers))
    return ["full_attention" if l in fa else "conv"
            for l in range(cfg.num_hidden_layers)]


def _ff_dim(cfg: ModelConfig) -> int:
    """HF Lfm2MLP intermediate-size recomputation."""
    r = cfg.raw
    inter = r.get("block_ff_dim", cfg.intermediate_size)
    if r.get("block_auto_adjust_ff_dim", True):
        inter = int(2 * inter / 3)
        mult = r.get("block_ffn_dim_multiplier", 1.0)
        if mult is not None:
            inter = int(mult * inter)
            mo = r.get("block_multiple_of", 256)
            inter = mo * ((inter + mo - 1) // mo)
    return inter


@register_model("Lfm2ForCausalLM", "LFM2ForCausalLM")
class Lfm2Family:
    has_linear_state = True
    supports_eagle = False

    @staticmethod
    def kv_layers(cfg: ModelConfig) -> int:
        return max(1, sum(1 for t in _layer_types(cfg)
                          if t == "full_attention"))

    @staticmethod
    def init_linear_state(cfg: ModelConfig, n_slots: int,
                          dtype=jnp.bfloat16):
        K = cfg.raw.get("conv_L_cache", 3)
        n_conv = max(1, sum(1 for t in _layer_types(cfg) if t == "conv"))
        return {"conv": jnp.zeros(
            (n_conv, n_slots, K - 1, cfg.hidden_size), dtype)}

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        E = cfg.hidden_size
        F = _ff_dim(cfg)
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        K = cfg.raw.get("conv_L_cache", 3)
        keys = iter(jax.random.split(rng, 4 + 6 * cfg.num_hidden_layers))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        layers = []
        for lt in _layer_types(cfg):
            lp = {
                "operator_norm": jnp.ones((E,), dtype),
                "ffn_norm": jnp.ones((E,), dtype),
                "w1": init((E, F)),
                "w3": init((E, F)),
                "w2": init((F, E)),
            }
            if lt == "conv":
                lp.update({
                    "in_proj": init((E, 3 * E)),
                    "conv_w": init((K, E), scale_dim=K),
                    "out_proj": init((E, E)),
                })
            else:
                lp.update({
                    "wq": init((E, Hq * D)),
                    "wk": init((E, Hkv * D)),
                    "wv": init((E, Hkv * D)),
                    "wo": init((Hq * D, E)),
                    "q_norm": jnp.ones((D,), dtype),
                    "k_norm": jnp.ones((D,), dtype),
                })
            layers.append(lp)
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
                    if kk in ("w1", "w3", "wq", "wk", "wv", "in_proj"):
                        out[kk] = P(None, "tp")
                    elif kk in ("w2", "wo", "out_proj"):
                        out[kk] = P("tp", None)
                    else:
                        out[kk] = spec(vv)
                return out
            if isinstance(tree, list):
                return [spec(v) for v in tree]
            return P()

        skel = jax.eval_shape(
            lambda: Lfm2Family.init_params(jax.random.PRNGKey(0), cfg,
                                           jnp.float32))
        return spec(skel)

    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        layers = []
        for l, lt in enumerate(_layer_types(cfg)):
            pre = f"model.layers.{l}."
            lp = {
                "operator_norm": raw(pre + "operator_norm.weight"),
                "ffn_norm": raw(pre + "ffn_norm.weight"),
                "w1": t(pre + "feed_forward.w1.weight"),
                "w3": t(pre + "feed_forward.w3.weight"),
                "w2": t(pre + "feed_forward.w2.weight"),
            }
            if lt == "conv":
                cp = pre + "conv."
                lp.update({
                    "in_proj": t(cp + "in_proj.weight"),
                    "conv_w": raw(cp + "conv.weight")[:, 0].T,  # [K, E]
                    "out_proj": t(cp + "out_proj.weight"),
                })
                if cp + "conv.bias" in sd:
                    lp["conv_b"] = raw(cp + "conv.bias")
                if cp + "in_proj.bias" in sd:
                    lp["in_proj_b"] = raw(cp + "in_proj.bias")
                if cp + "out_proj.bias" in sd:
                    lp["out_proj_b"] = raw(cp + "out_proj.bias")
            else:
                at = pre + "self_attn."
                lp.update({
                    "wq": t(at + "q_proj.weight"),
                    "wk": t(at + "k_proj.weight"),
                    "wv": t(at + "v_proj.weight"),
                    "wo": t(at + "out_proj.weight"),
                    "q_norm": raw(at + "q_layernorm.weight"),
                    "k_norm": raw(at + "k_layernorm.weight"),
                })
            layers.append(
                {k: jnp.asarray(v, jnp.float32) for k, v in lp.items()})
        p = {
            "embed": jnp.asarray(raw("model.embed_tokens.weight"),
                                 jnp.float32),
            "final_norm": jnp.asarray(raw("model.embedding_norm.weight"),
                                      jnp.float32),
            "layers": layers,
        }
        if "lm_head.weight" in sd:
            p["lm_head"] = jnp.asarray(t("lm_head.weight"), jnp.float32)
        else:
            p["lm_head"] = jnp.asarray(
                raw("model.embed_tokens.weight").T.copy(), jnp.float32)
        return p

    # ------------- forward -------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", **_kw):
        E = cfg.hidden_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        eps = cfg.raw.get("norm_eps", cfg.rms_norm_eps)
        K = cfg.raw.get("conv_L_cache", 3)
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))
        sm_scale = 1.0 / float(np.sqrt(D))
        types = _layer_types(cfg)

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache["pages"]
            conv_pool = kv_cache["conv"]
            slot = jnp.maximum(meta.page_table[:, 0], 0)
            fresh = (meta.q_start_pos == 0)
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            q_pos = meta.q_start_pos[:, None] + jnp.arange(t)[None]
            valid = q_pos < meta.kv_lens[:, None]
            lf = lc = 0
            for l, lp in enumerate(params["layers"]):
                h = rms_norm(hidden, lp["operator_norm"], eps)
                if types[l] == "conv":
                    proj = jnp.dot(h, lp["in_proj"])
                    if "in_proj_b" in lp:
                        proj = proj + lp["in_proj_b"]
                    Bg, Cg, xg = jnp.split(proj, 3, axis=-1)
                    bx = Bg * xg
                    bx = jnp.where(valid[..., None], bx, 0.0)
                    st = jnp.take(conv_pool[lc], slot, axis=0)
                    st = jnp.where(fresh[:, None, None],
                                   jnp.zeros_like(st), st)
                    y, _ = causal_conv1d(bx, lp["conv_w"],
                                         lp.get("conv_b"),
                                         st.astype(bx.dtype),
                                         activation=None)
                    # capture state at each request's true length (right
                    # padding must not shift the window)
                    lens = jnp.sum(valid, axis=1)
                    full_in = jnp.concatenate(
                        [st.astype(bx.dtype), bx], axis=1)
                    idx = lens[:, None] + jnp.arange(K - 1)[None]
                    new_st = jnp.take_along_axis(
                        full_in, idx[:, :, None], axis=1)
                    conv_pool = conv_pool.at[lc, slot].set(
                        new_st.astype(conv_pool.dtype))
                    o = Cg * y
                    o = jnp.dot(o, lp["out_proj"])
                    if "out_proj_b" in lp:
                        o = o + lp["out_proj_b"]
                    lc += 1
                else:
                    q = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, D)
                    k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
                    v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
                    q = rms_norm(q, lp["q_norm"], eps)
                    k = rms_norm(k, lp["k_norm"], eps)
                    q, k = apply_rope(q, k, positions, inv_freq)
                    pages = write_kv_pages(pages, lf, k, v, meta.slot_ids)
                    o = attn_fn(q, pages, lf, meta, sm_scale)
                    o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
                    lf += 1
                hidden = hidden + o
                h2 = rms_norm(hidden, lp["ffn_norm"], eps)
                mlp = jnp.dot(
                    jax.nn.silu(jnp.dot(h2, lp["w1"]))
                    * jnp.dot(h2, lp["w3"]), lp["w2"])
                hidden = hidden + mlp
            hidden = rms_norm(hidden, params["final_norm"], eps)
            new_kv = {"pages": pages, "conv": conv_pool}
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            w_head = (params["lm_head"] if "lm_head" in params
                      else params["embed"].T)
            logits = jnp.dot(h_out, w_head,
                             preferred_element_type=jnp.float32)
            return logits, new_kv

        return forward
