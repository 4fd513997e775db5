"""Bamba hybrid family (BambaForCausalLM) — IBM's mamba2/attention
alternating stack (the NemotronH-class architecture in SURVEY §2.2).

Reference analog: srt/models/ hybrid linear-attention families
(nemotron_h/jamba-style). Numerics defined against HF transformers'
Bamba implementation: per-layer type from layers_block_type — "mamba"
layers run a Mamba2 mixer (gated RMSNorm), "attention" layers a
llama-style GQA with PARTIAL non-interleaved rotary; every layer ends
with pre_ff_layernorm + gated MLP.

Paged-engine integration follows models/falcon_h1.py: attention layers
use the paged cache (their own ordinals), mamba layers carry conv + SSM
state in per-request pools slot-indexed by the request's first page id.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
from sglang_diffusion_tpu.ops.mamba import (
    causal_conv1d,
    ssd_chunked,
    ssd_decode_step,
)
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import (
    apply_rope_partial,
    compute_inv_freq,
)


def _mdims(cfg: ModelConfig) -> Tuple[int, int, int, int, int, int, int]:
    r = cfg.raw
    d_inner = int(r.get("mamba_expand", 2) * cfg.hidden_size)
    H = r.get("mamba_n_heads", 8)
    Pd = r.get("mamba_d_head", d_inner // H)
    G = r.get("mamba_n_groups", 1)
    N = r.get("mamba_d_state", 128)
    K = r.get("mamba_d_conv", 4)
    conv_dim = d_inner + 2 * G * N
    return d_inner, H, Pd, G, N, K, conv_dim


def _types(cfg: ModelConfig) -> List[str]:
    lt = cfg.raw.get("layers_block_type")
    if lt:
        return list(lt[: cfg.num_hidden_layers])
    attn_idx = set(cfg.raw.get("attn_layer_indices") or [])
    return ["attention" if l in attn_idx else "mamba"
            for l in range(cfg.num_hidden_layers)]


@register_model("BambaForCausalLM")
class BambaFamily:
    has_linear_state = True
    supports_eagle = False

    @staticmethod
    def kv_layers(cfg: ModelConfig) -> int:
        return max(1, sum(1 for t in _types(cfg) if t == "attention"))

    @staticmethod
    def init_linear_state(cfg: ModelConfig, n_slots: int,
                          dtype=jnp.bfloat16):
        d_inner, H, Pd, G, N, K, conv_dim = _mdims(cfg)
        n_lin = max(1, sum(1 for t in _types(cfg) if t == "mamba"))
        return {
            "conv": jnp.zeros((n_lin, n_slots, K - 1, conv_dim), dtype),
            "recur": jnp.zeros((n_lin, n_slots, H, Pd, N), jnp.float32),
        }

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        E = cfg.hidden_size
        F = cfg.intermediate_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        d_inner, H, Pd, G, N, K, conv_dim = _mdims(cfg)
        keys = iter(jax.random.split(rng, 8 + 8 * cfg.num_hidden_layers))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        layers = []
        for lt in _types(cfg):
            lp = {
                "input_norm": jnp.ones((E,), dtype),
                "pre_ff_norm": jnp.ones((E,), dtype),
                "w_gate": init((E, F)),
                "w_up": init((E, F)),
                "w_down": init((F, E)),
            }
            if lt == "mamba":
                lp.update({
                    "in_proj": init((E, 2 * d_inner + 2 * G * N + H)),
                    "conv_w": init((K, conv_dim), scale_dim=K),
                    "conv_b": jnp.zeros((conv_dim,), dtype),
                    "dt_bias": jnp.zeros((H,), jnp.float32),
                    "A_log": jnp.zeros((H,), jnp.float32),
                    "D": jnp.ones((H,), jnp.float32),
                    "gated_norm": jnp.ones((d_inner,), dtype),
                    "out_proj": init((d_inner, E)),
                })
            else:
                lp.update({
                    "wq": init((E, Hq * D)),
                    "wk": init((E, Hkv * D)),
                    "wv": init((E, Hkv * D)),
                    "wo": init((Hq * D, E)),
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
        def spec_like(tree):
            if isinstance(tree, dict):
                return {k: spec_like(v) for k, v in tree.items()}
            if isinstance(tree, list):
                return [spec_like(v) for v in tree]
            return P()

        skel = jax.eval_shape(
            lambda: BambaFamily.init_params(jax.random.PRNGKey(0), cfg,
                                            jnp.float32))
        return spec_like(skel)

    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        layers = []
        for l, lt in enumerate(_types(cfg)):
            pre = f"model.layers.{l}."
            lp = {
                "input_norm": raw(pre + "input_layernorm.weight"),
                "pre_ff_norm": raw(pre + "pre_ff_layernorm.weight"),
                "w_gate": t(pre + "feed_forward.gate_proj.weight"),
                "w_up": t(pre + "feed_forward.up_proj.weight"),
                "w_down": t(pre + "feed_forward.down_proj.weight"),
            }
            if lt == "mamba":
                mp = pre + "mamba."
                lp.update({
                    "in_proj": t(mp + "in_proj.weight"),
                    "conv_w": raw(mp + "conv1d.weight")[:, 0].T,
                    "conv_b": raw(mp + "conv1d.bias"),
                    "dt_bias": raw(mp + "dt_bias"),
                    "A_log": raw(mp + "A_log"),
                    "D": raw(mp + "D"),
                    "gated_norm": raw(mp + "norm.weight"),
                    "out_proj": t(mp + "out_proj.weight"),
                })
            else:
                at = pre + "self_attn."
                lp.update({
                    "wq": t(at + "q_proj.weight"),
                    "wk": t(at + "k_proj.weight"),
                    "wv": t(at + "v_proj.weight"),
                    "wo": t(at + "o_proj.weight"),
                })
            layers.append(
                {k: jnp.asarray(v, jnp.float32) for k, v in lp.items()})
        p = {
            "embed": jnp.asarray(raw("model.embed_tokens.weight"),
                                 jnp.float32),
            "final_norm": jnp.asarray(raw("model.final_layernorm.weight"),
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
        d_inner, H, Pd, G, N, K, conv_dim = _mdims(cfg)
        eps = cfg.rms_norm_eps
        rot_dim = int(D * cfg.partial_rotary_factor)
        inv_freq = jnp.asarray(compute_inv_freq(rot_dim, cfg.rope_theta,
                                                None))
        sm_scale = 1.0 / float(np.sqrt(D))
        lim = tuple(cfg.raw.get("time_step_limit", (0.0, float("inf"))))
        types = _types(cfg)

        def mixer(lp, h, conv_st, recur_st, valid):
            b, t, _ = h.shape
            proj = jnp.dot(h, lp["in_proj"])
            gate, xbc, dt = jnp.split(
                proj, [d_inner, d_inner + conv_dim], axis=-1)
            vm = valid[..., None]
            xbc_in = jnp.where(vm, xbc, 0.0)
            xbc, _ = causal_conv1d(xbc_in, lp["conv_w"], lp["conv_b"],
                                   conv_st.astype(xbc.dtype))
            lens = jnp.sum(valid, axis=1)
            full_in = jnp.concatenate(
                [conv_st.astype(xbc_in.dtype), xbc_in], axis=1)
            idx = lens[:, None] + jnp.arange(K - 1)[None]
            new_conv = jnp.take_along_axis(full_in, idx[:, :, None], axis=1)
            x, Bc, Cc = jnp.split(xbc, [d_inner, d_inner + G * N], axis=-1)
            x = jnp.where(vm, x, 0.0).reshape(b, t, H, Pd)
            Bc = Bc.reshape(b, t, G, N)
            Cc = Cc.reshape(b, t, G, N)
            dt = jnp.where(valid[..., None], dt.astype(jnp.float32), -1e9)
            dt = jax.nn.softplus(dt + lp["dt_bias"].astype(jnp.float32))
            dt = jnp.clip(dt, lim[0], lim[1])
            A = -jnp.exp(lp["A_log"].astype(jnp.float32))
            if t == 1:
                y, new_ssm = ssd_decode_step(
                    x[:, 0], dt[:, 0], A, Bc[:, 0], Cc[:, 0], recur_st)
                y = y[:, None]
            else:
                pad = (-t) % 64
                if pad:
                    x = jnp.pad(x, ((0, 0), (0, pad), (0, 0), (0, 0)))
                    dt = jnp.pad(dt, ((0, 0), (0, pad), (0, 0)))
                    Bc = jnp.pad(Bc, ((0, 0), (0, pad), (0, 0), (0, 0)))
                    Cc = jnp.pad(Cc, ((0, 0), (0, pad), (0, 0), (0, 0)))
                y, new_ssm = ssd_chunked(x, dt, A, Bc, Cc, recur_st,
                                         chunk=64)
                y = y[:, :t]
                x = x[:, :t]
            y = y + lp["D"].astype(jnp.float32)[None, None, :, None] * x
            y = y.reshape(b, t, d_inner)
            yf = y.astype(jnp.float32) * jax.nn.silu(
                gate.astype(jnp.float32))
            var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True)
            yf = yf * jax.lax.rsqrt(var + eps)
            y = (yf * lp["gated_norm"].astype(jnp.float32)).astype(h.dtype)
            return jnp.dot(y, lp["out_proj"]), new_conv, new_ssm

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache["pages"]
            conv_pool = kv_cache["conv"]
            recur_pool = kv_cache["recur"]
            slot = jnp.maximum(meta.page_table[:, 0], 0)
            fresh = (meta.q_start_pos == 0)
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            q_pos = meta.q_start_pos[:, None] + jnp.arange(t)[None]
            valid = q_pos < meta.kv_lens[:, None]
            lf = ll = 0
            for l, lp in enumerate(params["layers"]):
                h = rms_norm(hidden, lp["input_norm"], eps)
                if types[l] == "mamba":
                    conv_st = jnp.take(conv_pool[ll], slot, axis=0)
                    conv_st = jnp.where(fresh[:, None, None],
                                        jnp.zeros_like(conv_st), conv_st)
                    recur_st = jnp.take(recur_pool[ll], slot, axis=0)
                    recur_st = jnp.where(fresh[:, None, None, None],
                                         jnp.zeros_like(recur_st), recur_st)
                    o, new_conv, new_ssm = mixer(lp, h, conv_st, recur_st,
                                                 valid)
                    conv_pool = conv_pool.at[ll, slot].set(
                        new_conv.astype(conv_pool.dtype))
                    recur_pool = recur_pool.at[ll, slot].set(
                        new_ssm.astype(recur_pool.dtype))
                    ll += 1
                else:
                    q = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, D)
                    k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
                    v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
                    q, k = apply_rope_partial(q, k, positions, inv_freq,
                                              rot_dim)
                    pages = write_kv_pages(pages, lf, k, v, meta.slot_ids)
                    o = attn_fn(q, pages, lf, meta, sm_scale)
                    o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
                    lf += 1
                hidden = hidden + o
                h2 = rms_norm(hidden, lp["pre_ff_norm"], eps)
                mlp = jnp.dot(
                    jax.nn.silu(jnp.dot(h2, lp["w_gate"]))
                    * jnp.dot(h2, lp["w_up"]), lp["w_down"])
                hidden = hidden + mlp
            hidden = rms_norm(hidden, params["final_norm"], eps)
            new_kv = {"pages": pages, "conv": conv_pool, "recur": recur_pool}
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits, new_kv

        return forward
