"""Nemotron-H hybrid family (NemotronHForCausalLM).

Reference analog: srt/models/nemotron_h.py — NVIDIA's hybrid stack driven
by `hybrid_override_pattern`: each layer is a SINGLE block selected per
character — "M" Mamba2 mixer, "*" NoPE attention (no rotary embedding,
nemotron_h.py:421 NemotronHAttention has no rotary_emb), "-" ReLU²
up/down MLP (no gate; nemotron_h.py:77 NemotronHMLP + ReLU2), "E" MoE —
with one pre-norm and one residual per layer (no per-layer FFN pairing,
unlike Bamba/Jamba).

Paged-engine integration follows models/bamba.py: attention layers use
the paged cache (their own ordinals), mamba layers carry conv + SSM
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


def _pattern(cfg: ModelConfig) -> str:
    pat = cfg.raw.get("hybrid_override_pattern")
    if not pat:
        pat = "M*-" * ((cfg.num_hidden_layers + 2) // 3)
    return pat[: cfg.num_hidden_layers]


def _mdims(cfg: ModelConfig) -> Tuple[int, int, int, int, int, int]:
    r = cfg.raw
    H = r.get("mamba_num_heads", 8)
    Pd = r.get("mamba_head_dim", 64)
    d_inner = H * Pd
    G = r.get("n_groups", 8)
    N = r.get("ssm_state_size", 128)
    K = r.get("conv_kernel", 4)
    conv_dim = d_inner + 2 * G * N
    return d_inner, H, Pd, G, N, K, conv_dim


@register_model("NemotronHForCausalLM")
class NemotronHFamily:
    has_linear_state = True
    supports_eagle = False

    @staticmethod
    def kv_layers(cfg: ModelConfig) -> int:
        return max(1, _pattern(cfg).count("*"))

    @staticmethod
    def init_linear_state(cfg: ModelConfig, n_slots: int,
                          dtype=jnp.bfloat16):
        d_inner, H, Pd, G, N, K, conv_dim = _mdims(cfg)
        n_lin = max(1, _pattern(cfg).count("M"))
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
        keys = iter(jax.random.split(rng, 4 + 8 * cfg.num_hidden_layers))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        layers = []
        for ch in _pattern(cfg):
            lp: Dict[str, Any] = {"input_norm": jnp.ones((E,), dtype)}
            if ch == "M":
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
            elif ch == "*":
                lp.update({
                    "wq": init((E, Hq * D)),
                    "wk": init((E, Hkv * D)),
                    "wv": init((E, Hkv * D)),
                    "wo": init((Hq * D, E)),
                })
            else:  # "-": ReLU^2 MLP
                lp.update({
                    "w_up": init((E, F)),
                    "w_down": init((F, E)),
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
            lambda: NemotronHFamily.init_params(
                jax.random.PRNGKey(0), cfg, jnp.float32))
        return spec_like(skel)

    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        layers = []
        for l, ch in enumerate(_pattern(cfg)):
            pre = f"backbone.layers.{l}."
            if pre + "norm.weight" not in sd:
                pre = f"model.layers.{l}."
            lp = {"input_norm": raw(pre + "norm.weight")}
            if ch == "M":
                mp = pre + "mixer."
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
            elif ch == "*":
                at = pre + "mixer."
                if at + "q_proj.weight" not in sd:
                    at = pre + "self_attn."
                lp.update({
                    "wq": t(at + "q_proj.weight"),
                    "wk": t(at + "k_proj.weight"),
                    "wv": t(at + "v_proj.weight"),
                    "wo": t(at + "o_proj.weight"),
                })
            else:
                mp = pre + "mixer."
                if mp + "up_proj.weight" not in sd:
                    mp = pre + "mlp."
                lp.update({
                    "w_up": t(mp + "up_proj.weight"),
                    "w_down": t(mp + "down_proj.weight"),
                })
            layers.append(
                {k: jnp.asarray(v, jnp.float32) for k, v in lp.items()})
        embed_key = ("backbone.embeddings.weight"
                     if "backbone.embeddings.weight" in sd
                     else "model.embed_tokens.weight")
        norm_key = ("backbone.norm_f.weight"
                    if "backbone.norm_f.weight" in sd
                    else "model.final_layernorm.weight")
        p = {
            "embed": jnp.asarray(raw(embed_key), jnp.float32),
            "final_norm": jnp.asarray(raw(norm_key), jnp.float32),
            "layers": layers,
        }
        if "lm_head.weight" in sd:
            p["lm_head"] = jnp.asarray(t("lm_head.weight"), jnp.float32)
        else:
            p["lm_head"] = jnp.asarray(raw(embed_key).T.copy(), jnp.float32)
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
        sm_scale = 1.0 / float(np.sqrt(D))
        lim = tuple(cfg.raw.get("time_step_limit", (0.0, float("inf"))))
        pattern = _pattern(cfg)

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
                ch = pattern[l]
                if ch == "M":
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
                elif ch == "*":
                    # NoPE: no rotary embedding (reference
                    # NemotronHAttention applies none)
                    q = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, D)
                    k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
                    v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
                    pages = write_kv_pages(pages, lf, k, v, meta.slot_ids)
                    o = attn_fn(q, pages, lf, meta, sm_scale)
                    o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
                    lf += 1
                else:
                    # ReLU^2 MLP: down(relu(up(x))^2)
                    u = jnp.dot(h, lp["w_up"])
                    u = jnp.square(jax.nn.relu(u))
                    o = jnp.dot(u, lp["w_down"])
                hidden = hidden + o
            hidden = rms_norm(hidden, params["final_norm"], eps)
            new_kv = {"pages": pages, "conv": conv_pool, "recur": recur_pool}
            bq = hidden.shape[0]
            if logits_mode == "hidden":
                return hidden[jnp.arange(bq), meta.logit_idx], new_kv
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits, new_kv

        return forward
