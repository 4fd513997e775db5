"""Falcon-H1 hybrid family (FalconH1ForCausalLM).

Reference analog: srt/models/falcon_h1.py. Numerics defined against HF
transformers' FalconH1 implementation: every layer runs ATTENTION and a
MAMBA-2 mixer IN PARALLEL on the same normed input (outputs summed into
the residual), followed by a gated MLP — all scaled by the muP
multiplier set (embedding / attention in+out / key / ssm in+out /
per-channel mup_vector on the mixer projection / mlp gate+down /
lm_head).

Paged-engine integration mirrors models/qwen3_next.py: attention uses
the paged cache (layer l), the mixer's conv + SSM state live in
per-request pools slot-indexed by the request's first page id, reset at
q_start == 0; padded tokens are SSM no-ops (raw dt forced to -1e9 so
softplus -> 0: decay exp(0)=1, write 0).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
from sglang_diffusion_tpu.ops.mamba import (
    causal_conv1d,
    ssd_chunked,
    ssd_decode_step,
)
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq


def _mdims(cfg: ModelConfig) -> Tuple[int, int, int, int, int, int, int]:
    r = cfg.raw
    d_ssm = r.get("mamba_d_ssm") or int(
        r.get("mamba_expand", 2) * cfg.hidden_size)
    H = r.get("mamba_n_heads", 8)
    Pd = r.get("mamba_d_head", d_ssm // H)
    G = r.get("mamba_n_groups", 1)
    N = r.get("mamba_d_state", 16)
    K = r.get("mamba_d_conv", 4)
    conv_dim = d_ssm + 2 * G * N
    return d_ssm, H, Pd, G, N, K, conv_dim


def _mup_vector(cfg: ModelConfig) -> np.ndarray:
    """compute_mup_vector (HF): per-channel multipliers over the
    [z | x | B | C | dt] segments of the mixer in_proj output."""
    d_ssm, H, _, G, N, _, _ = _mdims(cfg)
    m = cfg.raw.get("ssm_multipliers", [1.0] * 5)
    v = np.ones(2 * d_ssm + 2 * G * N + H, np.float32)
    v[:d_ssm] *= m[0]
    v[d_ssm:2 * d_ssm] *= m[1]
    v[2 * d_ssm:2 * d_ssm + G * N] *= m[2]
    v[2 * d_ssm + G * N:2 * d_ssm + 2 * G * N] *= m[3]
    v[2 * d_ssm + 2 * G * N:] *= m[4]
    return v


@register_model("FalconH1ForCausalLM")
class FalconH1Family:
    has_linear_state = True
    supports_eagle = False

    @staticmethod
    def kv_layers(cfg: ModelConfig) -> int:
        return cfg.num_hidden_layers  # attention in EVERY layer

    @staticmethod
    def init_linear_state(cfg: ModelConfig, n_slots: int,
                          dtype=jnp.bfloat16):
        d_ssm, H, Pd, G, N, K, conv_dim = _mdims(cfg)
        L = cfg.num_hidden_layers
        return {
            "conv": jnp.zeros((L, n_slots, K - 1, conv_dim), dtype),
            "recur": jnp.zeros((L, n_slots, H, Pd, N), jnp.float32),
        }

    # ------------- params -------------
    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        E = cfg.hidden_size
        F = cfg.intermediate_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        d_ssm, H, Pd, G, N, K, conv_dim = _mdims(cfg)
        L = cfg.num_hidden_layers
        keys = iter(jax.random.split(rng, 24))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        layers = {
            "input_norm": jnp.ones((L, E), dtype),
            "pre_ff_norm": jnp.ones((L, E), dtype),
            "wq": init((L, E, Hq * D)),
            "wk": init((L, E, Hkv * D)),
            "wv": init((L, E, Hkv * D)),
            "wo": init((L, Hq * D, E)),
            "w_gate": init((L, E, F)),
            "w_up": init((L, E, F)),
            "w_down": init((L, F, E)),
            "in_proj": init((L, E, 2 * d_ssm + 2 * G * N + H)),
            "conv_w": init((L, K, conv_dim), scale_dim=K),
            "conv_b": jnp.zeros((L, conv_dim), dtype),
            "dt_bias": jnp.zeros((L, H), jnp.float32),
            "A_log": jnp.zeros((L, H), jnp.float32),
            "D": jnp.ones((L, H), jnp.float32),
            "gated_norm": jnp.ones((L, d_ssm), dtype),
            "out_proj": init((L, d_ssm, E)),
        }
        return {
            "embed": init((cfg.vocab_size, E), scale_dim=E),
            "final_norm": jnp.ones((E,), dtype),
            "lm_head": init((E, cfg.vocab_size)),
            "layers": layers,
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        lay = {
            "input_norm": P(), "pre_ff_norm": P(),
            "wq": P(None, None, "tp"), "wk": P(None, None, "tp"),
            "wv": P(None, None, "tp"), "wo": P(None, "tp", None),
            "w_gate": P(None, None, "tp"), "w_up": P(None, None, "tp"),
            "w_down": P(None, "tp", None),
            "in_proj": P(None, None, None), "conv_w": P(), "conv_b": P(),
            "dt_bias": P(), "A_log": P(), "D": P(), "gated_norm": P(),
            "out_proj": P(None, None, None),
        }
        return {"embed": P(), "final_norm": P(), "lm_head": P(None, "tp"),
                "layers": lay}

    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        L = cfg.num_hidden_layers

        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        def stack(fn, tmpl):
            return np.stack([fn(tmpl.format(i=i)) for i in range(L)])

        lyr = "model.layers.{i}."
        layers = {
            "input_norm": stack(raw, lyr + "input_layernorm.weight"),
            "pre_ff_norm": stack(raw, lyr + "pre_ff_layernorm.weight"),
            "wq": stack(t, lyr + "self_attn.q_proj.weight"),
            "wk": stack(t, lyr + "self_attn.k_proj.weight"),
            "wv": stack(t, lyr + "self_attn.v_proj.weight"),
            "wo": stack(t, lyr + "self_attn.o_proj.weight"),
            "w_gate": stack(t, lyr + "feed_forward.gate_proj.weight"),
            "w_up": stack(t, lyr + "feed_forward.up_proj.weight"),
            "w_down": stack(t, lyr + "feed_forward.down_proj.weight"),
            "in_proj": stack(t, lyr + "mamba.in_proj.weight"),
            "conv_w": stack(
                lambda n: np.asarray(sd[n])[:, 0].T, lyr + "mamba.conv1d.weight"),
            "conv_b": stack(raw, lyr + "mamba.conv1d.bias"),
            "dt_bias": stack(raw, lyr + "mamba.dt_bias"),
            "A_log": stack(raw, lyr + "mamba.A_log"),
            "D": stack(raw, lyr + "mamba.D"),
            "out_proj": stack(t, lyr + "mamba.out_proj.weight"),
        }
        if "model.layers.0.mamba.norm.weight" in sd:
            layers["gated_norm"] = stack(raw, lyr + "mamba.norm.weight")
        p = {
            "embed": raw("model.embed_tokens.weight"),
            "final_norm": raw("model.final_layernorm.weight"),
            "lm_head": (t("lm_head.weight") if "lm_head.weight" in sd
                        else raw("model.embed_tokens.weight").T.copy()),
            "layers": layers,
        }
        return jax.tree.map(lambda x: jnp.asarray(x, jnp.float32), p)

    # ------------- forward -------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", **_kw):
        E = cfg.hidden_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        d_ssm, H, Pd, G, N, K, conv_dim = _mdims(cfg)
        eps = cfg.rms_norm_eps
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))
        sm_scale = 1.0 / float(np.sqrt(D))
        r = cfg.raw
        emb_mult = float(r.get("embedding_multiplier", 1.0))
        lm_mult = float(r.get("lm_head_multiplier", 1.0))
        attn_in = float(r.get("attention_in_multiplier", 1.0))
        attn_out = float(r.get("attention_out_multiplier", 1.0))
        key_mult = float(r.get("key_multiplier", 1.0))
        ssm_in = float(r.get("ssm_in_multiplier", 1.0))
        ssm_out = float(r.get("ssm_out_multiplier", 1.0))
        gate_mult, down_mult = r.get("mlp_multipliers", [1.0, 1.0])
        mup = jnp.asarray(_mup_vector(cfg))
        lim = tuple(r.get("time_step_limit", (0.0, float("inf"))))

        def mixer(lp, h, conv_st, recur_st, valid):
            b, t, _ = h.shape
            proj = jnp.dot(h * ssm_in, lp["in_proj"]) * mup
            gate, xbc, dt = jnp.split(
                proj, [d_ssm, d_ssm + conv_dim], axis=-1)
            vm = valid[..., None]
            xbc_in = jnp.where(vm, xbc, 0.0)
            xbc, _ = causal_conv1d(
                xbc_in, lp["conv_w"], lp["conv_b"],
                conv_st.astype(xbc.dtype))
            # conv state = last K-1 VALID inputs per sequence
            lens = jnp.sum(valid, axis=1)
            full_in = jnp.concatenate(
                [conv_st.astype(xbc_in.dtype), xbc_in], axis=1)
            idx = lens[:, None] + jnp.arange(K - 1)[None]
            new_conv = jnp.take_along_axis(full_in, idx[:, :, None], axis=1)
            x, Bc, Cc = jnp.split(xbc, [d_ssm, d_ssm + G * N], axis=-1)
            x = jnp.where(vm, x, 0.0).reshape(b, t, H, Pd)
            Bc = Bc.reshape(b, t, G, N)
            Cc = Cc.reshape(b, t, G, N)
            # padded tokens: raw dt -> -inf so softplus -> 0 (no decay, no
            # write)
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
            y = y.reshape(b, t, d_ssm)
            yf = y.astype(jnp.float32) * jax.nn.silu(
                gate.astype(jnp.float32))
            if "gated_norm" in lp:  # mamba_rms_norm checkpoints
                var = jnp.mean(jnp.square(yf), axis=-1, keepdims=True)
                yf = yf * jax.lax.rsqrt(var + eps)
                yf = yf * lp["gated_norm"].astype(jnp.float32)
            y = yf.astype(h.dtype)
            return jnp.dot(y, lp["out_proj"]), new_conv, new_ssm

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache["pages"]
            conv_pool = kv_cache["conv"]
            recur_pool = kv_cache["recur"]
            slot = jnp.maximum(meta.page_table[:, 0], 0)
            fresh = (meta.q_start_pos == 0)
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0) * emb_mult
            q_pos = meta.q_start_pos[:, None] + jnp.arange(t)[None]
            valid = q_pos < meta.kv_lens[:, None]
            for l in range(cfg.num_hidden_layers):
                lp = jax.tree.map(lambda x: x[l], params["layers"])
                h = rms_norm(hidden, lp["input_norm"], eps)
                # mamba branch
                conv_st = jnp.take(conv_pool[l], slot, axis=0)
                conv_st = jnp.where(fresh[:, None, None],
                                    jnp.zeros_like(conv_st), conv_st)
                recur_st = jnp.take(recur_pool[l], slot, axis=0)
                recur_st = jnp.where(fresh[:, None, None, None],
                                     jnp.zeros_like(recur_st), recur_st)
                m_out, new_conv, new_ssm = mixer(lp, h, conv_st, recur_st,
                                                 valid)
                conv_pool = conv_pool.at[l, slot].set(
                    new_conv.astype(conv_pool.dtype))
                recur_pool = recur_pool.at[l, slot].set(
                    new_ssm.astype(recur_pool.dtype))
                # attention branch
                ha = h * attn_in
                q = jnp.dot(ha, lp["wq"]).reshape(b, t, Hq, D)
                k = jnp.dot(ha, lp["wk"]).reshape(b, t, Hkv, D) * key_mult
                v = jnp.dot(ha, lp["wv"]).reshape(b, t, Hkv, D)
                q, k = apply_rope(q, k, positions, inv_freq)
                pages = write_kv_pages(pages, l, k, v, meta.slot_ids)
                a_out = attn_fn(q, pages, l, meta, sm_scale)
                a_out = jnp.dot(a_out.reshape(b, t, Hq * D),
                                lp["wo"]) * attn_out
                hidden = hidden + m_out * ssm_out + a_out
                h2 = rms_norm(hidden, lp["pre_ff_norm"], eps)
                y = jnp.dot(h2, lp["w_up"]) * jax.nn.silu(
                    jnp.dot(h2, lp["w_gate"]) * gate_mult)
                hidden = hidden + jnp.dot(y, lp["w_down"]) * down_mult
            hidden = rms_norm(hidden, params["final_norm"], eps)
            new_kv = {"pages": pages, "conv": conv_pool, "recur": recur_pool}
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32) * lm_mult
            return logits, new_kv

        return forward
