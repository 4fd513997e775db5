"""Qwen3-Next hybrid family: Gated DeltaNet linear attention + gated full
attention + MoE with shared expert.

Reference analog: srt/models/qwen3_next.py (+ the fla gated-delta-rule
kernels it calls; our TPU math lives in ops/deltanet.py). Numerics are
defined against HF transformers' Qwen3Next implementation:

- zero-centered RMSNorms everywhere ((1 + w) scaling, HF Qwen3NextRMSNorm)
- full-attention layers: q_proj emits [query; gate], per-head q/k norms,
  PARTIAL non-interleaved rotary (rot_dim = head_dim *
  partial_rotary_factor), output gated by sigmoid(gate) before o_proj
- linear_attention layers: in_proj_qkvz/in_proj_ba with the grouped
  head-ordering fix, depthwise causal conv1d (silu) over [q;k;v],
  beta = sigmoid(b), g = -exp(A_log) * softplus(a + dt_bias), gated delta
  rule, then a GATED (non-zero-centered) RMSNorm with silu(z)
- MLP: softmax-over-all-logits top-k routing (norm_topk_prob) + shared
  expert scaled by sigmoid(shared_expert_gate)

Like the Mamba2 family, this is a standalone generator-style model (its
hybrid conv/recurrent/KV state does not fit the paged-KV runner yet):
prefill is one full-sequence forward, decode carries per-layer states.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.deltanet import (
    gated_delta_rule_chunked,
    gated_delta_rule_step,
)
from sglang_diffusion_tpu.ops.mamba import causal_conv1d
from sglang_diffusion_tpu.ops.rope import apply_rope_partial, compute_inv_freq


@dataclass
class _Dims:
    hk: int  # linear_num_key_heads
    hv: int  # linear_num_value_heads
    dk: int  # linear_key_head_dim
    dv: int  # linear_value_head_dim
    kconv: int  # linear_conv_kernel_dim
    rep: int  # hv // hk

    @property
    def key_dim(self) -> int:
        return self.hk * self.dk

    @property
    def value_dim(self) -> int:
        return self.hv * self.dv

    @property
    def conv_dim(self) -> int:
        return 2 * self.key_dim + self.value_dim


def _dims(cfg: ModelConfig) -> _Dims:
    r = cfg.raw
    hk = r.get("linear_num_key_heads", 16)
    hv = r.get("linear_num_value_heads", 32)
    return _Dims(
        hk=hk, hv=hv,
        dk=r.get("linear_key_head_dim", 128),
        dv=r.get("linear_value_head_dim", 128),
        kconv=r.get("linear_conv_kernel_dim", 4),
        rep=hv // hk,
    )


def _layer_types(cfg: ModelConfig) -> List[str]:
    lt = cfg.layer_types or cfg.raw.get("layer_types")
    if lt is None:
        lt = ["linear_attention"] * cfg.num_hidden_layers
    return list(lt[: cfg.num_hidden_layers])


def _is_moe(cfg: ModelConfig, l: int) -> bool:
    step = cfg.raw.get("decoder_sparse_step", 1)
    mlp_only = cfg.raw.get("mlp_only_layers", []) or []
    return (
        cfg.num_experts > 0 and l not in mlp_only and (l + 1) % step == 0
    )


def _zc_norm(x, w, eps):
    """Zero-centered RMSNorm (HF Qwen3NextRMSNorm): norm in f32, scale by
    (1 + w) in f32, cast at the end."""
    xf = x.astype(jnp.float32)
    var = (xf * xf).mean(-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps) * (1.0 + w.astype(jnp.float32))
            ).astype(x.dtype)


def _gated_norm(x, w, z, eps):
    """HF Qwen3NextRMSNormGated: plain-weight RMSNorm then * silu(z)."""
    xf = x.astype(jnp.float32)
    var = (xf * xf).mean(-1, keepdims=True)
    y = xf * jax.lax.rsqrt(var + eps) * w.astype(jnp.float32)
    return (y * jax.nn.silu(z.astype(jnp.float32))).astype(x.dtype)


def _split_qkvz_ba(qkvz, ba, d: _Dims):
    """HF fix_query_key_value_ordering: projections are grouped by K-head.
    qkvz [B, T, key_dim*2 + value_dim*2], ba [B, T, 2*hv]."""
    b, t = qkvz.shape[:2]
    block = 2 * d.dk + 2 * d.rep * d.dv
    m = qkvz.reshape(b, t, d.hk, block)
    q = m[..., : d.dk]
    k = m[..., d.dk : 2 * d.dk]
    v = m[..., 2 * d.dk : 2 * d.dk + d.rep * d.dv].reshape(b, t, d.hv, d.dv)
    z = m[..., 2 * d.dk + d.rep * d.dv :].reshape(b, t, d.hv, d.dv)
    mb = ba.reshape(b, t, d.hk, 2 * d.rep)
    beta = mb[..., : d.rep].reshape(b, t, d.hv)
    a = mb[..., d.rep :].reshape(b, t, d.hv)
    return q, k, v, z, beta, a


def _moe_mlp(h2, lp, cfg: ModelConfig):
    """Softmax-all routing + top-k (+renorm) + shared expert
    (HF Qwen3NextSparseMoeBlock)."""
    n, e = h2.shape
    x = cfg.num_experts
    k = cfg.num_experts_per_tok
    logits = jnp.dot(h2, lp["w_router"]).astype(jnp.float32)
    probs = jax.nn.softmax(logits, axis=-1)
    topv, topi = jax.lax.top_k(probs, k)
    if cfg.norm_topk_prob:
        topv = topv / topv.sum(-1, keepdims=True)
    onehot = jax.nn.one_hot(topi, x, dtype=jnp.float32)
    dense_w = jnp.einsum("nk,nkx->nx", topv, onehot)
    gate = jnp.einsum("ne,xef->xnf", h2, lp["w_gate"])
    up = jnp.einsum("ne,xef->xnf", h2, lp["w_up"])
    y = jnp.einsum("xnf,xfe->xne", jax.nn.silu(gate) * up, lp["w_down"])
    out = jnp.einsum("xne,nx->ne", y.astype(jnp.float32), dense_w)
    sh_gate = jax.nn.sigmoid(
        jnp.dot(h2, lp["w_shared_gate"]).astype(jnp.float32)
    )
    sg = jnp.dot(h2, lp["w_shared_gate_proj"])
    su = jnp.dot(h2, lp["w_shared_up"])
    shared = jnp.dot(jax.nn.silu(sg) * su, lp["w_shared_down"])
    return (out + sh_gate * shared.astype(jnp.float32)).astype(h2.dtype)


def _dense_mlp(h2, lp):
    gate = jnp.dot(h2, lp["w_gate"])
    up = jnp.dot(h2, lp["w_up"])
    return jnp.dot(jax.nn.silu(gate) * up, lp["w_down"])


@register_model("Qwen3NextForCausalLM")
class Qwen3NextFamily:
    is_hybrid_recurrent = True  # standalone generator path still available
    # round 4: paged-engine integration (reference analog: HybridLinear KV
    # pools, srt/mem_cache/memory_pool.py:1757). Full-attention layers use
    # the paged cache (their own layer ordinals); linear-attention layers
    # carry per-REQUEST conv + recurrent state in pools indexed by the
    # request's FIRST page id — unique while the request is alive, freed
    # with its pages, and reset on prefill start (q_start == 0), so slot
    # reuse needs no extra bookkeeping. Radix prefix reuse is disabled for
    # hybrid models (a cached-prefix skip would leave the recurrent state
    # uncomputed; the reference uses a dedicated mamba radix cache).
    has_linear_state = True
    supports_eagle = False

    # ------------- weights -------------
    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        """Build the param tree from an HF state dict (numpy tensors).
        Layers are heterogeneous, so params["layers"] is a LIST."""
        d = _dims(cfg)

        def t(name):
            return np.ascontiguousarray(sd[name].T)

        def raw(name):
            return np.ascontiguousarray(sd[name])

        layers = []
        for l, lt in enumerate(_layer_types(cfg)):
            pre = f"model.layers.{l}."
            lp: Dict[str, Any] = {
                "input_norm": raw(pre + "input_layernorm.weight"),
                "post_norm": raw(pre + "post_attention_layernorm.weight"),
            }
            if lt == "linear_attention":
                la = pre + "linear_attn."
                lp.update({
                    "in_qkvz": t(la + "in_proj_qkvz.weight"),
                    "in_ba": t(la + "in_proj_ba.weight"),
                    "conv_w": raw(la + "conv1d.weight")[:, 0].T,  # [K, C]
                    "A_log": raw(la + "A_log"),
                    "dt_bias": raw(la + "dt_bias"),
                    "norm_w": raw(la + "norm.weight"),
                    "out_proj": t(la + "out_proj.weight"),
                })
            else:
                at = pre + "self_attn."
                lp.update({
                    "wq": t(at + "q_proj.weight"),  # [E, Hq*D*2]
                    "wk": t(at + "k_proj.weight"),
                    "wv": t(at + "v_proj.weight"),
                    "wo": t(at + "o_proj.weight"),
                    "q_norm": raw(at + "q_norm.weight"),
                    "k_norm": raw(at + "k_norm.weight"),
                })
            if _is_moe(cfg, l):
                mp = pre + "mlp."
                lp.update({
                    "w_router": t(mp + "gate.weight"),
                    "w_gate": np.stack([
                        t(mp + f"experts.{x}.gate_proj.weight")
                        for x in range(cfg.num_experts)
                    ]),
                    "w_up": np.stack([
                        t(mp + f"experts.{x}.up_proj.weight")
                        for x in range(cfg.num_experts)
                    ]),
                    "w_down": np.stack([
                        t(mp + f"experts.{x}.down_proj.weight")
                        for x in range(cfg.num_experts)
                    ]),
                    "w_shared_gate": t(mp + "shared_expert_gate.weight"),
                    "w_shared_gate_proj": t(
                        mp + "shared_expert.gate_proj.weight"),
                    "w_shared_up": t(mp + "shared_expert.up_proj.weight"),
                    "w_shared_down": t(mp + "shared_expert.down_proj.weight"),
                })
            else:
                mp = pre + "mlp."
                lp.update({
                    "w_gate": t(mp + "gate_proj.weight"),
                    "w_up": t(mp + "up_proj.weight"),
                    "w_down": t(mp + "down_proj.weight"),
                })
            layers.append(
                {k: jnp.asarray(v, jnp.float32) for k, v in lp.items()}
            )
        params = {
            "embed": jnp.asarray(sd["model.embed_tokens.weight"], jnp.float32),
            "final_norm": jnp.asarray(sd["model.norm.weight"], jnp.float32),
            "layers": layers,
        }
        if "lm_head.weight" in sd:
            params["lm_head"] = jnp.asarray(sd["lm_head.weight"].T, jnp.float32)
        return params

    @staticmethod
    def kv_layers(cfg: ModelConfig) -> int:
        """Paged-cache layer count = number of full-attention layers."""
        return sum(1 for t in _layer_types(cfg) if t == "full_attention")

    @staticmethod
    def init_linear_state(cfg: ModelConfig, n_slots: int, dtype=jnp.bfloat16):
        d = _dims(cfg)
        n_lin = sum(1 for t in _layer_types(cfg) if t == "linear_attention")
        return {
            "conv": jnp.zeros((n_lin, n_slots, d.kconv - 1, d.conv_dim),
                              dtype),
            # recurrent state in f32 (HF keeps the delta-rule state f32)
            "recur": jnp.zeros((n_lin, n_slots, d.hv, d.dk, d.dv),
                               jnp.float32),
        }

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        """Random init with the same tree as params_from_state_dict."""
        d = _dims(cfg)
        E = cfg.hidden_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        keys = iter(jax.random.split(rng, 16 + 16 * cfg.num_hidden_layers))

        def init(shape, scale_dim=None):
            sd_ = 1.0 / np.sqrt(scale_dim or shape[0])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd_).astype(dtype)

        layers = []
        for l, lt in enumerate(_layer_types(cfg)):
            lp = {
                "input_norm": jnp.zeros((E,), dtype),
                "post_norm": jnp.zeros((E,), dtype),
            }
            if lt == "linear_attention":
                lp.update({
                    "in_qkvz": init((E, 2 * d.key_dim + 2 * d.value_dim)),
                    "in_ba": init((E, 2 * d.hv)),
                    "conv_w": init((d.kconv, d.conv_dim), scale_dim=d.kconv),
                    "A_log": jnp.zeros((d.hv,), jnp.float32),
                    "dt_bias": jnp.zeros((d.hv,), jnp.float32),
                    "norm_w": jnp.ones((d.dv,), dtype),
                    "out_proj": init((d.value_dim, E)),
                })
            else:
                lp.update({
                    "wq": init((E, Hq * 2 * D)),
                    "wk": init((E, Hkv * D)),
                    "wv": init((E, Hkv * D)),
                    "wo": init((Hq * D, E)),
                    "q_norm": jnp.zeros((D,), dtype),
                    "k_norm": jnp.zeros((D,), dtype),
                })
            if _is_moe(cfg, l):
                X = cfg.num_experts
                F = cfg.moe_intermediate_size or cfg.intermediate_size
                Fs = cfg.raw.get("shared_expert_intermediate_size",
                                 cfg.intermediate_size)
                lp.update({
                    "w_router": init((E, X)),
                    "w_gate": init((X, E, F), scale_dim=E),
                    "w_up": init((X, E, F), scale_dim=E),
                    "w_down": init((X, F, E), scale_dim=F),
                    "w_shared_gate": init((E, 1)),
                    "w_shared_gate_proj": init((E, Fs)),
                    "w_shared_up": init((E, Fs)),
                    "w_shared_down": init((Fs, E)),
                })
            else:
                F = cfg.intermediate_size
                lp.update({
                    "w_gate": init((E, F)),
                    "w_up": init((E, F)),
                    "w_down": init((F, E)),
                })
            layers.append(lp)
        return {
            "embed": init((cfg.vocab_size, E)),
            "final_norm": jnp.zeros((E,), dtype),
            "layers": layers,
        }

    @staticmethod
    def partition_specs(cfg: ModelConfig):
        from jax.sharding import PartitionSpec as P

        # replicate everything (hybrid state pools dominate memory anyway);
        # heads/ffn sharding can come later
        def spec_like(tree):
            if isinstance(tree, dict):
                return {k: spec_like(v) for k, v in tree.items()}
            if isinstance(tree, list):
                return [spec_like(v) for v in tree]
            return P()

        # build from a shape-only skeleton: same structure as init_params
        import jax as _jax

        skeleton = _jax.eval_shape(
            lambda: Qwen3NextFamily.init_params(
                _jax.random.PRNGKey(0), cfg, jnp.float32)
        )
        return spec_like(skeleton)

    # ------------- shared layer math -------------
    @staticmethod
    def _linear_attn_proj(h, lp, d: _Dims):
        qkvz = jnp.dot(h, lp["in_qkvz"])
        ba = jnp.dot(h, lp["in_ba"])
        q, k, v, z, b_, a = _split_qkvz_ba(qkvz, ba, d)
        beta = jax.nn.sigmoid(b_.astype(jnp.float32))
        g = -jnp.exp(lp["A_log"].astype(jnp.float32)) * jax.nn.softplus(
            a.astype(jnp.float32) + lp["dt_bias"].astype(jnp.float32)
        )
        return q, k, v, z, beta, g

    # ------------- paged-engine forward (round 4) -------------
    @staticmethod
    def make_paged_forward(cfg: ModelConfig, attn_fn,
                           logits_mode: str = "last"):
        """forward(params, input_ids, positions, kv_cache, meta) for the
        paged runner. kv_cache is the PYTREE
        {"pages": [L_full, P, S, 2Hkv, D], "conv": ..., "recur": ...};
        linear-layer state lives in slot = page_table[:, 0] and resets
        when q_start == 0 (sequence start)."""
        from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages

        d = _dims(cfg)
        eps = cfg.rms_norm_eps
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        rot_dim = int(D * cfg.partial_rotary_factor)
        inv_freq = jnp.asarray(compute_inv_freq(rot_dim, cfg.rope_theta,
                                                None))
        sm_scale = 1.0 / np.sqrt(D)
        types = _layer_types(cfg)

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache["pages"]
            conv_pool = kv_cache["conv"]
            recur_pool = kv_cache["recur"]
            slot = jnp.maximum(meta.page_table[:, 0], 0)  # [B]
            fresh = (meta.q_start_pos == 0)  # [B] sequence start
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            # valid-token mask (right padding + chunk bounds)
            q_pos = meta.q_start_pos[:, None] + jnp.arange(t)[None]
            valid = (q_pos < meta.kv_lens[:, None])  # [B, T]
            lf = 0  # full-attention ordinal (pages cache layer index)
            ll = 0  # linear-attention ordinal (state pool index)
            for l, lp in enumerate(params["layers"]):
                h = _zc_norm(hidden, lp["input_norm"], eps)
                if types[l] == "linear_attention":
                    q, k, v, z, beta, g = Qwen3NextFamily._linear_attn_proj(
                        h, lp, d)
                    # padded tokens must be recurrence no-ops:
                    # beta=0 (no write), g=0 (decay exp(0)=1)
                    vm = valid[..., None]
                    beta = jnp.where(vm, beta, 0.0)
                    g = jnp.where(vm, g, 0.0)
                    mixed = jnp.concatenate([
                        q.reshape(b, t, -1), k.reshape(b, t, -1),
                        v.reshape(b, t, -1),
                    ], axis=-1)
                    conv_st = jnp.take(conv_pool[ll], slot, axis=0)
                    conv_st = jnp.where(fresh[:, None, None],
                                        jnp.zeros_like(conv_st), conv_st)
                    recur_st = jnp.take(recur_pool[ll], slot, axis=0)
                    recur_st = jnp.where(fresh[:, None, None, None],
                                         jnp.zeros_like(recur_st), recur_st)
                    # zero padded conv inputs so they don't pollute the
                    # rolling state, then take the last K-1 rows at each
                    # sequence's true end
                    mixed_in = jnp.where(vm, mixed, 0.0)
                    mixed_out, _ = causal_conv1d(
                        mixed_in, lp["conv_w"], None,
                        conv_st.astype(mixed.dtype))
                    # new conv state: rows [len-K+1, len) of [state ++ valid
                    # tokens] (per sequence true length)
                    lens = jnp.sum(valid, axis=1)  # [B]
                    full_in = jnp.concatenate(
                        [conv_st.astype(mixed.dtype), mixed_in], axis=1)
                    idx = (lens[:, None] + jnp.arange(d.kconv - 1)[None])
                    new_conv = jnp.take_along_axis(
                        full_in, idx[:, :, None], axis=1)
                    if t == 1:
                        qc = mixed_out[..., : d.key_dim].reshape(
                            b, d.hk, d.dk)
                        kc = mixed_out[..., d.key_dim: 2 * d.key_dim].reshape(
                            b, d.hk, d.dk)
                        vc = mixed_out[..., 2 * d.key_dim:].reshape(
                            b, d.hv, d.dv)
                        qc = jnp.repeat(qc, d.rep, axis=1)
                        kc = jnp.repeat(kc, d.rep, axis=1)
                        out, rec = gated_delta_rule_step(
                            qc, kc, vc, g[:, 0], beta[:, 0],
                            recur_st)
                        out = out[:, None]
                    else:
                        qc = mixed_out[..., : d.key_dim].reshape(
                            b, t, d.hk, d.dk)
                        kc = mixed_out[..., d.key_dim: 2 * d.key_dim].reshape(
                            b, t, d.hk, d.dk)
                        vc = mixed_out[..., 2 * d.key_dim:].reshape(
                            b, t, d.hv, d.dv)
                        qc = jnp.repeat(qc, d.rep, axis=2)
                        kc = jnp.repeat(kc, d.rep, axis=2)
                        out, rec = gated_delta_rule_chunked(
                            qc, kc, vc, g, beta, chunk_size=64,
                            initial_state=recur_st)
                    out = _gated_norm(out, lp["norm_w"], z, eps)
                    o = jnp.dot(out.reshape(b, t, -1), lp["out_proj"])
                    conv_pool = conv_pool.at[ll, slot].set(
                        new_conv.astype(conv_pool.dtype))
                    recur_pool = recur_pool.at[ll, slot].set(
                        rec.astype(recur_pool.dtype))
                    ll += 1
                else:
                    qg = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, 2 * D)
                    q, gate = qg[..., :D], qg[..., D:]
                    k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
                    v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
                    q = _zc_norm(q, lp["q_norm"], eps)
                    k = _zc_norm(k, lp["k_norm"], eps)
                    q, k = apply_rope_partial(q, k, positions, inv_freq,
                                              rot_dim)
                    pages = write_kv_pages(pages, lf, k, v, meta.slot_ids)
                    attn_out = attn_fn(q, pages, lf, meta, sm_scale)
                    o = attn_out.reshape(b, t, Hq * D) * jax.nn.sigmoid(
                        gate.astype(jnp.float32)).reshape(
                            b, t, Hq * D).astype(attn_out.dtype)
                    o = jnp.dot(o.astype(hidden.dtype), lp["wo"])
                    lf += 1
                hidden = hidden + o
                h2 = _zc_norm(hidden, lp["post_norm"], eps)
                if _is_moe(cfg, l):
                    mlp = _moe_mlp(h2.reshape(b * t, -1), lp, cfg).reshape(
                        b, t, -1)
                else:
                    mlp = _dense_mlp(h2, lp)
                hidden = hidden + mlp
            hidden = _zc_norm(hidden, params["final_norm"], eps)
            head = params.get("lm_head", params["embed"].T)
            new_kv = {"pages": pages, "conv": conv_pool, "recur": recur_pool}
            if logits_mode in ("all", "all_hidden"):
                logits = jnp.dot(hidden, head).astype(jnp.float32)
                return logits, new_kv
            h_out = hidden[jnp.arange(b), meta.logit_idx]
            logits = jnp.dot(h_out, head).astype(jnp.float32)
            return logits, new_kv

        return forward

    # ------------- full-sequence forward (prefill / parity) -------------
    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn=None, logits_mode: str = "last",
                     **_kw):
        if attn_fn is not None:
            # paged-runner path (the runner always passes an attention fn)
            return Qwen3NextFamily.make_paged_forward(
                cfg, attn_fn, logits_mode=logits_mode)
        d = _dims(cfg)
        eps = cfg.rms_norm_eps
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        rot_dim = int(D * cfg.partial_rotary_factor)
        inv_freq = jnp.asarray(
            compute_inv_freq(rot_dim, cfg.rope_theta, None)
        )
        types = _layer_types(cfg)

        def forward(params, input_ids, states=None):
            """states: optional dict with per-layer carries; returns
            (logits, new_states). new_states carry conv [B,K-1,C],
            recurrent [B,Hv,Dk,Dv] per linear layer and k/v [B,T,...] per
            full layer (the generator appends to these at decode)."""
            b, t = input_ids.shape
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            positions = jnp.arange(t, dtype=jnp.int32)[None].repeat(b, 0)
            causal = jnp.tril(jnp.ones((t, t), bool))
            new_states: Dict[int, Any] = {}
            for l, lp in enumerate(params["layers"]):
                h = _zc_norm(hidden, lp["input_norm"], eps)
                if types[l] == "linear_attention":
                    q, k, v, z, beta, g = Qwen3NextFamily._linear_attn_proj(
                        h, lp, d
                    )
                    mixed = jnp.concatenate([
                        q.reshape(b, t, -1), k.reshape(b, t, -1),
                        v.reshape(b, t, -1),
                    ], axis=-1)
                    conv0 = jnp.zeros((b, d.kconv - 1, d.conv_dim),
                                      mixed.dtype)
                    mixed, conv_state = causal_conv1d(
                        mixed, lp["conv_w"], None, conv0
                    )
                    q = mixed[..., : d.key_dim].reshape(b, t, d.hk, d.dk)
                    k = mixed[..., d.key_dim : 2 * d.key_dim].reshape(
                        b, t, d.hk, d.dk)
                    v = mixed[..., 2 * d.key_dim :].reshape(b, t, d.hv, d.dv)
                    q = jnp.repeat(q, d.rep, axis=2)
                    k = jnp.repeat(k, d.rep, axis=2)
                    out, rec = gated_delta_rule_chunked(
                        q, k, v, g, beta, chunk_size=64
                    )
                    out = _gated_norm(out, lp["norm_w"], z, eps)
                    o = jnp.dot(out.reshape(b, t, -1), lp["out_proj"])
                    new_states[l] = {"conv": conv_state, "recur": rec}
                else:
                    qg = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, 2 * D)
                    q, gate = qg[..., :D], qg[..., D:]
                    k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
                    v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
                    q = _zc_norm(q, lp["q_norm"], eps)
                    k = _zc_norm(k, lp["k_norm"], eps)
                    q, k = apply_rope_partial(q, k, positions, inv_freq,
                                              rot_dim)
                    rep = Hq // Hkv
                    kf = jnp.repeat(k, rep, axis=2)
                    vf = jnp.repeat(v, rep, axis=2)
                    s = jnp.einsum(
                        "bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        kf.astype(jnp.float32),
                    ) / np.sqrt(D)
                    s = jnp.where(causal[None, None], s, -1e30)
                    p = jax.nn.softmax(s, axis=-1)
                    o = jnp.einsum("bhqk,bkhd->bqhd", p,
                                   vf.astype(jnp.float32))
                    o = o.reshape(b, t, Hq * D) * jax.nn.sigmoid(
                        gate.astype(jnp.float32)
                    ).reshape(b, t, Hq * D)
                    o = jnp.dot(o.astype(hidden.dtype), lp["wo"])
                    new_states[l] = {"k": k, "v": v}
                hidden = hidden + o
                h2 = _zc_norm(hidden, lp["post_norm"], eps)
                if _is_moe(cfg, l):
                    mlp = _moe_mlp(h2.reshape(b * t, -1), lp, cfg).reshape(
                        b, t, -1)
                else:
                    mlp = _dense_mlp(h2, lp)
                hidden = hidden + mlp
            hidden = _zc_norm(hidden, params["final_norm"], eps)
            head = params.get("lm_head", params["embed"].T)
            if logits_mode == "all":
                logits = jnp.dot(hidden, head)
            else:
                logits = jnp.dot(hidden[:, -1], head)
            return logits, new_states

        return forward

    # ------------- single-token decode -------------
    @staticmethod
    def make_decode_step(cfg: ModelConfig):
        d = _dims(cfg)
        eps = cfg.rms_norm_eps
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        rot_dim = int(D * cfg.partial_rotary_factor)
        inv_freq = jnp.asarray(
            compute_inv_freq(rot_dim, cfg.rope_theta, None)
        )
        types = _layer_types(cfg)

        def step(params, token, pos, states, kv_len):
            """token [B], pos [B] int32, states per layer, kv_len scalar:
            number of valid cached positions in the full-attn k/v buffers
            (preallocated [B, MAX, H, D], written at kv_len)."""
            b = token.shape[0]
            hidden = jnp.take(params["embed"], token, axis=0)[:, None]
            new_states = {}
            for l, lp in enumerate(params["layers"]):
                h = _zc_norm(hidden, lp["input_norm"], eps)
                st = states[l]
                if types[l] == "linear_attention":
                    q, k, v, z, beta, g = Qwen3NextFamily._linear_attn_proj(
                        h, lp, d
                    )
                    mixed = jnp.concatenate([
                        q.reshape(b, 1, -1), k.reshape(b, 1, -1),
                        v.reshape(b, 1, -1),
                    ], axis=-1)
                    mixed, conv_state = causal_conv1d(
                        mixed, lp["conv_w"], None, st["conv"]
                    )
                    q = mixed[..., : d.key_dim].reshape(b, d.hk, d.dk)
                    k = mixed[..., d.key_dim : 2 * d.key_dim].reshape(
                        b, d.hk, d.dk)
                    v = mixed[..., 2 * d.key_dim :].reshape(b, d.hv, d.dv)
                    q = jnp.repeat(q, d.rep, axis=1)
                    k = jnp.repeat(k, d.rep, axis=1)
                    out, rec = gated_delta_rule_step(
                        q, k, v, g[:, 0], beta[:, 0], st["recur"]
                    )
                    out = _gated_norm(out, lp["norm_w"], z[:, 0], eps)
                    o = jnp.dot(out.reshape(b, 1, -1), lp["out_proj"])
                    new_states[l] = {"conv": conv_state, "recur": rec}
                else:
                    qg = jnp.dot(h, lp["wq"]).reshape(b, 1, Hq, 2 * D)
                    q, gate = qg[..., :D], qg[..., D:]
                    k = jnp.dot(h, lp["wk"]).reshape(b, 1, Hkv, D)
                    v = jnp.dot(h, lp["wv"]).reshape(b, 1, Hkv, D)
                    q = _zc_norm(q, lp["q_norm"], eps)
                    k = _zc_norm(k, lp["k_norm"], eps)
                    q, k = apply_rope_partial(q, k, pos[:, None], inv_freq,
                                              rot_dim)
                    kbuf = jax.lax.dynamic_update_slice_in_dim(
                        st["k"], k, kv_len, axis=1)
                    vbuf = jax.lax.dynamic_update_slice_in_dim(
                        st["v"], v, kv_len, axis=1)
                    rep = Hq // Hkv
                    kf = jnp.repeat(kbuf, rep, axis=2)
                    vf = jnp.repeat(vbuf, rep, axis=2)
                    s = jnp.einsum(
                        "bqhd,bkhd->bhqk", q.astype(jnp.float32),
                        kf.astype(jnp.float32),
                    ) / np.sqrt(D)
                    valid = (
                        jnp.arange(kbuf.shape[1]) <= kv_len
                    )[None, None, None]
                    s = jnp.where(valid, s, -1e30)
                    p = jax.nn.softmax(s, axis=-1)
                    o = jnp.einsum("bhqk,bkhd->bqhd", p,
                                   vf.astype(jnp.float32))
                    o = o.reshape(b, 1, Hq * D) * jax.nn.sigmoid(
                        gate.astype(jnp.float32)
                    ).reshape(b, 1, Hq * D)
                    o = jnp.dot(o.astype(hidden.dtype), lp["wo"])
                    new_states[l] = {"k": kbuf, "v": vbuf}
                hidden = hidden + o
                h2 = _zc_norm(hidden, lp["post_norm"], eps)
                if _is_moe(cfg, l):
                    mlp = _moe_mlp(h2.reshape(b, -1), lp, cfg).reshape(
                        b, 1, -1)
                else:
                    mlp = _dense_mlp(h2, lp)
                hidden = hidden + mlp
            hidden = _zc_norm(hidden, params["final_norm"], eps)
            head = params.get("lm_head", params["embed"].T)
            logits = jnp.dot(hidden[:, 0], head)
            return logits, new_states

        return step


class Qwen3NextGenerator:
    """Serving wrapper: full-sequence prefill + jitted per-token decode
    with hybrid per-layer states (conv + recurrent + preallocated KV)."""

    def __init__(self, cfg: ModelConfig, params, max_len: int = 512):
        self.cfg = cfg
        self.params = params
        self.max_len = max_len
        self._fwd = jax.jit(
            Qwen3NextFamily.make_forward(cfg, logits_mode="last")
        )
        self._step = jax.jit(Qwen3NextFamily.make_decode_step(cfg))
        self.types = _layer_types(cfg)

    def generate(self, input_ids: List[int], max_new_tokens: int):
        cfg = self.cfg
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        ids = jnp.asarray([input_ids], jnp.int32)
        logits, states = self._fwd(self.params, ids)
        # move prefill KV into fixed-size decode buffers
        for l, lt in enumerate(self.types):
            if lt != "linear_attention":
                k = states[l]["k"]
                v = states[l]["v"]
                pad = self.max_len - k.shape[1]
                states[l] = {
                    "k": jnp.pad(k, ((0, 0), (0, pad), (0, 0), (0, 0))),
                    "v": jnp.pad(v, ((0, 0), (0, pad), (0, 0), (0, 0))),
                }
        out = []
        tok = jnp.argmax(logits, -1).astype(jnp.int32)
        pos = len(input_ids)
        for _ in range(max_new_tokens):
            out.append(int(tok[0]))
            logits, states = self._step(
                self.params, tok, jnp.asarray([pos], jnp.int32), states,
                pos,
            )
            tok = jnp.argmax(logits, -1).astype(jnp.int32)
            pos += 1
        return out
