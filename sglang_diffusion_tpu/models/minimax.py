"""MiniMax-Text / MiniMax-M1 hybrid family (MiniMaxForCausalLM).

Alternating lightning (linear) attention and softmax GQA layers with a
Mixtral-style MoE FFN and learned alpha/beta residual scaling.

Reference analog: srt/models/minimax_m2.py (and minimax_text_01 in HF).
Numerics defined against HF transformers' MiniMax implementation:

- decoder layer: ``h = norm(h); res = h; h = res*alpha_attn +
  attn(h)*beta_attn; h = post_norm(h); res = h; h = res*alpha_mlp +
  moe(h)*beta_mlp`` (NOTE: residual is the *normalized* hidden).
- lightning attention: ``qkv = silu(qkv_proj(h))`` split into per-head
  q/k/v (no rope); per-head decay ``slope = (1/2^(8/H))^(h+1) * (1 -
  l/(L-1+eps) + eps)``; blockwise-exact linear attention with running
  (D_k x D_v) state; output -> RMSNorm over H*D -> sigmoid(output_gate)
  gate -> out_proj.
- full attention: llama/mixtral GQA + full-dim rotate-half rope, paged KV.
- MoE: softmax-all -> topk -> renorm (== topk -> softmax) over w1/w3/w2
  experts; reuses the grouped-GEMM dispatcher.

Paged-engine integration follows models/bamba.py: full-attention layers
use the paged cache with their own ordinals; lightning layers carry a
per-request (H, D, D) f32 recurrent state pool slot-indexed by the
request's first page id.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.moe import moe_mlp_grouped
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq

_BLOCK = 64  # lightning-attention chunk (exact for any value)


def _layer_types(cfg: ModelConfig) -> List[str]:
    lt = cfg.raw.get("layer_types")
    if lt:
        return list(lt[: cfg.num_hidden_layers])
    return ["full_attention" if (l + 1) % 2 else "linear_attention"
            for l in range(cfg.num_hidden_layers)]


def _slopes(cfg: ModelConfig, layer_idx: int) -> np.ndarray:
    """Per-head decay rates (HF MiniMaxLightningAttention.get_slope_rate)."""
    H = cfg.num_attention_heads
    L = cfg.num_hidden_layers
    base = 1.0 / (2.0 ** (8.0 / H))
    rate = base ** (np.arange(H, dtype=np.float64) + 1)
    factor = 1.0 - layer_idx / (L - 1 + 1e-5) + 1e-5
    return (rate * factor).astype(np.float32)


def lightning_attention_chunked(q, k, v, state, slope, valid):
    """Blockwise-exact linear attention with per-head exponential decay.

    q/k/v: [b, t, H, D] (post-silu); state: [b, H, D, D] f32 running
    sum of decayed k^T v (most-recent token at weight 1); slope: [H];
    valid: [b, t] bool (right-padding only). Returns ([b, t, H, D] f32
    outputs, updated state). Mathematically identical to a per-token
    recurrence ``S <- exp(-slope)*S + k^T v; o = q @ S``.
    """
    b, t, H, D = q.shape
    f32 = jnp.float32
    q = q.astype(f32)
    km = jnp.where(valid[..., None, None], k.astype(f32), 0.0)
    vm = jnp.where(valid[..., None, None], v.astype(f32), 0.0)

    B = min(_BLOCK, max(t, 1))
    pad = (-t) % B
    if pad:
        zz = ((0, 0), (0, pad), (0, 0), (0, 0))
        q = jnp.pad(q, zz)
        km = jnp.pad(km, zz)
        vm = jnp.pad(vm, zz)
    nb = (t + pad) // B

    r = jnp.arange(1, B + 1, dtype=f32)
    qdecay = jnp.exp(-slope[None, :] * r[:, None])          # [B, H]
    kdecay = jnp.exp(-slope[None, :] * (B - r)[:, None])    # [B, H]
    diag = r[:, None] - r[None, :]                          # i - j
    ddecay = jnp.where(diag[None] >= 0,
                       jnp.exp(-slope[:, None, None] * diag[None]), 0.0)
    block_decay = jnp.exp(-slope * B)                       # [H]

    def body(st, inp):
        qi, ki, vi = inp  # [b, B, H, D]
        qw = jnp.einsum("bihd,bjhd->bhij", qi, ki)
        intra = jnp.einsum("bhij,bjhd->bihd", qw * ddecay[None], vi)
        inter = jnp.einsum("bihd,bhde->bihe",
                           qi * qdecay[None, :, :, None], st)
        contrib = jnp.einsum("bihd,bihe->bhde",
                             ki * kdecay[None, :, :, None], vi)
        st = st * block_decay[None, :, None, None] + contrib
        return st, intra + inter

    blocks = tuple(x.reshape(b, nb, B, H, D).swapaxes(0, 1)
                   for x in (q, km, vm))
    state, out = jax.lax.scan(body, state.astype(f32), blocks)
    out = out.swapaxes(0, 1).reshape(b, nb * B, H, D)[:, :t]

    # right-padding correction: padded steps contributed zero k^T v but
    # still decayed the state; undo exactly exp(-slope * n_pad)
    n_pad = (t + pad) - jnp.sum(valid, axis=1).astype(f32)  # [b]
    state = state * jnp.exp(slope[None, :] * n_pad[:, None])[..., None, None]
    return out, state


def lightning_attention_step(q, k, v, state, slope):
    """Single-token decode: S <- exp(-slope)*S + k^T v; o = q @ S.

    q/k/v: [b, H, D]; state: [b, H, D, D] f32."""
    f32 = jnp.float32
    ratio = jnp.exp(-slope)[None, :, None, None]
    state = state * ratio + jnp.einsum(
        "bhd,bhe->bhde", k.astype(f32), v.astype(f32))
    out = jnp.einsum("bhd,bhde->bhe", q.astype(f32), state)
    return out, state


@register_model("MiniMaxForCausalLM", "MiniMaxText01ForCausalLM",
                "MiniMaxM1ForCausalLM")
class MiniMaxFamily:
    has_linear_state = True
    supports_eagle = False

    @staticmethod
    def kv_layers(cfg: ModelConfig) -> int:
        return max(1, sum(1 for t in _layer_types(cfg)
                          if t == "full_attention"))

    @staticmethod
    def init_linear_state(cfg: ModelConfig, n_slots: int,
                          dtype=jnp.bfloat16):
        H, D = cfg.num_attention_heads, cfg.actual_head_dim
        n_lin = max(1, sum(1 for t in _layer_types(cfg)
                           if t == "linear_attention"))
        return {"recur": jnp.zeros((n_lin, n_slots, H, D, D), jnp.float32)}

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        E = cfg.hidden_size
        F = cfg.intermediate_size
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        X = cfg.raw.get("num_local_experts", 8)
        keys = iter(jax.random.split(rng, 8 + 8 * cfg.num_hidden_layers))

        def init(shape, scale_dim=None):
            sd = 1.0 / np.sqrt(scale_dim or shape[-2])
            return (jax.random.normal(next(keys), shape, jnp.float32)
                    * sd).astype(dtype)

        layers = []
        for lt in _layer_types(cfg):
            lp = {
                "input_norm": jnp.ones((E,), dtype),
                "post_norm": jnp.ones((E,), dtype),
                "w_router": init((E, X)),
                "w_gate": init((X, E, F), scale_dim=E),
                "w_up": init((X, E, F), scale_dim=E),
                "w_down": init((X, F, E), scale_dim=F),
            }
            if lt == "linear_attention":
                lp.update({
                    "qkv": init((E, 3 * Hq * D)),
                    "out_gate": init((E, Hq * D)),
                    "lin_norm": jnp.ones((Hq * D,), dtype),
                    "out_proj": init((Hq * D, E)),
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
        def spec(tree):
            if isinstance(tree, dict):
                out = {}
                for kk, vv in tree.items():
                    if kk in ("w_gate", "w_up"):
                        out[kk] = P(None, None, "tp")
                    elif kk == "w_down":
                        out[kk] = P(None, "tp", None)
                    elif kk in ("qkv", "wq", "wk", "wv", "out_gate"):
                        out[kk] = P(None, "tp")
                    elif kk in ("wo", "out_proj"):
                        out[kk] = P("tp", None)
                    else:
                        out[kk] = spec(vv)
                return out
            if isinstance(tree, list):
                return [spec(v) for v in tree]
            return P()

        skel = jax.eval_shape(
            lambda: MiniMaxFamily.init_params(jax.random.PRNGKey(0), cfg,
                                              jnp.float32))
        return spec(skel)

    @staticmethod
    def params_from_state_dict(cfg: ModelConfig, sd: Dict[str, Any]):
        X = cfg.raw.get("num_local_experts", 8)

        def t(n):
            return np.ascontiguousarray(np.asarray(sd[n]).T)

        def raw(n):
            return np.asarray(sd[n])

        layers = []
        for l, lt in enumerate(_layer_types(cfg)):
            pre = f"model.layers.{l}."
            moe = pre + "block_sparse_moe."
            lp = {
                "input_norm": raw(pre + "input_layernorm.weight"),
                "post_norm": raw(pre + "post_attention_layernorm.weight"),
                "w_router": t(moe + "gate.weight"),
                "w_gate": np.stack(
                    [t(moe + f"experts.{e}.w1.weight") for e in range(X)]),
                "w_up": np.stack(
                    [t(moe + f"experts.{e}.w3.weight") for e in range(X)]),
                "w_down": np.stack(
                    [t(moe + f"experts.{e}.w2.weight") for e in range(X)]),
            }
            at = pre + "self_attn."
            if lt == "linear_attention":
                lp.update({
                    "qkv": t(at + "qkv_proj.weight"),
                    "out_gate": t(at + "output_gate.weight"),
                    "lin_norm": raw(at + "norm.weight"),
                    "out_proj": t(at + "out_proj.weight"),
                })
            else:
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
            "final_norm": jnp.asarray(raw("model.norm.weight"), jnp.float32),
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
        r = cfg.raw
        Hq, Hkv, D = (cfg.num_attention_heads, cfg.num_key_value_heads,
                      cfg.actual_head_dim)
        eps = cfg.rms_norm_eps
        top_k = r.get("num_experts_per_tok", 2)
        a_full = float(r.get("full_attn_alpha_factor", 1.0))
        b_full = float(r.get("full_attn_beta_factor", 1.0))
        a_lin = float(r.get("linear_attn_alpha_factor", 1.0))
        b_lin = float(r.get("linear_attn_beta_factor", 1.0))
        a_mlp = float(r.get("mlp_alpha_factor", 1.0))
        b_mlp = float(r.get("mlp_beta_factor", 1.0))
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))
        sm_scale = 1.0 / float(np.sqrt(D))
        types = _layer_types(cfg)
        slopes = [jnp.asarray(_slopes(cfg, l))
                  for l in range(cfg.num_hidden_layers)]

        def forward(params, input_ids, positions, kv_cache, meta):
            pages = kv_cache["pages"]
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
                if types[l] == "linear_attention":
                    qkv = jax.nn.silu(jnp.dot(h, lp["qkv"]))
                    qkv = qkv.reshape(b, t, Hq, 3 * D)
                    q, k, v = jnp.split(qkv, 3, axis=-1)
                    st = jnp.take(recur_pool[ll], slot, axis=0)
                    st = jnp.where(fresh[:, None, None, None],
                                   jnp.zeros_like(st), st)
                    if t == 1:
                        o, st = lightning_attention_step(
                            q[:, 0], k[:, 0], v[:, 0], st, slopes[l])
                        o = o[:, None]
                    else:
                        o, st = lightning_attention_chunked(
                            q, k, v, st, slopes[l], valid)
                    recur_pool = recur_pool.at[ll, slot].set(st)
                    o = o.reshape(b, t, Hq * D)
                    # HF MiniMaxRMSNorm default eps (the lightning head
                    # norm is built WITHOUT config.rms_norm_eps)
                    of = o * jax.lax.rsqrt(
                        jnp.mean(jnp.square(o), axis=-1, keepdims=True)
                        + 1e-6)
                    o = (of * lp["lin_norm"].astype(jnp.float32)).astype(
                        h.dtype)
                    o = jax.nn.sigmoid(jnp.dot(h, lp["out_gate"])) * o
                    o = jnp.dot(o, lp["out_proj"])
                    hidden = h * a_lin + o * b_lin
                    ll += 1
                else:
                    q = jnp.dot(h, lp["wq"]).reshape(b, t, Hq, D)
                    k = jnp.dot(h, lp["wk"]).reshape(b, t, Hkv, D)
                    v = jnp.dot(h, lp["wv"]).reshape(b, t, Hkv, D)
                    q, k = apply_rope(q, k, positions, inv_freq)
                    pages = write_kv_pages(pages, lf, k, v, meta.slot_ids)
                    o = attn_fn(q, pages, lf, meta, sm_scale)
                    o = jnp.dot(o.reshape(b, t, Hq * D), lp["wo"])
                    hidden = h * a_full + o * b_full
                    lf += 1
                h2 = rms_norm(hidden, lp["post_norm"], eps)
                moe = moe_mlp_grouped(h2, lp["w_router"], lp["w_gate"],
                                      lp["w_up"], lp["w_down"], top_k)
                hidden = h2 * a_mlp + moe * b_mlp
            hidden = rms_norm(hidden, params["final_norm"], eps)
            new_kv = {"pages": pages, "recur": recur_pool}
            bq = hidden.shape[0]
            h_out = (hidden if logits_mode in ("all", "all_hidden")
                     else hidden[jnp.arange(bq), meta.logit_idx])
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits, new_kv

        return forward
