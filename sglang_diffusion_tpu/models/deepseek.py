"""DeepSeek-V2/V3 family: MLA (multi-head latent attention) + DeepSeek MoE.

TPU-native re-design of the reference's srt/models/deepseek_v2.py (MLA
attention with absorbed weights, srt/layers/attention MLA backends) and
srt/layers/moe (noaux_tc routing, shared experts). Key design choices:

- The KV cache stores ONE latent per token: concat(kv_a_norm(c_kv)[r_kv],
  rope(k_pe)[dr]) — a single shared plane (cfg.kv_cache_heads == 1), so
  cache traffic is r_kv + dr bytes/token instead of 2*H*D (the reason MLA
  exists). Attention runs in the ABSORBED form: q_nope is folded through
  W_UK so scores are dots against the cached latent directly, and the
  context is expanded through W_UV after the softmax — exactly equivalent
  to materializing per-head K/V (linear maps commute with attention sums).
- Layers split into two homogeneous stacked groups — the first
  `first_k_dense_replace` dense-MLP layers and the remaining MoE layers —
  each iterated with its own fori_loop (stacking heterogeneous layers
  would waste HBM on unused expert/dense weights).
- Routing: sigmoid/softmax scoring + e_score_correction_bias for choice +
  group-limited top-k (layers/moe.py deepseek_route); routed experts run
  through the grouped-GEMM path; shared experts are a plain MLP.

Numerics match HF DeepseekV3ForCausalLM (tests/test_deepseek.py), incl.
the interleaved rope (rope_interleave) and the q/kv low-rank layernorms'
fixed 1e-6 eps.
"""

from __future__ import annotations

from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.layers.moe import (
    apply_experts_grouped,
    deepseek_route,
)
from sglang_diffusion_tpu.models.registry import register_model
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import compute_inv_freq

NEG_INF = -1e30
_LORA_NORM_EPS = 1e-6  # HF DeepseekV3RMSNorm default for q_a/kv_a norms


def write_latent_pages(kv_cache, layer_idx, latent, slot_ids):
    """Scatter per-token latents [B,T,R] into cache [L,P,S,1,R_pad] (MLA
    analog of ops/attention_xla.write_kv_pages; -1 slots dropped). The cache
    width may be 128-padded (config.kv_cache_head_dim) — pad lanes are kept
    zero so the mla_pallas kernel's full-width dot is unaffected."""
    nl, num_pages, page_size, one, r = kv_cache.shape
    if latent.shape[-1] < r:
        latent = jnp.pad(
            latent, [(0, 0)] * (latent.ndim - 1) + [(0, r - latent.shape[-1])]
        )
    flat = kv_cache.reshape(nl * num_pages * page_size, r)
    slots = slot_ids.reshape(-1)
    rows = (layer_idx * num_pages + slots // page_size) * page_size + (
        slots % page_size
    )
    rows = jnp.where(slots >= 0, rows, flat.shape[0])
    flat = flat.at[rows].set(
        latent.reshape(-1, r).astype(flat.dtype), mode="drop"
    )
    return flat.reshape(kv_cache.shape)


def gather_latents(kv_cache, layer_idx, page_table):
    """[L,P,S,1,R] + page table [B,PPS] -> latents [B, Lkv, R]."""
    nl, num_pages, page_size, one, r = kv_cache.shape
    flat_pages = kv_cache.reshape(nl * num_pages, page_size, r)
    idx = layer_idx * num_pages + jnp.maximum(page_table, 0)
    pages = jnp.take(flat_pages, idx, axis=0)  # [B, PPS, S, R]
    b, pps = page_table.shape
    return pages.reshape(b, pps * page_size, r)


def mla_attention(q_abs, latents, meta: AttentionMetadata, sm_scale, r_kv):
    """Absorbed MLA attention over cached latents.

    q_abs [B,T,H,R] (R = r_kv + dr: absorbed-nope ++ roped q_pe),
    latents [B,Lkv,R]. Returns context in LATENT space [B,T,H,r_kv]
    (caller expands through W_UV)."""
    b, t, h, _ = q_abs.shape
    lkv = latents.shape[1]
    scores = jnp.einsum(
        "bthr,bsr->bhts", q_abs.astype(jnp.float32),
        latents.astype(jnp.float32),
    ) * sm_scale
    kv_pos = jnp.arange(lkv)[None, None, :]
    q_pos = meta.q_start_pos[:, None] + jnp.arange(t)[None, :]
    mask = (kv_pos <= q_pos[:, :, None]) & (kv_pos < meta.kv_lens[:, None, None])
    mask = mask & (q_pos[:, :, None] < meta.kv_lens[:, None, None])
    scores = jnp.where(mask[:, None], scores, NEG_INF)
    probs = jax.nn.softmax(scores, axis=-1)
    any_valid = jnp.any(mask, axis=-1)[:, None, :, None]
    probs = jnp.where(any_valid, probs, 0.0)
    ctx = jnp.einsum("bhts,bsr->bthr", probs, latents[:, :, :r_kv].astype(jnp.float32))
    return ctx


def _interleave_rope(x, positions, inv_freq):
    """DeepSeek interleaved rope: reorder [x0,x1,x2,...] -> even||odd, then
    neox-style rotate_half (HF apply_rotary_pos_emb_interleave)."""
    *lead, d = x.shape
    xr = x.reshape(*lead, d // 2, 2)
    x_perm = jnp.concatenate([xr[..., 0], xr[..., 1]], axis=-1)  # even || odd
    # positions [...B,T]; broadcast angle over head dims
    angles = positions[..., None].astype(jnp.float32) * inv_freq  # [B,T,d/2]
    cos = jnp.cos(angles)
    sin = jnp.sin(angles)
    cos = jnp.concatenate([cos, cos], axis=-1)
    sin = jnp.concatenate([sin, sin], axis=-1)
    while cos.ndim < x_perm.ndim:
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    x1, x2 = jnp.split(x_perm, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x_perm.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)


@register_model("DeepseekV3ForCausalLM", "DeepseekV2ForCausalLM")
class DeepseekFamily:
    """MLA + MoE decoder. Functional API matching models/registry.py."""

    @staticmethod
    def _dims(cfg: ModelConfig):
        return (
            cfg.num_attention_heads,
            cfg.qk_nope_head_dim,
            cfg.qk_rope_head_dim,
            cfg.v_head_dim,
            cfg.kv_lora_rank,
        )

    @staticmethod
    def init_params(rng: jax.Array, cfg: ModelConfig, dtype=jnp.bfloat16):
        H, dn, dr, dv, rkv = DeepseekFamily._dims(cfg)
        E = cfg.hidden_size
        V = cfg.vocab_size
        Ld = cfg.first_k_dense_replace
        Lm = cfg.num_hidden_layers - Ld
        X = cfg.num_experts
        Fm = cfg.moe_intermediate_size or cfg.intermediate_size
        Fs = Fm * max(cfg.n_shared_experts, 1)
        rq = cfg.q_lora_rank
        keys = iter(jax.random.split(rng, 40))

        def init(shape, scale=None):
            scale = scale if scale is not None else 1.0 / np.sqrt(
                shape[-2] if len(shape) > 1 else shape[-1]
            )
            return (
                jax.random.normal(next(keys), shape, jnp.float32) * scale
            ).astype(dtype)

        def attn_block(L):
            blk = {
                "input_norm": jnp.ones((L, E), dtype),
                "post_norm": jnp.ones((L, E), dtype),
                "wkv_a": init((L, E, rkv + dr)),
                "kv_a_norm": jnp.ones((L, rkv), dtype),
                "wkv_b": init((L, rkv, H * (dn + dv))),
                "wo": init((L, H * dv, E)),
            }
            if rq:
                blk["wq_a"] = init((L, E, rq))
                blk["q_a_norm"] = jnp.ones((L, rq), dtype)
                blk["wq_b"] = init((L, rq, H * (dn + dr)))
            else:
                blk["wq"] = init((L, E, H * (dn + dr)))
            return blk

        dense_layers = attn_block(Ld) if Ld else None
        if dense_layers is not None:
            F = cfg.intermediate_size
            dense_layers.update({
                "w_gate": init((Ld, E, F)),
                "w_up": init((Ld, E, F)),
                "w_down": init((Ld, F, E)),
            })
        moe_layers = attn_block(Lm)
        moe_layers.update({
            "w_router": init((Lm, E, X)),
            "e_bias": jnp.zeros((Lm, X), jnp.float32),
            "xw_gate": init((Lm, X, E, Fm)),
            "xw_up": init((Lm, X, E, Fm)),
            "xw_down": init((Lm, X, Fm, E)),
            "sh_gate": init((Lm, E, Fs)),
            "sh_up": init((Lm, E, Fs)),
            "sh_down": init((Lm, Fs, E)),
        })
        params = {
            "embed": init((V, E), scale=0.02),
            "moe_layers": moe_layers,
            "final_norm": jnp.ones((E,), dtype),
            "lm_head": init((E, V)),
        }
        if dense_layers is not None:
            params["dense_layers"] = dense_layers
        return params

    @staticmethod
    def partition_specs(cfg: ModelConfig) -> Dict[str, Any]:
        def attn_specs():
            s = {
                "input_norm": P(None, None),
                "post_norm": P(None, None),
                "wkv_a": P(None, None, None),
                "kv_a_norm": P(None, None),
                "wkv_b": P(None, None, "tp"),
                "wo": P(None, "tp", None),
            }
            if cfg.q_lora_rank:
                s["wq_a"] = P(None, None, None)
                s["q_a_norm"] = P(None, None)
                s["wq_b"] = P(None, None, "tp")
            else:
                s["wq"] = P(None, None, "tp")
            return s

        moe = attn_specs()
        moe.update({
            "w_router": P(None, None, None),
            "e_bias": P(None, None),
            "xw_gate": P(None, "tp", None, None),
            "xw_up": P(None, "tp", None, None),
            "xw_down": P(None, "tp", None, None),
            "sh_gate": P(None, None, "tp"),
            "sh_up": P(None, None, "tp"),
            "sh_down": P(None, "tp", None),
        })
        specs = {
            "embed": P("tp", None),
            "moe_layers": moe,
            "final_norm": P(None),
            "lm_head": P(None, "tp"),
        }
        if cfg.first_k_dense_replace:
            dense = attn_specs()
            dense.update({
                "w_gate": P(None, None, "tp"),
                "w_up": P(None, None, "tp"),
                "w_down": P(None, "tp", None),
            })
            specs["dense_layers"] = dense
        return specs

    @staticmethod
    def partition_specs_dp_attention(cfg: ModelConfig) -> Dict[str, Any]:
        """DP-attention layout (reference: enable_dp_attention +
        srt/layers/dp_attention.py): MLA attention weights REPLICATED (the
        batch is sharded over every device instead — each rank attends its
        own rows with full heads and a local KV slice), while the MoE
        expert stacks and shared experts stay sharded over tp. GSPMD
        inserts the row-gather before the expert GEMMs that the reference
        implements as explicit attn-DP gather/scatter."""
        specs = DeepseekFamily.partition_specs(cfg)

        def relax_attn(s):
            for k in ("wq", "wq_a", "wq_b", "wkv_a", "wkv_b", "wo"):
                if k in s:
                    nd = len(s[k])
                    s[k] = P(*([None] * nd))
            return s

        relax_attn(specs["moe_layers"])
        if "dense_layers" in specs:
            relax_attn(specs["dense_layers"])
        return specs

    @staticmethod
    def make_forward(cfg: ModelConfig, attn_fn: Callable,
                     logits_mode: str = "last", moe_impl: str = "grouped"):
        """attn_fn is unused: MLA runs its own latent attention (the paged
        backends assume per-head K/V planes)."""
        H, dn, dr, dv, rkv = DeepseekFamily._dims(cfg)
        eps = cfg.rms_norm_eps
        sm_scale = 1.0 / float(np.sqrt(dn + dr))
        inv_freq = jnp.asarray(compute_inv_freq(dr, cfg.rope_theta, None))
        rq = cfg.q_lora_rank
        Ld = cfg.first_k_dense_replace

        def attn(lp, hidden, kv_cache, abs_layer, positions, meta):
            b, t, e = hidden.shape
            h = rms_norm(hidden, lp["input_norm"], eps)
            if rq:
                qa = rms_norm(jnp.dot(h, lp["wq_a"]), lp["q_a_norm"],
                              _LORA_NORM_EPS)
                q = jnp.dot(qa, lp["wq_b"])
            else:
                q = jnp.dot(h, lp["wq"])
            q = q.reshape(b, t, H, dn + dr)
            q_nope, q_pe = q[..., :dn], q[..., dn:]
            q_pe = (
                _interleave_rope(q_pe, positions, inv_freq)
                if cfg.rope_interleave else
                _neox_rope(q_pe, positions, inv_freq)
            )

            ckv = jnp.dot(h, lp["wkv_a"])  # [B,T,rkv+dr]
            c, k_pe = ckv[..., :rkv], ckv[..., rkv:]
            c = rms_norm(c, lp["kv_a_norm"], _LORA_NORM_EPS)
            k_pe = (
                _interleave_rope(k_pe, positions, inv_freq)
                if cfg.rope_interleave else
                _neox_rope(k_pe, positions, inv_freq)
            )
            latent = jnp.concatenate([c, k_pe], axis=-1)  # [B,T,R]
            kv_cache = write_latent_pages(
                kv_cache, abs_layer, latent, meta.slot_ids
            )

            # absorbed q: fold W_UK into q_nope
            wkv_b = lp["wkv_b"].reshape(rkv, H, dn + dv)
            w_uk = wkv_b[..., :dn]  # [rkv, H, dn]
            w_uv = wkv_b[..., dn:]  # [rkv, H, dv]
            q_abs = jnp.einsum("bthd,rhd->bthr", q_nope, w_uk)
            q_cat = jnp.concatenate([q_abs, q_pe], axis=-1)  # [B,T,H,R]

            # Paged MLA Pallas kernel when shapes are Mosaic-legal (R and
            # r_kv 128-lane aligned, e.g. DeepSeek-V3 512+64); dense-einsum
            # fallback for tiny test dims and tree-mask verify. The kernel
            # streams each latent page from HBM once per q block — the dense
            # path materializes full [B,H,T,S] f32 scores and OOMs at 32k.
            use_kernel = rkv % 128 == 0 and meta.tree_mask is None
            r_pad = kv_cache.shape[-1]
            if use_kernel:
                from sglang_diffusion_tpu.ops.mla_pallas import (
                    mla_paged_attention,
                )
                if q_cat.shape[-1] < r_pad:  # zero pad lanes: no-op in dot
                    q_cat = jnp.pad(
                        q_cat, [(0, 0)] * 3 + [(0, r_pad - q_cat.shape[-1])]
                    )
                ctx = mla_paged_attention(
                    q_cat, kv_cache, abs_layer, meta.page_table,
                    meta.kv_lens, meta.q_start_pos, sm_scale, rkv,
                    interpret=jax.default_backend() != "tpu",
                ).astype(jnp.float32)
            else:
                latents = gather_latents(kv_cache, abs_layer, meta.page_table)
                ctx = mla_attention(
                    q_cat, latents[..., : rkv + dr], meta, sm_scale, rkv
                )
            out = jnp.einsum("bthr,rhd->bthd", ctx, w_uv.astype(jnp.float32))
            out = out.reshape(b, t, H * dv).astype(hidden.dtype)
            return hidden + jnp.dot(out, lp["wo"]), kv_cache

        def mlp(h, wg, wu, wd):
            return jnp.dot(jax.nn.silu(jnp.dot(h, wg)) * jnp.dot(h, wu), wd)

        def dense_body(l, hidden, kv_cache, layers_p, positions, meta):
            lp = jax.tree.map(lambda x: x[l], layers_p)
            hidden, kv_cache = attn(lp, hidden, kv_cache, l, positions, meta)
            h = rms_norm(hidden, lp["post_norm"], eps)
            hidden = hidden + mlp(h, lp["w_gate"], lp["w_up"], lp["w_down"])
            return hidden, kv_cache

        def moe_body(l, hidden, kv_cache, layers_p, positions, meta):
            lp = jax.tree.map(lambda x: x[l], layers_p)
            hidden, kv_cache = attn(lp, hidden, kv_cache, Ld + l, positions,
                                    meta)
            h = rms_norm(hidden, lp["post_norm"], eps)
            b, t, e = h.shape
            h2 = h.reshape(b * t, e)
            ids, weights = deepseek_route(h2, lp["w_router"], lp["e_bias"], cfg)
            routed = apply_experts_grouped(
                h2, ids, weights, lp["xw_gate"], lp["xw_up"], lp["xw_down"]
            ).reshape(b, t, e).astype(h.dtype)
            shared = mlp(h, lp["sh_gate"], lp["sh_up"], lp["sh_down"])
            return hidden + routed + shared, kv_cache

        def forward(params, input_ids, positions, kv_cache,
                    meta: AttentionMetadata):
            hidden = jnp.take(params["embed"], input_ids, axis=0)
            if Ld:
                def bodyd(l, carry):
                    h, kv = carry
                    return dense_body(l, h, kv, params["dense_layers"],
                                      positions, meta)

                hidden, kv_cache = jax.lax.fori_loop(
                    0, Ld, bodyd, (hidden, kv_cache)
                )

            def bodym(l, carry):
                h, kv = carry
                return moe_body(l, h, kv, params["moe_layers"], positions, meta)

            hidden, new_kv = jax.lax.fori_loop(
                0, cfg.num_hidden_layers - Ld, bodym, (hidden, kv_cache)
            )
            hidden = rms_norm(hidden, params["final_norm"], eps)
            b = hidden.shape[0]
            if logits_mode == "hidden":
                return hidden[jnp.arange(b), meta.logit_idx], new_kv
            h_out = (
                hidden if logits_mode == "all"
                else hidden[jnp.arange(b), meta.logit_idx]
            )
            logits = jnp.dot(h_out, params["lm_head"],
                             preferred_element_type=jnp.float32)
            return logits, new_kv

        return forward

    @staticmethod
    def hf_weight_map(cfg: ModelConfig):
        """Two layer groups: dense_layers use {i} = 0..first_k_dense-1,
        moe_layers use {i} offset by first_k_dense (the loader applies
        per-group offsets via the 'layer_offset' marker)."""
        pre = "model.layers.{i}."

        def attn_map(group):
            m = {
                (group, "input_norm"): (pre + "input_layernorm.weight", None),
                (group, "post_norm"): (
                    pre + "post_attention_layernorm.weight", None),
                (group, "wkv_a"): (
                    pre + "self_attn.kv_a_proj_with_mqa.weight", "t"),
                (group, "kv_a_norm"): (
                    pre + "self_attn.kv_a_layernorm.weight", None),
                (group, "wkv_b"): (pre + "self_attn.kv_b_proj.weight", "t"),
                (group, "wo"): (pre + "self_attn.o_proj.weight", "t"),
            }
            if cfg.q_lora_rank:
                m[(group, "wq_a")] = (pre + "self_attn.q_a_proj.weight", "t")
                m[(group, "q_a_norm")] = (
                    pre + "self_attn.q_a_layernorm.weight", None)
                m[(group, "wq_b")] = (pre + "self_attn.q_b_proj.weight", "t")
            else:
                m[(group, "wq")] = (pre + "self_attn.q_proj.weight", "t")
            return m

        m = {
            ("embed",): ("model.embed_tokens.weight", None),
            ("final_norm",): ("model.norm.weight", None),
            ("lm_head",): ("lm_head.weight", "t"),
        }
        if cfg.first_k_dense_replace:
            m.update(attn_map("dense_layers"))
            m[("dense_layers", "w_gate")] = (pre + "mlp.gate_proj.weight", "t")
            m[("dense_layers", "w_up")] = (pre + "mlp.up_proj.weight", "t")
            m[("dense_layers", "w_down")] = (pre + "mlp.down_proj.weight", "t")
        m.update(attn_map("moe_layers"))
        m[("moe_layers", "w_router")] = (pre + "mlp.gate.weight", "t")
        m[("moe_layers", "e_bias")] = (
            pre + "mlp.gate.e_score_correction_bias", None)
        m[("moe_layers", "xw_gate")] = (
            pre + "mlp.experts.{x}.gate_proj.weight", "t")
        m[("moe_layers", "xw_up")] = (
            pre + "mlp.experts.{x}.up_proj.weight", "t")
        m[("moe_layers", "xw_down")] = (
            pre + "mlp.experts.{x}.down_proj.weight", "t")
        m[("moe_layers", "sh_gate")] = (
            pre + "mlp.shared_experts.gate_proj.weight", "t")
        m[("moe_layers", "sh_up")] = (
            pre + "mlp.shared_experts.up_proj.weight", "t")
        m[("moe_layers", "sh_down")] = (
            pre + "mlp.shared_experts.down_proj.weight", "t")
        return m


def _neox_rope(x, positions, inv_freq):
    """Standard (non-interleaved) rotate-half rope for rope_interleave=False
    checkpoints."""
    *lead, d = x.shape
    angles = positions[..., None].astype(jnp.float32) * inv_freq
    cos = jnp.concatenate([jnp.cos(angles)] * 2, axis=-1)
    sin = jnp.concatenate([jnp.sin(angles)] * 2, axis=-1)
    while cos.ndim < x.ndim:
        cos = cos[..., None, :]
        sin = sin[..., None, :]
    x1, x2 = jnp.split(x, 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rot.astype(jnp.float32) * sin).astype(x.dtype)
