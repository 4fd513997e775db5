"""Gated DeltaNet linear attention (Qwen3-Next).

TPU-native analog of the reference's flash-linear-attention kernels
(srt/models/qwen3_next.py + fla chunk_gated_delta_rule /
fused_recurrent_gated_delta_rule; numerics match HF transformers'
torch_chunk_gated_delta_rule exactly). The recurrence per head:

    S_t = S_{t-1} * exp(g_t) + k_t^T (beta_t * (v_t - S_{t-1}^T k_t))
    o_t = S_t^T q_t

Chunked form: HF builds the intra-chunk mixing matrix with a sequential
O(chunk) python loop (forward substitution of (I - T)); here that loop is
a single unit-lower-triangular SOLVE — the identity is
M = (I - T)^{-1} T, attn = M + I = (I - T)^{-1} — which XLA lowers to a
batched triangular solve on the MXU. Chunks advance via lax.scan.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def l2norm(x: jax.Array, eps: float = 1e-6) -> jax.Array:
    """HF l2norm: x * rsqrt(sum(x^2) + eps) over the last dim."""
    xf = x.astype(jnp.float32)
    return xf * jax.lax.rsqrt((xf * xf).sum(-1, keepdims=True) + eps)


def gated_delta_rule_chunked(
    query: jax.Array,  # [B, T, H, Dk]
    key: jax.Array,  # [B, T, H, Dk]
    value: jax.Array,  # [B, T, H, Dv]
    g: jax.Array,  # [B, T, H] log-decay (<= 0)
    beta: jax.Array,  # [B, T, H] write strength in (0, 1)
    chunk_size: int = 64,
    initial_state: Optional[jax.Array] = None,  # [B, H, Dk, Dv]
    use_qk_l2norm: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Prefill path. Returns (out [B, T, H, Dv], state [B, H, Dk, Dv])."""
    b, t, h, dk = key.shape
    dv = value.shape[-1]
    if use_qk_l2norm:
        query = l2norm(query)
        key = l2norm(key)
    q = query.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, H, T, Dk]
    k = key.astype(jnp.float32).transpose(0, 2, 1, 3)
    v = value.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, H, T, Dv]
    gt = g.astype(jnp.float32).transpose(0, 2, 1)  # [B, H, T]
    bt = beta.astype(jnp.float32).transpose(0, 2, 1)

    c = chunk_size
    pad = (-t) % c
    if pad:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad), (0, 0)))
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad), (0, 0)))
        gt = jnp.pad(gt, ((0, 0), (0, 0), (0, pad)))
        bt = jnp.pad(bt, ((0, 0), (0, 0), (0, pad)))
    tt = t + pad
    nc = tt // c
    scale = 1.0 / np.sqrt(dk)
    q = q * scale

    v_beta = v * bt[..., None]
    k_beta = k * bt[..., None]
    # [B, H, NC, c, D]
    qc = q.reshape(b, h, nc, c, dk)
    kc = k.reshape(b, h, nc, c, dk)
    vc = v.reshape(b, h, nc, c, dv)
    kbc = k_beta.reshape(b, h, nc, c, dk)
    vbc = v_beta.reshape(b, h, nc, c, dv)
    gc = jnp.cumsum(gt.reshape(b, h, nc, c), axis=-1)  # in-chunk cumdecay

    tril_s = jnp.tril(jnp.ones((c, c), bool), -1)  # strictly lower
    # decay between positions i >= j within a chunk
    decay = jnp.exp(
        jnp.where(tril_s, gc[..., :, None] - gc[..., None, :], 0.0)
    ) * tril_s
    # T = -(k_beta k^T) * decay, strictly lower; attn = (I - T)^{-1}
    T = -jnp.einsum("bhnid,bhnjd->bhnij", kbc, kc) * decay
    eye = jnp.eye(c, dtype=jnp.float32)
    lhs = eye - T  # unit lower triangular
    # one triangular solve replaces HF's sequential forward substitution
    value_m = jax.scipy.linalg.solve_triangular(
        lhs, vbc, lower=True, unit_diagonal=True
    )  # attn @ v_beta
    k_cumdecay = jax.scipy.linalg.solve_triangular(
        lhs, kbc * jnp.exp(gc)[..., None], lower=True, unit_diagonal=True
    )

    mask_incl = jnp.tril(jnp.ones((c, c), bool))  # include diagonal

    def chunk_step(state, xs):
        q_i, k_i, v_i, kcd_i, g_i, dec_i = xs
        # intra-chunk attention (decayed, causal incl diagonal)
        attn = jnp.einsum("bhid,bhjd->bhij", q_i, k_i) * dec_i
        v_prime = jnp.einsum("bhcd,bhdv->bhcv", kcd_i, state)
        v_new = v_i - v_prime
        attn_inter = jnp.einsum(
            "bhcd,bhdv->bhcv", q_i * jnp.exp(g_i)[..., None], state
        )
        out_i = attn_inter + jnp.einsum("bhij,bhjv->bhiv", attn, v_new)
        g_last = g_i[..., -1]
        state = state * jnp.exp(g_last)[..., None, None] + jnp.einsum(
            "bhcd,bhcv->bhdv",
            k_i * jnp.exp(g_last[..., None] - g_i)[..., None],
            v_new,
        )
        return state, out_i

    # decay matrix used in-loop includes the diagonal (exp(0)=1 there)
    dec_full = jnp.exp(
        jnp.where(mask_incl, gc[..., :, None] - gc[..., None, :], 0.0)
    ) * mask_incl

    state0 = (
        jnp.zeros((b, h, dk, dv), jnp.float32)
        if initial_state is None
        else initial_state.astype(jnp.float32)
    )
    xs = (
        qc.transpose(2, 0, 1, 3, 4),
        kc.transpose(2, 0, 1, 3, 4),
        value_m.transpose(2, 0, 1, 3, 4),
        k_cumdecay.transpose(2, 0, 1, 3, 4),
        gc.transpose(2, 0, 1, 3),
        dec_full.transpose(2, 0, 1, 3, 4),
    )
    state, outs = jax.lax.scan(chunk_step, state0, xs)
    out = outs.transpose(1, 2, 0, 3, 4).reshape(b, h, tt, dv)
    out = out[:, :, :t].transpose(0, 2, 1, 3)  # [B, T, H, Dv]
    return out.astype(value.dtype), state


def gated_delta_rule_step(
    query: jax.Array,  # [B, H, Dk] single token
    key: jax.Array,
    value: jax.Array,  # [B, H, Dv]
    g: jax.Array,  # [B, H]
    beta: jax.Array,  # [B, H]
    state: jax.Array,  # [B, H, Dk, Dv]
    use_qk_l2norm: bool = True,
) -> Tuple[jax.Array, jax.Array]:
    """Decode recurrence (reference torch_recurrent_gated_delta_rule)."""
    dk = key.shape[-1]
    if use_qk_l2norm:
        query = l2norm(query)
        key = l2norm(key)
    q = query.astype(jnp.float32) * (1.0 / np.sqrt(dk))
    k = key.astype(jnp.float32)
    v = value.astype(jnp.float32)
    state = state.astype(jnp.float32) * jnp.exp(
        g.astype(jnp.float32)
    )[..., None, None]
    kv_mem = jnp.einsum("bhdv,bhd->bhv", state, k)
    delta = (v - kv_mem) * beta.astype(jnp.float32)[..., None]
    state = state + jnp.einsum("bhd,bhv->bhdv", k, delta)
    out = jnp.einsum("bhdv,bhd->bhv", state, q)
    return out.astype(value.dtype), state
