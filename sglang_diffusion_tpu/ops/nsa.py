"""NSA (native sparse attention) prefill: learned-indexer top-k selection.

Reference analog: srt/layers/attention/nsa_backend.py:85 +
nsa/nsa_indexer.py:144 (DeepSeek V3.2 indexer: per-token index keys
k_idx = norm(wk(x)) with rope, multi-head index queries wq_b(q) with
per-token head gates weights_proj(x), logits = sum_h gate_h *
relu(q_h . k) * scale, top-k token selection) and nsa/quant_k_cache.py
(FP8-quantized index-key cache).

TPU-native re-design (not a port):
- Selection is PAGE-granular, scored per (query-block, page): token-level
  top-k produces data-dependent gathers that defeat XLA tiling; pooling
  index scores over the KV page (the unit the paged cache already moves)
  keeps the MXU busy and reuses the engine's page tables. The reference's
  block_size=128 plays the same role on GPU.
- The index-key cache stores fp8_e4m3 values + one f32 scale per token
  (quant_k_cache analog); index scores are computed from the dequantized
  keys in bf16 on the MXU.
- The q-block's own pages and page 0 (attention sink) are always kept,
  and selection is causal (pages strictly ahead of a query block are
  never selected). When topk covers all pages the result is EXACTLY
  dense attention (tests/test_nsa.py parity).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


class NSAIndexerParams(NamedTuple):
    wq: jax.Array  # [E, Hi, Di] index-query projection (multi-head)
    wk: jax.Array  # [E, Di] index-key projection (single head)
    w_gate: jax.Array  # [E, Hi] per-token head gates
    k_norm_g: jax.Array  # [Di] layernorm gain for index keys


def init_indexer_params(key, hidden: int, n_heads: int = 8,
                        head_dim: int = 64, dtype=jnp.bfloat16
                        ) -> NSAIndexerParams:
    k1, k2, k3 = jax.random.split(key, 3)
    s = 1.0 / math.sqrt(hidden)
    return NSAIndexerParams(
        wq=(jax.random.normal(k1, (hidden, n_heads, head_dim)) * s
            ).astype(dtype),
        wk=(jax.random.normal(k2, (hidden, head_dim)) * s).astype(dtype),
        w_gate=(jax.random.normal(k3, (hidden, n_heads)) * s).astype(dtype),
        k_norm_g=jnp.ones((head_dim,), dtype),
    )


def _ln(x, g, eps=1e-6):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
            ).astype(x.dtype)


def index_keys(params: NSAIndexerParams, x: jax.Array) -> jax.Array:
    """x [.., T, E] -> normalized index keys [.., T, Di]."""
    return _ln(jnp.dot(x, params.wk), params.k_norm_g)


def quantize_index_keys(k_idx: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """FP8 index-key cache entries (quant_k_cache.py analog):
    per-token absmax scale, e4m3 payload."""
    amax = jnp.maximum(jnp.abs(k_idx.astype(jnp.float32)).max(-1,
                                                              keepdims=True),
                       1e-6)
    scale = amax / 448.0
    q = (k_idx.astype(jnp.float32) / scale).astype(jnp.float8_e4m3fn)
    return q, scale.astype(jnp.float32)


def dequantize_index_keys(q: jax.Array, scale: jax.Array) -> jax.Array:
    return (q.astype(jnp.float32) * scale).astype(jnp.bfloat16)


def index_scores(params: NSAIndexerParams, x_q: jax.Array,
                 k_idx: jax.Array) -> jax.Array:
    """Indexer logits (reference nsa_indexer._get_logits):
    x_q [B, Tq, E] query-side hidden states; k_idx [B, Tk, Di].
    Returns [B, Tq, Tk] f32: sum_h gate_h * relu(q_h . k) * Di^-0.5."""
    hi = params.wq.shape[1]
    di = params.wq.shape[2]
    q = jnp.einsum("bte,ehd->bthd", x_q, params.wq)  # [B,Tq,Hi,Di]
    gates = (jnp.dot(x_q, params.w_gate).astype(jnp.float32)
             * (hi ** -0.5))  # [B,Tq,Hi]
    s = jnp.einsum("bthd,bsd->bths", q.astype(jnp.bfloat16),
                   k_idx.astype(jnp.bfloat16)).astype(jnp.float32)
    s = jax.nn.relu(s) * (di ** -0.5)
    return jnp.einsum("bths,bth->bts", s, gates)


def pool_scores_to_pages(scores: jax.Array, page: int) -> jax.Array:
    """[B, Tq, Tk] token scores -> [B, Tq, P] per-page (mean pooled)."""
    b, tq, tk = scores.shape
    p = tk // page
    return scores[:, :, : p * page].reshape(b, tq, p, page).mean(-1)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "page", "topk", "q_block"),
)
def nsa_sparse_prefill(
    q: jax.Array,        # [B, Tq, Hq, D] query chunk
    k: jax.Array,        # [B, Tk, Hkv, D] full kv history (incl. chunk)
    v: jax.Array,        # [B, Tk, Hkv, D]
    page_scores: jax.Array,  # [B, Tq, P] indexer scores pooled per page
    sm_scale: float,
    *,
    page: int = 64,
    topk: int = 16,
    q_block: int = 128,
    q_start: Optional[jax.Array] = None,  # [B] abs pos of q row 0
    kv_len: Optional[jax.Array] = None,   # [B] valid kv rows
) -> jax.Array:
    """Top-k page-sparse causal prefill attention.

    Each q_block of queries attends the union of (a) its top-k scoring
    pages (block-pooled indexer scores), (b) its own page span (exact
    causal within), and (c) page 0. Exactly dense when topk >= P.
    Supports chunked continuation via q_start (kv history longer than the
    query chunk).
    """
    b, tq, hq, d = q.shape
    tk = k.shape[1]
    hkv = k.shape[2]
    group = hq // hkv
    nqb = -(-tq // q_block)
    p_total = -(-tk // page)
    kk = min(topk, p_total)
    if q_start is None:
        q_start = jnp.zeros((b,), jnp.int32)
    if kv_len is None:
        kv_len = jnp.full((b,), tk, jnp.int32)

    if nqb * q_block != tq:
        q = jnp.pad(q, ((0, 0), (0, nqb * q_block - tq), (0, 0), (0, 0)))
    if p_total * page != tk:
        padk = ((0, 0), (0, p_total * page - tk), (0, 0), (0, 0))
        k = jnp.pad(k, padk)
        v = jnp.pad(v, padk)

    # block-pool the per-query page scores over each q block (max)
    ps = jnp.pad(page_scores[:, :tq],
                 ((0, 0), (0, nqb * q_block - tq), (0, 0)),
                 constant_values=NEG_INF)
    blk_scores = ps.reshape(b, nqb, q_block, -1).max(axis=2)  # [B,nqb,P]
    # causal at page granularity: a block ending at absolute position
    # q_start + (i+1)*q_block - 1 may touch pages starting at or before it
    qb_end = q_start[:, None] + (jnp.arange(nqb) + 1) * q_block - 1  # [B,n]
    pg_start = jnp.arange(p_total) * page
    causal_pg = pg_start[None, None, :] <= qb_end[:, :, None]  # [B,nqb,P]
    blk_scores = jnp.where(causal_pg, blk_scores, NEG_INF)
    # always keep page 0 and the q block's own span pages
    own_lo = (q_start[:, None] + jnp.arange(nqb) * q_block) // page
    own_hi = qb_end // page
    pg = jnp.arange(p_total)
    own = ((pg[None, None, :] >= own_lo[:, :, None])
           & (pg[None, None, :] <= own_hi[:, :, None]))
    boost = own | (pg == 0)[None, None, :]
    blk_scores = jnp.where(boost, jnp.float32(1e30), blk_scores)

    sel = jax.lax.top_k(blk_scores, kk)[1]  # [B, nqb, kk] page ids
    sel = jnp.sort(sel, axis=-1)

    # gather selected pages: [B, nqb, kk*page, Hkv, D]
    kp = k.reshape(b, p_total, page, hkv, d)
    vp = v.reshape(b, p_total, page, hkv, d)
    ksel = jnp.take_along_axis(
        kp[:, None], sel[..., None, None, None], axis=2
    ).reshape(b, nqb, kk * page, hkv, d)
    vsel = jnp.take_along_axis(
        vp[:, None], sel[..., None, None, None], axis=2
    ).reshape(b, nqb, kk * page, hkv, d)
    # absolute positions of gathered tokens
    pos_sel = (sel[..., None] * page
               + jnp.arange(page)[None, None, None]).reshape(b, nqb,
                                                             kk * page)

    qb = q.reshape(b, nqb, q_block, hkv, group, d)
    s = jnp.einsum(
        "bnqhgd,bnshd->bnhgqs", qb.astype(jnp.bfloat16),
        ksel.astype(jnp.bfloat16)).astype(jnp.float32) * sm_scale
    qpos = (q_start[:, None, None]
            + jnp.arange(nqb)[None, :, None] * q_block
            + jnp.arange(q_block)[None, None, :])  # [B, nqb, q_block]
    causal = (pos_sel[:, :, None, :] <= qpos[:, :, :, None])
    causal &= (pos_sel[:, :, None, :] < kv_len[:, None, None, None])
    s = jnp.where(causal[:, :, None, None], s, NEG_INF)
    p_ = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum(
        "bnhgqs,bnshd->bnqhgd", p_.astype(jnp.bfloat16),
        vsel.astype(jnp.bfloat16))
    out = out.reshape(b, nqb * q_block, hq, d)[:, :tq]
    return out.astype(q.dtype)


def nsa_dense_reference(q, k, v, sm_scale):
    """Dense causal attention (parity target)."""
    b, t, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    qg = q.reshape(b, t, hkv, group, d)
    s = jnp.einsum("bqhgd,bshd->bhgqs", qg.astype(jnp.bfloat16),
                   k.astype(jnp.bfloat16)).astype(jnp.float32) * sm_scale
    causal = jnp.arange(t)[None, :] <= jnp.arange(t)[:, None]
    s = jnp.where(causal[None, None, None], s, NEG_INF)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhgqs,bshd->bqhgd", p.astype(jnp.bfloat16),
                     v.astype(jnp.bfloat16))
    return out.reshape(b, t, hq, d).astype(q.dtype)
