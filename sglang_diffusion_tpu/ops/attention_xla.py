"""Pure-XLA paged attention reference implementation.

This is the correctness baseline and the CPU/test backend (the analog of the
reference's `torch_native` attention backend, srt/layers/attention/
torch_native_backend.py). The Pallas TPU kernels in `attention_pallas.py`
must match these numerics.

All functions are shape-static and jit-friendly; padding is handled by masks.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def write_kv_pages(
    kv_cache: jax.Array,  # [L, num_pages, page_size, 2*Hkv, D]
    layer_idx,  # scalar int layer index
    k: jax.Array,  # [B, T, Hkv, D]
    v: jax.Array,  # [B, T, Hkv, D]
    slot_ids: jax.Array,  # [B, T] int32 flat slots (page*page_size+off); -1 = skip
) -> jax.Array:
    """Scatter new K/V tokens into one layer of the full paged cache.

    Cache layout (round 4): [L, P, S, 2Hkv, D] with K/V head-interleaved
    on the combined-head axis — the layout of the official TPU
    ragged-paged-attention kernel
    (jax.experimental.pallas.ops.tpu.ragged_paged_attention).

    Scatter rows stay ONE HEAD WIDE ([D]=128 lanes): a [2Hkv*D]-wide row
    scatter measured 475.6 ms per fused decode step at bs=256 vs 6.5 ms
    for 128-wide rows (round-4 probe) — XLA:TPU lowers wide scatter rows
    catastrophically.

    Operates on the WHOLE stacked cache (scatter rows carry the layer
    offset) so the enclosing layer loop can keep the cache as a loop carry
    that XLA updates in place — never copying a 100MB+ layer per step
    (which a scan-over-layers ys stack would do)."""
    nl, num_pages, page_size, two_hkv, d = kv_cache.shape
    if (
        k.shape[1] == 1
        and d % 128 == 0
        and jax.default_backend() == "tpu"
    ):
        # decode: direct DMA row writes (the XLA scatter costs ~0.4 ms
        # per layer at bs=256; issuing B row copies from one pallas call
        # is ~us-level — see ops/decode_pallas.py)
        from sglang_diffusion_tpu.ops.decode_pallas import write_kv_decode

        return write_kv_decode(kv_cache, layer_idx, k, v, slot_ids)
    flat = kv_cache.reshape(nl * num_pages * page_size * two_hkv, d)
    # [B, T, Hkv, 2, D] -> interleaved [k0, v0, k1, v1, ...] head rows
    kv = jnp.stack([k, v], axis=3).reshape(-1, two_hkv, d)
    kv = kv.astype(flat.dtype)
    slots = slot_ids.reshape(-1)  # [B*T], flat page*page_size+off
    pid = slots // page_size
    off = slots % page_size
    h = jnp.arange(two_hkv)[None, :]
    rows = ((layer_idx * num_pages + pid[:, None]) * page_size
            + off[:, None]) * two_hkv + h  # [BT, 2Hkv]
    # redirect padding slots (<0) out of range; mode="drop" discards them
    rows = jnp.where(slots[:, None] >= 0, rows, flat.shape[0])
    flat = flat.at[rows.reshape(-1)].set(kv.reshape(-1, d), mode="drop")
    return flat.reshape(nl, num_pages, page_size, two_hkv, d)


def copy_kv_slots(
    kv_cache: jax.Array,  # [L, num_pages, page_size, 2*Hkv, D]
    src_slots: jax.Array,  # [M] flat slots (page*page_size+off); -1 = skip
    dst_slots: jax.Array,  # [M]
) -> jax.Array:
    """Copy token KV across ALL layers from src slots to dst slots (used by
    speculative tree verify to move an accepted branch's KV into the
    sequential positions; reference analog: eagle_utils.cu tree reorder)."""
    nl, num_pages, page_size, two_hkv, d = kv_cache.shape
    flat = kv_cache.reshape(nl * num_pages * page_size * two_hkv, d)
    sp, so = src_slots // page_size, src_slots % page_size
    dp, do = dst_slots // page_size, dst_slots % page_size
    l = jnp.arange(nl)[:, None, None]  # [L, 1, 1]
    h = jnp.arange(two_hkv)[None, None, :]  # [1, 1, 2Hkv]

    def rows(pid, off):
        # [M] -> [L, M, 2Hkv] (128-wide rows; see write_kv_pages)
        return ((l * num_pages + pid[None, :, None]) * page_size
                + off[None, :, None]) * two_hkv + h

    src_rows = rows(sp, so).reshape(-1)
    dst_rows = rows(dp, do).reshape(-1)
    vals = jnp.take(flat, src_rows, axis=0, mode="clip")
    valid = jnp.broadcast_to(
        src_slots[None, :, None] >= 0,
        (nl, src_slots.shape[0], two_hkv),
    ).reshape(-1)
    dst_rows = jnp.where(valid, dst_rows, flat.shape[0])
    flat = flat.at[dst_rows].set(vals, mode="drop")
    return flat.reshape(nl, num_pages, page_size, two_hkv, d)


def gather_kv(
    kv_cache: jax.Array,  # [L, num_pages, page_size, 2*Hkv, D]
    layer_idx,  # scalar int
    page_table: jax.Array,  # [B, pages_per_seq]
) -> Tuple[jax.Array, jax.Array]:
    """Gather one layer's pages for each sequence -> K,V [B, Lkv, Hkv, D].
    One fused gather over the [(L*P), ...] view — no layer-slice copy."""
    nl, num_pages, page_size, two_hkv, d = kv_cache.shape
    flat_pages = kv_cache.reshape(nl * num_pages, page_size, two_hkv, d)
    idx = layer_idx * num_pages + jnp.maximum(page_table, 0)
    pages = jnp.take(flat_pages, idx, axis=0)
    b, pps = page_table.shape
    # [B, PPS, S, 2Hkv, D] -> [B, Lkv, 2Hkv, D] (slot axis already adjacent)
    kv = pages.reshape(b, pps * page_size, two_hkv, d)
    k = kv[:, :, 0::2, :]
    v = kv[:, :, 1::2, :]
    return k, v


def _attn_core(
    q: jax.Array,  # [B, Tq, Hq, D]
    k: jax.Array,  # [B, Lkv, Hkv, D]
    v: jax.Array,  # [B, Lkv, Hkv, D]
    mask: jax.Array,  # [B, Tq, Lkv] bool, True = attend
    sm_scale: float,
    softcap: float = None,
    sinks: jax.Array = None,  # [Hq] learned sink logit per query head
) -> jax.Array:
    b, tq, hq, d = q.shape
    hkv = k.shape[2]
    group = hq // hkv
    # Keep K/V in the QUERY's dtype (bf16 on the serving path) and let the
    # MXU accumulate in f32 (preferred_element_type) — materializing f32
    # copies of the K/V history was the round-3 decode bottleneck (~51 GB
    # of f32 traffic per step at bs=256; round-4 microbench: attention was
    # 83.7 of the 88.8 ms/token step).
    cdt = q.dtype
    qg = q.reshape(b, tq, hkv, group, d).astype(cdt)
    kf = k.astype(cdt)
    vf = v.astype(cdt)
    # Zero K/V in slots no query attends (stale/unwritten cache pages): the
    # score-side where() below sanitizes masked K, but 0-prob x NaN V still
    # NaNs the output einsum. Reused pages legitimately hold garbage beyond
    # kv_len — attention must be robust to non-finite values there.
    slot_live = jnp.any(mask, axis=1)[:, :, None, None]  # [B, Lkv, 1, 1]
    kf = jnp.where(slot_live, kf, jnp.zeros((), cdt))
    vf = jnp.where(slot_live, vf, jnp.zeros((), cdt))
    # scores: [B, Hkv, group, Tq, Lkv] (f32 accumulation on the MXU)
    scores = jnp.einsum(
        "bthgd,bshd->bhgts", qg, kf, preferred_element_type=jnp.float32
    ) * sm_scale
    if softcap is not None:
        # gemma2 attention logit softcapping
        scores = softcap * jnp.tanh(scores / softcap)
    scores = jnp.where(mask[:, None, None, :, :], scores, NEG_INF)
    if sinks is not None:
        # gpt-oss attention sinks (HF GptOss eager_attention_forward): a
        # learned per-head logit joins the softmax then its prob is dropped
        # — i.e. the denominator gains exp(sink - max)
        sk = sinks.astype(jnp.float32).reshape(1, hkv, group, 1)
        m = jnp.maximum(scores.max(axis=-1), sk)  # [B,Hkv,g,Tq]
        e = jnp.exp(scores - m[..., None])
        denom = e.sum(axis=-1) + jnp.exp(sk - m)
        probs = e / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    # guard fully-masked rows (padding queries): softmax of all -inf -> uniform;
    # zero them out instead.
    any_valid = jnp.any(mask, axis=-1)[:, None, None, :, None]
    probs = jnp.where(any_valid, probs, 0.0)
    out = jnp.einsum(
        "bhgts,bshd->bthgd", probs.astype(cdt), vf,
        preferred_element_type=jnp.float32,
    )
    return out.reshape(b, tq, hq, d).astype(q.dtype)


def _gather_pages(kv_cache, layer_idx, page_table):
    """Gather pages for each sequence WITHOUT flattening the page axis:
    K,V [B, PP, Hkv, S, D]. Keeping the page layout lets the attention
    einsums run directly over (page, slot) axes — the [B, Lkv, Hkv, D]
    transpose in gather_kv materializes an extra full copy of the batch's
    KV history per layer (~1 ms/layer at bs=256), which the decode hot
    path cannot afford."""
    nl, num_pages, page_size, two_hkv, d = kv_cache.shape
    flat_pages = kv_cache.reshape(nl * num_pages, page_size, two_hkv, d)
    idx = layer_idx * num_pages + jnp.maximum(page_table, 0)
    pages = jnp.take(flat_pages, idx, axis=0)  # [B, PP, S, 2Hkv, D]
    b, pps = page_table.shape
    kv = pages.reshape(b, pps, page_size, two_hkv // 2, 2, d)
    return kv[..., 0, :], kv[..., 1, :]  # [B, PP, S, Hkv, D]


def _attn_core_paged(
    q: jax.Array,  # [B, Tq, Hq, D]
    kp: jax.Array,  # [B, PP, S, Hkv, D]
    vp: jax.Array,  # [B, PP, S, Hkv, D]
    mask: jax.Array,  # [B, Tq, PP*S] bool, True = attend
    sm_scale: float,
    softcap: float = None,
    sinks: jax.Array = None,
) -> jax.Array:
    """Attention over page-layout K/V: bf16 MXU inputs with f32
    accumulation, no [B, Lkv] transpose materialization."""
    b, tq, hq, d = q.shape
    pp, s, hkv = kp.shape[1], kp.shape[2], kp.shape[3]
    group = hq // hkv
    cdt = q.dtype
    qg = q.reshape(b, tq, hkv, group, d).astype(cdt)
    maskp = mask.reshape(b, tq, pp, s)
    # sanitize K/V slots no query attends (reused pages hold garbage)
    slot_live = jnp.any(maskp, axis=1)[:, :, :, None, None]  # [B,PP,S,1,1]
    zero = jnp.zeros((), cdt)
    kf = jnp.where(slot_live, kp.astype(cdt), zero)
    vf = jnp.where(slot_live, vp.astype(cdt), zero)
    scores = jnp.einsum(
        "bthgd,bpshd->bhgtps", qg, kf, preferred_element_type=jnp.float32
    ) * sm_scale  # [B, Hkv, G, Tq, PP, S]
    if softcap is not None:
        scores = softcap * jnp.tanh(scores / softcap)
    scores = jnp.where(maskp[:, None, None], scores, NEG_INF)
    flat = scores.reshape(b, hkv, group, tq, pp * s)
    if sinks is not None:
        sk = sinks.astype(jnp.float32).reshape(1, hkv, group, 1)
        m = jnp.maximum(flat.max(axis=-1), sk)
        e = jnp.exp(flat - m[..., None])
        denom = e.sum(axis=-1) + jnp.exp(sk - m)
        probs = e / denom[..., None]
    else:
        probs = jax.nn.softmax(flat, axis=-1)
    any_valid = jnp.any(mask, axis=-1)[:, None, None, :, None]
    probs = jnp.where(any_valid, probs, 0.0)
    probs = probs.reshape(b, hkv, group, tq, pp, s).astype(cdt)
    out = jnp.einsum(
        "bhgtps,bpshd->bthgd", probs, vf, preferred_element_type=jnp.float32
    )
    return out.reshape(b, tq, hq, d).astype(q.dtype)


def paged_attention(
    q: jax.Array,  # [B, Tq, Hq, D] (Tq=1 for decode)
    kv_cache: jax.Array,  # [L, num_pages, 2*Hkv, page_size, D]
    layer_idx,  # scalar int layer index
    page_table: jax.Array,  # [B, pages_per_seq]
    kv_lens: jax.Array,  # [B] total valid kv length (incl. tokens just written)
    q_start_pos: jax.Array,  # [B] absolute position of q token 0 (=cache_len)
    sm_scale: float,
    window=None,  # scalar int32 (traced ok): sliding window size; <0/None = full
    softcap: float = None,  # static: attention logit softcapping (gemma2)
    tree_mask=None,  # [B, Tq, Tq] bool: speculative-tree attendance for the
    # in-batch region (kv index j <-> slot row q_start + j); None = causal
    sinks=None,  # [Hq] learned per-head sink logits (gpt-oss)
) -> jax.Array:
    """Causal paged attention: query t attends kv positions <= q_start_pos+t.

    Works for decode (Tq=1, q_start_pos=kv_lens-1) and chunked prefill
    (Tq=chunk, q_start_pos=prefix_len).  Padding queries are those with
    q_start_pos + t >= kv_lens; their output is zeroed.

    With `window` set, query t additionally only attends kv positions
    > q_pos - window (sliding-window attention; reference analog:
    swa layers in srt/layers/attention + swa_memory_pool.py). window may be
    a traced per-layer scalar so alternating global/local layer patterns
    (gemma-style) work inside a fori_loop over layers.
    """
    b, tq = q.shape[0], q.shape[1]
    if tree_mask is None:
        # hot path (decode + chunked prefill): page-layout core
        kp, vp = _gather_pages(kv_cache, layer_idx, page_table)
        lkv = kp.shape[1] * kp.shape[2]  # PP * S
        kv_pos = jnp.arange(lkv)[None, None, :]
        q_pos = q_start_pos[:, None] + jnp.arange(tq)[None, :]  # [B,Tq]
        mask = (kv_pos <= q_pos[:, :, None]) & (kv_pos < kv_lens[:, None, None])
        mask = mask & (q_pos[:, :, None] < kv_lens[:, None, None])
        if window is not None:
            w = jnp.asarray(window, jnp.int32)
            in_window = kv_pos > (q_pos[:, :, None] - w)
            mask = mask & jnp.where(w >= 0, in_window, True)
        return _attn_core_paged(q, kp, vp, mask, sm_scale, softcap, sinks)
    # speculative tree verify: every query attends the full committed
    # prefix (kv_pos < q_start); the in-batch node region follows the
    # explicit ancestor mask (reference: tree masks in TARGET_VERIFY)
    k, v = gather_kv(kv_cache, layer_idx, page_table)
    lkv = k.shape[1]
    kv_pos = jnp.arange(lkv)[None, None, :]  # [1,1,Lkv]
    base = q_start_pos[:, None, None]  # [B,1,1]
    prefix = (kv_pos < base) & (kv_pos < kv_lens[:, None, None])
    j = kv_pos - base  # in-batch node index of each kv slot row
    jc = jnp.clip(j, 0, tq - 1)
    node = jnp.take_along_axis(
        tree_mask, jnp.broadcast_to(jc, (b, tq, lkv)), axis=2
    )
    in_batch = (j >= 0) & (j < tq) & (kv_pos < kv_lens[:, None, None])
    mask = prefix | (in_batch & node)
    return _attn_core(q, k.astype(q.dtype), v.astype(q.dtype), mask,
                      sm_scale, softcap, sinks)


def sparse_paged_attention(
    q: jax.Array,  # [B, Tq, Hq, D]
    kv_cache: jax.Array,  # [L, num_pages, 2*Hkv, page_size, D]
    layer_idx,
    page_table: jax.Array,  # [B, pages_per_seq]
    kv_lens: jax.Array,  # [B]
    q_start_pos: jax.Array,  # [B]
    sm_scale: float,
    topk_pages: int = 16,
    window=None,
    softcap: float = None,
    tree_mask=None,
    sinks=None,
    score_fn=None,  # kv/sparsity.py algorithm; None = landmark scoring
) -> jax.Array:
    """Top-k page-sparse decode attention (long-context path).

    Reference analog: NSA top-k block selection
    (srt/layers/attention/nsa/nsa_indexer.py) / Quest-style page scoring,
    re-designed for XLA: each page is scored by the query against two
    representative cached keys (slot 0 and the page midpoint), the sink
    page and the two most-recent pages are force-included, and attention
    runs over only the top-k selected pages — HBM traffic per decode step
    becomes O(k * page_size) instead of O(context).

    Prefill (Tq > 1) and tree-verify batches fall back to dense paged
    attention (static trace-time branch). Sequences short enough to fit
    inside the k selected pages are EXACT (every real page selected).
    """
    b, tq = q.shape[0], q.shape[1]
    pages_per_seq = page_table.shape[1]
    if tq > 1 or tree_mask is not None or pages_per_seq <= topk_pages:
        return paged_attention(
            q, kv_cache, layer_idx, page_table, kv_lens, q_start_pos,
            sm_scale, window=window, softcap=softcap, tree_mask=tree_mask,
            sinks=sinks)
    page_size = kv_cache.shape[2]
    hq = q.shape[2]
    d = q.shape[3]
    hkv = kv_cache.shape[3] // 2
    group = hq // hkv
    k_sel = topk_pages

    # ---- page scoring (pluggable; kv/sparsity.py framework) ----
    # landmark arrays are materialized pool-wide first (one sequential
    # strided sweep over the physical pool, prefetch-friendly), then
    # page-gathered from the small result — fusing the slice into the
    # per-(b, page) gather makes every read a scattered 256 B touch
    if score_fn is None:
        from sglang_diffusion_tpu.kv.sparsity import score_landmark
        score_fn = score_landmark
    score = score_fn(q, kv_cache, layer_idx, page_table, page_size)

    n_pages = (kv_lens + page_size - 1) // page_size  # [B]
    pidx = jnp.arange(pages_per_seq)[None, :]
    valid = pidx < n_pages[:, None]
    # force-include: the sink page and the two most-recent pages
    force = (pidx == 0) | (pidx >= (n_pages - 2)[:, None])
    score = jnp.where(valid, score, -jnp.inf)
    score = jnp.where(force & valid, jnp.inf, score)
    _, top = jax.lax.top_k(score, k_sel)
    sel = jnp.sort(top, axis=-1)  # ascending logical page order

    red_pt = jnp.take_along_axis(page_table, sel, axis=1)  # [B, k]
    kp, vp = _gather_pages(kv_cache, layer_idx, red_pt)  # [B, k, Hkv, ps, D]
    kv_pos = (sel[:, :, None] * page_size
              + jnp.arange(page_size)[None, None, :]).reshape(b, 1, -1)
    q_pos = q_start_pos[:, None] + jnp.arange(tq)[None, :]
    mask = (kv_pos <= q_pos[:, :, None]) & (kv_pos < kv_lens[:, None, None])
    mask = mask & (q_pos[:, :, None] < kv_lens[:, None, None])
    # selected-but-invalid pages (short seqs) are masked by kv_pos>=kv_len
    if window is not None:
        w = jnp.asarray(window, jnp.int32)
        in_window = kv_pos > (q_pos[:, :, None] - w)
        mask = mask & jnp.where(w >= 0, in_window, True)
    return _attn_core_paged(q, kp, vp, mask, sm_scale, softcap, sinks)


def full_attention(
    q: jax.Array,  # [B, T, Hq, D]
    k: jax.Array,  # [B, T, Hkv, D]
    v: jax.Array,
    seq_lens: jax.Array,  # [B]
    sm_scale: float,
) -> jax.Array:
    """Plain causal attention over in-batch K/V (no cache) — used by the
    diffusion text encoders and for testing."""
    t = q.shape[1]
    pos = jnp.arange(t)
    mask = (pos[None, :, None] >= pos[None, None, :]) & (
        pos[None, None, :] < seq_lens[:, None, None]
    )
    mask = mask & (pos[None, :, None] < seq_lens[:, None, None])
    return _attn_core(q, k, v, mask, sm_scale)


def dual_chunk_paged_attention(
    q_intra: jax.Array,  # [B, Tq, Hq, D] roped at p % chunk_len
    q_succ: jax.Array,   # [B, Tq, Hq, D] roped at min(p%cl + cl, chunk)
    q_inter: jax.Array,  # [B, Tq, Hq, D] roped at the constant position
    kv_cache: jax.Array,
    layer_idx,
    page_table: jax.Array,  # [B, pages_per_seq]
    kv_lens: jax.Array,  # [B]
    q_start_pos: jax.Array,  # [B]
    sm_scale: float,
    chunk_len: int,  # chunk_size - local_size
) -> jax.Array:
    """Dual Chunk Attention over the paged cache (reference analog:
    srt/layers/attention/dual_chunk_flashattention_backend.py).

    The reference runs three flash passes (intra / succ / inter KV
    ranges, each with its own roped query) and merges them by
    log-sum-exp. Because the three ranges PARTITION the causal KV span
    of every query, the merge is mathematically identical to ONE softmax
    over all positions where each kv position's logit is computed with
    the variant its range dictates — which is how it's fused here
    (single gather, single softmax; XLA-friendly, no LSE bookkeeping):

      cn = p // chunk_len
      j >= cn*chunk_len          -> intra logits (q_intra . k_j)
      (cn-1)*cl <= j < cn*cl     -> succ logits  (q_succ . k_j)
      j < (cn-1)*cl              -> inter logits (q_inter . k_j)
    """
    b, tq, hq, d = q_intra.shape
    kp, vp = _gather_pages(kv_cache, layer_idx, page_table)
    pp, s, hkv = kp.shape[1], kp.shape[2], kp.shape[3]
    group = hq // hkv
    lkv = pp * s
    cdt = q_intra.dtype

    kv_pos = jnp.arange(lkv)[None, None, :]  # [1, 1, Lkv]
    q_pos = q_start_pos[:, None] + jnp.arange(tq)[None, :]  # [B, Tq]
    causal = (kv_pos <= q_pos[:, :, None]) & (
        kv_pos < kv_lens[:, None, None])
    causal = causal & (q_pos[:, :, None] < kv_lens[:, None, None])

    slot_live = jnp.any(causal.reshape(b, tq, pp, s), axis=1)[
        :, :, :, None, None]
    zero = jnp.zeros((), cdt)
    kf = jnp.where(slot_live, kp.astype(cdt), zero)
    vf = jnp.where(slot_live, vp.astype(cdt), zero)

    def scores_of(q):
        qg = q.reshape(b, tq, hkv, group, d).astype(cdt)
        return jnp.einsum("bthgd,bpshd->bhgtps", qg, kf,
                          preferred_element_type=jnp.float32) * sm_scale

    s_intra = scores_of(q_intra).reshape(b, hkv, group, tq, lkv)
    s_succ = scores_of(q_succ).reshape(b, hkv, group, tq, lkv)
    s_inter = scores_of(q_inter).reshape(b, hkv, group, tq, lkv)

    cn = q_pos // chunk_len  # [B, Tq]
    intra_start = (cn * chunk_len)[:, :, None]  # [B, Tq, 1]
    succ_start = jnp.maximum(intra_start - chunk_len, 0)
    is_intra = kv_pos >= intra_start  # [B, Tq, Lkv]
    is_succ = (~is_intra) & (kv_pos >= succ_start)
    sel = jnp.where(is_intra[:, None, None], s_intra,
                    jnp.where(is_succ[:, None, None], s_succ, s_inter))
    sel = jnp.where(causal[:, None, None], sel, NEG_INF)
    probs = jax.nn.softmax(sel, axis=-1)
    any_valid = jnp.any(causal, axis=-1)[:, None, None, :, None]
    probs = jnp.where(any_valid, probs, 0.0)
    probs = probs.reshape(b, hkv, group, tq, pp, s).astype(cdt)
    out = jnp.einsum("bhgtps,bpshd->bthgd", probs, vf,
                     preferred_element_type=jnp.float32)
    return out.reshape(b, tq, hq, d).astype(q_intra.dtype)
