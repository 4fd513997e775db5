"""Pallas TPU paged attention via the official ragged-paged-attention kernel.

TPU-native replacement for the reference's CUDA attention backends
(sgl-kernel/csrc/attention/, flashinfer/fa3 integrations — see SURVEY.md
§2.3). Round 4 replaced the hand-rolled per-(seq, head) kernel — whose
2048-program grid was DMA-latency bound (75 ms per decode step at bs=256,
vs ~4 ms of actual HBM traffic) — with JAX's shipped, TPU-tuned
ragged-paged-attention kernel
(jax.experimental.pallas.ops.tpu.ragged_paged_attention), which this repo's
KV layout now matches: [L, P, S, 2*Hkv, D], K/V interleaved on the
combined-head axis.

Stacked-layer trick: the kernel wants a per-layer [P, S, 2Hkv, D] page
array; instead of slicing (which would materialize a 268 MB copy per layer),
the [L, P, S, 2Hkv, D] cache is reshaped (zero-copy) to [(L*P), S, 2Hkv, D]
and the page indices are offset by layer*P.

Batched->ragged adapter: the engine's batches are [B, Tq] padded; queries
flatten to [B*Tq] with cu_q_lens = arange(B+1)*Tq and per-seq
kv_len' = q_start + Tq. Because the kernel places a sequence's queries at
positions kv_len'-Tq..kv_len'-1, real rows (j < real chunk len) attend
exactly kv <= q_start+j — right-padding rows only ever see
causality-protected garbage and their outputs are dropped by the caller.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
    ragged_paged_attention,
)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "q_block", "interpret", "softcap", "window",
                     "kv_pages_hint"),
)
def paged_attention(
    q: jax.Array,  # [B, T, Hq, D]
    kv_cache: jax.Array,  # [L, P, S, 2*Hkv, D]
    layer_idx,  # scalar int
    page_table: jax.Array,  # [B, PPS] int32
    kv_lens: jax.Array,  # [B] int32
    q_start_pos: jax.Array,  # [B] int32
    sm_scale: float,
    q_block: int = None,  # unused (kernel tunes its own block sizes)
    interpret: bool = False,  # True = XLA reference path (CPU tests)
    window=None,  # static int or None (traced windows fall back upstream)
    softcap: float = None,
    kv_pages_hint: int = None,  # static: pages covering the batch's max
    # context (the scheduler knows it; see model_runner pages-hint)
) -> jax.Array:
    if interpret:
        # ref_ragged_paged_attention is not traceable (concrete python
        # loops); CPU/interpret callers get the numerics-equivalent XLA
        # path. Real Mosaic lowering is gated on the bench TPU via
        # tools/check_pallas_parity.py.
        from sglang_diffusion_tpu.ops import attention_xla

        return attention_xla.paged_attention(
            q, kv_cache, layer_idx, page_table, kv_lens, q_start_pos,
            sm_scale, window=window, softcap=softcap,
        )
    b, t, hq, d = q.shape
    nl, p, s, two_hkv, _ = kv_cache.shape

    if (
        t == 1
        and window is None
        and softcap is None
        and kv_pages_hint is not None
        and kv_pages_hint <= page_table.shape[1]
        and kv_cache.dtype in (jnp.bfloat16, jnp.float8_e4m3fn,
                               jnp.float8_e5m2)
        and hq % (two_hkv // 2) == 0
    ):
        # cross-sequence batched decode kernel: G sequences per grid step,
        # DMA-saturating (see ops/decode_pallas.py). fp8 caches dequantize
        # in-kernel with integer bit math (decode_pallas._to_bf16) —
        # Mosaic's native f8->bf16 convert is ~32 ms/step at bs=256, 6x
        # the whole bf16 kernel, while the bit-twiddle path keeps fp8's
        # halved DMA bytes a win.
        from sglang_diffusion_tpu.ops.decode_pallas import decode_attention

        # largest G whose double-buffered page scratch fits ~12 MB VMEM
        tile = kv_pages_hint * s * two_hkv * d * kv_cache.dtype.itemsize
        g = 8
        while g > 1 and 2 * g * tile > 12 * 1024 * 1024:
            g //= 2
        return decode_attention(
            q, kv_cache, layer_idx, page_table, kv_lens, sm_scale,
            pages_hint=kv_pages_hint, group_size=g,
        )

    q_flat = q.reshape(b * t, hq, d)
    pages_flat = kv_cache.reshape(nl * p, s, two_hkv, d)
    idx = (
        jnp.asarray(layer_idx, jnp.int32) * p
        + jnp.maximum(page_table, 0).astype(jnp.int32)
    )
    cu_q_lens = (jnp.arange(b + 1, dtype=jnp.int32)) * t
    # pretend every sequence's kv extends through its padded queries: real
    # rows stay exactly causal (see module docstring)
    kv_lens_rpa = (q_start_pos + t).astype(jnp.int32)
    num_seqs = jnp.asarray([b], jnp.int32)

    kw = dict(
        sm_scale=sm_scale,
        sliding_window=int(window) if window is not None and window >= 0
        else None,
        soft_cap=softcap,
    )
    if t == 1:
        # decode: round-4 sweep on the bench chip — covering each
        # sequence's whole VALID context in ONE kv block minimizes both
        # per-sequence while-loop visits and padded-page DMA waste
        # (30.5 ms vs 54.5 ms tuned-default per fused step at
        # bs=256/ctx145); small q blocks keep the wasted cross-sequence
        # rows down. kv_pages_hint is the scheduler's bound on the
        # batch's max valid page count (static per decode bucket).
        nkv = kv_pages_hint or page_table.shape[1]
        kw["num_kv_pages_per_block"] = max(1, min(nkv, page_table.shape[1],
                                                  16))
        kw["num_queries_per_block"] = 8
    if kv_cache.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        # quantized cache: the kernel dequantizes on load via scales
        kw["k_scale"] = kw["v_scale"] = 1.0
    out = ragged_paged_attention(
        q_flat, pages_flat, kv_lens_rpa, idx, cu_q_lens, num_seqs, **kw
    )
    return out.reshape(b, t, hq, d).astype(q.dtype)
