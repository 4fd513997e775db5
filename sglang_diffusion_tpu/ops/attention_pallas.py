"""Pallas TPU ragged paged attention (unified prefill + decode).

TPU-native replacement for the reference's CUDA attention backends
(sgl-kernel/csrc/attention/, flashinfer/fa3 integrations — see SURVEY.md
§2.3). Design follows the Ragged Paged Attention pattern (PAPERS.md):

- grid (batch, kv_head, q_block): each program owns one sequence, one KV
  head (with its G = Hq/Hkv query-head group) and one block of query rows.
- KV pages stay in HBM; the kernel streams one head's page slice
  [2, page_size, D] per page with double-buffered async DMA, using the
  scalar-prefetched page table to compute source addresses.
- online softmax (flash attention) in f32 VMEM scratch; causal masking by
  absolute position supports chunked prefill, speculative verify (tree
  masks later), and decode (q_len=1) in the same kernel.

Layout contract (ops/__init__.py): kv_layer [P, 2*Hkv, S, D], K at even
combined-head indices, V at odd; one (page, head) slice is contiguous.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_diffusion_tpu.utils.common import cdiv

NEG_INF = -1e30
DEFAULT_Q_BLOCK = 128


def _kernel(
    # scalar prefetch
    layer_ref,  # [1] int32: layer index into the stacked cache
    window_ref,  # [1] int32: sliding window (<0 = full attention)
    page_table_ref,  # [B, PPS] int32 (SMEM)
    kv_lens_ref,  # [B] int32
    q_start_ref,  # [B] int32
    # inputs
    q_ref,  # [1, TQ, G, D] VMEM block (one kv head's query group)
    kv_hbm,  # [L, P, 2*Hkv, S, D] in ANY/HBM
    # outputs
    o_ref,  # [1, TQ, G, D] VMEM
    # scratch
    kv_buf,  # [2, 2, S, D] VMEM double buffer
    acc_ref,  # [TQ*G, D] f32
    m_ref,  # [TQ*G, 128] f32
    l_ref,  # [TQ*G, 128] f32
    sems,  # DMA sems (2,)
    *,
    page_size: int,
    num_kv_heads: int,
    q_block: int,
    sm_scale: float,
    softcap: float = None,
):
    b = pl.program_id(0)
    h = pl.program_id(1)
    qb = pl.program_id(2)

    tq, g, d = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    rows = tq * g
    kv_len = kv_lens_ref[b]
    q_start = q_start_ref[b] + qb * q_block

    # kv range this q block can see: positions [lo, q_start + tq)
    kv_limit = jnp.minimum(kv_len, q_start + tq)
    num_pages = pl.cdiv(kv_limit, page_size)
    window = window_ref[0]
    # sliding window: pages entirely before the earliest visible position
    # (first query's pos - window + 1) are skipped, not just masked —
    # the DMA loop never touches them (HBM traffic scales with the window).
    # w_eff folds the "no window" case (<0) into a huge window with pure
    # arithmetic — Mosaic cannot legalize boolean selects.
    w_eff = jnp.maximum(window, 0) + (window < 0).astype(jnp.int32) * (1 << 30)
    first_visible = jnp.maximum(q_start - w_eff + 1, 0)
    page_lo = first_visible // page_size

    layer = layer_ref[0]

    def start_dma(slot, page_idx):
        pid = page_table_ref[b, page_idx]
        return pltpu.make_async_copy(
            kv_hbm.at[layer, pid, pl.ds(2 * h, 2)],  # [2, S, D]
            kv_buf.at[slot],
            sems.at[slot],
        )

    # row -> query position within block: row = t * g + gi  =>  t = row // g
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, page_size), 0)
    q_pos = q_start + row_ids // g  # absolute position of each row's query
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, page_size), 1)

    @pl.when(num_pages > page_lo)
    def _():
        start_dma(0, page_lo).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].reshape(rows, d)  # [(t,g) rows, D]

    def body(i, _):
        slot = (i - page_lo) % 2

        @pl.when(i + 1 < num_pages)
        def _():
            start_dma((i + 1 - page_lo) % 2, i + 1).start()

        start_dma(slot, i).wait()

        # upcast (no-op for bf16 cache; fp8_e4m3 KV upcasts here, matching
        # the reference's FP8 KV-cache dequant-on-load)
        k = kv_buf[slot, 0].astype(q_ref.dtype)  # [S, D]
        v = kv_buf[slot, 1].astype(q_ref.dtype)
        s = jax.lax.dot_general(
            q,
            k,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, S]
        s = s * sm_scale
        if softcap is not None:
            s = softcap * jnp.tanh(s / softcap)
        kv_pos = i * page_size + col_ids
        mask = (kv_pos <= q_pos) & (kv_pos < kv_len)
        mask = mask & (kv_pos > q_pos - w_eff)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0:1]  # [rows, 1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [rows, S]
        l_new = alpha * l_ref[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
        pv = jax.lax.dot_general(
            p.astype(v.dtype),
            v,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, D]
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(page_lo, num_pages, body, 0)

    l = l_ref[:, 0:1]
    out = jnp.where(l > 0, acc_ref[...] / jnp.maximum(l, 1e-30), 0.0)
    o_ref[0] = out.reshape(tq, g, d).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "q_block", "interpret", "softcap")
)
def paged_attention(
    q: jax.Array,  # [B, T, Hq, D]
    kv_cache: jax.Array,  # [L, P, 2*Hkv, S, D]
    layer_idx,  # scalar int
    page_table: jax.Array,  # [B, PPS] int32
    kv_lens: jax.Array,  # [B] int32
    q_start_pos: jax.Array,  # [B] int32
    sm_scale: float,
    q_block: int = DEFAULT_Q_BLOCK,
    interpret: bool = False,
    window=None,  # scalar int32; <0/None = full attention
    softcap: float = None,  # static: attention logit softcapping (gemma2)
) -> jax.Array:
    b, t, hq, d = q.shape
    nl, p, two_hkv, s, _ = kv_cache.shape
    hkv = two_hkv // 2
    g = hq // hkv
    tq = min(t, q_block)
    num_q_blocks = cdiv(t, tq)
    rows = tq * g

    # [B, T, Hq, D] -> [B, T, Hkv, G, D] so one block covers one head group
    q_r = q.reshape(b, t, hkv, g, d)

    grid = (b, hkv, num_q_blocks)
    kernel = functools.partial(
        _kernel,
        page_size=s,
        num_kv_heads=hkv,
        q_block=tq,
        sm_scale=sm_scale,
        softcap=softcap,
    )
    if window is None:
        window = -1
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=5,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, tq, None, g, d),
                    lambda b_, h_, qb_, *refs: (b_, qb_, h_, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, tq, None, g, d),
                lambda b_, h_, qb_, *refs: (b_, qb_, h_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 2, s, d), kv_cache.dtype),
                pltpu.VMEM((rows, d), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, hkv, g, d), q.dtype),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        jnp.asarray(window, jnp.int32).reshape(1),
        page_table,
        kv_lens,
        q_start_pos,
        q_r,
        kv_cache,
    )
    return out.reshape(b, t, hq, d)
