"""Pallas TPU paged MLA (multi-head latent attention) decode/prefill kernel.

TPU-native analog of the reference's dedicated MLA decode kernels
(sgl-kernel/csrc/attention/cutlass_mla_kernel.cu, the flashmla / trtllm_mla
attention backends — capability match, not a translation). MLA's whole point
is that the KV cache stores ONE latent row per token (R = kv_lora_rank +
qk_rope_head_dim, e.g. 512+64 for DeepSeek-V3) instead of 2*H*D per-head
K/V planes; this kernel exploits that directly:

- grid (batch, q_block): ONE program serves ALL query heads of a sequence
  (the latent is shared across heads, MQA-style), so each cached page is
  streamed from HBM exactly once per q block — HBM traffic per decoded
  token is S*R bytes, independent of head count.
- the page DMA double-buffers [S, R] latent tiles into VMEM; scores are
  q_abs · latent over the full R lanes (absorbed-nope ++ roped q_pe), the
  context accumulates probs · latent[:, :r_kv] — "V" is just the first
  r_kv lanes of the same tile, no second fetch.
- online softmax (flash) in f32 VMEM scratch, causal masking by absolute
  position: decode (TQ=1), chunked prefill, and verify share the kernel.

The dense-einsum path in models/deepseek.py (materializing [B,H,T,S] f32
scores) remains as the small-shape/CPU fallback; this kernel is what makes
32k-context MLA decode feasible (the dense path OOMs there).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_diffusion_tpu.utils.common import cdiv

NEG_INF = -1e30


def _kernel(
    # scalar prefetch
    layer_ref,  # [1] int32
    page_table_ref,  # [B, PPS] int32 (SMEM)
    kv_lens_ref,  # [B] int32
    q_start_ref,  # [B] int32
    # inputs
    q_ref,  # [1, TQ, H, R] VMEM block
    kv_hbm,  # [L, P, 1, S, R] in ANY/HBM
    # outputs
    o_ref,  # [1, TQ, H, RKV] VMEM
    # scratch
    lat_buf,  # [2, S, R] VMEM double buffer
    acc_ref,  # [TQ*H, RKV] f32
    m_ref,  # [TQ*H, 128] f32
    l_ref,  # [TQ*H, 128] f32
    sems,  # DMA sems (2,)
    *,
    page_size: int,
    r_kv: int,
    sm_scale: float,
):
    b = pl.program_id(0)
    qb = pl.program_id(1)

    tq, h, r = q_ref.shape[1], q_ref.shape[2], q_ref.shape[3]
    rows = tq * h
    kv_len = kv_lens_ref[b]
    q_start = q_start_ref[b] + qb * tq

    kv_limit = jnp.minimum(kv_len, q_start + tq)
    num_pages = pl.cdiv(kv_limit, page_size)
    layer = layer_ref[0]

    def start_dma(slot, page_idx):
        pid = page_table_ref[b, page_idx]
        return pltpu.make_async_copy(
            kv_hbm.at[layer, pid, :, 0],  # [S, R]
            lat_buf.at[slot],
            sems.at[slot],
        )

    # row = t * h + hi  =>  query position t = row // h
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, page_size), 0)
    q_pos = q_start + row_ids // h
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (rows, page_size), 1)

    @pl.when(num_pages > 0)
    def _():
        start_dma(0, 0).start()

    acc_ref[...] = jnp.zeros_like(acc_ref)
    m_ref[...] = jnp.full_like(m_ref, NEG_INF)
    l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0].reshape(rows, r)

    def body(i, _):
        slot = i % 2

        @pl.when(i + 1 < num_pages)
        def _():
            start_dma((i + 1) % 2, i + 1).start()

        start_dma(slot, i).wait()

        lat = lat_buf[slot].astype(q_ref.dtype)  # [S, R]
        s = jax.lax.dot_general(
            q,
            lat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, S]
        s = s * sm_scale
        kv_pos = i * page_size + col_ids
        mask = (kv_pos <= q_pos) & (kv_pos < kv_len)
        s = jnp.where(mask, s, NEG_INF)

        m_prev = m_ref[:, 0:1]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev - m_new)
        p = jnp.exp(s - m_new)  # [rows, S]
        pv = jax.lax.dot_general(
            p.astype(lat.dtype),
            lat[:, :r_kv],  # "V" = first r_kv lanes of the latent
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [rows, RKV]
        l_new = alpha * l_ref[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
        acc_ref[...] = acc_ref[...] * alpha + pv
        m_ref[...] = jnp.broadcast_to(m_new, m_ref.shape)
        l_ref[...] = jnp.broadcast_to(l_new, l_ref.shape)
        return 0

    jax.lax.fori_loop(0, num_pages, body, 0)

    l = l_ref[:, 0:1]
    out = jnp.where(l > 0, acc_ref[...] / jnp.maximum(l, 1e-30), 0.0)
    o_ref[0] = out.reshape(tq, h, r_kv).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "r_kv", "q_block", "interpret")
)
def mla_paged_attention(
    q_abs: jax.Array,  # [B, T, H, R]  (absorbed nope ++ roped q_pe)
    kv_cache: jax.Array,  # [L, P, S, 1, R] latent plane
    layer_idx,  # scalar int
    page_table: jax.Array,  # [B, PPS] int32
    kv_lens: jax.Array,  # [B] int32
    q_start_pos: jax.Array,  # [B] int32
    sm_scale: float,
    r_kv: int,
    q_block: int = 0,  # 0 = auto (cap rows at 256)
    interpret: bool = False,
) -> jax.Array:
    """Returns context in LATENT space [B, T, H, r_kv] (caller expands
    through W_UV), matching models/deepseek.py:mla_attention."""
    b, t, h, r = q_abs.shape
    nl, p, s, one, _ = kv_cache.shape
    if q_block <= 0:
        q_block = max(1, 256 // h)
    tq = min(t, q_block)
    num_q_blocks = cdiv(t, tq)
    rows = tq * h

    grid = (b, num_q_blocks)
    kernel = functools.partial(
        _kernel, page_size=s, r_kv=r_kv, sm_scale=sm_scale
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, tq, h, r),
                    lambda b_, qb_, *refs: (b_, qb_, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, tq, h, r_kv),
                lambda b_, qb_, *refs: (b_, qb_, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, s, r), kv_cache.dtype),
                pltpu.VMEM((rows, r_kv), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.VMEM((rows, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, t, h, r_kv), q_abs.dtype),
        interpret=interpret,
    )(
        jnp.asarray(layer_idx, jnp.int32).reshape(1),
        page_table,
        kv_lens,
        q_start_pos,
        q_abs,
        kv_cache,
    )
    return out
