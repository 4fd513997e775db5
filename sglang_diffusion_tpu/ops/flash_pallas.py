"""Pallas dense flash attention (bidirectional or causal).

Reference analog: the diffusion attention backends (multimodal_gen
runtime/layers/attention/backends/ — FA3/SDPA/Sage) and the LLM prefill
flash path. One kernel serves both: causal=False for DiT joint attention,
causal=True for in-batch LLM prefill.

Grid (B, H, q_blocks, kv_blocks); kv is the innermost sequential dimension
so the online-softmax accumulators live in VMEM scratch across the kv loop.
Blocks are streamed by the Pallas pipeline (no manual DMA needed here —
regular block indexing lets Mosaic double-buffer automatically).
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
    len_ref,  # [1] i32 scalar prefetch: valid sequence length
    q_ref,  # [1, 1, bq, D]  (inputs laid out [B, H, T, D]: Mosaic requires
    k_ref,  # [1, 1, bkv, D]  the trailing two block dims be (8k, 128k))
    v_ref,  # [1, 1, bkv, D]
    o_ref,  # [1, 1, bq, D]
    m_scr,  # [bq, 128] f32
    l_scr,  # [bq, 128] f32
    acc_scr,  # [bq, D] f32
    *,
    sm_scale: float,
    causal: bool,
    bq: int,
    bkv: int,
):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    valid = len_ref[0]

    @pl.when(ki == 0)
    def _():
        m_scr[...] = jnp.full_like(m_scr, NEG_INF)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    q = q_ref[0, 0]  # [bq, D]
    k = k_ref[0, 0]  # [bkv, D]
    v = v_ref[0, 0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * sm_scale  # [bq, bkv]

    q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 0)
    kv_pos = ki * bkv + jax.lax.broadcasted_iota(jnp.int32, (bq, bkv), 1)
    mask = kv_pos < valid
    if causal:
        mask = mask & (kv_pos <= q_pos)
    s = jnp.where(mask, s, NEG_INF)

    m_prev = m_scr[:, 0:1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)
    p = jnp.exp(s - m_new)
    l_new = alpha * l_scr[:, 0:1] + jnp.sum(p, axis=1, keepdims=True)
    pv = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    acc_scr[...] = acc_scr[...] * alpha + pv
    m_scr[...] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[...] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ki == pl.num_programs(3) - 1)
    def _():
        l = jnp.maximum(l_scr[:, 0:1], 1e-30)
        o_ref[0, 0] = (acc_scr[...] / l).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "causal", "block_q", "block_kv", "interpret"),
)
def flash_attention(
    q: jax.Array,  # [B, T, H, D]
    k: jax.Array,
    v: jax.Array,
    sm_scale: float,
    causal: bool = False,
    valid_len: jax.Array = None,  # [] i32; defaults to T
    block_q: int = 128,
    block_kv: int = 128,
    interpret: bool = False,
) -> jax.Array:
    b, t, h, d = q.shape
    bq = min(block_q, t)
    bkv = min(block_kv, t)
    t_pad = cdiv(t, max(bq, bkv)) * max(bq, bkv)
    if t_pad != t:
        pad = [(0, 0), (0, t_pad - t), (0, 0), (0, 0)]
        q = jnp.pad(q, pad)
        k = jnp.pad(k, pad)
        v = jnp.pad(v, pad)
    if valid_len is None:
        valid_len = jnp.int32(t)
    valid_arr = jnp.asarray(valid_len, jnp.int32).reshape(1)
    # [B, T, H, D] -> [B, H, T, D] so blocks end in (seq, head_dim)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    grid = (b, h, t_pad // bq, t_pad // bkv)
    out = pl.pallas_call(
        functools.partial(
            _kernel, sm_scale=sm_scale, causal=causal, bq=bq, bkv=bkv
        ),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, 1, bq, d),
                    lambda b_, h_, qi, ki, *refs: (b_, h_, qi, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bkv, d),
                    lambda b_, h_, qi, ki, *refs: (b_, h_, ki, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, bkv, d),
                    lambda b_, h_, qi, ki, *refs: (b_, h_, ki, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, bq, d),
                lambda b_, h_, qi, ki, *refs: (b_, h_, qi, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, 128), jnp.float32),
                pltpu.VMEM((bq, d), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d), q.dtype),
        interpret=interpret,
    )(valid_arr, q, k, v)
    return out.transpose(0, 2, 1, 3)[:, :t]
