"""Fused W4A16 dequant + matmul Pallas kernel.

TPU-native replacement for the reference's Marlin-class CUDA W4A16 GEMMs
(sgl-kernel/csrc/gemm/gptq_kernel.cu, awq_kernel.cu — see SURVEY.md §2.3):
weights live in HBM as packed 4-bit, are dequantized tile-by-tile in VMEM,
and hit the MXU as bf16. Weight HBM traffic is the decode bottleneck, so
4-bit storage is ~2x faster than the int8 path and ~4x faster than bf16 at
small batch.

Packing layout ("ksplit"): a [K, N] 4-bit weight matrix is stored as
    packed  uint8 [K//2, N]   byte(i, n) = w[i, n] | (w[i + K//2, n] << 4)
    scales  f32   [K//G, N]   per-group (group size G along K)
    zeros   f32   [K//G, N]   AWQ/GPTQ zero points (dequant = (q - z) * s)
so the low nibbles cover K rows [0, K/2) and the high nibbles rows
[K/2, K). Unpacking a tile needs no sublane interleave: the two nibble
planes are two independent K-ranges, each contracted against the matching
half of the activations and accumulated.

Grid: (N//BN, K2//BK) with K innermost; out tile [M, BN] accumulates in a
f32 VMEM scratch across K steps (classic Pallas matmul accumulation).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from sglang_diffusion_tpu.utils.common import cdiv


def pack_w4(
    w_int: np.ndarray,  # [K, N] integer 4-bit values (0..15)
    scales: np.ndarray,  # [K//G, N]
    zeros: np.ndarray,  # [K//G, N]
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pack unsigned 4-bit weights into the kernel's ksplit byte layout."""
    k, n = w_int.shape
    assert k % 2 == 0, "K must be even for nibble packing"
    lo = w_int[: k // 2].astype(np.uint8) & 0xF
    hi = w_int[k // 2 :].astype(np.uint8) & 0xF
    packed = (lo | (hi << 4)).astype(np.uint8)
    return packed, scales.astype(np.float32), zeros.astype(np.float32)


def _kernel(
    x_lo_ref,  # [M, BK]   activations, rows of the low-nibble K half
    x_hi_ref,  # [M, BK]   activations, rows of the high-nibble K half
    p_ref,  # [BK, BN]  packed bytes
    s_ref,  # [K//G, BN] all scale groups for this N block (small)
    z_ref,  # [K//G, BN] zeros
    o_ref,  # [M, BN]
    acc_ref,  # [M, BN] f32 scratch
    *,
    group: int,
    out_dtype,
):
    kb = pl.program_id(2)
    nkb = pl.num_programs(2)

    @pl.when(kb == 0)
    def _():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    packed = p_ref[...].astype(jnp.int32)  # widen once; nibble ops in int32
    bk = packed.shape[0]
    n_groups = bk // group

    def half(nibbles, x_ref, group_base):
        acc = jnp.zeros_like(acc_ref)
        # dequant one scale-group at a time: (q - z) * s with z, s broadcast
        # from a single [1, BN] row — no sublane-expensive repeat needed.
        for g in range(n_groups):
            q = nibbles[g * group : (g + 1) * group].astype(jnp.float32)
            s = s_ref[pl.ds(group_base + g, 1), :]
            z = z_ref[pl.ds(group_base + g, 1), :]
            w = ((q - z) * s).astype(jnp.bfloat16)  # [group, BN]
            xg = x_ref[:, g * group : (g + 1) * group]  # [M, group]
            acc = acc + jax.lax.dot_general(
                xg.astype(jnp.bfloat16),
                w,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        return acc

    lo = packed & 0xF
    hi = (packed >> 4) & 0xF
    # lo-half groups start at kb*n_groups; hi-half groups sit nkb*n_groups
    # group-rows later (the hi nibble plane covers K rows [K/2, K)).
    acc_ref[...] += half(lo, x_lo_ref, kb * n_groups)
    acc_ref[...] += half(hi, x_hi_ref, (nkb + kb) * n_groups)

    @pl.when(kb == nkb - 1)
    def _():
        o_ref[...] = acc_ref[...].astype(out_dtype)


@functools.partial(
    jax.jit,
    static_argnames=("group", "block_m", "block_n", "block_k", "interpret"),
)
def w4a16_matmul(
    x: jax.Array,  # [..., K] bf16/f32
    packed: jax.Array,  # [K//2, N] uint8 (ksplit layout)
    scales: jax.Array,  # [K//G, N] f32
    zeros: jax.Array,  # [K//G, N] f32
    group: int = 128,
    block_m: int = 512,
    block_n: int = 256,
    block_k: int = 256,
    interpret: bool = False,
) -> jax.Array:
    """out[..., N] = x @ dequant(packed) with in-kernel 4-bit dequant."""
    *lead, k = x.shape
    k2, n = packed.shape
    assert k == 2 * k2, (k, k2)
    m = int(np.prod(lead)) if lead else 1
    x2 = x.reshape(m, k)

    # block_k counts K rows per nibble plane per step; keep it a multiple of
    # the scale group so each block sees whole groups.
    bk = min(block_k, k2)
    bk = max(group, (bk // group) * group)
    if k2 % bk:  # fall back to one K step if blocks don't divide evenly
        bk = k2
    bn = min(block_n, n)
    if n % bn:
        bn = n
    sg = bk // group

    # block M as well (prefill can flatten to thousands of rows; the full-M
    # variant overflows the 16MB VMEM budget)
    m_pad = max(16, ((m + 15) // 16) * 16)
    bm = min(block_m, m_pad)
    m_pad = ((m_pad + bm - 1) // bm) * bm
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    grid = (m_pad // bm, n // bn, k2 // bk)

    kernel = functools.partial(
        _kernel, group=group, out_dtype=jnp.dtype(x.dtype)
    )
    nkb = k2 // bk  # hi-half blocks sit nkb block-strides after the lo half
    n_group_rows = scales.shape[0]  # = K // group (small: K/128 rows)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            # lo activations: K rows [kb*bk, kb*bk+bk)
            pl.BlockSpec((bm, bk), lambda mb, nb, kb: (mb, kb),
                         memory_space=pltpu.VMEM),
            # hi activations: K rows [K/2 + kb*bk, ...)
            pl.BlockSpec((bm, bk), lambda mb, nb, kb: (mb, kb + nkb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda mb, nb, kb: (kb, nb),
                         memory_space=pltpu.VMEM),
            # scales/zeros: all K//G group rows for this N block (few KB;
            # Mosaic requires sublane-aligned or full-dim blocks, so the
            # tiny per-K-block slabs are indexed dynamically in-kernel)
            pl.BlockSpec((n_group_rows, bn), lambda mb, nb, kb: (0, nb),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_group_rows, bn), lambda mb, nb, kb: (0, nb),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda mb, nb, kb: (mb, nb),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m_pad, n), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=interpret,
    )(x2, x2, packed, scales, zeros)
    out = out[:m]
    return out.reshape(*lead, n)
