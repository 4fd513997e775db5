"""Cross-sequence batched decode attention (TPU Pallas).

The official ragged-paged-attention kernel visits one sequence per grid
step; at decode (t=1, large batch) the per-visit fixed cost (~7 us)
dominates: bs=256 x 16 layers ~ 29 ms/step while the KV bytes themselves
stream in ~2 ms at HBM bandwidth. This kernel processes G sequences per
grid step with double-buffered page DMAs so the fixed cost amortizes
G-fold and the DMA engine stays saturated.

Reference analog: the decode split of sgl-kernel's paged attention
(flashinfer BatchDecodeWithPagedKVCache) — redesigned for the TPU memory
hierarchy: scalar-prefetched page tables drive manual HBM->VMEM copies;
softmax runs in f32 on [group, CTX] tiles per kv head.

Layout matches the engine pool: kv_cache [L, P, S, 2*Hkv, D] with
combined interleaved heads (k0,v0,k1,v1,...). The layer is folded into
the page index (stacked-page trick), so the kernel sees [L*P, S, 2H, D]
without a copy.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _to_bf16(x):
    """Upcast a KV tile to bf16 for the MXU dots.

    Mosaic's native f8->bf16 convert costs ~32 ms per bs-256 decode step
    (6x the whole bf16 kernel), so fp8 caches are dequantized with integer
    bit math: rebias the fp8 exponent into bf16's 8-bit field and place
    the mantissa below it. Bit-exact vs jax's own convert for every
    NORMAL code; subnormals flush to signed zero
    (tests/test_decode_pallas.py).
    """
    if x.dtype == jnp.bfloat16:
        return x
    if x.dtype in (jnp.float8_e4m3fn, jnp.float8_e5m2):
        # (an e5m2-as-fp16-top-byte shortcut would need a u16->f16 vreg
        # bitcast, which Mosaic rejects; the integer rebias below lowers.)
        # Subnormals FLUSH TO SIGNED ZERO: one integer select instead of
        # an arithmetic reconstruction — e4m3 subnormals are < 0.0156 and
        # contribute nothing measurable through attention (e5m2's are
        # < 6.1e-5). Exactness for normals is preserved.
        mbits, bias = (3, 7) if x.dtype == jnp.float8_e4m3fn else (2, 15)
        u = jax.lax.bitcast_convert_type(x, jnp.uint8).astype(jnp.int32)
        sign = (u & 0x80) << 8
        exp_mant = u & 0x7F
        bits = jnp.where(
            exp_mant >> mbits > 0,
            sign | ((((127 - bias) << mbits) + exp_mant) << (7 - mbits)),
            sign,
        )
        return jax.lax.bitcast_convert_type(
            bits.astype(jnp.uint16), jnp.bfloat16)
    return x.astype(jnp.bfloat16)


def _decode_kernel(
    # scalar prefetch
    pt_ref,   # [B, PP] int32 page ids (already layer-offset)
    len_ref,  # [B] int32 kv lens
    # inputs
    q_ref,    # [G, Hq, D] VMEM block
    kv_hbm,   # [NP, S, 2Hkv, D] in HBM (ANY)
    # outputs
    o_ref,    # [G, Hq, D] VMEM block
    # scratch
    kbuf,     # [2, G, PP, S, 2Hkv, D] VMEM
    sem,      # [2, G, PP] DMA semaphores
    *,
    G: int,
    PP: int,
    S: int,
    hkv: int,
    group: int,
    sm_scale: float,
    num_blocks: int,
):
    i = pl.program_id(0)

    # Per-page DMA skip: pages at or beyond a sequence's kv_len are never
    # fetched, so a loose (power-of-two) PP hint costs no HBM bandwidth
    # and short sequences in a mixed batch fetch only their own pages.
    # Skipped pages leave stale/uninitialized VMEM, which the compute
    # below zeroes row-wise before the PV dot (0 * NaN would poison it).
    def start_fetch(slot, blk):
        for g in range(G):
            ln = len_ref[blk * G + g]
            for p in range(PP):
                @pl.when(p * S < ln)
                def _():
                    pid = pt_ref[blk * G + g, p]
                    pltpu.make_async_copy(
                        kv_hbm.at[pid], kbuf.at[slot, g, p],
                        sem.at[slot, g, p]
                    ).start()

    @pl.when(i == 0)
    def _():
        start_fetch(0, 0)

    @pl.when(i + 1 < num_blocks)
    def _():
        start_fetch((i + 1) % 2, i + 1)

    slot = i % 2
    for g in range(G):
        ln = len_ref[i * G + g]
        for p in range(PP):
            @pl.when(p * S < ln)
            def _():
                pltpu.make_async_copy(
                    kv_hbm.at[pt_ref[i * G + g, p]],
                    kbuf.at[slot, g, p],
                    sem.at[slot, g, p],
                ).wait()

            # skipped page: zero the scratch tile. Stale/uninitialized
            # VMEM could hold NaN bit patterns, and NaN survives the
            # softmax's zero probabilities through the PV dot (0*NaN).
            # A plain store lowers cleanly where a [ctx]-masked select
            # does not ("changeBitwidth when minor tiling is not 128").
            @pl.when(p * S >= ln)
            def _():
                kbuf[slot, g, p] = jnp.zeros(
                    kbuf.shape[3:], kbuf.dtype
                )

    # Block-diagonal Q trick: one [Hq, 2Hkv*D] x [2Hkv*D, CTX] dot scores
    # ALL kv heads at once. Row h' of Q_bd holds q[h'] in the column block
    # of its K head (2*(h'//group)) and zeros elsewhere, so the contraction
    # over the flattened (head, D) axis touches only that head's keys.
    # The PV dot reuses the same flattened kv tile; row h' then reads its
    # V head's column block (2*(h'//group)+1). This replaces G*Hkv tiny
    # [group, D] matmuls (which left the MXU idle) with 2 full-width dots
    # per sequence.
    ctx = PP * S
    hq = hkv * group
    pos = jax.lax.broadcasted_iota(jnp.int32, (1, ctx), 1)  # [1, CTX]
    for g in range(G):
        ln = len_ref[i * G + g]
        valid = pos < ln  # [1, CTX]
        kvb = _to_bf16(kbuf[slot, g].reshape(ctx, 2 * hkv * kbuf.shape[-1]))
        d = kbuf.shape[-1]
        wide = 2 * hkv * d
        row = jax.lax.broadcasted_iota(jnp.int32, (hq, wide), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (hq, wide), 1)
        qmask = (col // d == 2 * (row // group)).astype(jnp.bfloat16)
        qg = q_ref[g].astype(jnp.bfloat16)  # [Hq, D]
        qbd = jnp.concatenate([qg] * (2 * hkv), axis=1) * qmask
        s = jax.lax.dot_general(
            qbd, kvb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * sm_scale  # [Hq, CTX]
        s = jnp.where(valid, s, NEG_INF)
        m = jnp.max(s, axis=-1, keepdims=True)
        p_ = jnp.exp(s - m)
        denom = jnp.sum(p_, axis=-1, keepdims=True)
        o_wide = jax.lax.dot_general(
            p_.astype(jnp.bfloat16), kvb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / denom  # [Hq, 2Hkv*D]
        for h in range(hkv):
            o_ref[g, h * group:(h + 1) * group, :] = (
                o_wide[h * group:(h + 1) * group,
                       (2 * h + 1) * d:(2 * h + 2) * d].astype(o_ref.dtype))


@functools.partial(
    jax.jit,
    static_argnames=("sm_scale", "pages_hint", "group_size", "interpret"),
)
def decode_attention(
    q: jax.Array,          # [B, 1, Hq, D]
    kv_cache: jax.Array,   # [L, P, S, 2*Hkv, D]
    layer_idx,             # int or traced scalar
    page_table: jax.Array, # [B, PPS]
    kv_lens: jax.Array,    # [B]
    sm_scale: float,
    *,
    pages_hint: int,
    group_size: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """Batched decode attention over the paged KV pool. `pages_hint` is a
    static upper bound on pages per sequence (the scheduler passes the
    power-of-two cover of the longest context); sequences are processed
    `group_size` at a time per grid step."""
    b, t, hq, d = q.shape
    assert t == 1, "decode kernel handles t=1 only"
    nl, np_, s, two_hkv, _ = kv_cache.shape
    hkv = two_hkv // 2
    group = hq // hkv
    PP = pages_hint
    G = group_size
    # pad B to a multiple of G
    pad_b = (-b) % G
    if pad_b:
        q = jnp.concatenate([q, jnp.zeros((pad_b,) + q.shape[1:], q.dtype)], 0)
        page_table = jnp.concatenate(
            [page_table, jnp.zeros((pad_b, page_table.shape[1]),
                                   page_table.dtype)], 0)
        kv_lens = jnp.concatenate(
            [kv_lens, jnp.zeros((pad_b,), kv_lens.dtype)], 0)
    bb = b + pad_b
    num_blocks = bb // G

    kv_flat = kv_cache.reshape(nl * np_, s, two_hkv, d)
    pt = page_table[:, :PP].astype(jnp.int32) + (
        jnp.asarray(layer_idx, jnp.int32) * np_
    )
    q2 = q[:, 0]  # [BB, Hq, D]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((G, hq, d), lambda i, *_: (i, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((G, hq, d), lambda i, *_: (i, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((2, G, PP, s, two_hkv, d), kv_cache.dtype),
            pltpu.SemaphoreType.DMA((2, G, PP)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _decode_kernel, G=G, PP=PP, S=s, hkv=hkv, group=group,
            sm_scale=sm_scale, num_blocks=num_blocks,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((bb, hq, d), q.dtype),
        interpret=interpret,
    )(pt, kv_lens.astype(jnp.int32), q2, kv_flat)
    return out[:b, None]


def _write_kernel(slot_ref, rows_ref, kv_in, kv_out, sem, *, B, S):
    del kv_in  # aliased with kv_out; declared so XLA donates in place
    for b in range(B):
        sl = slot_ref[b]

        @pl.when(sl >= 0)
        def _():
            pltpu.make_async_copy(
                rows_ref.at[b], kv_out.at[sl // S, sl % S], sem.at[b]
            ).start()
    for b in range(B):
        sl = slot_ref[b]

        @pl.when(sl >= 0)
        def _():
            pltpu.make_async_copy(
                rows_ref.at[b], kv_out.at[sl // S, sl % S], sem.at[b]
            ).wait()


@functools.partial(jax.jit, static_argnames=("interpret",))
def write_kv_decode(
    kv_cache: jax.Array,  # [L, P, S, 2*Hkv, D]
    layer_idx,            # scalar int
    k: jax.Array,         # [B, 1, Hkv, D]
    v: jax.Array,         # [B, 1, Hkv, D]
    slot_ids: jax.Array,  # [B, 1] flat slots (page*S + off); -1 = skip
    interpret: bool = False,
) -> jax.Array:
    """Decode-step KV row write as direct VMEM->HBM DMAs (in-place via
    input/output aliasing). XLA lowers the equivalent scatter to ~0.4 ms
    per layer at bs=256 (6.3 ms per 16-layer step); issuing the 256 row
    copies from one kernel costs ~us-level DMA issue latency instead."""
    nl, p, s, two_hkv, d = kv_cache.shape
    b = k.shape[0]
    rows = jnp.stack([k[:, 0], v[:, 0]], axis=2).reshape(b, two_hkv, d)
    rows = rows.astype(kv_cache.dtype)
    sl = slot_ids[:, 0].astype(jnp.int32)
    sl = jnp.where(sl >= 0, sl + jnp.asarray(layer_idx, jnp.int32) * (p * s),
                   -1)
    kv_flat = kv_cache.reshape(nl * p, s, two_hkv, d)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((b, two_hkv, d), lambda i, *_: (0, 0, 0)),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((b,))],
    )
    out = pl.pallas_call(
        functools.partial(_write_kernel, B=b, S=s),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(kv_flat.shape, kv_cache.dtype),
        input_output_aliases={2: 0},
        interpret=interpret,
    )(sl, rows, kv_flat)
    return out.reshape(kv_cache.shape)
