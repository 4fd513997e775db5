"""USP: unified sequence parallelism for diffusion attention.

Reference analog: multimodal_gen/runtime/layers/usp.py:36-160 (Ulysses
head<->sequence all-to-all) and :161 (ring attention). TPU-native: the
all-to-alls are jax.lax.all_to_all inside shard_map over the "sp" mesh
axis and ride ICI; ring attention (for sp degrees beyond the head count)
uses jax.lax.ppermute block passing.

Layout contract: tokens are sharded [B, T/sp, H, D] on entry; Ulysses
reshards to [B, T, H/sp, D], runs local full attention, and reshards back.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from sglang_diffusion_tpu.diffusion.models.dit import joint_attention

SP_AXIS = "sp"


def ulysses_attention(q, k, v, sm_scale, mesh, axis: str = SP_AXIS):
    """q/k/v [B, T, H, D] sharded P(None, axis, None, None) on the token
    axis. Returns output with the same sharding."""
    if mesh is None or mesh.shape.get(axis, 1) == 1:
        return joint_attention(q, k, v, sm_scale)
    n = mesh.shape[axis]
    if q.shape[1] % n != 0 or q.shape[2] % n != 0:
        # Ulysses needs both seq and heads divisible by sp; fall back
        # (the reference pads; padding needs masked attention — later round)
        return joint_attention(q, k, v, sm_scale)

    from jax import shard_map

    spec = P(None, axis, None, None)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def inner(q_l, k_l, v_l):
        # [B, T/sp, H, D] -> [B, T, H/sp, D]
        def scatter_heads(x):
            return jax.lax.all_to_all(
                x, axis, split_axis=2, concat_axis=1, tiled=True
            )

        def gather_heads(x):
            return jax.lax.all_to_all(
                x, axis, split_axis=1, concat_axis=2, tiled=True
            )

        qh = scatter_heads(q_l)
        kh = scatter_heads(k_l)
        vh = scatter_heads(v_l)
        out = joint_attention(qh, kh, vh, sm_scale)
        return gather_heads(out)

    return inner(q, k, v)


def ring_attention(q, k, v, sm_scale, mesh, axis: str = SP_AXIS):
    """Ring attention over the sp axis: K/V blocks rotate via ppermute while
    each shard accumulates online-softmax partial results for its q block.
    Bidirectional (non-causal) — diffusion attention has no causal mask."""
    if mesh is None or mesh.shape.get(axis, 1) == 1:
        return joint_attention(q, k, v, sm_scale)

    from jax import shard_map

    spec = P(None, axis, None, None)
    n = mesh.shape[axis]

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=spec,
        check_vma=False,
    )
    def inner(q_l, k_l, v_l):
        b, t, h, d = q_l.shape
        qf = q_l.astype(jnp.float32)

        def partial_attn(k_blk, v_blk):
            s = jnp.einsum("bthd,bshd->bhts", qf, k_blk.astype(jnp.float32))
            s = s * sm_scale
            m = jnp.max(s, axis=-1, keepdims=True)  # [B,H,T,1]
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            o = jnp.einsum("bhts,bshd->bthd", p, v_blk.astype(jnp.float32))
            return m, l, o

        perm = [(i, (i + 1) % n) for i in range(n)]

        def body(carry, _):
            k_blk, v_blk, m_acc, l_acc, o_acc = carry
            m_b, l_b, o_b = partial_attn(k_blk, v_blk)
            m_new = jnp.maximum(m_acc, m_b)
            a_old = jnp.exp(m_acc - m_new)
            a_new = jnp.exp(m_b - m_new)
            # reshape [B,H,T,1] factors to [B,T,H,1] for o accumulation
            ao = jnp.transpose(a_old, (0, 2, 1, 3))
            an = jnp.transpose(a_new, (0, 2, 1, 3))
            o_acc = o_acc * ao + o_b * an
            l_acc = l_acc * a_old + l_b * a_new
            m_acc = m_new
            k_blk = jax.lax.ppermute(k_blk, axis, perm)
            v_blk = jax.lax.ppermute(v_blk, axis, perm)
            return (k_blk, v_blk, m_acc, l_acc, o_acc), None

        m0 = jnp.full((b, h, t, 1), -1e30, jnp.float32)
        l0 = jnp.zeros((b, h, t, 1), jnp.float32)
        o0 = jnp.zeros((b, t, h, d), jnp.float32)
        (k_f, v_f, m_f, l_f, o_f), _ = jax.lax.scan(
            body, (k_l, v_l, m0, l0, o0), None, length=n
        )
        l_t = jnp.transpose(l_f, (0, 2, 1, 3))  # [B,T,H,1]
        return (o_f / jnp.maximum(l_t, 1e-30)).astype(q_l.dtype)

    return inner(q, k, v)
