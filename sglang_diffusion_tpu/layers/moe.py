"""MoE execution paths: grouped-GEMM token dispatch + expert parallelism.

TPU-native re-design of the reference MoE stack (srt/layers/moe/: fused
Triton/cutlass grouped GEMMs, ep_moe/ layers, token_dispatcher/deepep.py).
Three paths, in increasing parallelism:

1. moe_mlp_dense  — all-expert compute + weighted combine. O(X) FLOPs but
   simple and exact; the correctness baseline (and best at tiny batch).
2. moe_mlp_grouped — top-k token dispatch via sort + jax.lax.ragged_dot
   (XLA's grouped GEMM, which tiles each expert's row-group onto the MXU).
   O(k) FLOPs per token. Single-device or GSPMD-replicated experts.
3. make_ep_moe — expert parallelism via shard_map over an "ep" mesh axis:
   each shard routes its local tokens, packs per-destination capacity
   buffers, exchanges them with ONE all_to_all over ICI (the reference's
   DeepEP dispatch analog), runs the local grouped GEMM, and returns
   outputs with a second all_to_all. Capacity-dropped replicas contribute
   zero, exactly like capacity-factor MoE training stacks; capacity_factor
   is configurable and defaults high enough that drops are rare at
   inference batch sizes.

Router numerics (softmax over top-k logits) match srt/models/mixtral.py.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def moe_mlp_dense(h, w_router, w_gate, w_up, w_down, top_k: int):
    """All-expert compute + weighted combine (correctness baseline)."""
    x_experts = w_gate.shape[0]
    router_logits = jnp.dot(h, w_router).astype(jnp.float32)  # [B,T,X]
    topv, topi = jax.lax.top_k(router_logits, top_k)
    weights = jax.nn.softmax(topv, axis=-1)  # [B,T,k]
    onehot = jax.nn.one_hot(topi, x_experts, dtype=jnp.float32)  # [B,T,k,X]
    dense_w = jnp.einsum("btk,btkx->btx", weights, onehot)  # [B,T,X]
    gate = jnp.einsum("bte,xef->xbtf", h, w_gate)
    up = jnp.einsum("bte,xef->xbtf", h, w_up)
    y = jnp.einsum("xbtf,xfe->xbte", jax.nn.silu(gate) * up, w_down)
    out = jnp.einsum("xbte,btx->bte", y.astype(jnp.float32), dense_w)
    return out.astype(h.dtype)


def _route(h2, w_router, top_k):
    """h2 [N, E] -> (expert ids [N,k] int32, weights [N,k] f32)."""
    logits = jnp.dot(h2, w_router).astype(jnp.float32)
    topv, topi = jax.lax.top_k(logits, top_k)
    return topi.astype(jnp.int32), jax.nn.softmax(topv, axis=-1)


def _grouped_expert_ffn(xs, expert_ids, w_gate, w_up, w_down, num_experts):
    """Grouped GEMM over token replicas.

    xs [N, E] rows with expert assignment expert_ids [N] (int32; id >=
    num_experts means "dropped", contributes zero). Returns [N, E] outputs
    in the SAME row order. Sorts rows by expert, runs ragged_dot per
    projection, unsorts."""
    valid = expert_ids < num_experts
    # clamp dropped rows into the last group so sum(group_sizes) == N (the
    # ragged_dot contract); their outputs are zeroed below
    ids_c = jnp.where(valid, expert_ids, num_experts - 1)
    order = jnp.argsort(ids_c)  # stable
    xs_sorted = jnp.take(xs, order, axis=0)
    sorted_ids = jnp.take(ids_c, order, axis=0)
    group_sizes = jnp.bincount(sorted_ids, length=num_experts).astype(jnp.int32)

    gate = jax.lax.ragged_dot(xs_sorted, w_gate, group_sizes)
    up = jax.lax.ragged_dot(xs_sorted, w_up, group_sizes)
    y = jax.lax.ragged_dot((jax.nn.silu(gate) * up).astype(xs.dtype),
                           w_down, group_sizes)
    sorted_valid = jnp.take(valid, order, axis=0)
    y = jnp.where(sorted_valid[:, None], y, 0.0)
    inv = jnp.argsort(order)
    return jnp.take(y, inv, axis=0)


def apply_experts_grouped(h2, ids, weights, w_gate, w_up, w_down):
    """Apply routed experts via grouped GEMM to pre-routed tokens.

    h2 [N, E], ids [N, k] int32, weights [N, k] f32 -> [N, E]."""
    n, e = h2.shape
    top_k = ids.shape[1]
    num_experts = w_gate.shape[0]
    xs = jnp.repeat(h2, top_k, axis=0)  # replicas [N*k, E] (token-major)
    ys = _grouped_expert_ffn(xs, ids.reshape(-1), w_gate, w_up, w_down,
                             num_experts)
    ys = ys.reshape(n, top_k, e).astype(jnp.float32)
    return jnp.einsum("nke,nk->ne", ys, weights)


def moe_mlp_grouped(h, w_router, w_gate, w_up, w_down, top_k: int):
    """Top-k dispatch + grouped GEMM (sort + ragged_dot). Same numerics as
    moe_mlp_dense up to f32 summation order."""
    b, t, e = h.shape
    h2 = h.reshape(b * t, e)
    ids, weights = _route(h2, w_router, top_k)  # [N,k]
    out = apply_experts_grouped(h2, ids, weights, w_gate, w_up, w_down)
    return out.reshape(b, t, e).astype(h.dtype)


def deepseek_route(h2, w_router, e_bias, cfg):
    """DeepSeek v2/v3 router (reference: srt/layers/moe/topk.py noaux_tc;
    HF DeepseekV3TopkRouter numerics): sigmoid (v3) / softmax (v2) scoring,
    +bias for CHOICE only, group-limited top-k, original scores as weights,
    optional normalization, routed_scaling_factor.

    h2 [N, E] -> (ids [N, k] int32, weights [N, k] f32)."""
    x = cfg.num_experts
    k = cfg.num_experts_per_tok
    logits = jnp.dot(h2.astype(jnp.float32), w_router.astype(jnp.float32))
    if cfg.scoring_func == "sigmoid":
        scores = jax.nn.sigmoid(logits)
    else:
        scores = jax.nn.softmax(logits, axis=-1)
    choice = scores + (e_bias[None, :] if e_bias is not None else 0.0)
    if cfg.n_group > 1:
        n = h2.shape[0]
        per_group = x // cfg.n_group
        grouped = choice.reshape(n, cfg.n_group, per_group)
        top2, _ = jax.lax.top_k(grouped, min(2, per_group))
        group_scores = top2.sum(axis=-1)  # [N, G]
        _, group_idx = jax.lax.top_k(group_scores, cfg.topk_group)
        group_mask = jnp.zeros_like(group_scores).at[
            jnp.arange(n)[:, None], group_idx
        ].set(1.0)
        choice = jnp.where(
            jnp.repeat(group_mask, per_group, axis=-1) > 0, choice, 0.0
        )
    _, ids = jax.lax.top_k(choice, k)
    weights = jnp.take_along_axis(scores, ids, axis=-1)
    if cfg.norm_topk_prob:
        weights = weights / (weights.sum(axis=-1, keepdims=True) + 1e-20)
    weights = weights * cfg.routed_scaling_factor
    return ids.astype(jnp.int32), weights


def make_ep_moe(mesh, top_k: int, num_experts: int, ep_axis: str = "tp",
                batch_axis: str = "dp", capacity_factor: float = 2.0):
    """Expert-parallel MoE over `ep_axis`: returns fn(h, w_router, w_gate,
    w_up, w_down) with experts sharded on their leading axis.

    Dispatch (reference analog: srt/layers/moe/token_dispatcher/deepep.py
    normal dispatch): per shard, pack top-k replicas into per-destination
    capacity buffers, one all_to_all out, local grouped GEMM, one
    all_to_all back, weighted combine. Static shapes throughout.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    S = mesh.shape[ep_axis]
    assert num_experts % S == 0, (num_experts, S)
    local_x = num_experts // S

    def local_fn(h, w_router, w_gate, w_up, w_down, active_ranks):
        b, t, e = h.shape  # local batch rows
        n = b * t
        h2 = h.reshape(n, e)
        # elastic EP (reference: srt/elastic_ep/ + active-ranks tensors,
        # scheduler.py:2458-2470): experts on dead ranks are removed from
        # routing by masking their logits before top-k, so traffic flows
        # around the failure without a recompile (same routing math as
        # _route otherwise: top-k then softmax over the kept logits)
        logits = jnp.dot(h2, w_router).astype(jnp.float32)
        expert_alive = jnp.repeat(active_ranks, local_x)  # [num_experts]
        logits = jnp.where(expert_alive[None, :], logits, -1e30)
        topv, topi = jax.lax.top_k(logits, top_k)
        ids = topi.astype(jnp.int32)
        weights = jax.nn.softmax(topv, axis=-1)
        flat_ids = ids.reshape(-1)  # [n*k]
        dest = flat_ids // local_x  # destination shard per replica
        cap = int(np.ceil(n * top_k / S * capacity_factor))
        # pad capacity to a sublane-friendly multiple
        cap = max(8, ((cap + 7) // 8) * 8)

        # rank of each replica within its destination group (stable by
        # construction: argsort(dest) then position within run)
        order = jnp.argsort(dest)  # [n*k]
        sorted_dest = jnp.take(dest, order)
        pos_in_group = jnp.arange(n * top_k) - jnp.searchsorted(
            sorted_dest, sorted_dest, side="left"
        )
        # scatter rank back to replica order
        rank = jnp.zeros((n * top_k,), jnp.int32).at[order].set(
            pos_in_group.astype(jnp.int32)
        )
        keep = rank < cap  # capacity-dropped replicas contribute zero

        # pack send buffers [S, cap, ...]
        slot = jnp.where(keep, dest * cap + rank, S * cap)  # overflow -> drop
        send_x = jnp.zeros((S * cap + 1, e), h2.dtype).at[slot].set(
            jnp.repeat(h2, top_k, axis=0), mode="drop"
        )[:-1].reshape(S, cap, e)
        send_eid = jnp.full((S * cap + 1,), local_x, jnp.int32).at[slot].set(
            flat_ids % local_x, mode="drop"
        )[:-1].reshape(S, cap)
        # remember where each replica went so we can gather results back
        # (slot within [S, cap] or S*cap if dropped)
        replica_slot = jnp.where(keep, slot, S * cap)

        # exchange: recv[s] = what shard s sent to us
        recv_x = jax.lax.all_to_all(send_x, ep_axis, 0, 0, tiled=False)
        recv_eid = jax.lax.all_to_all(send_eid, ep_axis, 0, 0, tiled=False)

        # local experts on received tokens
        ys = _grouped_expert_ffn(
            recv_x.reshape(S * cap, e), recv_eid.reshape(S * cap),
            w_gate, w_up, w_down, local_x,
        ).reshape(S, cap, e)

        # send results back
        back = jax.lax.all_to_all(ys, ep_axis, 0, 0, tiled=False)  # [S, cap, e]
        back_flat = jnp.concatenate(
            [back.reshape(S * cap, e), jnp.zeros((1, e), back.dtype)], axis=0
        )
        y_rep = jnp.take(back_flat, replica_slot, axis=0)  # [n*k, E]
        y_rep = y_rep.reshape(n, top_k, e).astype(jnp.float32)
        out = jnp.einsum("nke,nk->ne", y_rep, weights)
        return out.reshape(b, t, e).astype(h.dtype)

    axes = dict(mesh.shape)
    batch_spec = P(batch_axis) if batch_axis in axes else P()
    expert_spec = P(ep_axis)

    inner = shard_map(
        local_fn,
        mesh=mesh,
        in_specs=(batch_spec, P(), expert_spec, expert_spec, expert_spec,
                  P()),
        out_specs=batch_spec,
        check_vma=False,
    )

    def fn(h, w_router, w_gate, w_up, w_down, active_ranks=None):
        if active_ranks is None:
            active_ranks = jnp.ones((S,), bool)
        return inner(h, w_router, w_gate, w_up, w_down, active_ranks)

    return fn
