"""Pipeline parallelism (GPipe schedule) over a "pp" mesh axis.

TPU-native re-design of the reference's pipeline parallelism
(srt/managers/scheduler_pp_mixin.py:47 event_loop_pp + PPProxyTensors p2p,
srt/distributed/parallel_state.py:1536 pp groups). The reference runs one
scheduler process per (pp_rank, tp_rank) and streams hidden states between
ranks with NCCL p2p. Here the whole pipeline lives inside ONE compiled XLA
step (single-controller SPMD):

- the stacked layer params [L, ...] are reshaped to [S, L/S, ...] and
  sharded over the "pp" mesh axis (so each pp shard holds its stage's
  layers; the reshape is layout-only);
- the KV cache [L, pages, ...] is likewise stage-sharded;
- per-stage in-flight "tasks" (hidden states + attention metadata) are a
  pytree with leading stage axis S; each tick runs all stages in parallel
  (vmap over the stage axis) and then SHIFTS the task tree down one stage
  with a concat — which XLA lowers to a collective-permute over ICI,
  replacing the reference's NCCL send/recv;
- a batch of B rows is split into M microbatches; the scan runs M + S - 1
  ticks (fill + drain). Bubble fraction (S-1)/(M+S-1), as GPipe.

The resulting forward has the same signature as the single-stage model
forward, so the engine's bucketed step / fused-decode machinery works
unchanged on top of it.
"""

from __future__ import annotations

import functools
from typing import Callable, Optional

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.layers.attention import AttentionMetadata


def pp_partition_specs(specs: dict, kv_spec=None):
    """Lift a model's partition specs to the pp mesh: layer stacks get their
    leading L axis sharded over "pp" (the in-forward reshape [L] -> [S, L/S]
    splits that axis, which GSPMD handles in-place)."""
    from jax.sharding import PartitionSpec as P

    def lift(node):
        if isinstance(node, dict):
            return {k: lift(v) for k, v in node.items()}
        if isinstance(node, P) and len(node) >= 1:
            return P("pp", *node[1:])
        return node

    out = dict(specs)
    out["layers"] = lift(specs["layers"])
    return out


def make_pp_forward(
    model_cls,
    cfg,
    attn_fn: Callable,
    pp_size: int,
    num_microbatches: Optional[int] = None,
    logits_mode: str = "last",
):
    """Build a pipelined forward(params, input_ids, positions, kv_cache, meta)
    -> (logits, new_kv_cache), semantics-identical to the plain forward."""
    S = pp_size
    M = num_microbatches or S
    L = cfg.num_hidden_layers
    assert L % S == 0, f"num_hidden_layers {L} must divide pp_size {S}"
    local_l = L // S
    assert logits_mode == "last", "pp forward supports logits_mode='last'"

    layer_body = model_cls.make_layer_body(cfg, attn_fn)
    embed, head = model_cls.make_embed_and_head(cfg)

    def stage_apply(layers_s, hidden, kv_s, positions, meta: AttentionMetadata):
        """Run one stage's local layers (vmapped over the stage axis)."""

        def body(l, carry):
            h, kv = carry
            return layer_body(l, h, kv, layers_s, positions, meta)

        return jax.lax.fori_loop(0, local_l, body, (hidden, kv_s))

    def forward(params, input_ids, positions, kv_cache, meta: AttentionMetadata,
                lora_tree=None, lora_ids=None):
        b, t = input_ids.shape
        assert b % M == 0, f"batch {b} must divide into {M} microbatches"
        mb = b // M

        layers_pp = jax.tree.map(
            lambda x: x.reshape(S, local_l, *x.shape[1:]), params["layers"]
        )
        kv_pp = kv_cache.reshape(S, local_l, *kv_cache.shape[1:])

        def mb_split(x):
            return x.reshape(M, mb, *x.shape[1:])

        tasks = {
            "input_ids": mb_split(input_ids),
            "positions": mb_split(positions),
            "page_table": mb_split(meta.page_table),
            "kv_lens": mb_split(meta.kv_lens),
            "q_start": mb_split(meta.q_start_pos),
            "slot_ids": mb_split(meta.slot_ids),
        }

        def task_at(tick):
            """Incoming stage-0 task at a tick; bubbles (tick >= M) carry
            slot_ids=-1 (dropped writes) and kv_lens=0 (masked attention)."""
            idx = jnp.minimum(tick, M - 1)
            valid = tick < M
            tk = jax.tree.map(lambda x: x[idx], tasks)
            tk["slot_ids"] = jnp.where(valid, tk["slot_ids"], -1)
            tk["kv_lens"] = jnp.where(valid, tk["kv_lens"], 0)
            return tk

        def make_state(tk):
            return {
                "hidden": embed(params, tk["input_ids"]),
                "positions": tk["positions"],
                "page_table": tk["page_table"],
                "kv_lens": tk["kv_lens"],
                "q_start": tk["q_start"],
                "slot_ids": tk["slot_ids"],
            }

        # initial per-stage state: all bubbles
        dummy = jax.tree.map(
            lambda x: jnp.broadcast_to(x[None], (S, *x.shape)),
            make_state(task_at(jnp.asarray(M))),  # any bubble task
        )

        def tick_fn(carry, tick):
            state, kv_pp = carry
            incoming = make_state(task_at(tick))
            # shift down one stage: stage 0 <- incoming, stage s <- s-1.
            # On a pp-sharded leading axis XLA lowers this to ppermute.
            state = jax.tree.map(
                lambda inc, st: jnp.concatenate([inc[None], st[:-1]], axis=0),
                incoming,
                state,
            )
            meta_s = AttentionMetadata(
                page_table=state["page_table"],
                kv_lens=state["kv_lens"],
                q_start_pos=state["q_start"],
                slot_ids=state["slot_ids"],
                logit_idx=state["kv_lens"],  # unused inside layers
            )
            hidden, kv_pp = jax.vmap(
                stage_apply, in_axes=(0, 0, 0, 0, 0), out_axes=0
            )(layers_pp, state["hidden"], kv_pp, state["positions"], meta_s)
            state = dict(state, hidden=hidden)
            # collect the last stage's finished microbatch
            return (state, kv_pp), hidden[S - 1]

        (state, kv_pp), outs = jax.lax.scan(
            tick_fn, (dummy, kv_pp), jnp.arange(M + S - 1)
        )
        # tick S-1+i drains microbatch i
        hidden_all = outs[S - 1 :].reshape(b, t, cfg.hidden_size)

        h_out = hidden_all[jnp.arange(b), meta.logit_idx]  # [B, E]
        logits = head(params, h_out)
        new_kv = kv_pp.reshape(kv_cache.shape)
        return logits, new_kv

    return forward
