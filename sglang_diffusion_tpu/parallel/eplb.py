"""EPLB: expert-parallel load balancing.

TPU-native analog of the reference's EPLB stack (srt/eplb/eplb_manager.py:16,
expert_distribution.py, expert_location_updater.py + the DeepSeek EPLB
algorithm in srt/eplb/eplb_algorithms/): record how many tokens each
logical expert receives, then compute a physical-slot layout that (a)
replicates hot experts onto spare slots and (b) packs experts onto EP ranks
so per-rank load is balanced. The router then maps logical expert ids to
physical slots (round-robin over replicas) before the all-to-all dispatch.

TPU design notes: the recorder is a device-side count vector accumulated
inside the compiled step (one scatter-add per MoE layer — no host sync);
rebalancing happens on host at a low cadence and produces (1) a gather
index over the stacked expert-weight axis and (2) a logical->physical
routing table, both plain arrays that feed the next step compile-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional, Tuple

import numpy as np


@dataclass
class ExpertLocationMetadata:
    """Physical layout of experts across EP slots.

    num_physical = num_ranks * slots_per_rank >= num_logical. Each physical
    slot hosts one logical expert; hot experts occupy several slots."""

    physical_to_logical: np.ndarray  # [num_physical] int32
    logical_to_physical: np.ndarray  # [num_logical, max_replicas] int32, -1 pad
    replica_counts: np.ndarray  # [num_logical] int32

    @property
    def num_physical(self) -> int:
        return len(self.physical_to_logical)

    def route(self, logical_ids: np.ndarray, salt: np.ndarray) -> np.ndarray:
        """Map logical expert ids to physical slots; `salt` (e.g. token index)
        spreads tokens across replicas round-robin."""
        r = self.replica_counts[logical_ids]
        which = salt % np.maximum(r, 1)
        return self.logical_to_physical[logical_ids, which]


def trivial_location(num_logical: int, num_physical: int) -> ExpertLocationMetadata:
    """Identity layout: logical i -> physical i; spare slots replicate the
    first experts (balanced by construction only if load is uniform)."""
    p2l = np.arange(num_physical, dtype=np.int32) % num_logical
    return _finish(p2l, num_logical)


def _finish(p2l: np.ndarray, num_logical: int) -> ExpertLocationMetadata:
    counts = np.bincount(p2l, minlength=num_logical).astype(np.int32)
    max_rep = max(1, int(counts.max()))
    l2p = np.full((num_logical, max_rep), -1, np.int32)
    fill = np.zeros(num_logical, np.int32)
    for phys, log in enumerate(p2l):
        l2p[log, fill[log]] = phys
        fill[log] += 1
    # experts with zero replicas would be unroutable — forbid by construction
    assert (counts > 0).all(), "every logical expert needs >= 1 physical slot"
    return ExpertLocationMetadata(
        physical_to_logical=p2l.astype(np.int32),
        logical_to_physical=l2p,
        replica_counts=counts,
    )


def rebalance_experts(
    load: np.ndarray,  # [num_logical] token counts (recorded distribution)
    num_ranks: int,
    slots_per_rank: int,
) -> ExpertLocationMetadata:
    """DeepSeek-EPLB-style rebalancing (reference:
    srt/eplb/eplb_algorithms/deepseek.py): greedy replication of the hottest
    experts onto spare slots (each replica halves its share), then
    longest-processing-time packing of replicas onto ranks so per-rank load
    is even."""
    num_logical = len(load)
    num_physical = num_ranks * slots_per_rank
    assert num_physical >= num_logical, (num_physical, num_logical)
    load = load.astype(np.float64) + 1e-9  # avoid zero-division, keep order

    # ---- step 1: decide replica counts (greedy: always split the replica
    # group with the highest per-replica load) ----
    replicas = np.ones(num_logical, np.int64)
    spare = num_physical - num_logical
    for _ in range(spare):
        per = load / replicas
        replicas[np.argmax(per)] += 1

    # ---- step 2: pack replicas onto ranks, heaviest first (LPT) ----
    items: List[Tuple[float, int]] = []  # (per-replica load, logical id)
    for e in range(num_logical):
        items.extend([(load[e] / replicas[e], e)] * int(replicas[e]))
    items.sort(reverse=True)
    rank_load = np.zeros(num_ranks, np.float64)
    rank_slots: List[List[int]] = [[] for _ in range(num_ranks)]
    for w, e in items:
        # among ranks with a free slot, pick the least loaded
        cands = [r for r in range(num_ranks) if len(rank_slots[r]) < slots_per_rank]
        r = min(cands, key=lambda r_: rank_load[r_])
        rank_slots[r].append(e)
        rank_load[r] += w
    p2l = np.concatenate([
        np.asarray(s, np.int32) for s in rank_slots
    ])
    return _finish(p2l, num_logical)


def balance_ratio(load: np.ndarray, meta: ExpertLocationMetadata,
                  num_ranks: int) -> float:
    """max rank load / mean rank load under layout `meta` (1.0 = perfect)."""
    per_replica = (
        load.astype(np.float64)[meta.physical_to_logical]
        / meta.replica_counts[meta.physical_to_logical]
    )
    slots_per_rank = meta.num_physical // num_ranks
    rank_load = per_replica.reshape(num_ranks, slots_per_rank).sum(axis=1)
    mean = rank_load.mean()
    return float(rank_load.max() / mean) if mean > 0 else 1.0


class ExpertDistributionRecorder:
    """Accumulates per-(layer, expert) token counts. The device-side hook
    returns an updated counts array from inside the compiled step; `snapshot`
    pulls to host and `reset` clears. (Reference:
    srt/eplb/expert_distribution.py.)"""

    def __init__(self, num_layers: int, num_experts: int):
        import jax.numpy as jnp

        self.counts = jnp.zeros((num_layers, num_experts), jnp.int32)

    def record(self, layer_idx, expert_ids):
        """expert_ids: int array of any shape with chosen logical experts.
        Call inside jit with the counts as a carry, or eagerly."""
        import jax.numpy as jnp

        flat = expert_ids.reshape(-1)
        self.counts = self.counts.at[layer_idx, flat].add(1, mode="drop")
        return self.counts

    def snapshot(self) -> np.ndarray:
        return np.asarray(self.counts)

    def reset(self) -> None:
        import jax.numpy as jnp

        self.counts = jnp.zeros_like(self.counts)


def permute_expert_weights(w: np.ndarray, meta: ExpertLocationMetadata,
                           old: Optional[ExpertLocationMetadata] = None):
    """Physical expert-weight layout for stacked weights [..., E_axis, ...]
    where the expert axis is axis -3 or given by shape match. Here we use the
    convention of stacked MoE weights [L, E, K, N]: returns [L, P, K, N]
    gathered by physical_to_logical (replicas duplicate the weight; under EP
    sharding each rank holds only its slots_per_rank slice). (Reference:
    srt/eplb/expert_location_updater.py.)"""
    return np.take(w, meta.physical_to_logical, axis=1)
