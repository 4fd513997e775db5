"""Device mesh and sharding context.

TPU-native replacement for the reference's process-group machinery
(reference: srt/distributed/parallel_state.py:193 GroupCoordinator,
:1614 init_distributed_environment, :1683 initialize_model_parallel).

Where the reference creates NCCL process groups (world/TP/PP/DP/EP/attn-DP…)
and routes collectives through pynccl / custom CUDA-IPC allreduce, the TPU
build is single-controller SPMD: we build one `jax.sharding.Mesh` with named
axes and annotate arrays with `NamedSharding`; XLA inserts the collectives
over ICI. There are no process groups, no custom allreduce, no shm broadcast.

Axis names:
  "dp"  - data parallel (batch dim of the running batch)
  "tp"  - tensor parallel (attention heads / MLP ffn dim / vocab)
For MoE, experts are sharded over "tp" (expert-parallel reuses the same axis
slice, matching the reference's decoupled moe groups conceptually).
For diffusion, additional axes "sp" (sequence / Ulysses×ring) and "cfg"
are created by the diffusion runtime (see diffusion/parallel.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DP_AXIS = "dp"
TP_AXIS = "tp"
PP_AXIS = "pp"


@dataclasses.dataclass
class MeshContext:
    mesh: Mesh
    dp_size: int
    tp_size: int
    pp_size: int = 1

    # Common shardings -------------------------------------------------
    def sharding(self, *spec) -> NamedSharding:
        return NamedSharding(self.mesh, P(*spec))

    @property
    def replicated(self) -> NamedSharding:
        return NamedSharding(self.mesh, P())

    @property
    def data_sharding(self) -> NamedSharding:
        """Batch dim sharded over dp."""
        return NamedSharding(self.mesh, P(DP_AXIS))

    @property
    def kv_sharding(self) -> NamedSharding:
        """KV cache [layers, pages, page_size, 2*kv_heads, dim]: heads over
        tp; with pipeline parallelism the layer axis is stage-sharded."""
        layer_axis = PP_AXIS if self.pp_size > 1 else None
        return NamedSharding(self.mesh, P(layer_axis, None, None, TP_AXIS, None))

    def kv_sharding_for(self, kv_heads: int, num_pages: int,
                        dp_attention: bool = False,
                        attn_tp: bool = False) -> NamedSharding:
        """KV sharding that accounts for the model's cache geometry:

        - dp_attention: shard the PAGE axis over every device — each rank
          holds a slice of the pool with FULL heads (reference analog: one
          KV pool per attn-DP rank, srt/layers/dp_attention.py).
        - MLA (kv_heads == 1) or head count not divisible by tp: the head
          axis cannot shard; replicate (motivates dp_attention for MLA).
        - otherwise the default head-sharded layout."""
        layer_axis = PP_AXIS if self.pp_size > 1 else None
        n_dev = self.dp_size * self.tp_size
        if attn_tp and num_pages % self.dp_size == 0:
            # attn-TP: pages over the attention-DP axis, heads over the
            # attn-TP axis (reference: sub-TP attention groups,
            # parallel_state.py:1496)
            head_axis = TP_AXIS if (2 * kv_heads) % self.tp_size == 0                 and kv_heads > 1 else None
            return NamedSharding(
                self.mesh,
                P(layer_axis, DP_AXIS, None, head_axis, None),
            )
        if dp_attention and num_pages % n_dev == 0:
            return NamedSharding(
                self.mesh, P(layer_axis, (DP_AXIS, TP_AXIS), None, None, None)
            )
        if kv_heads % self.tp_size != 0:
            return NamedSharding(self.mesh, P(layer_axis, None, None, None, None))
        return self.kv_sharding


def create_mesh(
    tp_size: int = 1,
    dp_size: int = 1,
    pp_size: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> MeshContext:
    if devices is None:
        devices = jax.devices()
    n = tp_size * dp_size * pp_size
    if len(devices) < n:
        raise ValueError(
            f"need {n} devices for pp={pp_size} x dp={dp_size} x tp={tp_size},"
            f" have {len(devices)}"
        )
    if pp_size > 1:
        arr = np.array(devices[:n]).reshape(pp_size, dp_size, tp_size)
        mesh = Mesh(arr, (PP_AXIS, DP_AXIS, TP_AXIS))
    else:
        arr = np.array(devices[:n]).reshape(dp_size, tp_size)
        mesh = Mesh(arr, (DP_AXIS, TP_AXIS))
    return MeshContext(mesh=mesh, dp_size=dp_size, tp_size=tp_size,
                       pp_size=pp_size)


_MESH_CONTEXT: Optional[MeshContext] = None


def set_mesh_context(ctx: MeshContext) -> None:
    global _MESH_CONTEXT
    _MESH_CONTEXT = ctx


def get_mesh_context() -> MeshContext:
    global _MESH_CONTEXT
    if _MESH_CONTEXT is None:
        _MESH_CONTEXT = create_mesh(tp_size=1, dp_size=1)
    return _MESH_CONTEXT
