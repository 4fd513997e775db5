"""Multi-LoRA batching.

Reference analog: srt/lora/ (lora_manager.py adapter registry + GPU pool,
triton_ops batched LoRA matmuls). TPU design: adapters live stacked on
device as [A, L, ...] tensors (A = adapter slots; slot 0 is an all-zeros
"no adapter" identity). Each batch row carries a slot index; the model
gathers its row's A/B matrices and adds x @ Aᵀ @ Bᵀ to the base q/k/v/o
projections — one gather + two small einsums, no per-request kernels.

Checkpoint format: PEFT safetensors (base_model.model.model.layers.{i}.
self_attn.{q,k,v,o}_proj.lora_{A,B}.weight).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("lora")

TARGETS = ("wq", "wk", "wv", "wo")
_PEFT_NAMES = {"wq": "q_proj", "wk": "k_proj", "wv": "v_proj", "wo": "o_proj"}


class LoRAManager:
    def __init__(
        self,
        cfg: ModelConfig,
        max_adapters: int = 4,
        rank: int = 16,
        dtype=jnp.bfloat16,
    ):
        self.cfg = cfg
        self.rank = rank
        self.max_adapters = max_adapters
        self.dtype = dtype
        self._name_to_slot: Dict[str, int] = {}
        L = cfg.num_hidden_layers
        E = cfg.hidden_size
        Hq = cfg.num_attention_heads
        Hkv = cfg.num_key_value_heads
        D = cfg.actual_head_dim
        out_dims = {"wq": Hq * D, "wk": Hkv * D, "wv": Hkv * D, "wo": E}
        in_dims = {"wq": E, "wk": E, "wv": E, "wo": Hq * D}
        a = max_adapters + 1  # slot 0 = identity (zeros)
        self.weights: Dict[str, Dict[str, jax.Array]] = {
            t: {
                "a": jnp.zeros((a, L, in_dims[t], rank), dtype),
                "b": jnp.zeros((a, L, rank, out_dims[t]), dtype),
            }
            for t in TARGETS
        }
        self.scaling = np.ones((a,), np.float32)
        self._slot_rank = np.zeros((a,), np.int32)
        self._use_tick = 0
        self._last_used: Dict[int, int] = {}

    # ------------- registry -------------
    def slot_of(self, name: Optional[str]) -> int:
        if not name:
            return 0
        if name not in self._name_to_slot:
            raise KeyError(f"LoRA adapter {name!r} not loaded")
        slot = self._name_to_slot[name]
        self._use_tick += 1
        self._last_used[slot] = self._use_tick  # LRU bookkeeping
        return slot

    def _free_slot(self) -> int:
        """Next free slot, evicting the least-recently-used adapter when
        the pool is full (reference: srt/lora/lora_manager.py eviction /
        mem pool reuse)."""
        used = set(self._name_to_slot.values())
        for s in range(1, self.max_adapters + 1):
            if s not in used:
                return s
        victim = min(used, key=lambda s: self._last_used.get(s, 0))
        name = next(n for n, s in self._name_to_slot.items() if s == victim)
        logger.info("evicting LRU LoRA %s from slot %d", name, victim)
        self.unload_adapter(name)
        return victim

    def unload_adapter(self, name: str) -> None:
        """Free an adapter slot (reference: /unload_lora_adapter)."""
        slot = self._name_to_slot.pop(name)
        for t in TARGETS:
            self.weights[t]["a"] = self.weights[t]["a"].at[slot].set(0.0)
            self.weights[t]["b"] = self.weights[t]["b"].at[slot].set(0.0)
        self.scaling[slot] = 1.0
        self._slot_rank[slot] = 0
        self._last_used.pop(slot, None)

    def merge_adapters(self, new_name: str, components: Dict[str, float]) -> int:
        """Weighted adapter merge: delta = sum_i w_i * s_i * A_i B_i,
        represented EXACTLY by rank concatenation (A columns scaled by
        w_i * s_i, B rows stacked) as long as the summed ranks fit the
        pool rank. Lands in a fresh slot with scaling 1."""
        total_r = int(sum(self._slot_rank[self.slot_of(n)] for n in components))
        if total_r > self.rank:
            raise ValueError(
                f"merged rank {total_r} exceeds pool rank {self.rank}"
            )
        slot = self._free_slot()
        for t in TARGETS:
            a_cat, b_cat = [], []
            for n, w in components.items():
                s_i = self.slot_of(n)
                r_i = int(self._slot_rank[s_i])
                coeff = float(w) * float(self.scaling[s_i])
                a_cat.append(
                    np.asarray(self.weights[t]["a"][s_i, :, :, :r_i],
                               np.float32) * coeff
                )
                b_cat.append(
                    np.asarray(self.weights[t]["b"][s_i, :, :r_i, :],
                               np.float32)
                )
            a_np = np.concatenate(a_cat, axis=-1)  # [L, in, total_r]
            b_np = np.concatenate(b_cat, axis=-2)  # [L, total_r, out]
            self._set_target(slot, t, a_np, b_np, total_r)
        self.scaling[slot] = 1.0
        self._slot_rank[slot] = total_r
        self._name_to_slot[new_name] = slot
        self._use_tick += 1
        self._last_used[slot] = self._use_tick
        return slot

    def load_adapter(self, name: str, path: str) -> int:
        """Load a PEFT checkpoint directory into the next free slot."""
        if name in self._name_to_slot:
            return self._name_to_slot[name]
        slot = self._free_slot()
        with open(os.path.join(path, "adapter_config.json")) as f:
            acfg = json.load(f)
        r = acfg.get("r", self.rank)
        alpha = acfg.get("lora_alpha", r)
        assert r <= self.rank, f"adapter rank {r} > pool rank {self.rank}"
        from safetensors import safe_open

        fp = os.path.join(path, "adapter_model.safetensors")
        tensors = {}
        with safe_open(fp, framework="pt") as f:
            for k in f.keys():
                t = f.get_tensor(k)
                tensors[k] = t.float().numpy()
        self._install(slot, tensors, r)
        self.scaling[slot] = alpha / r
        self._slot_rank[slot] = r
        self._name_to_slot[name] = slot
        self._use_tick += 1
        self._last_used[slot] = self._use_tick
        logger.info("loaded LoRA %s into slot %d (r=%d)", name, slot, r)
        return slot

    def load_adapter_arrays(
        self, name: str, arrays: Dict[str, np.ndarray], rank: int, alpha: float
    ) -> int:
        """Test/RL hook: arrays keyed 'layers.{i}.{target}.{a|b}'."""
        slot = self._free_slot()
        L = self.cfg.num_hidden_layers
        for t in TARGETS:
            a_stack, b_stack = [], []
            for i in range(L):
                a_stack.append(arrays.get(f"layers.{i}.{t}.a"))
                b_stack.append(arrays.get(f"layers.{i}.{t}.b"))
            if a_stack[0] is None:
                continue
            self._set_target(slot, t, np.stack(a_stack), np.stack(b_stack), rank)
        self.scaling[slot] = alpha / rank
        self._slot_rank[slot] = rank
        self._name_to_slot[name] = slot
        self._use_tick += 1
        self._last_used[slot] = self._use_tick
        return slot

    def _install(self, slot: int, tensors: Dict[str, np.ndarray], r: int):
        L = self.cfg.num_hidden_layers
        for t in TARGETS:
            proj = _PEFT_NAMES[t]
            a_stack, b_stack = [], []
            found = False
            for i in range(L):
                ka = f"base_model.model.model.layers.{i}.self_attn.{proj}.lora_A.weight"
                kb = f"base_model.model.model.layers.{i}.self_attn.{proj}.lora_B.weight"
                if ka in tensors:
                    found = True
                    a_stack.append(tensors[ka].T)  # [E, r]
                    b_stack.append(tensors[kb].T)  # [r, out]
                else:
                    a_stack.append(None)
                    b_stack.append(None)
            if not found:
                continue
            in_dim = self.weights[t]["a"].shape[2]
            out_dim = self.weights[t]["b"].shape[3]
            a_np = np.stack(
                [x if x is not None else np.zeros((in_dim, r), np.float32) for x in a_stack]
            )
            b_np = np.stack(
                [x if x is not None else np.zeros((r, out_dim), np.float32) for x in b_stack]
            )
            self._set_target(slot, t, a_np, b_np, r)

    def _set_target(self, slot, t, a_np, b_np, r):
        a_pad = np.zeros(self.weights[t]["a"].shape[1:], np.float32)
        b_pad = np.zeros(self.weights[t]["b"].shape[1:], np.float32)
        a_pad[:, :, :r] = a_np
        b_pad[:, :r, :] = b_np
        self.weights[t]["a"] = self.weights[t]["a"].at[slot].set(
            jnp.asarray(a_pad, self.dtype)
        )
        self.weights[t]["b"] = self.weights[t]["b"].at[slot].set(
            jnp.asarray(b_pad, self.dtype)
        )

    # ------------- forward-side pytree -------------
    def batch_params(self) -> Dict[str, Any]:
        """The pytree handed to the model forward (adapter table + scaling)."""
        return {
            "targets": {t: dict(self.weights[t]) for t in TARGETS},
            "scaling": jnp.asarray(self.scaling),
        }


def apply_lora(x, base_out, lora_tree, target: str, lora_ids, layer_idx):
    """base_out [B, T, out] += scale_b * ((x @ A_b) @ B_b) for each row's
    adapter slot (slot 0 is zeros -> no-op)."""
    tw = lora_tree["targets"][target]
    a = tw["a"][lora_ids, layer_idx]  # [B, in, r]
    b = tw["b"][lora_ids, layer_idx]  # [B, r, out]
    scale = lora_tree["scaling"][lora_ids]  # [B]
    xr = jnp.einsum("bti,bir->btr", x, a)
    delta = jnp.einsum("btr,bro->bto", xr, b)
    return base_out + delta * scale[:, None, None].astype(base_out.dtype)
