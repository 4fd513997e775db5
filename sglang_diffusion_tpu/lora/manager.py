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

    # ------------- registry -------------
    def slot_of(self, name: Optional[str]) -> int:
        if not name:
            return 0
        if name not in self._name_to_slot:
            raise KeyError(f"LoRA adapter {name!r} not loaded")
        return self._name_to_slot[name]

    def load_adapter(self, name: str, path: str) -> int:
        """Load a PEFT checkpoint directory into the next free slot."""
        if name in self._name_to_slot:
            return self._name_to_slot[name]
        slot = len(self._name_to_slot) + 1
        if slot > self.max_adapters:
            raise RuntimeError("no free LoRA slots (eviction lands later)")
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
        self._name_to_slot[name] = slot
        logger.info("loaded LoRA %s into slot %d (r=%d)", name, slot, r)
        return slot

    def load_adapter_arrays(
        self, name: str, arrays: Dict[str, np.ndarray], rank: int, alpha: float
    ) -> int:
        """Test/RL hook: arrays keyed 'layers.{i}.{target}.{a|b}'."""
        slot = len(self._name_to_slot) + 1
        if slot > self.max_adapters:
            raise RuntimeError("no free LoRA slots")
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
        self._name_to_slot[name] = slot
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
