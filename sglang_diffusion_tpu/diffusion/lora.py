"""Diffusion LoRA: runtime merge/unmerge of low-rank adapters into the
pipeline's param tree.

Reference analog: multimodal_gen LoRA control requests (merge/unmerge/set
at runtime via pipelines_core/lora_pipeline.py + lora_format_adapter.py).
TPU design: adapters merge INTO the weights (w += scale * A @ B) so the
denoise scan's compiled step is unchanged — no per-step gather; unmerge
recomputes w -= scale * A @ B (no base-weight copy held). Stacked-block
leaves [L, in, out] take stacked adapters [L, in, r] x [L, r, out].
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("diffusion_lora")


def _delta(a: jax.Array, b: jax.Array, scale: float) -> jax.Array:
    if a.ndim == 2:  # [in, r] x [r, out]
        return scale * (a @ b)
    # stacked blocks: [L, in, r] x [L, r, out]
    return scale * jnp.einsum("lik,lko->lio", a, b)


def _get_leaf(tree: Dict[str, Any], path: Tuple[str, ...]):
    node = tree
    for k in path[:-1]:
        node = node[k]
    return node, path[-1]


class LoRAAdapter:
    """One named adapter: {param_path: (A, B)} low-rank pairs."""

    def __init__(self, name: str, weights: Dict[Tuple[str, ...], Tuple],
                 scale: float = 1.0):
        self.name = name
        self.weights = weights
        self.scale = scale
        self.merged = False

    @classmethod
    def from_flat(cls, name: str, flat: Dict[str, Tuple], scale: float = 1.0):
        """Paths as "a/b/c" strings (the HTTP-facing format)."""
        return cls(
            name, {tuple(k.split("/")): v for k, v in flat.items()}, scale
        )


class LoRAController:
    """Attached to a DiffusionPipeline; mutates pipeline.params in place.
    Merge math runs jitted on device (weights never leave HBM)."""

    def __init__(self, pipeline):
        self.pipeline = pipeline
        self.adapters: Dict[str, LoRAAdapter] = {}

    def load(self, adapter: LoRAAdapter) -> None:
        if adapter.name in self.adapters:
            self.unload(adapter.name)
        self._apply(adapter, sign=+1.0)
        adapter.merged = True
        self.adapters[adapter.name] = adapter
        logger.info("merged lora %s (%d tensors, scale=%.2f)",
                    adapter.name, len(adapter.weights), adapter.scale)

    def unload(self, name: str) -> bool:
        ad = self.adapters.pop(name, None)
        if ad is None or not ad.merged:
            return False
        self._apply(ad, sign=-1.0)
        ad.merged = False
        return True

    def set_scale(self, name: str, scale: float) -> bool:
        """Re-merge at a new strength (unmerge old, merge new)."""
        ad = self.adapters.get(name)
        if ad is None:
            return False
        self._apply(ad, sign=-1.0)
        ad.scale = scale
        self._apply(ad, sign=+1.0)
        return True

    def list(self):
        return [
            {"name": a.name, "scale": a.scale, "tensors": len(a.weights)}
            for a in self.adapters.values()
        ]

    def _apply(self, adapter: LoRAAdapter, sign: float) -> None:
        params = self.pipeline.params
        for path, (a, b) in adapter.weights.items():
            node, leaf = _get_leaf(params, path)
            w = node[leaf]
            d = _delta(jnp.asarray(a, w.dtype), jnp.asarray(b, w.dtype),
                       sign * adapter.scale)
            if d.shape != w.shape:
                raise ValueError(
                    f"lora delta shape {d.shape} != weight {w.shape} at "
                    f"{'/'.join(path)}"
                )
            node[leaf] = (w + d.astype(w.dtype)).block_until_ready() \
                if hasattr(w, "block_until_ready") else w + d
