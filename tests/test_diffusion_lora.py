"""Diffusion LoRA merge/unmerge (reference analog: multimodal_gen runtime
LoRA control requests + lora_pipeline.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.lora import LoRAAdapter, LoRAController
from sglang_diffusion_tpu.diffusion.pipeline import (
    DiffusionPipeline,
    GenerationParams,
)


def _adapter(pipe, seed=0, scale=1.0, rank=2):
    """Random adapter on the DiT qkv + final_out weights."""
    rng = np.random.default_rng(seed)
    blocks = pipe.params["dit"]["blocks"]["wqkv"]  # [L, E, 3E]
    L, E, O = blocks.shape
    fo = pipe.params["dit"]["final_out"]  # [E, patch_dim]
    w = {
        ("dit", "blocks", "wqkv"): (
            rng.standard_normal((L, E, rank)).astype(np.float32) * 0.05,
            rng.standard_normal((L, rank, O)).astype(np.float32) * 0.05,
        ),
        ("dit", "final_out"): (
            rng.standard_normal((fo.shape[0], rank)).astype(np.float32) * 0.05,
            rng.standard_normal((rank, fo.shape[1])).astype(np.float32) * 0.05,
        ),
    }
    return LoRAAdapter("test", w, scale)


def _gen(pipe):
    return pipe.forward(GenerationParams(
        prompt="x", height=32, width=32, num_inference_steps=3, seed=0,
    )).images


def test_merge_changes_output_and_unmerge_restores():
    pipe = DiffusionPipeline(dtype=jnp.float32)
    base = _gen(pipe)
    ad = _adapter(pipe)
    pipe.lora.load(ad)
    with_lora = _gen(pipe)
    assert not np.array_equal(base, with_lora)
    assert pipe.lora.list()[0]["name"] == "test"
    pipe.lora.unload("test")
    restored = _gen(pipe)
    # f32 merge/unmerge round-trip is numerically clean at uint8 resolution
    np.testing.assert_array_equal(base, restored)


def test_set_scale_interpolates():
    pipe = DiffusionPipeline(dtype=jnp.float32)
    w_before = np.asarray(pipe.params["dit"]["final_out"])
    ad = _adapter(pipe, scale=1.0)
    a, b = ad.weights[("dit", "final_out")]
    pipe.lora.load(ad)
    w1 = np.asarray(pipe.params["dit"]["final_out"])
    np.testing.assert_allclose(w1, w_before + a @ b, atol=1e-6)
    pipe.lora.set_scale("test", 2.0)
    w2 = np.asarray(pipe.params["dit"]["final_out"])
    np.testing.assert_allclose(w2, w_before + 2.0 * (a @ b), atol=1e-6)


def test_reload_replaces():
    pipe = DiffusionPipeline(dtype=jnp.float32)
    pipe.lora.load(_adapter(pipe, seed=1))
    pipe.lora.load(_adapter(pipe, seed=1, scale=0.5))  # same name
    assert len(pipe.lora.adapters) == 1
    assert pipe.lora.adapters["test"].scale == 0.5


def test_shape_mismatch_raises():
    pipe = DiffusionPipeline(dtype=jnp.float32)
    bad = LoRAAdapter("bad", {
        ("dit", "final_out"): (
            np.zeros((3, 2), np.float32), np.zeros((2, 5), np.float32),
        )
    })
    with pytest.raises(ValueError):
        pipe.lora.load(bad)
