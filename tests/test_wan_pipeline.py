"""Wan family pipeline e2e (reference analog: pipelines/wan_pipeline.py):
T2V generation through the staged pipeline with the compiled denoise scan,
TeaCache/Cache-DiT compatibility, UniPC sampler."""

import numpy as np
import jax.numpy as jnp
import pytest

from sglang_diffusion_tpu.diffusion.pipeline import GenerationParams
from sglang_diffusion_tpu.diffusion.wan_pipeline import (
    WanVideoPipeline,
    tiny_wan_config,
)


@pytest.fixture(scope="module")
def pipe():
    return WanVideoPipeline(wan_cfg=tiny_wan_config(), dtype=jnp.float32)


def test_wan_t2v_e2e(pipe):
    out = pipe.forward(GenerationParams(
        prompt="a cat surfing", height=32, width=32, num_frames=4,
        num_inference_steps=3, seed=0, sampler="unipc",
    ))
    assert out.images.shape == (1, 4, 32, 32, 3)
    assert out.images.dtype == np.uint8
    # deterministic given seed
    out2 = pipe.forward(GenerationParams(
        prompt="a cat surfing", height=32, width=32, num_frames=4,
        num_inference_steps=3, seed=0, sampler="unipc",
    ))
    np.testing.assert_array_equal(out.images, out2.images)


def test_wan_cfg_guidance(pipe):
    out = pipe.forward(GenerationParams(
        prompt="a dog", negative_prompt="blurry", height=32, width=32,
        num_frames=4, num_inference_steps=2, guidance_scale=3.0, seed=1,
    ))
    assert out.images.shape == (1, 4, 32, 32, 3)


def test_wan_teacache():
    from sglang_diffusion_tpu.diffusion.cache import TeaCacheConfig

    p = WanVideoPipeline(wan_cfg=tiny_wan_config(), dtype=jnp.float32,
                         teacache=TeaCacheConfig(enabled=True, threshold=1e9))
    out = p.forward(GenerationParams(
        prompt="x", height=32, width=32, num_frames=2,
        num_inference_steps=4, seed=0,
    ))
    assert out.images is not None
    assert p.last_teacache_skipped >= 1  # huge threshold: steps skipped


def test_wan_cache_dit():
    from sglang_diffusion_tpu.diffusion.cache import CacheDiTConfig

    p = WanVideoPipeline(wan_cfg=tiny_wan_config(), dtype=jnp.float32,
                         cache_dit=CacheDiTConfig(enabled=True,
                                                  threshold=1e9,
                                                  front_blocks=1,
                                                  warmup_steps=0))
    out = p.forward(GenerationParams(
        prompt="x", height=32, width=32, num_frames=2,
        num_inference_steps=4, seed=0,
    ))
    assert out.images is not None
