"""Cache-DiT (DBCache/TaylorSeer block caching) — reference analog:
multimodal_gen/runtime/cache/cache_dit_integration.py:177,220."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.cache import CacheDiTConfig
from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig, MMDiT, patchify
from sglang_diffusion_tpu.diffusion.pipeline import (
    DiffusionPipeline,
    GenerationParams,
)


def test_forward_parts_compose_to_full_forward():
    """front + tail + head must equal the monolithic forward exactly."""
    cfg = DiTConfig(hidden_size=64, depth=4, num_heads=4, text_dim=32,
                    in_channels=4)
    params = MMDiT.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    fwd = MMDiT.make_forward(cfg)
    front, tail, head = MMDiT.make_forward_parts(cfg, front_blocks=2)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.standard_normal((2, 16, cfg.patch_dim)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((2, 5, cfg.text_dim)), jnp.float32)
    t = jnp.asarray([500.0, 500.0], jnp.float32)
    want = fwd(params, img, txt, t, (4, 4))
    xf, ctx = front(params, img, txt, t, (4, 4))
    xfull = tail(params, xf, ctx)
    got = head(params, xfull, ctx)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def _gen(pipe, steps=8, gs=1.0):
    return pipe.forward(GenerationParams(
        prompt="a cat", height=32, width=32, num_inference_steps=steps,
        guidance_scale=gs, seed=0,
    ))


def test_cache_dit_skips_and_stays_close():
    common = dict(dtype=jnp.float32)
    base = DiffusionPipeline(**common)
    cached = DiffusionPipeline(
        cache_dit=CacheDiTConfig(enabled=True, front_blocks=1,
                                 threshold=1e9),  # force max skipping
        params=base.params,
        **common,
    )
    ref = _gen(base)
    out = _gen(cached)
    assert cached.last_teacache_skipped > 0  # tail actually skipped
    # same shape output; values differ but remain finite and bounded
    assert out.images.shape == ref.images.shape
    assert np.isfinite(out.images.astype(np.float64)).all()


def test_cache_dit_zero_threshold_is_exact():
    """threshold=0 -> never skips -> bitwise-identical to baseline."""
    common = dict(dtype=jnp.float32)
    base = DiffusionPipeline(**common)
    cached = DiffusionPipeline(
        cache_dit=CacheDiTConfig(enabled=True, front_blocks=1, threshold=0.0),
        params=base.params,
        **common,
    )
    ref = _gen(base, steps=5)
    out = _gen(cached, steps=5)
    assert cached.last_teacache_skipped == 0
    np.testing.assert_array_equal(out.images, ref.images)


def test_cache_dit_with_cfg():
    pipe = DiffusionPipeline(
        cache_dit=CacheDiTConfig(enabled=True, front_blocks=1, threshold=1e9),
        dtype=jnp.float32,
    )
    out = _gen(pipe, steps=6, gs=3.0)
    assert out.images.shape[0] == 1
    assert pipe.last_teacache_skipped > 0


def test_teacache_and_cachedit_mutually_exclusive():
    from sglang_diffusion_tpu.diffusion.cache import TeaCacheConfig

    with pytest.raises(ValueError):
        DiffusionPipeline(
            teacache=TeaCacheConfig(enabled=True),
            cache_dit=CacheDiTConfig(enabled=True),
        )
