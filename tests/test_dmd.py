"""DMD distilled denoising (reference: pipelines_core/stages/
denoising_dmd.py + TurboWan pipeline configs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.pipeline import (
    DiffusionPipeline,
    GenerationParams,
)
from sglang_diffusion_tpu.diffusion.wan_pipeline import (
    WanVideoPipeline,
    tiny_wan_config,
)

STEPS = [988, 932, 852, 608]


@pytest.fixture(scope="module")
def pipe():
    return DiffusionPipeline(dtype=jnp.float32)


def test_dmd_matches_manual_loop(pipe):
    """The jitted scan reproduces the reference math step by step."""
    rng = np.random.default_rng(0)
    from sglang_diffusion_tpu.diffusion.models.dit import (
        patchify,
        unpatchify,
    )

    h = w = 32 // 8
    lat = jnp.asarray(
        rng.standard_normal((1, h, w, pipe.dit_cfg.in_channels)),
        jnp.float32)
    emb = jnp.asarray(
        rng.standard_normal((1, 7, pipe.dit_cfg.text_dim)) * 0.2,
        jnp.float32)
    out = pipe.run_denoise_dmd(lat, emb, STEPS, seed=3)
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()

    # manual reference loop (identical key folding)
    p = pipe.dit_cfg.patch_size
    x, grid = patchify(lat, p)
    shift = 8.0
    key = jax.random.PRNGKey(4)
    ts = np.asarray(STEPS, np.float32)
    sig = shift * (ts / 1000) / (1 + (shift - 1) * (ts / 1000))
    key = jax.random.PRNGKey(3 + 1)
    for i, t in enumerate(STEPS):
        tv = jnp.full((1,), float(t))
        v = pipe.dit_forward(pipe.params["dit"], x, emb, tv, grid)
        x0 = x - sig[i] * v.astype(x.dtype)
        key, sub = jax.random.split(key)
        noise = jax.random.normal(sub, x.shape, jnp.float32)
        s_next = 0.0 if i == len(STEPS) - 1 else sig[i + 1]
        x = (1.0 - s_next) * x0 + s_next * noise
    ref = unpatchify(x, grid, p, pipe.dit_cfg.in_channels)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_dmd_e2e_wan_family():
    """4-step DMD generation through the Wan family pipeline (the
    turbo-Wan path; BASELINE turbo_wan2_1_t2v rows)."""
    pipe = WanVideoPipeline(wan_cfg=tiny_wan_config(), dtype=jnp.float32)
    out = pipe.forward(GenerationParams(
        prompt="turbo wan clip", height=32, width=32, num_frames=3,
        num_inference_steps=50,  # ignored by DMD
        dmd_steps=STEPS, seed=5,
    ))
    vid = out.images
    assert vid.ndim == 5 and vid.dtype == np.uint8
    assert np.isfinite(vid.astype(np.float64)).all()


def test_dmd_determinism():
    pipe = WanVideoPipeline(wan_cfg=tiny_wan_config(), dtype=jnp.float32)
    gp = dict(prompt="x", height=32, width=32, num_frames=3,
              dmd_steps=[988, 608], seed=9)
    a = pipe.forward(GenerationParams(**gp)).images
    b = pipe.forward(GenerationParams(**gp)).images
    np.testing.assert_array_equal(a, b)
