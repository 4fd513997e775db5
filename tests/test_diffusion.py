"""Diffusion pipeline tests (scheduler math, DiT shapes, e2e determinism —
analog of multimodal_gen/test/unit, SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
from sglang_diffusion_tpu.diffusion.models.dit import (
    DiTConfig,
    MMDiT,
    patchify,
    unpatchify,
)
from sglang_diffusion_tpu.diffusion.models.text_encoder import TextEncoderConfig
from sglang_diffusion_tpu.diffusion.models.vae import (
    VAEConfig,
    VAEDecoder,
    VAEEncoder,
)
from sglang_diffusion_tpu.diffusion.scheduling import (
    FlowMatchEulerScheduler,
    time_shift,
)


def test_scheduler_sigmas_monotonic():
    s = FlowMatchEulerScheduler()
    sigmas = s.set_timesteps(10)
    assert len(sigmas) == 11
    assert sigmas[-1] == 0.0
    assert np.all(np.diff(sigmas) < 0)
    assert sigmas[0] <= 1.0


def test_scheduler_shift_properties():
    s = np.linspace(0.01, 1.0, 50)
    shifted = time_shift(s, 3.0)
    assert np.all(shifted >= s - 1e-9)  # shift>1 pushes sigma up
    assert abs(time_shift(np.array([1.0]), 3.0)[0] - 1.0) < 1e-9


def test_euler_step_reaches_x0_in_one_step():
    """With exact velocity v = eps - x0, stepping sigma->0 recovers x0."""
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(4, 4)).astype(np.float32)
    eps = rng.normal(size=(4, 4)).astype(np.float32)
    sigma = 0.7
    x_t = FlowMatchEulerScheduler.scale_noise(x0, sigma, eps)
    v = eps - x0
    out = FlowMatchEulerScheduler.step(v, x_t, sigma, 0.0)
    np.testing.assert_allclose(out, x0, rtol=1e-5, atol=1e-5)


def test_patchify_roundtrip():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 8, 12, 4)), jnp.float32)
    tokens, grid = patchify(x, 2)
    assert tokens.shape == (2, 4 * 6, 16)
    back = unpatchify(tokens, grid, 2, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_dit_forward_shapes():
    cfg = DiTConfig(hidden_size=64, depth=2, num_heads=2, text_dim=32, in_channels=4)
    params = MMDiT.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    fwd = MMDiT.make_forward(cfg)
    b, gh, gw = 2, 4, 4
    img = jnp.ones((b, gh * gw, cfg.patch_dim), jnp.float32)
    txt = jnp.ones((b, 7, cfg.text_dim), jnp.float32)
    t = jnp.array([500.0, 100.0])
    out = fwd(params, img, txt, t, (gh, gw))
    assert out.shape == (b, gh * gw, cfg.patch_dim)
    assert np.isfinite(np.asarray(out)).all()


def test_vae_decoder_encoder_shapes():
    cfg = VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3)
    dec = VAEDecoder.init_params(jax.random.PRNGKey(0), cfg)
    z = jnp.ones((1, 4, 6, 4), jnp.float32)
    img = VAEDecoder.apply(dec, z, cfg)
    assert img.shape == (1, 32, 48, 3)
    assert float(jnp.abs(img).max()) <= 1.0
    enc = VAEEncoder.init_params(jax.random.PRNGKey(1), cfg)
    z2 = VAEEncoder.apply(enc, img, cfg)
    assert z2.shape == (1, 4, 6, 4)


@pytest.fixture(scope="module")
def generator():
    return DiffGenerator.from_config(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=2, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3),
        te_cfg=TextEncoderConfig(hidden_size=64, num_layers=1, num_heads=2),
    )


def test_t2i_e2e(generator):
    out = generator.generate("a red square", height=32, width=32, num_inference_steps=4)
    imgs = out["images"]
    assert imgs.shape == (1, 32, 32, 3)
    assert imgs.dtype == np.uint8
    timings = out["meta_info"]["stage_timings"]
    assert set(timings) == {
        "input_validation",
        "text_encoding",
        "timestep_preparation",
        "latent_preparation",
        "denoising",
        "decoding",
    }


def test_t2i_deterministic_same_seed(generator):
    a = generator.generate("x", height=32, width=32, num_inference_steps=3, seed=7)
    b = generator.generate("x", height=32, width=32, num_inference_steps=3, seed=7)
    np.testing.assert_array_equal(a["images"], b["images"])
    c = generator.generate("x", height=32, width=32, num_inference_steps=3, seed=8)
    assert not np.array_equal(a["images"], c["images"])


def test_t2i_cfg_and_batch(generator):
    out = generator.generate(
        ["a", "b"],
        height=32,
        width=32,
        num_inference_steps=2,
        guidance_scale=3.5,
        negative_prompt="bad",
    )
    assert out["images"].shape == (2, 32, 32, 3)
    # CFG result differs from non-CFG
    out2 = generator.generate(
        ["a", "b"], height=32, width=32, num_inference_steps=2
    )
    assert not np.array_equal(out["images"], out2["images"])


def test_teacache_skips_and_stays_close():
    from sglang_diffusion_tpu.diffusion.cache import TeaCacheConfig
    from sglang_diffusion_tpu.diffusion.models.text_encoder import TextEncoderConfig

    kw = dict(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=2, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3),
        te_cfg=TextEncoderConfig(hidden_size=64, num_layers=1, num_heads=2),
    )
    ref_gen = DiffGenerator.from_config(**kw)
    ref = ref_gen.generate("tc", height=32, width=32, num_inference_steps=8, seed=2)
    # thresholds are model-calibrated (reference fits per-family rescale
    # coefficients); for a tiny random model pick one that forces skipping
    # to exercise the mechanism
    tc_gen = DiffGenerator.from_config(
        **kw, teacache=TeaCacheConfig(enabled=True, threshold=1.0)
    )
    out = tc_gen.generate("tc", height=32, width=32, num_inference_steps=8, seed=2)
    skipped = tc_gen.pipeline.last_teacache_skipped
    assert 0 < skipped < 8, skipped
    # outputs stay in the same ballpark as the uncached run
    diff = np.abs(
        ref["images"].astype(np.int32) - out["images"].astype(np.int32)
    ).mean()
    assert diff < 80, diff
    # disabled pipeline skips nothing
    assert ref_gen.pipeline.last_teacache_skipped == 0


def test_image_to_image(generator):
    base = generator.generate("base", height=32, width=32, num_inference_steps=4, seed=1)
    src = base["images"][0]
    out = generator.generate(
        "edit it", height=32, width=32, num_inference_steps=6,
        image=src, strength=0.5, seed=2,
    )
    assert out["images"].shape == (1, 32, 32, 3)
    # strength<1 keeps it anchored to the source: closer to src than a
    # fresh unrelated generation is
    fresh = generator.generate("edit it", height=32, width=32,
                               num_inference_steps=6, seed=2)
    d_src = np.abs(out["images"].astype(int) - src.astype(int)).mean()
    d_fresh = np.abs(fresh["images"].astype(int) - src.astype(int)).mean()
    assert d_src <= d_fresh + 5, (d_src, d_fresh)
