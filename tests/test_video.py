"""Text-to-video pipeline tests (3D DiT path, reference analog: Wan T2V)."""

import os

import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
from sglang_diffusion_tpu.diffusion.models.dit import (
    DiTConfig,
    patchify_video,
    rope_nd,
    unpatchify_video,
)
from sglang_diffusion_tpu.diffusion.models.text_encoder import TextEncoderConfig
from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig

import jax.numpy as jnp


def test_patchify_video_roundtrip():
    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 3, 8, 12, 4)), jnp.float32
    )
    tokens, grid = patchify_video(x, 2)
    assert tokens.shape == (2, 3 * 4 * 6, 16)
    assert grid == (3, 4, 6)
    back = unpatchify_video(tokens, grid, 2, 4)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x))


def test_rope_nd_shapes():
    cos, sin = rope_nd((3, 4, 4), t_txt=5, head_dim=24, theta=1e4)
    assert cos.shape == (5 + 48, 12)
    np.testing.assert_allclose(np.asarray(cos[:5]), 1.0)
    np.testing.assert_allclose(np.asarray(sin[:5]), 0.0)


@pytest.fixture(scope="module")
def generator():
    return DiffGenerator.from_config(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=2, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3),
        te_cfg=TextEncoderConfig(hidden_size=64, num_layers=1, num_heads=2),
    )


def test_t2v_e2e(generator, tmp_path):
    out = generator.generate(
        "a bouncing ball",
        height=32,
        width=32,
        num_frames=4,
        num_inference_steps=2,
    )
    frames = out["frames"]
    assert frames.shape == (1, 4, 32, 32, 3)
    assert frames.dtype == np.uint8
    # frames differ (temporal rope + noise)
    assert not np.array_equal(frames[0, 0], frames[0, 1])
    # save
    path = str(tmp_path / "out.gif")
    DiffGenerator.save_video(frames[0], path)
    assert os.path.getsize(path) > 100


def test_t2v_deterministic(generator):
    a = generator.generate("x", height=32, width=32, num_frames=3,
                           num_inference_steps=2, seed=3)
    b = generator.generate("x", height=32, width=32, num_frames=3,
                           num_inference_steps=2, seed=3)
    np.testing.assert_array_equal(a["frames"], b["frames"])
