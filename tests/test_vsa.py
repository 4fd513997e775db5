"""Video Sparse Attention (VSA) tests — reference analog:
multimodal_gen/runtime/layers/attention/backends/video_sparse_attn.py."""

import jax
import jax.numpy as jnp
import numpy as np

def test_vsa_sparsity_zero_matches_dense():
    """VSA with sparsity=0 selects every tile -> exact dense attention."""
    import math

    from sglang_diffusion_tpu.diffusion.sparse_attention import (
        make_vsa_attention,
    )

    rng = np.random.default_rng(0)
    grid, tile, text_len = (4, 4, 4), (2, 2, 2), 5
    t = text_len + 64
    q = jnp.asarray(rng.standard_normal((2, t, 2, 8)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((2, t, 2, 8)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((2, t, 2, 8)), jnp.float32)
    sc = 1 / math.sqrt(8)
    s = jnp.einsum("bthd,bshd->bhts", q, k) * sc
    ref = jnp.einsum("bhts,bshd->bthd", jax.nn.softmax(s, -1), v)
    got = make_vsa_attention(grid, tile, 0.0, text_len)(q, k, v, sc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_vsa_video_generation_e2e():
    """VSA wired into video denoising: runs end-to-end and approximates the
    dense result (high-sparsity output stays finite and image-valued)."""
    from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
    from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
    from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig

    kw = dict(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=1, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8,
                          num_upsamples=3),
    )
    gen_kw = dict(height=32, width=32, num_frames=4, num_inference_steps=2,
                  seed=2)
    dense = DiffGenerator.from_config(**kw).generate("vsa vid", **gen_kw)
    vsa = DiffGenerator.from_config(
        **kw, vsa={"tile": (2, 2, 2), "sparsity": 0.0}
    ).generate("vsa vid", **gen_kw)
    # sparsity 0 == dense selection -> identical frames (within fp noise)
    np.testing.assert_allclose(
        dense["frames"].astype(np.int32), vsa["frames"].astype(np.int32),
        atol=1,
    )
    sparse = DiffGenerator.from_config(
        **kw, vsa={"tile": (2, 2, 2), "sparsity": 0.75}
    ).generate("vsa vid", **gen_kw)
    assert sparse["frames"].shape == dense["frames"].shape
