"""SageAttention INT8 attention (reference analog: the Sage backends under
multimodal_gen/runtime/layers/attention/backends/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.models.dit import joint_attention
from sglang_diffusion_tpu.diffusion.sage_attention import sage_attention


def test_sage_close_to_dense():
    rng = np.random.default_rng(0)
    b, t, h, d = 2, 64, 4, 32
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)) + 0.7, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    scale = d ** -0.5
    dense = np.asarray(joint_attention(q, k, v, scale))
    sage = np.asarray(sage_attention(q, k, v, scale))
    assert np.abs(sage - dense).max() < 2e-2
    # relative error small where outputs are non-tiny
    m = np.abs(dense) > 0.1
    rel = np.abs(sage - dense)[m] / np.abs(dense)[m]
    assert rel.mean() < 0.02


def test_sage_mean_centering_helps_with_common_mode():
    """K with a large common-mode offset: the centering trick keeps accuracy
    where naive per-token quantization would lose it."""
    rng = np.random.default_rng(1)
    b, t, h, d = 1, 32, 2, 16
    q = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h, d)) * 0.1 + 5.0, jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
    scale = d ** -0.5
    dense = np.asarray(joint_attention(q, k, v, scale))
    sage = np.asarray(sage_attention(q, k, v, scale))
    assert np.abs(sage - dense).max() < 5e-2


def test_sage_in_pipeline():
    import jax

    from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig, MMDiT

    cfg = DiTConfig(hidden_size=64, depth=2, num_heads=4, text_dim=32,
                    in_channels=4)
    params = MMDiT.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(2)
    img = jnp.asarray(rng.standard_normal((1, 16, cfg.patch_dim)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 4, cfg.text_dim)), jnp.float32)
    ts = jnp.asarray([500.0], jnp.float32)
    ref = np.asarray(MMDiT.make_forward(cfg)(params, img, txt, ts, (4, 4)))
    got = np.asarray(
        MMDiT.make_forward(cfg, attn_fn=sage_attention)(
            params, img, txt, ts, (4, 4)
        )
    )
    assert np.abs(got - ref).max() < 0.1  # accumulated across 2 blocks
    assert not np.array_equal(got, ref)
