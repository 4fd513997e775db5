"""YaRN and M-RoPE variants (reference: srt/layers/rotary_embedding/)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.ops.rope import (
    apply_mrope,
    apply_rope,
    compute_inv_freq,
    yarn_attention_scale,
)


def test_yarn_inv_freq_interpolates_low_freqs():
    head_dim, theta = 64, 10000.0
    base = compute_inv_freq(head_dim, theta, None)
    yarn = compute_inv_freq(
        head_dim,
        theta,
        {
            "rope_type": "yarn",
            "factor": 8.0,
            "original_max_position_embeddings": 4096,
            "beta_fast": 32,
            "beta_slow": 1,
        },
    )
    # high-frequency dims (small index) unchanged (extrapolation)
    assert np.allclose(yarn[0], base[0])
    # low-frequency dims (large index) divided by factor (interpolation)
    assert np.allclose(yarn[-1], base[-1] / 8.0, rtol=1e-5)
    # everything in between is between the two
    assert np.all(yarn <= base + 1e-9)
    assert np.all(yarn >= base / 8.0 - 1e-9)


def test_yarn_attention_scale():
    assert yarn_attention_scale(None) == 1.0
    assert yarn_attention_scale({"rope_type": "llama3", "factor": 8}) == 1.0
    s = yarn_attention_scale({"rope_type": "yarn", "factor": 8.0})
    assert s == pytest.approx(0.1 * np.log(8.0) + 1.0)


def test_mrope_equals_rope_for_text_tokens():
    """Text tokens have identical (t, h, w) positions -> must reduce to RoPE."""
    rng = np.random.default_rng(0)
    B, T, H, D = 2, 7, 3, 32
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype=jnp.float32)
    pos = jnp.asarray(np.tile(np.arange(T), (B, 1)), dtype=jnp.int32)
    inv_freq = jnp.asarray(compute_inv_freq(D, 10000.0, None))
    q1, k1 = apply_rope(q, k, pos, inv_freq)
    pos3 = jnp.stack([pos, pos, pos], axis=0)
    q2, k2 = apply_mrope(q, k, pos3, inv_freq, (4, 6, 6))
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), atol=1e-5)


def test_mrope_sections_use_distinct_streams():
    rng = np.random.default_rng(1)
    B, T, H, D = 1, 4, 2, 24
    q = jnp.asarray(rng.standard_normal((B, T, H, D)), dtype=jnp.float32)
    k = q
    inv_freq = jnp.asarray(compute_inv_freq(D, 10000.0, None))
    t = jnp.asarray(np.arange(T)[None, :], dtype=jnp.int32)
    h = t + 5
    w = t + 9
    pos3 = jnp.stack([t, h, w], axis=0)
    qa, _ = apply_mrope(q, k, pos3, inv_freq, (4, 4, 4))
    # changing only the width stream changes the output (width section active)
    pos3b = jnp.stack([t, h, w + 3], axis=0)
    qb, _ = apply_mrope(q, k, pos3b, inv_freq, (4, 4, 4))
    assert not np.allclose(np.asarray(qa), np.asarray(qb))
    # with a zero-width section, the width stream is ignored
    qc, _ = apply_mrope(q, k, pos3, inv_freq, (6, 6, 0))
    qd, _ = apply_mrope(q, k, pos3b, inv_freq, (6, 6, 0))
    np.testing.assert_allclose(np.asarray(qc), np.asarray(qd), atol=1e-6)
