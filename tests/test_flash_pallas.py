"""Dense flash attention kernel parity (interpret mode) vs einsum reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.models.dit import joint_attention
from sglang_diffusion_tpu.ops.flash_pallas import flash_attention
from sglang_diffusion_tpu.ops.attention_xla import full_attention


def qkv(b, t, h, d, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32) for _ in range(3)
    )


@pytest.mark.parametrize("t", [32, 48, 100])
def test_bidirectional_matches_einsum(t):
    q, k, v = qkv(2, t, 2, 32)
    ref = joint_attention(q, k, v, 0.25)
    got = flash_attention(
        q, k, v, 0.25, causal=False, block_q=32, block_kv=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_causal_matches_reference():
    b, t, h, d = 1, 64, 2, 32
    q, k, v = qkv(b, t, h, d, seed=1)
    ref = full_attention(q, k, v, jnp.array([t]), 0.25)
    got = flash_attention(
        q, k, v, 0.25, causal=True, block_q=32, block_kv=32, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_valid_len_masking():
    b, t, h, d = 1, 64, 2, 32
    q, k, v = qkv(b, t, h, d, seed=2)
    valid = 40
    ref = joint_attention(q[:, :valid], k[:, :valid], v[:, :valid], 0.25)
    got = flash_attention(
        q, k, v, 0.25, causal=False, valid_len=valid,
        block_q=32, block_kv=32, interpret=True,
    )
    np.testing.assert_allclose(
        np.asarray(got)[:, :valid], np.asarray(ref), rtol=2e-5, atol=2e-5
    )
