"""Gated DeltaNet op parity vs HF transformers' reference implementations
(torch_chunk_gated_delta_rule / torch_recurrent_gated_delta_rule), the
numerics the Qwen3-Next linear-attention layers are defined by."""

import numpy as np
import torch

import jax.numpy as jnp

from sglang_diffusion_tpu.ops.deltanet import (
    gated_delta_rule_chunked,
    gated_delta_rule_step,
)


def _rand(b=2, t=70, h=3, dk=16, dv=8, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.standard_normal((b, t, h, dk)).astype(np.float32)
    k = rng.standard_normal((b, t, h, dk)).astype(np.float32)
    v = rng.standard_normal((b, t, h, dv)).astype(np.float32)
    g = -np.abs(rng.standard_normal((b, t, h))).astype(np.float32) * 0.5
    beta = (1 / (1 + np.exp(-rng.standard_normal((b, t, h))))).astype(
        np.float32
    )
    return q, k, v, g, beta


def test_chunked_matches_hf_reference():
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_chunk_gated_delta_rule,
    )

    q, k, v, g, beta = _rand()
    ref_out, ref_state = torch_chunk_gated_delta_rule(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        torch.tensor(g), torch.tensor(beta), chunk_size=64,
        output_final_state=True, use_qk_l2norm_in_kernel=True,
    )
    out, state = gated_delta_rule_chunked(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(g), jnp.asarray(beta), chunk_size=64,
    )
    np.testing.assert_allclose(
        np.asarray(out), ref_out.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(state), ref_state.numpy(), rtol=2e-4, atol=2e-4
    )


def test_recurrent_matches_hf_reference():
    from transformers.models.qwen3_next.modeling_qwen3_next import (
        torch_recurrent_gated_delta_rule,
    )

    q, k, v, g, beta = _rand(t=5)
    ref_out, ref_state = torch_recurrent_gated_delta_rule(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        torch.tensor(g), torch.tensor(beta), initial_state=None,
        output_final_state=True, use_qk_l2norm_in_kernel=True,
    )
    state = jnp.zeros((2, 3, 16, 8), jnp.float32)
    outs = []
    for i in range(5):
        o, state = gated_delta_rule_step(
            jnp.asarray(q[:, i]), jnp.asarray(k[:, i]), jnp.asarray(v[:, i]),
            jnp.asarray(g[:, i]), jnp.asarray(beta[:, i]), state,
        )
        outs.append(np.asarray(o))
    np.testing.assert_allclose(
        np.stack(outs, 1), ref_out.numpy(), rtol=2e-4, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(state), ref_state.numpy(), rtol=2e-4, atol=2e-4
    )


def test_chunked_equals_recurrent_with_state_carry():
    """Chunked prefill then recurrent decode must equal all-chunked over
    the concatenated sequence (the engine's prefill->decode handoff)."""
    q, k, v, g, beta = _rand(t=40, seed=3)
    full, _ = gated_delta_rule_chunked(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
        jnp.asarray(g), jnp.asarray(beta), chunk_size=16,
    )
    pre, state = gated_delta_rule_chunked(
        jnp.asarray(q[:, :33]), jnp.asarray(k[:, :33]),
        jnp.asarray(v[:, :33]), jnp.asarray(g[:, :33]),
        jnp.asarray(beta[:, :33]), chunk_size=16,
    )
    outs = [np.asarray(pre)]
    for i in range(33, 40):
        o, state = gated_delta_rule_step(
            jnp.asarray(q[:, i]), jnp.asarray(k[:, i]), jnp.asarray(v[:, i]),
            jnp.asarray(g[:, i]), jnp.asarray(beta[:, i]), state,
        )
        outs.append(np.asarray(o)[:, None])
    got = np.concatenate(outs, axis=1)
    np.testing.assert_allclose(got, np.asarray(full), rtol=2e-4, atol=2e-4)
