"""Mamba2 SSD ops: the chunked prefill scan must equal the sequential
recurrence exactly (reference analog: mamba kernel tests under
sgl-kernel/tests + srt/layers/attention/mamba)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.ops.mamba import (
    causal_conv1d,
    ssd_chunked,
    ssd_decode_step,
)


def _rand(shape, seed):
    return jnp.asarray(
        np.random.default_rng(seed).standard_normal(shape), jnp.float32
    )


@pytest.mark.parametrize("t,chunk", [(8, 4), (64, 16), (128, 64)])
def test_chunked_equals_sequential(t, chunk):
    b, h, p, g, n = 2, 4, 8, 2, 6
    x = _rand((b, t, h, p), 0) * 0.5
    dt = jax.nn.softplus(_rand((b, t, h), 1))
    A = -jnp.exp(_rand((h,), 2) * 0.3)
    B = _rand((b, t, g, n), 3) * 0.5
    C = _rand((b, t, g, n), 4) * 0.5
    s0 = _rand((b, h, p, n), 5) * 0.1

    y_chunk, final = ssd_chunked(x, dt, A, B, C, s0, chunk=chunk)

    # sequential ground truth
    state = s0
    ys = []
    for i in range(t):
        y, state = ssd_decode_step(
            x[:, i], dt[:, i], A, B[:, i], C[:, i], state
        )
        ys.append(y)
    y_seq = jnp.stack(ys, axis=1)
    np.testing.assert_allclose(
        np.asarray(y_chunk), np.asarray(y_seq), atol=2e-4, rtol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(final), np.asarray(state), atol=2e-4, rtol=2e-3
    )


def test_chunked_state_carry_across_calls():
    """Splitting a sequence across two chunked calls == one call
    (chunked prefill of mamba layers)."""
    b, t, h, p, g, n = 1, 32, 2, 4, 1, 4
    x = _rand((b, t, h, p), 0) * 0.5
    dt = jax.nn.softplus(_rand((b, t, h), 1))
    A = -jnp.exp(_rand((h,), 2) * 0.3)
    B = _rand((b, t, g, n), 3) * 0.5
    C = _rand((b, t, g, n), 4) * 0.5
    s0 = jnp.zeros((b, h, p, n), jnp.float32)
    y_all, f_all = ssd_chunked(x, dt, A, B, C, s0, chunk=16)
    y1, s1 = ssd_chunked(x[:, :16], dt[:, :16], A, B[:, :16], C[:, :16], s0,
                         chunk=16)
    y2, s2 = ssd_chunked(x[:, 16:], dt[:, 16:], A, B[:, 16:], C[:, 16:], s1,
                         chunk=16)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_all),
        atol=2e-4, rtol=2e-3,
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(f_all), atol=2e-4,
                               rtol=2e-3)


def test_causal_conv_state_carry():
    b, t, c, k = 2, 10, 6, 4
    x = _rand((b, t, c), 0)
    w = _rand((k, c), 1) * 0.3
    bias = _rand((c,), 2) * 0.1
    state0 = jnp.zeros((b, k - 1, c), jnp.float32)
    y_all, s_all = causal_conv1d(x, w, bias, state0)
    y1, s1 = causal_conv1d(x[:, :6], w, bias, state0)
    y2, s2 = causal_conv1d(x[:, 6:], w, bias, s1)
    np.testing.assert_allclose(
        np.asarray(jnp.concatenate([y1, y2], 1)), np.asarray(y_all), atol=1e-6
    )
    np.testing.assert_allclose(np.asarray(s2), np.asarray(s_all), atol=1e-6)
    # torch reference for the conv itself
    import torch
    import torch.nn.functional as F

    xt = torch.tensor(np.asarray(x)).transpose(1, 2)  # [B, C, T]
    wt = torch.tensor(np.asarray(w)).T.unsqueeze(1)  # [C, 1, K]
    ref = F.conv1d(F.pad(xt, (k - 1, 0)), wt, torch.tensor(np.asarray(bias)),
                   groups=c)
    ref = F.silu(ref).transpose(1, 2).numpy()
    np.testing.assert_allclose(np.asarray(y_all), ref, atol=1e-5)
