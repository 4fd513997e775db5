"""Mamba2 (SSD) state-space ops.

TPU-native analog of the reference's mamba stack (sgl-kernel
csrc/mamba/causal_conv1d.cu + srt/layers/attention/mamba/ selective-scan
kernels). The prefill path uses the chunked SSD formulation (matmul-heavy:
intra-chunk terms are attention-like einsums that map onto the MXU; the
inter-chunk recurrence is a short lax.scan over chunk states), the decode
path is the O(1) single-token state update. Both carry explicit
(conv_state, ssm_state) so the serving layer can cache them per request.

Shapes follow HF Mamba2Mixer:
  x  [B, T, H, P]  (H heads, P head_dim)
  dt [B, T, H]     (softplus'd, already includes dt_bias)
  A  [H]           (negative scalars; discrete decay = exp(dt * A))
  B  [B, T, G, N]  (G state groups, N state dim)
  C  [B, T, G, N]
  ssm_state  [B, H, P, N]
  conv_state [B, d_conv - 1, conv_dim]
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def causal_conv1d(
    x: jax.Array,  # [B, T, C]
    w: jax.Array,  # [K, C] depthwise kernel
    b: Optional[jax.Array],  # [C]
    conv_state: jax.Array,  # [B, K-1, C] inputs preceding x
    activation: Optional[str] = "silu",
) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv with carried state. Returns (y [B,T,C],
    new_conv_state [B,K-1,C]). activation: "silu" (mamba default) or
    None (LFM2-style ungated conv)."""
    k = w.shape[0]
    xp = jnp.concatenate([conv_state, x], axis=1)  # [B, K-1+T, C]
    # y_t = sum_j w[j] * xp[t + j]
    t = x.shape[1]
    y = jnp.zeros_like(x, dtype=jnp.float32)
    for j in range(k):  # k is tiny (4); unrolled elementwise FMAs fuse
        y = y + xp[:, j : j + t].astype(jnp.float32) * w[j].astype(jnp.float32)
    if b is not None:
        y = y + b.astype(jnp.float32)
    new_state = xp[:, t:]
    if activation == "silu":
        y = jax.nn.silu(y)
    return y.astype(x.dtype), new_state


def _segsum(a: jax.Array) -> jax.Array:
    """[..., Q] -> [..., Q, Q] lower-triangular pairwise segment sums:
    out[i, j] = sum a[j+1..i] for j < i, 0 on diagonal, -inf above."""
    q = a.shape[-1]
    cs = jnp.cumsum(a, axis=-1)
    diff = cs[..., :, None] - cs[..., None, :]  # [.., i, j] = sum (j..i]
    ii = jnp.arange(q)
    mask = ii[:, None] >= ii[None, :]
    return jnp.where(mask, diff, -jnp.inf)


def ssd_chunked(
    x: jax.Array,  # [B, T, H, P]
    dt: jax.Array,  # [B, T, H]
    A: jax.Array,  # [H]
    B: jax.Array,  # [B, T, G, N]
    C: jax.Array,  # [B, T, G, N]
    ssm_state: jax.Array,  # [B, H, P, N] initial state
    chunk: int = 64,
) -> Tuple[jax.Array, jax.Array]:
    """Chunked SSD scan (Mamba-2). Returns (y [B,T,H,P], final_state).
    T must be a multiple of `chunk` (pad with dt=0 rows: exp(0*A)=1 keeps
    the state and contributes nothing)."""
    b, t, h, p = x.shape
    g, n = B.shape[2], B.shape[3]
    assert t % chunk == 0, (t, chunk)
    nc = t // chunk
    rep = h // g
    f32 = jnp.float32

    # broadcast groups to heads
    Bh = jnp.repeat(B, rep, axis=2).astype(f32)  # [B, T, H, N]
    Ch = jnp.repeat(C, rep, axis=2).astype(f32)
    xf = x.astype(f32)
    dtf = dt.astype(f32)
    da = dtf * A.astype(f32)[None, None, :]  # log-decay per token [B, T, H]

    # chunk views: [B, NC, Q, ...]
    def ck(v):
        return v.reshape(b, nc, chunk, *v.shape[2:])

    xc, dtc, dac, Bc, Cc = map(ck, (xf, dtf, da, Bh, Ch))

    # ---- intra-chunk (diagonal) term: attention-like masked matmul ----
    L = jnp.exp(_segsum(dac.transpose(0, 1, 3, 2)))  # [B, NC, H, Q, Q]
    # scores[b,c,h,i,j] = C_i . B_j
    scores = jnp.einsum("bcihn,bcjhn->bchij", Cc, Bc)
    M = scores * L
    y_diag = jnp.einsum("bchij,bcjh,bcjhp->bcihp", M, dtc, xc)

    # ---- chunk states: state contributed by each chunk ----
    a_cum = jnp.cumsum(dac, axis=2)  # [B, NC, Q, H]
    a_tot = a_cum[:, :, -1]  # [B, NC, H]
    decay_states = jnp.exp(a_tot[:, :, None] - a_cum)  # [B, NC, Q, H]
    states = jnp.einsum(
        "bcqhn,bcqh,bcqh,bcqhp->bchpn", Bc, decay_states, dtc, xc
    )  # [B, NC, H, P, N]

    # ---- inter-chunk recurrence over chunk states ----
    def body(carry, xs):
        st, tot = xs  # [B, H, P, N], [B, H]
        prev = carry
        new = prev * jnp.exp(tot)[:, :, None, None] + st
        return new, prev  # emit the state BEFORE this chunk

    final_state, prev_states = jax.lax.scan(
        body,
        ssm_state.astype(f32),
        (states.transpose(1, 0, 2, 3, 4), a_tot.transpose(1, 0, 2)),
    )
    prev_states = prev_states.transpose(1, 0, 2, 3, 4)  # [B, NC, H, P, N]

    # ---- off-diagonal: contribution of earlier chunks through the state ----
    state_decay = jnp.exp(a_cum)  # [B, NC, Q, H]
    y_off = jnp.einsum(
        "bcqhn,bchpn,bcqh->bcqhp", Cc, prev_states, state_decay
    )
    y = (y_diag + y_off).reshape(b, t, h, p)
    return y.astype(x.dtype), final_state.astype(ssm_state.dtype)


def ssd_decode_step(
    x: jax.Array,  # [B, H, P] single token
    dt: jax.Array,  # [B, H]
    A: jax.Array,  # [H]
    B: jax.Array,  # [B, G, N]
    C: jax.Array,  # [B, G, N]
    ssm_state: jax.Array,  # [B, H, P, N]
) -> Tuple[jax.Array, jax.Array]:
    """O(1) recurrent update: h' = exp(dt*A) h + dt * x B^T; y = h' C."""
    b, h, p = x.shape
    g = B.shape[1]
    rep = h // g
    f32 = jnp.float32
    Bh = jnp.repeat(B, rep, axis=1).astype(f32)  # [B, H, N]
    Ch = jnp.repeat(C, rep, axis=1).astype(f32)
    da = jnp.exp(dt.astype(f32) * A.astype(f32)[None, :])  # [B, H]
    upd = jnp.einsum("bh,bhp,bhn->bhpn", dt.astype(f32), x.astype(f32), Bh)
    new_state = ssm_state.astype(f32) * da[:, :, None, None] + upd
    y = jnp.einsum("bhpn,bhn->bhp", new_state, Ch)
    return y.astype(x.dtype), new_state.astype(ssm_state.dtype)
