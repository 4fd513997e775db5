"""Paged MLA Pallas kernel parity vs the dense-einsum MLA path.

Reference capability: sgl-kernel/csrc/attention/cutlass_mla_kernel.cu and
the flashmla attention backend (dedicated MLA decode kernels). Here the
dense path in models/deepseek.py is the oracle; the kernel must match for
decode (TQ=1), chunked prefill (q_start>0), and ragged kv lengths, at
DeepSeek-V3-like dims (r_kv=512, dr=64 -> R=576 non-128-aligned lanes).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.models.deepseek import mla_attention
from sglang_diffusion_tpu.ops.mla_pallas import mla_paged_attention

INTERPRET = jax.default_backend() != "tpu"


def _setup(b, t, h, rkv, dr, page_size, pps, kv_lens, q_start, seed=0):
    rng = np.random.RandomState(seed)
    r = rkv + dr
    num_pages = b * pps + 1
    q = jnp.asarray(rng.randn(b, t, h, r), jnp.float32) * 0.3
    cache = jnp.asarray(
        rng.randn(1, num_pages, page_size, 1, r), jnp.float32) * 0.3
    page_table = jnp.arange(b * pps, dtype=jnp.int32).reshape(b, pps)
    meta = AttentionMetadata(
        page_table=page_table,
        kv_lens=jnp.asarray(kv_lens, jnp.int32),
        q_start_pos=jnp.asarray(q_start, jnp.int32),
        slot_ids=jnp.zeros((b, t), jnp.int32),
        logit_idx=jnp.zeros((b,), jnp.int32),
    )
    return q, cache, meta


def _dense(q, cache, meta, sm_scale, rkv):
    # gather all latents densely (same as models/deepseek.gather_latents)
    nl, p, s, one, r = cache.shape
    b, pps = meta.page_table.shape
    pages = jnp.take(cache[0, :, :, 0], jnp.maximum(meta.page_table, 0), axis=0)
    latents = pages.reshape(b, pps * s, r)
    return mla_attention(q, latents, meta, sm_scale, rkv)


@pytest.mark.parametrize(
    "t,kv_lens,q_start",
    [
        (1, [37, 64, 5, 128], [36, 63, 4, 127]),  # decode
        (16, [16, 40, 33, 64], [0, 24, 17, 48]),  # prefill / chunked
    ],
)
def test_mla_kernel_parity(t, kv_lens, q_start):
    b, h, rkv, dr, page_size, pps = 4, 8, 128, 64, 16, 8
    q, cache, meta = _setup(b, t, h, rkv, dr, page_size, pps, kv_lens, q_start)
    sm_scale = 0.11
    ref = _dense(q, cache, meta, sm_scale, rkv)
    out = mla_paged_attention(
        q, cache, 0, meta.page_table, meta.kv_lens, meta.q_start_pos,
        sm_scale, rkv, interpret=INTERPRET,
    )
    # rows past kv_len are undefined in both paths; compare valid rows only
    ref = np.asarray(ref, np.float32)
    out = np.asarray(out, np.float32)
    for i in range(b):
        valid = min(t, max(0, kv_lens[i] - q_start[i]))
        np.testing.assert_allclose(
            out[i, :valid], ref[i, :valid], rtol=2e-3, atol=2e-3
        )


def test_mla_kernel_dsv3_dims():
    """Real DeepSeek-V3 latent width 512+64=576, stored 128-padded to 640
    (config.kv_cache_head_dim): Mosaic page DMA requires lane-aligned
    slices; pad lanes are zero and q is zero-padded to match."""
    b, t, h, rkv, dr, page_size, pps = 2, 1, 16, 512, 64, 32, 4
    kv_lens, q_start = [100, 128], [99, 127]
    q, cache, meta = _setup(b, t, h, rkv, dr, page_size, pps, kv_lens, q_start)
    sm_scale = 1.0 / np.sqrt(192)
    ref = _dense(q, cache, meta, sm_scale, rkv)
    r_pad = 640
    q_p = jnp.pad(q, [(0, 0)] * 3 + [(0, r_pad - q.shape[-1])])
    cache_p = jnp.pad(
        cache, [(0, 0)] * 4 + [(0, r_pad - cache.shape[-1])]
    )
    out = mla_paged_attention(
        q_p, cache_p, 0, meta.page_table, meta.kv_lens, meta.q_start_pos,
        sm_scale, rkv, interpret=INTERPRET,
    )
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=2e-3, atol=2e-3
    )
