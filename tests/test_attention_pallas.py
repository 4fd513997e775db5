"""Pallas ragged paged attention vs XLA reference parity (interpret mode on
CPU; the same kernel compiles for TPU — exercised by bench.py and the TPU
suite). Mirrors the reference's sgl-kernel/tests parity strategy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.ops import attention_pallas, attention_xla

PAGE = 8


def _setup(b, t_new, hq, hkv, d, ctx_lens, seed=0):
    """Write ctx_lens[i] prefix tokens + t_new new tokens per seq; return
    (q, cache, page_table, kv_lens, q_start)."""
    rng = np.random.default_rng(seed)
    max_tokens = max(c + t_new for c in ctx_lens)
    pps = -(-max_tokens // PAGE)
    num_pages = b * pps + 1
    cache = jnp.zeros((1, num_pages, PAGE, 2 * hkv, d), jnp.float32)
    page_table = np.zeros((b, pps), np.int32)
    for i in range(b):
        page_table[i] = np.arange(1 + i * pps, 1 + (i + 1) * pps)
    # write full kv (prefix + new) for each seq
    total = [c + t_new for c in ctx_lens]
    tmax = max(total)
    k_all = rng.normal(size=(b, tmax, hkv, d)).astype(np.float32)
    v_all = rng.normal(size=(b, tmax, hkv, d)).astype(np.float32)
    offs = np.arange(tmax)[None, :]
    slots = page_table[np.arange(b)[:, None], offs // PAGE] * PAGE + offs % PAGE
    slots = np.where(offs < np.array(total)[:, None], slots, -1).astype(np.int32)
    cache = attention_xla.write_kv_pages(
        cache, 0, jnp.asarray(k_all), jnp.asarray(v_all), jnp.asarray(slots)
    )
    q = jnp.asarray(rng.normal(size=(b, t_new, hq, d)), jnp.float32)
    kv_lens = jnp.asarray(total, jnp.int32)
    q_start = jnp.asarray(ctx_lens, jnp.int32)
    return q, cache, jnp.asarray(page_table), kv_lens, q_start


@pytest.mark.parametrize(
    "b,t_new,hq,hkv,ctx",
    [
        (1, 1, 4, 2, [17]),  # decode GQA
        (3, 1, 4, 4, [5, 29, 8]),  # decode MHA ragged
        (2, 16, 4, 2, [0, 0]),  # pure prefill
        (2, 12, 8, 2, [24, 3]),  # chunked prefill with prefix
        (1, 40, 4, 1, [7]),  # multi-q-block (q_block=16)
    ],
)
def test_pallas_matches_xla(b, t_new, hq, hkv, ctx):
    d = 32
    q, cache, pt, kv_lens, q_start = _setup(b, t_new, hq, hkv, d, ctx)
    scale = d**-0.5
    ref = attention_xla.paged_attention(q, cache, 0, pt, kv_lens, q_start, scale)
    got = attention_pallas.paged_attention(
        q, cache, 0, pt, kv_lens, q_start, scale, q_block=16, interpret=True
    )
    # mask out padding queries (ref zeroes them; kernel may too)
    t_idx = np.arange(t_new)[None, :]
    valid = (np.asarray(q_start)[:, None] + t_idx) < np.asarray(kv_lens)[:, None]
    vmask = valid[:, :, None, None]
    np.testing.assert_allclose(
        np.where(vmask, np.asarray(got), 0),
        np.where(vmask, np.asarray(ref), 0),
        rtol=2e-5,
        atol=2e-5,
    )
