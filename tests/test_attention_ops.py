"""Paged attention XLA reference op tests.

Strategy mirrors the reference's kernel parity tests (sgl-kernel/tests/):
the paged path must match plain full attention on contiguous pages.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.ops.attention_xla import (
    full_attention,
    gather_kv,
    paged_attention,
    write_kv_pages,
)

PAGE = 8


def make_cache(num_pages, hkv, d, dtype=jnp.float32, nl=1):
    return jnp.zeros((nl, num_pages, PAGE, 2 * hkv, d), dtype)


def test_write_then_gather_roundtrip():
    rng = np.random.default_rng(0)
    b, t, hkv, d = 2, 6, 2, 16
    cache = make_cache(8, hkv, d)
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    # req0 -> pages [0,1], req1 -> pages [4,5]
    page_table = jnp.array([[0, 1], [4, 5]], jnp.int32)
    slots = jnp.stack(
        [jnp.arange(t), 4 * PAGE + jnp.arange(t)]
    ).astype(jnp.int32)
    cache = write_kv_pages(cache, 0, k, v, slots)
    kg, vg = gather_kv(cache, 0, page_table)
    np.testing.assert_allclose(kg[:, :t], k, rtol=1e-6)
    np.testing.assert_allclose(vg[:, :t], v, rtol=1e-6)


def test_padding_slots_dropped():
    b, t, hkv, d = 1, 4, 1, 8
    cache = make_cache(2, hkv, d)
    k = jnp.ones((b, t, hkv, d))
    v = jnp.ones((b, t, hkv, d))
    slots = jnp.array([[0, 1, -1, -1]], jnp.int32)
    cache = write_kv_pages(cache, 0, k, v, slots)
    assert float(cache[0, 0, :, 0].sum()) != 0.0  # slot 0 written
    assert float(cache[0, 0, :, 2:].sum()) == 0.0  # padding slots dropped


@pytest.mark.parametrize("hq,hkv", [(4, 4), (4, 2), (8, 1)])
def test_paged_matches_full_attention(hq, hkv):
    rng = np.random.default_rng(1)
    b, t, d = 2, 10, 16
    q = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    seq_lens = jnp.array([t, 7], jnp.int32)
    ref = full_attention(q, k, v, seq_lens, sm_scale=d**-0.5)

    # paged: write all tokens, then attend with q_start=0
    num_pages_per = -(-t // PAGE)
    cache = make_cache(2 * num_pages_per + 1, hkv, d)
    page_table = jnp.array(
        [list(range(num_pages_per)), list(range(num_pages_per, 2 * num_pages_per))],
        jnp.int32,
    )
    base = page_table[:, 0:1] * PAGE
    offs = jnp.arange(t)[None, :]
    # slots spill across consecutive pages in page_table order
    slots = jnp.take_along_axis(
        page_table, offs // PAGE, axis=1
    ) * PAGE + offs % PAGE
    slots = jnp.where(offs < seq_lens[:, None], slots, -1).astype(jnp.int32)
    cache = write_kv_pages(cache, 0, k, v, slots)
    out = paged_attention(
        q,
        cache,
        0,
        page_table,
        kv_lens=seq_lens,
        q_start_pos=jnp.zeros((b,), jnp.int32),
        sm_scale=d**-0.5,
    )
    valid = np.arange(t)[None, :, None, None] < np.asarray(seq_lens)[:, None, None, None]
    np.testing.assert_allclose(
        np.where(valid, np.asarray(out), 0),
        np.where(valid, np.asarray(ref), 0),
        rtol=2e-5,
        atol=2e-5,
    )


def test_decode_step_matches_prefill():
    """Decoding token-by-token must equal one-shot prefill attention."""
    rng = np.random.default_rng(2)
    b, t, hq, hkv, d = 1, 6, 2, 1, 8
    q_all = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.float32)
    k_all = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    v_all = jnp.asarray(rng.normal(size=(b, t, hkv, d)), jnp.float32)
    seq = jnp.array([t], jnp.int32)
    ref = full_attention(q_all, k_all, v_all, seq, sm_scale=d**-0.5)

    cache = make_cache(2, hkv, d)
    page_table = jnp.array([[0, 1]], jnp.int32)
    outs = []
    for i in range(t):
        slots = jnp.array([[i]], jnp.int32)
        cache = write_kv_pages(
            cache, 0, k_all[:, i : i + 1], v_all[:, i : i + 1], slots
        )
        o = paged_attention(
            q_all[:, i : i + 1],
            cache,
            0,
            page_table,
            kv_lens=jnp.array([i + 1], jnp.int32),
            q_start_pos=jnp.array([i], jnp.int32),
            sm_scale=d**-0.5,
        )
        outs.append(o)
    out = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
