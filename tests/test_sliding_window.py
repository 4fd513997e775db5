"""Sliding-window attention (mistral / gemma-style local layers).

Reference analog: SWA layers + swa pools in srt/layers/attention and
srt/mem_cache/swa_radix_cache.py (we implement the attention semantics;
window-bounded KV reclamation is a later round)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.ops import attention_xla

PAGE = 8


def _setup(b=2, t=24, hq=4, hkv=2, d=16, seed=0):
    rng = np.random.default_rng(seed)
    pages_per_seq = -(-t // PAGE)
    num_pages = b * pages_per_seq + 1
    kv = jnp.asarray(
        rng.standard_normal((1, num_pages, PAGE, 2 * hkv, d)), jnp.float32
    )
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)), jnp.float32)
    page_table = np.zeros((b, pages_per_seq), np.int32)
    for i in range(b):
        page_table[i] = np.arange(1 + i * pages_per_seq,
                                  1 + (i + 1) * pages_per_seq)
    kv_lens = np.array([t, t - 5], np.int32)
    q_start = np.array([0, 0], np.int32)
    return q, kv, jnp.asarray(page_table), jnp.asarray(kv_lens), jnp.asarray(q_start)


def _brute(q, kv, page_table, kv_lens, q_start, window, sm_scale=0.25):
    k, v = attention_xla.gather_kv(kv, 0, page_table)
    q_np, k_np, v_np = map(np.asarray, (q, k, v))
    b, t, hq, d = q_np.shape
    hkv = k_np.shape[2]
    g = hq // hkv
    out = np.zeros_like(q_np)
    for i in range(b):
        for tt in range(t):
            qp = int(q_start[i]) + tt
            if qp >= int(kv_lens[i]):
                continue
            for h in range(hq):
                kh = h // g
                lo = 0 if window is None or window < 0 else max(0, qp - window + 1)
                ks = k_np[i, lo : qp + 1, kh]
                vs = v_np[i, lo : qp + 1, kh]
                s = ks @ q_np[i, tt, h] * sm_scale
                p = np.exp(s - s.max())
                p /= p.sum()
                out[i, tt, h] = p @ vs
    return out


@pytest.mark.parametrize("window", [4, 9, None])
def test_xla_window_matches_bruteforce(window):
    q, kv, pt, klens, qstart = _setup()
    got = attention_xla.paged_attention(
        q, kv, 0, pt, klens, qstart, 0.25,
        window=None if window is None else jnp.int32(window),
    )
    want = _brute(q, kv, pt, klens, qstart, window)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_window_negative_means_full():
    q, kv, pt, klens, qstart = _setup()
    full = attention_xla.paged_attention(q, kv, 0, pt, klens, qstart, 0.25)
    neg = attention_xla.paged_attention(
        q, kv, 0, pt, klens, qstart, 0.25, window=jnp.int32(-1)
    )
    np.testing.assert_allclose(np.asarray(full), np.asarray(neg), atol=1e-6)


def test_pallas_window_matches_xla():
    """Pallas kernel (interpret on CPU) with 128-aligned head_dim."""
    from sglang_diffusion_tpu.ops import attention_pallas

    rng = np.random.default_rng(1)
    b, t, hq, hkv, d = 2, 16, 4, 2, 128
    pages_per_seq = -(-t // PAGE)
    num_pages = b * pages_per_seq + 1
    kv = jnp.asarray(
        rng.standard_normal((1, num_pages, PAGE, 2 * hkv, d)), jnp.float32
    )
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)), jnp.float32)
    page_table = np.zeros((b, pages_per_seq), np.int32)
    for i in range(b):
        page_table[i] = np.arange(1 + i * pages_per_seq,
                                  1 + (i + 1) * pages_per_seq)
    pt = jnp.asarray(page_table)
    klens = jnp.asarray([t, t - 3], jnp.int32)
    qstart = jnp.asarray([0, 0], jnp.int32)
    # padding queries (q_pos >= kv_len) are undefined in the kernel (callers
    # never read them); mask them like tests/test_attention_pallas.py does
    valid = (np.asarray(qstart)[:, None] + np.arange(t)[None]) < np.asarray(
        klens
    )[:, None]
    vmask = valid[:, :, None, None]
    for window in [5, -1]:
        want = attention_xla.paged_attention(
            q, kv, 0, pt, klens, qstart, 0.1, window=jnp.int32(window)
        )
        got = attention_pallas.paged_attention(
            q, kv, 0, pt, klens, qstart, 0.1, interpret=True,
            window=window if window >= 0 else None,
        )
        np.testing.assert_allclose(
            np.where(vmask, np.asarray(got), 0),
            np.where(vmask, np.asarray(want), 0),
            atol=2e-5,
        )


def test_decode_window_page_skip_equivalence():
    """Decode (t=1) deep into a long sequence: skipping pages before the
    window must equal masking them."""
    from sglang_diffusion_tpu.ops import attention_pallas

    rng = np.random.default_rng(2)
    b, hq, hkv, d = 1, 2, 1, 128
    seq = 64
    pages_per_seq = seq // PAGE
    kv = jnp.asarray(
        rng.standard_normal((1, pages_per_seq + 1, PAGE, 2 * hkv, d)),
        jnp.float32,
    )
    q = jnp.asarray(rng.standard_normal((b, 1, hq, d)), jnp.float32)
    pt = jnp.asarray(np.arange(1, pages_per_seq + 1)[None], jnp.int32)
    klens = jnp.asarray([seq], jnp.int32)
    qstart = jnp.asarray([seq - 1], jnp.int32)
    want = attention_xla.paged_attention(
        q, kv, 0, pt, klens, qstart, 0.1, window=jnp.int32(12)
    )
    got = attention_pallas.paged_attention(
        q, kv, 0, pt, klens, qstart, 0.1, interpret=True, window=12
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_model_alternating_layer_windows():
    """gemma-style layer_types pattern flows through the fori_loop layer
    iteration and changes logits vs full attention."""
    from sglang_diffusion_tpu.layers.attention import (
        AttentionMetadata,
        get_attention_backend,
    )
    from sglang_diffusion_tpu.models.registry import get_model_cls

    base = ModelConfig.tiny_llama()
    swa = ModelConfig.tiny_llama(
        sliding_window=4,
        layer_types=["sliding_attention", "full_attention"],
    )
    assert list(swa.layer_windows()) == [4, -1]
    model_cls = get_model_cls(base.architecture)
    params = model_cls.init_params(jax.random.PRNGKey(0), base, jnp.float32)
    attn = get_attention_backend("xla")
    t = 12
    ids = jnp.asarray(np.arange(t)[None] % base.vocab_size, jnp.int32)
    pos = jnp.asarray(np.arange(t)[None], jnp.int32)
    pages_per_seq = -(-t // PAGE)
    kv = jnp.zeros(
        (base.num_hidden_layers, pages_per_seq + 1, PAGE,
         2 * base.num_key_value_heads, base.actual_head_dim), jnp.float32,
    )
    pv = np.arange(1, pages_per_seq + 1, dtype=np.int32)
    offs = np.arange(t)
    slots = (pv[offs // PAGE] * PAGE + offs % PAGE)[None].astype(np.int32)
    page_table = np.zeros((1, pages_per_seq), np.int32)
    page_table[0] = pv
    meta = AttentionMetadata(
        page_table=jnp.asarray(page_table),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_start_pos=jnp.asarray([0], jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.asarray([t - 1], jnp.int32),
    )
    lg_full, _ = model_cls.make_forward(base, attn)(params, ids, pos, kv, meta)
    lg_swa, _ = model_cls.make_forward(swa, attn)(params, ids, pos, kv, meta)
    assert not np.allclose(np.asarray(lg_full), np.asarray(lg_swa))
