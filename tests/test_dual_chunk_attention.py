"""Dual Chunk Attention (ops/rope.py apply_rope_dual_chunk +
ops/attention_xla.py dual_chunk_paged_attention; reference analog:
srt/layers/attention/dual_chunk_flashattention_backend.py and
rotary_embedding/rope_variant.py:677)."""

import numpy as np

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.ops.attention_xla import (
    dual_chunk_paged_attention,
    paged_attention,
    write_kv_pages,
)
from sglang_diffusion_tpu.ops.rope import (
    apply_rope,
    apply_rope_dual_chunk,
    compute_inv_freq,
)

PS = 8
HKV, HQ, D = 2, 4, 16


def _cache_with(k, v, n_pages_total=64):
    b, t = k.shape[0], k.shape[1]
    pages_per_seq = -(-t // PS)
    kv = jnp.zeros((1, n_pages_total, PS, 2 * HKV, D), jnp.float32)
    pt = np.zeros((b, pages_per_seq), np.int32)
    for i in range(b):
        pt[i] = np.arange(1 + i * pages_per_seq,
                          1 + (i + 1) * pages_per_seq)
    offs = np.arange(t)
    slots = np.stack([pt[i][offs // PS] * PS + offs % PS
                      for i in range(b)]).astype(np.int32)
    kv = write_kv_pages(kv, 0, k, v, jnp.asarray(slots))
    return kv, jnp.asarray(pt)


def _rope_np(x, pos, inv_freq):
    """rotate-half rope reference."""
    freqs = pos[..., None] * np.asarray(inv_freq)
    cos = np.concatenate([np.cos(freqs), np.cos(freqs)], -1)[..., None, :]
    sin = np.concatenate([np.sin(freqs), np.sin(freqs)], -1)[..., None, :]
    half = x.shape[-1] // 2
    rot = np.concatenate([-x[..., half:], x[..., :half]], -1)
    return x * cos + rot * sin


def test_dual_chunk_rope_matches_reference_positions():
    rng = np.random.default_rng(0)
    b, t = 1, 10
    chunk_size, local = 8, 2
    cl = chunk_size - local
    q = rng.standard_normal((b, t, HQ, D)).astype(np.float32)
    k = rng.standard_normal((b, t, HKV, D)).astype(np.float32)
    pos = np.arange(t, dtype=np.int64)[None]
    inv_freq = compute_inv_freq(D, 10000.0, None)
    qi, qs, qn, kr = apply_rope_dual_chunk(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos),
        jnp.asarray(inv_freq), chunk_size, local)
    np.testing.assert_allclose(
        np.asarray(kr), _rope_np(k, pos % cl, inv_freq), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(qi), _rope_np(q, pos % cl, inv_freq), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(qs),
        _rope_np(q, np.minimum(pos % cl + cl, chunk_size), inv_freq),
        atol=1e-5)
    const = np.full_like(pos, min(2 * cl - 1, chunk_size))
    np.testing.assert_allclose(
        np.asarray(qn), _rope_np(q, const, inv_freq), atol=1e-5)


def test_dual_chunk_equals_dense_when_short():
    """seq < chunk_len: only the intra component is live and positions
    p % chunk_len == p, so DCA == standard rope + causal attention."""
    rng = np.random.default_rng(1)
    b, t = 2, 6
    chunk_size, local = 64, 16  # chunk_len = 48 > t
    q = rng.standard_normal((b, t, HQ, D)).astype(np.float32)
    k = rng.standard_normal((b, t, HKV, D)).astype(np.float32)
    v = rng.standard_normal((b, t, HKV, D)).astype(np.float32)
    pos = np.broadcast_to(np.arange(t)[None], (b, t)).copy()
    inv_freq = jnp.asarray(compute_inv_freq(D, 10000.0, None))

    qi, qs, qn, kr = apply_rope_dual_chunk(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(pos), inv_freq,
        chunk_size, local)
    kv, pt = _cache_with(kr, jnp.asarray(v))
    kv_lens = jnp.asarray([t, t - 1], jnp.int32)
    out = dual_chunk_paged_attention(
        qi, qs, qn, kv, 0, pt, kv_lens, jnp.zeros((b,), jnp.int32), 0.25,
        chunk_size - local)

    q_std, k_std = apply_rope(jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(pos), inv_freq)
    kv2, pt2 = _cache_with(k_std, jnp.asarray(v))
    ref = paged_attention(q_std, kv2, 0, pt2, kv_lens,
                          jnp.zeros((b,), jnp.int32), 0.25)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def test_dual_chunk_matches_three_pass_lse_merge():
    """The fused single-softmax implementation equals the reference's
    three separate passes merged by log-sum-exp (decode case)."""
    rng = np.random.default_rng(2)
    b = 1
    chunk_size, local = 16, 4
    cl = chunk_size - local
    t = 3 * cl + 5  # 3 full chunks + partial -> all three ranges live
    k = rng.standard_normal((b, t, HKV, D)).astype(np.float32)
    v = rng.standard_normal((b, t, HKV, D)).astype(np.float32)
    q1 = rng.standard_normal((b, 1, HQ, D)).astype(np.float32)
    p_dec = np.array([[t - 1]])
    inv_freq = jnp.asarray(compute_inv_freq(D, 10000.0, None))

    kpos = np.broadcast_to(np.arange(t)[None], (b, t)).copy()
    _, _, _, kr = apply_rope_dual_chunk(
        jnp.zeros((b, t, HQ, D)), jnp.asarray(k), jnp.asarray(kpos),
        inv_freq, chunk_size, local)
    qi, qs, qn, _ = apply_rope_dual_chunk(
        jnp.asarray(q1), jnp.zeros((b, 1, HKV, D)), jnp.asarray(p_dec),
        inv_freq, chunk_size, local)

    kv, pt = _cache_with(kr, jnp.asarray(v))
    kv_lens = jnp.asarray([t], jnp.int32)
    out = dual_chunk_paged_attention(
        qi, qs, qn, kv, 0, pt, kv_lens, jnp.asarray([t - 1], jnp.int32),
        0.25, cl)

    # ---- reference: three masked softmax passes + LSE merge ----
    krn = np.asarray(kr)[0]  # [t, HKV, D]
    vn = v[0]
    p = t - 1
    cn = p // cl
    ranges = {
        "intra": (cn * cl, t, np.asarray(qi)[0, 0]),
        "succ": ((cn - 1) * cl, cn * cl, np.asarray(qs)[0, 0]),
        "inter": (0, (cn - 1) * cl, np.asarray(qn)[0, 0]),
    }
    group = HQ // HKV
    outs, lses = [], []
    for name, (lo, hi, qq) in ranges.items():
        kk = krn[lo:hi]
        vv = vn[lo:hi]
        kk = np.repeat(kk, group, axis=1)  # [n, HQ, D]
        vv = np.repeat(vv, group, axis=1)
        logits = np.einsum("hd,nhd->hn", qq, kk) * 0.25
        m = logits.max(axis=1, keepdims=True)
        e = np.exp(logits - m)
        o = np.einsum("hn,nhd->hd", e / e.sum(1, keepdims=True), vv)
        outs.append(o)
        lses.append((m[:, 0] + np.log(e.sum(1))))
    lses = np.stack(lses)  # [3, HQ]
    mx = lses.max(0)
    w = np.exp(lses - mx)
    w = w / w.sum(0)
    ref = (np.stack(outs) * w[..., None]).sum(0)  # [HQ, D]
    np.testing.assert_allclose(np.asarray(out)[0, 0], ref, atol=1e-4)
