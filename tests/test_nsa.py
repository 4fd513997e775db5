"""NSA indexer + page-sparse prefill (ops/nsa.py).

Reference analog: srt/layers/attention/nsa_backend.py + nsa/nsa_indexer.py
+ nsa/quant_k_cache.py.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.ops.nsa import (
    NSAIndexerParams,
    dequantize_index_keys,
    index_keys,
    index_scores,
    init_indexer_params,
    nsa_dense_reference,
    nsa_sparse_prefill,
    pool_scores_to_pages,
    quantize_index_keys,
)


def _mk(b=1, t=256, hq=4, hkv=2, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)) * 0.3, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, t, hkv, d)) * 0.3, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, t, hkv, d)) * 0.3, jnp.bfloat16)
    return q, k, v


def test_sparse_equals_dense_when_topk_covers_all():
    q, k, v = _mk(t=256)
    scores = jnp.zeros((1, 256, 4), jnp.float32)  # content-free scores
    got = nsa_sparse_prefill(q, k, v, scores, 0.125, page=64, topk=4,
                             q_block=64)
    want = nsa_dense_reference(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_sparse_keeps_own_and_sink_pages():
    # with topk=2 (own + sink always kept), queries in the last block must
    # still compute exact attention over their own page and page 0
    q, k, v = _mk(t=512)
    # score page 1 highest everywhere; selection must still include own
    scores = jnp.zeros((1, 512, 8), jnp.float32).at[:, :, 1].set(10.0)
    out = nsa_sparse_prefill(q, k, v, scores, 0.125, page=64, topk=3,
                             q_block=64)
    assert np.isfinite(np.asarray(out, np.float32)).all()
    # first block (page 0 only context) is exactly dense
    want = nsa_dense_reference(q[:, :64], k[:, :64], v[:, :64], 0.125)
    np.testing.assert_allclose(np.asarray(out[:, :64], np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_indexer_selects_needle_page():
    """A page whose index keys match the query must win selection. A
    TRAINED indexer aligns wq with wk; emulate that correspondence by
    tying each query head's projection to the key projection (random
    untied projections have no reason to score matching content high)."""
    rng = np.random.default_rng(1)
    E = 128
    params = init_indexer_params(jax.random.PRNGKey(0), E)
    params = params._replace(
        wq=jnp.repeat(params.wk[:, None], params.wq.shape[1], axis=1),
        w_gate=jnp.ones_like(params.w_gate),
    )
    x = jnp.asarray(rng.standard_normal((1, 512, E)) * 0.3, jnp.bfloat16)
    needle = jnp.asarray(rng.standard_normal((E,)) * 2.0, jnp.bfloat16)
    for off in range(128, 192):  # fill page 2 with the needle
        x = x.at[0, off].set(needle)
    x = x.at[0, 500].set(needle)       # the query token
    kidx = index_keys(params, x)
    s = index_scores(params, x[:, 500:501], kidx)  # [1, 1, 512]
    ps = pool_scores_to_pages(s, 64)[0, 0]  # [8]
    assert int(jnp.argmax(ps)) == 2


def test_index_key_fp8_cache_roundtrip():
    rng = np.random.default_rng(2)
    params = init_indexer_params(jax.random.PRNGKey(0), 64, head_dim=32)
    x = jnp.asarray(rng.standard_normal((1, 64, 64)), jnp.bfloat16)
    kidx = index_keys(params, x)
    qk, scale = quantize_index_keys(kidx)
    assert qk.dtype == jnp.float8_e4m3fn
    back = dequantize_index_keys(qk, scale)
    err = np.abs(np.asarray(kidx, np.float32)
                 - np.asarray(back, np.float32)).max()
    ref = np.abs(np.asarray(kidx, np.float32)).max()
    assert err < 0.1 * ref

    # scores from the fp8 cache track full-precision scores' ranking
    s_full = pool_scores_to_pages(
        index_scores(params, x[:, -1:], kidx), 16)[0, 0]
    s_q = pool_scores_to_pages(
        index_scores(params, x[:, -1:], back), 16)[0, 0]
    assert int(jnp.argmax(s_full)) == int(jnp.argmax(s_q))


def test_sparse_prefill_ragged_tail():
    # T not divisible by page/q_block: tail padding must not leak
    q, k, v = _mk(t=200)
    scores = jnp.zeros((1, 200, 4), jnp.float32)
    got = nsa_sparse_prefill(q, k, v, scores, 0.125, page=64, topk=4,
                             q_block=64)
    want = nsa_dense_reference(q, k, v, 0.125)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(want, np.float32),
                               atol=2e-2, rtol=2e-2)


def test_nsa_backend_short_seq_matches_xla():
    """Engine-level: the nsa backend falls back to dense below the
    engagement threshold, so short-prompt generation is identical to the
    xla backend."""
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    def mk(backend):
        cfg = ModelConfig.tiny_llama(vocab_size=512)
        args = ServerArgs(
            model_path="", tokenizer_path="byte", page_size=8,
            max_total_tokens=4096, attention_backend=backend,
            context_length=512,
        )
        return Engine(server_args=args, model_config=cfg,
                      tokenizer=ByteTokenizer())

    sp = SamplingParams(max_new_tokens=12, temperature=0.0)
    ref = mk("xla").generate("hello world", sp)["output_ids"]
    got = mk("nsa:8").generate("hello world", sp)["output_ids"]
    assert ref == got


def test_nsa_backend_long_prefill_runs():
    """Above the threshold the sparse path engages; with topk covering
    every page the output is exactly the dense result."""
    import jax
    from sglang_diffusion_tpu.layers.attention import (
        AttentionMetadata,
        get_attention_backend,
    )

    rng = np.random.default_rng(3)
    T, S, HKV, HQ, D = 1024 + 64, 64, 2, 4, 128
    PP = 20
    kv = jnp.zeros((1, PP + 1, S, 2 * HKV, D), jnp.bfloat16)
    pages = np.arange(1, PP + 1, dtype=np.int32)
    # write k/v history directly into the pool pages
    kh = rng.standard_normal((T, HKV, D)) * 0.3
    vh = rng.standard_normal((T, HKV, D)) * 0.3
    rows = np.zeros((PP * S, 2 * HKV, D), np.float32)
    rows[:T, 0::2] = kh
    rows[:T, 1::2] = vh
    kv = kv.at[0, 1 : PP + 1].set(
        jnp.asarray(rows.reshape(PP, S, 2 * HKV, D), jnp.bfloat16))
    q = jnp.asarray(rng.standard_normal((1, T, HQ, D)) * 0.3, jnp.bfloat16)
    pt = jnp.asarray(pages[None])
    meta = AttentionMetadata(
        page_table=pt,
        kv_lens=jnp.asarray([T], jnp.int32),
        q_start_pos=jnp.asarray([0], jnp.int32),
        slot_ids=pt,
        logit_idx=jnp.asarray([T - 1], jnp.int32),
    )
    nsa = get_attention_backend("nsa:32")  # 32 pages >= PP: exact
    xla = get_attention_backend("xla")
    got = nsa(q, kv, 0, meta, 0.088)
    want = xla(q, kv, 0, meta, 0.088)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=3e-2, rtol=3e-2)
