"""Top-k page-sparse decode attention (ops/attention_xla.py
sparse_paged_attention; reference analog: NSA block selection,
srt/layers/attention/nsa/nsa_indexer.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.ops.attention_xla import (
    paged_attention,
    sparse_paged_attention,
    write_kv_pages,
)

PS = 8  # page size
HKV, HQ, D = 2, 4, 16


def _build_cache(rng, n_pages_total, b, kv_len, n_layers=1):
    """Cache with one sequence of kv_len tokens over contiguous pages."""
    kv = jnp.zeros((n_layers, n_pages_total, PS, 2 * HKV, D), jnp.float32)
    pages_per_seq = -(-kv_len // PS)
    pt = np.zeros((b, pages_per_seq), np.int32)
    for i in range(b):
        pt[i] = np.arange(1 + i * pages_per_seq, 1 + (i + 1) * pages_per_seq)
    k = jnp.asarray(rng.standard_normal((b, kv_len, HKV, D)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, kv_len, HKV, D)), jnp.float32)
    offs = np.arange(kv_len)
    slots = np.stack([
        pt[i][offs // PS] * PS + offs % PS for i in range(b)
    ]).astype(np.int32)
    kv = write_kv_pages(kv, 0, k, v, jnp.asarray(slots))
    return kv, jnp.asarray(pt), k, v


def test_sparse_exact_when_pages_fit():
    """pages_per_seq <= topk: trace-time dense branch, bit-identical."""
    rng = np.random.default_rng(0)
    kv_len = 3 * PS
    kv, pt, _, _ = _build_cache(rng, 16, 2, kv_len)
    q = jnp.asarray(rng.standard_normal((2, 1, HQ, D)), jnp.float32)
    kv_lens = jnp.asarray([kv_len, kv_len - 3], jnp.int32)
    q_start = kv_lens - 1
    dense = paged_attention(q, kv, 0, pt, kv_lens, q_start, 0.25)
    sparse = sparse_paged_attention(q, kv, 0, pt, kv_lens, q_start, 0.25,
                                    topk_pages=8)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(sparse))


def test_sparse_exact_when_all_real_pages_selected():
    """More table columns than topk but fewer REAL pages: still exact
    (invalid pages lose top-k to real ones; masking covers the rest)."""
    rng = np.random.default_rng(1)
    kv_len = 4 * PS - 2
    kv, pt, _, _ = _build_cache(rng, 32, 1, kv_len)
    # pad the table out to 12 columns with null pages
    pt_wide = jnp.concatenate(
        [pt, jnp.zeros((1, 12 - pt.shape[1]), jnp.int32)], axis=1)
    q = jnp.asarray(rng.standard_normal((1, 1, HQ, D)), jnp.float32)
    kv_lens = jnp.asarray([kv_len], jnp.int32)
    q_start = kv_lens - 1
    dense = paged_attention(q, kv, 0, pt_wide, kv_lens, q_start, 0.25)
    sparse = sparse_paged_attention(q, kv, 0, pt_wide, kv_lens, q_start,
                                    0.25, topk_pages=6)
    np.testing.assert_allclose(np.asarray(dense), np.asarray(sparse),
                               rtol=1e-6, atol=1e-6)


def test_sparse_selects_high_mass_pages():
    """Attention mass concentrated in a few middle pages: the selector
    must find them, making sparse ~= dense despite dropping most pages."""
    rng = np.random.default_rng(2)
    n_seq_pages = 32
    kv_len = n_seq_pages * PS
    kv = jnp.zeros((1, 64, PS, 2 * HKV, D), jnp.float32)
    pt = np.arange(1, n_seq_pages + 1, dtype=np.int32)[None]
    # keys: small noise everywhere, a strong cluster aligned with q on
    # pages 10 and 20 (uniform within the page so the slot-0/mid
    # representatives see it)
    qdir = rng.standard_normal((HKV, D))
    k = 0.01 * rng.standard_normal((1, kv_len, HKV, D))
    for pg in (10, 20):
        k[0, pg * PS:(pg + 1) * PS] = qdir[None] * 3.0
    v = rng.standard_normal((1, kv_len, HKV, D))
    offs = np.arange(kv_len)
    slots = (pt[0][offs // PS] * PS + offs % PS)[None].astype(np.int32)
    kv = write_kv_pages(kv, 0, jnp.asarray(k, jnp.float32),
                        jnp.asarray(v, jnp.float32), jnp.asarray(slots))
    q = jnp.asarray(
        np.repeat(qdir, HQ // HKV, axis=0)[None, None], jnp.float32)
    kv_lens = jnp.asarray([kv_len], jnp.int32)
    q_start = kv_lens - 1
    dense = np.asarray(
        paged_attention(q, jnp.asarray(kv), 0, jnp.asarray(pt), kv_lens,
                        q_start, 0.25))
    sparse = np.asarray(
        sparse_paged_attention(q, jnp.asarray(kv), 0, jnp.asarray(pt),
                               kv_lens, q_start, 0.25, topk_pages=8))
    # bounded delta: the selected pages carry ~all softmax mass
    np.testing.assert_allclose(sparse, dense, rtol=2e-2, atol=2e-2)


def test_sparse_prefill_falls_back_dense():
    rng = np.random.default_rng(3)
    kv_len = 6 * PS
    kv, pt, _, _ = _build_cache(rng, 16, 1, kv_len)
    q = jnp.asarray(rng.standard_normal((1, 4, HQ, D)), jnp.float32)
    kv_lens = jnp.asarray([kv_len], jnp.int32)
    q_start = jnp.asarray([kv_len - 4], jnp.int32)
    dense = paged_attention(q, kv, 0, pt, kv_lens, q_start, 0.25)
    sparse = sparse_paged_attention(q, kv, 0, pt, kv_lens, q_start, 0.25,
                                    topk_pages=2)
    np.testing.assert_array_equal(np.asarray(dense), np.asarray(sparse))


def test_sparse_engine_e2e():
    """Full engine with --attention-backend sparse:<k>: identical to the
    dense engine while contexts fit in k pages, and stable (finite,
    deterministic) beyond."""
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    def mk(backend):
        return Engine(
            server_args=ServerArgs(
                model_path="", tokenizer_path="byte", page_size=8,
                max_total_tokens=4096, attention_backend=backend,
                context_length=512, random_seed=0),
            model_config=ModelConfig.tiny_llama(vocab_size=512),
            tokenizer=ByteTokenizer())

    sp = SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True)
    short = ["hello sparse world"]  # fits in topk pages -> exact
    dense_eng = mk("xla")
    sparse_eng = mk("sparse:8")
    ref = dense_eng.generate(short, sp)
    out = sparse_eng.generate(short, sp)
    assert ref[0]["output_ids"] == out[0]["output_ids"]

    long_prompt = ["long context " * 25]  # ~326 tokens >> 8 pages * 8 toks
    outs = sparse_eng.generate(long_prompt, sp)
    assert len(outs[0]["output_ids"]) == 12
    again = sparse_eng.generate(long_prompt, sp)
    assert outs[0]["output_ids"] == again[0]["output_ids"]


# ---------------- KV-sparsity framework (kv/sparsity.py) ----------------

def test_sparsity_framework_algorithms_exact_when_fit():
    """Every registered algorithm is exact when all real pages are
    selected (k >= pages)."""
    from sglang_diffusion_tpu.kv.sparsity import (
        get_sparsity_algorithm,
        parse_sparse_backend,
    )

    rng = np.random.default_rng(5)
    kv_len = 4 * PS
    kv, pt, _, _ = _build_cache(rng, 16, 1, kv_len)
    # extend the page table so the sparse path is actually taken
    pt_wide = jnp.concatenate(
        [pt, jnp.zeros((1, 8), jnp.int32)], axis=1)
    q = jnp.asarray(rng.standard_normal((1, 1, HQ, D)), jnp.float32)
    kv_lens = jnp.asarray([kv_len], jnp.int32)
    q_start = kv_lens - 1
    dense = paged_attention(q, kv, 0, pt_wide, kv_lens, q_start, 0.25)
    for algo in ("landmark", "landmark_fp8", "quest", "recency"):
        fn = get_sparsity_algorithm(algo)
        out = sparse_paged_attention(
            q, kv, 0, pt_wide, kv_lens, q_start, 0.25, topk_pages=6,
            score_fn=fn)
        np.testing.assert_allclose(np.asarray(out), np.asarray(dense),
                                   atol=1e-5,
                                   err_msg=f"algorithm {algo}")


def test_sparse_backend_spec_parsing():
    from sglang_diffusion_tpu.kv.sparsity import parse_sparse_backend

    assert parse_sparse_backend("sparse") == ("landmark", 16)
    assert parse_sparse_backend("sparse:8") == ("landmark", 8)
    assert parse_sparse_backend("sparse:quest") == ("quest", 16)
    assert parse_sparse_backend("sparse:quest:32") == ("quest", 32)
    with pytest.raises(KeyError):
        parse_sparse_backend("sparse:nope")


def test_quest_bound_dominates_landmark():
    """Quest envelope score is an upper bound on the landmark max-dot
    score (same landmark set), per page."""
    from sglang_diffusion_tpu.kv.sparsity import (
        score_landmark,
        score_quest,
    )

    rng = np.random.default_rng(6)
    kv_len = 6 * PS
    kv, pt, _, _ = _build_cache(rng, 16, 1, kv_len)
    q = jnp.asarray(rng.standard_normal((1, 1, HQ, D)), jnp.float32)
    s_lm = np.asarray(score_landmark(q, kv, 0, pt, PS))
    s_q = np.asarray(score_quest(q, kv, 0, pt, PS))
    # per-head-group upper bound => summed score dominates too
    assert np.all(s_q >= s_lm - 1e-4)


def test_sparse_backend_registry_algo_selection():
    from sglang_diffusion_tpu.layers.attention import get_attention_backend

    for spec in ("sparse:quest:8", "sparse:recency", "sparse:24"):
        fn = get_attention_backend(spec)
        assert callable(fn)
    with pytest.raises(KeyError):
        get_attention_backend("sparse:bogus")
