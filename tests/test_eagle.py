"""EAGLE speculative decoding tests (spec/eagle.py).

Reference analog: test/registered/ suites for srt/speculative/eagle_worker.py.
The core invariant is losslessness: greedy output with EAGLE enabled must be
bit-identical to the plain engine, regardless of draft-head quality.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _make_engine(**kw):
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, chunked_prefill_size=32,
        attention_backend="xla", context_length=512, **kw,
    )
    return Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())


PROMPTS = [
    "the quick brown fox jumps over the lazy dog. " * 3,
    "aaaa bbbb aaaa bbbb aaaa",
    "hello world",
]


def test_eagle_lossless_vs_plain():
    """Random draft head: acceptance is ~0 but output must be identical."""
    plain = _make_engine()
    eagle = _make_engine(
        speculative_algorithm="eagle", speculative_num_draft_tokens=3
    )
    sp = SamplingParams(max_new_tokens=24, temperature=0.0)
    ref = [r["output_ids"] for r in plain.generate(PROMPTS, sp)]
    out = [r["output_ids"] for r in eagle.generate(PROMPTS, sp)]
    assert ref == out
    # verify path actually ran (draft bookkeeping is active)
    assert eagle.scheduler.spec_draft_tokens >= 0


def test_eagle_draft_chain_matches_reference():
    """The fused extend+chain call must equal a step-by-step draft forward
    built from the same layer_body (numeric consistency of positions, KV
    writes, and feature feedback)."""
    eng = _make_engine(
        speculative_algorithm="eagle", speculative_num_draft_tokens=4
    )
    drafter = eng.scheduler.drafter
    runner = eng.runner
    cfg = eng.model_config
    E = cfg.hidden_size

    # run one request for a few steps so the drafter has a live state
    sp = SamplingParams(max_new_tokens=8, temperature=0.0)
    eng.generate(["hello world, this is a test prompt"], sp)

    # craft a fresh request-like state manually over scratch pages
    import dataclasses

    from sglang_diffusion_tpu.layers.attention import AttentionMetadata
    from sglang_diffusion_tpu.models.llama import LlamaFamily
    from sglang_diffusion_tpu.ops.norms import rms_norm

    pages = [1, 2]  # arbitrary scratch pages
    page_size = eng.args.page_size
    rng = np.random.RandomState(0)
    n_ext = 5
    ext_tokens = rng.randint(0, cfg.vocab_size, size=(n_ext,))
    ext_feats = rng.randn(n_ext, E).astype(np.float32) * 0.1
    chain_tok = int(rng.randint(0, cfg.vocab_size))
    chain_feat = (rng.randn(E).astype(np.float32) * 0.1)
    k = drafter.k

    # --- fused call via drafter internals ---
    if drafter._draft_fn is None:
        drafter._draft_fn = drafter._build()
    feat_dt = np.dtype(jnp.bfloat16.dtype)
    bb = 1
    te = 16
    ext_tok_a = np.zeros((bb, te), np.int32)
    ext_tok_a[0, :n_ext] = ext_tokens
    ext_f_a = np.zeros((bb, te, E), feat_dt)
    ext_f_a[0, :n_ext] = ext_feats
    ext_pos_a = np.zeros((bb, te), np.int32)
    ext_pos_a[0, :n_ext] = np.arange(n_ext)
    ext_slots_a = np.full((bb, te), -1, np.int32)
    pv = np.asarray(pages)
    p = np.arange(n_ext)
    ext_slots_a[0, :n_ext] = pv[p // page_size] * page_size + p % page_size
    pt = np.zeros((bb, runner.max_pages_per_seq), np.int32)
    pt[0, :2] = pages
    chain_slots = np.full((bb, k), -1, np.int32)
    cp = np.arange(n_ext, n_ext + k)
    chain_slots[0] = pv[cp // page_size] * page_size + cp % page_size

    draft_kv0 = jnp.zeros_like(drafter.draft_kv)
    drafts, _alts, _ = drafter._draft_fn(
        runner.params, drafter.draft_params, draft_kv0,
        jnp.asarray(ext_tok_a), jnp.asarray(ext_f_a),
        jnp.asarray(ext_pos_a), jnp.asarray(ext_slots_a),
        jnp.asarray(np.array([n_ext], np.int32)),
        jnp.asarray(np.array([0], np.int32)),
        jnp.asarray(pt),
        jnp.asarray(np.array([chain_tok], np.int32)),
        jnp.asarray(chain_feat.astype(feat_dt))[None],
        jnp.asarray(np.array([n_ext], np.int32)),
        jnp.asarray(chain_slots),
    )
    drafts = np.asarray(jax.device_get(drafts))[0]

    # --- step-by-step reference: one token at a time, no fused scan ---
    cfg1 = dataclasses.replace(cfg, num_hidden_layers=1)
    layer_body = LlamaFamily.make_layer_body(cfg1, runner._attn_fn)
    dp = drafter.draft_params
    tp = runner.params

    def one(tok, feat, pos, dkv):
        x = jnp.concatenate(
            [jnp.take(tp["embed"], jnp.asarray([[tok]]), axis=0),
             jnp.asarray(feat, feat_dt)[None, None]],
            axis=-1,
        )
        h = jnp.dot(x, dp["fc"])
        slot = pv[pos // page_size] * page_size + pos % page_size
        meta = AttentionMetadata(
            page_table=jnp.asarray(pt),
            kv_lens=jnp.asarray([pos + 1], jnp.int32),
            q_start_pos=jnp.asarray([pos], jnp.int32),
            slot_ids=jnp.asarray([[slot]], jnp.int32),
            logit_idx=jnp.asarray([0], jnp.int32),
        )
        g, dkv = layer_body(
            0, h, dkv, dp["layers"], jnp.asarray([[pos]], jnp.int32), meta
        )
        gn = rms_norm(g[:, 0], dp["final_norm"], cfg.rms_norm_eps)
        w = tp["embed"].T if cfg.tie_word_embeddings else tp["lm_head"]
        logits = jnp.dot(gn, w, preferred_element_type=jnp.float32)
        return int(jnp.argmax(logits[0])), g[0, 0], dkv

    dkv = jnp.zeros_like(drafter.draft_kv)
    # extend one token at a time
    feat = None
    for i in range(n_ext):
        _, _, dkv = one(int(ext_tokens[i]), ext_feats[i], i, dkv)
    # chain
    tok, feat = chain_tok, jnp.asarray(chain_feat, feat_dt)
    got = []
    for j in range(k):
        tok, feat, dkv = one(tok, np.asarray(feat), n_ext + j, dkv)
        got.append(tok)

    assert got == [int(t) for t in drafts]


def test_eagle_oracle_acceptance():
    """With a drafter that proposes the engine's own future greedy tokens,
    drafts get accepted and the output stays deterministic (bookkeeping
    sanity for the eagle verify/extend path).

    Note: exact equality with the PLAIN engine is not asserted — verify
    batches use different query lengths than fused decode, and bf16 argmax
    can flip on near-ties in a random-weight model (the reference has the
    same property unless batch-invariant ops are enabled,
    srt/batch_invariant_ops/)."""
    # pin the per-round path: the fused phase (spec/fused_eagle.py) drafts
    # on device and never calls propose_all, so the oracle monkeypatch
    # below would not see it
    eng = _make_engine(
        speculative_algorithm="eagle", speculative_num_draft_tokens=3,
        enable_decode_pipelining=False,
    )
    ref = _make_engine()
    sp = SamplingParams(max_new_tokens=16, temperature=0.0)
    expected = ref.generate(["abc def ghi"], sp)[0]["output_ids"]

    drafter = eng.scheduler.drafter
    real_propose = drafter.propose_all

    def oracle_propose(reqs):
        real_propose(reqs)  # keep device state maintenance running
        out = []
        for r in reqs:
            n = len(r.output_ids)
            cap = max(0, r.remaining_new_tokens() - 1)
            out.append(list(expected[n : n + min(drafter.k, cap)]))
        return out

    drafter.propose_all = oracle_propose
    got = eng.generate(["abc def ghi"], sp)[0]["output_ids"]
    assert len(got) == 16
    assert eng.scheduler.spec_accepted_tokens > 0
    # the oracle tracks the plain-engine trajectory; most early drafts land
    assert (
        eng.scheduler.spec_accepted_tokens
        >= 0.3 * eng.scheduler.spec_draft_tokens
    )
    # deterministic on repeat (same engine, same drafts replayed)
    eng.scheduler.spec_accepted_tokens = 0
    got2 = eng.generate(["abc def ghi"], sp)[0]["output_ids"]
    assert got2 == got
