"""Sampling feature tests: penalties, logprobs, n>1 (reference analog:
sampling/penaltylib tests + logprob tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.sampling.sampler import (
    SamplingMetadata,
    apply_penalties,
    sample,
)


@pytest.fixture(scope="module")
def engine():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        attention_backend="xla",
        context_length=512,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    return Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())


def _meta(b, **kw):
    d = dict(
        temperature=np.zeros(b, np.float32),
        top_p=np.ones(b, np.float32),
        top_k=np.full(b, -1, np.int32),
        min_p=np.zeros(b, np.float32),
        frequency_penalty=np.zeros(b, np.float32),
        presence_penalty=np.zeros(b, np.float32),
    )
    d.update({k: np.asarray(v, d[k].dtype) for k, v in kw.items()})
    return SamplingMetadata(**{k: jnp.asarray(v) for k, v in d.items()})


def test_apply_penalties_math():
    logits = jnp.zeros((1, 4))
    counts = jnp.asarray([[2, 1, 0, 0]], jnp.int32)
    out = apply_penalties(
        logits, counts, jnp.asarray([0.5]), jnp.asarray([0.25])
    )
    np.testing.assert_allclose(np.asarray(out), [[-1.25, -0.75, 0.0, 0.0]])


def test_penalties_suppress_repeats_in_sampler():
    # token 0 hugely favored; penalties must push sampling to token 1
    logits = jnp.asarray([[5.0, 4.9, -10.0, -10.0]])
    counts = jnp.asarray([[3, 0, 0, 0]], jnp.int32)
    meta = _meta(1, temperature=[1e-4], frequency_penalty=[1.0])
    tok, _ = sample(logits, meta, jax.random.PRNGKey(0), False, counts)
    assert int(tok[0]) == 1


def test_top_k_masks_tail():
    logits = jnp.asarray([[10.0, 9.0, 8.0, -20.0]])
    meta = _meta(1, temperature=[1.0], top_k=[2])
    picks = set()
    for i in range(20):
        tok, _ = sample(logits, meta, jax.random.PRNGKey(i), False)
        picks.add(int(tok[0]))
    assert picks <= {0, 1}


def test_top_p_masks_tail():
    logits = jnp.asarray([[10.0, 1.0, 1.0, 1.0]])
    meta = _meta(1, temperature=[1.0], top_p=[0.5])
    for i in range(10):
        tok, _ = sample(logits, meta, jax.random.PRNGKey(i), False)
        assert int(tok[0]) == 0


def test_e2e_frequency_penalty_reduces_repetition(engine):
    sp_plain = SamplingParams(temperature=0.0, max_new_tokens=30, ignore_eos=True)
    sp_pen = SamplingParams(
        temperature=0.0,
        max_new_tokens=30,
        ignore_eos=True,
        frequency_penalty=1.5,
    )
    base = engine.generate("aaaa bbbb aaaa", sp_plain)["output_ids"]
    pen = engine.generate("aaaa bbbb aaaa", sp_pen)["output_ids"]
    assert base != pen
    # penalized run must have strictly more distinct tokens or equal
    assert len(set(pen)) >= len(set(base))


def test_logprobs_returned(engine):
    sp = SamplingParams(temperature=0.0, max_new_tokens=5, return_logprob=True)
    out = engine.generate("logprob test", sp)
    lps = out["meta_info"]["output_token_logprobs"]
    assert len(lps) == 5
    for lp, tok in lps:
        assert lp <= 0.0 and isinstance(tok, int)


def test_greedy_vs_sampled_same_dist(engine):
    """all-greedy static path and mixed-batch path agree for temp=0 rows."""
    sp0 = SamplingParams(temperature=0.0, max_new_tokens=6)
    g = engine.generate("determinism probe", sp0)
    # mixed batch: one greedy row + one sampled row via raw steps
    r1 = engine._make_req("determinism probe", None, sp0)
    r2 = engine._make_req(
        "other sampled", None, SamplingParams(temperature=0.9, max_new_tokens=6)
    )
    engine.scheduler.add_request(r1)
    engine.scheduler.add_request(r2)
    for _ in range(40):
        engine.step()
        if r1.finished and r2.finished:
            break
    assert r1.output_ids == g["output_ids"]


def test_per_request_seed_reproducible(engine):
    """Seeded sampling is reproducible and independent of batch makeup."""
    sp = SamplingParams(temperature=0.9, max_new_tokens=8, seed=42, ignore_eos=True)
    a = engine.generate("seeded sampling", sp)
    b = engine.generate("seeded sampling", sp)
    assert a["output_ids"] == b["output_ids"]
    # same request alongside other traffic: same tokens
    outs = engine.generate(
        ["seeded sampling", "other text entirely"],
        [sp, SamplingParams(temperature=0.9, max_new_tokens=8, ignore_eos=True)]
        if False
        else sp,
    )
    # first prompt with same seed should reproduce despite batch change
    assert outs[0]["output_ids"] == a["output_ids"]
    # different seed differs
    sp2 = SamplingParams(temperature=0.9, max_new_tokens=8, seed=7, ignore_eos=True)
    c = engine.generate("seeded sampling", sp2)
    assert c["output_ids"] != a["output_ids"]


def test_priority_scheduling_order():
    """Higher-priority requests are admitted first (reference: Req.priority
    + priority-aware schedule policy)."""
    from sglang_diffusion_tpu.sched.policy import sort_waiting_queue
    from sglang_diffusion_tpu.sched.req import Req
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    def mk(rid, prio):
        r = Req(rid=rid, input_ids=[1, 2, 3],
                sampling_params=SamplingParams(max_new_tokens=4))
        r.priority = prio
        return r

    q = [mk("a", 0), mk("b", 5), mk("c", 0), mk("d", 5)]
    out = sort_waiting_queue("fcfs", q, None)
    assert [r.rid for r in out] == ["b", "d", "a", "c"]  # FIFO within tier
    out = sort_waiting_queue("lof", q, None)
    assert {out[0].rid, out[1].rid} == {"b", "d"}
