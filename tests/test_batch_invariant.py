"""Batch-invariant deterministic inference (reference analog:
srt/batch_invariant_ops/batch_invariant_ops.py — fixed reduction orders).
The TPU-native mechanism is structural: ONE pinned executable (batch /
chunk / page-hint buckets collapsed) means XLA's tiling and reduction
order cannot vary with batch composition, so a request's outputs are
bit-identical whether it runs alone or packed with others."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _engine(**kw):
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=256,
        max_running_requests=8, enable_deterministic_inference=True,
        enable_decode_pipelining=False, **kw,
    )
    return Engine(server_args=args,
                  model_config=ModelConfig.tiny_llama(vocab_size=512),
                  tokenizer=ByteTokenizer())


def test_single_executable_buckets():
    eng = _engine()
    assert eng.runner.bs_buckets == [8]
    assert len(eng.runner.lq_buckets) == 1
    assert eng.runner._pages_hint_for(8) == eng.runner.max_pages_per_seq


def test_logprobs_invariant_to_batch_composition():
    """The same request's logprobs must be bit-identical alone vs packed
    with 7 other requests (the reference's core batch-invariance claim,
    test_deterministic.py)."""
    eng = _engine()
    sp = SamplingParams(temperature=0.0, max_new_tokens=10,
                        ignore_eos=True, return_logprob=True)
    probe = "the probe request text"
    alone = eng.generate(probe, sp)
    others = [f"background request {i} padding" for i in range(7)]
    packed = eng.generate([probe] + others, sp)[0]
    assert alone["output_ids"] == packed["output_ids"]
    a = [lp for lp, _ in alone["meta_info"]["output_token_logprobs"]]
    b = [lp for lp, _ in packed["meta_info"]["output_token_logprobs"]]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_sampled_stream_invariant_with_seed():
    eng = _engine()
    sp = SamplingParams(temperature=0.8, max_new_tokens=12, seed=7,
                        ignore_eos=True)
    alone = eng.generate("seeded sampling probe", sp)
    packed = eng.generate(
        ["seeded sampling probe"] + [f"noise {i}" for i in range(5)],
        sp)[0]
    assert alone["output_ids"] == packed["output_ids"]
