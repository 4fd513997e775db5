"""Session continuation + embeddings tests."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


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


def test_session_multi_turn_prefix_cached(engine):
    sid = engine.open_session()
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    out1 = engine.session_generate(sid, "first turn text here", sp)
    assert len(out1["output_ids"]) == 8
    out2 = engine.session_generate(sid, " second turn", sp)
    # turn 2's prompt includes turn 1 (prompt+completion) -> radix hit
    assert out2["meta_info"]["cached_tokens"] > 0
    assert engine.close_session(sid)
    assert not engine.close_session(sid)


def test_session_matches_manual_concat(engine):
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    sid = engine.open_session()
    o1 = engine.session_generate(sid, "abcd", sp)
    o2 = engine.session_generate(sid, "efgh", sp)
    # manual continuation: same token stream
    ids = engine.tokenizer.encode("abcd") + o1["output_ids"] + engine.tokenizer.encode(
        "efgh", add_bos=False
    )
    ref = engine.generate(input_ids=ids, sampling_params=sp)
    assert ref["output_ids"] == o2["output_ids"]


def test_embeddings(engine):
    out = engine.encode("embed this text")
    emb = np.asarray(out["embedding"])
    assert emb.shape == (engine.model_config.hidden_size,)
    assert np.isfinite(emb).all()
    outs = engine.encode(["a", "b"])
    assert len(outs) == 2
    # deterministic
    out2 = engine.encode("embed this text")
    np.testing.assert_allclose(out["embedding"], out2["embedding"])
    # different inputs differ
    assert not np.allclose(outs[0]["embedding"], outs[1]["embedding"])
