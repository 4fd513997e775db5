"""PD disaggregation tests with the fake transfer backend (reference
analog: the disagg CI suite exercising the state machine via
disaggregation/fake/conn.py), plus the forced-retraction regression the
disagg work exposed."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.disagg import FakeTransferBackend, disaggregated_generate
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def make_engine(**over):
    kw = dict(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        attention_backend="xla",
        context_length=512,
        random_seed=0,
    )
    kw.update(over)
    args = ServerArgs(**kw)
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    return Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())


def test_disaggregated_matches_colocated():
    sp = SamplingParams(temperature=0.0, max_new_tokens=16, ignore_eos=True)
    prompt = "disaggregate this prompt across two engines please"
    ref = make_engine().generate(prompt, sp)

    prefill_eng = make_engine()
    decode_eng = make_engine()
    out = disaggregated_generate(prefill_eng, decode_eng, prompt, sp)
    assert out["output_ids"] == ref["output_ids"]
    assert out["meta_info"]["finish_reason"] == "length"
    # the decode engine must not leak pages
    decode_eng.scheduler.self_check_idle()


def test_disaggregated_multiple_requests_share_backend():
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    prefill_eng = make_engine()
    decode_eng = make_engine()
    backend = FakeTransferBackend()
    ref_eng = make_engine()
    for prompt in ["first request", "second longer request " * 3]:
        ref = ref_eng.generate(prompt, sp)
        out = disaggregated_generate(prefill_eng, decode_eng, prompt, sp, backend)
        assert out["output_ids"] == ref["output_ids"], prompt


def test_forced_retraction_recovers_with_outputs():
    """A retracted request re-prefills prompt+generated tokens and finishes
    with identical output (regression: PrefillAdder undercounted fill)."""
    eng = make_engine(max_total_tokens=200, disable_radix_cache=True,
                      context_length=128, chunked_prefill_size=64,
                      max_prefill_tokens=64, decode_horizon=4)
    sp = SamplingParams(temperature=0.0, max_new_tokens=40, ignore_eos=True)
    prompts = ["p1 " * 10, "p2 " * 10, "p3 " * 10]
    outs = eng.generate(prompts, sp)
    assert eng.scheduler.num_retracted > 0, "test must force a retraction"
    ref_eng = make_engine(disable_radix_cache=True)
    for p, o in zip(prompts, outs):
        ref = ref_eng.generate(p, sp)
        assert ref["output_ids"] == o["output_ids"]


def test_http_transfer_backend(tmp_path):
    """Networked PD disaggregation: prefill host POSTs the KV handoff to the
    decode server; greedy output matches single-engine generation
    (reference analog: mooncake/nixl transports + decode queues)."""
    import asyncio
    import json

    from sglang_diffusion_tpu.disagg.transfer import (
        HttpTransferBackend,
        handoff_from_bytes,
        handoff_to_bytes,
        prefill_and_export,
    )
    from sglang_diffusion_tpu.server.api_server import ApiServer
    from tests.test_http_server import http_request

    prefill_eng = make_engine()
    decode_eng = make_engine()
    ref_eng = make_engine()

    sp = SamplingParams(temperature=0.0, max_new_tokens=12)
    prompt = "disaggregate this prompt please " * 2
    ref = ref_eng.generate(prompt, sp)["output_ids"]

    # wire-format roundtrip
    h = prefill_and_export(prefill_eng, prompt, sp)
    h2 = handoff_from_bytes(handoff_to_bytes(h))
    assert h2.input_ids == h.input_ids and h2.first_token == h.first_token
    if h.kv_pages is not None:
        assert h2.kv_pages.dtype == h.kv_pages.dtype
        assert (np.asarray(h2.kv_pages) == np.asarray(h.kv_pages)).all()

    server = ApiServer(decode_eng, decode_eng.args)

    async def scenario():
        await server.start()
        port = server.http.port
        backend = HttpTransferBackend(f"http://127.0.0.1:{port}")
        # blocking urllib send must not run on the event loop
        await asyncio.get_running_loop().run_in_executor(
            None, backend.send, h
        )
        for _ in range(240):
            st, _, data = await http_request(
                port, "GET", f"/disagg/result?rid={h.rid}"
            )
            d = json.loads(data)
            if d["status"] in ("completed", "failed"):
                return d
            await asyncio.sleep(0.25)
        return d

    res = asyncio.run(asyncio.wait_for(scenario(), timeout=300))
    assert res["status"] == "completed", res
    out_ids = [h.first_token] + res["output"]["output_ids"][1:]
    assert res["output"]["output_ids"] == ref
