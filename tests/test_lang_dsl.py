"""Frontend DSL tests (reference analog: lang/ interpreter tests)."""

import numpy as np
import pytest

import sglang_diffusion_tpu.lang as sgl
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


def test_gen_capture(engine):
    @sgl.function
    def prog(s, q):
        s += "Q: " + q + "\n"
        s += "A: " + sgl.gen("answer", max_tokens=6)

    st = prog.run(engine=engine, q="why")
    assert "answer" in st
    assert st.text.startswith("Q: why\nA: ")
    assert st.text.endswith(st["answer"])


def test_multi_gen_chained(engine):
    @sgl.function
    def prog(s):
        s += "step one: " + sgl.gen("a", max_tokens=4)
        s += "\nstep two: " + sgl.gen("b", max_tokens=4)

    st = prog.run(engine=engine)
    assert "a" in st and "b" in st


def test_select_scores_choices(engine):
    @sgl.function
    def prog(s):
        s += "The answer is "
        s += sgl.select("choice", choices=["yes", "no"])

    st = prog.run(engine=engine)
    assert st["choice"] in ("yes", "no")
    scores = st.meta["choice"]["scores"]
    assert len(scores) == 2 and scores[0] != scores[1]


def test_select_is_consistent_with_scoring(engine):
    scores = engine.score_choices("The answer is ", ["yes", "no"])
    best = ["yes", "no"][int(np.argmax(scores))]

    @sgl.function
    def prog(s):
        s += "The answer is "
        s += sgl.select("c", choices=["yes", "no"])

    assert prog.run(engine=engine)["c"] == best


def test_fork(engine):
    @sgl.function
    def prog(s):
        s += "shared prefix for forking "

    st = prog.run(engine=engine)
    forks = st.fork(2)
    for i, f in enumerate(forks):
        f += sgl.gen(f"g{i}", max_tokens=3)
    assert forks[0].text.startswith(st.text)
    assert forks[1].text.startswith(st.text)


def test_gen_with_regex(engine):
    @sgl.function
    def prog(s):
        s += "verdict: "
        s += sgl.gen("v", max_tokens=8, regex="(true|false)")

    st = prog.run(engine=engine)
    assert st["v"] in ("true", "false")


def test_runtime_endpoint_backend():
    """@function programs run against a LIVE server over HTTP (reference:
    lang/backend RuntimeEndpoint)."""
    import asyncio
    import threading

    from sglang_diffusion_tpu.lang import (
        RuntimeEndpoint,
        function,
        gen,
        select,
        set_default_backend,
    )
    from tests.test_http_server import make_server

    server = make_server()
    loop = asyncio.new_event_loop()

    async def _start():
        await server.start()

    t = threading.Thread(target=loop.run_forever, daemon=True)
    t.start()
    asyncio.run_coroutine_threadsafe(_start(), loop).result(timeout=60)
    try:
        ep = RuntimeEndpoint(f"http://127.0.0.1:{server.http.port}")
        set_default_backend(ep)

        @function
        def prog(s):
            s += "pick: "
            s += select("c", ["aa", "bb"])
            s += gen("out", max_tokens=4, temperature=0.0)

        st = prog.run()  # default backend
        assert st["c"] in ("aa", "bb")
        assert len(st["out"]) > 0
        assert st.text.startswith("pick: " + st["c"])
    finally:
        set_default_backend(None)
        asyncio.run_coroutine_threadsafe(server.stop(), loop).result(timeout=30)
        loop.call_soon_threadsafe(loop.stop)
