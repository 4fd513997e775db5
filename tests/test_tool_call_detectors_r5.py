"""Round-5 tool-call detector families (reference analogs:
srt/function_call/{deepseekv31,deepseekv32,gigachat3,glm47_moe,internlm,
lfm2,mimo,minimax_m2,trinity}_detector.py)."""

import json

from sglang_diffusion_tpu.function_call.detectors import (
    DeepSeekV31Detector,
    DeepSeekV32Detector,
    GigaChat3Detector,
    Glm47MoeDetector,
    InternlmDetector,
    Lfm2Detector,
    MimoDetector,
    MinimaxM2Detector,
    TrinityDetector,
    get_detector,
)
from sglang_diffusion_tpu.function_call.streaming import StreamingToolParser

NAMES = {"get_weather", "search", "calculator"}


def _stream(fmt, text, chunk=7):
    p = StreamingToolParser(fmt)
    normal, deltas = [], []
    for i in range(0, len(text), chunk):
        n, d = p.feed(text[i:i + chunk])
        normal.append(n)
        deltas.extend(d)
    n, d = p.flush()
    normal.append(n)
    deltas.extend(d)
    return "".join(normal), deltas


def _assemble(deltas):
    calls = {}
    for d in deltas:
        c = calls.setdefault(d["index"], {"name": None, "args": ""})
        fn = d.get("function", {})
        if fn.get("name"):
            c["name"] = fn["name"]
        c["args"] += fn.get("arguments", "")
    return [calls[i] for i in sorted(calls)]


def test_deepseekv31_flat_format():
    text = (
        "ok<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>get_weather"
        '<｜tool▁sep｜>{"city": "Tokyo"}<｜tool▁call▁end｜>'
        "<｜tool▁call▁begin｜>search<｜tool▁sep｜>"
        '{"q": "x"}<｜tool▁call▁end｜><｜tool▁calls▁end｜>'
    )
    normal, calls = DeepSeekV31Detector().detect(text, NAMES)
    assert normal == "ok"
    assert [c["function"]["name"] for c in calls] == ["get_weather", "search"]
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Tokyo"}

    _, deltas = _stream("deepseekv31", text)
    got = _assemble(deltas)
    assert got[0]["name"] == "get_weather"
    assert json.loads(got[0]["args"]) == {"city": "Tokyo"}
    assert got[1]["name"] == "search"


def test_deepseekv32_dsml_param_tags_and_json():
    text = (
        "<｜DSML｜function_calls>"
        '<｜DSML｜invoke name="get_weather">'
        '<｜DSML｜parameter name="city" string="true">42</｜DSML｜parameter>'
        '<｜DSML｜parameter name="days">3</｜DSML｜parameter>'
        "</｜DSML｜invoke>"
        '<｜DSML｜invoke name="search">{"q": "jax"}</｜DSML｜invoke>'
        "</｜DSML｜function_calls>"
    )
    normal, calls = DeepSeekV32Detector().detect(text, NAMES)
    args0 = json.loads(calls[0]["function"]["arguments"])
    assert args0 == {"city": "42", "days": 3}  # string="true" pins str
    assert json.loads(calls[1]["function"]["arguments"]) == {"q": "jax"}

    _, deltas = _stream("deepseekv32", text)
    got = _assemble(deltas)
    assert got[0]["name"] == "get_weather"
    assert json.loads(got[0]["args"]) == {"city": "42", "days": 3}
    assert json.loads(got[1]["args"]) == {"q": "jax"}


def test_gigachat3_role_sep():
    text = (
        "I will check the weather.<|message_sep|>function call<|role_sep|>\n"
        '{"name": "get_weather", "arguments": {"city": "SPB"}}</s>'
    )
    normal, calls = GigaChat3Detector().detect(text, NAMES)
    assert normal == "I will check the weather."
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "SPB"}


def test_glm47_same_block_format():
    text = (
        "<tool_call>get_weather\n"
        "<arg_key>city</arg_key>\n<arg_value>Beijing</arg_value>\n"
        "</tool_call>"
    )
    det = Glm47MoeDetector()
    assert det.name == "glm47_moe"
    _, calls = det.detect(text, NAMES)
    assert calls[0]["function"]["name"] == "get_weather"


def test_internlm_plugin_format():
    text = (
        "What's the weather?<|action_start|> <|plugin|>\n"
        '{"name": "get_weather", "parameters": {"location": "Tokyo"}}'
        "<|action_end|>"
    )
    normal, calls = InternlmDetector().detect(text, NAMES)
    assert normal == "What's the weather?"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "location": "Tokyo"}

    _, deltas = _stream("internlm", text)
    got = _assemble(deltas)
    assert got[0]["name"] == "get_weather"


def test_lfm2_pythonic_and_json_forms():
    py = '<|tool_call_start|>[calculator(expression="5 * 7")]<|tool_call_end|>'
    _, calls = Lfm2Detector().detect(py, NAMES)
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "expression": "5 * 7"}

    js = ('<|tool_call_start|>[{"name": "search", "arguments": '
          '{"q": "x"}}, {"name": "get_weather", "arguments": '
          '{"city": "LA"}}]<|tool_call_end|>')
    _, calls = Lfm2Detector().detect(js, NAMES)
    assert [c["function"]["name"] for c in calls] == [
        "search", "get_weather"]

    _, deltas = _stream("lfm2", py)
    got = _assemble(deltas)
    assert got[0]["name"] == "calculator"
    assert json.loads(got[0]["args"]) == {"expression": "5 * 7"}


def test_mimo_wrapped_function_blocks():
    text = (
        "Let me run it.\n<tool_call>\n<function=search>\n"
        "<parameter=q>pwd && ls</parameter>\n</function>\n</tool_call>"
    )
    normal, calls = MimoDetector().detect(text, NAMES)
    assert normal == "Let me run it."
    assert calls[0]["function"]["name"] == "search"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "q": "pwd && ls"}

    _, deltas = _stream("mimo", text)
    got = _assemble(deltas)
    assert got[0]["name"] == "search"


def test_minimax_m2_invokes():
    text = (
        "sure<minimax:tool_call>\n"
        '<invoke name="get_weather">\n'
        '<parameter name="city">Shanghai</parameter>\n'
        '<parameter name="days">2</parameter>\n'
        "</invoke>\n</minimax:tool_call>"
    )
    normal, calls = MinimaxM2Detector().detect(text, NAMES)
    assert normal == "sure"
    assert json.loads(calls[0]["function"]["arguments"]) == {
        "city": "Shanghai", "days": 2}

    _, deltas = _stream("minimax_m2", text)
    got = _assemble(deltas)
    assert got[0]["name"] == "get_weather"
    assert json.loads(got[0]["args"])["city"] == "Shanghai"


def test_trinity_strips_think_tags():
    text = (
        "<think>I should call the tool.\n"
        '<tool_call>{"name": "search", "arguments": {"q": "z"}}</tool_call>'
        "</think>"
    )
    normal, calls = TrinityDetector().detect(text, NAMES)
    assert calls and calls[0]["function"]["name"] == "search"
    assert "think" not in (normal or "")


def test_registry_has_all_round5_formats():
    for fmt in ("deepseekv31", "deepseekv32", "gigachat3", "glm47_moe",
                "internlm", "lfm2", "mimo", "minimax_m2", "trinity"):
        assert get_detector(fmt).name == fmt
