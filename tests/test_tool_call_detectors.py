"""Model-specific tool-call detectors (reference analog:
srt/function_call/*_detector.py)."""

import json

import pytest

from sglang_diffusion_tpu.function_call.detectors import (
    DeepSeekDetector,
    HermesDetector,
    Llama3Detector,
    MistralDetector,
    auto_detect,
    get_detector,
)
from sglang_diffusion_tpu.function_call.parser import FunctionCallParser

NAMES = {"get_weather", "search"}


def test_hermes_blocks():
    text = (
        'Let me check.\n<tool_call>\n{"name": "get_weather", '
        '"arguments": {"city": "Paris"}}\n</tool_call>'
        '<tool_call>{"name": "search", "arguments": {"q": "x"}}</tool_call>'
    )
    normal, calls = HermesDetector().detect(text, NAMES)
    assert normal == "Let me check."
    assert [c["function"]["name"] for c in calls] == ["get_weather", "search"]
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Paris"}


def test_llama3_python_tag_and_parallel():
    text = (
        '<|python_tag|>{"name": "get_weather", "parameters": {"city": "NYC"}}'
        '; {"name": "search", "parameters": {"q": "y"}}'
    )
    normal, calls = Llama3Detector().detect(text, NAMES)
    assert normal is None
    assert len(calls) == 2
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "NYC"}


def test_mistral_tool_calls():
    text = (
        "Sure. [TOOL_CALLS] "
        '[{"name": "get_weather", "arguments": {"city": "SF"}}]'
    )
    normal, calls = MistralDetector().detect(text, NAMES)
    assert normal == "Sure."
    assert calls[0]["function"]["name"] == "get_weather"


def test_deepseek_blocks():
    text = (
        "thinking...<｜tool▁calls▁begin｜><｜tool▁call▁begin｜>function"
        "<｜tool▁sep｜>get_weather\n```json\n"  # some variants add fences
        '{"city": "Tokyo"}\n```<｜tool▁call▁end｜><｜tool▁calls▁end｜>'
    )
    normal, calls = DeepSeekDetector().detect(text, NAMES)
    assert normal == "thinking..."
    assert calls[0]["function"]["name"] == "get_weather"
    assert json.loads(calls[0]["function"]["arguments"]) == {"city": "Tokyo"}


def test_auto_detect_and_parser_integration():
    tools = [{"function": {"name": "get_weather", "parameters": {}}}]
    p = FunctionCallParser(tools)  # auto
    text = '<tool_call>{"name": "get_weather", "arguments": {}}</tool_call>'
    normal, calls = p.parse(text)
    assert calls and calls[0]["function"]["name"] == "get_weather"
    # named format
    p2 = FunctionCallParser(tools, fmt="mistral")
    normal, calls = p2.parse(
        '[TOOL_CALLS] [{"name": "get_weather", "arguments": {}}]'
    )
    assert calls
    # generic JSON fallback still works
    normal, calls = p.parse('{"name": "get_weather", "arguments": {}}')
    assert calls


def test_unknown_name_filtered_and_plain_text_passthrough():
    normal, calls = HermesDetector().detect(
        '<tool_call>{"name": "nope", "arguments": {}}</tool_call>', NAMES
    )
    assert calls == []
    p = FunctionCallParser([{"function": {"name": "get_weather"}}])
    normal, calls = p.parse("just a plain answer")
    assert normal == "just a plain answer" and calls == []
    with pytest.raises(KeyError):
        get_detector("nope")
    assert auto_detect("hello") is None
