"""Model-specific tool-call detectors.

Reference analog: srt/function_call/*_detector.py (~30 per-model formats).
Each detector recognizes one model family's native tool-call syntax and
extracts OpenAI-format calls plus the surrounding normal text. The registry
picks a detector by name (`tool_call_parser` server arg) or auto-detects by
scanning for format markers.

Formats covered:
- "json"      generic bare-JSON protocol (the round-1 default)
- "hermes"    <tool_call>{...}</tool_call>                (Qwen2.5/Hermes)
- "llama3"    <|python_tag|>{...} or bare json            (Llama-3.x)
- "mistral"   [TOOL_CALLS] [{...}, ...]                   (Mistral/Mixtral)
- "deepseek"  the V3 unicode tool-call block format       (DeepSeek-V3)
"""

from __future__ import annotations

import json
import re
import uuid
from typing import Any, Dict, List, Optional, Tuple


def _mk_call(name: str, arguments: Any) -> Dict[str, Any]:
    if not isinstance(arguments, str):
        arguments = json.dumps(arguments)
    return {
        "id": f"call_{uuid.uuid4().hex[:16]}",
        "type": "function",
        "function": {"name": name, "arguments": arguments},
    }


def _obj_to_call(obj: Any, names) -> Optional[Dict[str, Any]]:
    if not isinstance(obj, dict) or not isinstance(obj.get("name"), str):
        return None
    if names and obj["name"] not in names:
        return None
    args = obj.get("arguments", obj.get("parameters", {}))
    return _mk_call(obj["name"], args)


class BaseDetector:
    name = "base"
    markers: Tuple[str, ...] = ()

    def has_tool_call(self, text: str) -> bool:
        return any(m in text for m in self.markers)

    def detect(self, text: str, names) -> Tuple[Optional[str], List[Dict]]:
        raise NotImplementedError


class HermesDetector(BaseDetector):
    """<tool_call>{json}</tool_call> blocks (Qwen2.5 / Hermes / GLM)."""

    name = "hermes"
    markers = ("<tool_call>",)
    _re = re.compile(r"<tool_call>\s*(\{.*?\})\s*</tool_call>", re.S)

    def detect(self, text, names):
        calls = []
        for m in self._re.finditer(text):
            try:
                call = _obj_to_call(json.loads(m.group(1)), names)
            except json.JSONDecodeError:
                call = None
            if call:
                calls.append(call)
        normal = self._re.sub("", text).strip()
        return (normal or None), calls


class Llama3Detector(BaseDetector):
    """<|python_tag|>{json} or a bare JSON object ({"name":..,
    "parameters":..}) as llama-3.1 emits with the JSON tool prompt."""

    name = "llama3"
    markers = ("<|python_tag|>", '{"name"')

    def detect(self, text, names):
        body = text.split("<|python_tag|>", 1)
        normal = body[0].strip() if len(body) > 1 else ""
        payload = body[-1]
        calls = []
        # llama3 separates parallel calls with ";"
        for chunk in payload.split(";"):
            chunk = chunk.strip()
            if not chunk.startswith("{"):
                continue
            try:
                call = _obj_to_call(json.loads(chunk), names)
            except json.JSONDecodeError:
                call = None
            if call:
                calls.append(call)
        if not calls:
            return text, []
        return (normal or None), calls


class MistralDetector(BaseDetector):
    """[TOOL_CALLS] [{...}, {...}] (Mistral v3 tokenizer format)."""

    name = "mistral"
    markers = ("[TOOL_CALLS]",)

    def detect(self, text, names):
        if "[TOOL_CALLS]" not in text:
            return text, []
        normal, payload = text.split("[TOOL_CALLS]", 1)
        payload = payload.strip()
        # the payload is a JSON array (possibly followed by junk)
        arr = None
        for end in range(len(payload), 0, -1):
            if payload[end - 1] == "]":
                try:
                    arr = json.loads(payload[:end])
                    break
                except json.JSONDecodeError:
                    continue
        calls = []
        if isinstance(arr, list):
            for obj in arr:
                call = _obj_to_call(obj, names)
                if call:
                    calls.append(call)
        if not calls:
            return text, []
        return (normal.strip() or None), calls


class DeepSeekDetector(BaseDetector):
    """DeepSeek-V3 tool-call blocks:
    <｜tool▁calls▁begin｜>..<｜tool▁call▁begin｜>fn<｜tool▁sep｜>{json}<｜tool▁call▁end｜>..."""

    name = "deepseek"
    markers = ("<｜tool▁calls▁begin｜>", "<｜tool▁call▁begin｜>")
    _re = re.compile(
        r"<｜tool▁call▁begin｜>.*?(\w[\w.\-]*)\n?<｜tool▁sep｜>"
        r"\s*(\{.*?\})\s*(?:```)?\s*<｜tool▁call▁end｜>",
        re.S,
    )

    def detect(self, text, names):
        calls = []
        for m in self._re.finditer(text):
            fn, payload = m.group(1), m.group(2)
            if names and fn not in names:
                continue
            try:
                args = json.loads(payload)
            except json.JSONDecodeError:
                continue
            calls.append(_mk_call(fn, args))
        if not calls:
            return text, []
        normal = text.split("<｜tool▁calls▁begin｜>", 1)[0].strip()
        return (normal or None), calls


_DETECTORS = {
    d.name: d for d in (
        HermesDetector(), Llama3Detector(), MistralDetector(),
        DeepSeekDetector(),
    )
}


def get_detector(name: str) -> BaseDetector:
    if name not in _DETECTORS:
        raise KeyError(f"unknown tool-call format {name}; "
                       f"have {sorted(_DETECTORS)} + 'json'")
    return _DETECTORS[name]


def auto_detect(text: str) -> Optional[BaseDetector]:
    for det in _DETECTORS.values():
        if det.has_tool_call(text):
            return det
    return None
