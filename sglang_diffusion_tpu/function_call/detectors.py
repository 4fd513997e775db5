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
    # real wire format (reference deepseekv3_detector.py:50):
    # <｜tool▁call▁begin｜>function<｜tool▁sep｜>NAME\n```json\n{args}\n```
    _re = re.compile(
        r"<｜tool▁call▁begin｜>.*?<｜tool▁sep｜>\s*([\w.\-]+)\s*\n?"
        r"\s*(?:```(?:json)?\s*)?(\{.*?\})\s*(?:```)?\s*<｜tool▁call▁end｜>",
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


class Qwen25Detector(HermesDetector):
    """Qwen2.5 native format — same <tool_call> blocks as hermes
    (reference: qwen25_detector.py separates with '\\n')."""

    name = "qwen25"


class Qwen3CoderDetector(BaseDetector):
    """Qwen3-Coder XML format (reference: qwen3_coder_detector.py):
    <tool_call><function=NAME><parameter=KEY>VALUE</parameter>...
    </function></tool_call>. Parameter values are typed by best effort
    (JSON literal else string)."""

    name = "qwen3_coder"
    markers = ("<function=",)
    _block = re.compile(r"<tool_call>(.*?)</tool_call>", re.S)
    _fn = re.compile(r"<function=([^>\n]+)>(.*?)</function>", re.S)
    _param = re.compile(r"<parameter=([^>\n]+)>(.*?)</parameter>", re.S)

    def detect(self, text, names):
        calls = []
        spans = []
        for blk in self._block.finditer(text):
            for fm in self._fn.finditer(blk.group(1)):
                fn = fm.group(1).strip()
                if names and fn not in names:
                    continue
                args = {}
                for pm in self._param.finditer(fm.group(2)):
                    args[pm.group(1).strip()] = _coerce(
                        pm.group(2).strip("\n")
                    )
                calls.append(_mk_call(fn, args))
            spans.append(blk.span())
        if not calls:
            return text, []
        normal = _strip_spans(text, spans)
        return (normal or None), calls


class KimiK2Detector(BaseDetector):
    """Kimi-K2 (reference: kimik2_detector.py):
    <|tool_calls_section_begin|><|tool_call_begin|>functions.NAME:IDX
    <|tool_call_argument_begin|>{json}<|tool_call_end|>...
    <|tool_calls_section_end|>."""

    name = "kimi_k2"
    markers = ("<|tool_calls_section_begin|>", "<|tool_call_begin|>")
    _re = re.compile(
        r"<\|tool_call_begin\|>\s*([\w.]+):\d+\s*"
        r"<\|tool_call_argument_begin\|>\s*(\{.*?\})\s*<\|tool_call_end\|>",
        re.S,
    )

    def detect(self, text, names):
        calls = []
        for m in self._re.finditer(text):
            fn = m.group(1).split(".")[-1]  # functions.get_weather -> name
            if names and fn not in names:
                continue
            try:
                args = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            calls.append(_mk_call(fn, args))
        if not calls:
            return text, []
        normal = text.split("<|tool_calls_section_begin|>", 1)[0].strip()
        return (normal or None), calls


class Glm4MoeDetector(BaseDetector):
    """GLM-4.5/4.6 MoE (reference: glm4_moe_detector.py): <tool_call>NAME
    then <arg_key>K</arg_key><arg_value>V</arg_value> pairs."""

    name = "glm4_moe"
    markers = ("<arg_key>",)
    _block = re.compile(r"<tool_call>(.*?)(?:\\n|\n)(.*?)</tool_call>", re.S)
    _arg = re.compile(
        r"<arg_key>(.*?)</arg_key>(?:\\n|\s)*<arg_value>(.*?)</arg_value>",
        re.S,
    )

    def detect(self, text, names):
        calls = []
        spans = []
        for m in self._block.finditer(text):
            fn = m.group(1).strip()
            if names and fn not in names:
                continue
            args = {
                k.strip(): _coerce(v.strip())
                for k, v in self._arg.findall(m.group(2))
            }
            calls.append(_mk_call(fn, args))
            spans.append(m.span())
        if not calls:
            return text, []
        normal = _strip_spans(text, spans)
        return (normal or None), calls


class GptOssDetector(BaseDetector):
    """GPT-OSS harmony commentary channel (reference: gpt_oss_detector.py):
    <|channel|>commentary to=functions.NAME <|constrain|>json
    <|message|>{args}<|call|>."""

    name = "gpt_oss"
    markers = ("<|channel|>commentary to=",)
    _re = re.compile(
        r"<\|channel\|>commentary to=([\w.]+)\s*(?:<\|constrain\|>\w+)?\s*"
        r"<\|message\|>(\{.*?\})\s*<\|call\|>",
        re.S,
    )

    def detect(self, text, names):
        calls = []
        spans = []
        for m in self._re.finditer(text):
            fn = m.group(1).split(".")[-1]
            if names and fn not in names:
                continue
            try:
                args = json.loads(m.group(2))
            except json.JSONDecodeError:
                continue
            calls.append(_mk_call(fn, args))
            spans.append(m.span())
        if not calls:
            return text, []
        normal = _strip_spans(text, spans)
        # drop harmony frame tokens from surrounding text
        normal = re.sub(r"<\|(start|end|return)\|>", "", normal).strip()
        return (normal or None), calls


class PythonicDetector(BaseDetector):
    """Llama-4 pythonic format (reference: pythonic_detector.py):
    [fn1(a=1, b="x"), fn2(c=[1,2])] — python call list, values are python
    literals."""

    name = "pythonic"
    markers = ("[",)
    _list = re.compile(
        r"\[\s*[a-zA-Z_]\w*\s*\(.*?\)\s*(?:,\s*[a-zA-Z_]\w*\s*\(.*?\)\s*)*\]",
        re.S,
    )

    def has_tool_call(self, text: str) -> bool:
        # auto-detect guard: the _list regex matches call-looking spans in
        # ordinary prose ("[see(figure)]", markdown "[f(x)]"); only claim
        # the text when the model used the explicit wrapper or the WHOLE
        # (stripped) output is the call list (explicit
        # tool_call_parser="pythonic" still parses embedded lists)
        if "<|python_start|>" in text:
            return True
        m = self._list.fullmatch(text.strip())
        return bool(m)

    def detect(self, text, names):
        import ast

        t = text.replace("<|python_start|>", "").replace("<|python_end|>", "")
        m = self._list.search(t)
        if not m:
            return text, []
        try:
            tree = ast.parse(m.group(0).strip(), mode="eval")
        except SyntaxError:
            return text, []
        if not isinstance(tree.body, ast.List):
            return text, []
        calls = []
        for el in tree.body.elts:
            if not (
                isinstance(el, ast.Call) and isinstance(el.func, ast.Name)
            ):
                return text, []
            fn = el.func.id
            if names and fn not in names:
                continue
            try:
                args = {
                    kw.arg: ast.literal_eval(kw.value) for kw in el.keywords
                }
            except (ValueError, SyntaxError):
                continue
            calls.append(_mk_call(fn, args))
        if not calls:
            return text, []
        normal = (t[: m.start()] + t[m.end() :]).strip()
        return (normal or None), calls


class Step3Detector(BaseDetector):
    """Step-3 steptml XML (reference: step3_detector.py):
    <｜tool_calls_begin｜>...<steptml:invoke name="fn">
    <steptml:parameter name="k">v</steptml:parameter></steptml:invoke>..."""

    name = "step3"
    markers = ("<steptml:invoke",)
    _invoke = re.compile(
        r'<steptml:invoke name="([^"]+)">(.+?)</steptml:invoke>', re.S
    )
    _param = re.compile(
        r'<steptml:parameter name="([^"]+)">([^<]*)</steptml:parameter>', re.S
    )

    def detect(self, text, names):
        calls = []
        for m in self._invoke.finditer(text):
            fn = m.group(1)
            if names and fn not in names:
                continue
            args = {
                k: _coerce(v.strip()) for k, v in self._param.findall(m.group(2))
            }
            calls.append(_mk_call(fn, args))
        if not calls:
            return text, []
        normal = text.split("<｜tool_calls_begin｜>", 1)[0].strip()
        return (normal or None), calls


class DeepSeekV31Detector(BaseDetector):
    """DeepSeek-V3.1 flat format (reference deepseekv31_detector.py:29):
    <｜tool▁call▁begin｜>NAME<｜tool▁sep｜>{json}<｜tool▁call▁end｜> — the
    name sits directly before the sep (no `function` keyword) and the
    arguments are a bare JSON object (no ```json fence)."""

    name = "deepseekv31"
    markers = ("<｜tool▁calls▁begin｜>",)
    _re = re.compile(
        r"<｜tool▁call▁begin｜>\s*([\w.\-]+)<｜tool▁sep｜>\s*(\{.*?\})\s*"
        r"<｜tool▁call▁end｜>",
        re.S,
    )

    def detect(self, text, names):
        calls = []
        for m in self._re.finditer(text):
            fn, payload = m.group(1), m.group(2)
            if names and fn not in names:
                continue
            try:
                calls.append(_mk_call(fn, json.loads(payload)))
            except json.JSONDecodeError:
                continue
        if not calls:
            return text, []
        normal = text.split("<｜tool▁calls▁begin｜>", 1)[0].strip()
        return (normal or None), calls


class DeepSeekV32Detector(BaseDetector):
    """DeepSeek-V3.2 DSML format (reference deepseekv32_detector.py:22):
    <｜DSML｜function_calls> wrapping <｜DSML｜invoke name="fn"> blocks whose
    body is either typed parameter tags
    <｜DSML｜parameter name="k" string="true">v</｜DSML｜parameter>
    or a direct JSON object."""

    name = "deepseekv32"
    markers = ("<｜DSML｜function_calls>",)
    _invoke = re.compile(
        r'<｜DSML｜invoke name="([^"]+)">(.*?)</｜DSML｜invoke>', re.S
    )
    _param = re.compile(
        r'<｜DSML｜parameter name="([^"]+)"([^>]*)>(.*?)</｜DSML｜parameter>',
        re.S,
    )

    def detect(self, text, names):
        calls = []
        for m in self._invoke.finditer(text):
            fn, body = m.group(1), m.group(2)
            if names and fn not in names:
                continue
            params = self._param.findall(body)
            if params:
                args = {}
                for k, attrs, v in params:
                    v = v.strip()
                    # string="true" pins the value as a raw string;
                    # otherwise JSON-literal coerce (numbers/bools/objects)
                    args[k] = v if 'string="true"' in attrs else _coerce(v)
            else:
                stripped = body.strip()
                try:
                    args = json.loads(stripped) if stripped else {}
                except json.JSONDecodeError:
                    continue
            calls.append(_mk_call(fn, args))
        if not calls:
            return text, []
        normal = text.split("<｜DSML｜function_calls>", 1)[0].strip()
        return (normal or None), calls


class GigaChat3Detector(BaseDetector):
    """GigaChat-3 role-separated call (reference gigachat3_detector.py:16):
    CONTENT<|message_sep|>function call<|role_sep|>\\n{"name":..,
    "arguments": {..}} — one call per response, content before the
    message separator."""

    name = "gigachat3"
    markers = ("function call<|role_sep|>",)
    _call = re.compile(r"function call<\|role_sep\|>\n(.*)", re.S)

    def detect(self, text, names):
        t = text
        if t.rstrip().endswith("</s>"):
            t = t[: t.rfind("</s>")]
        m = self._call.search(t)
        if not m:
            return text, []
        try:
            obj = json.loads(m.group(1), strict=False)
        except json.JSONDecodeError:
            return text, []
        call = _obj_to_call(obj, names)
        if call is None or not isinstance(obj.get("arguments"), dict):
            return text, []
        normal = t[: m.start()]
        normal = normal.split("<|message_sep|>", 1)[0].strip()
        return (normal or None), [call]


class Glm47MoeDetector(Glm4MoeDetector):
    """GLM-4.7 uses the same <tool_call>NAME<arg_key>..<arg_value>.. block
    format as GLM-4-MoE (reference glm47_moe_detector.py:145 differs only
    in streaming-side value typing)."""

    name = "glm47_moe"


class InternlmDetector(BaseDetector):
    """InternLM2 / Intern-S1 plugin format (reference
    internlm_detector.py:30): text<|action_start|> <|plugin|>\\n{json}
    <|action_end|>; the json carries name + parameters/arguments."""

    name = "internlm"
    markers = ("<|action_start|>",)
    _re = re.compile(
        r"<\|action_start\|>\s*<\|plugin\|>\s*(\{.*?\})\s*<\|action_end\|>",
        re.S,
    )

    def detect(self, text, names):
        calls, spans = [], []
        for m in self._re.finditer(text):
            try:
                call = _obj_to_call(json.loads(m.group(1)), names)
            except json.JSONDecodeError:
                call = None
            if call:
                calls.append(call)
                spans.append(m.span())
        if not calls:
            return text, []
        return (_strip_spans(text, spans) or None), calls


class Lfm2Detector(BaseDetector):
    """LFM2 bracketed call list (reference lfm2_detector.py:4):
    <|tool_call_start|>[fn(a="v"), ...]<|tool_call_end|> — pythonic call
    list, or a JSON array of {"name","arguments"} objects."""

    name = "lfm2"
    markers = ("<|tool_call_start|>",)
    _re = re.compile(
        r"<\|tool_call_start\|>\s*(\[.*?\])\s*<\|tool_call_end\|>", re.S
    )

    def detect(self, text, names):
        import ast

        calls, spans = [], []
        for m in self._re.finditer(text):
            body = m.group(1)
            got = []
            try:  # JSON array form first
                arr = json.loads(body)
                if isinstance(arr, list):
                    got = [c for c in (_obj_to_call(o, names) for o in arr)
                           if c]
            except json.JSONDecodeError:
                try:  # pythonic form
                    tree = ast.parse(body.strip(), mode="eval")
                    if isinstance(tree.body, ast.List):
                        for el in tree.body.elts:
                            if not (isinstance(el, ast.Call)
                                    and isinstance(el.func, ast.Name)):
                                continue
                            if names and el.func.id not in names:
                                continue
                            args = {
                                kw.arg: ast.literal_eval(kw.value)
                                for kw in el.keywords
                            }
                            got.append(_mk_call(el.func.id, args))
                except (SyntaxError, ValueError):
                    got = []
            if got:
                calls.extend(got)
                spans.append(m.span())
        if not calls:
            return text, []
        return (_strip_spans(text, spans) or None), calls


class MimoDetector(BaseDetector):
    """MiMo format (reference mimo_detector.py:138): qwen3-coder-style
    <function=NAME><parameter=K>V</parameter></function> body wrapped in
    <tool_call>..</tool_call>."""

    name = "mimo"
    markers = ("<tool_call>\n<function=", "<tool_call><function=")
    _func = re.compile(r"<function=([^>\n]+)>(.*?)</function>", re.S)
    _param = re.compile(r"<parameter=([^>\n]+)>(.*?)</parameter>", re.S)
    _block = re.compile(r"<tool_call>(.*?)</tool_call>", re.S)

    def detect(self, text, names):
        calls, spans = [], []
        for bm in self._block.finditer(text):
            got = []
            for m in self._func.finditer(bm.group(1)):
                fn = m.group(1).strip()
                if names and fn not in names:
                    continue
                args = {
                    k.strip(): _coerce(v.strip("\n"))
                    for k, v in self._param.findall(m.group(2))
                }
                got.append(_mk_call(fn, args))
            if got:
                calls.extend(got)
                spans.append(bm.span())
        if not calls:
            return text, []
        return (_strip_spans(text, spans) or None), calls


class MinimaxM2Detector(BaseDetector):
    """MiniMax-M2 XML invokes (reference minimax_m2.py:17):
    <minimax:tool_call><invoke name="fn"><parameter name="k">v</parameter>
    </invoke></minimax:tool_call>."""

    name = "minimax_m2"
    markers = ("<minimax:tool_call>",)
    _invoke = re.compile(r'<invoke name="([^"]+)">(.*?)</invoke>', re.S)
    _param = re.compile(r'<parameter name="([^"]+)">(.*?)</parameter>', re.S)

    def detect(self, text, names):
        calls = []
        for m in self._invoke.finditer(text):
            fn = m.group(1)
            if names and fn not in names:
                continue
            args = {
                k: _coerce(v.strip()) for k, v in self._param.findall(m.group(2))
            }
            calls.append(_mk_call(fn, args))
        if not calls:
            return text, []
        normal = text.split("<minimax:tool_call>", 1)[0].strip()
        return (normal or None), calls


class TrinityDetector(Qwen25Detector):
    """Trinity: qwen25 <tool_call> blocks that may sit inside <think>
    sections (reference trinity_detector.py:11 strips the think tags,
    keeping their content, before parsing)."""

    name = "trinity"

    def _strip(self, text: str) -> str:
        return text.replace("<think>", "").replace("</think>", "")

    def has_tool_call(self, text: str) -> bool:
        return super().has_tool_call(self._strip(text))

    def detect(self, text, names):
        return super().detect(self._strip(text), names)


def _coerce(v: str):
    """Best-effort typing for XML-ish parameter values: JSON literal if it
    parses, else the raw string (reference detectors type by tool schema;
    JSON-literal coercion covers numbers/bools/null/objects/arrays)."""
    try:
        return json.loads(v)
    except (json.JSONDecodeError, ValueError):
        return v


def _strip_spans(text: str, spans) -> str:
    out = []
    last = 0
    for a, b in spans:
        out.append(text[last:a])
        last = b
    out.append(text[last:])
    return "".join(out).strip()


# insertion order = auto-detect priority: detectors with more specific
# markers first (GLM4/qwen3-coder blocks also contain <tool_call>, so
# hermes must come after them)
_DETECTORS = {
    d.name: d for d in (
        MimoDetector(), Qwen3CoderDetector(), Glm4MoeDetector(),
        Glm47MoeDetector(), KimiK2Detector(), GptOssDetector(),
        Step3Detector(), MinimaxM2Detector(), DeepSeekV32Detector(),
        DeepSeekDetector(), DeepSeekV31Detector(), GigaChat3Detector(),
        InternlmDetector(), Lfm2Detector(), MistralDetector(),
        Llama3Detector(), HermesDetector(), Qwen25Detector(),
        TrinityDetector(), PythonicDetector(),
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
