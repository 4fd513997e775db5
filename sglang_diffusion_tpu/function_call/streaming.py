"""Incremental (streaming) tool-call parsing.

Reference analog: srt/function_call/base_format_detector.py:119
`parse_streaming_increment` — OpenAI-compatible clients expect
`tool_calls` deltas while the model is still generating: the function
name as soon as it is known, then the argument string in increments.

Design (original, char-level): an outer marker state machine splits the
stream into normal text and call bodies (holding back partial marker
matches at chunk boundaries), and a per-call body parser emits the name
once complete and streams the raw JSON argument value as it arrives
(no re-serialization — clients concatenate the increments verbatim).
"""

from __future__ import annotations

import json
import re
import uuid
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple


def _partial_tail(text: str, token: str) -> int:
    """Longest suffix of text that is a proper prefix of token."""
    for k in range(min(len(text), len(token) - 1), 0, -1):
        if token.startswith(text[-k:]):
            return k
    return 0


def _json_value_span(s: str) -> Tuple[int, bool]:
    """Span of the JSON value at the start of s (after optional
    whitespace). Returns (chars consumed so far, value complete?).
    While incomplete, every scanned char is part of the value."""
    i = 0
    n = len(s)
    while i < n and s[i] in " \t\r\n":
        i += 1
    if i >= n:
        return i, False
    depth = 0
    in_str = False
    esc = False
    start = i
    for j in range(start, n):
        c = s[j]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
                if depth == 0:
                    return j + 1, True  # bare string value
        elif c == '"':
            in_str = True
        elif c in "{[":
            depth += 1
        elif c in "}]":
            depth -= 1
            if depth == 0:
                return j + 1, True
        elif depth == 0 and c in ",<\n" and j > start:
            # bare literal (number/true/false) ended by a delimiter
            return j, True
    return n, False


_NAME_RE = re.compile(r'"name"\s*:\s*"((?:[^"\\]|\\.)*)"')
_ARGS_RE = re.compile(r'"(?:arguments|parameters)"\s*:')


class _JsonCall:
    """One streaming call whose body is a JSON object
    {"name": ..., "arguments": {...}} (hermes/llama3/json formats)."""

    def __init__(self, index: int, names):
        self.index = index
        self.names = names
        self.buf = ""
        self.call_id = f"call_{uuid.uuid4().hex[:16]}"
        self.name: Optional[str] = None
        self.invalid = False
        self.args_at: Optional[int] = None
        self.args_sent = 0
        self.done = False

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        if self.invalid or self.done:
            return out
        if self.name is None:
            m = _NAME_RE.search(self.buf)
            if m:
                name = m.group(1)
                if self.names and name not in self.names:
                    self.invalid = True
                    return out
                self.name = name
                out.append({
                    "index": self.index, "id": self.call_id,
                    "type": "function",
                    "function": {"name": name, "arguments": ""},
                })
        if self.name is not None and self.args_at is None:
            m = _ARGS_RE.search(self.buf)
            if m:
                self.args_at = m.end()
        if self.args_at is not None:
            # skip leading whitespace so argument increments start at the
            # value itself (clients concatenate verbatim)
            while (self.args_sent == 0 and self.args_at < len(self.buf)
                   and self.buf[self.args_at] in " \t\r\n"):
                self.args_at += 1
        if self.args_at is not None:
            span, complete = _json_value_span(self.buf[self.args_at:])
            new = self.buf[self.args_at + self.args_sent:
                           self.args_at + span]
            if new:
                out.append({
                    "index": self.index,
                    "function": {"arguments": new},
                })
            self.args_sent = span
            if complete:
                self.done = True
        elif self.name is not None:
            # a complete object without arguments ({"name": "f"}) ends
            # the call with empty args
            span, complete = _json_value_span(self.buf)
            if complete:
                out.append({
                    "index": self.index, "function": {"arguments": "{}"},
                })
                self.done = True
        return out

    def object_complete(self) -> bool:
        span, complete = _json_value_span(self.buf)
        return complete


class _KimiCall(_JsonCall):
    """Kimi-K2 body: functions.NAME:IDX <|tool_call_argument_begin|>
    {json args}."""

    ARG_MARK = "<|tool_call_argument_begin|>"
    _name_re = re.compile(r"\s*([\w.]+):\d+\s*")

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        if self.invalid or self.done:
            return out
        if self.name is None:
            at = self.buf.find(self.ARG_MARK)
            if at >= 0:
                m = self._name_re.match(self.buf[:at])
                name = m.group(1).split(".")[-1] if m else None
                if not name or (self.names and name not in self.names):
                    self.invalid = True
                    return out
                self.name = name
                self.args_at = at + len(self.ARG_MARK)
                out.append({
                    "index": self.index, "id": self.call_id,
                    "type": "function",
                    "function": {"name": name, "arguments": ""},
                })
        if self.name is not None and self.args_at is not None:
            span, complete = _json_value_span(self.buf[self.args_at:])
            new = self.buf[self.args_at + self.args_sent:
                           self.args_at + span]
            if new:
                out.append({
                    "index": self.index, "function": {"arguments": new},
                })
            self.args_sent = span
            if complete:
                self.done = True
        return out


class _XmlCall(_JsonCall):
    """Qwen3-Coder body: <function=NAME><parameter=K>V</parameter>...
    Name streams as soon as the <function=...> tag closes; arguments are
    emitted as one JSON delta at call end (typed values need the whole
    body)."""

    _fn_re = re.compile(r"<function=([^>\n]+)>")

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        if self.invalid or self.done:
            return out
        if self.name is None:
            m = self._fn_re.search(self.buf)
            if m:
                name = m.group(1).strip()
                if self.names and name not in self.names:
                    self.invalid = True
                    return out
                self.name = name
                out.append({
                    "index": self.index, "id": self.call_id,
                    "type": "function",
                    "function": {"name": name, "arguments": ""},
                })
        return out

    def finalize(self) -> List[Dict]:
        if self.invalid or self.name is None or self.done:
            return []
        from sglang_diffusion_tpu.function_call.detectors import _coerce

        args = {}
        for pm in re.finditer(r"<parameter=([^>\n]+)>(.*?)</parameter>",
                              self.buf, re.S):
            args[pm.group(1).strip()] = _coerce(pm.group(2).strip("\n"))
        self.done = True
        return [{
            "index": self.index,
            "function": {"arguments": json.dumps(args)},
        }]


class _DeepSeekCall(_JsonCall):
    """DeepSeek-V3 body (reference deepseekv3_detector.py:50):
    function<｜tool▁sep｜>NAME\n```json\n{args}\n```."""

    SEP = "<｜tool▁sep｜>"
    _name_re = re.compile(r"\s*([\w.\-]+)\s*\n")

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        if self.invalid or self.done:
            return out
        if self.name is None:
            at = self.buf.find(self.SEP)
            if at >= 0:
                m = self._name_re.match(self.buf, at + len(self.SEP))
                if m:
                    name = m.group(1)
                    if self.names and name not in self.names:
                        self.invalid = True
                        return out
                    self.name = name
                    self.args_at = m.end()
                    out.append({
                        "index": self.index, "id": self.call_id,
                        "type": "function",
                        "function": {"name": name, "arguments": ""},
                    })
        if self.name is not None and self.args_at is not None:
            if self.args_sent == 0:
                # args are always an object, optionally behind a ```json
                # fence: hold streaming until the '{' appears, then start
                # the value exactly there
                brace = self.buf.find("{", self.args_at)
                if brace < 0:
                    return out
                self.args_at = brace
            span, complete = _json_value_span(self.buf[self.args_at:])
            new = self.buf[self.args_at + self.args_sent:
                           self.args_at + span]
            if new:
                out.append({
                    "index": self.index, "function": {"arguments": new},
                })
            self.args_sent = span
            if complete:
                self.done = True
        return out


class _GptOssCall(_JsonCall):
    """GPT-OSS harmony body (after '<|channel|>commentary to='):
    functions.NAME [<|constrain|>json] <|message|>{args}  (end: <|call|>)."""

    MSG = "<|message|>"
    _name_re = re.compile(r"\s*([\w.]+)")

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        if self.invalid or self.done:
            return out
        if self.name is None:
            at = self.buf.find(self.MSG)
            if at >= 0:
                m = self._name_re.match(self.buf[:at])
                name = m.group(1).split(".")[-1] if m else None
                if not name or (self.names and name not in self.names):
                    self.invalid = True
                    return out
                self.name = name
                self.args_at = at + len(self.MSG)
                out.append({
                    "index": self.index, "id": self.call_id,
                    "type": "function",
                    "function": {"name": name, "arguments": ""},
                })
        if self.name is not None and self.args_at is not None:
            span, complete = _json_value_span(self.buf[self.args_at:])
            new = self.buf[self.args_at + self.args_sent:
                           self.args_at + span]
            if new:
                out.append({
                    "index": self.index, "function": {"arguments": new},
                })
            self.args_sent = span
            if complete:
                self.done = True
        return out


class _Glm4Call(_JsonCall):
    """GLM-4.5/4.6 MoE body: NAME\\n<arg_key>K</arg_key>
    <arg_value>V</arg_value>... — name streams at the first newline,
    typed arguments emit as one JSON delta at call end."""

    _arg_re = re.compile(
        r"<arg_key>(.*?)</arg_key>(?:\\n|\s)*<arg_value>(.*?)</arg_value>",
        re.S)

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        if self.invalid or self.done:
            return out
        if self.name is None:
            nl = self.buf.find("\n")
            if nl < 0:
                nl = self.buf.find("<arg_key>")
            if nl >= 0:
                name = self.buf[:nl].strip()
                if not name or (self.names and name not in self.names):
                    self.invalid = True
                    return out
                self.name = name
                out.append({
                    "index": self.index, "id": self.call_id,
                    "type": "function",
                    "function": {"name": name, "arguments": ""},
                })
        return out

    def finalize(self) -> List[Dict]:
        if self.invalid or self.name is None or self.done:
            return []
        from sglang_diffusion_tpu.function_call.detectors import _coerce

        args = {
            k.strip(): _coerce(v.strip())
            for k, v in self._arg_re.findall(self.buf)
        }
        self.done = True
        return [{
            "index": self.index,
            "function": {"arguments": json.dumps(args)},
        }]


class _Step3Call(_JsonCall):
    """Step-3 body (after '<steptml:invoke name="'): NAME">
    <steptml:parameter name="k">v</steptml:parameter>... — name streams
    at the closing quote, typed args emit at </steptml:invoke>."""

    _param_re = re.compile(
        r'<steptml:parameter name="([^"]+)">([^<]*)</steptml:parameter>',
        re.S)

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        if self.invalid or self.done:
            return out
        if self.name is None:
            q = self.buf.find('">')
            if q >= 0:
                name = self.buf[:q]
                if not name or (self.names and name not in self.names):
                    self.invalid = True
                    return out
                self.name = name
                out.append({
                    "index": self.index, "id": self.call_id,
                    "type": "function",
                    "function": {"name": name, "arguments": ""},
                })
        return out

    def finalize(self) -> List[Dict]:
        if self.invalid or self.name is None or self.done:
            return []
        from sglang_diffusion_tpu.function_call.detectors import _coerce

        args = {
            k: _coerce(v.strip())
            for k, v in self._param_re.findall(self.buf)
        }
        self.done = True
        return [{
            "index": self.index,
            "function": {"arguments": json.dumps(args)},
        }]


class _DeepSeekV31Call(_JsonCall):
    """DeepSeek-V3.1 body (reference deepseekv31_detector.py:29):
    NAME<｜tool▁sep｜>{json args} — the name precedes the sep directly
    and the arguments stream as bare JSON."""

    SEP = "<｜tool▁sep｜>"

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        if self.invalid or self.done:
            return out
        if self.name is None:
            at = self.buf.find(self.SEP)
            if at >= 0:
                name = self.buf[:at].strip()
                if not name or (self.names and name not in self.names):
                    self.invalid = True
                    return out
                self.name = name
                self.args_at = at + len(self.SEP)
                out.append({
                    "index": self.index, "id": self.call_id,
                    "type": "function",
                    "function": {"name": name, "arguments": ""},
                })
        if self.name is not None and self.args_at is not None:
            span, complete = _json_value_span(self.buf[self.args_at:])
            new = self.buf[self.args_at + self.args_sent:
                           self.args_at + span]
            if new:
                out.append({
                    "index": self.index, "function": {"arguments": new},
                })
            self.args_sent = span
            if complete:
                self.done = True
        return out


class _DsmlCall(_Step3Call):
    """DeepSeek-V3.2 body (after '<｜DSML｜invoke name="'): NAME"> then
    typed <｜DSML｜parameter name=..> tags or a direct JSON object; args
    emit at </｜DSML｜invoke>."""

    _param_re = re.compile(
        r'<｜DSML｜parameter name="([^"]+)"([^>]*)>(.*?)</｜DSML｜parameter>',
        re.S)

    def finalize(self) -> List[Dict]:
        if self.invalid or self.name is None or self.done:
            return []
        from sglang_diffusion_tpu.function_call.detectors import _coerce

        params = self._param_re.findall(self.buf)
        if params:
            args = {
                k: (v.strip() if 'string="true"' in attrs
                    else _coerce(v.strip()))
                for k, attrs, v in params
            }
        else:
            body = self.buf
            q = body.find('">')
            body = body[q + 2:] if q >= 0 else body
            try:
                args = json.loads(body.strip() or "{}")
            except json.JSONDecodeError:
                args = {}
        self.done = True
        return [{
            "index": self.index,
            "function": {"arguments": json.dumps(args)},
        }]


class _MinimaxCall(_Step3Call):
    """MiniMax-M2 body (after '<invoke name="'): NAME"> then
    <parameter name="k">v</parameter> tags; args emit at </invoke>."""

    _param_re = re.compile(
        r'<parameter name="([^"]+)">(.*?)</parameter>', re.S)

    def finalize(self) -> List[Dict]:
        if self.invalid or self.name is None or self.done:
            return []
        from sglang_diffusion_tpu.function_call.detectors import _coerce

        args = {
            k: _coerce(v.strip())
            for k, v in self._param_re.findall(self.buf)
        }
        self.done = True
        return [{
            "index": self.index,
            "function": {"arguments": json.dumps(args)},
        }]


class _Lfm2Call(_JsonCall):
    """LFM2 body: a bracketed pythonic call list or JSON array; parsed
    whole at <|tool_call_end|> via the non-streaming detector (typed
    python literals need the complete body)."""

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        return []

    def finalize(self) -> List[Dict]:
        if self.done:
            return []
        from sglang_diffusion_tpu.function_call.detectors import (
            Lfm2Detector,
        )

        body = f"<|tool_call_start|>{self.buf}<|tool_call_end|>"
        _, calls = Lfm2Detector().detect(body, self.names)
        self.done = True
        out: List[Dict] = []
        for i, c in enumerate(calls):
            if i == 0:
                self.name = c["function"]["name"]
            out.append({
                "index": self.index + i, "id": c["id"],
                "type": "function",
                "function": {"name": c["function"]["name"],
                             "arguments": ""},
            })
            out.append({
                "index": self.index + i,
                "function": {"arguments": c["function"]["arguments"]},
            })
        return out


class _MistralCall:
    """Mistral body: a JSON ARRAY of {"name", "arguments"} objects — one
    streaming sub-call per element, each with its own call index."""

    def __init__(self, index: int, names):
        self.base_index = index
        self.names = names
        self.buf = ""
        self.pos = 0  # scan position: consumed separators
        self.inner: Optional[_JsonCall] = None
        self.calls_made = 0
        self.invalid = False
        self.done = False
        self.name = "(array)"  # non-None so the parser counts the group

    def feed(self, text: str) -> List[Dict]:
        self.buf += text
        out: List[Dict] = []
        while not self.done and not self.invalid:
            if self.inner is None:
                # expect: optional ws, then '[' (once), '{', ',', or ']'
                while self.pos < len(self.buf) and \
                        self.buf[self.pos] in " \t\r\n[,":
                    self.pos += 1
                if self.pos >= len(self.buf):
                    break
                c = self.buf[self.pos]
                if c == "]":
                    self.done = True
                    break
                if c != "{":
                    self.invalid = True
                    break
                self.inner = _JsonCall(
                    self.base_index + self.calls_made, self.names)
                self._inner_fed = 0
            new = self.buf[self.pos + self._inner_fed:]
            if new:
                out.extend(self.inner.feed(new))
                self._inner_fed += len(new)
            span, complete = _json_value_span(self.inner.buf)
            if not complete:
                break
            if self.inner.name is not None and not self.inner.invalid:
                self.calls_made += 1
            self.pos += span
            self.inner = None
        return out

    def object_complete(self) -> bool:
        return self.done or self.invalid


@dataclass
class _Spec:
    start: str
    end: Optional[str]
    call_cls: type
    alt_starts: Tuple[str, ...] = ()
    strip: Tuple[str, ...] = ()  # frame tokens removed from normal text


SPECS: Dict[str, _Spec] = {
    "hermes": _Spec("<tool_call>", "</tool_call>", _JsonCall),
    "qwen25": _Spec("<tool_call>", "</tool_call>", _JsonCall),
    "llama3": _Spec("<|python_tag|>", None, _JsonCall,
                    alt_starts=('{"name"',)),
    "json": _Spec("{", None, _JsonCall),
    "kimi_k2": _Spec("<|tool_call_begin|>", "<|tool_call_end|>", _KimiCall,
                     strip=("<|tool_calls_section_begin|>",
                            "<|tool_calls_section_end|>")),
    "qwen3_coder": _Spec("<tool_call>", "</tool_call>", _XmlCall),
    "mistral": _Spec("[TOOL_CALLS]", None, _MistralCall),
    "deepseek": _Spec("<｜tool▁call▁begin｜>", "<｜tool▁call▁end｜>",
                      _DeepSeekCall,
                      strip=("<｜tool▁calls▁begin｜>",
                             "<｜tool▁calls▁end｜>")),
    "glm4_moe": _Spec("<tool_call>", "</tool_call>", _Glm4Call),
    "gpt_oss": _Spec("<|channel|>commentary to=", "<|call|>", _GptOssCall,
                     strip=("<|start|>", "<|end|>", "<|return|>")),
    "step3": _Spec('<steptml:invoke name="', "</steptml:invoke>",
                   _Step3Call,
                   strip=("<｜tool_calls_begin｜>", "<｜tool_calls_end｜>")),
    "deepseekv31": _Spec("<｜tool▁call▁begin｜>", "<｜tool▁call▁end｜>",
                         _DeepSeekV31Call,
                         strip=("<｜tool▁calls▁begin｜>",
                                "<｜tool▁calls▁end｜>")),
    "deepseekv32": _Spec('<｜DSML｜invoke name="', "</｜DSML｜invoke>",
                         _DsmlCall,
                         strip=("<｜DSML｜function_calls>",
                                "</｜DSML｜function_calls>")),
    "gigachat3": _Spec("function call<|role_sep|>", None, _JsonCall,
                       strip=("<|message_sep|>",)),
    "glm47_moe": _Spec("<tool_call>", "</tool_call>", _Glm4Call),
    "internlm": _Spec("<|action_start|> <|plugin|>", "<|action_end|>",
                      _JsonCall),
    "lfm2": _Spec("<|tool_call_start|>", "<|tool_call_end|>", _Lfm2Call),
    "mimo": _Spec("<tool_call>", "</tool_call>", _XmlCall),
    "minimax_m2": _Spec('<invoke name="', "</invoke>", _MinimaxCall,
                        strip=("<minimax:tool_call>",
                               "</minimax:tool_call>")),
    "trinity": _Spec("<tool_call>", "</tool_call>", _JsonCall,
                     strip=("<think>", "</think>")),
}


class StreamingToolParser:
    """Feed decoded text deltas; get (normal_text, tool_call_deltas).

    Tool-call deltas follow the OpenAI chat.completion.chunk shape:
    the first delta for call i carries id/type/name with empty
    arguments; subsequent deltas carry raw argument-string increments."""

    def __init__(self, fmt: str, tools: Optional[List[Dict]] = None):
        if fmt not in SPECS:
            raise KeyError(
                f"no streaming support for format {fmt!r}; "
                f"have {sorted(SPECS)}")
        self.spec = SPECS[fmt]
        self.names = {
            (t.get("function", t)).get("name") for t in (tools or [])
        } or None
        self.buf = ""
        self.call: Optional[_JsonCall] = None
        self.n_calls = 0
        self.any_calls = False

    # ---- helpers ----
    def _all_markers(self) -> List[str]:
        return [self.spec.start, *self.spec.alt_starts, *self.spec.strip]

    def feed(self, delta: str) -> Tuple[str, List[Dict]]:
        self.buf += delta
        normal_out: List[str] = []
        deltas: List[Dict] = []
        while True:
            if self.call is None:
                hit = None  # (pos, marker, is_strip)
                for mk in self._all_markers():
                    p = self.buf.find(mk)
                    if p >= 0 and (hit is None or p < hit[0]):
                        hit = (p, mk, mk in self.spec.strip)
                if hit is None:
                    # hold back a partial marker at the tail
                    keep = max(
                        (_partial_tail(self.buf, mk)
                         for mk in self._all_markers()),
                        default=0,
                    )
                    out = self.buf[: len(self.buf) - keep]
                    self.buf = self.buf[len(self.buf) - keep:]
                    if out:
                        normal_out.append(out)
                    break
                pos, mk, is_strip = hit
                if self.buf[:pos]:
                    normal_out.append(self.buf[:pos])
                if is_strip:
                    self.buf = self.buf[pos + len(mk):]
                    continue
                # bare-start formats keep the marker as part of the body
                body_from = pos if mk == "{" or mk.startswith('{') else (
                    pos + len(mk))
                self.buf = self.buf[body_from:]
                self.call = self.spec.call_cls(self.n_calls, self.names)
                continue
            # inside a call
            if self.spec.end is not None:
                e = self.buf.find(self.spec.end)
                if e >= 0:
                    deltas.extend(self.call.feed(self.buf[:e]))
                    deltas.extend(self._finalize_call())
                    self.buf = self.buf[e + len(self.spec.end):]
                    continue
                keep = _partial_tail(self.buf, self.spec.end)
                feed_now = self.buf[: len(self.buf) - keep]
                self.buf = self.buf[len(self.buf) - keep:]
                if feed_now:
                    deltas.extend(self.call.feed(feed_now))
                break
            # no end marker: the JSON object itself delimits the call
            # (finalize only once the OUTER object closes — args may
            # complete one "}" before the object does)
            deltas.extend(self.call.feed(self.buf))
            self.buf = ""
            if self.call.invalid or self.call.object_complete():
                tail = self.call.buf[self._consumed_len():]
                deltas.extend(self._finalize_call())
                self.buf = tail
                if self.buf:
                    continue
            break
        return "".join(normal_out), deltas

    def _consumed_len(self) -> int:
        """How much of call.buf belongs to the finished JSON object."""
        span, complete = _json_value_span(self.call.buf)
        return span if complete else len(self.call.buf)

    def _finalize_call(self) -> List[Dict]:
        out: List[Dict] = []
        if hasattr(self.call, "finalize"):
            out.extend(self.call.finalize())
        if self.call.name is not None and not self.call.invalid:
            self.any_calls = True
            self.n_calls += 1
        self.call = None
        return out

    def flush(self) -> Tuple[str, List[Dict]]:
        """End of stream: emit residual normal text; incomplete calls with
        a known name get their buffered arguments closed out."""
        deltas: List[Dict] = []
        if self.call is not None:
            if hasattr(self.call, "finalize"):
                deltas.extend(self.call.finalize())
            self.call = None
        normal, self.buf = self.buf, ""
        return normal, deltas
