"""Function/tool-call prompting + parsing.

Reference analog: srt/function_call/ (function_call_parser.py + ~30
model-specific detectors). Round 1 ships the generic JSON-format path the
reference uses for models without a native tool grammar: tools are
described in a system prompt, generation is constrained to JSON via the
grammar engine (constrained/json_grammar.py), and the output is parsed
into OpenAI-style tool_calls. Model-family token formats (hermes, llama3,
qwen...) slot in as additional detectors later.
"""

from __future__ import annotations

import json
import uuid
from typing import Any, Dict, List, Optional, Tuple


def tools_system_prompt(tools: List[Dict[str, Any]]) -> str:
    """Render tool specs into a system prompt (generic JSON protocol)."""
    lines = [
        "You have access to the following tools. To call a tool, respond "
        'with ONLY a JSON object {"name": <tool name>, "arguments": '
        "<arguments object>}.",
        "",
        "Tools:",
    ]
    for t in tools:
        fn = t.get("function", t)
        lines.append(
            json.dumps(
                {
                    "name": fn.get("name"),
                    "description": fn.get("description", ""),
                    "parameters": fn.get("parameters", {}),
                }
            )
        )
    return "\n".join(lines)


class FunctionCallParser:
    def __init__(self, tools: List[Dict[str, Any]], fmt: Optional[str] = None):
        """fmt: model-family tool-call format (detectors.py: hermes/llama3/
        mistral/deepseek), "json", or None = auto-detect then JSON."""
        self.names = {
            (t.get("function", t)).get("name") for t in tools
        }
        self.fmt = fmt

    def parse(self, text: str) -> Tuple[Optional[str], List[Dict[str, Any]]]:
        """Returns (normal_text or None, tool_calls in OpenAI format)."""
        from sglang_diffusion_tpu.function_call.detectors import (
            auto_detect,
            get_detector,
        )

        if self.fmt and self.fmt != "json":
            normal, calls = get_detector(self.fmt).detect(text, self.names)
            if calls:
                return normal, calls
        elif self.fmt is None:
            det = auto_detect(text)
            if det is not None:
                normal, calls = det.detect(text, self.names)
                if calls:
                    return normal, calls
        candidates = self._json_candidates(text)
        calls = []
        for obj in candidates:
            if (
                isinstance(obj, dict)
                and isinstance(obj.get("name"), str)
                and (not self.names or obj["name"] in self.names)
            ):
                calls.append(
                    {
                        "id": f"call_{uuid.uuid4().hex[:16]}",
                        "type": "function",
                        "function": {
                            "name": obj["name"],
                            "arguments": json.dumps(obj.get("arguments", {})),
                        },
                    }
                )
        if calls:
            return None, calls
        return text, []

    @staticmethod
    def _json_candidates(text: str) -> List[Any]:
        """Extract top-level JSON objects embedded in text."""
        out = []
        i = 0
        n = len(text)
        while i < n:
            if text[i] == "{":
                depth = 0
                in_str = False
                esc = False
                for j in range(i, n):
                    c = text[j]
                    if in_str:
                        if esc:
                            esc = False
                        elif c == "\\":
                            esc = True
                        elif c == '"':
                            in_str = False
                    elif c == '"':
                        in_str = True
                    elif c == "{":
                        depth += 1
                    elif c == "}":
                        depth -= 1
                        if depth == 0:
                            try:
                                out.append(json.loads(text[i : j + 1]))
                            except json.JSONDecodeError:
                                pass
                            i = j
                            break
                i += 1
            else:
                i += 1
        return out
