"""Lang-DSL backends.

Reference analog: python/sglang/lang/backend/ (RuntimeEndpoint speaks the
server's HTTP API so @sgl.function programs run against any live server,
not just an in-process Engine). The backend duck-type needs exactly the
two primitives ProgramState uses: generate(prompt, sp) and
score_choices(prompt, choices).
"""

from __future__ import annotations

import json
import urllib.request
from typing import Any, Dict, List, Optional

from sglang_diffusion_tpu.sampling.params import SamplingParams

_default_backend = None


def set_default_backend(backend) -> None:
    """Reference analog: sgl.set_default_backend."""
    global _default_backend
    _default_backend = backend


def get_default_backend():
    return _default_backend


class RuntimeEndpoint:
    """HTTP backend over a live server's native /generate + /v1/score."""

    def __init__(self, base_url: str, timeout: float = 600.0):
        self.base_url = base_url.rstrip("/")
        self.timeout = timeout

    def _post(self, path: str, body: Dict[str, Any]) -> Dict[str, Any]:
        req = urllib.request.Request(
            self.base_url + path,
            data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            return json.loads(r.read())

    def generate(self, prompt: str, sp: SamplingParams) -> Dict[str, Any]:
        import dataclasses

        sp_dict = {
            k: v for k, v in dataclasses.asdict(sp).items() if v is not None
        }
        return self._post("/generate", {"text": prompt,
                                        "sampling_params": sp_dict})

    def score_choices(self, prompt: str, choices: List[str]) -> List[float]:
        out = self._post("/v1/score", {"prompt": prompt, "choices": choices})
        return out["scores"]
