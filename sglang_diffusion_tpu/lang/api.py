"""Frontend DSL: @function programs with gen / select / fork.

Reference analog: python/sglang/lang (api.py:23-289 primitives, ir.py IR,
interpreter.py). The TPU build executes programs directly against a local
Engine (the reference interprets against HTTP backends; an HTTP backend
adapter can reuse the same primitives later).

    import sglang_diffusion_tpu.lang as sgl

    @sgl.function
    def qa(s, question):
        s += "Q: " + question + "\\n"
        s += "A: " + sgl.gen("answer", max_tokens=32, stop="\\n")

    state = qa.run(engine=eng, question="why?")
    print(state["answer"])
"""

from __future__ import annotations

import copy
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Union

from sglang_diffusion_tpu.sampling.params import SamplingParams


class _Expr:
    """Composable program piece: supports "text " + gen(...) + " more"
    (reference analog: SglExpr operator overloads, lang/ir.py:18)."""

    def __add__(self, other):
        return _Seq([self, other])

    def __radd__(self, other):
        return _Seq([other, self])


class _Seq(_Expr):
    def __init__(self, parts):
        self.parts = []
        for p in parts:
            if isinstance(p, _Seq):
                self.parts.extend(p.parts)
            else:
                self.parts.append(p)


@dataclass
class Gen(_Expr):
    name: Optional[str]
    params: Dict[str, Any] = field(default_factory=dict)


@dataclass
class Select(_Expr):
    name: Optional[str]
    choices: List[str]


def gen(name: Optional[str] = None, *, max_tokens: int = 128,
        temperature: float = 0.0, top_p: float = 1.0, top_k: int = -1,
        stop: Union[None, str, List[str]] = None, regex: Optional[str] = None,
        json_schema: Optional[str] = None, ignore_eos: bool = False) -> Gen:
    return Gen(
        name,
        dict(
            max_new_tokens=max_tokens,
            temperature=temperature,
            top_p=top_p,
            top_k=top_k,
            stop=stop,
            regex=regex,
            json_schema=json_schema,
            ignore_eos=ignore_eos,
        ),
    )


def select(name: Optional[str] = None, choices: Optional[List[str]] = None) -> Select:
    return Select(name, choices or [])


class ProgramState:
    def __init__(self, engine):
        self.engine = engine
        self.text = ""
        self.captures: Dict[str, str] = {}
        self.meta: Dict[str, Any] = {}

    # -- execution of primitives ---------------------------------------
    def __iadd__(self, piece):
        self.append(piece)
        return self

    def append(self, piece) -> None:
        if isinstance(piece, str):
            self.text += piece
        elif isinstance(piece, Gen):
            sp = SamplingParams(**piece.params)
            out = self.engine.generate(self.text, sp)
            self.text += out["text"]
            if piece.name:
                self.captures[piece.name] = out["text"]
                self.meta[piece.name] = out["meta_info"]
        elif isinstance(piece, Select):
            scores = self.engine.score_choices(self.text, piece.choices)
            best = max(range(len(scores)), key=lambda i: scores[i])
            choice = piece.choices[best]
            self.text += choice
            if piece.name:
                self.captures[piece.name] = choice
                self.meta[piece.name] = {"scores": scores}
        elif isinstance(piece, _Seq):
            for p in piece.parts:
                self.append(p)
        elif isinstance(piece, (list, tuple)):
            for p in piece:
                self.append(p)
        else:
            raise TypeError(f"cannot append {type(piece)}")

    def fork(self, n: int) -> List["ProgramState"]:
        """Branch the program; forks share the prompt prefix, which the
        radix cache dedups across their subsequent gen() calls."""
        outs = []
        for _ in range(n):
            st = ProgramState(self.engine)
            st.text = self.text
            st.captures = dict(self.captures)
            outs.append(st)
        return outs

    def __getitem__(self, key: str) -> str:
        return self.captures[key]

    def __contains__(self, key: str) -> bool:
        return key in self.captures


class Function:
    def __init__(self, fn):
        self.fn = fn

    def run(self, *args, engine=None, **kwargs) -> ProgramState:
        if engine is None:
            from sglang_diffusion_tpu.lang.backend import get_default_backend

            engine = get_default_backend()
        if engine is None:
            raise ValueError(
                "pass engine=<Engine|RuntimeEndpoint> to .run() or call "
                "set_default_backend()"
            )
        state = ProgramState(engine)
        self.fn(state, *args, **kwargs)
        return state

    def run_batch(self, batch_kwargs: List[Dict], engine=None) -> List[ProgramState]:
        return [self.run(engine=engine, **kw) for kw in batch_kwargs]


def function(fn) -> Function:
    return Function(fn)
