"""Tiny Thompson-NFA regex engine for constrained decoding.

Supported syntax: literals, '.', character classes [a-z0-9_] (with ranges
and negation [^...]), escapes (\\d \\w \\s \\n \\t \\\\ and escaped
metachars), grouping (), alternation |, and quantifiers * + ? {m,n}.

States are frozensets of NFA node ids; the decoding-time API is:
    start_state() -> state
    advance(state, text) -> state | None      (None = dead)
    is_accepting(state) -> bool
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Set, Tuple

EPS = None  # epsilon edge label


class _Frag:
    def __init__(self, start: int, outs: List[int]):
        self.start = start
        self.outs = outs  # node ids with a dangling out-edge to patch


class RegexNFA:
    def __init__(self, pattern: str):
        self.edges: List[List[Tuple[Optional[frozenset], int]]] = []
        self.pattern = pattern
        frag, pos = self._parse_alt(pattern, 0)
        if pos != len(pattern):
            raise ValueError(f"unexpected {pattern[pos]!r} at {pos}")
        self.accept = self._new_node()
        for o in frag.outs:
            self._patch(o, self.accept)
        self.start = frag.start

    # ---------- construction ----------
    def _new_node(self) -> int:
        self.edges.append([])
        return len(self.edges) - 1

    def _add_edge(self, a: int, label, b: int):
        self.edges[a].append((label, b))

    def _patch(self, node: int, target: int):
        self._add_edge(node, EPS, target)

    def _char_frag(self, chars: frozenset) -> _Frag:
        a = self._new_node()
        b = self._new_node()
        self._add_edge(a, chars, b)
        return _Frag(a, [b])

    # ---------- parser ----------
    def _parse_alt(self, p: str, i: int) -> Tuple[_Frag, int]:
        frags = []
        frag, i = self._parse_concat(p, i)
        frags.append(frag)
        while i < len(p) and p[i] == "|":
            frag, i = self._parse_concat(p, i + 1)
            frags.append(frag)
        if len(frags) == 1:
            return frags[0], i
        start = self._new_node()
        outs: List[int] = []
        for f in frags:
            self._patch(start, f.start)
            outs.extend(f.outs)
        return _Frag(start, outs), i

    def _parse_concat(self, p: str, i: int) -> Tuple[_Frag, int]:
        frags: List[_Frag] = []
        while i < len(p) and p[i] not in "|)":
            frag, i = self._parse_repeat(p, i)
            frags.append(frag)
        if not frags:
            n = self._new_node()
            return _Frag(n, [n]), i
        for a, b in zip(frags, frags[1:]):
            for o in a.outs:
                self._patch(o, b.start)
        return _Frag(frags[0].start, frags[-1].outs), i

    def _parse_repeat(self, p: str, i: int) -> Tuple[_Frag, int]:
        frag, i = self._parse_atom(p, i)
        while i < len(p) and (p[i] in "*+?" or p[i] == "{"):
            if p[i] == "*":
                start = self._new_node()
                self._patch(start, frag.start)
                for o in frag.outs:
                    self._patch(o, start)
                frag = _Frag(start, [start])
                i += 1
            elif p[i] == "+":
                loop = self._new_node()
                for o in frag.outs:
                    self._patch(o, loop)
                self._patch(loop, frag.start)
                frag = _Frag(frag.start, [loop])
                i += 1
            elif p[i] == "?":
                start = self._new_node()
                self._patch(start, frag.start)
                frag = _Frag(start, frag.outs + [start])
                i += 1
            else:  # {m,n}
                j = p.index("}", i)
                spec = p[i + 1 : j]
                if "," in spec:
                    lo_s, hi_s = spec.split(",")
                    lo, hi = int(lo_s or 0), int(hi_s) if hi_s else None
                else:
                    lo = hi = int(spec)
                if hi is None:
                    raise ValueError("{m,} unbounded not supported; use {m,n} or +")
                # expand by cloning the atom sub-pattern: re-parse atom hi times
                atom_src = self._atom_src
                frags = []
                for _ in range(hi):
                    f, _i2 = self._parse_atom(atom_src, 0)
                    frags.append(f)
                start = self._new_node()
                outs = []
                prev_outs = [start]
                for idx, f in enumerate(frags):
                    for o in prev_outs:
                        self._patch(o, f.start)
                    if idx + 1 >= lo:
                        outs.extend(f.outs)
                    prev_outs = f.outs
                if lo == 0:
                    outs.append(start)
                frag = _Frag(start, list(dict.fromkeys(outs)))
                i = j + 1
        return frag, i

    _CLASSES = {
        "d": frozenset("0123456789"),
        "w": frozenset(
            "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789_"
        ),
        "s": frozenset(" \t\n\r"),
    }
    _ANY = frozenset(chr(c) for c in range(32, 127)) | frozenset("\t\n\r")

    def _parse_atom(self, p: str, i: int) -> Tuple[_Frag, int]:
        start_i = i
        c = p[i]
        if c == "(":
            frag, i = self._parse_alt(p, i + 1)
            if i >= len(p) or p[i] != ")":
                raise ValueError("unbalanced (")
            i += 1
        elif c == "[":
            j = i + 1
            neg = j < len(p) and p[j] == "^"
            if neg:
                j += 1
            chars: Set[str] = set()
            while j < len(p) and p[j] != "]":
                if p[j] == "\\" and j + 1 < len(p):
                    nxt = p[j + 1]
                    chars |= self._CLASSES.get(nxt, frozenset(nxt))
                    j += 2
                elif j + 2 < len(p) and p[j + 1] == "-" and p[j + 2] != "]":
                    chars |= {chr(x) for x in range(ord(p[j]), ord(p[j + 2]) + 1)}
                    j += 3
                else:
                    chars.add(p[j])
                    j += 1
            if j >= len(p):
                raise ValueError("unbalanced [")
            cs = frozenset(self._ANY - chars) if neg else frozenset(chars)
            frag = self._char_frag(cs)
            i = j + 1
        elif c == ".":
            frag = self._char_frag(self._ANY)
            i += 1
        elif c == "\\" and i + 1 < len(p):
            nxt = p[i + 1]
            cs = self._CLASSES.get(nxt)
            if cs is None:
                cs = frozenset({"n": "\n", "t": "\t", "r": "\r"}.get(nxt, nxt))
            frag = self._char_frag(frozenset(cs))
            i += 2
        else:
            frag = self._char_frag(frozenset(c))
            i += 1
        self._atom_src = p[start_i:i]
        return frag, i

    # ---------- execution ----------
    def _eps_closure(self, nodes: Set[int]) -> FrozenSet[int]:
        stack = list(nodes)
        seen = set(nodes)
        while stack:
            n = stack.pop()
            for label, t in self.edges[n]:
                if label is EPS and t not in seen:
                    seen.add(t)
                    stack.append(t)
        return frozenset(seen)

    def start_state(self) -> FrozenSet[int]:
        return self._eps_closure({self.start})

    def advance(self, state: FrozenSet[int], text: str) -> Optional[FrozenSet[int]]:
        cur = state
        for ch in text:
            nxt: Set[int] = set()
            for n in cur:
                for label, t in self.edges[n]:
                    if label is not EPS and ch in label:
                        nxt.add(t)
            if not nxt:
                return None
            cur = self._eps_closure(nxt)
        return cur

    def is_accepting(self, state: FrozenSet[int]) -> bool:
        return self.accept in state
