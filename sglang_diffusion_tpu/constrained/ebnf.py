"""EBNF/GBNF context-free grammar engine for constrained decoding.

Reference analog: srt/constrained/xgrammar_backend.py (xgrammar's EBNF
grammars + jump-forward). TPU-native design: instead of xgrammar's
compiled matcher we build a character-level nondeterministic pushdown
automaton and run it with CONFIG-SET states — a state is a frozenset of
(nfa_node, call_stack) configurations, which is hashable, so it plugs
straight into GrammarManager's (grammar, state) mask/transition memoizer
(constrained/manager.py) and the same memoized-mask machinery that serves
the JSON PDA. Repetitive grammars revisit a small number of config-sets,
so steady-state masking is a dict hit.

Grammar syntax (GBNF/llama.cpp-style, also what the reference's
xgrammar backend accepts):

    root  ::= object
    pair  ::= string ":" value
    value ::= object | array | string | number | "true" | "false" | "null"
    str2  ::= "\"" [a-zA-Z0-9_]* "\""

- `name ::= body` (also `:=` / `=`); first rule or `root` is the start
- "..." literals with \\n \\t \\r \\\\ \\" \\xHH \\uXXXX escapes
- [a-z0-9_] char classes, [^...] negation, escapes inside
- ( ) grouping, | alternation, postfix * + ?, # line comments

jump_forward(state) returns the longest forced character span from a
state (exactly one legal next character, not yet accepting) — the engine
appends those tokens without model forwards (reference: jump-forward in
xgrammar/outlines backends).
"""

from __future__ import annotations

from typing import Dict, FrozenSet, List, Optional, Tuple

MAX_STACK = 128  # recursion depth bound (configs deeper than this drop)
_WS = " \t"


class CharSet:
    __slots__ = ("ranges", "neg")

    def __init__(self, ranges, neg=False):
        self.ranges = tuple(ranges)
        self.neg = neg

    def contains(self, ch: str) -> bool:
        o = ord(ch)
        hit = any(lo <= o <= hi for lo, hi in self.ranges)
        return hit != self.neg

    def single(self) -> Optional[str]:
        """The unique char this set matches, or None."""
        if self.neg or len(self.ranges) != 1:
            return None
        lo, hi = self.ranges[0]
        return chr(lo) if lo == hi else None

    def __repr__(self):
        return f"CharSet({self.ranges}, neg={self.neg})"


# ---------------- EBNF text -> AST ----------------

class _Parser:
    def __init__(self, text: str):
        self.text = text
        self.i = 0

    def error(self, msg):
        line = self.text.count("\n", 0, self.i) + 1
        raise ValueError(f"EBNF parse error at line {line}: {msg}")

    def peek(self):
        return self.text[self.i] if self.i < len(self.text) else ""

    def skip_ws(self, newlines=False):
        while self.i < len(self.text):
            c = self.text[self.i]
            if c == "#":  # comment to EOL
                while self.i < len(self.text) and self.text[self.i] != "\n":
                    self.i += 1
            elif c in _WS or (newlines and c in "\r\n"):
                self.i += 1
            else:
                break

    def parse_grammar(self) -> Dict[str, "_Alt"]:
        rules: Dict[str, _Alt] = {}
        order: List[str] = []
        while True:
            self.skip_ws(newlines=True)
            if self.i >= len(self.text):
                break
            name = self.parse_name()
            self.skip_ws()
            for op in ("::=", ":=", "="):
                if self.text.startswith(op, self.i):
                    self.i += len(op)
                    break
            else:
                self.error(f"expected '::=' after rule name {name!r}")
            body = self.parse_alt()
            if name in rules:
                self.error(f"duplicate rule {name!r}")
            rules[name] = body
            order.append(name)
        if not rules:
            self.error("empty grammar")
        self.root = "root" if "root" in rules else order[0]
        return rules

    def parse_name(self) -> str:
        j = self.i
        while j < len(self.text) and (
            self.text[j].isalnum() or self.text[j] in "_-"
        ):
            j += 1
        if j == self.i:
            self.error(f"expected rule name, got {self.peek()!r}")
        name = self.text[self.i : j]
        self.i = j
        return name

    def _at_rule_boundary(self) -> bool:
        """Lookahead: newline followed by `name ::=` starts a new rule."""
        j = self.i
        while j < len(self.text) and self.text[j] in " \t\r\n":
            j += 1
        if j >= len(self.text):
            return True
        k = j
        while k < len(self.text) and (
            self.text[k].isalnum() or self.text[k] in "_-"
        ):
            k += 1
        if k == j:
            return False
        while k < len(self.text) and self.text[k] in _WS:
            k += 1
        return any(
            self.text.startswith(op, k) for op in ("::=", ":=", "=")
        )

    def parse_alt(self) -> "_Alt":
        seqs = [self.parse_seq()]
        while True:
            save = self.i
            self.skip_ws(newlines=True)
            if self.peek() == "|":
                self.i += 1
                seqs.append(self.parse_seq())
            else:
                self.i = save
                break
        return _Alt(seqs)

    def parse_seq(self) -> List:
        items: List = []
        while True:
            save = self.i
            self.skip_ws()
            c = self.peek()
            if c in ("", "|", ")"):
                self.i = save
                break
            if c in "\r\n":
                if self._at_rule_boundary():
                    self.i = save
                    break
                self.skip_ws(newlines=True)
                continue
            items.append(self.parse_item())
        return items

    def parse_item(self):
        item = self.parse_atom()
        while True:
            c = self.peek()
            if c == "*":
                self.i += 1
                item = ("star", item)
            elif c == "+":
                self.i += 1
                item = ("plus", item)
            elif c == "?":
                self.i += 1
                item = ("opt", item)
            else:
                return item

    def parse_atom(self):
        c = self.peek()
        if c == '"':
            return ("lit", self.parse_string())
        if c == "[":
            return ("class", self.parse_class())
        if c == "(":
            self.i += 1
            alt = self.parse_alt()
            self.skip_ws(newlines=True)
            if self.peek() != ")":
                self.error("expected ')'")
            self.i += 1
            return ("group", alt)
        if c.isalpha() or c == "_":
            return ("ref", self.parse_name())
        self.error(f"unexpected char {c!r}")

    def parse_string(self) -> str:
        assert self.peek() == '"'
        self.i += 1
        out = []
        while True:
            if self.i >= len(self.text):
                self.error("unterminated string")
            c = self.text[self.i]
            self.i += 1
            if c == '"':
                return "".join(out)
            if c == "\\":
                out.append(self._escape())
            else:
                out.append(c)

    def _escape(self) -> str:
        c = self.text[self.i]
        self.i += 1
        simple = {"n": "\n", "t": "\t", "r": "\r", '"': '"', "\\": "\\",
                  "/": "/", "'": "'", "]": "]", "[": "[", "^": "^",
                  "-": "-"}
        if c in simple:
            return simple[c]
        if c == "x":
            h = self.text[self.i : self.i + 2]
            self.i += 2
            return chr(int(h, 16))
        if c == "u":
            h = self.text[self.i : self.i + 4]
            self.i += 4
            return chr(int(h, 16))
        self.error(f"bad escape \\{c}")

    def parse_class(self) -> CharSet:
        assert self.peek() == "["
        self.i += 1
        neg = False
        if self.peek() == "^":
            neg = True
            self.i += 1
        ranges: List[Tuple[int, int]] = []
        while True:
            if self.i >= len(self.text):
                self.error("unterminated char class")
            c = self.text[self.i]
            if c == "]":
                self.i += 1
                return CharSet(ranges, neg)
            self.i += 1
            lo = self._escape() if c == "\\" else c
            if (
                self.peek() == "-"
                and self.i + 1 < len(self.text)
                and self.text[self.i + 1] != "]"
            ):
                self.i += 1
                c2 = self.text[self.i]
                self.i += 1
                hi = self._escape() if c2 == "\\" else c2
                ranges.append((ord(lo), ord(hi)))
            else:
                ranges.append((ord(lo), ord(lo)))


class _Alt:
    __slots__ = ("seqs",)

    def __init__(self, seqs):
        self.seqs = seqs


# ---------------- AST -> NFA with rule-call edges ----------------

Config = Tuple[int, Tuple[int, ...]]  # (node, return-node stack)


class EbnfGrammar:
    """Compiled grammar; implements the GrammarManager interface
    (start_state / advance / is_accepting) plus allowed_charsets /
    jump_forward."""

    def __init__(self, text: str):
        p = _Parser(text)
        ast = p.parse_grammar()
        self.root = p.root
        # nodes: per-node edge lists
        self.char_edges: List[List[Tuple[CharSet, int]]] = []
        self.eps_edges: List[List[int]] = []
        self.call_edges: List[List[Tuple[str, int]]] = []  # (rule, ret node)
        self.rule_bounds: Dict[str, Tuple[int, int]] = {}
        for name, alt in ast.items():
            start = self._new_node()
            end = self._compile_alt(alt, start)
            self.rule_bounds[name] = (start, end)
        self._rule_ends = {e for _, e in self.rule_bounds.values()}
        # validate refs
        for edges in self.call_edges:
            for rule, _ in edges:
                if rule not in self.rule_bounds:
                    raise ValueError(f"EBNF: undefined rule {rule!r}")
        self._start = self._closure(
            frozenset({(self.rule_bounds[self.root][0], ())})
        )

    # ---- construction ----
    def _new_node(self) -> int:
        self.char_edges.append([])
        self.eps_edges.append([])
        self.call_edges.append([])
        return len(self.eps_edges) - 1

    def _compile_alt(self, alt: _Alt, start: int) -> int:
        end = self._new_node()
        for seq in alt.seqs:
            cur = start
            for item in seq:
                cur = self._compile_item(item, cur)
            self.eps_edges[cur].append(end)
        return end

    def _compile_item(self, item, cur: int) -> int:
        kind = item[0]
        if kind == "lit":
            for ch in item[1]:
                nxt = self._new_node()
                self.char_edges[cur].append(
                    (CharSet([(ord(ch), ord(ch))]), nxt)
                )
                cur = nxt
            return cur
        if kind == "class":
            nxt = self._new_node()
            self.char_edges[cur].append((item[1], nxt))
            return nxt
        if kind == "ref":
            ret = self._new_node()
            self.call_edges[cur].append((item[1], ret))
            return ret
        if kind == "group":
            return self._compile_alt(item[1], cur)
        if kind == "star":
            hub = self._new_node()
            self.eps_edges[cur].append(hub)
            body_end = self._compile_item(item[1], hub)
            self.eps_edges[body_end].append(hub)
            out = self._new_node()
            self.eps_edges[hub].append(out)
            return out
        if kind == "plus":
            body_end = self._compile_item(item[1], cur)
            hub = self._new_node()
            self.eps_edges[body_end].append(hub)
            loop_end = self._compile_item(item[1], hub)
            self.eps_edges[loop_end].append(hub)
            return hub
        if kind == "opt":
            body_end = self._compile_item(item[1], cur)
            self.eps_edges[cur].append(body_end)
            return body_end
        raise AssertionError(kind)

    # ---- execution ----
    def _closure(self, configs: FrozenSet[Config]) -> FrozenSet[Config]:
        seen = set(configs)
        work = list(configs)
        while work:
            node, stack = work.pop()
            for tgt in self.eps_edges[node]:
                c = (tgt, stack)
                if c not in seen:
                    seen.add(c)
                    work.append(c)
            for rule, ret in self.call_edges[node]:
                if len(stack) >= MAX_STACK:
                    continue
                c = (self.rule_bounds[rule][0], stack + (ret,))
                if c not in seen:
                    seen.add(c)
                    work.append(c)
            # rule end: return to caller
            if node in self._rule_ends and stack:
                c = (stack[-1], stack[:-1])
                if c not in seen:
                    seen.add(c)
                    work.append(c)
        return frozenset(seen)

    def start_state(self) -> FrozenSet[Config]:
        return self._start

    def advance(self, state, text: str):
        configs = state
        for ch in text:
            nxt = set()
            for node, stack in configs:
                for cs, tgt in self.char_edges[node]:
                    if cs.contains(ch):
                        nxt.add((tgt, stack))
            if not nxt:
                return None
            configs = self._closure(frozenset(nxt))
        return configs

    def is_accepting(self, state) -> bool:
        root_end = self.rule_bounds[self.root][1]
        return any(
            node == root_end and not stack for node, stack in state
        )

    # ---- jump-forward ----
    def allowed_charsets(self, state) -> List[CharSet]:
        return [
            cs for node, stack in state for cs, _ in self.char_edges[node]
        ]

    def forced_char(self, state) -> Optional[str]:
        """The unique next character, if the grammar forces one."""
        if self.is_accepting(state):
            return None  # EOS is also legal -> not forced
        sets = self.allowed_charsets(state)
        if not sets:
            return None
        ch = sets[0].single()
        if ch is None:
            return None
        for cs in sets[1:]:
            if cs.single() != ch:
                return None
        return ch

    def jump_forward(self, state, max_len: int = 64) -> str:
        """Longest forced span from `state` (reference: xgrammar
        find_jump_forward_string)."""
        out: List[str] = []
        s = state
        while len(out) < max_len:
            ch = self.forced_char(s)
            if ch is None:
                break
            s2 = self.advance(s, ch)
            if s2 is None:
                break
            out.append(ch)
            s = s2
        return "".join(out)
