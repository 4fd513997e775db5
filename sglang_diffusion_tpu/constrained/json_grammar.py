"""Character-level JSON pushdown automaton for constrained decoding.

Accepts any syntactically valid JSON value (object/array/string/number/
true/false/null) with sensible whitespace. State = (mode stack, scalar
progress); exposes the same interface as RegexNFA (start_state / advance /
is_accepting) so GrammarManager treats both uniformly.
"""

from __future__ import annotations

from typing import Optional, Tuple

WS = " \t\n\r"
DIGITS = "0123456789"

# stack symbols:
#   V  expect value
#   O1 object: expect key-string or '}'
#   O2 object: expect ':'
#   O3 object: expect ',' or '}'
#   O4 object: expect key-string (after comma)
#   A1 array: expect value or ']'
#   A2 array: expect ',' or ']'
#   S  in string (content)
#   E  in string escape
#   Nx in number (x = sub-state)
# literal progress: ("L", full, idx)

State = Tuple  # (tuple stack,)


class JsonGrammar:
    def start_state(self):
        return (("V",),)

    def is_accepting(self, state) -> bool:
        (stack,) = state
        if len(stack) == 0:
            return True
        # a top-level number is complete as soon as its digits are valid
        return (
            len(stack) == 1
            and isinstance(stack[0], tuple)
            and stack[0][0] == "N"
            and self._num_complete(stack[0])
        )

    # number sub-states: N_int (after digits), N_frac, N_exp — each may end
    def advance(self, state, text: str):
        (stack,) = state
        stack = list(stack)
        for ch in text:
            stack = self._step(stack, ch)
            if stack is None:
                return None
        return (tuple(stack),)

    def _pop_value_done(self, stack):
        """A value was completed; update the containing context."""
        if not stack:
            return []
        top = stack[-1]
        if top == "A1":
            stack[-1] = "A2"
        elif top == "O2v":
            stack[-1] = "O3"
        return stack

    def _step(self, stack, ch):
        while True:
            if not stack:
                return None if ch not in WS else stack
            top = stack[-1]

            # ---------- number endings (numbers end implicitly) ----------
            if isinstance(top, tuple) and top[0] == "N":
                nxt = self._num_step(top, ch)
                if nxt == "dead":
                    if self._num_complete(top):
                        stack.pop()
                        stack = self._pop_value_done(stack)
                        continue  # re-dispatch ch in outer context
                    return None
                stack[-1] = nxt
                return stack

            if top == "V":
                if ch in WS:
                    return stack
                stack.pop()
                if ch == "{":
                    stack.append("O1")
                elif ch == "[":
                    stack.append("A1v")
                elif ch == '"':
                    stack.append(("Sval",))
                    stack.append("S")
                elif ch in "-" + DIGITS:
                    stack.append(("N", "int" if ch in DIGITS else "sign"))
                elif ch in "tfn":
                    lit = {"t": "true", "f": "false", "n": "null"}[ch]
                    if len(lit) > 1:
                        stack.append(("L", lit, 1))
                    else:
                        stack = self._pop_value_done(stack)
                else:
                    return None
                return stack

            if isinstance(top, tuple) and top[0] == "L":
                _, lit, idx = top
                if ch != lit[idx]:
                    return None
                if idx + 1 == len(lit):
                    stack.pop()
                    stack = self._pop_value_done(stack)
                else:
                    stack[-1] = ("L", lit, idx + 1)
                return stack

            if top == "S":
                if ch == '"':
                    stack.pop()
                    marker = stack.pop() if stack and isinstance(stack[-1], tuple) and stack[-1][0] in ("Sval", "Skey") else None
                    if marker and marker[0] == "Skey":
                        stack.append("O2")
                    else:
                        stack = self._pop_value_done(stack)
                elif ch == "\\":
                    stack.append("E")
                elif ord(ch) >= 32:
                    pass
                else:
                    return None
                return stack

            if top == "E":
                if ch in '"\\/bfnrtu':
                    stack.pop()
                    return stack
                return None

            if top == "O1":
                if ch in WS:
                    return stack
                if ch == "}":
                    stack.pop()
                    stack = self._pop_value_done(stack)
                    return stack
                if ch == '"':
                    stack[-1] = "O_after_key"
                    stack.append(("Skey",))
                    stack.append("S")
                    return stack
                return None

            if top == "O2":
                if ch in WS:
                    return stack
                if ch == ":":
                    # top of stack below should be O_after_key
                    stack.pop()  # O2
                    assert stack[-1] == "O_after_key"
                    stack[-1] = "O2v"
                    stack.append("V")
                    return stack
                return None

            if top == "O3":
                if ch in WS:
                    return stack
                if ch == ",":
                    stack[-1] = "O1k"
                    return stack
                if ch == "}":
                    stack.pop()
                    stack = self._pop_value_done(stack)
                    return stack
                return None

            if top == "O1k":
                if ch in WS:
                    return stack
                if ch == '"':
                    stack[-1] = "O_after_key"
                    stack.append(("Skey",))
                    stack.append("S")
                    return stack
                return None

            if top == "A1v":
                if ch in WS:
                    return stack
                if ch == "]":
                    stack.pop()
                    stack = self._pop_value_done(stack)
                    return stack
                stack[-1] = "A1"
                stack.append("V")
                continue  # dispatch ch as value start

            if top == "A2":
                if ch in WS:
                    return stack
                if ch == ",":
                    stack[-1] = "A1"
                    stack.append("V")
                    return stack
                if ch == "]":
                    stack.pop()
                    stack = self._pop_value_done(stack)
                    return stack
                return None

            return None

    # ---------- number machine ----------
    def _num_step(self, st, ch):
        _, mode = st
        if mode == "sign":
            return ("N", "int") if ch in DIGITS else "dead"
        if mode == "int":
            if ch in DIGITS:
                return ("N", "int")
            if ch == ".":
                return ("N", "fracstart")
            if ch in "eE":
                return ("N", "expsign")
            return "dead"
        if mode == "fracstart":
            return ("N", "frac") if ch in DIGITS else "dead"
        if mode == "frac":
            if ch in DIGITS:
                return ("N", "frac")
            if ch in "eE":
                return ("N", "expsign")
            return "dead"
        if mode == "expsign":
            if ch in "+-" or ch in DIGITS:
                return ("N", "exp") if ch in DIGITS else ("N", "expdigits")
            return "dead"
        if mode == "expdigits":
            return ("N", "exp") if ch in DIGITS else "dead"
        if mode == "exp":
            return ("N", "exp") if ch in DIGITS else "dead"
        return "dead"

    def _num_complete(self, st) -> bool:
        return st[1] in ("int", "frac", "exp")
