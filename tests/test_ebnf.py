"""EBNF/GBNF grammar backend + jump-forward tests.

Reference analog: srt/constrained/xgrammar_backend.py (EBNF grammars and
find_jump_forward_string) exercised via test/registered/constrained tests.
"""

import pytest

from sglang_diffusion_tpu.constrained.ebnf import EbnfGrammar

EXPR = """
root ::= expr
expr ::= term (("+" | "-") term)*
term ::= [0-9]+
"""

JSONG = r"""
root   ::= value
value  ::= object | array | string | number | "true" | "false" | "null"
object ::= "{" ws (pair (ws "," ws pair)*)? ws "}"
pair   ::= string ws ":" ws value
array  ::= "[" ws (value (ws "," ws value)*)? ws "]"
string ::= "\"" [a-zA-Z0-9_ ]* "\""
number ::= "-"? [0-9]+ ("." [0-9]+)?
ws     ::= [ \t\n]*
"""

SQL = """
root ::= "SELECT " cols " FROM " ident (" WHERE " cond)?
cols ::= ident ("," ident)* | "*"
ident ::= [a-z_]+
cond ::= ident "=" [0-9]+
"""


def _accepts(g, s):
    st = g.advance(g.start_state(), s)
    return st is not None and g.is_accepting(st)


def _viable(g, s):
    return g.advance(g.start_state(), s) is not None


@pytest.mark.parametrize(
    "text,ok",
    [
        ("1+2", True),
        ("42", True),
        ("1+2-33", True),
        ("1+", False),
        ("+1", False),
        ("a", False),
    ],
)
def test_expr_grammar(text, ok):
    g = EbnfGrammar(EXPR)
    assert _accepts(g, text) == ok


@pytest.mark.parametrize(
    "text,ok",
    [
        ('{"a": 1}', True),
        ('{"a": [1, 2], "b": "x"}', True),
        ("[1,2,3]", True),
        ("true", True),
        ("-3.5", True),
        ('{"a": }', False),
        ("[1,]", False),
    ],
)
def test_recursive_json_grammar(text, ok):
    g = EbnfGrammar(JSONG)
    assert _accepts(g, text) == ok


def test_prefix_viability_and_rejection():
    g = EbnfGrammar(SQL)
    assert _viable(g, "SELECT a,b FROM t WHERE x=1")
    assert _accepts(g, "SELECT * FROM t")
    assert not _viable(g, "INSERT")
    st = g.advance(g.start_state(), "SELECT a")
    assert st is not None and not g.is_accepting(st)


def test_jump_forward_forced_spans():
    g = EbnfGrammar(SQL)
    # from the start, "SELECT " is fully forced
    assert g.jump_forward(g.start_state()) == "SELECT "
    # after cols, " FROM " is NOT forced ("," could continue cols for
    # alphabetic idents) — but after '*' the cols rule is closed
    st = g.advance(g.start_state(), "SELECT *")
    assert g.jump_forward(st) == " FROM "
    # nothing forced when branching (ident chars vs '=' etc.)
    st2 = g.advance(g.start_state(), "SELECT * FROM ab")
    assert g.jump_forward(st2) == ""


def test_jump_forward_stops_at_accepting():
    # grammar where EOS is legal mid-span: no forced jump
    g = EbnfGrammar('root ::= "ab" "c"?')
    st = g.advance(g.start_state(), "a")
    assert g.jump_forward(st) == "b"  # 'b' forced, then 'c'? is optional


def test_left_recursion_bounded():
    # left recursion must not hang (configs hit the MAX_STACK bound)
    g = EbnfGrammar('root ::= root "a" | "b"')
    assert _accepts(g, "b")
    assert _accepts(g, "baa")
    assert not _viable(g, "x")


# ---------------- e2e with engine ----------------
@pytest.fixture(scope="module")
def engine():
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer

    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=2048,
        attention_backend="xla",
        context_length=256,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    return Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())


def test_e2e_ebnf_constrained(engine):
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    out = engine.generate(
        "query:",
        SamplingParams(temperature=0.8, max_new_tokens=30, ebnf=SQL),
    )
    text = out["text"]
    assert text.startswith("SELECT "), text
    if out["meta_info"]["finish_reason"] == "stop":
        import re

        assert re.fullmatch(
            r"SELECT ([a-z_]+(,[a-z_]+)*|\*) FROM [a-z_]+"
            r"( WHERE [a-z_]+=[0-9]+)?",
            text,
        ), text


def test_e2e_jump_forward_skips_forwards(engine):
    """The forced "SELECT " prefix and " FROM " span must be appended via
    jump-forward (no model forwards), visible in the scheduler counter."""
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    before = engine.scheduler.jump_forward_tokens
    out = engine.generate(
        "q2:",
        SamplingParams(temperature=0.0, max_new_tokens=30, ebnf=SQL),
    )
    gained = engine.scheduler.jump_forward_tokens - before
    assert out["text"].startswith("SELECT ")
    # first char is sampled, "ELECT " is jump-forwarded (byte tokenizer)
    assert gained >= len("ELECT "), gained
