"""Constrained decoding tests: regex NFA, JSON PDA, and e2e grammar-masked
generation (reference analog: test/registered/constrained_decoding)."""

import json

import numpy as np
import pytest

from sglang_diffusion_tpu.constrained.json_grammar import JsonGrammar
from sglang_diffusion_tpu.constrained.regex_nfa import RegexNFA


# ---------------- regex engine ----------------
@pytest.mark.parametrize(
    "pattern,accept,reject",
    [
        ("abc", ["abc"], ["ab", "abd", "abcd"]),
        ("a+b*", ["a", "aab", "abbb"], ["b", ""]),
        ("(yes|no)", ["yes", "no"], ["ye", "nos"]),
        ("[0-9]+", ["0", "123"], ["a", ""]),
        ("[^x]+", ["abc"], ["axb"]),
        ("a?b", ["ab", "b"], ["a", "aab"]),
        ("\\d{2,4}", ["12", "1234"], ["1", "12345"]),
        ("-?\\d+(\\.\\d+)?", ["-3", "3.14", "42"], ["3.", "-", "a1"]),
        ('"[a-z]+"', ['"abc"'], ['"abc', "abc"]),
    ],
)
def test_regex_accept_reject(pattern, accept, reject):
    nfa = RegexNFA(pattern)
    for s in accept:
        st = nfa.advance(nfa.start_state(), s)
        assert st is not None and nfa.is_accepting(st), (pattern, s)
    for s in reject:
        st = nfa.advance(nfa.start_state(), s)
        assert st is None or not nfa.is_accepting(st), (pattern, s)


def test_regex_prefix_viability():
    nfa = RegexNFA("(yes|no)")
    st = nfa.advance(nfa.start_state(), "y")
    assert st is not None and not nfa.is_accepting(st)
    assert nfa.advance(nfa.start_state(), "z") is None


# ---------------- JSON grammar ----------------
@pytest.mark.parametrize(
    "text",
    [
        "{}",
        "[]",
        '"hi"',
        "123",
        "-3.5e2",
        "true",
        "null",
        '{"a": 1}',
        '{"a": [1, 2, {"b": null}], "c": "x"}',
        '[1, "two", false, {"k": []}]',
        ' { "s" : "a\\"b" } ',
    ],
)
def test_json_accepts_valid(text):
    g = JsonGrammar()
    st = g.advance(g.start_state(), text)
    assert st is not None, text
    assert g.is_accepting(st), text


@pytest.mark.parametrize(
    "text",
    ["{", "[1,]", "{'a':1}", '{"a" 1}', "tru", '{"a":}', "01x", '"unterminated'],
)
def test_json_rejects_or_incomplete(text):
    g = JsonGrammar()
    st = g.advance(g.start_state(), text)
    assert st is None or not g.is_accepting(st), text


def test_json_prefix_viable():
    g = JsonGrammar()
    st = g.start_state()
    for ch in '{"key": [1, true, ':
        st = g.advance(st, ch)
        assert st is not None, ch


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


def test_e2e_regex_constrained(engine):
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    out = engine.generate(
        "answer:",
        SamplingParams(temperature=0.0, max_new_tokens=10, regex="(yes|no)"),
    )
    assert out["text"] in ("yes", "no"), out["text"]
    assert out["meta_info"]["finish_reason"] == "stop"


def test_e2e_number_regex(engine):
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    out = engine.generate(
        "pick a number:",
        SamplingParams(temperature=0.7, max_new_tokens=8, regex="[1-9][0-9]{0,2}"),
    )
    assert out["text"].isdigit() and 1 <= int(out["text"]) <= 999


def test_e2e_json_mode(engine):
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    out = engine.generate(
        "give me json:",
        SamplingParams(temperature=0.5, max_new_tokens=40, json_schema="{}"),
    )
    # either finished a valid JSON value (stop) or ran out of budget mid-value
    if out["meta_info"]["finish_reason"] == "stop":
        json.loads(out["text"])


def test_native_dfa_mask_matches_python():
    """The C++ DFA mask kernel must produce EXACTLY the Python NFA path's
    masks across states of a non-trivial regex (differential test,
    reference analog: xgrammar bitmask vs interpreter)."""
    from sglang_diffusion_tpu.constrained.dfa_mask import RegexDFA, get_lib
    from sglang_diffusion_tpu.constrained.manager import GrammarManager
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer

    assert get_lib() is not None, "native dfa kernel must build"
    tok = ByteTokenizer()
    pattern = r"(yes|no|maybe-[0-9]{1,3})!*"

    # python-path manager (force by disabling dfa cache entry)
    mgr_py = GrammarManager(tok, eos_token_id=0)
    sess_py = mgr_py.create_session({"regex": pattern})
    mgr_py._dfa_cache["re:" + pattern] = False  # force python path

    mgr_nat = GrammarManager(tok, eos_token_id=0)
    sess_nat = mgr_nat.create_session({"regex": pattern})
    # confirm the native path actually engages
    assert mgr_nat._native_mask(sess_nat) is not None

    import numpy as np

    feed = [ord(c) for c in "maybe-42"]
    for step_tok in [None] + feed:
        if step_tok is not None:
            sess_py.advance_token(step_tok)
            sess_nat.advance_token(step_tok)
        np.testing.assert_array_equal(
            sess_py.allowed_mask(), sess_nat.allowed_mask()
        )


def test_native_dfa_mask_large_vocab_speed():
    """On a 128k synthetic vocab the native kernel computes a fresh state's
    mask orders of magnitude faster than the per-token Python walk."""
    import time

    import numpy as np

    from sglang_diffusion_tpu.constrained.dfa_mask import RegexDFA, get_lib
    from sglang_diffusion_tpu.constrained.regex_nfa import RegexNFA

    if get_lib() is None:
        import pytest

        pytest.skip("native kernel unavailable")
    nfa = RegexNFA(r"[a-z]+[0-9]{2,4}")
    dfa = RegexDFA.compile(nfa)
    assert dfa is not None
    rng = np.random.default_rng(0)
    alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 ,.!"
    vocab = [
        "".join(alphabet[j] for j in rng.integers(0, len(alphabet), size=l))
        for l in rng.integers(1, 6, size=131072)
    ]
    classes, offsets, valid = dfa.prep_vocab(vocab)
    t0 = time.perf_counter()
    mask = dfa.fill_mask(classes, offsets, valid, 0)
    native_ms = (time.perf_counter() - t0) * 1e3
    # spot-verify correctness on a sample against the NFA
    idx = rng.integers(0, len(vocab), size=256)
    for i in idx:
        want = nfa.advance(nfa.start_state(), vocab[i]) is not None
        assert bool(mask[i]) == want, vocab[i]
    assert mask.sum() > 0
    assert native_ms < 200.0, f"native mask too slow: {native_ms:.1f}ms"
