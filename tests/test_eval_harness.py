"""Eval harness mechanics: prompt building, answer extraction, grading,
threshold gating (reference analog: python/sglang/test/simple_eval_*)."""

import json

import pytest

from sglang_diffusion_tpu.eval import GSM8KEval, MMLUEval, get_eval, run_eval
from sglang_diffusion_tpu.eval.simple_evals import (
    EngineSampler,
    extract_last_number,
)


class CannedSampler:
    """Returns canned responses keyed by the target question."""

    def __init__(self, fn):
        self.fn = fn

    def generate_batch(self, prompts, sp):
        return [self.fn(p) for p in prompts]


def _write_gsm8k(tmp_path, n=6):
    p = tmp_path / "gsm8k.jsonl"
    with open(p, "w") as f:
        for i in range(n):
            f.write(json.dumps({
                "question": f"What is {i} plus {i}?",
                "answer": f"Add them.\n#### {2 * i}",
            }) + "\n")
    return str(p)


def test_extract_last_number():
    assert extract_last_number("blah 12 then The answer is 42.") == "42"
    assert extract_last_number("#### 1,234") == "1234"
    assert extract_last_number("x = 3.5 done") == "3.5"
    assert extract_last_number("no numbers") is None


def test_gsm8k_end_to_end_grading(tmp_path):
    path = _write_gsm8k(tmp_path)

    def answer(prompt):
        # parse the target question out of the few-shot prompt and answer
        # correctly for even i, wrongly for odd i
        q = prompt.rsplit("Question: ", 1)[1]
        i = int(q.split("What is ")[1].split(" plus")[0])
        val = 2 * i if i % 2 == 0 else 2 * i + 1
        return f"Reasoning... The answer is {val}."

    res = run_eval(CannedSampler(answer), "gsm8k", path)
    assert res.num_examples == 6
    assert res.num_correct == 3
    assert res.score == pytest.approx(0.5)
    d = res.to_dict()
    assert d["name"] == "gsm8k" and "latency_s" in d


def test_gsm8k_fewshot_prompt_shape(tmp_path):
    path = _write_gsm8k(tmp_path, n=1)
    ev = GSM8KEval(path, num_shots=2)
    prompt = ev.build_prompt(ev.examples[0])
    assert prompt.count("Question:") == 3  # 2 shots + target
    assert prompt.endswith("Answer:")


def test_mmlu_grading(tmp_path):
    p = tmp_path / "mmlu.csv"
    with open(p, "w") as f:
        f.write('"Largest planet?",Mars,Jupiter,Venus,Pluto,B\n')
        f.write('"2+2?",1,2,3,4,D\n')

    res = run_eval(
        CannedSampler(lambda pr: "Answer: B"), "mmlu", str(p)
    )
    assert res.num_examples == 2 and res.num_correct == 1

    # bare-letter responses also grade
    res2 = run_eval(CannedSampler(lambda pr: "D"), "mmlu", str(p))
    assert res2.num_correct == 1


def test_engine_sampler_smoke(tmp_path):
    """Harness runs against the real tiny engine (accuracy meaningless —
    validates the integration only, like the reference's CI smoke)."""
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer

    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=8192, attention_backend="xla", context_length=2048,
        chunked_prefill_size=512, max_prefill_tokens=1024,
    )
    eng = Engine(server_args=args, model_config=ModelConfig.tiny_llama(),
                 tokenizer=ByteTokenizer())
    path = _write_gsm8k(tmp_path, n=2)
    res = run_eval(eng, "gsm8k", path, num_shots=1)
    assert res.num_examples == 2
    assert 0.0 <= res.score <= 1.0


def test_unknown_eval():
    with pytest.raises(KeyError):
        get_eval("nope")


def test_humaneval_exec_grading(tmp_path):
    """HumanEval grading executes completions in a sandboxed subprocess
    (reference: simple_eval_humaneval.py)."""
    p = tmp_path / "he.jsonl"
    task = {
        "task_id": "T/0",
        "prompt": "def add(a, b):\n",
        "test": (
            "def check(candidate):\n"
            "    assert candidate(1, 2) == 3\n"
            "    assert candidate(-1, 1) == 0\n"
        ),
        "entry_point": "add",
    }
    with open(p, "w") as f:
        f.write(json.dumps(task) + "\n")

    good = CannedSampler(lambda pr: "    return a + b\n")
    with pytest.raises(RuntimeError):
        run_eval(good, "humaneval", str(p))  # exec requires opt-in
    res = run_eval(good, "humaneval", str(p), allow_code_exec=True)
    assert res.num_correct == 1

    bad = CannedSampler(lambda pr: "    return a - b\n")
    assert run_eval(bad, "humaneval", str(p), allow_code_exec=True).num_correct == 0

    hang = CannedSampler(
        lambda pr: "    while True:\n        pass\n"
    )
    from sglang_diffusion_tpu.eval.simple_evals import HumanEvalEval

    old = HumanEvalEval.exec_timeout_s
    HumanEvalEval.exec_timeout_s = 2.0
    try:
        assert run_eval(hang, "humaneval", str(p), allow_code_exec=True).num_correct == 0
    finally:
        HumanEvalEval.exec_timeout_s = old
