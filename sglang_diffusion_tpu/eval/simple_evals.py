"""Accuracy eval harness: GSM8K / MMLU / MGSM simple-evals.

TPU-native analog of the reference's eval suite
(python/sglang/test/simple_eval_common.py, simple_eval_gsm8k/mmlu/mgsm,
few_shot_gsm8k.py, run_eval.py): few-shot prompting, answer extraction,
and threshold gating used by CI accuracy tests
(test/registered/eval/test_eval_accuracy_large.py:57,76,96).

Datasets are local files (zero-egress environment): JSONL with
{"question", "answer"} for gsm8k/mgsm; CSV with question,A,B,C,D,answer
for MMLU. A `sampler` is anything with
generate(prompt, sampling_params) -> {"text": ...} — the in-process
Engine works directly; HttpSampler wraps a live server.
"""

from __future__ import annotations

import csv
import json
import re
import random
import time
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

ANSWER_PATTERN = re.compile(r"(-?[\d,]*\.?\d+)")
MC_ANSWER_PATTERN = re.compile(r"(?:answer\s*(?:is)?:?\s*)\(?([ABCD])\)?", re.I)

GSM8K_FEWSHOT = [
    (
        "There are 15 trees in the grove. Grove workers will plant trees in "
        "the grove today. After they are done, there will be 21 trees. How "
        "many trees did the grove workers plant today?",
        "There are 15 trees originally. Then there were 21 trees after some "
        "more were planted. So there must have been 21 - 15 = 6. "
        "The answer is 6.",
    ),
    (
        "If there are 3 cars in the parking lot and 2 more cars arrive, how "
        "many cars are in the parking lot?",
        "There are originally 3 cars. 2 more cars arrive. 3 + 2 = 5. "
        "The answer is 5.",
    ),
    (
        "Leah had 32 chocolates and her sister had 42. If they ate 35, how "
        "many pieces do they have left in total?",
        "Originally, Leah had 32 chocolates. Her sister had 42. So in total "
        "they had 32 + 42 = 74. After eating 35, they had 74 - 35 = 39. "
        "The answer is 39.",
    ),
    (
        "Jason had 20 lollipops. He gave Denny some lollipops. Now Jason has "
        "12 lollipops. How many lollipops did Jason give to Denny?",
        "Jason started with 20 lollipops. Then he had 12 after giving some "
        "to Denny. So he gave Denny 20 - 12 = 8. The answer is 8.",
    ),
]


@dataclass
class EvalResult:
    name: str
    score: float  # accuracy in [0, 1]
    num_examples: int
    num_correct: int
    latency_s: float
    per_example: List[Dict[str, Any]] = field(default_factory=list)

    def to_dict(self) -> Dict[str, Any]:
        return {
            "name": self.name,
            "score": self.score,
            "num_examples": self.num_examples,
            "num_correct": self.num_correct,
            "latency_s": round(self.latency_s, 2),
        }


def extract_last_number(text: str) -> Optional[str]:
    """GSM8K-style: prefer 'The answer is N' / '#### N', else last number."""
    for pat in (r"answer is\s*\$?(-?[\d,]*\.?\d+)", r"####\s*(-?[\d,]*\.?\d+)"):
        m = re.search(pat, text, re.I)
        if m:
            return m.group(1).replace(",", "")
    nums = ANSWER_PATTERN.findall(text)
    return nums[-1].replace(",", "") if nums else None


def _num_eq(a: Optional[str], b: Optional[str]) -> bool:
    if a is None or b is None:
        return False
    try:
        return abs(float(a) - float(b)) < 1e-6
    except ValueError:
        return a.strip() == b.strip()


class _EvalBase:
    name = "base"

    def __init__(self, dataset_path: str, num_examples: Optional[int] = None,
                 num_shots: int = 4, seed: int = 0):
        self.examples = self._load(dataset_path)
        rng = random.Random(seed)
        rng.shuffle(self.examples)
        if num_examples is not None:
            self.examples = self.examples[:num_examples]
        self.num_shots = num_shots

    def _load(self, path: str) -> List[Dict[str, Any]]:
        raise NotImplementedError

    def build_prompt(self, ex: Dict[str, Any]) -> str:
        raise NotImplementedError

    def grade(self, ex: Dict[str, Any], response: str) -> bool:
        raise NotImplementedError

    def sampling_params(self) -> Dict[str, Any]:
        return {"temperature": 0.0, "max_new_tokens": 256,
                "stop": ["Question:", "\n\nQuestion"]}

    def run(self, sampler) -> EvalResult:
        t0 = time.monotonic()
        per = []
        correct = 0
        prompts = [self.build_prompt(ex) for ex in self.examples]
        outs = sampler.generate_batch(prompts, self.sampling_params())
        for ex, out in zip(self.examples, outs):
            ok = self.grade(ex, out)
            correct += ok
            per.append({"ok": ok, "response": out[:200]})
        n = max(1, len(self.examples))
        return EvalResult(
            name=self.name,
            score=correct / n,
            num_examples=len(self.examples),
            num_correct=correct,
            latency_s=time.monotonic() - t0,
            per_example=per,
        )


class GSM8KEval(_EvalBase):
    """Few-shot GSM8K (reference: python/sglang/test/few_shot_gsm8k.py,
    simple_eval_gsm8k); answers graded by final-number match."""

    name = "gsm8k"

    def _load(self, path: str):
        out = []
        with open(path) as f:
            for line in f:
                if line.strip():
                    d = json.loads(line)
                    ans = d["answer"]
                    gt = ans.split("####")[-1].strip() if "####" in ans else ans
                    out.append({"question": d["question"], "gt": gt})
        return out

    def build_prompt(self, ex):
        parts = []
        for q, a in GSM8K_FEWSHOT[: self.num_shots]:
            parts.append(f"Question: {q}\nAnswer: {a}")
        parts.append(f"Question: {ex['question']}\nAnswer:")
        return "\n\n".join(parts)

    def grade(self, ex, response):
        return _num_eq(extract_last_number(response), ex["gt"])


class MGSMEval(GSM8KEval):
    """Multilingual GSM (same format/grading, different dataset file)."""

    name = "mgsm"


class MMLUEval(_EvalBase):
    """MMLU multiple-choice (reference: simple_eval_mmlu.py). CSV rows:
    question,A,B,C,D,answer."""

    name = "mmlu"

    def _load(self, path: str):
        out = []
        with open(path) as f:
            for row in csv.reader(f):
                if len(row) >= 6:
                    out.append({
                        "question": row[0],
                        "choices": row[1:5],
                        "gt": row[5].strip().upper(),
                    })
        return out

    def sampling_params(self):
        return {"temperature": 0.0, "max_new_tokens": 32, "stop": ["\n\n"]}

    def build_prompt(self, ex):
        letters = "ABCD"
        ch = "\n".join(
            f"{letters[i]}) {c}" for i, c in enumerate(ex["choices"])
        )
        return (
            "Answer the following multiple choice question. Reply with only "
            f"the letter of the correct answer.\n\n{ex['question']}\n{ch}\n"
            "Answer:"
        )

    def grade(self, ex, response):
        m = MC_ANSWER_PATTERN.search(response)
        if m:
            return m.group(1).upper() == ex["gt"]
        s = response.strip()
        return bool(s) and s[0].upper() == ex["gt"]


class HumanEvalEval(_EvalBase):
    """HumanEval (reference: simple_eval_humaneval.py): completions are
    executed against the task's unit tests in a resource-limited subprocess
    with a timeout. Dataset: JSONL rows {task_id, prompt, test, entry_point}.

    Execution of model-generated code is gated behind an explicit opt-in
    (`allow_code_exec=True` or SGLD_TPU_ALLOW_CODE_EXEC=1), mirroring the
    reference's human-eval dependency which requires uncommenting its exec
    call. The subprocess runs `python -I` in an empty temp cwd with rlimits
    on CPU time, address space, processes, file size, and open files."""

    name = "humaneval"
    exec_timeout_s = 10.0
    exec_mem_bytes = 2 * 1024 ** 3

    def __init__(self, *args, allow_code_exec: bool = False, **kwargs):
        super().__init__(*args, **kwargs)
        import os as _os
        self.allow_code_exec = allow_code_exec or (
            _os.environ.get("SGLD_TPU_ALLOW_CODE_EXEC", "0") == "1"
        )

    def _rlimits(self):
        import resource

        cpu_s = int(self.exec_timeout_s) + 1
        resource.setrlimit(resource.RLIMIT_CPU, (cpu_s, cpu_s))
        resource.setrlimit(
            resource.RLIMIT_AS, (self.exec_mem_bytes, self.exec_mem_bytes))
        resource.setrlimit(resource.RLIMIT_NPROC, (16, 16))
        resource.setrlimit(resource.RLIMIT_FSIZE, (1 << 20, 1 << 20))
        resource.setrlimit(resource.RLIMIT_NOFILE, (64, 64))

    def _load(self, path: str):
        out = []
        with open(path) as f:
            for line in f:
                if line.strip():
                    d = json.loads(line)
                    out.append({
                        "task_id": d.get("task_id", ""),
                        "prompt": d["prompt"],
                        "test": d["test"],
                        "entry_point": d["entry_point"],
                    })
        return out

    def sampling_params(self):
        return {"temperature": 0.0, "max_new_tokens": 512,
                "stop": ["\ndef ", "\nclass ", "\nif __name__"]}

    def build_prompt(self, ex):
        return ex["prompt"]

    def grade(self, ex, response):
        import os
        import shutil
        import subprocess
        import sys
        import tempfile

        if not self.allow_code_exec:
            raise RuntimeError(
                "HumanEval grading executes model-generated code; pass "
                "allow_code_exec=True or set SGLD_TPU_ALLOW_CODE_EXEC=1 "
                "to opt in.")

        program = (
            ex["prompt"] + response + "\n\n" + ex["test"] + "\n"
            + f"check({ex['entry_point']})\n"
        )
        workdir = tempfile.mkdtemp(prefix="humaneval_")
        path = os.path.join(workdir, "prog.py")
        with open(path, "w") as f:
            f.write(program)
        try:
            r = subprocess.run(
                [sys.executable, "-I", path], capture_output=True,
                timeout=self.exec_timeout_s, cwd=workdir,
                preexec_fn=self._rlimits,
                env={"PATH": "/usr/bin:/bin"},
            )
            return r.returncode == 0
        except subprocess.TimeoutExpired:
            return False
        finally:
            shutil.rmtree(workdir, ignore_errors=True)


_EVALS = {"gsm8k": GSM8KEval, "mgsm": MGSMEval, "mmlu": MMLUEval,
          "humaneval": HumanEvalEval}


def get_eval(name: str):
    if name not in _EVALS:
        raise KeyError(f"unknown eval {name}; have {sorted(_EVALS)}")
    return _EVALS[name]


class EngineSampler:
    """Adapts an in-process Engine to the sampler protocol."""

    def __init__(self, engine):
        self.engine = engine

    def generate_batch(self, prompts: List[str], sp: Dict[str, Any]) -> List[str]:
        outs = self.engine.generate(prompts, dict(sp))
        if isinstance(outs, dict):
            outs = [outs]
        return [o["text"] for o in outs]


class HttpSampler:
    """Samples from a live server's /generate route (reference analog:
    run_eval.py hitting an OpenAI endpoint)."""

    def __init__(self, base_url: str):
        self.base_url = base_url.rstrip("/")

    def generate_batch(self, prompts, sp):
        import urllib.request

        outs = []
        for p in prompts:
            body = json.dumps(
                {"text": p, "sampling_params": sp}
            ).encode()
            req = urllib.request.Request(
                self.base_url + "/generate", data=body,
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=600) as r:
                outs.append(json.loads(r.read())["text"])
        return outs


def run_eval(sampler_or_engine, eval_name: str, dataset_path: str,
             num_examples: Optional[int] = None, num_shots: int = 4,
             **eval_kwargs) -> EvalResult:
    ev = get_eval(eval_name)(dataset_path, num_examples, num_shots,
                             **eval_kwargs)
    sampler = (
        sampler_or_engine
        if hasattr(sampler_or_engine, "generate_batch")
        else EngineSampler(sampler_or_engine)
    )
    return ev.run(sampler)


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser(description="Run an accuracy eval")
    ap.add_argument("--eval", required=True, choices=sorted(_EVALS))
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--base-url", default="http://127.0.0.1:30000")
    ap.add_argument("--num-examples", type=int, default=None)
    ap.add_argument("--num-shots", type=int, default=4)
    ap.add_argument("--threshold", type=float, default=None,
                    help="exit nonzero if score < threshold (CI gating)")
    args = ap.parse_args(argv)
    res = run_eval(HttpSampler(args.base_url), args.eval, args.dataset,
                   args.num_examples, args.num_shots)
    print(json.dumps(res.to_dict()))
    if args.threshold is not None and res.score < args.threshold:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
