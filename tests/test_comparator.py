"""Tensor dumper + cross-run comparator (reference analog:
srt/debug_utils/dumper.py + comparator/)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.utils.comparator import Dumper, compare_dirs


def _engine(dump_dir, seed=0):
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=2048, attention_backend="xla", context_length=256,
        debug_dump_dir=str(dump_dir), random_seed=seed,
    )
    return Engine(server_args=args, model_config=ModelConfig.tiny_llama(),
                  tokenizer=ByteTokenizer())


def test_identical_runs_compare_clean(tmp_path):
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    _engine(tmp_path / "a").generate("compare me", sp)
    _engine(tmp_path / "b").generate("compare me", sp)
    rep = compare_dirs(str(tmp_path / "a"), str(tmp_path / "b"), atol=1e-6)
    assert rep["files"] and not rep["mismatches"] and not rep["missing"]


def test_diverging_runs_flagged(tmp_path):
    da, db = Dumper(str(tmp_path / "a")), Dumper(str(tmp_path / "b"))
    x = np.ones((4, 4), np.float32)
    da.dump("step", logits=x)
    db.dump("step", logits=x + 0.5)
    rep = compare_dirs(str(tmp_path / "a"), str(tmp_path / "b"), atol=1e-3)
    assert rep["mismatches"]
    assert rep["mismatches"][0]["max_abs"] == pytest.approx(0.5)


def test_missing_files_flagged(tmp_path):
    Dumper(str(tmp_path / "a")).dump("only_here", x=np.zeros(2))
    (tmp_path / "b").mkdir()
    rep = compare_dirs(str(tmp_path / "a"), str(tmp_path / "b"))
    assert rep["missing"]
