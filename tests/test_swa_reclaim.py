"""SWA window-bounded KV reclamation (reference analog: swa_memory_pool.py
/ swa_radix_cache.py): for all-sliding-window models, pages behind the
attention window return to the allocator mid-flight without changing
outputs."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _engine(reclaim=True):
    cfg = ModelConfig.tiny_llama(sliding_window=24)  # all layers sliding
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=512,
        disable_radix_cache=True, random_seed=0,
    )
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    if not reclaim:
        eng.scheduler.swa_window = None
    return eng


def test_swa_engine_detection():
    eng = _engine()
    assert eng.scheduler.swa_window == 24
    # mixed global/local layers must NOT enable reclamation
    cfg = ModelConfig.tiny_llama(
        sliding_window=24,
        layer_types=["sliding_attention", "full_attention"],
    )
    args = ServerArgs(model_path="", tokenizer_path="byte", page_size=8,
                      max_total_tokens=2048, attention_backend="xla",
                      context_length=512)
    eng2 = Engine(server_args=args, model_config=cfg,
                  tokenizer=ByteTokenizer())
    assert eng2.scheduler.swa_window is None


def test_swa_reclaim_outputs_identical_and_pages_freed():
    sp = SamplingParams(temperature=0.0, max_new_tokens=120, ignore_eos=True)
    prompt = "sliding window reclaim test " * 2
    ref = _engine(reclaim=False).generate(prompt, sp)["output_ids"]

    eng = _engine(reclaim=True)
    free_before = eng.allocator.free_pages
    out = eng.generate(prompt, sp)["output_ids"]
    assert out == ref  # freed pages were never read
    # after finish all pages are back
    assert eng.allocator.free_pages == free_before
    # reclamation actually triggered during the run
    assert eng.scheduler.swa_reclaimed_pages > 0


def test_swa_reclaim_many_requests_no_leak():
    eng = _engine(reclaim=True)
    sp = SamplingParams(temperature=0.0, max_new_tokens=80, ignore_eos=True)
    free0 = eng.allocator.free_pages
    eng.generate([f"req {i} text" for i in range(4)], sp)
    assert eng.allocator.free_pages == free0
    eng.scheduler.self_check_idle()
