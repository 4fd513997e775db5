"""dLLM block-diffusion decoding (reference analog: srt/dllm/ +
DLLM_EXTEND mode tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.dllm import DLLMGenerator
from sglang_diffusion_tpu.models.registry import get_model_cls

MASK = 511


@pytest.fixture(scope="module")
def setup():
    cfg = ModelConfig.tiny_llama()
    params = get_model_cls(cfg.architecture).init_params(
        jax.random.PRNGKey(0), cfg, jnp.float32
    )
    return cfg, params


def test_low_confidence_reveals_everything(setup):
    cfg, params = setup
    gen = DLLMGenerator(cfg, params, MASK, block_size=8, reveal_per_iter=3)
    out = gen.generate([1, 2, 3, 4], max_new_tokens=16)
    assert len(out["output_ids"]) == 16
    assert MASK not in out["output_ids"]
    assert out["meta_info"]["num_blocks"] == 2


def test_joint_threshold_progresses(setup):
    cfg, params = setup
    gen = DLLMGenerator(
        cfg, params, MASK, block_size=8, algorithm="joint_threshold",
        threshold=0.99,  # random model: almost nothing passes -> forced best
    )
    out = gen.generate([5, 6, 7], max_new_tokens=8)
    assert MASK not in out["output_ids"]


def test_deterministic(setup):
    cfg, params = setup
    gen = DLLMGenerator(cfg, params, MASK, block_size=8)
    a = gen.generate([9, 8, 7], max_new_tokens=8)
    b = gen.generate([9, 8, 7], max_new_tokens=8)
    assert a["output_ids"] == b["output_ids"]


def test_block_causality(setup):
    """The first block's output must not depend on how many total blocks are
    generated (future blocks are invisible)."""
    cfg, params = setup
    gen = DLLMGenerator(cfg, params, MASK, block_size=8)
    short = gen.generate([1, 2, 3], max_new_tokens=8)
    long = gen.generate([1, 2, 3], max_new_tokens=16)
    assert short["output_ids"] == long["output_ids"][:8]
