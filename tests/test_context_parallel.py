"""Context-parallel prefill (reference analog: attn-CP groups,
parallel_state.py:1503 + NSA seq-split prefill): outputs must match the
single-device engine token-for-token."""

import jax
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.parallel.mesh import create_mesh
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _engine(tp, dp, cp):
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=1024,
        chunked_prefill_size=512, max_prefill_tokens=1024,
        tp_size=tp, dp_size=dp, enable_context_parallel=cp, random_seed=0,
    )
    cfg = ModelConfig.tiny_llama(
        vocab_size=512, hidden_size=64, num_attention_heads=4,
        num_key_value_heads=4, max_position_embeddings=1024,
    )
    return Engine(server_args=args, model_config=cfg,
                  tokenizer=ByteTokenizer(),
                  mesh_ctx=create_mesh(tp_size=tp, dp_size=dp))


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_cp_prefill_matches_single_device():
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    prompt = "a long prompt for context parallel prefill " * 10
    ref = _engine(1, 1, False).generate(prompt, sp)["output_ids"]
    got = _engine(2, 2, True).generate(prompt, sp)["output_ids"]
    assert got == ref


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_cp_with_short_prompts_still_correct():
    """Chunks that don't divide the mesh skip the constraint (fallback)."""
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    prompts = ["hi", "a bit longer prompt here"]
    ref = [r["output_ids"] for r in _engine(1, 1, False).generate(prompts, sp)]
    got = [r["output_ids"] for r in _engine(4, 1, True).generate(prompts, sp)]
    assert got == ref
