"""Multi-device SPMD tests on the virtual 8-CPU mesh: engine outputs must be
identical across mesh shapes (the TPU analog of the reference's multi-GPU
suites, run GPU-free per SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.parallel.mesh import create_mesh
from sglang_diffusion_tpu.sampling.params import SamplingParams


def make_engine(tp, dp):
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=2048,
        attention_backend="xla",
        context_length=256,
        tp_size=tp,
        dp_size=dp,
        random_seed=0,
    )
    cfg = ModelConfig.tiny_llama(
        vocab_size=512, hidden_size=64, num_attention_heads=4, num_key_value_heads=4
    )
    mesh_ctx = create_mesh(tp_size=tp, dp_size=dp)
    return Engine(
        server_args=args,
        model_config=cfg,
        tokenizer=ByteTokenizer(),
        mesh_ctx=mesh_ctx,
    )


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_tp_matches_single_device():
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    prompts = ["sharded attention test", "another prompt"]
    ref = make_engine(1, 1).generate(prompts, sp)
    tp = make_engine(4, 1).generate(prompts, sp)
    for a, b in zip(ref, tp):
        assert a["output_ids"] == b["output_ids"]


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_tp_dp_combo_runs():
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    eng = make_engine(2, 2)
    outs = eng.generate([f"prompt {i}" for i in range(4)], sp)
    assert all(len(o["output_ids"]) == 6 for o in outs)
    ref = make_engine(1, 1).generate([f"prompt {i}" for i in range(4)], sp)
    for a, b in zip(ref, outs):
        assert a["output_ids"] == b["output_ids"]


def test_graft_entry_dryrun():
    import __graft_entry__ as g

    g.dryrun_multichip(min(8, jax.device_count()))
