"""Attention-TP subgroups under attn-DP (reference:
srt/distributed/parallel_state.py:1496,1796): attention runs with
attn_tp-way head sharding inside each attention-DP group while FFN /
embeddings keep the full model-parallel degree. Outputs must match the
single-device engine token-for-token."""

import jax
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _cfg():
    return ModelConfig(
        architecture="LlamaForCausalLM",
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=256,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
    )


def _engine(**kw):
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=256,
        random_seed=0, **kw,
    )
    return Engine(server_args=args, model_config=_cfg(),
                  tokenizer=ByteTokenizer())


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_attn_tp_matches_single_device():
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    prompts = [f"attn tp prompt number {i}" for i in range(4)]
    ref = _engine().generate(prompts, sp)
    got = _engine(
        tp_size=4, enable_dp_attention=True, attn_tp_size=2
    ).generate(prompts, sp)
    for r, g in zip(ref, got):
        assert r["output_ids"] == g["output_ids"]


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_attn_tp_mesh_factorization():
    eng = _engine(tp_size=4, enable_dp_attention=True, attn_tp_size=2)
    # mesh: tp axis = attn_tp (2), dp axis = tp/attn_tp (2)
    assert eng.mesh_ctx.tp_size == 2
    assert eng.mesh_ctx.dp_size == 2
    assert eng.runner.attn_tp
    # attention weights sharded at attn_tp degree, FFN at full degree
    from jax.sharding import PartitionSpec as P

    layers = eng.runner.params["layers"]
    wq_spec = layers["wq"].sharding.spec
    wg_spec = layers["w_gate"].sharding.spec
    assert "tp" in str(wq_spec) and "dp" not in str(wq_spec)
    assert "dp" in str(wg_spec) and "tp" in str(wg_spec)


def test_attn_tp_validation():
    with pytest.raises(ValueError):
        _engine(tp_size=3, enable_dp_attention=True, attn_tp_size=2)
