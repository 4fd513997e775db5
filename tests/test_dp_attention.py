"""DeepSeek-style DP attention (reference: --enable-dp-attention,
srt/layers/dp_attention.py + scheduler_dp_attn_mixin): attention runs
batch-sharded over all devices with replicated attention weights and a
page-sharded KV pool, MoE stays tensor-sharded. Outputs must match the
single-device engine token-for-token."""

import jax
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.parallel.mesh import create_mesh
from sglang_diffusion_tpu.sampling.params import SamplingParams


def _deepseek_cfg():
    return ModelConfig(
        architecture="DeepseekV2ForCausalLM",
        vocab_size=512,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=4,
        max_position_embeddings=512,
        q_lora_rank=32,
        kv_lora_rank=16,
        qk_nope_head_dim=16,
        qk_rope_head_dim=8,
        v_head_dim=16,
        num_experts=4,
        num_experts_per_tok=2,
        moe_intermediate_size=32,
        n_shared_experts=1,
        first_k_dense_replace=1,
        scoring_func="softmax",
    )


def _engine(tp, dp, dp_attention):
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=2048, attention_backend="xla", context_length=256,
        tp_size=tp, dp_size=dp, enable_dp_attention=dp_attention,
        random_seed=0,
    )
    return Engine(
        server_args=args, model_config=_deepseek_cfg(),
        tokenizer=ByteTokenizer(),
        mesh_ctx=create_mesh(tp_size=tp, dp_size=dp),
    )


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_dp_attention_matches_single_device():
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    prompts = [f"dp attention prompt {i}" for i in range(4)]
    ref = _engine(1, 1, False).generate(prompts, sp)
    got = _engine(2, 2, True).generate(prompts, sp)
    for a, b in zip(ref, got):
        assert a["output_ids"] == b["output_ids"]


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_dp_attention_kv_is_page_sharded():
    eng = _engine(2, 2, True)
    # page axis sharded over dp x tp (no head-axis replication waste)
    spec = eng.runner.kv_cache.sharding.spec
    assert spec[1] == ("dp", "tp")
    # MLA attention weights replicated under dp-attention
    wkv_b = eng.runner.params["moe_layers"]["wkv_b"]
    assert all(p is None for p in wkv_b.sharding.spec)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_mla_without_dp_attention_replicates_kv():
    """tp>1 on MLA cannot shard the single latent plane: the pool falls
    back to replication (this memory waste is what dp-attention removes)."""
    eng = _engine(4, 1, False)
    spec = eng.runner.kv_cache.sharding.spec
    assert spec[1] is None and spec[2] is None
