import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms","cpu")
import torch, numpy as np
from transformers import GptOssConfig, GptOssForCausalLM
from sglang_diffusion_tpu.config.model_config import ModelConfig
from tests.test_gpt_oss import _params
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams

def scenario(layer_types):
    hf_cfg = GptOssConfig(vocab_size=128, hidden_size=64, intermediate_size=48,
        num_hidden_layers=4, num_attention_heads=4, num_key_value_heads=2,
        head_dim=16, sliding_window=6, num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=256, tie_word_embeddings=False, pad_token_id=0,
        bos_token_id=1, eos_token_id=2, rope_scaling={"rope_type":"default"},
        layer_types=layer_types)
    torch.manual_seed(12)
    model = GptOssForCausalLM(hf_cfg).eval()
    cfg = ModelConfig.from_hf_config(hf_cfg.to_dict() | {"architectures": ["GptOssForCausalLM"]})
    params = _params(cfg, model)
    args = ServerArgs(model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=2048, attention_backend="xla", context_length=128,
        random_seed=0, disable_radix_cache=True)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer(), params=params)
    sp8 = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
    sp6 = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
    fresh_eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer(), params=params)
    fresh = fresh_eng.generate(input_ids=[97,98,99,100], sampling_params=sp6)["output_ids"]
    eng.generate(["sink test", "windowed attention"], sp8)
    eng.generate(["sink test", "windowed attention"], sp8)
    got = eng.generate(input_ids=[97,98,99,100], sampling_params=sp6)["output_ids"]
    print(layer_types, "fresh:", fresh, "after:", got, "match:", fresh == got)

scenario(["full_attention"]*4)
scenario(["sliding_attention"]*4)
