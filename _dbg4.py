import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms","cpu")
from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams

cfg = ModelConfig.tiny_llama(vocab_size=512)
args = ServerArgs(model_path="", tokenizer_path="byte", page_size=8,
    max_total_tokens=2048, attention_backend="xla", context_length=128,
    random_seed=0, disable_radix_cache=True)
eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
sp8 = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
sp6 = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
ref = eng.generate(input_ids=[97,98,99,100], sampling_params=sp6)["output_ids"]
eng2 = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
eng2.generate(["sink test", "windowed attention"], sp8)
eng2.generate(["sink test", "windowed attention"], sp8)
got = eng2.generate(input_ids=[97,98,99,100], sampling_params=sp6)["output_ids"]
print("llama fresh:", ref)
print("llama after batches:", got, "match:", ref == got)
