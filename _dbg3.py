import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms","cpu")
from tests.test_gpt_oss import _tiny_hf, _params
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams

_, model, cfg = _tiny_hf(rope_scaling={"rope_type":"default"})
params = _params(cfg, model)
args = ServerArgs(model_path="", tokenizer_path="byte", page_size=8,
    max_total_tokens=2048, attention_backend="xla", context_length=128,
    random_seed=0)
eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer(), params=params)
sp8 = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
sp6 = SamplingParams(temperature=0.0, max_new_tokens=6, ignore_eos=True)
prompt=[ord(c) for c in "abcd"]
o1 = eng.generate(["sink test", "windowed attention"], sp8)
o2 = eng.generate(["sink test", "windowed attention"], sp8)
print("batch same:", [o["output_ids"] for o in o1] == [o["output_ids"] for o in o2])
print("abcd:", eng.generate(input_ids=prompt, sampling_params=sp6)["output_ids"])
# retry with radix disabled
args2 = ServerArgs(model_path="", tokenizer_path="byte", page_size=8,
    max_total_tokens=2048, attention_backend="xla", context_length=128,
    random_seed=0, disable_radix_cache=True)
eng2 = Engine(server_args=args2, model_config=cfg, tokenizer=ByteTokenizer(), params=params)
eng2.generate(["sink test", "windowed attention"], sp8)
eng2.generate(["sink test", "windowed attention"], sp8)
print("abcd noradix:", eng2.generate(input_ids=prompt, sampling_params=sp6)["output_ids"])
