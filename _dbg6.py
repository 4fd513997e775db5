import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp
import numpy as np, torch
from tests.test_gpt_oss import _tiny_hf, _params
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams

_, model, cfg = _tiny_hf(rope_scaling={"rope_type":"default"})
params = _params(cfg, model)
args = ServerArgs(model_path="", tokenizer_path="byte", page_size=8,
    max_total_tokens=2048, attention_backend="xla", context_length=128,
    random_seed=0, disable_radix_cache=True)
eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer(), params=params)
sp8 = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
eng.generate(["sink test", "windowed attention"], sp8)
eng.generate(["sink test", "windowed attention"], sp8)
kv = eng.runner.kv_cache
print("kv stats: nan:", bool(jnp.isnan(kv.astype(jnp.float32)).any()),
      "inf:", bool(jnp.isinf(kv.astype(jnp.float32)).any()),
      "absmax:", float(jnp.abs(kv.astype(jnp.float32)).max()))
