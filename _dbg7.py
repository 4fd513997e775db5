import os
os.environ["XLA_FLAGS"]="--xla_force_host_platform_device_count=8"
import jax; jax.config.update("jax_platforms","cpu")
import jax.numpy as jnp
import numpy as np
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
def nan_report(tag):
    kv = np.asarray(eng.runner.kv_cache.astype(jnp.float32))
    bad = np.argwhere(np.isnan(kv))
    print(tag, "nan count:", len(bad), "pages:", sorted(set(bad[:,1].tolist()))[:10] if len(bad) else [])
sp1 = SamplingParams(temperature=0.0, max_new_tokens=1, ignore_eos=True)
eng.generate(["sink test", "windowed attention"], sp1)
nan_report("after prefill+1tok")
eng.generate(["sink test", "windowed attention"], SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True))
nan_report("after 8tok")
kv = np.asarray(eng.runner.kv_cache.astype(jnp.float32))
bad = np.argwhere(np.isnan(kv))
import collections
print("by (page, slot):", sorted(collections.Counter(map(tuple, bad[:, [1,3]])).items())[:20])
print("layers:", sorted(set(bad[:,0].tolist())))
