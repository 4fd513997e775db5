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
sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)
out = eng.generate(["sink test"], sp)[0]["output_ids"]
# HF teacher-forced chain
cur=[ord(c) for c in "sink test"]
ref=[]
with torch.no_grad():
    for _ in range(8):
        nxt=int(model(torch.tensor([cur])).logits[0,-1].argmax()); ref.append(nxt); cur.append(nxt)
print("engine:", out)
print("hf    :", ref)
kv = np.asarray(eng.runner.kv_cache.astype(jnp.float32))
print("nan dims at L0,p1,h0,s0:", np.where(np.isnan(kv[0,1,0,0]))[0])
print("nan pages:", sorted(set(np.argwhere(np.isnan(kv))[:,1].tolist())))
