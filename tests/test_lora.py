"""Multi-LoRA batching tests (reference analog: srt/lora tests): base rows
unchanged, adapter rows diverge, mixed batches match solo runs, PEFT
checkpoint loading."""

import json
import os

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.lora import LoRAManager
from sglang_diffusion_tpu.sampling.params import SamplingParams

CFG = ModelConfig.tiny_llama(vocab_size=512)


def make_engine():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=4096,
        attention_backend="xla",
        context_length=512,
        random_seed=0,
    )
    return Engine(server_args=args, model_config=CFG, tokenizer=ByteTokenizer())


def random_adapter_arrays(seed, rank=4, scale=2.0):
    rng = np.random.default_rng(seed)
    L = CFG.num_hidden_layers
    E = CFG.hidden_size
    Hq, Hkv, D = (
        CFG.num_attention_heads,
        CFG.num_key_value_heads,
        CFG.actual_head_dim,
    )
    dims = {"wq": (E, Hq * D), "wk": (E, Hkv * D), "wv": (E, Hkv * D), "wo": (Hq * D, E)}
    arrays = {}
    for i in range(L):
        for t, (din, dout) in dims.items():
            arrays[f"layers.{i}.{t}.a"] = rng.normal(size=(din, rank)).astype(
                np.float32
            ) * (scale / np.sqrt(din))
            arrays[f"layers.{i}.{t}.b"] = rng.normal(size=(rank, dout)).astype(
                np.float32
            ) * (scale / np.sqrt(rank))
    return arrays


@pytest.fixture(scope="module")
def engine():
    eng = make_engine()
    eng.lora_manager = LoRAManager(CFG, max_adapters=3)
    eng.runner.lora_manager = eng.lora_manager
    eng.lora_manager.load_adapter_arrays("ad1", random_adapter_arrays(1), 4, 8.0)
    eng.lora_manager.load_adapter_arrays("ad2", random_adapter_arrays(2), 4, 8.0)
    return eng


SP = dict(temperature=0.0, max_new_tokens=10, ignore_eos=True)


def test_base_rows_unchanged_with_manager(engine):
    ref = make_engine().generate("base prompt", SamplingParams(**SP))
    got = engine.generate("base prompt", SamplingParams(**SP))
    assert got["output_ids"] == ref["output_ids"]


def test_adapter_changes_output(engine):
    base = engine.generate("adapter prompt", SamplingParams(**SP))
    ad = engine.generate(
        "adapter prompt", SamplingParams(**SP, lora_path="ad1")
    )
    assert ad["output_ids"] != base["output_ids"]


def test_mixed_batch_matches_solo(engine):
    sp_base = SamplingParams(**SP)
    sp1 = SamplingParams(**SP, lora_path="ad1")
    sp2 = SamplingParams(**SP, lora_path="ad2")
    solo_base = engine.generate("common prompt text", sp_base)
    solo_1 = engine.generate("common prompt text", sp1)
    solo_2 = engine.generate("common prompt text", sp2)
    assert solo_1["output_ids"] != solo_2["output_ids"]

    # run all three concurrently through raw steps
    reqs = [
        engine._make_req("common prompt text", None, sp)
        for sp in (sp_base, sp1, sp2)
    ]
    for r in reqs:
        engine.scheduler.add_request(r)
    for _ in range(60):
        engine.step()
        if all(r.finished for r in reqs):
            break
    assert reqs[0].output_ids == solo_base["output_ids"]
    assert reqs[1].output_ids == solo_1["output_ids"]
    assert reqs[2].output_ids == solo_2["output_ids"]


def test_unknown_adapter_raises(engine):
    with pytest.raises(KeyError):
        engine.generate("x", SamplingParams(**SP, lora_path="nope"))


def test_peft_checkpoint_loading(tmp_path):
    import torch
    from safetensors.torch import save_file

    rank = 4
    L, E = CFG.num_hidden_layers, CFG.hidden_size
    Hq, D = CFG.num_attention_heads, CFG.actual_head_dim
    tensors = {}
    g = torch.Generator().manual_seed(0)
    for i in range(L):
        for proj, dout in (("q_proj", Hq * D), ("v_proj",
                           CFG.num_key_value_heads * D)):
            base = f"base_model.model.model.layers.{i}.self_attn.{proj}"
            tensors[f"{base}.lora_A.weight"] = torch.randn(rank, E, generator=g)
            tensors[f"{base}.lora_B.weight"] = torch.randn(dout, rank, generator=g)
    save_file(tensors, str(tmp_path / "adapter_model.safetensors"))
    (tmp_path / "adapter_config.json").write_text(
        json.dumps({"r": rank, "lora_alpha": 8})
    )
    mgr = LoRAManager(CFG, max_adapters=2, rank=8)
    slot = mgr.load_adapter("peft1", str(tmp_path))
    assert slot == 1
    assert mgr.slot_of("peft1") == 1
    # loaded weights are non-zero in the padded pool
    assert float(np.abs(np.asarray(mgr.weights["wq"]["a"][1])).sum()) > 0
    assert float(np.abs(np.asarray(mgr.weights["wo"]["a"][1])).sum()) == 0
