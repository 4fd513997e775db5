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


def test_unload_and_lru_eviction():
    """Eviction frees the least-recently-used slot when the pool is full;
    unload makes a slot immediately reusable (reference:
    srt/lora/lora_manager.py pool management)."""
    mgr = LoRAManager(CFG, max_adapters=2, rank=8)
    s1 = mgr.load_adapter_arrays("a1", random_adapter_arrays(1), 4, 8.0)
    s2 = mgr.load_adapter_arrays("a2", random_adapter_arrays(2), 4, 8.0)
    assert {s1, s2} == {1, 2}
    mgr.slot_of("a1")  # touch a1 -> a2 becomes LRU
    s3 = mgr.load_adapter_arrays("a3", random_adapter_arrays(3), 4, 8.0)
    assert s3 == s2  # evicted a2's slot
    assert "a2" not in mgr._name_to_slot
    mgr.unload_adapter("a1")
    assert "a1" not in mgr._name_to_slot
    s4 = mgr.load_adapter_arrays("a4", random_adapter_arrays(4), 4, 8.0)
    assert s4 == s1
    # evicted slot's weights are really zeroed before reuse
    import jax.numpy as jnp

    mgr.unload_adapter("a4")
    assert float(jnp.abs(mgr.weights["wq"]["a"][s4]).sum()) == 0.0


def test_weighted_merge_exact():
    """merge_adapters(w) must equal the weighted sum of deltas exactly
    (rank concatenation): y_merge - base == sum_i w_i * (y_i - base)."""
    eng = make_engine()
    eng.lora_manager = LoRAManager(CFG, max_adapters=3, rank=16)
    eng.runner.lora_manager = eng.lora_manager
    eng.lora_manager.load_adapter_arrays(
        "m1", random_adapter_arrays(11), 4, 8.0
    )
    eng.lora_manager.load_adapter_arrays(
        "m2", random_adapter_arrays(12), 4, 8.0
    )
    slot = eng.lora_manager.merge_adapters("mix", {"m1": 0.7, "m2": 0.3})
    assert slot == 3

    # numerical check on the apply path: one layer, random x
    import jax.numpy as jnp

    from sglang_diffusion_tpu.lora.manager import apply_lora

    tree = eng.lora_manager.batch_params()
    rng = np.random.default_rng(0)
    x1 = rng.normal(size=(1, 4, CFG.hidden_size))
    x = jnp.asarray(np.tile(x1, (3, 1, 1)), jnp.float32)  # same x per row
    base = jnp.zeros((3, 4, CFG.num_attention_heads * CFG.actual_head_dim),
                     jnp.float32)
    ids = jnp.asarray([1, 2, 3], jnp.int32)  # m1, m2, mix rows
    out = np.asarray(apply_lora(x, base, tree, "wq", ids, 0), np.float32)
    want = 0.7 * out[0] + 0.3 * out[1]
    np.testing.assert_allclose(out[2], want, rtol=5e-2, atol=5e-2)

    # generation still works with the merged adapter
    sp = SamplingParams(lora_path="mix", **SP)
    out = eng.generate("merged adapter", sp)
    assert len(out["output_ids"]) == 10

    # over-rank merge is rejected
    eng.lora_manager.load_adapter_arrays(
        "m3", random_adapter_arrays(13, rank=16), 16, 16.0
    )
    with pytest.raises(ValueError):
        eng.lora_manager.merge_adapters("too_big", {"m3": 1.0, "mix": 1.0})
