"""FP8 KV-cache tests: e2e generation with fp8_e4m3 KV storage must stay
close to the bf16-KV reference (reference analog: kv_cache_dtype=fp8_e4m3,
srt/mem_cache + kv quant in layers/quantization/kv_cache.py)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.sampling.params import SamplingParams


def run(kv_dtype):
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=2048,
        attention_backend="xla",
        context_length=256,
        kv_cache_dtype=kv_dtype,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    return eng.generate(
        "the quick brown fox jumps",
        SamplingParams(temperature=0.0, max_new_tokens=12, ignore_eos=True),
    )


def test_fp8_kv_generates_and_tracks_bf16():
    ref = run("bfloat16")
    got = run("fp8_e4m3")
    assert len(got["output_ids"]) == 12
    # fp8 KV rounding may diverge eventually; the first tokens must agree
    assert got["output_ids"][:2] == ref["output_ids"][:2]


def test_fp8_kv_pallas_interpret_matches_xla():
    import jax.numpy as jnp

    from sglang_diffusion_tpu.ops import attention_pallas, attention_xla

    rng = np.random.default_rng(0)
    PAGE, b, t, hq, hkv, d = 8, 2, 1, 4, 2, 32
    ctx = 20
    cache = jnp.zeros((1, 8, PAGE, 2 * hkv, d), jnp.float8_e4m3fn)
    pt = np.array([[1, 2, 3], [4, 5, 6]], np.int32)
    total = ctx + t
    k = rng.normal(size=(b, total, hkv, d)).astype(np.float32)
    v = rng.normal(size=(b, total, hkv, d)).astype(np.float32)
    offs = np.arange(total)[None, :]
    slots = (pt[np.arange(b)[:, None], offs // PAGE] * PAGE + offs % PAGE).astype(
        np.int32
    )
    cache = attention_xla.write_kv_pages(
        cache, 0, jnp.asarray(k), jnp.asarray(v), jnp.asarray(slots)
    )
    q = jnp.asarray(rng.normal(size=(b, t, hq, d)), jnp.float32)
    kv_lens = jnp.full((b,), total, jnp.int32)
    q_start = jnp.full((b,), ctx, jnp.int32)
    ref = attention_xla.paged_attention(q, cache, 0, jnp.asarray(pt), kv_lens, q_start, 0.2)
    got = attention_pallas.paged_attention(
        q, cache, 0, jnp.asarray(pt), kv_lens, q_start, 0.2, interpret=True
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)
