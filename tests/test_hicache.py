"""Hierarchical (host-tier) KV cache tests (reference analog: HiCache,
test/registered/hicache)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
from sglang_diffusion_tpu.kv.allocator import PageAllocator
from sglang_diffusion_tpu.kv.radix_cache import RadixCache
from sglang_diffusion_tpu.sampling.params import SamplingParams


def test_tree_offload_restore_roundtrip():
    alloc = PageAllocator(num_pages=16, page_size=4)
    cache = RadixCache(4, alloc.free)
    host_store = {}

    def offload(pages):
        return [("blob", p) for p in pages]

    def restore(blobs):
        pages = alloc.try_alloc(len(blobs))
        return pages

    cache.enable_hicache(offload, restore, bytes_per_page=100, host_limit_bytes=10_000)
    toks = list(range(16))
    pages = alloc.alloc(4)
    cache.insert(toks, pages)
    free_before = alloc.free_pages
    assert cache.evict(10) == 4  # offloaded, pages freed
    assert alloc.free_pages == free_before + 4
    assert cache.host_tokens == 16
    assert cache.evictable_tokens == 0
    # prefix hit restores from host
    got, node = cache.match_prefix(toks)
    assert len(got) == 4
    assert cache.host_tokens == 0
    assert cache.hicache_hits == 16
    assert cache.evictable_tokens == 16


def test_host_budget_drops_when_full():
    alloc = PageAllocator(num_pages=16, page_size=4)
    cache = RadixCache(4, alloc.free)
    cache.enable_hicache(
        lambda pages: [0] * len(pages),
        lambda blobs: alloc.try_alloc(len(blobs)),
        bytes_per_page=100,
        host_limit_bytes=150,  # fits only 1 page
    )
    a, b = list(range(8)), list(range(100, 108))
    cache.insert(a, alloc.alloc(2))
    cache.insert(b, alloc.alloc(2))
    cache.evict(2)  # first victim: 2 pages > budget -> dropped entirely
    cache.evict(2)
    # at most one subtree could be offloaded within budget
    assert cache.host_bytes <= 150


def test_e2e_hierarchical_cache_hit_after_eviction():
    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=512,  # tiny device pool to force eviction
        attention_backend="xla",
        context_length=256,
        enable_hierarchical_cache=True,
        hicache_host_size_mb=64,
        chunked_prefill_size=64,
        max_prefill_tokens=64,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    sp = SamplingParams(temperature=0.0, max_new_tokens=8, ignore_eos=True)

    p1 = "first long prompt " * 5
    out1 = eng.generate(p1, sp)
    # force eviction of p1's pages by filling the pool with other prompts
    for i in range(6):
        eng.generate(f"filler prompt number {i} " * 5, sp)
    # p1 again: served from the host tier (device pages were reclaimed)
    out2 = eng.generate(p1, sp)
    assert out2["output_ids"] == out1["output_ids"]
    assert eng.radix.hicache_hits > 0
    assert out2["meta_info"]["cached_tokens"] > 0
