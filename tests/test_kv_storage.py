"""Tier-3 KV storage backend (reference analog: hicache_storage.py
HiCacheFile + storage backends) — unit tests on the file backend and the
radix tree's spill/fetch integration, plus engine e2e persistence."""

import numpy as np
import pytest

from sglang_diffusion_tpu.kv.allocator import PageAllocator
from sglang_diffusion_tpu.kv.radix_cache import RadixCache
from sglang_diffusion_tpu.kv.storage import FileKVStorage, prefix_page_key


def test_file_storage_roundtrip_and_lru(tmp_path):
    st = FileKVStorage(str(tmp_path), max_bytes=300)
    assert st.get("missing") is None
    assert st.set("a", b"x" * 100)
    assert st.set("b", b"y" * 100)
    assert st.get("a") == b"x" * 100
    # inserting c (100B) over the 300B budget evicts the LRU entry
    import os
    import time

    os.utime(st._fp("b"), (time.time() - 100, time.time() - 100))
    assert st.set("c", b"z" * 150)
    assert st.get("c") is not None
    assert st.get("b") is None  # LRU victim
    assert st.hits == 2 and st.misses == 2


def test_prefix_page_key_chaining():
    k1 = prefix_page_key([1, 2, 3, 4])
    k2 = prefix_page_key([1, 2, 3, 5])
    assert k1 != k2 and len(k1) == 64
    assert k1 == prefix_page_key([1, 2, 3, 4])


def _mk_cache(tmp_path, num_pages=16, page=4, host_limit=0):
    alloc = PageAllocator(num_pages=num_pages, page_size=page)
    cache = RadixCache(page, alloc.free)
    blobs = {}

    def offload(pages):
        return [np.full((2, page), p, np.float32) for p in pages]

    def restore(bs):
        return alloc.try_alloc(len(bs))

    cache.enable_hicache(offload, restore, bytes_per_page=100,
                         host_limit_bytes=host_limit)
    st = FileKVStorage(str(tmp_path), max_bytes=1 << 20)
    cache.enable_storage(
        st, lambda b: np.ascontiguousarray(b).tobytes(),
        lambda d: np.frombuffer(d, np.float32).reshape(2, page),
    )
    return alloc, cache, st


def test_radix_spills_to_storage_when_host_full(tmp_path):
    alloc, cache, st = _mk_cache(tmp_path, host_limit=0)  # no host room
    toks = list(range(16))
    cache.insert(toks, alloc.alloc(4))
    assert cache.evict(10) == 4
    # pages went to storage, not host
    assert cache.host_tokens == 0
    # a later lookup fetches pages back from storage
    got, node = cache.match_prefix(toks)
    assert len(got) == 4
    assert cache.storage_hits == 16


def test_storage_partial_prefix_hit(tmp_path):
    alloc, cache, st = _mk_cache(tmp_path, host_limit=0)
    toks = list(range(16))
    cache.insert(toks, alloc.alloc(4))
    cache.evict(10)
    # longer query: storage serves the stored 4 pages; remainder is a miss
    longer = toks + [99, 98, 97, 96]
    got, node = cache.match_prefix(longer)
    assert len(got) == 4


def test_storage_survives_new_tree(tmp_path):
    """Content-addressed keys: a brand-new tree (engine restart) hits the
    same storage entries."""
    alloc, cache, st = _mk_cache(tmp_path, host_limit=0)
    toks = list(range(16))
    cache.insert(toks, alloc.alloc(4))
    cache.evict(10)

    alloc2 = PageAllocator(num_pages=16, page_size=4)
    cache2 = RadixCache(4, alloc2.free)
    cache2.enable_hicache(
        lambda pages: [np.zeros((2, 4), np.float32) for _ in pages],
        lambda bs: alloc2.try_alloc(len(bs)),
        bytes_per_page=100, host_limit_bytes=0,
    )
    cache2.enable_storage(
        st, lambda b: np.ascontiguousarray(b).tobytes(),
        lambda d: np.frombuffer(d, np.float32).reshape(2, 4),
    )
    got, _ = cache2.match_prefix(toks)
    assert len(got) == 4
    assert cache2.storage_hits == 16


def test_engine_e2e_storage_tier(tmp_path):
    """Greedy outputs stay identical when prefixes round-trip through the
    file storage tier under heavy KV pressure."""
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    def mk(storage):
        args = ServerArgs(
            model_path="", tokenizer_path="byte", page_size=8,
            max_total_tokens=512,  # tiny pool -> constant eviction
            attention_backend="xla", context_length=256,
            enable_hierarchical_cache=True,
            hicache_host_size_mb=0,  # force straight-to-storage spills
            hicache_storage_backend="file" if storage else None,
            hicache_storage_path=str(tmp_path / "kv"),
        )
        return Engine(server_args=args,
                      model_config=ModelConfig.tiny_llama(),
                      tokenizer=ByteTokenizer())

    eng = mk(storage=True)
    sp = SamplingParams(temperature=0.0, max_new_tokens=8)
    prompts = [f"common prefix text, variant {i}" for i in range(6)]
    first = [eng.generate(p, sp)["output_ids"] for p in prompts]
    second = [eng.generate(p, sp)["output_ids"] for p in prompts]
    assert first == second
    assert eng.kv_storage.hits + eng.kv_storage.misses > 0
