"""Radix prefix cache + page allocator behavior tests (analog of the
reference's cache policy tests built on RadixCache.create_simulated,
SURVEY.md §4)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.kv.allocator import PageAllocator
from sglang_diffusion_tpu.kv.radix_cache import RadixCache

PAGE = 4


def make():
    alloc = PageAllocator(num_pages=64, page_size=PAGE)
    cache = RadixCache(page_size=PAGE, free_pages_fn=alloc.free)
    return alloc, cache


def test_allocator_basics():
    alloc = PageAllocator(num_pages=8, page_size=PAGE)
    a = alloc.alloc(3)
    assert len(set(a)) == 3 and 0 not in a
    assert alloc.free_pages == 4
    alloc.free(a)
    assert alloc.free_pages == 7
    with pytest.raises(MemoryError):
        alloc.alloc(8)


def test_match_insert_roundtrip():
    alloc, cache = make()
    toks = list(range(12))  # 3 pages
    pages = alloc.alloc(3)
    dup = cache.insert(toks, pages)
    assert dup == 0
    got, node = cache.match_prefix(toks)
    assert got == pages
    # partial-page suffix is ignored
    got2, _ = cache.match_prefix(toks + [99, 100])
    assert got2 == pages
    # prefix match of first page only
    got3, _ = cache.match_prefix(toks[:5])
    assert got3 == pages[:1]


def test_insert_dedup_and_split():
    alloc, cache = make()
    a = list(range(8))  # 2 pages
    pa = alloc.alloc(2)
    cache.insert(a, pa)
    # same first page, different second page -> split
    b = a[:4] + [50, 51, 52, 53]
    pb = alloc.alloc(2)
    dup = cache.insert(b, pb)
    assert dup == 4  # first page deduped
    # free the duplicate page like the scheduler would
    alloc.free(pb[:1])
    got_a, _ = cache.match_prefix(a)
    got_b, _ = cache.match_prefix(b)
    assert got_a == pa
    assert got_b == [pa[0], pb[1]]


def test_lock_and_evict():
    alloc, cache = make()
    a = list(range(8))
    pa = alloc.alloc(2)
    cache.insert(a, pa)
    _, node = cache.match_prefix(a)
    cache.inc_lock_ref(node)
    assert cache.protected_tokens == 8
    assert cache.evict(10) == 0  # locked, nothing evictable
    cache.dec_lock_ref(node)
    assert cache.evictable_tokens == 8
    free_before = alloc.free_pages
    assert cache.evict(10) == 2
    assert alloc.free_pages == free_before + 2
    got, _ = cache.match_prefix(a)
    assert got == []


def test_evict_lru_order():
    alloc, cache = make()
    a = list(range(4))
    b = list(range(100, 104))
    pa = alloc.alloc(1)
    pb = alloc.alloc(1)
    cache.insert(a, pa)
    cache.insert(b, pb)
    cache.match_prefix(b)  # touch b -> a is LRU
    cache.evict(1)
    assert cache.match_prefix(a)[0] == []
    assert cache.match_prefix(b)[0] == pb


def test_deep_chain_and_protection_accounting():
    alloc, cache = make()
    toks = list(range(40))  # 10 pages
    pages = alloc.alloc(10)
    cache.insert(toks, pages)
    # lock a mid prefix
    _, node = cache.match_prefix(toks[:20])
    cache.inc_lock_ref(node)
    # evicting should only remove the unlocked tail
    n = cache.evict(100)
    assert n == 5
    got, _ = cache.match_prefix(toks)
    assert got == pages[:5]
    cache.dec_lock_ref(node)
    assert cache.protected_tokens == 0
