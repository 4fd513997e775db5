"""Native C++ radix tree: differential test against the Python tree under a
randomized workload (insert/match/lock/evict), mirroring how the reference
validates cpp_radix_tree against the Python RadixCache."""

import numpy as np
import pytest

from sglang_diffusion_tpu.kv.allocator import PageAllocator
from sglang_diffusion_tpu.kv.radix_cache import RadixCache
from sglang_diffusion_tpu.kv.radix_cache_cpp import RadixCacheCpp, native_available

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native toolchain unavailable"
)

PAGE = 4


def test_basic_ops():
    freed = []
    c = RadixCacheCpp(PAGE, freed.extend)
    toks = list(range(12))
    assert c.insert(toks, [1, 2, 3]) == 0
    pages, node = c.match_prefix(toks)
    assert pages == [1, 2, 3]
    assert c.evictable_tokens == 12
    c.inc_lock_ref(node)
    assert c.protected_tokens == 12
    assert c.evict(5) == 0
    c.dec_lock_ref(node)
    assert c.evict(5) == 3
    assert sorted(freed) == [1, 2, 3]
    assert c.match_prefix(toks)[0] == []


def test_differential_vs_python():
    rng = np.random.default_rng(0)
    freed_cpp, freed_py = [], []
    cpp = RadixCacheCpp(PAGE, freed_cpp.extend)
    py = RadixCache(PAGE, freed_py.extend)
    next_page = [1]

    def alloc(n):
        out = list(range(next_page[0], next_page[0] + n))
        next_page[0] += n
        return out

    seqs = []
    for step in range(200):
        op = rng.integers(0, 3)
        if op == 0 or not seqs:  # insert a (possibly shared-prefix) sequence
            if seqs and rng.random() < 0.5:
                base = list(seqs[rng.integers(0, len(seqs))])
                cut = rng.integers(0, len(base) // PAGE + 1) * PAGE
                seq = base[:cut] + rng.integers(
                    0, 50, size=(int(rng.integers(1, 4)) * PAGE,)
                ).tolist()
            else:
                seq = rng.integers(0, 50, size=(int(rng.integers(1, 5)) * PAGE,)).tolist()
            seqs.append(seq)
            pages = alloc(len(seq) // PAGE)
            d1 = cpp.insert(seq, pages)
            d2 = py.insert(seq, list(pages))
            assert d1 == d2, (step, d1, d2)
        elif op == 1:  # match
            seq = seqs[rng.integers(0, len(seqs))]
            cut = rng.integers(0, len(seq) + 1)
            p1, _ = cpp.match_prefix(seq[:cut])
            p2, _ = py.match_prefix(seq[:cut])
            assert p1 == p2, (step, p1, p2)
        else:  # evict some
            n = int(rng.integers(1, 4))
            e1 = cpp.evict(n)
            e2 = py.evict(n)
            assert e1 == e2, (step, e1, e2)
            assert sorted(freed_cpp) == sorted(freed_py)
        assert cpp.evictable_tokens == py.evictable_tokens, step


def test_lock_differential():
    freed_cpp, freed_py = [], []
    cpp = RadixCacheCpp(PAGE, freed_cpp.extend)
    py = RadixCache(PAGE, freed_py.extend)
    seq = list(range(20))
    cpp.insert(seq, [1, 2, 3, 4, 5])
    py.insert(seq, [1, 2, 3, 4, 5])
    _, n1 = cpp.match_prefix(seq[:8])
    _, n2 = py.match_prefix(seq[:8])
    cpp.inc_lock_ref(n1)
    py.inc_lock_ref(n2)
    assert cpp.protected_tokens == py.protected_tokens == 8
    assert cpp.evict(99) == py.evict(99) == 3
    cpp.dec_lock_ref(n1)
    py.dec_lock_ref(n2)
    assert cpp.evictable_tokens == py.evictable_tokens == 8


def test_engine_uses_cpp_tree():
    """Engine wiring: prefer the native tree when available."""
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    args = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=8,
        max_total_tokens=2048,
        attention_backend="xla",
        context_length=256,
    )
    cfg = ModelConfig.tiny_llama(vocab_size=512)
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    assert isinstance(eng.radix, RadixCacheCpp)
    sp = SamplingParams(temperature=0.0, max_new_tokens=6)
    out1 = eng.generate("native tree test prompt", sp)
    out2 = eng.generate("native tree test prompt", sp)
    assert out1["output_ids"] == out2["output_ids"]
    assert out2["meta_info"]["cached_tokens"] > 0
