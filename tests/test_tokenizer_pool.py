"""TokenizerPool parallel tokenization (engine/tokenizer.py; reference
analog: srt/managers/multi_tokenizer_mixin.py worker fan-out)."""

import threading

from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer, TokenizerPool


def test_pool_matches_single_tokenizer():
    single = ByteTokenizer()
    pool = TokenizerPool(ByteTokenizer, n=4)
    texts = [f"hello world {i} éè" for i in range(23)]
    expect = [single.encode(t) for t in texts]
    got = pool.encode_batch(texts)
    assert got == expect
    assert pool.decode_batch(got) == [single.decode(e) for e in expect]
    # single-item API round-robins but stays correct
    for t, e in zip(texts, expect):
        assert pool.encode(t) == e


def test_pool_attribute_passthrough():
    pool = TokenizerPool(ByteTokenizer, n=2)
    single = ByteTokenizer()
    assert pool.eos_token_id == single.eos_token_id


def test_pool_concurrent_use():
    pool = TokenizerPool(ByteTokenizer, n=4)
    single = ByteTokenizer()
    texts = [f"prompt-{i}" * 20 for i in range(64)]
    results = {}

    def worker(lo, hi):
        for i in range(lo, hi):
            results[i] = pool.encode(texts[i])

    threads = [threading.Thread(target=worker, args=(i * 16, (i + 1) * 16))
               for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for i, t in enumerate(texts):
        assert results[i] == single.encode(t)


def test_engine_uses_pool_when_configured():
    from sglang_diffusion_tpu.config.server_args import ServerArgs

    args = ServerArgs(model_path="", tokenizer_path="byte",
                      tokenizer_worker_num=3)
    assert args.tokenizer_worker_num == 3
