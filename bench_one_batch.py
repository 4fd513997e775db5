"""Single-batch latency microbenchmark.

Reference analog: python/sglang/bench_one_batch.py (prefill latency, decode
latency avg/p95, used by CI latency gates test_bench_one_batch_1gpu.py).

    python bench_one_batch.py --batch-size 1 --input-len 128 --output-len 64
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=1)
    ap.add_argument("--input-len", type=int, default=128)
    ap.add_argument("--output-len", type=int, default=64)
    ap.add_argument("--quantization", default="int8")
    ap.add_argument("--kv-cache-dtype", default="fp8_e4m3")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()

    from bench import llama32_1b_config
    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = ModelConfig.tiny_llama() if args.tiny else llama32_1b_config()
    sargs = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=64 if not args.tiny else 8,
        max_total_tokens=16384 if not args.tiny else 2048,
        attention_backend="auto",
        context_length=args.input_len + args.output_len + 64,
        decode_horizon=1,  # per-token latency measurement
        quantization=None if args.quantization in (None, "none") else args.quantization,
        kv_cache_dtype=args.kv_cache_dtype if not args.tiny else "auto",
    )
    eng = Engine(server_args=sargs, model_config=cfg, tokenizer=ByteTokenizer())
    rng = np.random.default_rng(0)
    sp = SamplingParams(temperature=0.0, max_new_tokens=args.output_len, ignore_eos=True)

    def make_reqs():
        return [
            eng._make_req(
                None,
                rng.integers(0, cfg.vocab_size, size=(args.input_len,)).tolist(),
                sp,
            )
            for _ in range(args.batch_size)
        ]

    # warmup
    for r in make_reqs():
        eng.scheduler.add_request(r)
    while eng.scheduler.has_work():
        eng.step()

    # timed: one prefill step, then per-decode-step latencies
    reqs = make_reqs()
    for r in reqs:
        eng.scheduler.add_request(r)
    t0 = time.perf_counter()
    eng.step()  # prefill
    prefill_ms = 1000 * (time.perf_counter() - t0)
    decode_ms = []
    while eng.scheduler.has_work():
        t0 = time.perf_counter()
        eng.step()
        decode_ms.append(1000 * (time.perf_counter() - t0))
    d = np.array(decode_ms)
    print(
        json.dumps(
            {
                "metric": "one_batch_latency",
                "batch_size": args.batch_size,
                "prefill_ms": round(prefill_ms, 2),
                "decode_avg_ms": round(float(d.mean()), 2),
                "decode_p95_ms": round(float(np.percentile(d, 95)), 2),
                "decode_tok_s": round(args.batch_size * 1000 / float(d.mean()), 1),
            }
        )
    )


if __name__ == "__main__":
    main()
