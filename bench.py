"""Offline throughput benchmark (runs on the real TPU chip).

Analog of the reference's bench_offline_throughput.py / CI perf gate
(test/registered/perf/test_bench_serving_1gpu_part1.py: >3,800 tok/s offline
output throughput for Llama-3.1-8B on the CUDA CI GPU). Until HF checkpoints
are available in this environment, the benchmark uses a random-weight
Llama-3.2-1B-shaped model (2048 hidden, 16 layers, 32q/8kv heads, 128k vocab)
with the byte tokenizer — identical compute/memory shape to the real model.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline compares against the reference CI's 3,800 tok/s offline
output-throughput threshold (different model size + hardware class; the
ratio tracks round-over-round progress on the same defined workload).
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

BASELINE_TOK_S = 3800.0  # reference CI threshold (BASELINE.md row 1)


def llama32_1b_config():
    from sglang_diffusion_tpu.config.model_config import ModelConfig

    # Llama-3.2-1B-class compute shape with TPU-native head_dim=128
    # (lane-width aligned; 16 q heads x 128 instead of 32 x 64)
    return ModelConfig(
        architecture="LlamaForCausalLM",
        vocab_size=128256,
        hidden_size=2048,
        intermediate_size=8192,
        num_hidden_layers=16,
        num_attention_heads=16,
        num_key_value_heads=8,
        head_dim=128,
        max_position_embeddings=4096,
        rms_norm_eps=1e-5,
        rope_theta=500000.0,
        tie_word_embeddings=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-prompts", type=int, default=256)
    ap.add_argument("--input-len", type=int, default=128)
    ap.add_argument("--output-len", type=int, default=128)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--attention-backend", default="auto")
    ap.add_argument("--max-total-tokens", type=int, default=131072)
    ap.add_argument("--decode-horizon", type=int, default=32)
    ap.add_argument("--quantization", default="w4a16",
                    choices=[None, "none", "int8", "fp8", "w4a16"])
    ap.add_argument("--kv-cache-dtype", default="fp8_e4m3")
    ap.add_argument("--decode-pipelining", action="store_true")
    ap.add_argument("--speculative-algorithm", default=None,
                    choices=[None, "ngram", "eagle"])
    ap.add_argument("--speculative-num-draft-tokens", type=int, default=4)
    ap.add_argument("--num-layers", type=int, default=None, help="override model depth")
    ap.add_argument("--vocab-size", type=int, default=None, help="override vocab")
    ap.add_argument("--tiny", action="store_true", help="tiny model smoke run")
    args = ap.parse_args()

    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = ModelConfig.tiny_llama() if args.tiny else llama32_1b_config()
    if args.num_layers:
        cfg.num_hidden_layers = args.num_layers
    if args.vocab_size:
        cfg.vocab_size = args.vocab_size
    sargs = ServerArgs(
        model_path="",
        tokenizer_path="byte",
        page_size=args.page_size,
        max_total_tokens=args.max_total_tokens,
        chunked_prefill_size=4096,
        max_prefill_tokens=8192,
        attention_backend=args.attention_backend,
        context_length=args.input_len + args.output_len + args.page_size,
        max_running_requests=max(256, args.num_prompts),
        decode_horizon=args.decode_horizon,
        enable_decode_pipelining=args.decode_pipelining,
        quantization=None if args.quantization in (None, "none") else args.quantization,
        kv_cache_dtype=args.kv_cache_dtype,
        speculative_algorithm=args.speculative_algorithm,
        speculative_num_draft_tokens=args.speculative_num_draft_tokens,
    )
    t0 = time.time()
    eng = Engine(server_args=sargs, model_config=cfg, tokenizer=ByteTokenizer())
    print(f"engine init: {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    prompts = [
        rng.integers(0, cfg.vocab_size, size=(args.input_len,)).tolist()
        for _ in range(args.num_prompts)
    ]
    sp = SamplingParams(
        temperature=0.0, max_new_tokens=args.output_len, ignore_eos=True
    )

    # warmup: compile the exact shapes the timed run uses — same batch-size
    # bucket and the same fused-decode horizon (shorter output)
    horizon = sargs.decode_horizon
    t0 = time.time()
    # distinct token ids so the timed run gets no radix-cache credit
    eng.generate(
        input_ids=[[(t + 1) % cfg.vocab_size for t in p] for p in prompts],
        sampling_params=SamplingParams(
            temperature=0.0, max_new_tokens=horizon, ignore_eos=True
        ),
    )
    print(f"warmup: {time.time()-t0:.1f}s", file=sys.stderr)

    t0 = time.time()
    outs = eng.generate(input_ids=prompts, sampling_params=sp)
    elapsed = time.time() - t0
    out_tokens = sum(len(o["output_ids"]) for o in outs)
    total_tokens = out_tokens + sum(len(p) for p in prompts)
    tok_s = out_tokens / elapsed
    print(
        f"prompts={args.num_prompts} in={args.input_len} out={args.output_len} "
        f"elapsed={elapsed:.2f}s out_tok/s={tok_s:.1f} "
        f"total_tok/s={total_tokens/elapsed:.1f}",
        file=sys.stderr,
    )
    if args.speculative_algorithm:
        d = eng.scheduler.spec_draft_tokens
        a = eng.scheduler.spec_accepted_tokens
        print(
            f"spec[{args.speculative_algorithm}]: drafted={d} accepted={a} "
            f"rate={a / max(1, d):.2f}",
            file=sys.stderr,
        )
    print(
        json.dumps(
            {
                "metric": "offline_output_throughput_llama3.2-1b"
                + (f"_{args.quantization}" if args.quantization not in (None, "none") else "_bf16")
                + ("_fp8kv" if args.kv_cache_dtype == "fp8_e4m3" else ""),
                "value": round(tok_s, 1),
                "unit": "tok/s",
                "vs_baseline": round(tok_s / BASELINE_TOK_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
