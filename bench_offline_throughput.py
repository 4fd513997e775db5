"""Offline throughput benchmark (reference analog:
python/sglang/bench_offline_throughput.py): batch-submit N requests through
Engine.generate and report input/output token throughput.

Unlike bench.py (which owns the default headline config), this tool sweeps
arbitrary request shapes — random lengths, shared prefixes — closer to the
reference's dataset-driven offline bench.
"""

from __future__ import annotations

import argparse
import json
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-path", default="")
    ap.add_argument("--tokenizer-path", default="byte")
    ap.add_argument("--num-prompts", type=int, default=64)
    ap.add_argument("--input-len", type=int, default=128)
    ap.add_argument("--output-len", type=int, default=64)
    ap.add_argument("--random-range-ratio", type=float, default=0.5,
                    help="input lengths drawn from [r*L, L]")
    ap.add_argument("--shared-prefix-len", type=int, default=0)
    ap.add_argument("--quantization", default=None)
    ap.add_argument("--kv-cache-dtype", default="auto")
    ap.add_argument("--max-total-tokens", type=int, default=None)
    ap.add_argument("--attention-backend", default="auto")
    args = ap.parse_args(argv)

    from sglang_diffusion_tpu.config.model_config import ModelConfig
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    sargs = ServerArgs(
        model_path=args.model_path,
        tokenizer_path=args.tokenizer_path,
        quantization=args.quantization,
        kv_cache_dtype=args.kv_cache_dtype,
        max_total_tokens=args.max_total_tokens,
        attention_backend=args.attention_backend,
        context_length=max(4096, args.input_len + args.output_len + 64),
    )
    if args.model_path:
        eng = Engine(server_args=sargs)
    else:
        # synthetic model for environment smoke runs
        eng = Engine(server_args=sargs,
                     model_config=ModelConfig.tiny_llama(
                         vocab_size=512, hidden_size=256,
                         intermediate_size=512, num_hidden_layers=4,
                         num_attention_heads=8, num_key_value_heads=8,
                         max_position_embeddings=8192,
                     ),
                     tokenizer=ByteTokenizer())

    rng = np.random.default_rng(0)
    vocab = eng.model_config.vocab_size
    prefix = rng.integers(3, vocab, args.shared_prefix_len).tolist()
    lo = max(1, int(args.input_len * args.random_range_ratio))
    reqs = []
    for _ in range(args.num_prompts):
        n = int(rng.integers(lo, args.input_len + 1))
        reqs.append(prefix + rng.integers(3, vocab, n).tolist())

    sp = SamplingParams(max_new_tokens=args.output_len, temperature=0.0,
                        ignore_eos=True)
    # warmup
    eng.generate(input_ids=reqs[0][: args.input_len], sampling_params=sp)
    t0 = time.perf_counter()
    outs = eng.generate(input_ids=reqs, sampling_params=sp)
    dt = time.perf_counter() - t0
    in_toks = sum(len(r) for r in reqs)
    out_toks = sum(len(o["output_ids"]) for o in outs)
    print(json.dumps({
        "metric": "offline_throughput",
        "num_prompts": args.num_prompts,
        "elapsed_s": round(dt, 2),
        "input_tok_per_s": round(in_toks / dt, 1),
        "output_tok_per_s": round(out_toks / dt, 1),
        "total_tok_per_s": round((in_toks + out_toks) / dt, 1),
    }))


if __name__ == "__main__":
    main()
