"""Profile one fused decode window on the real chip (VERDICT r4 ask #1).

Builds the same engine as bench.py, warms it, then separately times:
  A. raw decode_multi dispatch + fetch (pure device + tunnel cost)
  B. engine.step() end-to-end (adds scheduler/host bookkeeping)
  C. the same with varying decode horizons (dispatch amortization)
  D. components: a weights-only matmul probe and a KV-gather probe sized
     like one decode step, to attribute time between weight streaming and
     KV attention.

Run on the TPU: python tools/profile_decode.py
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def fetch_scalar(x):
    import jax

    return np.asarray(jax.device_get(x))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-prompts", type=int, default=256)
    ap.add_argument("--input-len", type=int, default=128)
    ap.add_argument("--decode-horizon", type=int, default=32)
    ap.add_argument("--quantization", default="w4a16")
    ap.add_argument("--kv-cache-dtype", default="fp8_e4m3")
    ap.add_argument("--attention-backend", default="auto")
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--trace-dir", default=None,
                    help="jax.profiler trace output dir")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    from bench import llama32_1b_config

    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = llama32_1b_config()
    sargs = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=64,
        max_total_tokens=131072, chunked_prefill_size=4096,
        max_prefill_tokens=8192, attention_backend=args.attention_backend,
        context_length=args.input_len + 256 + 64,
        max_running_requests=max(256, args.num_prompts),
        decode_horizon=args.decode_horizon,
        quantization=None if args.quantization in ("none", None) else args.quantization,
        kv_cache_dtype=args.kv_cache_dtype,
    )
    t0 = time.time()
    eng = Engine(server_args=sargs, model_config=cfg, tokenizer=ByteTokenizer())
    print(f"init {time.time()-t0:.1f}s", file=sys.stderr)

    rng = np.random.default_rng(0)
    prompts = [rng.integers(0, cfg.vocab_size, size=(args.input_len,)).tolist()
               for _ in range(args.num_prompts)]
    sp = SamplingParams(temperature=0.0, max_new_tokens=args.decode_horizon * 2,
                        ignore_eos=True)
    t0 = time.time()
    eng.generate(input_ids=prompts, sampling_params=sp)
    print(f"warmup {time.time()-t0:.1f}s", file=sys.stderr)

    results = {}

    # ---- B: engine.step() wall times over a full generate ----
    sp_long = SamplingParams(temperature=0.0,
                             max_new_tokens=args.decode_horizon * args.reps,
                             ignore_eos=True)
    for p in prompts:
        for i in range(len(p)):
            p[i] = (p[i] + 1) % cfg.vocab_size
    # drive manually: submit, then time each step
    reqs = [eng._make_req(None, p, sp_long) for p in prompts]
    for r in reqs:
        eng.scheduler.add_request(r)
    step_times = []
    kinds = []
    while any(not r.finished for r in reqs):
        t0 = time.perf_counter()
        eng.step()
        step_times.append(time.perf_counter() - t0)
        k = "?"
        kinds.append(k)
    decode_steps = [t for t in step_times if t > 0.01]
    print(f"engine steps: {len(step_times)}, times(s): "
          f"{[round(t, 3) for t in step_times]}", file=sys.stderr)
    results["engine_step_times_s"] = [round(t, 4) for t in step_times]

    # ---- A: raw fused-decode dispatch + fetch on a synthetic plan ----
    runner = eng.runner
    b = args.num_prompts
    from sglang_diffusion_tpu.utils.common import select_bucket
    bb = select_bucket(runner.bs_buckets, b)
    k = args.decode_horizon
    pages_per_seq = runner.max_pages_per_seq
    page_table = np.zeros((bb, pages_per_seq), np.int32)
    npages_used = min(runner.num_pages - 1,
                      bb * pages_per_seq)
    pt = (np.arange(bb * pages_per_seq) % max(1, npages_used)) + 1
    page_table[:] = pt.reshape(bb, pages_per_seq)
    pos0 = args.input_len + 1
    slots_km = np.zeros((k, bb), np.int32)
    for s in range(k):
        step_pos = pos0 + s
        pg = page_table[:, step_pos // 64]
        slots_km[s] = pg * 64 + step_pos % 64
    samp_np = {
        "temperature": np.zeros((b,), np.float32),
        "top_p": np.ones((b,), np.float32),
        "top_k": np.full((b,), -1, np.int32),
        "min_p": np.zeros((b,), np.float32),
        "frequency_penalty": np.zeros((b,), np.float32),
        "presence_penalty": np.zeros((b,), np.float32),
    }

    class FakePlan:
        kind = "decode"
        horizon = k
        reqs = []
        token_ids = np.ones((b, 1), np.int32)
        positions = np.full((b, 1), pos0, np.int32)
        kv_lens = np.full((b,), pos0 + 1, np.int32)
        q_start = np.full((b,), pos0, np.int32)
        logit_idx = np.zeros((b,), np.int32)
        sample_mask = np.ones((b,), bool)

    plan = FakePlan()
    plan.page_table = page_table[:b]
    plan.slots = slots_km[:, :b].T
    samp, all_greedy = runner.build_samp(plan, samp_np)
    key = runner.next_decode_key()

    def one_window():
        toks, lps = runner.issue_decode(
            plan, samp, key, True, None, None, page_table
        )
        return fetch_scalar(toks[:1, :1])

    one_window()  # ensure compiled
    ts = []
    for _ in range(args.reps):
        t0 = time.perf_counter()
        one_window()
        ts.append(time.perf_counter() - t0)
    results["raw_window_s"] = [round(t, 4) for t in ts]
    results["raw_per_token_ms"] = round(1000 * min(ts) / k, 2)
    print(f"raw decode window ({k} steps): {[round(t,3) for t in ts]} s "
          f"-> {1000*min(ts)/k:.1f} ms/tok", file=sys.stderr)

    # ---- C: horizon sweep on raw windows ----
    # (reuse same compiled bucket only when k matches; skip for now)

    # ---- D: component probes sized like one decode step ----
    params = runner.params
    import jax

    leaves = jax.tree_util.tree_leaves(params)
    wbytes = sum(x.nbytes for x in leaves)
    kv = runner.kv_cache
    results["weight_bytes"] = wbytes
    results["kv_bytes"] = kv.nbytes

    # weights-stream probe: sum every param leaf (reads all weight bytes)
    @jax.jit
    def wsum(ps):
        return sum(jnp.sum(x.astype(jnp.float32) if x.dtype != jnp.int4
                           else jnp.sum(x.astype(jnp.int32)))
                   for x in jax.tree_util.tree_leaves(ps))

    try:
        fetch_scalar(wsum(params))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fetch_scalar(wsum(params))
            ts.append(time.perf_counter() - t0)
        results["weight_stream_s"] = round(min(ts), 4)
        results["weight_stream_gbps"] = round(wbytes / min(ts) / 1e9, 1)
    except Exception as e:
        results["weight_stream_error"] = str(e)

    # KV-stream probe: reduce the whole cache
    @jax.jit
    def kvsum(c):
        return jnp.sum(c.astype(jnp.float32))

    fetch_scalar(kvsum(kv))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        fetch_scalar(kvsum(kv))
        ts.append(time.perf_counter() - t0)
    results["kv_stream_s"] = round(min(ts), 4)
    results["kv_stream_gbps"] = round(kv.nbytes / min(ts) / 1e9, 1)

    # dispatch floor
    tiny = jnp.zeros((8,), jnp.float32)
    g = jax.jit(lambda a: a + 1)
    fetch_scalar(g(tiny))
    ts = []
    for _ in range(10):
        t0 = time.perf_counter()
        fetch_scalar(g(tiny))
        ts.append(time.perf_counter() - t0)
    results["dispatch_fetch_floor_ms"] = round(1000 * min(ts), 2)

    if args.trace_dir:
        jax.profiler.start_trace(args.trace_dir)
        one_window()
        jax.profiler.stop_trace()
        results["trace_dir"] = args.trace_dir

    print(json.dumps(results))


if __name__ == "__main__":
    main()
