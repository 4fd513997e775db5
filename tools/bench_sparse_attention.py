"""Dense vs top-k page-sparse decode attention at long context (real TPU).

VERDICT r2 ask #6: >= 2x decode speedup at 32k context in this env.
Times the attention op itself with 32 chained calls inside one jit
(the tunnel has a ~85 us per-dispatch floor; see the verify skill).

    python tools/bench_sparse_attention.py [--kv-len 32768] [--batch 4]
"""

import argparse
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--kv-len", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--page-size", type=int, default=64)
    ap.add_argument("--topk", type=int, default=16)
    ap.add_argument("--iters", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from sglang_diffusion_tpu.ops.attention_xla import (
        paged_attention,
        sparse_paged_attention,
    )
    from sglang_diffusion_tpu.utils.common import setup_compilation_cache

    setup_compilation_cache()
    B, PS = args.batch, args.page_size
    HKV, HQ, D = 8, 16, 128
    kv_len = args.kv_len
    pages_per_seq = kv_len // PS
    n_pages = B * pages_per_seq + 1
    rng = np.random.default_rng(0)
    # RPA layout (round 4): [L, P, S, 2Hkv, D]
    kv = jnp.asarray(
        rng.standard_normal((1, n_pages, PS, 2 * HKV, D)) * 0.05,
        jnp.bfloat16)
    pt = np.zeros((B, pages_per_seq), np.int32)
    for i in range(B):
        pt[i] = np.arange(1 + i * pages_per_seq, 1 + (i + 1) * pages_per_seq)
    pt = jnp.asarray(pt)
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)), jnp.bfloat16)
    kv_lens = jnp.full((B,), kv_len, jnp.int32)
    q_start = kv_lens - 1
    scale = 1.0 / np.sqrt(D)

    def chain(fn):
        # kv/pt/lens are jit ARGUMENTS — closing over them would bake the
        # multi-GB cache into the program as a constant (and ship it to
        # the remote compile service)
        def run(q, kv, pt, kv_lens, q_start):
            def body(i, acc):
                out = fn(q + 0.0 * acc[:, :1], kv, 0, pt, kv_lens, q_start,
                         scale)
                return acc + out.astype(jnp.float32)
            return jax.lax.fori_loop(
                0, args.iters, body, jnp.zeros(q.shape, jnp.float32))
        return jax.jit(run)

    dense = chain(lambda *a, **k: paged_attention(*a, **k))
    sparse = chain(lambda *a, **k: sparse_paged_attention(
        *a, topk_pages=args.topk, **k))

    # block_until_ready does NOT synchronize through the axon tunnel
    # (round-4 probes: a 16k matmul "completed" in 45 us) — fetch a value
    # that depends on the computation instead.
    def timed(fn):
        np.asarray(jax.device_get(fn(q, kv, pt, kv_lens, q_start)[0, 0, 0, :1]))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(jax.device_get(
                fn(q, kv, pt, kv_lens, q_start)[0, 0, 0, :1]))
            best = min(best, (time.perf_counter() - t0) / args.iters)
        return best

    import json

    dense_t = timed(dense)
    sparse_t = timed(sparse)
    print(f"dense:  {dense_t*1e6:.0f} us/step (B={B}, kv={kv_len})",
          file=sys.stderr)
    print(f"sparse: {sparse_t*1e6:.0f} us/step (topk={args.topk})",
          file=sys.stderr)
    print(json.dumps({
        "metric": "sparse_attention_decode",
        "kv_len": kv_len, "batch": B, "topk": args.topk,
        "dense_us_per_step": round(dense_t * 1e6, 1),
        "sparse_us_per_step": round(sparse_t * 1e6, 1),
        "speedup_x": round(dense_t / sparse_t, 2),
    }))


if __name__ == "__main__":
    main()
