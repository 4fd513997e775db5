"""TPU microbench: NSA top-k page-sparse prefill vs dense at 32k tokens.

VERDICT r4 #6 done-criterion: >=3x prefill attention speedup at 32k.
Value-fetch timing with chained layers inside one jit (the axon tunnel
does not sync on block_until_ready).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from sglang_diffusion_tpu.ops.nsa import (
        nsa_dense_reference,
        nsa_sparse_prefill,
    )
    from sglang_diffusion_tpu.utils.common import setup_compilation_cache

    setup_compilation_cache()
    T = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    HQ, HKV, D = 16, 8, 128
    PAGE, TOPK, QBLK = 64, 16, 128
    L = 4  # chained layers per timed call

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, T, HQ, D)) * 0.1, jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, T, HKV, D)) * 0.1, jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, T, HKV, D)) * 0.1, jnp.bfloat16)
    scores = jnp.asarray(
        rng.standard_normal((1, T, T // PAGE)), jnp.float32)
    scale = 1.0 / np.sqrt(D)

    def fetch(x):
        return np.asarray(jax.device_get(
            jnp.asarray(x, jnp.float32).reshape(-1)[:1]))

    @jax.jit
    def sparse_loop(q, k, v, scores):
        def body(i, acc):
            o = nsa_sparse_prefill(q, k, v, scores, scale, page=PAGE,
                                   topk=TOPK, q_block=QBLK)
            return acc + o.astype(jnp.float32)
        return jax.lax.fori_loop(0, L, body, jnp.zeros(q.shape, jnp.float32))

    @jax.jit
    def dense_loop(q, k, v):
        def body(i, acc):
            o = nsa_dense_reference(q, k, v, scale)
            return acc + o.astype(jnp.float32)
        return jax.lax.fori_loop(0, L, body, jnp.zeros(q.shape, jnp.float32))

    # also compare against the engine's flash prefill path (the real
    # dense baseline on TPU)
    from sglang_diffusion_tpu.ops.flash_pallas import flash_attention

    group = HQ // HKV

    @jax.jit
    def flash_loop(q, k, v):
        # flash kernel is MHA-shaped; repeat kv heads (same QK^T/PV FLOPs
        # as a GQA flash — the compute NSA is cutting)
        kr = jnp.repeat(k, group, axis=2)
        vr = jnp.repeat(v, group, axis=2)

        def body(i, acc):
            o = flash_attention(q, kr, vr, scale, causal=True)
            return acc + o.astype(jnp.float32)
        return jax.lax.fori_loop(0, L, body, jnp.zeros(q.shape, jnp.float32))

    results = {"tokens": T, "topk": TOPK, "page": PAGE}

    def timeit(name, fn, *args, reps=3):
        try:
            out = fn(*args)
            fetch(out)
        except Exception as e:  # noqa: BLE001
            print(f"{name} FAILED: {type(e).__name__}: {e}"[:300],
                  file=sys.stderr)
            return None
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            fetch(fn(*args))
            best = min(best, time.perf_counter() - t0)
        ms = 1000 * best / L
        results[name + "_ms"] = round(ms, 2)
        print(f"{name}: {ms:.2f} ms/layer", file=sys.stderr, flush=True)
        return ms

    sp = timeit("nsa_sparse", sparse_loop, q, k, v, scores)
    fl = timeit("flash_dense", flash_loop, q, k, v)
    de = timeit("xla_dense", dense_loop, q, k, v)
    base = min(x for x in (fl, de) if x is not None) if (fl or de) else None
    if sp and base:
        results["speedup_x"] = round(base / sp, 2)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
