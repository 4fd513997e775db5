"""TPU microbench: cross-sequence decode kernel vs RPA adapter.

Value-fetch timing (block_until_ready does not sync through the axon
tunnel); K chained iterations inside one jit amortize the dispatch floor.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp

    from sglang_diffusion_tpu.ops import attention_pallas
    from sglang_diffusion_tpu.ops.decode_pallas import decode_attention
    from sglang_diffusion_tpu.utils.common import setup_compilation_cache

    setup_compilation_cache()
    L, P, HKV, PS, D = 16, 1040, 8, 64, 128
    B, HQ = 256, 16
    K = 32
    ctx = 200
    PPH = 4  # pages hint (4*64 = 256 >= ctx)
    kv_dtype = jnp.float8_e4m3fn if len(sys.argv) < 2 else {
        "fp8": jnp.float8_e4m3fn, "e5m2": jnp.float8_e5m2, "bf16": jnp.bfloat16, "int8": jnp.int8}[sys.argv[1]]

    rng = np.random.default_rng(0)
    if kv_dtype == jnp.int8:
        kv = jnp.asarray(
            rng.integers(-127, 127, (L, P, PS, 2 * HKV, D)), jnp.int8)
    else:
        kv = jnp.asarray(
            (rng.standard_normal((L, P, PS, 2 * HKV, D)) * 0.2), kv_dtype)
    pt = np.zeros((B, PPH), np.int32)
    for i in range(B):
        pt[i] = np.arange(1 + i * PPH, 1 + (i + 1) * PPH) % P
    pt = jnp.asarray(pt)
    kv_lens = jnp.full((B,), ctx, jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)) * 0.1, jnp.bfloat16)
    scale = 1.0 / np.sqrt(D)

    def fetch(x):
        return np.asarray(jax.device_get(jnp.asarray(x, jnp.float32)))

    results = {}

    def timeit(name, jfn, *args, reps=3):
        out = jfn(*args)
        fetch(jax.tree_util.tree_leaves(out)[-1].reshape(-1)[:1])
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jfn(*args)
            fetch(jax.tree_util.tree_leaves(out)[-1].reshape(-1)[:1])
            best = min(best, time.perf_counter() - t0)
        ms = 1000 * best / K
        results[name] = round(ms, 3)
        print(f"{name}: {ms:.2f} ms/step", file=sys.stderr, flush=True)

    for G in (4, 8, 16):
        @jax.jit
        def dloop(kv, q, _G=G):
            def body(s, acc):
                def layer(l, acc):
                    o = decode_attention(q, kv, l, pt, kv_lens, scale,
                                         pages_hint=PPH, group_size=_G)
                    return acc + o.astype(jnp.float32)
                return jax.lax.fori_loop(0, L, layer, acc)
            return jax.lax.fori_loop(0, K, body,
                                     jnp.zeros(q.shape, jnp.float32))
        try:
            timeit(f"xseq_G{G}", dloop, kv, q)
        except Exception as e:
            print(f"xseq_G{G} FAILED: {type(e).__name__}: {e}"[:500],
                  file=sys.stderr)

    @jax.jit
    def rloop(kv, q):
        def body(s, acc):
            def layer(l, acc):
                o = attention_pallas.paged_attention(
                    q, kv, l, pt, kv_lens, kv_lens - 1, scale,
                    kv_pages_hint=PPH)
                return acc + o.astype(jnp.float32)
            return jax.lax.fori_loop(0, L, layer, acc)
        return jax.lax.fori_loop(0, K, body, jnp.zeros(q.shape, jnp.float32))

    timeit("rpa_hint", rloop, kv, q)

    # parity check on the chip (single call, value compare)
    o1 = decode_attention(q, kv, 3, pt, kv_lens, scale,
                          pages_hint=PPH, group_size=8)
    o2 = attention_pallas.paged_attention(
        q, kv, 3, pt, kv_lens, kv_lens - 1, scale, kv_pages_hint=PPH)
    diff = float(jnp.max(jnp.abs(jnp.asarray(o1, jnp.float32)
                                 - jnp.asarray(o2, jnp.float32))))
    ref = float(jnp.max(jnp.abs(jnp.asarray(o2, jnp.float32))))
    results["parity_absdiff"] = diff
    results["parity_refmax"] = ref
    print(json.dumps(results))


if __name__ == "__main__":
    main()
