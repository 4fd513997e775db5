"""Component microbench for the fused decode step (round-4 roofline hunt).

Times each piece of one decode step at bench.py shapes (bs=256, 16 layers,
2048x64 fp8 KV pool) with value-fetch sync (block_until_ready does not
synchronize through the axon tunnel). Each probe runs K=32 iterations
inside one jit to amortize the ~25 ms dispatch+fetch floor.

Hypothesis under test: write_kv_pages' scatter forces XLA to copy the
whole 4.3 GB cache per layer per step (16 x 32 x 4.3 GB = 2.2 TB -> 2.75 s
at 800 GB/s, matching the measured 2.84 s window).
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def fetch(x):
    import jax
    import jax.numpy as jnp

    # fp8 slices can't always be materialized host-side; cast first
    return np.asarray(jax.device_get(jnp.asarray(x, jnp.float32)))


def main():
    import jax
    import jax.numpy as jnp

    from sglang_diffusion_tpu.ops import attention_xla
    from sglang_diffusion_tpu.utils.common import setup_compilation_cache

    setup_compilation_cache()

    L, P, HKV, PS, D = 16, 1040, 8, 64, 128
    B, HQ = 256, 16
    K = 32  # fused steps
    ctx = 145
    kv_dtype = jnp.float8_e4m3fn if "fp8" in sys.argv else jnp.bfloat16

    rng = np.random.default_rng(0)
    kv = jnp.zeros((L, P, PS, 2 * HKV, D), kv_dtype)
    pages_per_seq = 6
    pt = np.zeros((B, pages_per_seq), np.int32)
    for i in range(B):
        pt[i] = np.arange(1 + i * pages_per_seq, 1 + (i + 1) * pages_per_seq) % P
    pt = jnp.asarray(pt)
    kv_lens = jnp.full((B,), ctx, jnp.int32)
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)) * 0.1, jnp.bfloat16)
    newk = jnp.asarray(rng.standard_normal((B, 1, HKV, D)) * 0.1, jnp.bfloat16)
    slot = jnp.asarray((pt[:, ctx // PS] * PS + ctx % PS)[:, None])
    scale = 1.0 / np.sqrt(D)
    results = {}

    def timeit(name, jfn, *args, reps=3, donate=False):
        """Times jfn; with donate=True the caller must pass the ONLY live
        reference to args[0] (it is consumed; the final output is returned
        so the caller can keep using the buffer — peak stays ~1 cache)."""
        out = jfn(*args)
        leaf = jax.tree_util.tree_leaves(out)[-1]
        fetch(leaf.reshape(-1)[:1])
        best = float("inf")
        rest = args[1:]
        cur = ((out if not isinstance(out, tuple) else out[0]),) + rest \
            if donate else args
        if donate:
            args = None  # drop the borrowed reference to the donated buffer
        for _ in range(reps):
            t0 = time.perf_counter()
            out = jfn(*cur)
            leaf = jax.tree_util.tree_leaves(out)[-1]
            fetch(leaf.reshape(-1)[:1])
            best = min(best, time.perf_counter() - t0)
            if donate:
                cur = ((out if not isinstance(out, tuple)
                        else out[0]),) + rest
        per_step_ms = 1000 * best / K
        results[name] = round(per_step_ms, 3)
        print(f"{name}: {per_step_ms:.2f} ms/step ({best:.3f} s / {K})",
              flush=True, file=sys.stderr)
        return out if not isinstance(out, tuple) else out[0]

    # ---- 1. KV write scatter alone: L layers x K steps, donated carry ----
    @jax.jit
    def wloop(kv):
        def body(s, kv):
            def layer(l, kv):
                return attention_xla.write_kv_pages(kv, l, newk, newk, slot)
            return jax.lax.fori_loop(0, L, layer, kv)
        return jax.lax.fori_loop(0, K, body, kv)

    wloop_d = jax.jit(lambda c: wloop(c), donate_argnums=(0,))
    kv = timeit("write_kv_L16", wloop_d, kv, donate=True)

    # ---- 2. gather+attend alone: L layers x K steps ----
    @jax.jit
    def aloop(kv, q):
        def body(s, acc):
            def layer(l, acc):
                o = attention_xla.paged_attention(
                    q, kv, l, pt, kv_lens, kv_lens - 1, scale)
                return acc + o.astype(jnp.float32)
            return jax.lax.fori_loop(0, L, layer, acc)
        return jax.lax.fori_loop(0, K, body, jnp.zeros(q.shape, jnp.float32))

    timeit("attend_xla_L16", aloop, kv, q)

    # ---- 2b. pallas attention ----
    try:
        from sglang_diffusion_tpu.ops import attention_pallas

        @jax.jit
        def ploop(kv, q):
            def body(s, acc):
                def layer(l, acc):
                    o = attention_pallas.paged_attention(
                        q, kv, l, pt, kv_lens, kv_lens - 1, scale,
                        kv_pages_hint=6)
                    return acc + o.astype(jnp.float32)
                return jax.lax.fori_loop(0, L, layer, acc)
            return jax.lax.fori_loop(0, K, body,
                                     jnp.zeros(q.shape, jnp.float32))

        timeit("attend_pallas_L16", ploop, kv, q)
    except Exception as e:
        print(f"pallas attend failed: {e}", file=sys.stderr)

    # ---- 3. write+attend together (the real per-layer pattern) ----
    @jax.jit
    def waloop(kv, q):
        def body(s, carry):
            kv, acc = carry
            def layer(l, carry):
                kv, acc = carry
                kv = attention_xla.write_kv_pages(kv, l, newk, newk, slot)
                o = attention_xla.paged_attention(
                    q, kv, l, pt, kv_lens, kv_lens - 1, scale)
                return (kv, acc + o.astype(jnp.float32))
            return jax.lax.fori_loop(0, L, layer, (kv, acc))
        return jax.lax.fori_loop(
            0, K, body, (kv, jnp.zeros(q.shape, jnp.float32)))

    wa_d = jax.jit(lambda c, q: waloop(c, q), donate_argnums=(0,))
    kv = timeit("write_attend_L16", wa_d, kv, q, donate=True)

    # ---- 4. weight-shaped matmul sweep: all decode GEMMs (w4a16-ish) ----
    H, FF, V = 2048, 8192, 128256
    wq = jnp.zeros((L, H, H + 2 * HKV * D), jnp.bfloat16)
    wo = jnp.zeros((L, HQ * D, H), jnp.bfloat16)
    w1 = jnp.zeros((L, H, 2 * FF), jnp.bfloat16)
    w2 = jnp.zeros((L, FF, H), jnp.bfloat16)
    wv = jnp.zeros((H, V), jnp.bfloat16)
    x = jnp.asarray(rng.standard_normal((B, H)) * 0.1, jnp.bfloat16)

    @jax.jit
    def mloop(x, wq, wo, w1, w2, wv):
        def body(s, x):
            def layer(l, x):
                a = x @ wq[l]
                b = a[:, :H] @ wo[l]
                c = b @ w1[l]
                dd = c[:, :FF] @ w2[l]
                return dd
            x = jax.lax.fori_loop(0, L, layer, x)
            lg = x @ wv
            return (x + lg[:, :H]).astype(jnp.bfloat16)
        return jax.lax.fori_loop(0, K, body, x)

    timeit("gemms_bf16_L16", mloop, x, wq, wo, w1, w2, wv)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
