"""Per-op TPU microbenchmarks to locate decode-step time.

Usage: python tools/microbench.py [--ops write,attn,matmul,step]
Shapes mirror bench.py's llama-1B decode config: B=64, 16 layers,
8 kv heads, head_dim 128, page 64, 512 pages.
"""

from __future__ import annotations

import argparse
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ops", default="write,attn,matmul")
    ap.add_argument("--batch", type=int, default=64)
    args = ap.parse_args()
    ops = args.ops.split(",")

    B = args.batch
    L, HKV, HQ, D, S, P = 16, 8, 16, 128, 64, 512
    E, F, V = 2048, 8192, 128256
    rng = np.random.default_rng(0)

    if "write" in ops:
        from sglang_diffusion_tpu.ops.attention_xla import write_kv_pages

        kv_layer = jnp.zeros((P, 2 * HKV, S, D), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(B, 1, HKV, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(B, 1, HKV, D)), jnp.bfloat16)
        slots = jnp.asarray(rng.choice(P * S, B, replace=False)[:, None], jnp.int32)
        f = jax.jit(write_kv_pages, donate_argnums=(0,))
        # fresh buffer each call because of donation: time with closure
        def run(k, v, slots):
            nonlocal kv_layer
            kv_layer = f(kv_layer, k, v, slots)
            return kv_layer
        t = timeit(run, k, v, slots)
        print(f"write_kv_pages 1 layer decode: {t*1e3:.3f} ms  (x{L} = {t*L*1e3:.1f} ms/step)")

    if "attn" in ops:
        from sglang_diffusion_tpu.ops import attention_pallas, attention_xla

        kv_layer = jnp.asarray(
            rng.normal(size=(P, 2 * HKV, S, D)), jnp.bfloat16
        )
        q = jnp.asarray(rng.normal(size=(B, 1, HQ, D)), jnp.bfloat16)
        pps = 4  # 256 tokens context
        pt = jnp.asarray(
            rng.choice(P, (B, pps), replace=False).astype(np.int32)
        )
        kv_lens = jnp.full((B,), 250, jnp.int32)
        q_start = kv_lens - 1
        fp = jax.jit(
            lambda *a: attention_pallas.paged_attention(*a, sm_scale=0.088)
        )
        t = timeit(fp, q, kv_layer, pt, kv_lens, q_start)
        print(f"pallas paged attn 1 layer decode: {t*1e3:.3f} ms (x{L} = {t*L*1e3:.1f} ms/step)")
        fx = jax.jit(
            lambda *a: attention_xla.paged_attention(*a, sm_scale=0.088)
        )
        t = timeit(fx, q, kv_layer, pt, kv_lens, q_start)
        print(f"xla paged attn 1 layer decode:    {t*1e3:.3f} ms (x{L} = {t*L*1e3:.1f} ms/step)")

    if "matmul" in ops:
        x = jnp.asarray(rng.normal(size=(B, E)), jnp.bfloat16)
        ws = {
            "qkv+o": [(E, (HQ + 2 * HKV) * D), ((HQ) * D, E)],
            "mlp": [(E, 2 * F), (F, E)],
        }
        total = 0.0
        for name, shapes in ws.items():
            fns = []
            weights = [
                jnp.asarray(rng.normal(size=s) * 0.02, jnp.bfloat16) for s in shapes
            ]

            def run(x, weights=weights):
                h = x
                outs = []
                for w in weights:
                    outs.append(jnp.dot(x, w[: x.shape[-1]]) if False else None)
                # simple chain approximating per-layer matmul volume
                a = jnp.dot(x, weights[0])
                b = jnp.dot(a[:, : weights[1].shape[0]], weights[1])
                return b

            f = jax.jit(run)
            t = timeit(f, x)
            total += t
            print(f"matmul {name} 1 layer: {t*1e3:.3f} ms")
        print(f"matmul total x{L} layers ~= {total*L*1e3:.1f} ms/step")
        # lm head
        w = jnp.asarray(rng.normal(size=(E, V)) * 0.02, jnp.bfloat16)
        f = jax.jit(lambda x: jnp.dot(x, w, preferred_element_type=jnp.float32))
        t = timeit(f, x)
        print(f"lm_head [B,{E}]x[{E},{V}]: {t*1e3:.3f} ms")
        # argmax over vocab
        logits = jnp.asarray(rng.normal(size=(B, V)), jnp.float32)
        f = jax.jit(lambda l: jnp.argmax(l, -1))
        t = timeit(f, logits)
        print(f"argmax [B,{V}]: {t*1e3:.3f} ms")


if __name__ == "__main__":
    main()
