"""Real-Mosaic-lowering parity gate for the Pallas attention path.

VERDICT r3 weak #9: CI exercises kernels only in interpret mode on CPU;
Mosaic has rejected interpret-clean kernels before. This tool runs ON THE
BENCH TPU and compares the compiled ragged-paged-attention backend against
the XLA reference at serving shapes (decode + chunked prefill, bf16 and
fp8 cache), printing one JSON line with max-abs deltas that bench.py folds
into the BENCH artifact every round.
"""

from __future__ import annotations

import json
import sys

import numpy as np

sys.path.insert(0, ".")


def run_case(name, b, t, ctx, hq, hkv, d, page, pps, kv_dtype, results,
             hint=None):
    import jax
    import jax.numpy as jnp

    from sglang_diffusion_tpu.ops import attention_pallas, attention_xla

    rng = np.random.default_rng(0)
    num_pages = b * pps + 1
    cache = jnp.asarray(
        rng.standard_normal((2, num_pages, page, 2 * hkv, d)) * 0.3,
        jnp.bfloat16,
    ).astype(kv_dtype)
    pt = np.zeros((b, pps), np.int32)
    for i in range(b):
        pt[i] = np.arange(1 + i * pps, 1 + (i + 1) * pps) % num_pages
    pt = jnp.asarray(pt)
    q = jnp.asarray(rng.standard_normal((b, t, hq, d)) * 0.3, jnp.bfloat16)
    kv_lens = jnp.full((b,), ctx, jnp.int32)
    q_start = kv_lens - t
    scale = 1.0 / np.sqrt(d)

    out_p = attention_pallas.paged_attention(
        q, cache, 1, pt, kv_lens, q_start, scale, kv_pages_hint=hint)
    out_x = attention_xla.paged_attention(
        q, cache, 1, pt, kv_lens, q_start, scale)
    # only compare real (non-padding) rows
    dp = np.asarray(jax.device_get(out_p), np.float32)
    dx = np.asarray(jax.device_get(out_x), np.float32)
    delta = float(np.max(np.abs(dp - dx)))
    ref = float(np.max(np.abs(dx)) + 1e-9)
    results[name] = round(delta / ref, 5)
    print(f"{name}: rel max delta {delta/ref:.2e}", file=sys.stderr)


def main():
    import jax.numpy as jnp

    from sglang_diffusion_tpu.utils.common import setup_compilation_cache

    setup_compilation_cache()
    results = {}
    # decode, bf16 + fp8 cache; chunked prefill
    run_case("decode_bf16", 8, 1, 145, 16, 8, 128, 64, 4, jnp.bfloat16,
             results)
    run_case("decode_fp8", 8, 1, 145, 16, 8, 128, 64, 4, jnp.float8_e4m3fn,
             results)
    run_case("prefill_bf16", 4, 128, 256, 16, 8, 128, 64, 4, jnp.bfloat16,
             results)
    # cross-sequence batched decode kernel (bf16 + pages hint)
    run_case("decode_xseq_bf16", 8, 1, 145, 16, 8, 128, 64, 4, jnp.bfloat16,
             results, hint=4)
    ok = all(v < 0.05 for v in results.values())
    print(json.dumps({"pallas_parity_ok": ok, **results}))


if __name__ == "__main__":
    main()
