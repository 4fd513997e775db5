"""Isolate the decode kernel's bottleneck: DMA-only pallas kernel that
streams the same page pattern with zero compute, at several chunk sizes."""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from sglang_diffusion_tpu.utils.common import setup_compilation_cache

    setup_compilation_cache()
    L, HKV, D = 16, 8, 128
    B = 256
    K = 32
    kv_dtype = jnp.float8_e4m3fn

    def fetch(x):
        return np.asarray(jax.device_get(jnp.asarray(x, jnp.float32)))

    results = {}

    def run(PS, PPH, G):
        P = (B * PPH + 8)  # enough distinct pages
        rng = np.random.default_rng(0)
        kv = jnp.asarray(rng.standard_normal((L * P, PS, 2 * HKV, D)) * 0.1,
                         kv_dtype)
        pt = np.zeros((B, PPH), np.int32)
        for i in range(B):
            pt[i] = np.arange(1 + i * PPH, 1 + (i + 1) * PPH) % P
        pt = jnp.asarray(pt)
        nb = B // G

        def kern(pt_ref, kv_hbm, o_ref, kbuf, sem):
            i = pl.program_id(0)

            def start(slot, blk):
                for g in range(G):
                    for p in range(PPH):
                        pltpu.make_async_copy(
                            kv_hbm.at[pt_ref[blk * G + g, p]],
                            kbuf.at[slot, g, p], sem.at[slot, g, p]).start()

            @pl.when(i == 0)
            def _():
                start(0, 0)

            @pl.when(i + 1 < nb)
            def _():
                start((i + 1) % 2, i + 1)

            slot = i % 2
            for g in range(G):
                for p in range(PPH):
                    pltpu.make_async_copy(
                        kv_hbm.at[pt_ref[i * G + g, p]],
                        kbuf.at[slot, g, p], sem.at[slot, g, p]).wait()
            # touch data so the DMA isn't dead-code eliminated
            o_ref[...] = jnp.sum(
                kbuf[slot, 0, 0, 0, :1, :].astype(jnp.float32),
                axis=0, keepdims=True)[:, :1]

        spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1, grid=(nb,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((1, 1), lambda i, *_: (0, 0)),
            scratch_shapes=[
                pltpu.VMEM((2, G, PPH, PS, 2 * HKV, D), kv_dtype),
                pltpu.SemaphoreType.DMA((2, G, PPH)),
            ])
        call = pl.pallas_call(
            kern, grid_spec=spec,
            out_shape=jax.ShapeDtypeStruct((1, 1), jnp.float32))

        @jax.jit
        def loop(kv):
            def body(s, acc):
                def layer(l, acc):
                    return acc + call(pt + l * P, kv)
                return jax.lax.fori_loop(0, L, layer, acc)
            return jax.lax.fori_loop(0, K, body, jnp.zeros((1, 1), jnp.float32))

        out = loop(kv)
        fetch(out)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fetch(loop(kv))
            best = min(best, time.perf_counter() - t0)
        ms = 1000 * best / K
        bytes_per_step = B * PPH * PS * 2 * HKV * D * L
        gbps = bytes_per_step / (best / K) / 1e9
        key = f"PS{PS}_PP{PPH}_G{G}"
        results[key] = {"ms": round(ms, 3), "gbps": round(gbps, 1)}
        print(f"{key}: {ms:.2f} ms/step  {gbps:.0f} GB/s",
              file=sys.stderr, flush=True)

    for ps, pp in ((64, 4), (128, 2), (256, 1)):
        for g in (8,):
            try:
                run(ps, pp, g)
            except Exception as e:
                print(f"PS{ps} FAILED: {type(e).__name__}: {e}"[:300],
                      file=sys.stderr)
    run(64, 4, 16)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
