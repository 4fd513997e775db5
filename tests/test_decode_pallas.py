"""Cross-sequence batched decode kernel (ops/decode_pallas.py): interpret
parity vs the XLA reference with ragged contexts, padding, and both group
sizes. Real Mosaic lowering is gated on the bench TPU via
tools/check_pallas_parity.py (decode_xseq_bf16 case)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.ops import attention_xla
from sglang_diffusion_tpu.ops.decode_pallas import decode_attention


def _setup(B, PPS, S, HKV, D, HQ, seed=0):
    rng = np.random.default_rng(seed)
    P = B * PPS + 2
    kv = jnp.asarray(rng.standard_normal((2, P, S, 2 * HKV, D)) * 0.3,
                     jnp.float32)
    pt = np.zeros((B, PPS), np.int32)
    lens = np.zeros((B,), np.int32)
    used = 1
    for i in range(B):
        npg = int(rng.integers(1, PPS + 1))
        pt[i, :npg] = np.arange(used, used + npg)
        used += npg
        lens[i] = int(rng.integers((npg - 1) * S + 1, npg * S + 1))
    q = jnp.asarray(rng.standard_normal((B, 1, HQ, D)), jnp.float32)
    return q, kv, jnp.asarray(pt), jnp.asarray(lens)


@pytest.mark.parametrize("G", [1, 2, 4])
@pytest.mark.parametrize("layer", [0, 1])
def test_decode_xseq_matches_xla(G, layer):
    q, kv, pt, lens = _setup(B=6, PPS=4, S=16, HKV=4, D=128, HQ=8)
    want = attention_xla.paged_attention(
        q, kv, layer, pt, lens, lens - 1, 0.09)
    got = decode_attention(q, kv, layer, pt, lens, 0.09,
                           pages_hint=4, group_size=G, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_decode_xseq_batch_padding():
    # B not divisible by G: padded rows must not disturb real outputs
    q, kv, pt, lens = _setup(B=5, PPS=2, S=16, HKV=2, D=128, HQ=4, seed=1)
    want = attention_xla.paged_attention(q, kv, 0, pt, lens, lens - 1, 0.11)
    got = decode_attention(q, kv, 0, pt, lens, 0.11,
                           pages_hint=2, group_size=4, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


def test_decode_xseq_gqa_group1():
    # MHA (group=1) shape
    q, kv, pt, lens = _setup(B=4, PPS=2, S=16, HKV=4, D=128, HQ=4, seed=2)
    want = attention_xla.paged_attention(q, kv, 1, pt, lens, lens - 1, 0.09)
    got = decode_attention(q, kv, 1, pt, lens, 0.09,
                           pages_hint=2, group_size=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-3)


@pytest.mark.parametrize("fp8", [jnp.float8_e4m3fn, jnp.float8_e5m2])
def test_decode_xseq_fp8_dequant_matches_xla(fp8):
    # fp8 caches dequantize in-kernel via integer bit math
    # (decode_pallas._to_bf16); the XLA reference upcasts natively — the
    # bit-twiddle must agree exactly (subnormals included for e4m3)
    q, kv, pt, lens = _setup(B=6, PPS=4, S=16, HKV=4, D=128, HQ=8, seed=3)
    kv8 = jnp.asarray(kv, fp8)
    want = attention_xla.paged_attention(
        q, kv8, 1, pt, lens, lens - 1, 0.09)
    got = decode_attention(q, kv8, 1, pt, lens, 0.09,
                           pages_hint=4, group_size=2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=3e-3)


def test_to_bf16_bit_exact_normals_flushed_subnormals():
    # the integer dequant must match jax's own fp8->bf16 convert bit-for-
    # bit for every NORMAL code; subnormal codes flush to signed zero
    # (documented in _to_bf16 — e4m3 subnormals are < 0.0156)
    from sglang_diffusion_tpu.ops.decode_pallas import _to_bf16

    for dt, mbits in ((jnp.float8_e4m3fn, 3), (jnp.float8_e5m2, 2)):
        codes = np.arange(256, dtype=np.uint8)
        vals = jax.lax.bitcast_convert_type(jnp.asarray(codes), dt)
        ref = np.asarray(vals.astype(jnp.bfloat16), np.float32)
        got = np.asarray(_to_bf16(vals.reshape(16, 16)), np.float32).ravel()
        subnormal = ((codes & 0x7F) >> mbits) == 0
        mask = np.isfinite(ref) & ~subnormal
        np.testing.assert_array_equal(got[mask], ref[mask])
        np.testing.assert_array_equal(got[subnormal], 0.0)
