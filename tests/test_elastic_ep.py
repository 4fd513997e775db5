"""Elastic EP: routing around dead expert ranks (reference analog:
srt/elastic_ep/elastic_ep.py + active-ranks dispatch, scheduler.py:2458)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sglang_diffusion_tpu.layers.moe import make_ep_moe


def _setup(num_experts=8, ep=4, e=16, f=32, seed=0):
    mesh = Mesh(np.array(jax.devices()[:ep]), ("tp",))
    rng = np.random.default_rng(seed)
    h = jnp.asarray(rng.standard_normal((2, 6, e)), jnp.float32)
    w_router = jnp.asarray(rng.standard_normal((e, num_experts)) * 0.5,
                           jnp.float32)
    w_gate = jnp.asarray(rng.standard_normal((num_experts, e, f)) * 0.1,
                         jnp.float32)
    w_up = jnp.asarray(rng.standard_normal((num_experts, e, f)) * 0.1,
                       jnp.float32)
    w_down = jnp.asarray(rng.standard_normal((num_experts, f, e)) * 0.1,
                         jnp.float32)
    return mesh, h, w_router, w_gate, w_up, w_down


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_all_alive_matches_default():
    mesh, h, wr, wg, wu, wd = _setup()
    fn = make_ep_moe(mesh, top_k=2, num_experts=8)
    base = np.asarray(fn(h, wr, wg, wu, wd))
    alive = np.asarray(fn(h, wr, wg, wu, wd, jnp.ones((4,), bool)))
    np.testing.assert_allclose(base, alive, atol=1e-6)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_dead_rank_rerouted():
    """With rank 1 down, no token may route to experts 2..3; the output
    equals computing with those experts' logits masked."""
    mesh, h, wr, wg, wu, wd = _setup(seed=1)
    fn = make_ep_moe(mesh, top_k=2, num_experts=8)
    mask = jnp.asarray([True, False, True, True])
    out = np.asarray(fn(h, wr, wg, wu, wd, mask))
    assert np.isfinite(out).all()
    # reference: dense MoE with the dead experts' logits masked
    h2 = np.asarray(h).reshape(-1, 16)
    logits = h2 @ np.asarray(wr)
    logits[:, 2:4] = -1e30
    topv = np.sort(logits, axis=-1)[:, -2:][:, ::-1]
    topi = np.argsort(logits, axis=-1)[:, -2:][:, ::-1]
    w = np.exp(topv - topv.max(-1, keepdims=True))
    w = w / w.sum(-1, keepdims=True)
    ref = np.zeros_like(h2)
    for nidx in range(h2.shape[0]):
        for kk in range(2):
            eid = topi[nidx, kk]
            assert eid not in (2, 3)  # dead experts never chosen
            x = h2[nidx]
            gate = np.maximum(x @ np.asarray(wg)[eid], 0) * 0 + (
                x @ np.asarray(wg)[eid]
            )
            act = gate / (1 + np.exp(-gate))  # silu
            y = (act * (x @ np.asarray(wu)[eid])) @ np.asarray(wd)[eid]
            ref[nidx] += w[nidx, kk] * y
    np.testing.assert_allclose(out.reshape(-1, 16), ref, atol=2e-4, rtol=2e-3)


@pytest.mark.skipif(jax.device_count() < 4, reason="needs >= 4 devices")
def test_recovery_restores_routing():
    mesh, h, wr, wg, wu, wd = _setup(seed=2)
    fn = make_ep_moe(mesh, top_k=2, num_experts=8)
    base = np.asarray(fn(h, wr, wg, wu, wd))
    degraded = np.asarray(fn(h, wr, wg, wu, wd,
                             jnp.asarray([True, True, False, True])))
    recovered = np.asarray(fn(h, wr, wg, wu, wd, jnp.ones((4,), bool)))
    np.testing.assert_allclose(base, recovered, atol=1e-6)
    assert not np.allclose(base, degraded)
