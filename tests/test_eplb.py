"""EPLB: expert distribution recording + rebalancing
(reference analog: srt/eplb/ + eplb_algorithms tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.parallel.eplb import (
    ExpertDistributionRecorder,
    balance_ratio,
    permute_expert_weights,
    rebalance_experts,
    trivial_location,
)


def test_trivial_location_valid():
    meta = trivial_location(8, 12)
    assert meta.num_physical == 12
    assert (meta.replica_counts >= 1).all()
    # every physical slot maps to a real logical expert
    assert meta.physical_to_logical.max() < 8


def test_rebalance_improves_skewed_load():
    rng = np.random.default_rng(0)
    num_logical, num_ranks, slots = 16, 4, 6  # 24 physical, 8 spare
    load = rng.integers(1, 10, num_logical).astype(np.float64)
    load[0] = 1000.0  # one scorching expert
    load[1] = 500.0
    base = trivial_location(num_logical, num_ranks * slots)
    opt = rebalance_experts(load, num_ranks, slots)
    r_base = balance_ratio(load, base, num_ranks)
    r_opt = balance_ratio(load, opt, num_ranks)
    assert r_opt < r_base
    assert r_opt < 1.6  # near-balanced
    # hot experts got extra replicas
    assert opt.replica_counts[0] > 1
    # all logical experts still reachable
    assert set(opt.physical_to_logical.tolist()) == set(range(num_logical))


def test_route_spreads_over_replicas():
    load = np.array([100.0, 1.0, 1.0, 1.0])
    meta = rebalance_experts(load, 2, 4)  # 8 slots, expert 0 replicated
    n_rep = int(meta.replica_counts[0])
    assert n_rep >= 2
    ids = np.zeros(64, np.int64)
    salt = np.arange(64)
    phys = meta.route(ids, salt)
    # tokens hit every replica of expert 0
    assert len(set(phys.tolist())) == n_rep
    # routing a non-replicated expert returns its single slot
    one = meta.route(np.array([1]), np.array([7]))
    assert meta.physical_to_logical[one[0]] == 1


def test_recorder_counts():
    rec = ExpertDistributionRecorder(num_layers=2, num_experts=4)
    rec.record(0, jnp.asarray([0, 0, 1, 3]))
    rec.record(1, jnp.asarray([2]))
    rec.record(0, jnp.asarray([0]))
    snap = rec.snapshot()
    assert snap[0].tolist() == [3, 1, 0, 1]
    assert snap[1].tolist() == [0, 0, 1, 0]
    rec.reset()
    assert rec.snapshot().sum() == 0


def test_permute_expert_weights():
    L, E, K, N = 2, 4, 3, 5
    w = np.arange(L * E * K * N, dtype=np.float32).reshape(L, E, K, N)
    meta = trivial_location(E, 6)
    pw = permute_expert_weights(w, meta)
    assert pw.shape == (L, 6, K, N)
    for p, log in enumerate(meta.physical_to_logical):
        np.testing.assert_array_equal(pw[:, p], w[:, log])
