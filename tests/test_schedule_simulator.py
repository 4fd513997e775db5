"""Schedule simulator (reference analog:
srt/debug_utils/schedule_simulator/simulator.py — scheduling studies with
no device)."""

import numpy as np
import pytest

from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.sched.simulator import (
    CostModel,
    ScheduleSimulator,
    SimRequest,
)


def _args(**kw):
    base = dict(model_path="", tokenizer_path="byte", page_size=8)
    base.update(kw)
    return ServerArgs(**base)


def _trace(n=32, input_len=64, output_len=32, rate=100.0, prefix_len=0, seed=0):
    rng = np.random.default_rng(seed)
    prefix = rng.integers(3, 30000, prefix_len).tolist()
    t = 0.0
    out = []
    for _ in range(n):
        t += rng.exponential(1.0 / rate)
        ids = prefix + rng.integers(3, 30000, input_len - prefix_len).tolist()
        out.append(SimRequest(t, ids, output_len))
    return out


def test_all_requests_finish_and_metrics():
    sim = ScheduleSimulator(_args(), num_pages=1024)
    rep = sim.run(_trace())
    s = rep.summary()
    assert s["finished"] == 32
    assert rep.output_tokens == 32 * 32
    assert s["ttft_p50_s"] > 0 and s["e2e_p50_s"] >= s["ttft_p50_s"]
    assert rep.prefill_steps > 0 and rep.decode_steps > 0


def test_memory_pressure_causes_retractions_but_completes():
    # tiny KV pool: 64 pages x 8 = 512 tokens for 16 concurrent 96-token reqs
    sim = ScheduleSimulator(_args(), num_pages=64)
    rep = sim.run(_trace(n=16, input_len=32, output_len=64, rate=1e6))
    assert rep.summary()["finished"] == 16
    assert rep.retractions > 0


def test_shared_prefix_hits_radix_cache():
    sim = ScheduleSimulator(_args(), num_pages=2048)
    rep = sim.run(_trace(n=16, input_len=64, prefix_len=48, rate=1.0))
    assert rep.cached_tokens > 0
    sim2 = ScheduleSimulator(_args(disable_radix_cache=True), num_pages=2048)
    rep2 = sim2.run(_trace(n=16, input_len=64, prefix_len=48, rate=1.0))
    assert rep2.cached_tokens == 0


def test_cost_model_shapes_throughput():
    slow = CostModel(decode_base_s=0.05)
    fast = CostModel(decode_base_s=0.005)
    t = _trace(n=16)
    r_slow = ScheduleSimulator(_args(), 1024, cost_model=slow).run(t)
    r_fast = ScheduleSimulator(_args(), 1024, cost_model=fast).run(t)
    assert r_fast.sim_time_s < r_slow.sim_time_s
