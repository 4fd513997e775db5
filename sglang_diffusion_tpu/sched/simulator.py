"""Schedule simulator: replay request traces against the REAL scheduler with
a modeled device — no TPU/compile needed.

TPU-native analog of the reference's schedule_simulator
(srt/debug_utils/schedule_simulator/simulator.py): the actual Scheduler,
PageAllocator, and RadixCache run unmodified; only the forward step is
replaced by a cost model that advances virtual time and emits dummy tokens.
Use it to study admission/retraction behavior, KV pressure, cache hit
rates, and TTFT/throughput under different flag settings before touching
hardware.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np

from sglang_diffusion_tpu.config.server_args import ServerArgs
from sglang_diffusion_tpu.kv.allocator import PageAllocator
from sglang_diffusion_tpu.kv.radix_cache import RadixCache
from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.sched.req import Req
from sglang_diffusion_tpu.sched.scheduler import Scheduler


@dataclass
class SimRequest:
    arrival_s: float
    input_ids: List[int]
    output_len: int
    rid: str = ""


@dataclass
class CostModel:
    """Linear step-time model: prefill ~ tokens, decode ~ batch rows.
    Defaults loosely shaped like a v5e chip running an 8B model."""

    prefill_base_s: float = 0.004
    prefill_per_token_s: float = 0.00002
    decode_base_s: float = 0.005
    decode_per_row_s: float = 0.00002

    def step_time(self, plan) -> float:
        if plan.kind == "prefill":
            toks = int(plan.token_ids.shape[0] * plan.token_ids.shape[1])
            return self.prefill_base_s + toks * self.prefill_per_token_s
        rows = plan.token_ids.shape[0] * plan.horizon
        return self.decode_base_s + rows * self.decode_per_row_s


@dataclass
class SimReport:
    finished: int = 0
    sim_time_s: float = 0.0
    output_tokens: int = 0
    prefill_steps: int = 0
    decode_steps: int = 0
    retractions: int = 0
    cached_tokens: int = 0
    ttft_s: List[float] = field(default_factory=list)
    e2e_s: List[float] = field(default_factory=list)

    def summary(self) -> Dict[str, float]:
        def pct(xs, p):
            return float(np.percentile(xs, p)) if xs else 0.0

        return {
            "finished": self.finished,
            "sim_time_s": round(self.sim_time_s, 3),
            "output_tok_per_s": round(
                self.output_tokens / max(self.sim_time_s, 1e-9), 1
            ),
            "prefill_steps": self.prefill_steps,
            "decode_steps": self.decode_steps,
            "retractions": self.retractions,
            "cached_tokens": self.cached_tokens,
            "ttft_p50_s": round(pct(self.ttft_s, 50), 4),
            "ttft_p99_s": round(pct(self.ttft_s, 99), 4),
            "e2e_p50_s": round(pct(self.e2e_s, 50), 4),
        }


class ScheduleSimulator:
    def __init__(self, args: ServerArgs, num_pages: int,
                 max_pages_per_seq: int = 512,
                 cost_model: Optional[CostModel] = None, seed: int = 0):
        self.args = args
        self.allocator = PageAllocator(num_pages, args.page_size)
        self.radix = (
            None if args.disable_radix_cache
            else RadixCache(args.page_size, self.allocator.free)
        )
        self.scheduler = Scheduler(
            args, self.allocator, self.radix, max_pages_per_seq
        )
        self.cost = cost_model or CostModel()
        self.rng = np.random.default_rng(seed)

    def run(self, trace: List[SimRequest], vocab_size: int = 32000,
            max_steps: int = 1_000_000) -> SimReport:
        now = 0.0
        rep = SimReport()
        pending = sorted(trace, key=lambda r: r.arrival_s)
        arrivals: Dict[str, float] = {}
        first_token: Dict[str, float] = {}
        i = 0
        steps = 0
        while (i < len(pending) or self.scheduler.has_work()) and steps < max_steps:
            # admit everything that has arrived by `now`
            while i < len(pending) and pending[i].arrival_s <= now:
                sr = pending[i]
                rid = sr.rid or f"sim-{i}"
                req = Req(
                    rid=rid,
                    input_ids=list(sr.input_ids),
                    sampling_params=SamplingParams(
                        max_new_tokens=sr.output_len, ignore_eos=True,
                        temperature=0.0,
                    ),
                )
                arrivals[rid] = sr.arrival_s
                self.scheduler.add_request(req)
                i += 1
            retract_before = self.scheduler.num_retracted
            plan = self.scheduler.get_next_batch()
            if plan is None:
                if i < len(pending):
                    now = pending[i].arrival_s  # idle until next arrival
                    continue
                break
            steps += 1
            now += self.cost.step_time(plan)
            if plan.kind == "prefill":
                rep.prefill_steps += 1
            else:
                rep.decode_steps += 1
            b = plan.token_ids.shape[0]
            k = plan.horizon if plan.kind == "decode" else 1
            toks = self.rng.integers(3, vocab_size, size=(b, k)).astype(np.int32)
            lps = np.zeros((b, k), np.float32)
            finished = self.scheduler.process_batch_result(plan, toks, lps)
            for r in plan.reqs:
                if r.output_ids and r.rid not in first_token:
                    first_token[r.rid] = now
                    rep.ttft_s.append(now - arrivals[r.rid])
            for r in finished:
                rep.finished += 1
                rep.output_tokens += len(r.output_ids)
                rep.cached_tokens += r.cached_prefix_len
                rep.e2e_s.append(now - arrivals[r.rid])
            rep.retractions += self.scheduler.num_retracted - retract_before
        rep.sim_time_s = now
        return rep


def main(argv=None):
    import argparse
    import json

    ap = argparse.ArgumentParser(description="GPU-free schedule simulator")
    ap.add_argument("--num-requests", type=int, default=256)
    ap.add_argument("--input-len", type=int, default=512)
    ap.add_argument("--output-len", type=int, default=128)
    ap.add_argument("--request-rate", type=float, default=16.0)
    ap.add_argument("--num-pages", type=int, default=2048)
    ap.add_argument("--page-size", type=int, default=16)
    ap.add_argument("--shared-prefix-len", type=int, default=0)
    args = ap.parse_args(argv)
    sargs = ServerArgs(model_path="", tokenizer_path="byte",
                       page_size=args.page_size)
    rng = np.random.default_rng(0)
    prefix = rng.integers(3, 30000, args.shared_prefix_len).tolist()
    trace = []
    t = 0.0
    for j in range(args.num_requests):
        t += rng.exponential(1.0 / args.request_rate)
        ids = prefix + rng.integers(
            3, 30000, args.input_len - args.shared_prefix_len
        ).tolist()
        trace.append(SimRequest(t, ids, args.output_len))
    sim = ScheduleSimulator(sargs, args.num_pages)
    print(json.dumps(sim.run(trace).summary()))


if __name__ == "__main__":
    main()
