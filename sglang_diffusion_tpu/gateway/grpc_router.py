"""Gateway gRPC pipeline: native tokenization + tokens-in/tokens-out routing.

Reference analog: sgl-model-gateway/src/routers/grpc/ — the gateway's
highest-performance path: the router tokenizes with its own tokenizer,
sends token ids straight to scheduler gRPC endpoints (bypassing worker
HTTP + templating), streams token chunks back, and detokenizes at the
edge. Load balancing reuses the cache-aware approximate radix tree
(src/policies/cache_aware.rs / tree.rs — here the C++ ApproxTree behind
gateway/__init__.py), with the same imbalance-then-prefix policy.

This router is the in-process Python driver of that pipeline (the
reference's is Rust); the hot tokenize step releases the GIL in the HF
Rust core, and the wire is the protobuf scheduler protocol
(server/proto/sgld_scheduler.proto) shared with GrpcServer.
"""

from __future__ import annotations

import itertools
import threading
import uuid
from typing import Any, Dict, Iterator, List, Optional, Sequence

from sglang_diffusion_tpu.server.proto import sgld_scheduler_pb2 as pb2
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("grpc_router")


class _Worker:
    def __init__(self, address: str):
        from sglang_diffusion_tpu.server.grpc_server import (
            make_channel_stubs,
        )

        self.address = address
        (self.generate, self.health, self.abort, self.model_info,
         self.loads) = make_channel_stubs(address)
        self.inflight = 0


class GrpcRouter:
    """Routes tokenized requests across scheduler gRPC workers.

    policy: "cache_aware" (ApproxTree prefix match with imbalance
    fallback, the reference gateway's default), "round_robin", or
    "shortest_queue" (live GetLoads probe).
    """

    def __init__(self, workers: Sequence[str], tokenizer,
                 policy: str = "cache_aware",
                 cache_threshold: float = 0.5,
                 balance_abs_threshold: int = 32,
                 balance_rel_threshold: float = 1.0001,
                 max_tree_chars: int = 2 ** 24):
        self.workers = [_Worker(a) for a in workers]
        self.tokenizer = tokenizer
        self.policy = policy
        self._rr = itertools.count()
        self._lock = threading.Lock()
        self._tree = None
        self._params = (cache_threshold, balance_abs_threshold,
                        balance_rel_threshold)
        self._max_tree_chars = max_tree_chars
        if policy == "cache_aware":
            from sglang_diffusion_tpu.gateway import ApproxTree

            try:
                self._tree = ApproxTree()
            except Exception:  # noqa: BLE001 — toolchain unavailable
                logger.warning(
                    "ApproxTree unavailable; falling back to round_robin")
                self.policy = "round_robin"

    # ------------- selection -------------
    def _select(self, text: str) -> int:
        n = len(self.workers)
        if n == 1:
            return 0
        if self.policy == "round_robin" or self._tree is None:
            return next(self._rr) % n
        if self.policy == "shortest_queue":
            loads = []
            for w in self.workers:
                try:
                    resp = w.loads(pb2.GetLoadsRequest(), timeout=2.0)
                    l0 = resp.loads[0]
                    loads.append(l0.num_waiting_reqs + l0.num_running_reqs)
                except Exception:  # noqa: BLE001
                    loads.append(1 << 30)
            return int(min(range(n), key=loads.__getitem__))
        # cache_aware (reference policies/cache_aware.rs): if worker load
        # is imbalanced beyond thresholds -> shortest queue; else prefix
        # match rate > cache_threshold routes to the matching worker,
        # otherwise to the smallest tree tenant (most available cache)
        with self._lock:
            cache_threshold, abs_t, rel_t = self._params
            inflight = [w.inflight for w in self.workers]
            sel = self._tree.cache_aware_select(
                text, inflight, [True] * n,
                cache_threshold=cache_threshold,
                abs_threshold=abs_t,
                rel_threshold=rel_t,
            )
            return int(sel)

    def _record(self, text: str, worker: int) -> None:
        if self._tree is not None:
            with self._lock:
                self._tree.insert(text, worker)
                self._tree.evict_by_size(self._max_tree_chars)

    # ------------- serving -------------
    def generate_stream(
        self,
        prompt: Optional[str] = None,
        input_ids: Optional[List[int]] = None,
        sampling_params: Optional[Dict[str, Any]] = None,
        request_id: Optional[str] = None,
    ) -> Iterator[Dict[str, Any]]:
        """Tokenize -> route -> stream {token_ids, text_delta, ...} dicts,
        detokenizing at the router edge (tokens never round-trip through
        worker-side detokenization, like the reference's Rust pipeline)."""
        sp = dict(sampling_params or {})
        if input_ids is None:
            input_ids = list(self.tokenizer.encode(prompt))
        text_key = prompt if prompt is not None else " ".join(
            map(str, input_ids))
        widx = self._select(text_key)
        worker = self.workers[widx]
        rid = request_id or uuid.uuid4().hex

        p = pb2.SamplingParams(
            temperature=float(sp.get("temperature", 1.0)),
            top_p=float(sp.get("top_p", 1.0)),
            top_k=int(sp.get("top_k", -1)),
            min_p=float(sp.get("min_p", 0.0)),
            frequency_penalty=float(sp.get("frequency_penalty", 0.0)),
            presence_penalty=float(sp.get("presence_penalty", 0.0)),
            ignore_eos=bool(sp.get("ignore_eos", False)),
        )
        if sp.get("max_new_tokens") is not None:
            p.max_new_tokens = int(sp["max_new_tokens"])
        for s in sp.get("stop") or []:
            p.stop.append(s)

        req = pb2.GenerateRequest(
            request_id=rid,
            tokenized=pb2.TokenizedInput(
                original_text=prompt or "", input_ids=input_ids),
            sampling_params=p,
            stream=True,
        )
        worker.inflight += 1
        out_ids: List[int] = []
        emitted = ""
        try:
            for resp in worker.generate(req):
                which = resp.WhichOneof("response")
                if which == "chunk":
                    out_ids.extend(resp.chunk.token_ids)
                    text = self.tokenizer.decode(out_ids)
                    # hold back trailing replacement chars (partial utf-8)
                    stable = text
                    held = 0
                    while stable.endswith("�") and held < 3:
                        stable = stable[:-1]
                        held += 1
                    delta = stable[len(emitted):]
                    emitted = stable
                    yield {
                        "rid": rid,
                        "worker": widx,
                        "token_ids": list(resp.chunk.token_ids),
                        "text_delta": delta,
                        "finished": False,
                    }
                elif which == "complete":
                    c = resp.complete
                    final = self.tokenizer.decode(list(c.output_ids))
                    yield {
                        "rid": rid,
                        "worker": widx,
                        "token_ids": [],
                        "text_delta": final[len(emitted):],
                        "finished": True,
                        "meta": {
                            "prompt_tokens": c.prompt_tokens,
                            "completion_tokens": c.completion_tokens,
                            "cached_tokens": c.cached_tokens,
                            "finish_reason": c.finish_reason,
                        },
                    }
                elif which == "error":
                    raise RuntimeError(resp.error.message)
        finally:
            worker.inflight -= 1
            self._record(text_key, widx)

    def generate(self, prompt=None, input_ids=None, sampling_params=None
                 ) -> Dict[str, Any]:
        text = ""
        meta: Dict[str, Any] = {}
        worker = -1
        for ev in self.generate_stream(prompt, input_ids, sampling_params):
            text += ev["text_delta"]
            worker = ev["worker"]
            if ev["finished"]:
                meta = ev["meta"]
        return {"text": text, "meta_info": meta, "worker": worker}

    def health(self) -> List[bool]:
        out = []
        for w in self.workers:
            try:
                out.append(bool(
                    w.health(pb2.HealthCheckRequest(), timeout=30.0).healthy))
            except Exception:  # noqa: BLE001
                out.append(False)
        return out
