"""Prefill/decode disaggregation.

Reference analog: srt/disaggregation/ — a prefill fleet computes prompt KV
and streams the pages to a decode fleet which continues generation
(prefill.py:86 bootstrap queue, decode.py:218 prealloc queue, PREBUILT
forward mode scheduler.py:2341). Transfer backends there are RDMA engines
(mooncake/nixl) plus a `fake` in-memory backend used by CI to exercise the
state machine without hardware (fake/conn.py:20) — which is exactly what
round 1 ships. The real TPU transport (host-DMA out of the device cache +
gRPC/RDMA streaming between hosts) plugs into the same interface.

Flow:
  prefill engine: admit request, run prefill only, sample the first token
  -> export the request's KV pages (device -> host) + metadata
  -> TransferBackend.send / recv
  decode engine: allocate pages, import KV (host -> device), register the
  request as already-prefilled (the PREBUILT analog), decode to completion.
"""

from __future__ import annotations

import uuid
from dataclasses import dataclass
from typing import Any, Dict, List, Optional

import numpy as np

from sglang_diffusion_tpu.sampling.params import SamplingParams
from sglang_diffusion_tpu.sched.req import Req, ReqStatus
from sglang_diffusion_tpu.utils.common import cdiv, get_logger

logger = get_logger("disagg")


@dataclass
class KVHandoff:
    """Everything the decode side needs to resume a request."""

    rid: str
    input_ids: List[int]
    first_token: int
    num_computed: int
    kv_pages: Any  # backend-specific payload ([n_pages, L, 2Hkv, S, D] np here)
    sampling_params: SamplingParams


class FakeTransferBackend:
    """In-memory page transfer (reference: disaggregation/fake/conn.py:20)."""

    def __init__(self):
        self._store: Dict[str, KVHandoff] = {}

    def send(self, handoff: KVHandoff) -> None:
        self._store[handoff.rid] = handoff

    def recv(self, rid: str) -> Optional[KVHandoff]:
        return self._store.pop(rid, None)


def handoff_to_bytes(h: KVHandoff) -> bytes:
    """Wire format: one npz blob (metadata JSON + raw page tensor)."""
    import io
    import json as _json

    buf = io.BytesIO()
    meta = {
        "rid": h.rid,
        "input_ids": h.input_ids,
        "first_token": h.first_token,
        "num_computed": h.num_computed,
        "sampling_params": {
            k: v for k, v in h.sampling_params.__dict__.items()
            if not k.startswith("_")
        },
        "has_kv": h.kv_pages is not None,
        "kv_dtype": str(h.kv_pages.dtype) if h.kv_pages is not None else "",
    }
    arrays = {"meta": np.frombuffer(_json.dumps(meta).encode(), np.uint8)}
    if h.kv_pages is not None:
        # view as uint8 so bf16/fp8 page tensors survive npz
        arrays["kv"] = np.ascontiguousarray(h.kv_pages).view(np.uint8)
        arrays["kv_shape"] = np.asarray(h.kv_pages.shape, np.int64)
    np.savez(buf, **arrays)
    return buf.getvalue()


def handoff_from_bytes(data: bytes) -> KVHandoff:
    import io
    import json as _json

    z = np.load(io.BytesIO(data))
    meta = _json.loads(bytes(z["meta"]).decode())
    kv = None
    if meta["has_kv"]:
        import ml_dtypes  # noqa: F401  (registers bf16/fp8 dtypes)

        kv = z["kv"].view(np.dtype(meta["kv_dtype"])).reshape(
            tuple(z["kv_shape"])
        )
    sp = SamplingParams(**{
        k: v for k, v in meta["sampling_params"].items()
        if k in SamplingParams.__dataclass_fields__
    })
    return KVHandoff(
        rid=meta["rid"],
        input_ids=meta["input_ids"],
        first_token=meta["first_token"],
        num_computed=meta["num_computed"],
        kv_pages=kv,
        sampling_params=sp,
    )


class HttpTransferBackend:
    """Networked page transfer: the prefill host POSTs the handoff blob to
    the decode server's /disagg/kv route (reference analog: the RDMA/TCP
    transfer engines under srt/disaggregation/{mooncake,nixl,common}/ —
    same state machine, commodity transport)."""

    def __init__(self, decode_base_url: str, timeout: float = 600.0):
        self.base_url = decode_base_url.rstrip("/")
        self.timeout = timeout

    def send(self, handoff: KVHandoff) -> None:
        import urllib.request

        req = urllib.request.Request(
            self.base_url + "/disagg/kv",
            data=handoff_to_bytes(handoff),
            headers={"Content-Type": "application/octet-stream"},
        )
        with urllib.request.urlopen(req, timeout=self.timeout) as r:
            assert r.status == 200


# ------------- prefill side -------------

def prefill_and_export(engine, prompt, sp: SamplingParams) -> KVHandoff:
    """Run ONLY the prefill (+first token) on `engine` and export the KV."""
    one_tok = SamplingParams(
        **{**sp.__dict__, "max_new_tokens": 1, "stop": list(sp.stop or [])}
    )
    req = engine._make_req(prompt, None, one_tok, stream=False)
    engine.scheduler.add_request(req)
    for _ in range(1000):
        done = engine.step()
        if any(r.rid == req.rid for r in done):
            break
    assert req.output_ids, "prefill did not produce a first token"
    # req finished (max_new_tokens=1): its pages were released into the
    # radix cache; re-match to pin them and export
    fill = req.all_ids()
    if engine.radix is not None:
        pages, node = engine.radix.match_prefix(fill[: len(fill) - 1])
    else:
        pages, node = [], None
    n_pages = len(pages)
    kv_np = None
    if n_pages:
        kv_np = np.asarray(
            engine.runner.kv_cache[:, np.asarray(pages, np.int32)]
        )  # [L, n, 2Hkv, S, D]
        kv_np = np.ascontiguousarray(np.swapaxes(kv_np, 0, 1))  # [n, L, ...]
    return KVHandoff(
        rid=req.rid,
        input_ids=list(req.input_ids),
        first_token=req.output_ids[0],
        num_computed=n_pages * engine.args.page_size,
        kv_pages=kv_np,
        sampling_params=sp,
    )


# ------------- decode side -------------

def import_and_decode(engine, handoff: KVHandoff) -> Dict[str, Any]:
    """Import transferred KV into `engine`'s pool and decode to completion
    (the PREBUILT forward-mode analog: the request enters the running batch
    with its prompt KV already present)."""
    import jax.numpy as jnp

    page_size = engine.args.page_size
    sp = handoff.sampling_params
    req = engine._make_req(None, handoff.input_ids, sp, stream=False)
    req.output_ids = [handoff.first_token]

    n_pages = 0
    if handoff.kv_pages is not None:
        n_pages = handoff.kv_pages.shape[0]
        pages = engine.allocator.alloc(n_pages)
        stacked = np.swapaxes(handoff.kv_pages, 0, 1)  # [L, n, 2Hkv, S, D]
        engine.runner.kv_cache = engine.runner.kv_cache.at[
            :, jnp.asarray(np.asarray(pages, np.int32))
        ].set(jnp.asarray(stacked))
        req.pages = list(pages)
    req.num_computed = n_pages * page_size

    # the un-transferred tail of the prompt (partial last page + last token)
    # is recomputed as a short prefill chunk — same as a radix partial hit
    req.status = ReqStatus.WAITING
    engine.scheduler.add_request(req)
    with engine._lock:
        while not req.finished:
            done = engine.step()
            if not engine.scheduler.has_work() and not req.finished:
                break
    out = engine._build_output(req)
    return out


def disaggregated_generate(
    prefill_engine, decode_engine, prompt, sp: SamplingParams,
    backend: Optional[FakeTransferBackend] = None,
) -> Dict[str, Any]:
    """End-to-end disaggregated generation across two engines."""
    backend = backend or FakeTransferBackend()
    handoff = prefill_and_export(prefill_engine, prompt, sp)
    backend.send(handoff)
    received = backend.recv(handoff.rid)
    assert received is not None
    return import_and_decode(decode_engine, received)
