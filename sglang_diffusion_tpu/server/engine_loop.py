"""Background engine loop bridging asyncio HTTP handlers to the engine.

Reference analog: the TokenizerManager's asyncio demux loop
(srt/managers/tokenizer_manager.py:1121 _wait_one_response, :1494
handle_loop) — but in-process: the engine steps on a dedicated thread
(jit dispatch releases the GIL while the TPU works) and events are posted
to per-request asyncio queues with call_soon_threadsafe. No ZMQ.
"""

from __future__ import annotations

import asyncio
import queue
import threading
from typing import Any, Dict, Optional, Tuple

from sglang_diffusion_tpu.engine.engine import Engine
from sglang_diffusion_tpu.sched.req import Req
from sglang_diffusion_tpu.utils.common import get_logger

logger = get_logger("engine_loop")


class EngineLoop:
    def __init__(self, engine: Engine):
        self.engine = engine
        self.loop: Optional[asyncio.AbstractEventLoop] = None
        self._intake: "queue.Queue[Req]" = queue.Queue()
        self._watchers: Dict[str, asyncio.Queue] = {}
        self._wakeup = threading.Event()
        self._stop = False
        self._thread = threading.Thread(target=self._run, daemon=True)
        # serving hooks: the pipelined decode loop yields for new arrivals
        # and streams per-window instead of per-step() (round-5 online fix)
        engine.intake_hook = lambda: not self._intake.empty()
        engine.stream_hook = self._flush_streams

    def start(self, loop: asyncio.AbstractEventLoop) -> None:
        self.loop = loop
        self._thread.start()

    def shutdown(self) -> None:
        self._stop = True
        self._wakeup.set()

    # ---- called from asyncio handlers ----
    def submit(self, req: Req) -> asyncio.Queue:
        q: asyncio.Queue = asyncio.Queue()
        self._watchers[req.rid] = q
        self._intake.put(req)
        self._wakeup.set()
        return q

    def abort(self, rid: str) -> bool:
        ok = self.engine.abort_request(rid)
        self._wakeup.set()
        return ok

    # ---- engine thread ----
    def _post(self, rid: str, event: Dict[str, Any]) -> None:
        q = self._watchers.get(rid)
        if q is None or self.loop is None:
            return
        self.loop.call_soon_threadsafe(q.put_nowait, event)

    def _flush_streams(self, finished) -> None:
        """Post pending deltas + completions to waiting asyncio handlers.
        Runs on the engine thread; idempotent for completions (a finished
        request's watcher is removed on first post, so the outer step loop
        re-flushing the same request is a no-op)."""
        for rid in list(self._watchers):
            delta = self.engine.pop_stream_delta(rid)
            if delta:
                self._post(rid, {"type": "delta", "text": delta})
        for req in finished:
            if req.rid not in self._watchers:
                continue
            out = self.engine._build_output(req)
            self._post(req.rid, {"type": "done", "output": out})
            self._watchers.pop(req.rid, None)

    def _run(self) -> None:
        logger.info("engine loop thread started")
        while not self._stop:
            moved = False
            while True:
                try:
                    req = self._intake.get_nowait()
                except queue.Empty:
                    break
                self.engine.scheduler.add_request(req)
                moved = True
            if not self.engine.scheduler.has_work():
                if not moved:
                    self._wakeup.wait(timeout=0.02)
                    self._wakeup.clear()
                continue
            try:
                finished = self.engine.step()
            except Exception as e:  # noqa: BLE001
                logger.exception("engine step failed")
                for rid in list(self._watchers):
                    self._post(rid, {"type": "error", "error": str(e)})
                continue
            self._flush_streams(finished)
        logger.info("engine loop thread stopped")
