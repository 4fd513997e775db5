"""Prefix cache for hybrid linear-attention models (mamba/deltanet).

Reference analog: srt/mem_cache/mamba_radix_cache.py — plain radix reuse
is unsound for hybrid families because the recurrent (conv/SSM) state at
the prefix end cannot be reconstructed from cached KV pages, so earlier
rounds disabled the radix cache entirely and recomputed every prompt.

TPU-native design: EXACT-PREFIX entries with device-resident state
snapshots, chained like a degenerate radix path.

- On request finish, the request's linear state is snapshotted (device-
  to-device copy into a small snapshot pool — no host round trip) along
  with ALL its KV pages, including the partial tail page an aligned
  radix tree would discard; soundness never depends on page alignment
  because prefill resumes at the EXACT snapshot token count.
- A new entry whose prefix extends an existing entry becomes its CHILD:
  it owns only its tail pages and holds a lock on the ancestor chain, so
  multi-turn conversations build a ladder without page refcounts.
- Matching returns the longest stored strict prefix of the new prompt.
  Restoring locks the chain (the state slot is keyed by the shared first
  page id, so at most one running request may use a chain at a time) and
  copies the snapshot into the live state slot.
- LRU eviction frees leaf entries only (children lock ancestors).
"""

from __future__ import annotations

import time
from typing import List, Optional


class LinearStateCache:
    def __init__(self, runner, allocator, n_slots: int = 8):
        import jax
        import jax.numpy as jnp

        self.runner = runner
        self.allocator = allocator
        self.n_slots = n_slots
        kv = runner.kv_cache
        self._state_keys = [k for k in kv if k != "pages"]
        # snapshot pools mirror the per-request state pools with a small
        # slot axis: state pool [n_lin, n_req_slots, ...] ->
        # snap pool [n_lin, n_slots, ...]
        self.snaps = {
            k: jnp.zeros(
                kv[k].shape[:1] + (n_slots,) + kv[k].shape[2:], kv[k].dtype)
            for k in self._state_keys
        }
        self._free = list(range(n_slots))
        self.entries: List[dict] = []
        self.hits = 0
        self.misses = 0

        def _snap_one(snap_pool, state_pool, snap_idx, slot):
            return snap_pool.at[:, snap_idx].set(state_pool[:, slot])

        def _restore_one(state_pool, snap_pool, slot, snap_idx):
            return state_pool.at[:, slot].set(snap_pool[:, snap_idx])

        self._snap_one = jax.jit(_snap_one, donate_argnums=(0,))
        self._restore_one = jax.jit(_restore_one, donate_argnums=(0,))

    # ------------- chain helpers -------------
    @staticmethod
    def _chain(entry) -> List[dict]:
        out = []
        while entry is not None:
            out.append(entry)
            entry = entry["parent"]
        return out

    def _all_pages(self, entry) -> List[int]:
        pages: List[int] = []
        for e in reversed(self._chain(entry)):
            pages.extend(e["own_pages"])
        return pages

    # ------------- save -------------
    def save(self, req, parent: Optional[dict]) -> bool:
        """Snapshot req's state; the new entry owns req's pages beyond the
        parent chain. Returns True iff the entry was created (caller must
        then NOT free those pages)."""
        if not self._free or not req.pages or req.num_computed <= 0:
            return False
        if getattr(req, "state_dirty", False):
            return False  # decode overshoot advanced the state slot
        tokens = tuple(req.all_ids()[: req.num_computed])
        for e in self.entries:
            if e["tokens"] == tokens:
                e["last_used"] = time.monotonic()
                return False
        n_parent_pages = len(self._all_pages(parent)) if parent else 0
        own = list(req.pages[n_parent_pages:])
        slot = int(req.pages[0])
        snap = self._free.pop()
        for k in self._state_keys:
            self.snaps[k] = self._snap_one(
                self.snaps[k], self.runner.kv_cache[k], snap, slot)
        entry = {
            "tokens": tokens,
            "own_pages": own,
            "parent": parent,
            "snap": snap,
            "last_used": time.monotonic(),
            "locked": 0,
        }
        if parent is not None:
            # children pin ancestors (no page refcounts needed)
            for e in self._chain(parent):
                e["locked"] += 1
        self.entries.append(entry)
        return True

    # ------------- match / restore -------------
    def match(self, prompt_ids) -> Optional[dict]:
        """Longest UNLOCKED-chain entry that is a strict prefix of the
        prompt (exclusive: the live state slot is keyed by the chain's
        first page, so only one running request may attach)."""
        best = None
        pl = len(prompt_ids)
        for e in self.entries:
            n = len(e["tokens"])
            if n >= pl or tuple(prompt_ids[:n]) != e["tokens"]:
                continue
            # exclusivity is per ROOT: every chain sharing a root shares
            # the root's first page = the live state slot
            if self._chain(e)[-1].get("run_locked"):
                continue
            if best is None or n > len(best["tokens"]):
                best = e
        return best

    def restore(self, entry: dict, req) -> None:
        req.pages = self._all_pages(entry)
        req.num_computed = len(entry["tokens"])
        req.cached_prefix_len = req.num_computed
        slot = int(req.pages[0])
        for k in self._state_keys:
            self.runner.kv_cache[k] = self._restore_one(
                self.runner.kv_cache[k], self.snaps[k], slot, entry["snap"])
        for e in self._chain(entry):
            e["locked"] += 1
        self._chain(entry)[-1]["run_locked"] = True
        entry["last_used"] = time.monotonic()
        self.hits += 1

    def release(self, entry: dict) -> None:
        for e in self._chain(entry):
            e["locked"] = max(0, e["locked"] - 1)
        self._chain(entry)[-1]["run_locked"] = False

    # ------------- eviction -------------
    def evict(self, n_pages_needed: int) -> int:
        """LRU-evict unlocked leaf entries until enough pages freed."""
        freed = 0
        while freed < n_pages_needed:
            victims = [e for e in self.entries if not e["locked"]
                       and not e.get("run_locked")]
            if not victims:
                break
            v = min(victims, key=lambda e: e["last_used"])
            self.entries.remove(v)
            self.allocator.free(v["own_pages"])
            freed += len(v["own_pages"])
            self._free.append(v["snap"])
            if v["parent"] is not None:
                for e in self._chain(v["parent"]):
                    e["locked"] = max(0, e["locked"] - 1)
        return freed

    def held_pages(self) -> int:
        return sum(len(e["own_pages"]) for e in self.entries)

    def evictable_tokens(self) -> int:
        ps = self.allocator.page_size
        return sum(
            len(e["own_pages"]) * ps for e in self.entries
            if not e["locked"] and not e.get("run_locked"))
