"""Standalone draft-model speculative decoding.

Reference analog: the standalone-draft path of srt/speculative/ (a small
causal LM proposes k tokens; the target verifies) — unlike EAGLE, the
drafter is a complete model conditioned only on tokens, so any small
checkpoint works without feature distillation.

TPU design mirrors spec/eagle.py: the draft model keeps its OWN paged KV
pool sharing the request's page ids (same page-table indexing as the
target pool, different head geometry), a fused jitted call re-extends the
draft KV over tokens accepted since the last round and then chain-drafts k
tokens with device-side argmax feedback.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.models.registry import get_model_cls
from sglang_diffusion_tpu.utils.common import select_bucket

EXT_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


class _ReqState:
    __slots__ = ("ext_tokens", "ext_pos0", "chain_token", "chain_pos", "valid")

    def __init__(self):
        self.ext_tokens: List[int] = []
        self.ext_pos0 = 0
        self.chain_token = 0
        self.chain_pos = 0
        self.valid = False


class DraftModelDrafter:
    """Plugs into the scheduler exactly like NgramDrafter (propose_all) with
    the EAGLE-style bookkeeping hooks (captures_hidden=False: the scheduler
    feeds tokens, not features)."""

    captures_hidden = False

    def __init__(self, runner, draft_cfg: ModelConfig, k: int = 4,
                 draft_params=None):
        self.runner = runner
        self.k = k
        self.cfg = draft_cfg
        self.page_size = runner.args.page_size
        self.state: Dict[str, _ReqState] = {}
        model_cls = get_model_cls(draft_cfg.architecture)
        if draft_params is None:
            draft_params = model_cls.init_params(
                jax.random.PRNGKey(runner.args.random_seed + 2), draft_cfg
            )
        self.params = draft_params
        self._fwd = model_cls.make_forward(draft_cfg, runner._attn_fn)
        tgt = runner.kv_cache
        self.kv = jnp.zeros(
            (draft_cfg.num_hidden_layers, tgt.shape[1],
             2 * draft_cfg.num_key_value_heads, tgt.shape[3],
             draft_cfg.actual_head_dim),
            tgt.dtype,
        )
        self._jit = None

    # ---------------- compiled step ----------------
    def _build(self):
        fwd = self._fwd
        k_steps = self.k

        def draft_fn(params, kv, ext_tokens, ext_pos, ext_slots, ext_kv_lens,
                     ext_qstart, page_table, chain_tok, chain_pos,
                     chain_slots):
            # re-extend the draft KV over tokens accepted since last round
            meta = AttentionMetadata(
                page_table=page_table,
                kv_lens=jnp.maximum(ext_kv_lens, 1),
                q_start_pos=ext_qstart,
                slot_ids=ext_slots,
                logit_idx=jnp.zeros_like(ext_kv_lens),
            )
            _, kv = fwd(params, ext_tokens, ext_pos, kv, meta)

            def body(carry, j):
                tok, kv = carry
                pos = chain_pos + j
                meta = AttentionMetadata(
                    page_table=page_table,
                    kv_lens=pos + 1,
                    q_start_pos=pos,
                    slot_ids=chain_slots[:, j][:, None],
                    logit_idx=jnp.zeros_like(pos),
                )
                logits, kv = fwd(params, tok[:, None], pos[:, None], kv, meta)
                nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                return (nxt, kv), nxt

            (_, kv), drafts = jax.lax.scan(
                body, (chain_tok, kv), jnp.arange(k_steps)
            )
            return drafts.T, kv  # [B, K]

        if self.runner.args.disable_jit:
            return draft_fn
        return jax.jit(draft_fn, donate_argnums=(1,))

    # ---------------- scheduler hooks ----------------
    def _st(self, rid: str) -> _ReqState:
        st = self.state.get(rid)
        if st is None:
            st = self.state[rid] = _ReqState()
        return st

    def drop(self, rid: str) -> None:
        self.state.pop(rid, None)

    def observe(self, req) -> None:
        """Track the token stream: anything past the drafter's watermark is
        pending draft-KV extension (called from propose_all)."""
        st = self._st(req.rid)
        hist = req.all_ids()
        done = st.ext_pos0 + len(st.ext_tokens) if st.valid else 0
        if not st.valid:
            st.ext_pos0 = 0
            st.ext_tokens = []
        # pending = tokens [done, total-1): the LAST token seeds the chain
        if len(hist) - 1 > done:
            st.ext_tokens.extend(int(t) for t in hist[done : len(hist) - 1])
        st.chain_token = int(hist[-1])
        st.chain_pos = len(hist) - 1
        st.valid = True

    def propose_all(self, reqs) -> List[List[int]]:
        if self._jit is None:
            self._jit = self._build()
        b = len(reqs)
        bb = select_bucket(self.runner.bs_buckets, b)
        k = self.k
        for r in reqs:
            self.observe(r)
        states = [self._st(r.rid) for r in reqs]
        max_ext = max((len(s.ext_tokens) for s in states), default=0)
        te = select_bucket(EXT_BUCKETS, max(1, max_ext))

        ext_tokens = np.zeros((bb, te), np.int32)
        ext_pos = np.zeros((bb, te), np.int32)
        ext_slots = np.full((bb, te), -1, np.int32)
        ext_kv_lens = np.zeros((bb,), np.int32)
        ext_qstart = np.zeros((bb,), np.int32)
        page_table = np.zeros((bb, self.runner.max_pages_per_seq), np.int32)
        chain_tok = np.zeros((bb,), np.int32)
        chain_pos = np.zeros((bb,), np.int32)
        chain_slots = np.full((bb, k), -1, np.int32)
        active = np.zeros((b,), bool)

        for i, (req, st) in enumerate(zip(reqs, states)):
            cap = max(0, req.remaining_new_tokens() - 1)
            if cap <= 0:
                continue
            pv = np.asarray(req.pages, np.int32)
            page_table[i, : len(pv)] = pv
            m = len(st.ext_tokens)
            if m > te:
                # shouldn't happen (buckets cover context); resync next round
                st.valid = False
                continue
            if m:
                p = np.arange(st.ext_pos0, st.ext_pos0 + m)
                ext_tokens[i, :m] = st.ext_tokens
                ext_pos[i, :m] = p
                ext_slots[i, :m] = (
                    pv[p // self.page_size] * self.page_size
                    + p % self.page_size
                )
                ext_kv_lens[i] = st.ext_pos0 + m
                ext_qstart[i] = st.ext_pos0
            cp = np.arange(st.chain_pos, st.chain_pos + k)
            chain_slots[i] = (
                pv[cp // self.page_size] * self.page_size
                + cp % self.page_size
            )
            chain_tok[i] = st.chain_token
            chain_pos[i] = st.chain_pos
            active[i] = True
            st.ext_pos0 += m
            st.ext_tokens = []

        if not active.any():
            return [[] for _ in reqs]
        drafts_dev, self.kv = self._jit(
            self.params, self.kv,
            jnp.asarray(ext_tokens), jnp.asarray(ext_pos),
            jnp.asarray(ext_slots), jnp.asarray(ext_kv_lens),
            jnp.asarray(ext_qstart), jnp.asarray(page_table),
            jnp.asarray(chain_tok), jnp.asarray(chain_pos),
            jnp.asarray(chain_slots),
        )
        drafts = np.asarray(jax.device_get(drafts_dev))
        out: List[List[int]] = []
        for i, req in enumerate(reqs):
            if not active[i]:
                out.append([])
                continue
            cap = max(0, req.remaining_new_tokens() - 1)
            out.append([int(t) for t in drafts[i, : min(k, cap)]])
        return out
