"""EAGLE speculative decoding (feature-conditioned draft head).

Reference analog: srt/speculative/eagle_worker.py:79 (draft :532,
verify :699) — a small transformer head that drafts next tokens from
(token embedding, target hidden feature) pairs, verified losslessly by the
target model (ForwardMode.TARGET_VERIFY / DRAFT_EXTEND,
srt/model_executor/forward_batch_info.py:74).

TPU-native re-design (not a port):
- The draft head is a 1-layer llama-style stack reusing the target family's
  `layer_body`, prefixed by `fc: [2E] -> [E]` over concat(embed(token),
  feature). It has its own paged KV cache with the SAME page table as the
  target request (1 layer vs the target's L => ~1/L extra HBM).
- One fused jitted call per scheduler round does both the reference's
  DRAFT_EXTEND (rebuild draft KV over newly-accepted positions using the
  target's true features) and the K-step chain draft (lax.scan with
  device-side feature feedback), instead of separate CUDA-graph replays.
- Greedy chain drafting (top-1 per step); acceptance is the scheduler's
  lossless greedy verify (sched/scheduler.py process_batch_result).

Position convention (matches the scheduler): target KV holds positions
0..c-1 where c = req.num_computed; the newest sampled token x_c is not yet
in target KV. Draft KV entry at position p is computed from
(embed(x_{p+1}), h_p) where h_p is the target feature at position p; the
draft output at position p predicts x_{p+2}.

Losslessness does not depend on draft-KV freshness: stale or garbage draft
entries (e.g. for radix-cache-shared pages) only lower acceptance, never
correctness.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.layers.attention import AttentionMetadata
from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.utils.common import get_logger, select_bucket

logger = get_logger("eagle")

EXT_BUCKETS = [16, 32, 64, 128, 256, 512, 1024, 2048, 4096, 8192]


class _ReqState:
    """Per-request host-side draft state."""

    __slots__ = ("ext_tokens", "ext_feats", "ext_pos0", "chain_token",
                 "chain_feat", "chain_pos", "valid")

    def __init__(self):
        self.ext_tokens: List[int] = []  # pending DRAFT_EXTEND tokens
        self.ext_feats: List[np.ndarray] = []  # paired target features [E]
        self.ext_pos0 = 0  # draft position of ext_tokens[0]
        self.chain_token = 0  # newest sampled token x_c
        self.chain_feat: Optional[np.ndarray] = None  # h_{c-1}
        self.chain_pos = 0  # c - 1
        self.valid = False


def init_draft_params(rng, cfg, dtype=jnp.bfloat16):
    """Random-init EAGLE head params (tests / no-checkpoint runs)."""
    import dataclasses

    from sglang_diffusion_tpu.models.llama import LlamaFamily

    one_layer = dataclasses.replace(cfg, num_hidden_layers=1)
    full = LlamaFamily.init_params(rng, one_layer, dtype)
    E = cfg.hidden_size
    scale = 1.0 / np.sqrt(2 * E)
    fc = (jax.random.normal(rng, (2 * E, E), jnp.float32) * scale).astype(dtype)
    return {"fc": fc, "layers": full["layers"],
            "final_norm": jnp.ones((E,), dtype)}


def load_draft_params(path: str, cfg, dtype=jnp.bfloat16):
    """Load an EAGLE head checkpoint (HF layout: fc.weight +
    model.layers.0.* / layers.0.*; reference loads these via the standard
    model loader, srt/speculative/eagle_worker.py)."""
    import json
    import os

    from safetensors import safe_open

    files = [f for f in os.listdir(path) if f.endswith(".safetensors")]
    tensors = {}
    for f in files:
        with safe_open(os.path.join(path, f), framework="np") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)

    def get(*names):
        for n in names:
            if n in tensors:
                return tensors[n]
        return None

    params = init_draft_params(jax.random.PRNGKey(0), cfg, dtype)
    fc = get("fc.weight", "model.fc.weight")
    if fc is not None:
        params["fc"] = jnp.asarray(fc.T, dtype)
    name_map = {
        "input_norm": ("input_layernorm.weight", None),
        "post_norm": ("post_attention_layernorm.weight", None),
        "wq": ("self_attn.q_proj.weight", "t"),
        "wk": ("self_attn.k_proj.weight", "t"),
        "wv": ("self_attn.v_proj.weight", "t"),
        "wo": ("self_attn.o_proj.weight", "t"),
        "w_gate": ("mlp.gate_proj.weight", "t"),
        "w_up": ("mlp.up_proj.weight", "t"),
        "w_down": ("mlp.down_proj.weight", "t"),
    }
    for ours, (hf, tr) in name_map.items():
        t = get(f"model.layers.0.{hf}", f"layers.0.{hf}")
        if t is None:
            continue
        if tr == "t":
            t = t.T
        params["layers"][ours] = jnp.asarray(t, dtype)[None]
    return params


class EagleDrafter:
    """Batched device-side drafter; plugs into the scheduler's verify path
    through propose_all / on_prefill_chunk / on_verify / drop hooks."""

    captures_hidden = True  # scheduler runs verify even with 0 drafts

    def __init__(self, runner, k: int = 4, draft_path: Optional[str] = None,
                 topk: int = 1):
        if not getattr(runner.model_cls, "supports_eagle", False):
            raise ValueError(
                f"EAGLE draft head not supported for "
                f"{runner.cfg.architecture} (needs hidden-feature modes)"
            )
        self.runner = runner
        self.k = k
        # tree drafting: first draft step keeps the top-`topk` candidates;
        # the chain continues from top-1, the alternates become single-node
        # sibling branches in the verify tree (reference analog: EAGLE tree
        # drafts, srt/speculative/eagle_worker.py draft trees)
        self.topk = max(1, topk)
        self.cfg = runner.cfg
        self.page_size = runner.args.page_size
        self.state: Dict[str, _ReqState] = {}
        if draft_path:
            self.draft_params = load_draft_params(draft_path, self.cfg)
        else:
            self.draft_params = init_draft_params(
                jax.random.PRNGKey(runner.args.random_seed + 1), self.cfg
            )
        # draft KV: one layer, same page geometry as the target pool
        tgt = runner.kv_cache
        self.draft_kv = jnp.zeros((1,) + tgt.shape[1:], tgt.dtype)
        self._draft_fn = None
        self.last_alts: Dict[str, List[int]] = {}
        self._embed_scale = float(np.sqrt(self.cfg.hidden_size)) \
            if self.cfg.gemma_style else 1.0

    # ---------------- compiled draft step ----------------
    def closures(self):
        """Reusable pieces for the draft head: (fuse, head_logits,
        layer_body). Shared by the per-round draft_fn and the fused
        multi-round spec step (spec/fused_eagle.py)."""
        import dataclasses

        from sglang_diffusion_tpu.models.llama import LlamaFamily

        cfg1 = dataclasses.replace(self.cfg, num_hidden_layers=1)
        layer_body = LlamaFamily.make_layer_body(cfg1, self.runner._attn_fn)
        eps = self.cfg.rms_norm_eps
        tie = self.cfg.tie_word_embeddings

        def embed(tparams, toks):
            return jnp.take(tparams["embed"], toks, axis=0)

        # MTP/NextN flavor (spec/mtp.py): embed and hidden are each
        # RMS-normed before the 2E->E projection (DeepSeek-V3 MTP,
        # reference srt/models/deepseek_nextn.py); plain EAGLE fuses raw
        mtp = "enorm" in self.draft_params

        def fuse(tparams, dparams, toks, feats):
            e = embed(tparams, toks)
            if mtp:
                e = rms_norm(e, dparams["enorm"], eps)
                feats = rms_norm(feats, dparams["hnorm"], eps)
            return jnp.dot(
                jnp.concatenate([e, feats.astype(e.dtype)], axis=-1),
                dparams["fc"],
            )

        def head_logits(tparams, dparams, g):  # g [B, E] -> logits f32
            from sglang_diffusion_tpu.quant.quantize import (
                dense_maybe_quantized,
            )

            g = rms_norm(g, dparams["final_norm"], eps)
            if tie:
                return jnp.dot(g, tparams["embed"].T,
                               preferred_element_type=jnp.float32)
            # lm_head may be a quantized leaf (shared with the target)
            return dense_maybe_quantized(g, tparams["lm_head"])

        return fuse, head_logits, layer_body

    def _build(self):
        fuse, head_logits, layer_body = self.closures()
        k_steps = self.k

        def head(tparams, dparams, g):  # g [B, E] -> token ids [B]
            return jnp.argmax(
                head_logits(tparams, dparams, g), axis=-1
            ).astype(jnp.int32)

        n_alt = self.topk  # top-k ids returned for the FIRST chain step

        def draft_fn(tparams, dparams, draft_kv,
                     ext_tokens, ext_feats, ext_pos, ext_slots, ext_kv_lens,
                     ext_qstart, page_table,
                     chain_tok, chain_feat, chain_pos, chain_slots):
            # ---- DRAFT_EXTEND: rebuild draft KV over accepted positions ----
            meta = AttentionMetadata(
                page_table=page_table,
                kv_lens=jnp.maximum(ext_kv_lens, 1),
                q_start_pos=ext_qstart,
                slot_ids=ext_slots,
                logit_idx=jnp.zeros_like(ext_kv_lens),
            )
            h = fuse(tparams, dparams, ext_tokens, ext_feats)
            _, draft_kv = layer_body(
                0, h, draft_kv, dparams["layers"], ext_pos, meta
            )

            # ---- K-step chain draft (feature feedback on device) ----
            def chain_step(tok, feat, draft_kv, j):
                pos = chain_pos + j
                meta = AttentionMetadata(
                    page_table=page_table,
                    kv_lens=pos + 1,
                    q_start_pos=pos,
                    slot_ids=chain_slots[:, j][:, None],
                    logit_idx=jnp.zeros_like(pos),
                )
                h = fuse(tparams, dparams, tok[:, None], feat[:, None])
                g, draft_kv = layer_body(
                    0, h, draft_kv, dparams["layers"], pos[:, None], meta
                )
                return g[:, 0], draft_kv

            # first step separately: keep the top-n_alt candidate ids for
            # the verify tree (chain continues from top-1)
            g0, draft_kv = chain_step(chain_tok, chain_feat, draft_kv, 0)
            logits0 = head_logits(tparams, dparams, g0)
            _, top_ids = jax.lax.top_k(logits0, n_alt)
            first = top_ids[:, 0].astype(jnp.int32)

            def body(carry, j):
                tok, feat, draft_kv = carry
                g, draft_kv = chain_step(tok, feat, draft_kv, j)
                nxt = head(tparams, dparams, g)
                return (nxt, g.astype(feat.dtype), draft_kv), nxt

            (_, _, draft_kv), rest = jax.lax.scan(
                body,
                (first, g0.astype(chain_feat.dtype), draft_kv),
                jnp.arange(1, k_steps),
            )
            drafts = jnp.concatenate([first[None], rest], axis=0)  # [K, B]
            return drafts.T, top_ids.astype(jnp.int32), draft_kv

        if self.runner.args.disable_jit:
            return draft_fn
        return jax.jit(draft_fn, donate_argnums=(2,))

    # ---------------- scheduler hooks ----------------
    def _st(self, rid: str) -> _ReqState:
        st = self.state.get(rid)
        if st is None:
            st = self.state[rid] = _ReqState()
        return st

    def drop(self, rid: str) -> None:
        """Request finished/aborted/retracted: forget draft state."""
        self.state.pop(rid, None)

    def on_prefill_chunk(self, req, q_start: int, take: int,
                         hidden_row: np.ndarray,
                         sampled_tok: Optional[int]) -> None:
        """Collect (token, feature) pairs from a prefill chunk.

        hidden_row: [take, E] target features at positions q_start..+take-1.
        sampled_tok: the sampled next token if this chunk finished the
        prompt (plan.sample_mask), else None (chunked prefill continues)."""
        st = self._st(req.rid)
        if not st.ext_tokens:
            st.ext_pos0 = q_start
        fill = req.all_ids()
        end = q_start + take
        if sampled_tok is None:
            # pairs (x_{p+1}, h_p) for p in [q_start, end-1]; x_{p+1} comes
            # from the not-yet-computed prompt remainder
            for p in range(q_start, end):
                if p + 1 >= len(fill):
                    break
                st.ext_tokens.append(int(fill[p + 1]))
                st.ext_feats.append(hidden_row[p - q_start])
        else:
            for p in range(q_start, end - 1):
                st.ext_tokens.append(int(fill[p + 1]))
                st.ext_feats.append(hidden_row[p - q_start])
            st.chain_token = int(sampled_tok)
            st.chain_feat = hidden_row[take - 1]
            st.chain_pos = end - 1
            st.valid = True

    def on_verify(self, req, token_ids_row: np.ndarray, acc: int,
                  bonus_tok: int, hidden_row: np.ndarray,
                  pos0: int) -> None:
        """After lossless acceptance: true features for accepted positions.

        token_ids_row: the verify row [x_c, d_1..d_m]; acc: accepted draft
        count; bonus_tok: the correction/bonus token; hidden_row: [Tv, E]
        features at positions pos0..; pos0 = c (the verify q_start)."""
        st = self._st(req.rid)
        if not st.ext_tokens:
            st.ext_pos0 = pos0
        # DRAFT_EXTEND pairs at positions c..c+acc-1
        for j in range(acc):
            st.ext_tokens.append(int(token_ids_row[j + 1]))
            st.ext_feats.append(hidden_row[j])
        st.chain_token = int(bonus_tok)
        st.chain_feat = hidden_row[acc]
        st.chain_pos = pos0 + acc
        st.valid = True

    # ---------------- drafting ----------------
    def propose_all(self, reqs) -> List[List[int]]:
        """One fused device call: DRAFT_EXTEND for all pending pairs + K-step
        chain draft for every request with valid state."""
        if self._draft_fn is None:
            self._draft_fn = self._build()
        b = len(reqs)
        bb = select_bucket(self.runner.bs_buckets, b)
        E = self.cfg.hidden_size
        k = self.k
        states = [self._st(r.rid) for r in reqs]
        max_ext = max((len(s.ext_tokens) for s in states), default=0)
        te = select_bucket(EXT_BUCKETS, max(1, max_ext))
        feat_dt = np.dtype(jnp.bfloat16.dtype)

        ext_tokens = np.zeros((bb, te), np.int32)
        ext_feats = np.zeros((bb, te, E), feat_dt)
        ext_pos = np.zeros((bb, te), np.int32)
        ext_slots = np.full((bb, te), -1, np.int32)
        ext_kv_lens = np.zeros((bb,), np.int32)
        ext_qstart = np.zeros((bb,), np.int32)
        page_table = np.zeros(
            (bb, self.runner.max_pages_per_seq), np.int32
        )
        chain_tok = np.zeros((bb,), np.int32)
        chain_feat = np.zeros((bb, E), feat_dt)
        chain_pos = np.zeros((bb,), np.int32)
        chain_slots = np.full((k, bb), -1, np.int32)
        active = np.zeros((b,), bool)

        for i, (req, st) in enumerate(zip(reqs, states)):
            if not st.valid:
                st.ext_tokens.clear()
                st.ext_feats.clear()
                continue
            pv = np.asarray(req.pages, np.int32)
            page_table[i, : len(pv)] = pv
            m = len(st.ext_tokens)
            if m > te:  # over-long extend (shouldn't happen); drop oldest
                st.ext_tokens = st.ext_tokens[-te:]
                st.ext_feats = st.ext_feats[-te:]
                st.ext_pos0 += m - te
                m = te
            if m:
                ext_tokens[i, :m] = st.ext_tokens
                ext_feats[i, :m] = np.stack(st.ext_feats)
                p = np.arange(st.ext_pos0, st.ext_pos0 + m)
                ext_pos[i, :m] = p
                ext_slots[i, :m] = (
                    pv[p // self.page_size] * self.page_size
                    + p % self.page_size
                )
                ext_kv_lens[i] = st.ext_pos0 + m
                ext_qstart[i] = st.ext_pos0
            cap = max(0, req.remaining_new_tokens() - 1)
            if cap <= 0:
                st.ext_tokens.clear()
                st.ext_feats.clear()
                continue
            chain_tok[i] = st.chain_token
            chain_feat[i] = st.chain_feat
            chain_pos[i] = st.chain_pos
            cp = np.arange(st.chain_pos, st.chain_pos + k)
            # pages cover target tokens through num_computed + k + 1
            # (_retract_if_needed ran first), and chain positions are
            # c-1..c+k-2 — always in range
            chain_slots[:, i] = (
                pv[cp // self.page_size] * self.page_size
                + cp % self.page_size
            )
            active[i] = True
            st.ext_tokens.clear()
            st.ext_feats.clear()

        if not active.any() and max_ext == 0:
            return [[] for _ in reqs]

        # chain slots order: draft_fn takes [B, K]
        drafts_dev, alts_dev, self.draft_kv = self._draft_fn(
            self.runner.params, self.draft_params, self.draft_kv,
            jnp.asarray(ext_tokens), jnp.asarray(ext_feats),
            jnp.asarray(ext_pos), jnp.asarray(ext_slots),
            jnp.asarray(ext_kv_lens), jnp.asarray(ext_qstart),
            jnp.asarray(page_table),
            jnp.asarray(chain_tok), jnp.asarray(chain_feat),
            jnp.asarray(chain_pos), jnp.asarray(chain_slots.T),
        )
        drafts, alts = jax.device_get((drafts_dev, alts_dev))
        drafts, alts = np.asarray(drafts), np.asarray(alts)
        out: List[List[int]] = []
        self.last_alts = {}
        for i, req in enumerate(reqs):
            if not active[i]:
                out.append([])
                continue
            cap = max(0, req.remaining_new_tokens() - 1)
            chain = [int(t) for t in drafts[i, : min(k, cap)]]
            out.append(chain)
            if self.topk > 1 and chain:
                # alternates to the first chain token (dedup vs chain[0])
                self.last_alts[req.rid] = [
                    int(t) for t in alts[i, 1:] if int(t) != chain[0]
                ]
        return out
