"""Attention backend registry + metadata.

TPU-native analog of the reference's attention-backend registry
(srt/layers/attention/attention_registry.py:12-17) and RadixAttention layer
(srt/layers/radix_attention.py:47). Here a "backend" is just a paged-attention
function with a fixed signature; the model receives it as a static closure so
each backend compiles into the same jitted step.

Backends:
  "xla"    - pure-XLA gather+softmax reference (CPU tests / fallback)
  "pallas" - Pallas TPU kernels (ragged paged decode + flash prefill)
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.ops import attention_xla


class AttentionMetadata(NamedTuple):
    """Device-side batch metadata (analog of the reference's ForwardBatch,
    srt/model_executor/forward_batch_info.py:231 — but functional/pytree)."""

    page_table: jax.Array  # [B, pages_per_seq] int32
    kv_lens: jax.Array  # [B] total kv len incl. tokens written this step
    q_start_pos: jax.Array  # [B] absolute position of the first query token
    slot_ids: jax.Array  # [B, T] flat cache slots for new tokens (-1 pad)
    logit_idx: jax.Array  # [B] index in T of the token to produce logits for
    # speculative tree verify (reference: TARGET_VERIFY tree masks,
    # sgl-kernel speculative/eagle_utils.cu): [B, T, T] bool attendance for
    # the in-batch token region; None = plain causal. With a tree mask the
    # in-batch kv index j maps to slot row q_start + j (node-indexed), not
    # to a sequential position.
    tree_mask: Optional[jax.Array] = None


AttentionFn = Callable[..., jax.Array]

_BACKENDS = {}

# Trace-time hint: max valid pages per sequence in the current decode
# batch. The runner sets it and threads a matching STATIC arg through its
# jitted step so executables re-specialize when the bound changes (the
# global alone would not invalidate jit caches).
_DECODE_PAGES_HINT = [None]


def set_decode_pages_hint(n) -> None:
    _DECODE_PAGES_HINT[0] = n


def register_attention_backend(name: str):
    def deco(fn):
        _BACKENDS[name] = fn
        return fn

    return deco


def get_attention_backend(name: str) -> AttentionFn:
    if name == "auto":
        name = "pallas" if jax.default_backend() == "tpu" else "xla"
    if name.startswith("sparse"):
        # "sparse[:algo][:k]": top-k page-sparse decode (long-context
        # opt-in; reference analog: srt/mem_cache/sparsity/ framework).
        # Algorithm comes from the kv/sparsity.py registry (landmark /
        # quest / recency); prefill stays dense inside
        # sparse_paged_attention's trace-time branch.
        from sglang_diffusion_tpu.kv.sparsity import (
            get_sparsity_algorithm,
            parse_sparse_backend,
        )

        algo, topk = parse_sparse_backend(name)
        score_fn = get_sparsity_algorithm(algo)

        def _sparse_backend(q, kv_cache, layer_idx, meta: AttentionMetadata,
                            sm_scale: float, window=None, softcap=None,
                            sinks=None):
            return attention_xla.sparse_paged_attention(
                q, kv_cache, layer_idx, meta.page_table, meta.kv_lens,
                meta.q_start_pos, sm_scale, topk_pages=topk, window=window,
                softcap=softcap, tree_mask=meta.tree_mask, sinks=sinks,
                score_fn=score_fn,
            )

        return _sparse_backend
    if name.startswith("nsa"):
        # "nsa[:topk]": NSA-style top-k page-sparse PREFILL (reference:
        # srt/layers/attention/nsa_backend.py:85). Long prefill chunks
        # route through ops/nsa.nsa_sparse_prefill with q-block top-k page
        # selection; decode and special cases (windows, sinks, tree masks)
        # fall back to dense. At the backend boundary the selection score
        # is the landmark form (mean-pooled page keys against mean query
        # heads) — the LEARNED indexer + fp8 index-key cache live in
        # ops/nsa.py (index_scores/quantize_index_keys) for model-level
        # wiring, mirroring how the reference's Indexer is a DeepSeek-V3.2
        # model module, not a backend property.
        topk = int(name.split(":")[1]) if ":" in name else 16

        def _nsa_backend(q, kv_cache, layer_idx, meta: AttentionMetadata,
                         sm_scale: float, window=None, softcap=None,
                         sinks=None):
            t = q.shape[1]
            if (
                t < 1024
                or window is not None
                or softcap is not None
                or sinks is not None
                or meta.tree_mask is not None
            ):
                return _xla_backend(q, kv_cache, layer_idx, meta, sm_scale,
                                    window, softcap, sinks)
            from sglang_diffusion_tpu.ops.attention_xla import _gather_pages
            from sglang_diffusion_tpu.ops.nsa import nsa_sparse_prefill

            kp, vp = _gather_pages(kv_cache, layer_idx, meta.page_table)
            b, pp, s_pg, hkv, d = kp.shape
            k = kp.reshape(b, pp * s_pg, hkv, d)
            v = vp.reshape(b, pp * s_pg, hkv, d)
            # landmark page scores: mean query head x per-page mean key
            qm = q.mean(axis=2)  # [B, Tq, D]
            pk = kp.mean(axis=(2, 3))  # [B, PP, D]
            scores = jnp.einsum(
                "btd,bpd->btp", qm.astype(jnp.bfloat16),
                pk.astype(jnp.bfloat16)).astype(jnp.float32)
            return nsa_sparse_prefill(
                q, k, v, scores, sm_scale, page=s_pg, topk=topk,
                q_start=meta.q_start_pos, kv_len=meta.kv_lens,
            )

        return _nsa_backend
    if name not in _BACKENDS:
        raise KeyError(f"unknown attention backend {name}; have {list(_BACKENDS)}")
    return _BACKENDS[name]


@register_attention_backend("xla")
def _xla_backend(q, kv_cache, layer_idx, meta: AttentionMetadata, sm_scale: float,
                 window=None, softcap=None, sinks=None):
    return attention_xla.paged_attention(
        q, kv_cache, layer_idx, meta.page_table, meta.kv_lens,
        meta.q_start_pos, sm_scale, window=window, softcap=softcap,
        tree_mask=meta.tree_mask, sinks=sinks,
    )


def _pallas_backend_impl(q, kv_cache, layer_idx, meta: AttentionMetadata, sm_scale: float,
                         window=None, softcap=None, sinks=None):
    # Imported lazily to keep CPU-only environments working.
    from sglang_diffusion_tpu.ops import attention_pallas

    if (
        q.shape[-1] % 128 != 0
        or sinks is not None
        or meta.tree_mask is not None
        or (window is not None and not isinstance(window, int))
    ):
        # Mosaic requires 128-lane-aligned head_dim; attention sinks
        # (gpt-oss), speculative tree masks, and TRACED per-layer sliding
        # windows (gemma alternating layers) take the XLA path — the RPA
        # kernel needs a static window.
        return _xla_backend(q, kv_cache, layer_idx, meta, sm_scale, window,
                            softcap, sinks)
    return attention_pallas.paged_attention(
        q,
        kv_cache,
        layer_idx,
        meta.page_table,
        meta.kv_lens,
        meta.q_start_pos,
        sm_scale,
        interpret=jax.default_backend() != "tpu",
        window=window,
        softcap=softcap,
        kv_pages_hint=_DECODE_PAGES_HINT[0],
    )


register_attention_backend("pallas")(_pallas_backend_impl)


def make_sharded_attention(name: str, mesh) -> AttentionFn:
    """Wrap a backend for SPMD execution on a multi-device mesh.

    Attention is head-local, so TP needs no collectives: q is sharded on the
    head axis, the KV cache on its combined-head axis, the batch over dp —
    each (dp, tp) shard runs the kernel on its local rows/heads. The XLA
    backend partitions automatically under GSPMD; the Pallas kernel is
    opaque to GSPMD and must be placed with shard_map (reference contrast:
    per-rank NCCL process groups, srt/distributed/parallel_state.py)."""
    import functools

    from jax.sharding import PartitionSpec as P

    base = get_attention_backend(name)
    resolved_pallas = (
        name == "pallas" or (name == "auto" and jax.default_backend() == "tpu")
    )
    if mesh is None or mesh.size == 1 or not resolved_pallas:
        return base

    from jax import shard_map

    q_spec = P("dp", None, "tp", None)
    kv_spec = P(None, None, None, "tp", None)
    b_spec = P("dp")
    rep = P()

    def fn(q, kv_cache, layer_idx, meta: AttentionMetadata, sm_scale: float,
           window=None, softcap=None, sinks=None):
        # sinks [Hq] shard with the query heads (gpt-oss; zeros = unused —
        # traced uniformly so one executable serves both cases is NOT
        # possible: sinks change the softmax; keep the trace-time branch)
        use_sinks = sinks is not None
        sink_spec = P("tp") if use_sinks else rep

        @functools.partial(
            shard_map,
            mesh=mesh,
            in_specs=(q_spec, kv_spec, rep, P("dp", None), b_spec, b_spec,
                      rep, sink_spec),
            out_specs=q_spec,
            check_vma=False,
        )
        def inner(q_l, kv_l, li, pt, klens, qstart, win, snk):
            # slot_ids/logit_idx are not used by attention kernels; fill
            # with placeholders (shard_map operands must be explicit)
            local_meta = AttentionMetadata(
                page_table=pt,
                kv_lens=klens,
                q_start_pos=qstart,
                slot_ids=pt,
                logit_idx=klens,
            )
            return base(q_l, kv_l, li, local_meta, sm_scale, win, softcap,
                        snk if use_sinks else None)

        win = jnp.asarray(-1 if window is None else window, jnp.int32)
        snk = sinks if use_sinks else jnp.zeros((1,), jnp.float32)
        return inner(
            q, kv_cache, jnp.asarray(layer_idx, jnp.int32),
            meta.page_table, meta.kv_lens, meta.q_start_pos, win, snk,
        )

    return fn
