"""Pluggable KV-sparsity framework: page-selection algorithms for
long-context decode.

Reference analog: srt/mem_cache/sparsity/ (factory.py + algorithms/
{quest_algorithm,deepseek_nsa}.py + core/sparse_coordinator.py). The
reference coordinates per-layer block selection over CUDA kernels; here
each algorithm is a pure function that scores logical pages from a small
set of landmark key slots read strided from the paged cache, and the
decode attention runs over only the top-k pages
(ops/attention_xla.py:sparse_paged_attention). HBM traffic per step is
O(k * page_size + P * n_landmarks) instead of O(context).

Algorithms (select with ``--attention-backend sparse[:algo][:k]``):

- ``landmark`` (default): each page scored by max q-dot against its
  landmark keys (NSA-style representative selection).
- ``quest``: Quest-style upper bound — an elementwise min/max key
  envelope is built over the landmark slots and each page is scored by
  ``sum_d max(q_d * min_d, q_d * max_d)``, an upper bound on any
  landmark's dot product (arXiv:2406.10774 applied to sampled slots).
- ``landmark_fp8``: landmark scoring over FP8-e4m3-quantized keys
  (NSA-style quantized index reads; ranking-only, halves score-pass HBM
  traffic).
- ``recency``: StreamingLLM-style sink + most-recent pages only (no
  content scoring; selection is position-based).

All algorithms force-include the sink page and the two most-recent
pages, and are EXACT whenever the sequence fits in k pages (the dense
fallback in sparse_paged_attention).
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

# landmark slot fractions within a page (0 = first key, 1/2 = midpoint…)
_LANDMARK_FRACS = (0.0, 0.5)


def _landmark_keys(kv_cache, layer_idx, page_table, page_size):
    """Strided landmark keys for every page: [B, Pp, R, Hkv, D]."""
    kc = jax.lax.dynamic_index_in_dim(kv_cache, layer_idx, 0,
                                      keepdims=False)  # [P, S, 2Hkv, D]
    reps = []
    for f in _LANDMARK_FRACS:
        s = min(int(f * page_size), page_size - 1)
        reps.append(jax.lax.slice_in_dim(kc, s, s + 1, axis=1))
    reps = jnp.concatenate(reps, axis=1)  # [P, R, 2Hkv, D]
    return reps[page_table][:, :, :, 0::2]  # [B, Pp, R, Hkv, D]


def score_landmark(q, kv_cache, layer_idx, page_table, page_size):
    """Max q-dot over landmark keys, summed over KV heads: [B, Pp]."""
    b, hq, d = q.shape[0], q.shape[2], q.shape[3]
    hkv = kv_cache.shape[3] // 2
    group = hq // hkv
    rep = _landmark_keys(kv_cache, layer_idx, page_table, page_size)
    qg = q[:, 0].reshape(b, hkv, group, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bprhd->bphgr", qg, rep.astype(jnp.float32))
    return s.max(axis=(3, 4)).sum(axis=2)


def score_quest(q, kv_cache, layer_idx, page_table, page_size):
    """Quest upper-bound score over the landmark envelope: [B, Pp]."""
    b, hq, d = q.shape[0], q.shape[2], q.shape[3]
    hkv = kv_cache.shape[3] // 2
    group = hq // hkv
    rep = _landmark_keys(kv_cache, layer_idx, page_table,
                         page_size).astype(jnp.float32)
    kmin = rep.min(axis=2)  # [B, Pp, Hkv, D]
    kmax = rep.max(axis=2)
    qg = q[:, 0].reshape(b, hkv, group, d).astype(jnp.float32)
    # elementwise bound: sum_d max(q_d*min_d, q_d*max_d)
    per_d = jnp.maximum(qg[:, None] * kmin[:, :, :, None],
                        qg[:, None] * kmax[:, :, :, None])
    ub = per_d.sum(axis=-1)  # [B, Pp, Hkv, G]
    return ub.max(axis=3).sum(axis=2)


def score_recency(q, kv_cache, layer_idx, page_table, page_size):
    """Pure positional score: newer pages rank higher (sink + recent
    window selection falls out of top-k + the force-include rule)."""
    b, pp = page_table.shape
    return jnp.broadcast_to(
        jnp.arange(pp, dtype=jnp.float32)[None, :], (b, pp))


def score_landmark_fp8(q, kv_cache, layer_idx, page_table, page_size):
    """Landmark scoring over FP8-e4m3-quantized landmark keys (NSA-style
    quantized index reads, srt/layers/attention/nsa/nsa_indexer.py's
    fp8 index cache: the index tolerates low-precision keys because only
    the page RANKING matters; HBM traffic for the score pass halves)."""
    b, hq, d = q.shape[0], q.shape[2], q.shape[3]
    hkv = kv_cache.shape[3] // 2
    group = hq // hkv
    rep = _landmark_keys(kv_cache, layer_idx, page_table, page_size)
    rep = rep.astype(jnp.float8_e4m3fn).astype(jnp.float32)
    qg = q[:, 0].reshape(b, hkv, group, d).astype(jnp.float32)
    s = jnp.einsum("bhgd,bprhd->bphgr", qg, rep)
    return s.max(axis=(3, 4)).sum(axis=2)


_ALGORITHMS: Dict[str, Callable] = {
    "landmark": score_landmark,
    "landmark_fp8": score_landmark_fp8,
    "quest": score_quest,
    "recency": score_recency,
}


def get_sparsity_algorithm(name: str) -> Callable:
    if name not in _ALGORITHMS:
        raise KeyError(
            f"unknown KV-sparsity algorithm {name!r}; "
            f"have {sorted(_ALGORITHMS)}")
    return _ALGORITHMS[name]


def register_sparsity_algorithm(name: str):
    def deco(fn):
        _ALGORITHMS[name] = fn
        return fn

    return deco


def parse_sparse_backend(spec: str):
    """'sparse', 'sparse:<k>', 'sparse:<algo>', 'sparse:<algo>:<k>'
    -> (algo_name, topk_pages)."""
    parts = spec.split(":")
    algo, topk = "landmark", 16
    for p in parts[1:]:
        if p.isdigit():
            topk = int(p)
        elif p:
            algo = p
    get_sparsity_algorithm(algo)  # validate early
    return algo, topk
