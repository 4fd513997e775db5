"""Batched on-device sampler.

Reference analog: srt/layers/sampler.py:41 + sampling_batch_info.py. One jit
function handles the whole batch with per-request parameter arrays; greedy
requests are temperature==0 rows (selected with where, so a mixed batch
compiles to a single program — no host branching, matching the reference's
"batch invariant" requirement).

Top-k and top-p use one shared descending sort of the logits (sort once,
derive both masks), which XLA maps well to the TPU sort unit.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class SamplingMetadata(NamedTuple):
    temperature: jax.Array  # [B] f32; 0 = greedy
    top_p: jax.Array  # [B] f32
    top_k: jax.Array  # [B] i32; -1 = disabled
    min_p: jax.Array  # [B] f32
    frequency_penalty: jax.Array  # [B] f32
    presence_penalty: jax.Array  # [B] f32
    # output-token occurrence counts for penalties: [B, V] int32 (optional,
    # pass zeros when no penalties active)


def apply_penalties(
    logits: jax.Array,  # [B, V] f32
    output_counts: jax.Array,  # [B, V] i32
    freq_pen: jax.Array,  # [B]
    pres_pen: jax.Array,  # [B]
) -> jax.Array:
    logits = logits - freq_pen[:, None] * output_counts.astype(jnp.float32)
    logits = logits - pres_pen[:, None] * (output_counts > 0).astype(jnp.float32)
    return logits


def sample(
    logits: jax.Array,  # [B, V] f32
    meta: SamplingMetadata,
    key: jax.Array,
) -> Tuple[jax.Array, jax.Array]:
    """Returns (next_token [B] i32, logprob_of_token [B] f32)."""
    b, v = logits.shape
    greedy_tok = jnp.argmax(logits, axis=-1)

    temp = jnp.maximum(meta.temperature, 1e-6)[:, None]
    scaled = logits / temp

    # one sort serves top-k and top-p
    sorted_logits = jnp.sort(scaled, axis=-1)[:, ::-1]  # desc
    probs_sorted = jax.nn.softmax(sorted_logits, axis=-1)
    cumprobs = jnp.cumsum(probs_sorted, axis=-1)

    # top-k threshold: value of the k-th largest logit
    k = jnp.where(meta.top_k <= 0, v, meta.top_k)
    k = jnp.clip(k, 1, v)
    kth_val = jnp.take_along_axis(sorted_logits, (k - 1)[:, None], axis=-1)
    mask_topk = scaled >= kth_val

    # top-p: keep the smallest set of top tokens with cumprob >= top_p.
    # token at sorted rank r survives if cumprob before it < top_p
    ranks = jnp.argsort(jnp.argsort(-scaled, axis=-1), axis=-1)  # rank of each token
    cum_before = jnp.take_along_axis(
        jnp.concatenate([jnp.zeros((b, 1)), cumprobs[:, :-1]], axis=-1), ranks, axis=-1
    )
    mask_topp = cum_before < meta.top_p[:, None]

    # min-p: prob >= min_p * max_prob
    probs = jax.nn.softmax(scaled, axis=-1)
    max_prob = jnp.max(probs, axis=-1, keepdims=True)
    mask_minp = probs >= meta.min_p[:, None] * max_prob

    masked = jnp.where(mask_topk & mask_topp & mask_minp, scaled, -jnp.inf)
    sampled_tok = jax.random.categorical(key, masked, axis=-1)

    is_greedy = meta.temperature == 0.0
    next_tok = jnp.where(is_greedy, greedy_tok, sampled_tok).astype(jnp.int32)

    logprobs = jax.nn.log_softmax(logits, axis=-1)
    tok_logprob = jnp.take_along_axis(logprobs, next_tok[:, None], axis=-1)[:, 0]
    return next_tok, tok_logprob


def make_sampling_metadata(reqs, pad_to: int) -> SamplingMetadata:
    """Build batched arrays from a list of request SamplingParams (host)."""
    import numpy as np

    def arr(get, dtype, pad):
        a = np.full((pad_to,), pad, dtype)
        for i, r in enumerate(reqs):
            a[i] = get(r)
        return jnp.asarray(a)

    return SamplingMetadata(
        temperature=arr(lambda r: r.temperature, np.float32, 0.0),
        top_p=arr(lambda r: r.top_p, np.float32, 1.0),
        top_k=arr(lambda r: r.top_k, np.int32, -1),
        min_p=arr(lambda r: r.min_p, np.float32, 0.0),
        frequency_penalty=arr(lambda r: r.frequency_penalty, np.float32, 0.0),
        presence_penalty=arr(lambda r: r.presence_penalty, np.float32, 0.0),
    )
