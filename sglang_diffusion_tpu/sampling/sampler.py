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
    # per-request sampling seed; -1 = use the engine's global stream
    # (reference analog: deterministic sampling seeds)
    seeds: Optional[jax.Array] = None  # [B] i32
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


# candidate-set size for non-greedy sampling: top-k/top-p/min-p are applied
# within the top MAX_CANDIDATES logits (full-vocab sorts are pathologically
# slow on TPU; vocab mass outside the top-256 is irrelevant for any sane
# temperature — same trick as the reference's flashinfer sampling path)
MAX_CANDIDATES = 256


def sample(
    logits: jax.Array,  # [B, V] f32
    meta: SamplingMetadata,
    key: jax.Array,
    all_greedy: bool = False,
    output_counts: Optional[jax.Array] = None,  # [B, V] i32 for penalties
    vocab_mask: Optional[jax.Array] = None,  # [B, V] bool, False = forbidden
    nonce: Optional[jax.Array] = None,  # [B] i32 token position (seeded path)
) -> Tuple[jax.Array, jax.Array]:
    """Returns (next_token [B] i32, logprob_of_token [B] f32).

    `all_greedy` is a static (trace-time) flag: when the whole batch is
    greedy the compiled step contains only an argmax — no sort, no RNG
    (reference analog: Sampler's is_all_greedy fast path, sampler.py:41)."""
    b, v = logits.shape
    if vocab_mask is not None:
        # constrained decoding (analog of apply_token_bitmask, sgl-kernel)
        logits = jnp.where(vocab_mask, logits, -jnp.inf)
    if output_counts is not None:
        logits = apply_penalties(
            logits, output_counts, meta.frequency_penalty, meta.presence_penalty
        )
    logprobs = jax.nn.log_softmax(logits, axis=-1)
    greedy_tok = jnp.argmax(logits, axis=-1).astype(jnp.int32)
    if all_greedy:
        tok_logprob = jnp.take_along_axis(logprobs, greedy_tok[:, None], axis=-1)[:, 0]
        return greedy_tok, tok_logprob

    temp = jnp.maximum(meta.temperature, 1e-6)[:, None]
    scaled = logits / temp

    c = min(MAX_CANDIDATES, v)
    top_vals, top_idx = jax.lax.top_k(scaled, c)  # [B, c] descending

    probs = jax.nn.softmax(top_vals, axis=-1)
    cumprobs = jnp.cumsum(probs, axis=-1)

    ranks = jnp.arange(c)[None, :]
    k = jnp.where(meta.top_k <= 0, c, jnp.minimum(meta.top_k, c))
    mask_topk = ranks < k[:, None]
    # top-p: keep the smallest prefix with cumprob >= top_p
    cum_before = jnp.concatenate([jnp.zeros((b, 1)), cumprobs[:, :-1]], axis=-1)
    mask_topp = cum_before < meta.top_p[:, None]
    # min-p: prob >= min_p * max_prob (max_prob = first candidate)
    mask_minp = probs >= meta.min_p[:, None] * probs[:, 0:1]

    masked = jnp.where(mask_topk & mask_topp & mask_minp, top_vals, -jnp.inf)
    if meta.seeds is not None and nonce is not None:
        # per-request seeded sampling: the gumbel noise depends only on
        # (seed, token position) — reproducible across batch compositions
        def row_key(seed, n):
            return jax.random.fold_in(jax.random.PRNGKey(seed), n)

        row_keys = jax.vmap(row_key)(jnp.maximum(meta.seeds, 0), nonce)
        seeded_u = jax.vmap(
            lambda k_, n_: jax.random.uniform(k_, (c,), minval=1e-10, maxval=1.0)
        )(row_keys, nonce)
        gumbel_seeded = -jnp.log(-jnp.log(seeded_u))
        global_u = jax.random.uniform(key, (b, c), minval=1e-10, maxval=1.0)
        gumbel_global = -jnp.log(-jnp.log(global_u))
        gumbel = jnp.where(
            (meta.seeds >= 0)[:, None], gumbel_seeded, gumbel_global
        )
        choice = jnp.argmax(masked + gumbel, axis=-1)
    else:
        choice = jax.random.categorical(key, masked, axis=-1)  # [B] in [0, c)
    sampled_tok = jnp.take_along_axis(top_idx, choice[:, None], axis=-1)[:, 0]

    is_greedy = meta.temperature == 0.0
    next_tok = jnp.where(is_greedy, greedy_tok, sampled_tok).astype(jnp.int32)
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
