"""Text encoder for diffusion conditioning.

Reference analog: multimodal_gen/runtime/models/encoders/ (T5, CLIP, llama,
qwen2.5vl...). Round 1: a compact bidirectional transformer encoder
(CLIP-lite) usable with random weights for tests; real checkpoint import
rides the LLM weight loader when model-family pipelines land.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.ops.norms import rms_norm


@dataclass
class TextEncoderConfig:
    vocab_size: int = 512
    hidden_size: int = 256
    num_layers: int = 2
    num_heads: int = 4
    max_len: int = 77


class TextEncoder:
    @staticmethod
    def init_params(rng, cfg: TextEncoderConfig, dtype=jnp.float32):
        E = cfg.hidden_size
        L = cfg.num_layers
        ks = jax.random.split(rng, 8)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        return {
            "embed": init(ks[0], (cfg.vocab_size, E)),
            "pos": init(ks[1], (cfg.max_len, E)),
            "blocks": {
                "n1": jnp.ones((L, E), dtype),
                "wqkv": init(ks[2], (L, E, 3 * E)),
                "wo": init(ks[3], (L, E, E)),
                "n2": jnp.ones((L, E), dtype),
                "w_up": init(ks[4], (L, E, 4 * E)),
                "w_down": init(ks[5], (L, 4 * E, E)),
            },
            "final_norm": jnp.ones((E,), dtype),
        }

    @staticmethod
    def apply(params, token_ids: jax.Array, cfg: TextEncoderConfig):
        """[B, T] -> (embeddings [B, T, E], pooled [B, E]).

        Bidirectional self-attention with padding tokens included (callers
        pad with a dedicated pad id; masks can be added when a real
        checkpoint needs them)."""
        b, t = token_ids.shape
        H = cfg.num_heads
        E = cfg.hidden_size
        D = E // H
        x = jnp.take(params["embed"], token_ids, axis=0) + params["pos"][None, :t]

        def body(x, bp):
            h = rms_norm(x, bp["n1"], 1e-6)
            qkv = jnp.dot(h, bp["wqkv"]).reshape(b, t, 3, H, D)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
            s = jnp.einsum(
                "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
            ) / np.sqrt(D)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
            x = x + jnp.dot(o.reshape(b, t, E).astype(x.dtype), bp["wo"])
            h = rms_norm(x, bp["n2"], 1e-6)
            x = x + jnp.dot(jax.nn.gelu(jnp.dot(h, bp["w_up"])), bp["w_down"])
            return x, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        x = rms_norm(x, params["final_norm"], 1e-6)
        pooled = x.mean(axis=1)
        return x, pooled
