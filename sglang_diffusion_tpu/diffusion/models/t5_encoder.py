"""T5/UMT5 text encoder (the conditioning encoder for Wan-family video
models and other diffusion pipelines).

Reference analog: multimodal_gen/runtime/models/encoders/t5.py. Functional
JAX port of the T5 encoder semantics:
- T5LayerNorm: RMS scale only (no mean subtraction, no bias)
- attention WITHOUT 1/sqrt(d) scaling; learned relative-position bias added
  to the logits (shared across layers for T5, per-layer for UMT5)
- gated-GELU FFN (t5-v1.1/umt5) or ReLU FFN (legacy t5)
- padding mask from token ids == pad_id
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class T5Config:
    vocab_size: int = 32128
    d_model: int = 512
    d_kv: int = 64
    d_ff: int = 1024
    num_layers: int = 6
    num_heads: int = 8
    rel_buckets: int = 32
    rel_max_distance: int = 128
    layer_norm_eps: float = 1e-6
    gated_act: bool = True  # t5-v1.1 / umt5 gated gelu
    per_layer_rel_bias: bool = False  # True for UMT5
    pad_id: int = 0
    max_len: int = 512

    @classmethod
    def from_hf(cls, cfg: Dict[str, Any]) -> "T5Config":
        return cls(
            vocab_size=cfg["vocab_size"],
            d_model=cfg["d_model"],
            d_kv=cfg["d_kv"],
            d_ff=cfg["d_ff"],
            num_layers=cfg["num_layers"],
            num_heads=cfg["num_heads"],
            rel_buckets=cfg.get("relative_attention_num_buckets", 32),
            rel_max_distance=cfg.get("relative_attention_max_distance", 128),
            gated_act="gated" in cfg.get("feed_forward_proj", "gated-gelu"),
            per_layer_rel_bias=cfg.get("model_type") == "umt5",
            pad_id=cfg.get("pad_token_id", 0),
        )


def relative_position_bucket(rel_pos: np.ndarray, num_buckets: int,
                             max_distance: int) -> np.ndarray:
    """Bidirectional T5 bucketing (HF T5Attention._relative_position_bucket)."""
    nb = num_buckets // 2
    out = (rel_pos > 0).astype(np.int64) * nb
    n = np.abs(rel_pos)
    max_exact = nb // 2
    is_small = n < max_exact
    large = max_exact + (
        np.log(np.maximum(n, 1) / max_exact)
        / np.log(max_distance / max_exact)
        * (nb - max_exact)
    ).astype(np.int64)
    large = np.minimum(large, nb - 1)
    return out + np.where(is_small, n, large)


class T5Encoder:
    @staticmethod
    def init_params(rng, cfg: T5Config, dtype=jnp.float32):
        E, D, H, F, L = cfg.d_model, cfg.d_kv, cfg.num_heads, cfg.d_ff, cfg.num_layers
        ks = jax.random.split(rng, 10)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        n_bias = L if cfg.per_layer_rel_bias else 1
        blocks = {
            "ln1": jnp.ones((L, E), dtype),
            "wq": init(ks[0], (L, E, H * D)),
            "wk": init(ks[1], (L, E, H * D)),
            "wv": init(ks[2], (L, E, H * D)),
            "wo": init(ks[3], (L, H * D, E)),
            "ln2": jnp.ones((L, E), dtype),
            "wo_ff": init(ks[4], (L, F, E)),
        }
        if cfg.gated_act:
            blocks["wi0"] = init(ks[5], (L, E, F))
            blocks["wi1"] = init(ks[6], (L, E, F))
        else:
            blocks["wi"] = init(ks[5], (L, E, F))
        return {
            "embed": init(ks[7], (cfg.vocab_size, E)),
            "rel_bias": init(ks[8], (n_bias, cfg.rel_buckets, H)),
            "blocks": blocks,
            "final_norm": jnp.ones((E,), dtype),
        }

    @staticmethod
    def apply(params, token_ids: jax.Array, cfg: T5Config):
        """[B, T] -> (embeddings [B, T, E], pooled mean over non-pad [B, E])."""
        b, t = token_ids.shape
        H, D, E = cfg.num_heads, cfg.d_kv, cfg.d_model
        eps = cfg.layer_norm_eps

        def t5_norm(x, w):
            var = jnp.mean(
                jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True
            )
            return (x.astype(jnp.float32) * jax.lax.rsqrt(var + eps)).astype(
                x.dtype
            ) * w

        x = jnp.take(params["embed"], token_ids, axis=0)
        valid = token_ids != cfg.pad_id  # [B, T]
        # relative position bias table lookup (host-computed bucket grid is a
        # trace-time constant for a given T)
        pos = np.arange(t)
        rel = pos[None, :] - pos[:, None]  # mem_pos - query_pos
        buckets = relative_position_bucket(
            rel, cfg.rel_buckets, cfg.rel_max_distance
        )  # [T, T]
        buckets = jnp.asarray(buckets)
        mask_add = jnp.where(valid[:, None, None, :], 0.0, -1e9)  # [B,1,1,T]

        def body(x, bp_and_bias):
            bp, bias_tab = bp_and_bias
            h = t5_norm(x, bp["ln1"])
            q = jnp.dot(h, bp["wq"]).reshape(b, t, H, D)
            k = jnp.dot(h, bp["wk"]).reshape(b, t, H, D)
            v = jnp.dot(h, bp["wv"]).reshape(b, t, H, D)
            # NOTE: T5 does not scale by 1/sqrt(d)
            s = jnp.einsum(
                "bthd,bshd->bhts", q.astype(jnp.float32), k.astype(jnp.float32)
            )
            bias = jnp.take(bias_tab, buckets, axis=0)  # [T, T, H]
            s = s + bias.transpose(2, 0, 1)[None]
            s = s + mask_add
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
            x = x + jnp.dot(o.reshape(b, t, H * D).astype(x.dtype), bp["wo"])
            h = t5_norm(x, bp["ln2"])
            if cfg.gated_act:
                ff = jax.nn.gelu(
                    jnp.dot(h, bp["wi0"]), approximate=True
                ) * jnp.dot(h, bp["wi1"])
            else:
                ff = jax.nn.relu(jnp.dot(h, bp["wi"]))
            x = x + jnp.dot(ff, bp["wo_ff"])
            return x, None

        rel_bias = params["rel_bias"]
        if rel_bias.shape[0] == 1:
            rel_bias = jnp.broadcast_to(
                rel_bias, (cfg.num_layers,) + rel_bias.shape[1:]
            )
        x, _ = jax.lax.scan(body, x, (params["blocks"], rel_bias))
        x = t5_norm(x, params["final_norm"])
        denom = jnp.maximum(valid.sum(axis=1, keepdims=True), 1)
        pooled = (x * valid[..., None]).sum(axis=1) / denom
        return x, pooled

    @staticmethod
    def hf_weight_map(cfg: T5Config):
        """HF T5EncoderModel tensor names ({i} = encoder block)."""
        blk = "encoder.block.{i}.layer"
        m = {
            ("embed",): ("shared.weight", None),
            ("final_norm",): ("encoder.final_layer_norm.weight", None),
            ("blocks", "ln1"): (blk + ".0.layer_norm.weight", None),
            ("blocks", "wq"): (blk + ".0.SelfAttention.q.weight", "t"),
            ("blocks", "wk"): (blk + ".0.SelfAttention.k.weight", "t"),
            ("blocks", "wv"): (blk + ".0.SelfAttention.v.weight", "t"),
            ("blocks", "wo"): (blk + ".0.SelfAttention.o.weight", "t"),
            ("blocks", "ln2"): (blk + ".1.layer_norm.weight", None),
            ("blocks", "wo_ff"): (blk + ".1.DenseReluDense.wo.weight", "t"),
        }
        if cfg.gated_act:
            m[("blocks", "wi0")] = (blk + ".1.DenseReluDense.wi_0.weight", "t")
            m[("blocks", "wi1")] = (blk + ".1.DenseReluDense.wi_1.weight", "t")
        else:
            m[("blocks", "wi")] = (blk + ".1.DenseReluDense.wi.weight", "t")
        if cfg.per_layer_rel_bias:
            m[("rel_bias",)] = (
                "encoder.block.{i}.layer.0.SelfAttention."
                "relative_attention_bias.weight",
                None,
            )
        else:
            m[("rel_bias",)] = (
                "encoder.block.0.layer.0.SelfAttention."
                "relative_attention_bias.weight",
                "unsqueeze0",
            )
        return m

    @staticmethod
    def convert_hf_weights(cfg: "T5Config", get, dtype=jnp.float32):
        """Build our param tree from HF tensors via `get(name) -> array`
        (used by the diffusers directory loader and the parity tests)."""
        params: Dict[str, Any] = {}
        for path, (tmpl, tf) in T5Encoder.hf_weight_map(cfg).items():
            def fetch(name):
                w = np.asarray(get(name))
                if tf == "t":
                    return w.T
                if tf == "unsqueeze0":
                    return w[None]
                return w

            if "{i}" in tmpl:
                leaf = np.stack(
                    [fetch(tmpl.format(i=i)) for i in range(cfg.num_layers)])
            else:
                leaf = fetch(tmpl)
            node = params
            for k in path[:-1]:
                node = node.setdefault(k, {})
            node[path[-1]] = jnp.asarray(leaf, dtype)
        return params
