"""CLIPTextModel encoder (HF-parity) — functional JAX.

Reference analog: multimodal_gen/runtime/models/encoders/clip.py (the
pooled-conditioning encoder for Flux/SDXL-family pipelines). Faithful to
transformers.CLIPTextModel so diffusers `text_encoder/` directories load
directly:

  embed = token_embedding[ids] + position_embedding[:T]
  layer: LN1 -> causal MHA (scaled, bias qkv/out) -> res
         -> LN2 -> MLP (quick_gelu | gelu) -> res
  final_layer_norm; pooled = hidden at each row's eos-token position
  (HF: argmax over ids == eos_token_id; pre-4.24 ckpts use ids.argmax).

Parity: tests/test_clip_encoder.py vs transformers.CLIPTextModel.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class CLIPTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_len: int = 77
    eos_token_id: int = 49407
    layer_norm_eps: float = 1e-5
    hidden_act: str = "quick_gelu"

    @classmethod
    def from_hf(cls, d: Dict[str, Any]) -> "CLIPTextConfig":
        return cls(
            vocab_size=d["vocab_size"],
            hidden_size=d["hidden_size"],
            intermediate_size=d["intermediate_size"],
            num_layers=d["num_hidden_layers"],
            num_heads=d["num_attention_heads"],
            max_len=d.get("max_position_embeddings", 77),
            eos_token_id=d.get("eos_token_id", 49407),
            layer_norm_eps=d.get("layer_norm_eps", 1e-5),
            hidden_act=d.get("hidden_act", "quick_gelu"),
        )


def _ln(x, g, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = xf.var(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * g.astype(jnp.float32)
            + b.astype(jnp.float32)).astype(x.dtype)


def _act(x, kind):
    if kind == "quick_gelu":
        return x * jax.nn.sigmoid(1.702 * x)
    return jax.nn.gelu(x, approximate=False)


class CLIPTextEncoder:
    @staticmethod
    def apply(params, token_ids: jax.Array,
              cfg: CLIPTextConfig) -> Tuple[jax.Array, jax.Array]:
        """[B, T] -> (hidden [B, T, E], pooled [B, E])."""
        b, t = token_ids.shape
        H = cfg.num_heads
        E = cfg.hidden_size
        D = E // H
        eps = cfg.layer_norm_eps
        x = jnp.take(params["token_embed"], token_ids, axis=0,
                     mode="clip") + params["pos_embed"][None, :t]
        causal = jnp.tril(jnp.ones((t, t), bool))

        def layer(x, lp):
            h = _ln(x, lp["ln1_g"], lp["ln1_b"], eps)
            q = (h @ lp["wq"] + lp["bq"]).reshape(b, t, H, D)
            k = (h @ lp["wk"] + lp["bk"]).reshape(b, t, H, D)
            v = (h @ lp["wv"] + lp["bv"]).reshape(b, t, H, D)
            s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                           k.astype(jnp.float32)) / np.sqrt(D)
            s = jnp.where(causal[None, None], s, -jnp.inf)
            a = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", a,
                           v.astype(jnp.float32)).astype(x.dtype)
            x = x + (o.reshape(b, t, E) @ lp["wo"] + lp["bo"])
            h = _ln(x, lp["ln2_g"], lp["ln2_b"], eps)
            h = _act(h @ lp["fc1"] + lp["fc1_b"], cfg.hidden_act)
            return x + (h @ lp["fc2"] + lp["fc2_b"]), None

        x, _ = jax.lax.scan(layer, x, params["layers"])
        x = _ln(x, params["final_g"], params["final_b"], eps)
        eos_pos = jnp.argmax(
            (token_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1)
        # rows without an eos token: fall back to the last position
        has_eos = jnp.any(token_ids == cfg.eos_token_id, axis=-1)
        eos_pos = jnp.where(has_eos, eos_pos, t - 1)
        pooled = x[jnp.arange(b), eos_pos]
        return x, pooled

    @staticmethod
    def hf_weight_map(cfg: CLIPTextConfig):
        """ours-path -> (hf-name-template, transform) like T5Encoder's."""
        lyr = "text_model.encoder.layers.{i}"
        return {
            ("token_embed",): (
                "text_model.embeddings.token_embedding.weight", ""),
            ("pos_embed",): (
                "text_model.embeddings.position_embedding.weight", ""),
            ("layers", "ln1_g"): (f"{lyr}.layer_norm1.weight", ""),
            ("layers", "ln1_b"): (f"{lyr}.layer_norm1.bias", ""),
            ("layers", "wq"): (f"{lyr}.self_attn.q_proj.weight", "t"),
            ("layers", "bq"): (f"{lyr}.self_attn.q_proj.bias", ""),
            ("layers", "wk"): (f"{lyr}.self_attn.k_proj.weight", "t"),
            ("layers", "bk"): (f"{lyr}.self_attn.k_proj.bias", ""),
            ("layers", "wv"): (f"{lyr}.self_attn.v_proj.weight", "t"),
            ("layers", "bv"): (f"{lyr}.self_attn.v_proj.bias", ""),
            ("layers", "wo"): (f"{lyr}.self_attn.out_proj.weight", "t"),
            ("layers", "bo"): (f"{lyr}.self_attn.out_proj.bias", ""),
            ("layers", "ln2_g"): (f"{lyr}.layer_norm2.weight", ""),
            ("layers", "ln2_b"): (f"{lyr}.layer_norm2.bias", ""),
            ("layers", "fc1"): (f"{lyr}.mlp.fc1.weight", "t"),
            ("layers", "fc1_b"): (f"{lyr}.mlp.fc1.bias", ""),
            ("layers", "fc2"): (f"{lyr}.mlp.fc2.weight", "t"),
            ("layers", "fc2_b"): (f"{lyr}.mlp.fc2.bias", ""),
            ("final_g",): ("text_model.final_layer_norm.weight", ""),
            ("final_b",): ("text_model.final_layer_norm.bias", ""),
        }

    @staticmethod
    def convert_hf_weights(cfg: CLIPTextConfig, get, dtype=jnp.float32):
        params: Dict[str, Any] = {"layers": {}}
        for path, (tmpl, tf) in CLIPTextEncoder.hf_weight_map(cfg).items():
            def fetch(name):
                w = np.asarray(get(name))
                return w.T if tf == "t" else w

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

    @staticmethod
    def init_params(rng, cfg: CLIPTextConfig, dtype=jnp.float32):
        E, F, L = cfg.hidden_size, cfg.intermediate_size, cfg.num_layers
        ks = iter(jax.random.split(rng, 8))

        def init(shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(next(ks), shape, jnp.float32)
                    * scale).astype(dtype)

        layers = {
            "ln1_g": jnp.ones((L, E), dtype), "ln1_b": jnp.zeros((L, E), dtype),
            "wq": init((L, E, E)), "bq": jnp.zeros((L, E), dtype),
            "wk": init((L, E, E)), "bk": jnp.zeros((L, E), dtype),
            "wv": init((L, E, E)), "bv": jnp.zeros((L, E), dtype),
            "wo": init((L, E, E)), "bo": jnp.zeros((L, E), dtype),
            "ln2_g": jnp.ones((L, E), dtype), "ln2_b": jnp.zeros((L, E), dtype),
            "fc1": init((L, E, F)), "fc1_b": jnp.zeros((L, F), dtype),
            "fc2": init((L, F, E)), "fc2_b": jnp.zeros((L, E), dtype),
        }
        return {
            "token_embed": init((cfg.vocab_size, E)),
            "pos_embed": init((cfg.max_len, E)),
            "layers": layers,
            "final_g": jnp.ones((E,), dtype),
            "final_b": jnp.zeros((E,), dtype),
        }
