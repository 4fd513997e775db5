"""Llama-as-text-encoder for diffusion conditioning.

Reference analog: multimodal_gen/runtime/models/encoders/llama.py (the
HunyuanVideo-style conditioning path: a causal LlamaModel trunk whose
last_hidden_state — or an intermediate hidden state, hidden_state_skip_layer
— conditions the DiT). Single full-sequence forward, no KV cache: the
encoder runs once per prompt, so paged attention machinery is unnecessary;
a causal mask + one dense attention per layer maps straight onto the MXU.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.ops.norms import rms_norm
from sglang_diffusion_tpu.ops.rope import apply_rope, compute_inv_freq


@dataclass
class LlamaEncoderConfig:
    vocab_size: int = 32000
    hidden_size: int = 4096
    intermediate_size: int = 11008
    num_layers: int = 32
    num_heads: int = 32
    num_kv_heads: int = 32
    rope_theta: float = 10000.0
    rms_norm_eps: float = 1e-5
    qkv_bias: bool = False  # Qwen2 family (incl. the Qwen2.5-VL text tower)

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def from_hf(cls, d: Dict[str, Any]) -> "LlamaEncoderConfig":
        return cls(
            vocab_size=d.get("vocab_size", 32000),
            hidden_size=d.get("hidden_size", 4096),
            intermediate_size=d.get("intermediate_size", 11008),
            num_layers=d.get("num_hidden_layers", 32),
            num_heads=d.get("num_attention_heads", 32),
            num_kv_heads=d.get(
                "num_key_value_heads", d.get("num_attention_heads", 32)
            ),
            rope_theta=d.get("rope_theta", 10000.0),
            rms_norm_eps=d.get("rms_norm_eps", 1e-5),
        )


class LlamaTextEncoder:
    @staticmethod
    def init_params(rng, cfg: LlamaEncoderConfig, dtype=jnp.float32):
        E = cfg.hidden_size
        F = cfg.intermediate_size
        L = cfg.num_layers
        Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        ks = jax.random.split(rng, 9)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        blocks = {
            "input_norm": jnp.ones((L, E), dtype),
            "post_norm": jnp.ones((L, E), dtype),
            "wq": init(ks[1], (L, E, Hq * D)),
            "wk": init(ks[2], (L, E, Hkv * D)),
            "wv": init(ks[3], (L, E, Hkv * D)),
            "wo": init(ks[4], (L, Hq * D, E)),
            "w_gate": init(ks[5], (L, E, F)),
            "w_up": init(ks[6], (L, E, F)),
            "w_down": init(ks[7], (L, F, E)),
        }
        if cfg.qkv_bias:
            blocks["bq"] = jnp.zeros((L, Hq * D), dtype)
            blocks["bk"] = jnp.zeros((L, Hkv * D), dtype)
            blocks["bv"] = jnp.zeros((L, Hkv * D), dtype)
        return {
            "embed": init(ks[0], (cfg.vocab_size, E)),
            "blocks": blocks,
            "final_norm": jnp.ones((E,), dtype),
        }

    @staticmethod
    def apply(params, token_ids: jax.Array, cfg: LlamaEncoderConfig,
              skip_layers: int = 0, attn_mask=None):
        """[B, T] -> hidden states [B, T, E].

        skip_layers=0: HF last_hidden_state (post final norm).
        skip_layers=k>0: hidden_states[-(k+1)] — the raw output of layer
        L-k, no final norm (HunyuanVideo's hidden_state_skip_layer).
        attn_mask: optional [B, T] 1/0 padding mask (pads are unattendable).
        """
        b, t = token_ids.shape
        Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
        eps = cfg.rms_norm_eps
        inv_freq = jnp.asarray(compute_inv_freq(D, cfg.rope_theta, None))
        positions = jnp.arange(t, dtype=jnp.int32)[None].repeat(b, 0)
        causal = jnp.tril(jnp.ones((t, t), bool))[None]  # [1, T, T]
        if attn_mask is not None:
            causal = jnp.logical_and(causal, attn_mask[:, None, :].astype(bool))

        def body(hidden, bp):
            h = rms_norm(hidden, bp["input_norm"], eps)
            q = jnp.dot(h, bp["wq"])
            k = jnp.dot(h, bp["wk"])
            v = jnp.dot(h, bp["wv"])
            if cfg.qkv_bias:
                q, k, v = q + bp["bq"], k + bp["bk"], v + bp["bv"]
            q = q.reshape(b, t, Hq, D)
            k = k.reshape(b, t, Hkv, D)
            v = v.reshape(b, t, Hkv, D)
            q, k = apply_rope(q, k, positions, inv_freq)
            rep = Hq // Hkv
            k = jnp.repeat(k, rep, axis=2)
            v = jnp.repeat(v, rep, axis=2)
            s = jnp.einsum("bqhd,bkhd->bhqk", q.astype(jnp.float32),
                           k.astype(jnp.float32)) / math.sqrt(D)
            s = jnp.where(causal[:, None], s, -1e30)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhqk,bkhd->bqhd", p, v.astype(jnp.float32))
            hidden = hidden + jnp.dot(
                o.reshape(b, t, Hq * D).astype(hidden.dtype), bp["wo"]
            )
            h = rms_norm(hidden, bp["post_norm"], eps)
            gate = jnp.dot(h, bp["w_gate"])
            up = jnp.dot(h, bp["w_up"])
            hidden = hidden + jnp.dot(jax.nn.silu(gate) * up, bp["w_down"])
            return hidden, hidden

        hidden = jnp.take(params["embed"], token_ids, axis=0)
        n_run = cfg.num_layers - skip_layers
        blocks = jax.tree.map(lambda x: x[:n_run], params["blocks"])
        hidden, _ = jax.lax.scan(body, hidden, blocks)
        if skip_layers == 0:
            hidden = rms_norm(hidden, params["final_norm"], eps)
        return hidden

    @staticmethod
    def hf_weight_map(prefix: str = "model", qkv_bias: bool = False):
        """HF LlamaModel/Qwen2Model names (no lm_head — encoder trunk only).
        prefix "model.language_model" covers Qwen2.5-VL checkpoints that
        nest the text tower."""
        lyr = prefix + ".layers.{i}"
        m = {
            ("embed",): (prefix + ".embed_tokens.weight", None),
            ("final_norm",): (prefix + ".norm.weight", None),
            ("blocks", "input_norm"): (lyr + ".input_layernorm.weight", None),
            ("blocks", "post_norm"): (
                lyr + ".post_attention_layernorm.weight", None),
            ("blocks", "wq"): (lyr + ".self_attn.q_proj.weight", "t"),
            ("blocks", "wk"): (lyr + ".self_attn.k_proj.weight", "t"),
            ("blocks", "wv"): (lyr + ".self_attn.v_proj.weight", "t"),
            ("blocks", "wo"): (lyr + ".self_attn.o_proj.weight", "t"),
            ("blocks", "w_gate"): (lyr + ".mlp.gate_proj.weight", "t"),
            ("blocks", "w_up"): (lyr + ".mlp.up_proj.weight", "t"),
            ("blocks", "w_down"): (lyr + ".mlp.down_proj.weight", "t"),
        }
        if qkv_bias:
            m[("blocks", "bq")] = (lyr + ".self_attn.q_proj.bias", None)
            m[("blocks", "bk")] = (lyr + ".self_attn.k_proj.bias", None)
            m[("blocks", "bv")] = (lyr + ".self_attn.v_proj.bias", None)
        return m

    @staticmethod
    def convert_hf_weights(cfg: "LlamaEncoderConfig", get, dtype=jnp.float32,
                           prefix: str = "model"):
        """Build the param tree from HF tensors via `get(name) -> array`
        (Llama/Qwen2 trunks, incl. the Qwen2.5-VL text tower)."""
        params: Dict[str, Any] = {}
        wmap = LlamaTextEncoder.hf_weight_map(prefix, cfg.qkv_bias)
        for path, (tmpl, tf) in wmap.items():
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
