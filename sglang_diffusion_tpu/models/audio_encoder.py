"""Whisper-style audio encoder (functional JAX).

Reference analog: the audio encoders feeding audio-LLMs in the reference
zoo (srt/models/glmasr.py, gemma3n_audio — whisper-architecture towers
whose outputs are injected into the LM like image embeddings).

Architecture (HF WhisperEncoder): conv1d(k3,p1) -> GELU -> conv1d(k3,s2,p1)
-> GELU -> +sinusoidal positions -> N pre-LN blocks (MHA, k_proj bias-free)
-> final LN. An adapter head (dense) projects into the LM width for
embedding injection.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class AudioEncoderConfig:
    num_mel_bins: int = 80
    d_model: int = 384
    encoder_layers: int = 4
    encoder_attention_heads: int = 6
    encoder_ffn_dim: int = 1536
    max_source_positions: int = 1500
    lm_hidden: int = 0  # adapter output width (0 = no adapter)
    # qwen2-audio: AvgPool1d(2,2) before the final layer norm (halves the
    # audio token count)
    avg_pool: bool = False

    @classmethod
    def from_hf(cls, cfg: Dict[str, Any], lm_hidden: int = 0):
        return cls(
            num_mel_bins=cfg.get("num_mel_bins", 80),
            d_model=cfg.get("d_model", 384),
            encoder_layers=cfg.get("encoder_layers", 4),
            encoder_attention_heads=cfg.get("encoder_attention_heads", 6),
            encoder_ffn_dim=cfg.get("encoder_ffn_dim", 1536),
            max_source_positions=cfg.get("max_source_positions", 1500),
            lm_hidden=lm_hidden,
        )


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's fixed sinusoidal embedding table [length, channels]."""
    log_timescale = math.log(10000) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    scaled = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate([np.sin(scaled), np.cos(scaled)], axis=1).astype(
        np.float32
    )


class WhisperEncoder:
    @staticmethod
    def init_params(rng, cfg: AudioEncoderConfig, dtype=jnp.float32):
        E, F, L, M = (cfg.d_model, cfg.encoder_ffn_dim, cfg.encoder_layers,
                      cfg.num_mel_bins)
        ks = jax.random.split(rng, 12)

        def init(key, shape):
            scale = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(key, shape, jnp.float32) * scale).astype(dtype)

        p = {
            "conv1_w": init(ks[0], (3, M, E)),  # [K, Cin, Cout]
            "conv1_b": jnp.zeros((E,), dtype),
            "conv2_w": init(ks[1], (3, E, E)),
            "conv2_b": jnp.zeros((E,), dtype),
            "blocks": {
                "ln1_w": jnp.ones((L, E), dtype),
                "ln1_b": jnp.zeros((L, E), dtype),
                "wq": init(ks[2], (L, E, E)),
                "bq": jnp.zeros((L, E), dtype),
                "wk": init(ks[3], (L, E, E)),  # no bias (whisper)
                "wv": init(ks[4], (L, E, E)),
                "bv": jnp.zeros((L, E), dtype),
                "wo": init(ks[5], (L, E, E)),
                "bo": jnp.zeros((L, E), dtype),
                "ln2_w": jnp.ones((L, E), dtype),
                "ln2_b": jnp.zeros((L, E), dtype),
                "w_fc1": init(ks[6], (L, E, F)),
                "b_fc1": jnp.zeros((L, F), dtype),
                "w_fc2": init(ks[7], (L, F, E)),
                "b_fc2": jnp.zeros((L, E), dtype),
            },
            "ln_post_w": jnp.ones((E,), dtype),
            "ln_post_b": jnp.zeros((E,), dtype),
            # positional table: real whisper checkpoints store the sinusoid
            # table; loaded from the checkpoint to match exactly
            "pos_embed": jnp.asarray(
                sinusoids(cfg.max_source_positions, E), dtype
            ),
        }
        if cfg.lm_hidden:
            p["adapter_w"] = init(ks[8], (E, cfg.lm_hidden))
            p["adapter_b"] = jnp.zeros((cfg.lm_hidden,), dtype)
        return p

    @staticmethod
    def apply(params, input_features: jax.Array,
              cfg: AudioEncoderConfig) -> jax.Array:
        """[B, n_mels, T_frames] -> [B, T_frames/2, E or lm_hidden]."""
        E, H = cfg.d_model, cfg.encoder_attention_heads
        D = E // H
        eps = 1e-5

        def ln(x, w, b):
            xf = x.astype(jnp.float32)
            mu = xf.mean(-1, keepdims=True)
            var = xf.var(-1, keepdims=True)
            return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)

        def conv1d(x, w, b, stride):
            # x [B, T, C], w [K, Cin, Cout], SAME padding
            out = jax.lax.conv_general_dilated(
                x, w, window_strides=(stride,), padding=[(1, 1)],
                dimension_numbers=("NWC", "WIO", "NWC"),
            )
            return out + b

        x = input_features.transpose(0, 2, 1)  # [B, T, M]
        x = x.astype(params["conv1_w"].dtype)
        x = jax.nn.gelu(conv1d(x, params["conv1_w"], params["conv1_b"], 1),
                        approximate=False)
        x = jax.nn.gelu(conv1d(x, params["conv2_w"], params["conv2_b"], 2),
                        approximate=False)
        t = x.shape[1]
        x = x + params["pos_embed"][None, :t].astype(x.dtype)

        def body(x, bp):
            b, tt, _ = x.shape
            h = ln(x, bp["ln1_w"], bp["ln1_b"])
            q = (h @ bp["wq"] + bp["bq"]).reshape(b, tt, H, D)
            k = (h @ bp["wk"]).reshape(b, tt, H, D)
            v = (h @ bp["wv"] + bp["bv"]).reshape(b, tt, H, D)
            s = jnp.einsum("bthd,bshd->bhts", q.astype(jnp.float32),
                           k.astype(jnp.float32)) / math.sqrt(D)
            p = jax.nn.softmax(s, axis=-1)
            o = jnp.einsum("bhts,bshd->bthd", p, v.astype(jnp.float32))
            x = x + (o.reshape(b, tt, E).astype(x.dtype) @ bp["wo"] + bp["bo"])
            h = ln(x, bp["ln2_w"], bp["ln2_b"])
            ff = jax.nn.gelu((h @ bp["w_fc1"] + bp["b_fc1"]).astype(jnp.float32),
                             approximate=False)
            x = x + (ff.astype(x.dtype) @ bp["w_fc2"] + bp["b_fc2"])
            return x, None

        x, _ = jax.lax.scan(body, x, params["blocks"])
        if cfg.avg_pool:
            b, tt, e = x.shape
            x = x.reshape(b, tt // 2, 2, e).mean(axis=2)
        x = ln(x, params["ln_post_w"], params["ln_post_b"])
        if "adapter_w" in params:
            x = x @ params["adapter_w"] + params["adapter_b"]
        return x

    @staticmethod
    def hf_weight_map():
        """HF WhisperModel encoder names ({j} = encoder layer); conv weights
        [Cout, Cin, K] -> our [K, Cin, Cout] via transform "conv1d"."""
        enc = "model.encoder"
        lyr = enc + ".layers.{j}"
        return {
            ("conv1_w",): (enc + ".conv1.weight", "conv1d"),
            ("conv1_b",): (enc + ".conv1.bias", None),
            ("conv2_w",): (enc + ".conv2.weight", "conv1d"),
            ("conv2_b",): (enc + ".conv2.bias", None),
            ("ln_post_w",): (enc + ".layer_norm.weight", None),
            ("ln_post_b",): (enc + ".layer_norm.bias", None),
            ("pos_embed",): (enc + ".embed_positions.weight", None),
            ("blocks", "ln1_w"): (lyr + ".self_attn_layer_norm.weight", None),
            ("blocks", "ln1_b"): (lyr + ".self_attn_layer_norm.bias", None),
            ("blocks", "wq"): (lyr + ".self_attn.q_proj.weight", "t"),
            ("blocks", "bq"): (lyr + ".self_attn.q_proj.bias", None),
            ("blocks", "wk"): (lyr + ".self_attn.k_proj.weight", "t"),
            ("blocks", "wv"): (lyr + ".self_attn.v_proj.weight", "t"),
            ("blocks", "bv"): (lyr + ".self_attn.v_proj.bias", None),
            ("blocks", "wo"): (lyr + ".self_attn.out_proj.weight", "t"),
            ("blocks", "bo"): (lyr + ".self_attn.out_proj.bias", None),
            ("blocks", "ln2_w"): (lyr + ".final_layer_norm.weight", None),
            ("blocks", "ln2_b"): (lyr + ".final_layer_norm.bias", None),
            ("blocks", "w_fc1"): (lyr + ".fc1.weight", "t"),
            ("blocks", "b_fc1"): (lyr + ".fc1.bias", None),
            ("blocks", "w_fc2"): (lyr + ".fc2.weight", "t"),
            ("blocks", "b_fc2"): (lyr + ".fc2.bias", None),
        }
