"""Whisper speech-to-text family (WhisperForConditionalGeneration).

Reference analog: the whisper-like audio serving models in srt/models
(glmasr/midashenglm — whisper-encoder + decoder trunks). The encoder is
the existing models/audio_encoder.WhisperEncoder (shared with
qwen2-audio); this module adds the DECODER — a pre-LN transformer with
learned positions, self-attention, and cross-attention into the encoder
states — plus a greedy `transcribe` loop. Encoder-decoder models don't
fit the decoder-only paged runner; like the reference, transcription is
served through its own path (server /v1/audio/transcriptions).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from sglang_diffusion_tpu.models.audio_encoder import (
    AudioEncoderConfig,
    WhisperEncoder,
)
from sglang_diffusion_tpu.models.registry import register_model


@dataclass
class WhisperConfig:
    vocab_size: int = 51865
    d_model: int = 384
    decoder_layers: int = 4
    decoder_attention_heads: int = 6
    decoder_ffn_dim: int = 1536
    max_target_positions: int = 448
    decoder_start_token_id: int = 50258
    eos_token_id: int = 50257
    encoder: AudioEncoderConfig = None

    @classmethod
    def from_hf(cls, d: Dict[str, Any]) -> "WhisperConfig":
        return cls(
            vocab_size=d.get("vocab_size", 51865),
            d_model=d.get("d_model", 384),
            decoder_layers=d.get("decoder_layers", 4),
            decoder_attention_heads=d.get("decoder_attention_heads", 6),
            decoder_ffn_dim=d.get("decoder_ffn_dim", 1536),
            max_target_positions=d.get("max_target_positions", 448),
            decoder_start_token_id=d.get("decoder_start_token_id", 50258),
            eos_token_id=d.get("eos_token_id", 50257),
            encoder=AudioEncoderConfig.from_hf(d),
        )


def _ln(x, w, b, eps=1e-5):
    xf = x.astype(jnp.float32)
    mu = xf.mean(-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps) * w + b).astype(x.dtype)


def _mha(q, k, v, heads, causal):
    b, tq, e = q.shape
    tk = k.shape[1]
    d = e // heads
    qh = q.reshape(b, tq, heads, d).astype(jnp.float32)
    kh = k.reshape(b, tk, heads, d).astype(jnp.float32)
    vh = v.reshape(b, tk, heads, d).astype(jnp.float32)
    s = jnp.einsum("bqhd,bkhd->bhqk", qh, kh) / np.sqrt(d)
    if causal:
        mask = jnp.tril(jnp.ones((tq, tk), bool), k=tk - tq)
        s = jnp.where(mask[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhqk,bkhd->bqhd", p, vh)
    return o.reshape(b, tq, e).astype(q.dtype)


@register_model("WhisperForConditionalGeneration")
class WhisperFamily:
    is_encoder_decoder = True

    # ------------- params -------------
    @staticmethod
    def init_params(rng: jax.Array, cfg: WhisperConfig, dtype=jnp.float32):
        E, F, L = cfg.d_model, cfg.decoder_ffn_dim, cfg.decoder_layers
        ks = iter(jax.random.split(rng, 16))

        def init(shape):
            sd = 1.0 / np.sqrt(shape[-2] if len(shape) > 1 else shape[-1])
            return (jax.random.normal(next(ks), shape, jnp.float32)
                    * sd).astype(dtype)

        dec = {
            "embed": init((cfg.vocab_size, E)),
            "pos": init((cfg.max_target_positions, E)),
            "blocks": {
                "ln1_w": jnp.ones((L, E), dtype),
                "ln1_b": jnp.zeros((L, E), dtype),
                "wq": init((L, E, E)), "bq": jnp.zeros((L, E), dtype),
                "wk": init((L, E, E)),
                "wv": init((L, E, E)), "bv": jnp.zeros((L, E), dtype),
                "wo": init((L, E, E)), "bo": jnp.zeros((L, E), dtype),
                "lnx_w": jnp.ones((L, E), dtype),
                "lnx_b": jnp.zeros((L, E), dtype),
                "xwq": init((L, E, E)), "xbq": jnp.zeros((L, E), dtype),
                "xwk": init((L, E, E)),
                "xwv": init((L, E, E)), "xbv": jnp.zeros((L, E), dtype),
                "xwo": init((L, E, E)), "xbo": jnp.zeros((L, E), dtype),
                "ln2_w": jnp.ones((L, E), dtype),
                "ln2_b": jnp.zeros((L, E), dtype),
                "w_fc1": init((L, E, F)), "b_fc1": jnp.zeros((L, F), dtype),
                "w_fc2": init((L, F, E)), "b_fc2": jnp.zeros((L, E), dtype),
            },
            "ln_post_w": jnp.ones((E,), dtype),
            "ln_post_b": jnp.zeros((E,), dtype),
        }
        return {
            "encoder": WhisperEncoder.init_params(next(ks), cfg.encoder,
                                                  dtype),
            "decoder": dec,
        }

    @staticmethod
    def params_from_state_dict(cfg: WhisperConfig, sd: Dict[str, Any],
                               dtype=jnp.float32):
        # encoder via the shared map (templated layer names handled below)
        enc_params: Dict[str, Any] = {}
        for path, (name, tf) in WhisperEncoder.hf_weight_map().items():
            if "{j}" in name:
                continue
            w = np.asarray(sd[name])
            if tf == "t":
                w = w.T
            elif tf == "conv1d":
                w = w.transpose(2, 1, 0)
            node = enc_params
            for kpart in path[:-1]:
                node = node.setdefault(kpart, {})
            node[path[-1]] = w

        # stacked encoder layers
        L_enc = cfg.encoder.encoder_layers
        blocks: Dict[str, Any] = {}
        for path, (name, tf) in WhisperEncoder.hf_weight_map().items():
            if "{j}" not in name:
                continue
            ws = []
            for j in range(L_enc):
                w = np.asarray(sd[name.format(j=j)])
                ws.append(w.T if tf == "t" else w)
            blocks[path[-1]] = np.stack(ws)
        enc_params["blocks"] = blocks

        dec = "model.decoder"
        lyr = dec + ".layers.{i}"
        L = cfg.decoder_layers

        def t(n):
            return np.asarray(sd[n]).T

        def raw(n):
            return np.asarray(sd[n])

        def st(fn, tmpl):
            return np.stack([fn(tmpl.format(i=i)) for i in range(L)])

        dparams = {
            "embed": raw(dec + ".embed_tokens.weight"),
            "pos": raw(dec + ".embed_positions.weight"),
            "blocks": {
                "ln1_w": st(raw, lyr + ".self_attn_layer_norm.weight"),
                "ln1_b": st(raw, lyr + ".self_attn_layer_norm.bias"),
                "wq": st(t, lyr + ".self_attn.q_proj.weight"),
                "bq": st(raw, lyr + ".self_attn.q_proj.bias"),
                "wk": st(t, lyr + ".self_attn.k_proj.weight"),
                "wv": st(t, lyr + ".self_attn.v_proj.weight"),
                "bv": st(raw, lyr + ".self_attn.v_proj.bias"),
                "wo": st(t, lyr + ".self_attn.out_proj.weight"),
                "bo": st(raw, lyr + ".self_attn.out_proj.bias"),
                "lnx_w": st(raw, lyr + ".encoder_attn_layer_norm.weight"),
                "lnx_b": st(raw, lyr + ".encoder_attn_layer_norm.bias"),
                "xwq": st(t, lyr + ".encoder_attn.q_proj.weight"),
                "xbq": st(raw, lyr + ".encoder_attn.q_proj.bias"),
                "xwk": st(t, lyr + ".encoder_attn.k_proj.weight"),
                "xwv": st(t, lyr + ".encoder_attn.v_proj.weight"),
                "xbv": st(raw, lyr + ".encoder_attn.v_proj.bias"),
                "xwo": st(t, lyr + ".encoder_attn.out_proj.weight"),
                "xbo": st(raw, lyr + ".encoder_attn.out_proj.bias"),
                "ln2_w": st(raw, lyr + ".final_layer_norm.weight"),
                "ln2_b": st(raw, lyr + ".final_layer_norm.bias"),
                "w_fc1": st(t, lyr + ".fc1.weight"),
                "b_fc1": st(raw, lyr + ".fc1.bias"),
                "w_fc2": st(t, lyr + ".fc2.weight"),
                "b_fc2": st(raw, lyr + ".fc2.bias"),
            },
            "ln_post_w": raw(dec + ".layer_norm.weight"),
            "ln_post_b": raw(dec + ".layer_norm.bias"),
        }
        p = {"encoder": enc_params, "decoder": dparams}
        return jax.tree.map(lambda x: jnp.asarray(x, dtype), p)

    # ------------- forwards -------------
    @staticmethod
    def encode(params, cfg: WhisperConfig, input_features):
        """[B, mel, frames] -> encoder states [B, T_enc, E]."""
        return WhisperEncoder.apply(params["encoder"], input_features,
                                    cfg.encoder)

    @staticmethod
    def decode_logits(params, cfg: WhisperConfig, tokens, enc_out):
        """Teacher-forced decoder: tokens [B, T] -> logits [B, T, V]."""
        p = params["decoder"]
        heads = cfg.decoder_attention_heads
        b, t = tokens.shape
        h = jnp.take(p["embed"], tokens, axis=0) + p["pos"][None, :t]

        def body(h, bp):
            x = _ln(h, bp["ln1_w"], bp["ln1_b"])
            q = jnp.dot(x, bp["wq"]) + bp["bq"]
            k = jnp.dot(x, bp["wk"])
            v = jnp.dot(x, bp["wv"]) + bp["bv"]
            h = h + (jnp.dot(_mha(q, k, v, heads, True), bp["wo"])
                     + bp["bo"])
            x = _ln(h, bp["lnx_w"], bp["lnx_b"])
            q = jnp.dot(x, bp["xwq"]) + bp["xbq"]
            k = jnp.dot(enc_out, bp["xwk"])
            v = jnp.dot(enc_out, bp["xwv"]) + bp["xbv"]
            h = h + (jnp.dot(_mha(q, k, v, heads, False), bp["xwo"])
                     + bp["xbo"])
            x = _ln(h, bp["ln2_w"], bp["ln2_b"])
            x = jax.nn.gelu(jnp.dot(x, bp["w_fc1"]) + bp["b_fc1"],
                            approximate=False)
            h = h + jnp.dot(x, bp["w_fc2"]) + bp["b_fc2"]
            return h, None

        h, _ = jax.lax.scan(body, h, p["blocks"])
        h = _ln(h, p["ln_post_w"], p["ln_post_b"])
        return jnp.dot(h, p["embed"].T, preferred_element_type=jnp.float32)

    @staticmethod
    def transcribe(params, cfg: WhisperConfig, input_features,
                   forced_ids=None, max_new_tokens: int = 64):
        """Greedy transcription: mel features [B, mel, frames] ->
        list[list[int]] token ids (stops at eos)."""
        enc = WhisperFamily.encode(params, cfg, input_features)
        b = enc.shape[0]
        start = list(forced_ids or [cfg.decoder_start_token_id])
        toks = np.tile(np.asarray(start, np.int32)[None], (b, 1))
        done = np.zeros((b,), bool)
        for _ in range(max_new_tokens):
            logits = WhisperFamily.decode_logits(
                params, cfg, jnp.asarray(toks), enc)
            nxt = np.asarray(logits[:, -1].argmax(-1), np.int32)
            nxt = np.where(done, cfg.eos_token_id, nxt)
            toks = np.concatenate([toks, nxt[:, None]], axis=1)
            done |= nxt == cfg.eos_token_id
            if done.all():
                break
        outs = []
        for row in toks:
            ids = list(row[len(start):])
            if cfg.eos_token_id in ids:
                ids = ids[: ids.index(cfg.eos_token_id)]
            outs.append(ids)
        return outs
