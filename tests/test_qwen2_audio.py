"""Qwen2-Audio parity + e2e: audio tower (whisper-arch + 2x pool),
projector, embedding injection (reference analog: the audio-LLM entries of
the reference zoo, e.g. srt/models/glmasr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.config.model_config import ModelConfig
from sglang_diffusion_tpu.models.qwen2_audio import Qwen2AudioFamily

AUDIO_TOK = 40


def _tiny_hf():
    from transformers import (
        Qwen2AudioConfig,
        Qwen2AudioEncoderConfig,
        Qwen2AudioForConditionalGeneration,
        Qwen2Config,
    )

    cfg = Qwen2AudioConfig(
        audio_config=Qwen2AudioEncoderConfig(
            num_mel_bins=80, d_model=32, encoder_layers=2,
            encoder_attention_heads=2, encoder_ffn_dim=64,
            max_source_positions=8,  # tiny: 16 mel frames -> 4 audio tokens
        ).to_dict(),
        text_config=Qwen2Config(
            vocab_size=96, hidden_size=48, intermediate_size=96,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=2, max_position_embeddings=128,
            tie_word_embeddings=False,
        ).to_dict(),
        audio_token_index=AUDIO_TOK,
    )
    torch.manual_seed(0)
    return cfg, Qwen2AudioForConditionalGeneration(cfg).eval()


def _params(cfg, sd):
    from sglang_diffusion_tpu.engine.weight_loader import resolve_hf_name

    has = lambda n: n in sd  # noqa: E731

    def to_np(x):
        return x.detach().float().numpy()

    ac = Qwen2AudioFamily._audio_cfg(cfg)
    params = {}
    for path, (tmpl, tf) in Qwen2AudioFamily.hf_weight_map(cfg).items():
        def fetch(name):
            w = to_np(sd[resolve_hf_name(name, has)])
            if tf == "t":
                return w.T
            if tf == "conv1d":
                return w.transpose(2, 1, 0)
            return w

        if "{j}" in tmpl:
            leaf = np.stack(
                [fetch(tmpl.format(j=j)) for j in range(ac.encoder_layers)]
            )
        elif "{i}" in tmpl:
            leaf = np.stack(
                [fetch(tmpl.format(i=i)) for i in range(cfg.num_hidden_layers)]
            )
        else:
            leaf = fetch(tmpl)
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


def test_qwen2_audio_logits_parity():
    hf_cfg, hf_model = _tiny_hf()
    d = hf_cfg.to_dict()
    d["architectures"] = ["Qwen2AudioForConditionalGeneration"]
    cfg = ModelConfig.from_hf_config(d)
    assert cfg.audio_token_id == AUDIO_TOK
    params = _params(cfg, hf_model.state_dict())

    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 80, 16)).astype(np.float32) * 0.5
    n_a = 4  # 16 frames -> conv stride2 -> 8 -> pool2 -> 4 tokens
    ids = [3, 5] + [AUDIO_TOK] * n_a + [7, 8]
    t = len(ids)
    with torch.no_grad():
        ref = hf_model(
            input_ids=torch.tensor([ids]),
            input_features=torch.tensor(feats),
            feature_attention_mask=torch.ones(1, 16, dtype=torch.long),
            attention_mask=torch.ones(1, t, dtype=torch.long),
        ).logits[0].numpy()

    enc = Qwen2AudioFamily.make_encode_audio(cfg)
    emb = enc(params, jnp.asarray(feats))  # [1, 4, 48]
    assert emb.shape == (1, n_a, 48)

    from sglang_diffusion_tpu.layers.attention import (
        AttentionMetadata,
        get_attention_backend,
    )

    fwd = Qwen2AudioFamily.make_forward(cfg, get_attention_backend("xla"),
                                        logits_mode="all")
    PAGE = 8
    pps = -(-t // PAGE)
    kv = jnp.zeros((cfg.num_hidden_layers, pps + 1,
                    PAGE, 2 * cfg.num_key_value_heads, cfg.actual_head_dim),
                   jnp.float32)
    pv = np.arange(1, pps + 1, dtype=np.int32)
    page_table = np.zeros((1, pps + 1), np.int32)
    page_table[0, :pps] = pv
    offs = np.arange(t)
    slots = (pv[offs // PAGE] * PAGE + offs % PAGE)[None].astype(np.int32)
    meta = AttentionMetadata(
        page_table=jnp.asarray(page_table),
        kv_lens=jnp.asarray([t], jnp.int32),
        q_start_pos=jnp.asarray([0], jnp.int32),
        slot_ids=jnp.asarray(slots),
        logit_idx=jnp.asarray([t - 1], jnp.int32),
    )
    mm_mask = np.zeros((1, t), bool)
    mm_mask[0, 2 : 2 + n_a] = True
    full = jnp.zeros((1, t, 48), jnp.float32).at[0, 2 : 2 + n_a].set(emb[0])
    logits, _ = fwd(
        params, jnp.asarray([ids], jnp.int32),
        jnp.asarray([list(range(t))], jnp.int32), kv, meta,
        mm_embeds=full, mm_mask=jnp.asarray(mm_mask),
    )
    # absolute tolerance only: near-zero logits blow up relative error
    np.testing.assert_allclose(np.asarray(logits[0]), ref, atol=3e-3)


def test_qwen2_audio_engine_e2e():
    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.sampling.params import SamplingParams

    cfg = ModelConfig.from_hf_config({
        "architectures": ["Qwen2AudioForConditionalGeneration"],
        "audio_token_index": 400,
        "text_config": {
            "architectures": ["Qwen2ForCausalLM"],
            "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "max_position_embeddings": 512,
        },
        "audio_config": {
            "num_mel_bins": 80, "d_model": 32, "encoder_layers": 1,
            "encoder_attention_heads": 2, "encoder_ffn_dim": 64,
            "max_source_positions": 8,
        },
    })
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=256,
    )
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16 * 160) * 0.1).astype(np.float32)
    ids = [ord(c) for c in "hear "] + [400] + [ord("?")]
    sp = SamplingParams(temperature=0.0, max_new_tokens=5)
    out = eng.generate(input_ids=ids, sampling_params=sp, audio_data=wav)
    assert len(out["output_ids"]) == 5
    # 16 mel frames -> 4 audio tokens replacing the placeholder
    assert out["meta_info"]["prompt_tokens"] == len(ids) - 1 + 4
    # different audio -> (almost surely) different continuation; same audio
    # -> identical (content-hash radix keying)
    out2 = eng.generate(input_ids=ids, sampling_params=sp, audio_data=wav)
    assert out["output_ids"] == out2["output_ids"]


def test_transcriptions_route():
    """OpenAI /v1/audio/transcriptions (reference analog:
    serving_transcriptions.py)."""
    import asyncio
    import base64
    import io
    import json
    import wave

    from sglang_diffusion_tpu.config.server_args import ServerArgs
    from sglang_diffusion_tpu.engine.engine import Engine
    from sglang_diffusion_tpu.engine.tokenizer import ByteTokenizer
    from sglang_diffusion_tpu.server.api_server import ApiServer
    from tests.test_http_server import http_request

    cfg = ModelConfig.from_hf_config({
        "architectures": ["Qwen2AudioForConditionalGeneration"],
        "audio_token_index": 400,
        "text_config": {
            "architectures": ["Qwen2ForCausalLM"],
            "vocab_size": 512, "hidden_size": 64, "intermediate_size": 128,
            "num_hidden_layers": 2, "num_attention_heads": 4,
            "num_key_value_heads": 2, "max_position_embeddings": 512,
        },
        "audio_config": {
            "num_mel_bins": 80, "d_model": 32, "encoder_layers": 1,
            "encoder_attention_heads": 2, "encoder_ffn_dim": 64,
            "max_source_positions": 8,
        },
    })
    args = ServerArgs(
        model_path="", tokenizer_path="byte", page_size=8,
        max_total_tokens=4096, attention_backend="xla", context_length=256,
        host="127.0.0.1", port=0, max_new_tokens_default=4,
    )
    eng = Engine(server_args=args, model_config=cfg, tokenizer=ByteTokenizer())
    server = ApiServer(eng, args)

    rng = np.random.default_rng(0)
    pcm = (rng.standard_normal(16 * 160) * 3000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(16000)
        w.writeframes(pcm.tobytes())
    b64 = base64.b64encode(buf.getvalue()).decode()

    async def scenario():
        await server.start()
        port = server.http.port
        st, _, data = await http_request(
            port, "POST", "/v1/audio/transcriptions",
            {"file_b64": b64, "max_tokens": 4},
        )
        assert st == 200, data
        assert "text" in json.loads(data)
        st, _, _ = await http_request(
            port, "POST", "/v1/audio/transcriptions",
            {"file_b64": "!!!"},
        )
        assert st == 400
        await server.stop()

    asyncio.run(asyncio.wait_for(scenario(), timeout=300))
