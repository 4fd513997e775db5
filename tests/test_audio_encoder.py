"""Audio frontend + Whisper-encoder parity vs HF transformers
(reference analog: the audio towers of srt/models/glmasr / gemma3n_audio
and the whisper-style processors)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from sglang_diffusion_tpu.models.audio_encoder import (
    AudioEncoderConfig,
    WhisperEncoder,
    sinusoids,
)
from sglang_diffusion_tpu.multimodal.audio import (
    AudioProcessor,
    log_mel_spectrogram,
)


def test_log_mel_matches_whisper_feature_extractor():
    from transformers import WhisperFeatureExtractor

    fe = WhisperFeatureExtractor()
    rng = np.random.default_rng(0)
    wav = (rng.standard_normal(16000 * 2) * 0.1).astype(np.float32)
    ref = fe(wav, sampling_rate=16000,
             return_tensors="np").input_features[0]
    got = log_mel_spectrogram(wav)
    assert got.shape == ref.shape == (80, 3000)
    np.testing.assert_allclose(got, ref, atol=2e-4)


def _tiny_whisper():
    from transformers import WhisperConfig, WhisperModel

    cfg = WhisperConfig(
        num_mel_bins=80,
        d_model=32,
        encoder_layers=2,
        encoder_attention_heads=2,
        encoder_ffn_dim=64,
        decoder_layers=1,
        decoder_attention_heads=2,
        max_source_positions=1500,
        vocab_size=64,
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        decoder_start_token_id=1,
        suppress_tokens=None,
        begin_suppress_tokens=None,
    )
    torch.manual_seed(0)
    return cfg, WhisperModel(cfg).eval()


def _params(cfg, sd):
    from sglang_diffusion_tpu.engine.weight_loader import resolve_hf_name

    has = lambda n: n in sd  # noqa: E731

    def to_np(x):
        return x.detach().float().numpy()

    def get(name):
        return sd[resolve_hf_name(name, has)]

    params = {}
    for path, (tmpl, tf) in WhisperEncoder.hf_weight_map().items():
        if "{j}" in tmpl:
            leaves = []
            for j in range(cfg.encoder_layers):
                w = to_np(get(tmpl.format(j=j)))
                if tf == "t":
                    w = w.T
                leaves.append(w)
            leaf = np.stack(leaves)
        else:
            w = to_np(get(tmpl))
            if tf == "conv1d":
                w = w.transpose(2, 1, 0)  # [Cout,Cin,K] -> [K,Cin,Cout]
            elif tf == "t":
                w = w.T
            leaf = w
        node = params
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = jnp.asarray(leaf, jnp.float32)
    return params


def test_whisper_encoder_parity():
    hf_cfg, hf_model = _tiny_whisper()
    cfg = AudioEncoderConfig.from_hf(hf_cfg.to_dict())
    params = _params(cfg, hf_model.state_dict())
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 80, 3000)).astype(np.float32) * 0.5
    with torch.no_grad():
        ref = hf_model.encoder(torch.tensor(feats)).last_hidden_state.numpy()
    got = np.asarray(
        WhisperEncoder.apply(params, jnp.asarray(feats), cfg)
    )
    assert got.shape == ref.shape == (1, 1500, 32)
    np.testing.assert_allclose(got, ref, atol=3e-4, rtol=3e-3)


def test_audio_processor_and_adapter():
    proc = AudioProcessor()
    assert proc.num_tokens == 1500
    rng = np.random.default_rng(2)
    wav = rng.standard_normal(16000).astype(np.float32) * 0.1
    feats, digest = proc.preprocess(wav)
    assert feats.shape == (80, 3000)
    feats2, digest2 = proc.preprocess(wav)
    assert digest == digest2
    # adapter projects into LM width for embedding injection
    cfg = AudioEncoderConfig(d_model=32, encoder_layers=1,
                             encoder_attention_heads=2, encoder_ffn_dim=64,
                             lm_hidden=48)
    params = WhisperEncoder.init_params(jax.random.PRNGKey(0), cfg)
    out = WhisperEncoder.apply(params, jnp.asarray(feats[None]), cfg)
    assert out.shape == (1, 1500, 48)
