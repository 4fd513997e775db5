"""Audio input processing: Whisper-style log-mel frontend.

Reference analog: the audio half of srt/multimodal/processors (whisper-like
feature extraction feeding audio-LLMs such as glmasr/gemma3n_audio).
Numerics follow WhisperFeatureExtractor: 16 kHz, n_fft=400, hop=160, Hann
window, 80 Slaney-scale mel filters, log10 clamped to max-8, scaled
(x+4)/4.
"""

from __future__ import annotations

import hashlib
from typing import Tuple

import numpy as np

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
N_MELS = 80


def _hz_to_mel(f):
    # Slaney scale (librosa default, what Whisper uses)
    f = np.asarray(f, np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + 27.0 * np.log(np.maximum(f, 1e-10) / 1000.0) / np.log(6.4),
        mel,
    )
    return mel


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) * (m - 15.0) / 27.0), f)
    return f


def mel_filter_bank(n_mels: int = N_MELS, n_fft: int = N_FFT,
                    sr: int = SAMPLE_RATE) -> np.ndarray:
    """[n_mels, n_fft//2 + 1] Slaney-normalized triangular filters."""
    fmax = sr / 2.0
    mels = np.linspace(_hz_to_mel(0.0), _hz_to_mel(fmax), n_mels + 2)
    freqs = _mel_to_hz(mels)
    fft_freqs = np.linspace(0, fmax, n_fft // 2 + 1)
    fb = np.zeros((n_mels, len(fft_freqs)))
    for i in range(n_mels):
        lo, ctr, hi = freqs[i], freqs[i + 1], freqs[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-10)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-10)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
        fb[i] *= 2.0 / (hi - lo)  # Slaney area normalization
    return fb.astype(np.float32)


def log_mel_spectrogram(waveform: np.ndarray,
                        n_frames: int = 3000) -> np.ndarray:
    """waveform [T] float32 at 16 kHz -> log-mel [n_mels, n_frames]
    (pad/truncate to 30 s like WhisperFeatureExtractor)."""
    target = n_frames * HOP
    w = np.zeros((target,), np.float32)
    w[: min(len(waveform), target)] = waveform[:target]
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float64)
    # center-padded (reflect) frames, matching torch.stft(center=True)
    pad = N_FFT // 2
    wp = np.pad(w.astype(np.float64), pad, mode="reflect")
    n_cols = 1 + (len(wp) - N_FFT) // HOP
    idx = np.arange(N_FFT)[None, :] + HOP * np.arange(n_cols)[:, None]
    frames = wp[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, axis=1)) ** 2  # [cols, F]
    spec = spec[:n_frames].T  # [F, n_frames] (drop the trailing frame)
    mel = mel_filter_bank() @ spec.astype(np.float32)
    log_spec = np.log10(np.maximum(mel, 1e-10))
    log_spec = np.maximum(log_spec, log_spec.max() - 8.0)
    return ((log_spec + 4.0) / 4.0).astype(np.float32)


class AudioProcessor:
    """Waveform -> (input_features [n_mels, 3000], content hash)."""

    def __init__(self, n_frames: int = 3000):
        self.n_frames = n_frames

    @property
    def num_tokens(self) -> int:
        # whisper encoder downsamples 2x: 3000 frames -> 1500 embeddings
        return self.n_frames // 2

    def preprocess(self, waveform: np.ndarray) -> Tuple[np.ndarray, bytes]:
        wav = np.asarray(waveform, np.float32).reshape(-1)
        feats = log_mel_spectrogram(wav, self.n_frames)
        digest = hashlib.sha256(np.ascontiguousarray(wav)).digest()
        return feats, digest
