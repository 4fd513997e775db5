"""EVS: Efficient Video Sampling — temporal-similarity token pruning.

Reference analog: srt/multimodal/evs/evs_core.py (itself the vLLM EVS
port): after the vision tower encodes a video, merged tokens whose
embedding barely changed from the SAME spatial location in the previous
frame are dropped. The first frame is always fully retained; remaining
token budget = max(tokens_per_frame, total * (1 - q)) goes to the most
DISSIMILAR tokens (stable order). Retained tokens keep their original
(t, h, w) M-RoPE coordinates."""

from __future__ import annotations

from typing import Tuple

import numpy as np


def compute_retained_tokens_count(
    tokens_per_frame: int, num_frames: int, q: float
) -> int:
    """Budget after pruning at rate q; never below one full frame
    (reference evs_core.py compute_retained_tokens_count)."""
    total = tokens_per_frame * num_frames
    return max(tokens_per_frame, int(total * (1.0 - q)))


def compute_retention_mask(
    video_embeds: np.ndarray,  # [T*LH*LW, E] merged video tokens
    grid: Tuple[int, int, int],  # (T, LH, LW) merged grid
    q: float,
) -> np.ndarray:
    """bool [T*LH*LW] — True = keep (reference evs_core.py
    compute_retention_mask; numpy, runs on host once per video)."""
    t, lh, lw = grid
    e = video_embeds.reshape(t, lh, lw, -1).astype(np.float32)
    a, b = e[1:], e[:-1]
    denom = np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1)
    sim = (a * b).sum(-1) / np.maximum(denom, 1e-8)
    dissim = 1.0 - sim  # [T-1, LH, LW]
    # first frame: forced-keep sentinel (reference uses 255)
    dissim = np.concatenate(
        [np.full((1, lh, lw), 255.0, np.float32), dissim], axis=0
    )
    flat = dissim.reshape(-1)
    order = np.argsort(-flat, kind="stable")
    retain = compute_retained_tokens_count(lh * lw, t, q)
    mask = np.zeros((flat.shape[0],), bool)
    mask[order[:retain]] = True
    return mask
