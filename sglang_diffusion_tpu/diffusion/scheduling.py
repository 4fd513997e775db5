"""Diffusion noise schedulers.

Reference analog: multimodal_gen/runtime/models/schedulers/ (flow-match
Euler, UniPC, self-forcing). Round 1 ships FlowMatchEuler — the scheduler
used by Flux / Wan / Qwen-Image / Z-Image — with the dynamic time-shift
used by Flux-family models.

Flow matching: x_t = (1 - sigma_t) x_0 + sigma_t eps, model predicts the
velocity v = eps - x_0; the Euler step moves x along v by (sigma_{t+1} -
sigma_t). All schedule math is host-side numpy; the step update itself is
pure jnp so it can live inside the compiled denoise loop.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import Optional

import jax.numpy as jnp
import numpy as np


def time_shift(sigmas: np.ndarray, shift: float) -> np.ndarray:
    """Static time shift: sigma' = shift*s / (1 + (shift-1)*s)."""
    return shift * sigmas / (1.0 + (shift - 1.0) * sigmas)


def dynamic_shift_for_seq_len(
    seq_len: int,
    base_seq_len: int = 256,
    max_seq_len: int = 4096,
    base_shift: float = 0.5,
    max_shift: float = 1.15,
) -> float:
    """Flux-style resolution-dependent shift (mu), linear in seq_len."""
    m = (max_shift - base_shift) / (max_seq_len - base_seq_len)
    b = base_shift - m * base_seq_len
    mu = seq_len * m + b
    return math.exp(mu)


@dataclass
class FlowMatchEulerScheduler:
    num_train_timesteps: int = 1000
    shift: float = 1.0
    use_dynamic_shifting: bool = False

    def set_timesteps(
        self,
        num_inference_steps: int,
        seq_len: Optional[int] = None,
    ) -> np.ndarray:
        """Returns sigmas [num_steps + 1] from ~1.0 down to 0.0."""
        sigmas = np.linspace(1.0, 1.0 / self.num_train_timesteps, num_inference_steps)
        if self.use_dynamic_shifting and seq_len is not None:
            shift = dynamic_shift_for_seq_len(seq_len)
        else:
            shift = self.shift
        if shift != 1.0:
            sigmas = time_shift(sigmas, shift)
        sigmas = np.append(sigmas, 0.0).astype(np.float32)
        self.sigmas = sigmas
        self.timesteps = (sigmas[:-1] * self.num_train_timesteps).astype(np.float32)
        return sigmas

    @staticmethod
    def scale_noise(sample, sigma, noise):
        """Forward process: x_t = (1-sigma) x0 + sigma*eps."""
        return (1.0 - sigma) * sample + sigma * noise

    @staticmethod
    def step(model_output, sample, sigma, sigma_next):
        """Euler step along predicted velocity."""
        return sample + (sigma_next - sigma) * model_output
