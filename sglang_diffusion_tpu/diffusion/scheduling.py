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

    # --- functional protocol for the compiled denoise scan ---
    def init_state(self, x):
        return ()

    def make_step(self, sigmas_arr):
        def step_fn(i, x, v, state):
            return x + (sigmas_arr[i + 1] - sigmas_arr[i]) * v, state

        return step_fn


@dataclass
class FlowMatchUniPCScheduler(FlowMatchEulerScheduler):
    """UniPC multistep (order 2, bh2 variant) for flow matching — the
    scheduler the reference uses for Wan video (multimodal_gen/runtime/
    models/schedulers/, diffusers UniPCMultistepScheduler with
    prediction_type="flow_prediction").

    Exponential-integrator multistep in lambda = ln(alpha/sigma) with data
    prediction x0 = x - sigma*v; each step runs a corrector for the
    previous update (using the fresh model output) then an order-2
    predictor with the stored x0 history. First step and the final
    sigma->0 step drop to order 1 (lower_order_final), whose sigma->0
    limit is exactly x = x0_pred. All branches are jnp.where-selected so
    the whole thing lives inside the compiled lax.scan.
    """

    solver_order: int = 2

    def init_state(self, x):
        return {
            "x_prev": x,
            "m_prev": jnp.zeros_like(x),
            "has_prev": jnp.float32(0.0),
        }

    def make_step(self, sigmas_arr):
        eps = 1e-4

        def lam(s):
            s = jnp.clip(s, eps, 1.0 - eps)
            return jnp.log((1.0 - s) / s)

        def safe(h):
            # adjacent sigmas inside the clip zone give h == 0; the h -> 0
            # limit of every term is finite, so nudge instead of 0/0
            return jnp.where(jnp.abs(h) < 1e-6, 1e-6, h)

        def step_fn(i, x, v, state):
            s_cur = sigmas_arr[i]
            s_next = sigmas_arr[i + 1]
            s_prev = sigmas_arr[jnp.maximum(i - 1, 0)]
            m0 = x - s_cur * v  # data prediction at the uncorrected sample

            # ---- corrector for the PREVIOUS step (uni_c, order 2) ----
            h_c = safe(lam(s_cur) - lam(s_prev))
            hh = -h_c
            h_phi_1 = jnp.expm1(hh)
            b_h = h_phi_1  # bh2
            rho_c = (h_phi_1 / hh - 1.0) / b_h
            alpha_cur = 1.0 - s_cur
            x_corr = (
                s_cur / jnp.maximum(s_prev, eps) * state["x_prev"]
                - alpha_cur * h_phi_1 * state["m_prev"]
                - alpha_cur * b_h * rho_c * (m0 - state["m_prev"])
            )
            use_corr = state["has_prev"] > 0.5
            # m0 stays evaluated at the UNCORRECTED sample (diffusers does
            # not re-run the model after uni_c)
            x = jnp.where(use_corr, x_corr, x)

            # ---- predictor to s_next (uni_p) ----
            s_next_eff = jnp.maximum(s_next, eps)
            h = safe(lam(s_next_eff) - lam(s_cur))
            hh_p = -h
            h_phi_1p = jnp.expm1(hh_p)
            b_hp = h_phi_1p
            alpha_next = 1.0 - s_next
            # order-1 term
            x1 = (
                s_next / jnp.maximum(s_cur, eps) * x
                - alpha_next * h_phi_1p * m0
            )
            # order-2 history term
            r0 = (lam(s_prev) - lam(s_cur)) / h
            d1 = (state["m_prev"] - m0) / jnp.where(
                jnp.abs(r0) < 1e-8, 1.0, r0
            )
            rho_p = (h_phi_1p / hh_p - 1.0) / b_hp
            x2 = x1 - alpha_next * b_hp * rho_p * d1
            final = s_next < eps
            order2_ok = use_corr & (~final) & (jnp.abs(r0) > 1e-8)
            x_new = jnp.where(order2_ok, x2, x1)
            # exact sigma->0 limit of the order-1 update is x0 itself
            x_new = jnp.where(final, m0, x_new)

            new_state = {
                "x_prev": x,
                "m_prev": m0,
                "has_prev": jnp.float32(1.0),
            }
            return x_new, new_state

        return step_fn


def get_scheduler(name: str, **kw):
    """Scheduler registry (reference analog: scheduler selection in
    pipeline configs)."""
    if name in ("euler", "flow_euler", "flow_match_euler"):
        return FlowMatchEulerScheduler(**kw)
    if name in ("unipc", "flow_unipc"):
        return FlowMatchUniPCScheduler(**kw)
    raise KeyError(f"unknown scheduler {name}")
