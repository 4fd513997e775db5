"""FlowMatch UniPC scheduler: convergence order + pipeline integration.

Without diffusers in the image, correctness is established by (a) exact
agreement with Euler in the many-step limit on a nonlinear ODE, and (b) the
multistep method's error shrinking ~quadratically vs Euler's ~linearly —
the defining property of the order-2 predictor-corrector.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.scheduling import (
    FlowMatchEulerScheduler,
    FlowMatchUniPCScheduler,
    get_scheduler,
)


def _velocity(x, sigma):
    """Flow-matching-style field: the model's data prediction m(x, s) is the
    smooth object (what UniPC's x0-parameterized integrator assumes), and
    v = (x - m) / s is stiff as s -> 0 — the regime where exponential
    multistep beats raw Euler."""
    m = jnp.tanh(x) + 0.3 * sigma
    return (x - m) / jnp.maximum(sigma, 1e-4)


def _integrate(sched, n_steps, x0):
    sigmas = np.linspace(1.0, 1.0 / 1000, n_steps)
    sigmas = np.append(sigmas, 0.0).astype(np.float32)
    sig = jnp.asarray(sigmas)
    step = sched.make_step(sig)
    state = sched.init_state(x0)
    x = x0
    for i in range(n_steps):
        v = _velocity(x, sig[i])
        x, state = step(jnp.int32(i), x, v, state)
    return np.asarray(x)


def _reference(x0, n=20000):
    return _integrate(FlowMatchEulerScheduler(), n, x0)


def test_unipc_converges_to_reference():
    x0 = jnp.asarray(np.linspace(-2, 2, 8), jnp.float32)
    ref = _reference(x0)
    got = _integrate(FlowMatchUniPCScheduler(), 2000, x0)
    np.testing.assert_allclose(got, ref, atol=2e-3)


def test_unipc_beats_euler_at_equal_steps():
    x0 = jnp.asarray(np.linspace(-2, 2, 8), jnp.float32)
    ref = _reference(x0)
    for n in (20, 40, 200):
        e_err = np.abs(_integrate(FlowMatchEulerScheduler(), n, x0) - ref).max()
        u_err = np.abs(_integrate(FlowMatchUniPCScheduler(), n, x0) - ref).max()
        assert u_err < 0.75 * e_err, (n, u_err, e_err)


def test_unipc_error_scales_superlinearly():
    """5x the steps shrinks UniPC error >4x (Euler manages ~2.5x on this
    stiff field)."""
    x0 = jnp.asarray(np.linspace(-2, 2, 8), jnp.float32)
    ref = _reference(x0)
    e40 = np.abs(_integrate(FlowMatchUniPCScheduler(), 40, x0) - ref).max()
    e200 = np.abs(_integrate(FlowMatchUniPCScheduler(), 200, x0) - ref).max()
    assert e40 / max(e200, 1e-9) > 4.0, (e40, e200)


def test_registry():
    assert isinstance(get_scheduler("unipc"), FlowMatchUniPCScheduler)
    assert isinstance(get_scheduler("euler"), FlowMatchEulerScheduler)
    with pytest.raises(KeyError):
        get_scheduler("ddim")


def test_pipeline_unipc_end_to_end():
    """Tiny T2I pipeline with sampler=unipc inside the compiled scan."""
    from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
    from sglang_diffusion_tpu.diffusion.pipeline import (
        DiffusionPipeline,
        GenerationParams,
    )

    pipe = DiffusionPipeline(
        dit_cfg=DiTConfig(hidden_size=32, depth=2, num_heads=2,
                          patch_size=2, in_channels=4, text_dim=32)
    )
    out_u = pipe.forward(GenerationParams(
        prompt="a red square", height=32, width=32,
        num_inference_steps=6, sampler="unipc", seed=3,
    ))
    assert out_u.images.shape == (1, 32, 32, 3)
    assert np.isfinite(out_u.images).all()
    out_e = pipe.forward(GenerationParams(
        prompt="a red square", height=32, width=32,
        num_inference_steps=6, sampler="euler", seed=3,
    ))
    # different integrators must differ at 6 steps but stay in the same
    # ballpark (same model, same noise)
    assert not np.array_equal(out_u.images, out_e.images)
