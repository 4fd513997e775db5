"""Parallel (spatially-tiled) VAE decode over an sp mesh axis
(reference analog: multimodal_gen/runtime/models/vaes/parallel/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from sglang_diffusion_tpu.diffusion.models.vae import (
    VAEConfig,
    VAEDecoder,
    make_parallel_decode,
)


@pytest.mark.parametrize("sp", [2, 4])
def test_parallel_decode_matches_serial(sp):
    devs = np.array(jax.devices()[:sp])
    mesh = Mesh(devs, ("sp",))
    cfg = VAEConfig(latent_channels=4, base_channels=16, num_upsamples=2,
                    num_res_blocks=1)
    params = VAEDecoder.init_params(jax.random.PRNGKey(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.standard_normal((1, 16, 12, 4)), jnp.float32)
    want = np.asarray(VAEDecoder.apply(params, z, cfg))
    pdec = make_parallel_decode(cfg, mesh, halo=8)
    got = np.asarray(jax.jit(pdec)(params, z))
    assert got.shape == want.shape == (1, 64, 48, 3)
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_parallel_decode_batch2():
    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    cfg = VAEConfig(latent_channels=4, base_channels=8, num_upsamples=1,
                    num_res_blocks=1)
    params = VAEDecoder.init_params(jax.random.PRNGKey(1), cfg, jnp.float32)
    z = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 8, 8, 4)), jnp.float32
    )
    want = np.asarray(VAEDecoder.apply(params, z, cfg))
    got = np.asarray(jax.jit(make_parallel_decode(cfg, mesh, halo=6))(params, z))
    np.testing.assert_allclose(got, want, atol=2e-5)
