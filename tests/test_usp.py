"""Ulysses + ring sequence-parallel attention vs local full attention
(reference analog: multimodal_gen usp tests)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sglang_diffusion_tpu.diffusion.models.dit import joint_attention
from sglang_diffusion_tpu.diffusion.usp import ring_attention, ulysses_attention

needs_devices = pytest.mark.skipif(
    jax.device_count() < 4, reason="needs >= 4 devices"
)


def make_qkv(b=2, t=32, h=4, d=16, seed=0):
    rng = np.random.default_rng(seed)
    return tuple(
        jnp.asarray(rng.normal(size=(b, t, h, d)), jnp.float32) for _ in range(3)
    )


@needs_devices
@pytest.mark.parametrize("fn", [ulysses_attention, ring_attention])
def test_sp_matches_local(fn):
    q, k, v = make_qkv()
    ref = joint_attention(q, k, v, 0.25)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    qs, ks, vs = (jax.device_put(x, sh) for x in (q, k, v))
    out = fn(qs, ks, vs, 0.25, mesh)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@needs_devices
def test_ring_handles_sp_gt_heads():
    # ring attention works when sp degree > num heads (ulysses cannot)
    q, k, v = make_qkv(h=2)
    ref = joint_attention(q, k, v, 0.25)
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    sh = NamedSharding(mesh, P(None, "sp", None, None))
    out = ring_attention(
        *(jax.device_put(x, sh) for x in (q, k, v)), 0.25, mesh
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@needs_devices
def test_pipeline_with_sp_mesh_matches_local():
    """Full diffusion pipeline under Ulysses SP produces identical images."""
    from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
    from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
    from sglang_diffusion_tpu.diffusion.models.text_encoder import TextEncoderConfig
    from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig

    kw = dict(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=2, num_heads=4, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3),
        # txt 60 + img (64/8/2)^2=16 -> T=76, divisible by sp=4
        te_cfg=TextEncoderConfig(hidden_size=64, num_layers=1, num_heads=2, max_len=60),
    )
    ref = DiffGenerator.from_config(**kw).generate(
        "sp test", height=64, width=64, num_inference_steps=2, seed=5
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    sp = DiffGenerator.from_config(**kw, sp_mesh=mesh).generate(
        "sp test", height=64, width=64, num_inference_steps=2, seed=5
    )
    np.testing.assert_allclose(
        ref["images"].astype(np.int32), sp["images"].astype(np.int32), atol=1
    )


@pytest.mark.skipif(jax.device_count() < 2, reason="needs >= 2 devices")
def test_cfg_parallel_matches_local():
    """CFG-parallel (cond/uncond sharded over a 2-device axis) matches the
    single-device CFG result."""
    from sglang_diffusion_tpu.diffusion.generator import DiffGenerator
    from sglang_diffusion_tpu.diffusion.models.dit import DiTConfig
    from sglang_diffusion_tpu.diffusion.models.text_encoder import TextEncoderConfig
    from sglang_diffusion_tpu.diffusion.models.vae import VAEConfig

    kw = dict(
        dit_cfg=DiTConfig(
            hidden_size=64, depth=2, num_heads=2, text_dim=64, in_channels=4
        ),
        vae_cfg=VAEConfig(latent_channels=4, base_channels=8, num_upsamples=3),
        te_cfg=TextEncoderConfig(hidden_size=64, num_layers=1, num_heads=2),
    )
    gen_kw = dict(
        height=32, width=32, num_inference_steps=2, seed=4,
        guidance_scale=4.0, negative_prompt="bad",
    )
    ref = DiffGenerator.from_config(**kw).generate("cfgp", **gen_kw)
    mesh = Mesh(np.array(jax.devices()[:2]), ("cfg",))
    par = DiffGenerator.from_config(**kw, cfg_mesh=mesh).generate("cfgp", **gen_kw)
    np.testing.assert_allclose(
        ref["images"].astype(np.int32), par["images"].astype(np.int32), atol=1
    )
