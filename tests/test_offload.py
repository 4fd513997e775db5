"""Layerwise CPU offload (reference analog:
multimodal_gen/runtime/utils/layerwise_offload.py): block weights staged
to host, streamed per group with double buffering — numerics must equal
the fully-resident denoise."""

import numpy as np

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.offload import (
    OffloadedBlocks,
    make_offloaded_denoise,
)
from sglang_diffusion_tpu.diffusion.pipeline import DiffusionPipeline


def test_offloaded_denoise_matches_resident():
    pipe = DiffusionPipeline(dtype=jnp.float32)
    rng = np.random.default_rng(0)
    h = w = 32 // 8
    lat = jnp.asarray(
        rng.standard_normal((1, h, w, pipe.dit_cfg.in_channels)),
        jnp.float32)
    emb = jnp.asarray(
        rng.standard_normal((1, 6, pipe.dit_cfg.text_dim)) * 0.3,
        jnp.float32)
    sigmas = jnp.linspace(1.0, 0.0, 5)

    ref = pipe.run_denoise(lat, emb, emb, sigmas, 1.0)
    if isinstance(ref, tuple):
        ref = ref[0]

    run = make_offloaded_denoise(pipe, num_groups=2)
    assert pipe.params["dit"]["blocks"] is None  # device copy freed
    assert run.device_bytes_per_group > 0
    out = run(lat, emb, sigmas)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_offload_group_validation():
    import pytest

    pipe = DiffusionPipeline(dtype=jnp.float32)
    blocks = pipe.params["dit"]["blocks"]
    n = jax.tree_util.tree_leaves(blocks)[0].shape[0]
    with pytest.raises(ValueError):
        OffloadedBlocks(blocks, n + 1)
