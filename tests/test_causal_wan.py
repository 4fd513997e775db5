"""Causal / self-forcing Wan denoising (diffusion/causal_wan.py).

Reference analog: CausalDMDDenoisingStage
(pipelines_core/stages/causal_denoising.py) + causal_wanvideo.py.

Invariants:
- a single block with empty context is EXACTLY the bidirectional Wan
  forward (the causal machinery degenerates to full attention);
- later blocks see earlier blocks through the KV cache (context flows);
- generation is deterministic and shape-correct.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sglang_diffusion_tpu.diffusion.causal_wan import (
    generate_causal_video,
    make_causal_block_forward,
)
from sglang_diffusion_tpu.diffusion.models.dit import patchify_video
from sglang_diffusion_tpu.diffusion.models.wan import WanDiT, wan_rope_3d
from sglang_diffusion_tpu.diffusion.wan_pipeline import tiny_wan_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_wan_config()
    params = WanDiT.init_params(jax.random.PRNGKey(0), cfg, jnp.bfloat16)
    rng = np.random.default_rng(0)
    lat = jnp.asarray(rng.standard_normal((1, 4, 8, 8, 4)), jnp.float32)
    txt = jnp.asarray(rng.standard_normal((1, 16, cfg.text_dim)),
                      jnp.bfloat16)
    return cfg, params, lat, txt


def test_single_block_matches_full_forward(setup):
    cfg, params, lat, txt = setup
    f, gh, gw = 4, 4, 4
    tokens, grid = patchify_video(lat, 2)
    t_all = tokens.shape[1]
    fwd_full = WanDiT.make_forward(cfg)
    ts = jnp.full((1,), 500.0, jnp.float32)
    want = fwd_full(params, tokens.astype(jnp.bfloat16), txt, ts, grid)

    fwd_c = make_causal_block_forward(cfg, max_ctx_tokens=t_all)
    cos, sin = wan_rope_3d(grid, cfg.head_dim, cfg.rope_theta)
    kv_k = jnp.zeros((cfg.num_layers, 1, t_all, cfg.num_heads, cfg.head_dim),
                     jnp.bfloat16)
    kv_v = jnp.zeros_like(kv_k)
    got, _, _ = fwd_c(
        params, kv_k, kv_v, tokens.astype(jnp.bfloat16), txt, ts,
        cos, sin, jnp.asarray(0), jnp.asarray(False), 0,
    )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        atol=2e-2, rtol=2e-2,
    )


def test_context_flows_between_blocks(setup):
    cfg, params, lat, txt = setup
    key = jax.random.PRNGKey(3)
    out1 = generate_causal_video(
        params, cfg, lat, txt, dmd_steps=[999, 500], num_frames_per_block=2,
        key=key,
    )
    assert out1.shape == (1, 4, 8, 8, 4)
    assert np.isfinite(np.asarray(out1, np.float32)).all()
    # perturb ONLY the first block's noise: the second block's output must
    # change (it attends the first block's cached context)
    lat2 = lat.at[:, 0].add(1.0)
    out2 = generate_causal_video(
        params, cfg, lat2, txt, dmd_steps=[999, 500],
        num_frames_per_block=2, key=key,
    )
    second_block_delta = np.abs(
        np.asarray(out1[:, 2:], np.float32) - np.asarray(out2[:, 2:],
                                                         np.float32)
    ).max()
    assert second_block_delta > 1e-4

    # deterministic repeat
    out3 = generate_causal_video(
        params, cfg, lat, txt, dmd_steps=[999, 500], num_frames_per_block=2,
        key=key,
    )
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out3))


def test_compiled_cache_reuse(setup):
    """Blocks share one compiled executable via the caller-owned cache."""
    cfg, params, lat, txt = setup
    cache = {}
    generate_causal_video(
        params, cfg, lat, txt, dmd_steps=[999], num_frames_per_block=2,
        key=jax.random.PRNGKey(1), _compiled_cache=cache,
    )
    assert "block_step" in cache
    generate_causal_video(
        params, cfg, lat, txt, dmd_steps=[999], num_frames_per_block=2,
        key=jax.random.PRNGKey(2), _compiled_cache=cache,
    )
