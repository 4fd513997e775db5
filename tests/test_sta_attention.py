"""Sliding Tile Attention for video diffusion (reference analog: the STA
backend under multimodal_gen/runtime/layers/attention/backends/)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.models.dit import joint_attention
from sglang_diffusion_tpu.diffusion.sparse_attention import (
    _neighbor_table,
    make_sta_attention,
)


def _qkv(t, b=1, h=2, d=8, seed=0):
    rng = np.random.default_rng(seed)
    return [
        jnp.asarray(rng.standard_normal((b, t, h, d)), jnp.float32)
        for _ in range(3)
    ]


def test_neighbor_table():
    idx, valid = _neighbor_table((2, 2, 2), (1, 1, 1))
    assert idx.shape == (8, 27)
    # corner tile: only 8 valid neighbors (2x2x2 region)
    assert valid[0].sum() == 8
    assert valid.all(axis=1).sum() == 0  # 2^3 grid: no tile has full window


def test_full_window_equals_dense():
    """A window covering the whole grid must reproduce dense attention."""
    grid, tile = (2, 4, 4), (1, 2, 2)
    text_len = 3
    t = text_len + 2 * 4 * 4
    q, k, v = _qkv(t)
    dense = joint_attention(q, k, v, 0.3)
    sta = make_sta_attention(grid, tile, window=(2, 2, 2), text_len=text_len)
    got = sta(q, k, v, 0.3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(dense), atol=2e-5)


def test_small_window_is_local():
    """With a 0-radius window a video token's output must not depend on
    far-away video tokens (only same tile + text)."""
    grid, tile = (1, 4, 4), (1, 2, 2)
    text_len = 2
    t = text_len + 16
    q, k, v = _qkv(t, seed=1)
    sta = make_sta_attention(grid, tile, window=(0, 0, 0), text_len=text_len)
    base = np.asarray(sta(q, k, v, 0.3))
    # perturb a far tile's K/V (tile (1,1): tokens with h>=2, w>=2)
    k2 = np.asarray(k).copy()
    v2 = np.asarray(v).copy()
    far = [text_len + r * 4 + c for r in (2, 3) for c in (2, 3)]
    k2[0, far] += 10.0
    v2[0, far] -= 5.0
    out2 = np.asarray(sta(q, jnp.asarray(k2), jnp.asarray(v2), 0.3))
    near = [text_len + r * 4 + c for r in (0, 1) for c in (0, 1)]
    np.testing.assert_allclose(out2[0, near], base[0, near], atol=1e-6)
    # but the far tile itself changed
    assert not np.allclose(out2[0, far], base[0, far])
    # and text queries (dense) see the change
    assert not np.allclose(out2[0, :text_len], base[0, :text_len])


def test_sta_flops_scale_with_window():
    """Structural check: neighbor context length = K * tile_size."""
    grid, tile = (4, 8, 8), (2, 4, 4)
    sta_small = make_sta_attention(grid, tile, (0, 1, 1), text_len=0)
    sta_big = make_sta_attention(grid, tile, (1, 1, 1), text_len=0)
    t = 4 * 8 * 8
    q, k, v = _qkv(t, seed=2)
    # both run and produce finite outputs
    a = np.asarray(sta_small(q, k, v, 0.3))
    b = np.asarray(sta_big(q, k, v, 0.3))
    assert np.isfinite(a).all() and np.isfinite(b).all()
    assert not np.allclose(a, b)


def test_sta_pipeline_video_generation():
    """STA wired into the video denoise path: runs e2e, differs from dense,
    deterministic."""
    import jax.numpy as jnp

    from sglang_diffusion_tpu.diffusion.pipeline import (
        DiffusionPipeline,
        GenerationParams,
    )

    dense = DiffusionPipeline(dtype=jnp.float32)
    sta = DiffusionPipeline(
        dtype=jnp.float32, params=dense.params,
        sta={"tile": (1, 2, 2), "window": (0, 1, 1)},
    )
    gp = dict(prompt="v", height=32, width=32, num_frames=2,
              num_inference_steps=2, seed=0)
    a = dense.forward(GenerationParams(**gp)).images
    b = sta.forward(GenerationParams(**gp)).images
    b2 = sta.forward(GenerationParams(**gp)).images
    assert a.shape == b.shape == (1, 2, 32, 32, 3)
    assert np.array_equal(b, b2)
    assert not np.array_equal(a, b)  # sparse window changes attention
