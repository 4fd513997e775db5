"""Hunyuan3D shape pipeline (reference analogs:
runtime/models/dits/hunyuan3d.py:410, runtime/models/vaes/
hunyuan3d_vae.py:1143, pipelines/hunyuan3d_pipeline.py:45)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sglang_diffusion_tpu.diffusion.hunyuan3d import (
    Hunyuan3DConfig,
    Hunyuan3DDiT,
    Hunyuan3DPipeline,
    ShapeVAE,
    ShapeVAEConfig,
    flow_match_sigmas,
    fourier_embed,
)
from sglang_diffusion_tpu.diffusion.mesh import (
    export_mesh,
    grid_to_mesh,
    marching_tetrahedra,
)

TINY_DIT = Hunyuan3DConfig(
    in_channels=8, context_in_dim=16, hidden_size=64, num_heads=4,
    depth=2, depth_single_blocks=2, num_latents=32,
)
TINY_VAE = ShapeVAEConfig(
    num_latents=32, embed_dim=8, width=64, heads=4,
    num_decoder_layers=2, num_freqs=4,
)


def _sphere_grid(n=33, r=0.6, bounds=1.01):
    xs = np.linspace(-bounds, bounds, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(xs, xs, xs, indexing="ij")
    # inside-positive signed field, zero at radius r
    return r - np.sqrt(X**2 + Y**2 + Z**2)


def test_marching_tetrahedra_sphere():
    grid = _sphere_grid()
    verts, faces = grid_to_mesh(grid, level=0.0, bounds=1.01)
    assert len(verts) > 200 and len(faces) > 400
    radii = np.linalg.norm(verts, axis=1)
    # every vertex sits on the isosurface within one cell diagonal
    cell = 2 * 1.01 / 32
    assert np.all(np.abs(radii - 0.6) < cell * 2)
    # faces index valid vertices, no degenerate triangles
    assert faces.max() < len(verts)
    assert np.all(faces[:, 0] != faces[:, 1])
    # closed surface: every edge is shared by exactly two faces
    edges = np.concatenate([
        faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert np.all(counts == 2)


def test_marching_tetrahedra_empty_and_full():
    v, f = marching_tetrahedra(np.full((8, 8, 8), -1.0, np.float32))
    assert len(v) == 0 and len(f) == 0
    v, f = marching_tetrahedra(np.full((8, 8, 8), 1.0, np.float32))
    assert len(v) == 0 and len(f) == 0


def test_mesh_export_formats():
    grid = _sphere_grid(n=17)
    verts, faces = grid_to_mesh(grid)
    obj = export_mesh(verts, faces, "obj").decode()
    assert obj.count("v ") >= len(verts) and obj.count("f ") == len(faces)
    ply = export_mesh(verts, faces, "ply").decode()
    assert f"element vertex {len(verts)}" in ply
    with pytest.raises(ValueError):
        export_mesh(verts, faces, "stl")


def test_fourier_embed_dims_and_values():
    x = jnp.array([[0.5, -0.25, 1.0]])
    out = fourier_embed(x, num_freqs=4, include_pi=False)
    assert out.shape == (1, 3 * (2 * 4 + 1))
    # first 3 entries are the raw input
    np.testing.assert_allclose(np.asarray(out)[0, :3], [0.5, -0.25, 1.0])
    # coordinate-major interleave: entry 3 is sin(x0 * 2^0)
    np.testing.assert_allclose(
        float(out[0, 3]), np.sin(0.5), rtol=1e-6)


def test_dit_forward_shape_and_time_sensitivity():
    fwd = jax.jit(Hunyuan3DDiT.make_forward(TINY_DIT))
    params = Hunyuan3DDiT.init_params(
        jax.random.PRNGKey(0), TINY_DIT, jnp.float32)
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 8))
    cond = jax.random.normal(jax.random.PRNGKey(2), (2, 7, 16))
    out0 = fwd(params, lat, cond, jnp.array([0.1, 0.1]))
    assert out0.shape == (2, 32, 8)
    out1 = fwd(params, lat, cond, jnp.array([0.9, 0.9]))
    assert not np.allclose(np.asarray(out0), np.asarray(out1))
    # permutation equivariance: no positional embedding on the latent set
    perm = np.random.RandomState(0).permutation(32)
    out_p = fwd(params, lat[:, perm], cond, jnp.array([0.1, 0.1]))
    np.testing.assert_allclose(
        np.asarray(out0)[:, perm], np.asarray(out_p), atol=2e-4)


def test_vae_sdf_grid_shapes():
    params = ShapeVAE.init_params(
        jax.random.PRNGKey(0), TINY_VAE, jnp.float32)
    sdf_fn = jax.jit(ShapeVAE.make_sdf_grid_fn(
        TINY_VAE, resolution=8, chunk=128))
    lat = jax.random.normal(jax.random.PRNGKey(1), (2, 32, 8))
    grid = sdf_fn(params, lat)
    assert grid.shape == (2, 9, 9, 9)
    assert np.all(np.isfinite(np.asarray(grid)))
    # chunking must not affect values
    sdf_fn2 = jax.jit(ShapeVAE.make_sdf_grid_fn(
        TINY_VAE, resolution=8, chunk=64))
    np.testing.assert_allclose(
        np.asarray(grid), np.asarray(sdf_fn2(params, lat)), atol=1e-4)


def test_flow_match_sigmas_shift():
    s = flow_match_sigmas(10, shift=1.0)
    assert s[0] == 1.0 and s[-1] == 0.0 and len(s) == 11
    s3 = flow_match_sigmas(10, shift=3.0)
    assert s3[0] == 1.0 and s3[-1] == 0.0
    assert s3[5] > s[5]  # shift>1 spends more steps at high noise


def test_pipeline_end_to_end_tiny():
    pipe = Hunyuan3DPipeline(
        TINY_DIT, TINY_VAE, dtype=jnp.float32, guidance_scale=2.0)
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, 5, 16))
    meshes = pipe.generate(cond, num_steps=2, resolution=8, chunk=128)
    assert len(meshes) == 1
    verts, faces = meshes[0]
    # random weights: mesh may be empty or not, but shapes must be valid
    assert verts.ndim == 2 and verts.shape[1] == 3
    assert faces.ndim == 2 and faces.shape[1] == 3
    if len(faces):
        assert faces.max() < len(verts)
