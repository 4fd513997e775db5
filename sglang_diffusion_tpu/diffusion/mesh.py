"""Isosurface extraction + mesh export for the Hunyuan3D shape pipeline.

Reference analog: multimodal_gen/runtime/models/vaes/hunyuan3d_vae.py:1056
(MCSurfaceExtractor via skimage marching_cubes) and the trimesh-based
export in stages/hunyuan3d_shape.py. This environment has neither
skimage nor trimesh, so surface extraction is implemented directly:
**marching tetrahedra** — each grid cube splits into 6 tetrahedra around
the main diagonal; every tet contributes 0/1/2 triangles with vertices
interpolated on its crossed edges. Table-free (the 16 tet cases reduce
to "one corner in" / "two corners in" and their complements), fully
vectorized over all cubes per tet, and independent of SDF sign
convention. The SDF grid itself is produced on the TPU (hunyuan3d.py);
extraction is a host-side numpy pass like the reference's.
"""

from __future__ import annotations

import io
from typing import List, Optional, Tuple

import numpy as np

# 8 cube corners in (x, y, z) bit order
_CORNERS = np.array(
    [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
     (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1)],
    dtype=np.int64,
)
# 6-tet decomposition of the cube, every tet sharing main diagonal 0-6
_TETS = np.array(
    [(0, 5, 1, 6), (0, 1, 2, 6), (0, 2, 3, 6),
     (0, 3, 7, 6), (0, 7, 4, 6), (0, 4, 5, 6)],
    dtype=np.int64,
)
# local tet edges, indexed 0..5
_TET_EDGES = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _tet_case_tris(case: int) -> List[Tuple[int, int, int]]:
    """Triangles (as triples of tet-edge indices) for one in/out case."""
    inside = [i for i in range(4) if case & (1 << i)]
    if len(inside) > 2:  # complement: same surface, reversed winding
        return [t[::-1] for t in _tet_case_tris(case ^ 0xF)]
    edge_no = {frozenset(e): i for i, e in enumerate(_TET_EDGES)}
    if len(inside) == 1:
        a = inside[0]
        e = [edge_no[frozenset((a, b))] for b in range(4) if b != a]
        return [(e[0], e[1], e[2])]
    if len(inside) == 2:
        a, b = inside
        c, d = [v for v in range(4) if v not in inside]
        # crossed edges form the quad cycle (a,c) (a,d) (b,d) (b,c)
        q = [edge_no[frozenset(p)] for p in ((a, c), (a, d), (b, d), (b, c))]
        return [(q[0], q[1], q[2]), (q[0], q[2], q[3])]
    return []


_CASE_TRIS = [_tet_case_tris(c) for c in range(16)]


def marching_tetrahedra(
    grid: np.ndarray, level: float = 0.0
) -> Tuple[np.ndarray, np.ndarray]:
    """Extract the `level` isosurface of a scalar grid [Nx, Ny, Nz].

    Returns (vertices [V, 3] in grid-index coordinates, faces [F, 3]).
    Vertices are deduplicated so shared edges produce shared vertices.
    """
    grid = np.asarray(grid, np.float32)
    nx, ny, nz = grid.shape
    if min(nx, ny, nz) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    # cube-corner values: [ncubes, 8]
    base = np.stack(
        np.meshgrid(np.arange(nx - 1), np.arange(ny - 1),
                    np.arange(nz - 1), indexing="ij"),
        axis=-1,
    ).reshape(-1, 3)
    corner_pos = base[:, None, :] + _CORNERS[None, :, :]  # [n, 8, 3]
    vals = grid[corner_pos[..., 0], corner_pos[..., 1], corner_pos[..., 2]]
    inside = vals > level

    tris: List[np.ndarray] = []
    for tet in _TETS:
        tv = vals[:, tet]                      # [n, 4]
        tp = corner_pos[:, tet, :].astype(np.float32)  # [n, 4, 3]
        case = (inside[:, tet] << np.arange(4)).sum(axis=1)
        for c in range(1, 15):
            rows = np.nonzero(case == c)[0]
            if rows.size == 0 or not _CASE_TRIS[c]:
                continue
            v_r, p_r = tv[rows], tp[rows]
            # canonical endpoint order per edge (by grid index) so the
            # same physical edge interpolates bit-identically in every
            # tet/cube that touches it — required for exact welding
            key_r = (
                p_r[..., 0] * (ny * nz) + p_r[..., 1] * nz + p_r[..., 2]
            )
            # interpolated point on each needed tet edge
            epts = {}
            for tri in _CASE_TRIS[c]:
                for e in tri:
                    if e in epts:
                        continue
                    i, j = _TET_EDGES[e]
                    swap = (key_r[:, i] > key_r[:, j])[:, None]
                    pi = np.where(swap, p_r[:, j, :], p_r[:, i, :])
                    pj = np.where(swap, p_r[:, i, :], p_r[:, j, :])
                    si = np.where(swap[:, 0], v_r[:, j], v_r[:, i])
                    sj = np.where(swap[:, 0], v_r[:, i], v_r[:, j])
                    t = (level - si) / np.where(sj != si, sj - si, 1.0)
                    t = np.clip(t, 0.0, 1.0)[:, None]
                    epts[e] = pi * (1 - t) + pj * t
            for tri in _CASE_TRIS[c]:
                tris.append(np.stack([epts[e] for e in tri], axis=1))
    if not tris:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)
    tri_pts = np.concatenate(tris, axis=0)  # [F, 3, 3]
    flat = tri_pts.reshape(-1, 3)
    # weld: shared edge points are bit-identical up to fp noise
    key = np.round(flat * 1e5).astype(np.int64)
    _, first, inv = np.unique(
        key, axis=0, return_index=True, return_inverse=True)
    verts = flat[first]
    faces = inv.reshape(-1, 3)
    # drop degenerate triangles (two welded corners)
    ok = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    return verts.astype(np.float32), faces[ok]


def grid_to_mesh(
    grid: np.ndarray,
    level: float = 0.0,
    bounds: float | Tuple[float, ...] = 1.01,
) -> Tuple[np.ndarray, np.ndarray]:
    """SDF grid -> world-space mesh, matching the reference's vertex
    scaling (hunyuan3d_vae.py:1063-1070: v/grid_size*bbox_size+bbox_min)."""
    verts, faces = marching_tetrahedra(grid, level)
    if isinstance(bounds, (int, float)):
        bounds = (-bounds, -bounds, -bounds, bounds, bounds, bounds)
    bmin = np.asarray(bounds[:3], np.float32)
    bsize = np.asarray(bounds[3:6], np.float32) - bmin
    gsize = np.asarray(grid.shape, np.float32)
    return verts / gsize * bsize + bmin, faces


def export_obj(verts: np.ndarray, faces: np.ndarray) -> bytes:
    buf = io.StringIO()
    for v in verts:
        buf.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
    for f in faces:
        buf.write(f"f {f[0] + 1} {f[1] + 1} {f[2] + 1}\n")
    return buf.getvalue().encode()


def export_ply(verts: np.ndarray, faces: np.ndarray) -> bytes:
    head = (
        "ply\nformat ascii 1.0\n"
        f"element vertex {len(verts)}\n"
        "property float x\nproperty float y\nproperty float z\n"
        f"element face {len(faces)}\n"
        "property list uchar int vertex_indices\nend_header\n"
    )
    buf = io.StringIO()
    buf.write(head)
    for v in verts:
        buf.write(f"{v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
    for f in faces:
        buf.write(f"3 {f[0]} {f[1]} {f[2]}\n")
    return buf.getvalue().encode()


def export_mesh(verts: np.ndarray, faces: np.ndarray,
                fmt: str = "obj") -> bytes:
    if fmt == "obj":
        return export_obj(verts, faces)
    if fmt == "ply":
        return export_ply(verts, faces)
    raise ValueError(f"unsupported mesh format {fmt!r}; have obj/ply")
