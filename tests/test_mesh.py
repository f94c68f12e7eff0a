"""Iso-surface extraction / smoothing / mesh booleans (ops.mesh).

Mirrors the reference's mesh toolchain contracts (SURVEY.md 2.2):
MaskToStl = mask -> marching cubes -> smooth -> STL (BabelDatasetPreps.py:87),
DoIntersect = FOV cone boolean (BabelDatasetPreps.py:264).
"""

import numpy as np
import pytest

from babelbrain_tpu.ops.mesh import (
    boolean_meshes,
    cone_mesh,
    faces_to_triangles,
    marching_tetrahedra,
    mask_to_mesh,
    mesh_volume,
    taubin_smooth,
    weld_vertices,
)
from babelbrain_tpu.ops.voxelize import read_stl, voxelize_solid, write_stl


def _ball(n=48, r=16.0):
    g = np.arange(n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    c = (n - 1) / 2
    return ((x - c) ** 2 + (y - c) ** 2 + (z - c) ** 2) <= r * r, r


def test_marching_tetra_sphere_volume_and_closure():
    mask, r = _ball()
    tris = marching_tetrahedra(mask.astype(np.float64), 0.5)
    assert len(tris) > 1000
    vol = mesh_volume(tris)
    expect = 4 / 3 * np.pi * r**3
    assert abs(vol - expect) / expect < 0.03

    # watertight: every edge shared by exactly 2 faces
    verts, faces = weld_vertices(tris)
    edges = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    edges = np.sort(edges, axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_marching_tetra_empty():
    assert marching_tetrahedra(np.zeros((8, 8, 8)), 0.5).shape == (0, 3, 3)


def test_taubin_smooth_preserves_volume():
    mask, _ = _ball(40, 13.0)
    tris = marching_tetrahedra(mask.astype(np.float64), 0.5)
    verts, faces = weld_vertices(tris)
    v0 = mesh_volume(faces_to_triangles(verts, faces))
    sm = taubin_smooth(verts, faces, iterations=20)
    v1 = mesh_volume(faces_to_triangles(sm, faces))
    assert abs(v1 - v0) / v0 < 0.03
    # smoothing reduced surface roughness: RMS radius spread shrinks
    c = verts.mean(0)
    spread0 = np.std(np.linalg.norm(verts - c, axis=1))
    spread1 = np.std(np.linalg.norm(sm - sm.mean(0), axis=1))
    assert spread1 < spread0


def test_mask_to_mesh_voxelize_roundtrip():
    mask, _ = _ball(44, 14.0)
    tris = mask_to_mesh(mask, smooth_iterations=8)
    back = voxelize_solid(tris, (0.0, 0.0, 0.0), 1.0, mask.shape)
    inter = (back & mask).sum()
    dice = 2 * inter / (back.sum() + mask.sum())
    assert dice > 0.97


def test_mask_to_mesh_affine_and_stl_roundtrip(tmp_path):
    mask, _ = _ball(32, 10.0)
    A = np.diag([0.5, 0.5, 0.5, 1.0])
    A[:3, 3] = [10.0, -4.0, 2.0]
    tris = mask_to_mesh(mask, affine=A, smooth_iterations=4)
    # volume scales by det of the linear part
    expect = 4 / 3 * np.pi * 10.0**3 * 0.125
    assert abs(abs(mesh_volume(tris)) - expect) / expect < 0.06
    p = tmp_path / "skin.stl"
    write_stl(str(p), tris)
    tris2 = read_stl(str(p))
    assert np.allclose(tris, tris2, atol=1e-5)


def test_cone_mesh_volume():
    L, r0, r1 = 30.0, 2.0, 12.0
    tris = cone_mesh([0, 0, 0], [0, 0, 1], L, r0, r1, n_seg=96)
    vol = abs(mesh_volume(tris))
    expect = np.pi * L / 3 * (r0**2 + r0 * r1 + r1**2)
    assert abs(vol - expect) / expect < 0.02


@pytest.mark.parametrize("op,check", [
    ("intersection", lambda va, vb, v: v < min(va, vb) + 1e-9),
    ("union", lambda va, vb, v: v > max(va, vb) - 1e-9),
    ("difference", lambda va, vb, v: v < va),
])
def test_boolean_meshes(op, check):
    from babelbrain_tpu.ops.voxelize import sphere_mesh

    a = sphere_mesh([0.0, 0, 0], 10.0, 3)
    b = sphere_mesh([8.0, 0, 0], 10.0, 3)
    tris = boolean_meshes(a, b, pitch=0.5, op=op)
    va = 4 / 3 * np.pi * 1000.0
    v = abs(mesh_volume(tris))
    assert check(va, va, v)
    if op == "intersection":
        # analytic lens volume for equal spheres, d=8, r=10
        d, r = 8.0, 10.0
        lens = np.pi * (4 * r + d) * (2 * r - d) ** 2 / 12
        assert abs(v - lens) / lens < 0.05
