"""Voxelizer validation against exact solids + STL I/O roundtrip."""

import os
import tempfile

import numpy as np

from babelbrain_tpu.ops.voxelize import (
    read_stl,
    sphere_mesh,
    voxelize_solid,
    write_stl,
)


class TestVoxelize:
    def test_sphere_agreement(self):
        tris = sphere_mesh([20.0, 21.0, 19.0], 12.0, 3)
        vox = voxelize_solid(tris, origin=[0, 0, 0], dx=1.0, shape=(40, 42, 38))
        ii, jj, kk = np.mgrid[0:40, 0:42, 0:38]
        d = np.sqrt((ii - 20.0) ** 2 + (jj - 21.0) ** 2 + (kk - 19.0) ** 2)
        exact = d < 12.0
        assert (vox == exact).mean() > 0.999
        # all disagreements in the faceting shell near the surface
        if (vox != exact).any():
            assert np.abs(d[vox != exact] - 12.0).max() < 0.5

    def test_box(self):
        # axis-aligned box [3.25, 9.75]^3 as 12 triangles
        lo, hi = 3.25, 9.75
        v = np.array(
            [
                [lo, lo, lo], [hi, lo, lo], [lo, hi, lo], [hi, hi, lo],
                [lo, lo, hi], [hi, lo, hi], [lo, hi, hi], [hi, hi, hi],
            ]
        )
        quads = [
            (0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1),
            (2, 3, 7, 6), (0, 2, 6, 4), (1, 5, 7, 3),
        ]
        tris = np.array(
            [t for (a, b, c, d) in quads for t in ([v[a], v[b], v[c]], [v[a], v[c], v[d]])]
        )
        vox = voxelize_solid(tris, origin=[0, 0, 0], dx=1.0, shape=(14, 14, 14))
        ii, jj, kk = np.mgrid[0:14, 0:14, 0:14]
        exact = (
            (ii > lo) & (ii < hi) & (jj > lo) & (jj < hi) & (kk > lo) & (kk < hi)
        )
        np.testing.assert_array_equal(vox, exact)

    def test_subvoxel_resolution(self):
        # 0.75*dx voxelization trick of the reference (`BabelDatasetPreps.py:650`)
        tris = sphere_mesh([10, 10, 10], 6.0, 3)
        fine = voxelize_solid(tris, origin=[0, 0, 0], dx=0.75, shape=(27, 27, 27))
        assert fine.sum() > 0
        vol = fine.sum() * 0.75**3
        assert abs(vol - 4 / 3 * np.pi * 6**3) / (4 / 3 * np.pi * 6**3) < 0.02

    def test_empty_outside(self):
        tris = sphere_mesh([50, 50, 50], 5.0, 2)
        vox = voxelize_solid(tris, origin=[0, 0, 0], dx=1.0, shape=(20, 20, 20))
        assert vox.sum() == 0


class TestSTL:
    def test_binary_roundtrip(self):
        tris = sphere_mesh([0, 0, 0], 3.0, 1)
        f = tempfile.mktemp(suffix=".stl")
        try:
            write_stl(f, tris)
            back = read_stl(f)
            assert back.shape == tris.shape
            np.testing.assert_allclose(
                np.sort(back.ravel()), np.sort(tris.ravel()), atol=1e-5
            )
        finally:
            os.remove(f)

    def test_ascii(self):
        f = tempfile.mktemp(suffix=".stl")
        try:
            with open(f, "w") as fh:
                fh.write(
                    "solid t\nfacet normal 0 0 1\nouter loop\n"
                    "vertex 0 0 0\nvertex 1 0 0\nvertex 0 1 0\n"
                    "endloop\nendfacet\nendsolid t\n"
                )
            tris = read_stl(f)
            assert tris.shape == (1, 3, 3)
            np.testing.assert_allclose(tris[0, 1], [1, 0, 0])
        finally:
            os.remove(f)


class TestNativeBackend:
    def test_native_matches_numpy_bit_exact(self):
        """The OpenMP C++ XOR-bit-table voxelizer (native/voxelize.cpp, the
        counterpart of the reference's GPU kernel
        `GPUFunctions/GPUVoxelize/voxelize.cpp`) mirrors the NumPy parity
        ray-cast arithmetic exactly."""
        from babelbrain_tpu.native import native_available

        if not native_available("voxelize"):
            import pytest

            pytest.skip("no C++ toolchain for the native voxelizer")
        tris = sphere_mesh([20.0, 21.5, 23.0], 15.0, n_sub=4)
        shape = (44, 46, 48)
        a = voxelize_solid(tris, [0, 0, 0], 1.0, shape, backend="numpy")
        b = voxelize_solid(tris, [0, 0, 0], 1.0, shape, backend="native")
        np.testing.assert_array_equal(a, b)
        # off-grid origin + anisotropic-ish placement
        a = voxelize_solid(tris, [-2.3, 0.7, 1.1], 0.8, shape, backend="numpy")
        b = voxelize_solid(tris, [-2.3, 0.7, 1.1], 0.8, shape, backend="native")
        np.testing.assert_array_equal(a, b)
