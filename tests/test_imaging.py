"""Image-op validation against scipy/golden references (the reference project
validates its GPU ops against scipy/skimage the same way, SURVEY.md sec. 4)."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from babelbrain_tpu.ops import imaging as im


@pytest.fixture
def vol(rng):
    return rng.normal(size=(24, 20, 28)).astype(np.float32)


class TestMedian:
    @pytest.mark.parametrize("size", [3, 5])
    def test_matches_scipy(self, vol, size):
        got = im.median_filter3d(vol, size)
        want = ndi.median_filter(vol, size, mode="reflect")
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_odd_chunking(self, vol):
        got = im.median_filter3d(vol, 3, z_chunk=5)
        want = ndi.median_filter(vol, 3, mode="reflect")
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestMorphology:
    def test_close_matches_scipy(self, rng):
        m = rng.random((20, 22, 24)) > 0.7
        got = im.binary_close(m, 3)
        want = ndi.binary_closing(m, structure=np.ones((3, 3, 3)))
        np.testing.assert_array_equal(got, want)

    def test_dilate_erode(self, rng):
        m = rng.random((16, 16, 16)) > 0.8
        np.testing.assert_array_equal(
            im.binary_dilate(m, 3), ndi.binary_dilation(m, np.ones((3, 3, 3)))
        )
        np.testing.assert_array_equal(
            im.binary_erode(m, 3), ndi.binary_erosion(m, np.ones((3, 3, 3)))
        )


class TestLabel:
    def test_two_blobs(self):
        m = np.zeros((16, 16, 16), bool)
        m[2:5, 2:5, 2:5] = True
        m[10:14, 10:14, 10:14] = True
        labels, k = im.label_components(m)
        assert k == 2
        assert len(np.unique(labels[m])) == 2
        assert (labels[~m] == 0).all()

    def test_matches_scipy_random(self, rng):
        m = rng.random((18, 18, 18)) > 0.72
        labels, k = im.label_components(m)
        want, k_want = ndi.label(m)  # default 6-connectivity structure
        assert k == k_want
        # same partition (labels may be permuted)
        for lab in range(1, k + 1):
            sel = labels == lab
            ref_ids = np.unique(want[sel])
            assert len(ref_ids) == 1

    def test_largest_component(self):
        m = np.zeros((16, 16, 16), bool)
        m[1:3, 1:3, 1:3] = True
        m[8:15, 8:15, 8:15] = True
        big = im.largest_component(m)
        assert big.sum() == 7**3

    def test_snake(self):
        # long thin snake exercises the pointer-jumping path
        m = np.zeros((4, 4, 64), bool)
        m[0, 0, :] = True
        m[0, 1, -1] = True
        labels, k = im.label_components(m)
        assert k == 1


class TestMapToUnique:
    def test_exact_and_nearest(self):
        uv = np.array([10.0, 20.0, 30.0, 42.0])
        vol = np.array([[[10.0, 19.0, 26.0, 45.0]]])
        got = im.map_to_unique(vol, uv)
        np.testing.assert_array_equal(got[0, 0], [0, 1, 2, 3])

    def test_mask(self):
        uv = np.array([1.0, 2.0])
        vol = np.full((2, 2, 2), 2.0)
        mask = np.zeros((2, 2, 2), bool)
        mask[0, 0, 0] = True
        got = im.map_to_unique(vol, uv, mask)
        assert got[0, 0, 0] == 1
        assert got[1, 1, 1] == 0


class TestResample:
    def test_identity(self, vol):
        out = im.resample_affine(vol, np.eye(3), np.zeros(3), vol.shape, 1)
        np.testing.assert_allclose(out, vol, atol=1e-5)

    def test_shift_matches_scipy(self, vol):
        M = np.eye(3)
        off = np.array([0.5, -0.25, 1.75])
        got = im.resample_affine(vol, M, off, vol.shape, 1)
        want = ndi.affine_transform(vol, M, off, order=1, mode="grid-constant")
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_scale_matches_scipy(self, vol):
        M = np.diag([0.5, 2.0, 1.0])
        got = im.resample_affine(vol, M, np.zeros(3), (30, 10, 28), 1)
        want = ndi.affine_transform(
            vol, M, np.zeros(3), output_shape=(30, 10, 28), order=1,
            mode="grid-constant",
        )
        np.testing.assert_allclose(got, want, atol=1e-4)

    def test_resample_from_to_roundtrip(self, vol):
        aff = np.diag([1.0, 1.0, 1.0, 1.0])
        aff2 = aff.copy()
        aff2[:3, 3] = [2.0, 0, 0]
        out = im.resample_from_to(vol, aff, aff2, vol.shape, 1)
        # shifting target origin by +2 in world == sampling vol at i+2
        np.testing.assert_allclose(out[:-3], vol[2:-1], atol=1e-5)


class TestCubicResample:
    def test_cubic_matches_scipy(self, vol):
        M = np.eye(3)
        off = np.array([0.4, -0.3, 1.6])
        got = im.resample_affine(vol, M, off, vol.shape, 3)
        want = ndi.affine_transform(vol, M, off, order=3, mode="grid-constant")
        np.testing.assert_allclose(got, want, atol=2e-4)

    def test_cubic_identity_exact(self, vol):
        out = im.resample_affine(vol, np.eye(3), np.zeros(3), vol.shape, 3)
        np.testing.assert_allclose(out, vol, atol=2e-4)

    def test_cubic_scale(self, vol):
        M = np.diag([0.5, 2.0, 1.0])
        got = im.resample_affine(vol, M, np.zeros(3), (30, 10, 28), 3)
        want = ndi.affine_transform(
            vol, M, np.zeros(3), output_shape=(30, 10, 28), order=3,
            mode="grid-constant",
        )
        np.testing.assert_allclose(got, want, atol=2e-4)
