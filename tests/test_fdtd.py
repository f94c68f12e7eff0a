"""FDTD validation: plane waves, dispersion, attenuation, PML, focusing.

Mirrors the reference's own validation strategy (SURVEY.md section 4): water
plane-wave amplitude, carrier-phase velocity vs the staggered-grid dispersion
relation, SLS attenuation tuning, and Rayleigh-equivalence in water (the
308-case criterion, `OfflineBatchExamples/CompareRayleightWithFDTD`).
"""

import numpy as np
import pytest

from babelbrain_tpu.ops.fdtd import (
    FDTDGrid,
    run_fdtd,
    sls_coefficients,
    stable_dt,
)

F0, C, RHO = 500e3, 1500.0, 1000.0


def _water_grid(shape, ppw=9.0, cycles=22, cfl=0.9, **kw):
    dx = C / F0 / ppw
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, cfl=cfl)))
    dt = 1 / F0 / ppp
    nsteps = ppp * cycles
    return (
        FDTDGrid(
            shape=shape,
            dx=dx,
            dt=dt,
            n_steps=nsteps,
            frequency=F0,
            sensor_start=nsteps - 2 * ppp,
            source_plane_z=13,
            **kw,
        ),
        ppp,
    )


class TestSLSCoefficients:
    def test_elastic_material_has_no_memory_feed(self):
        c = sls_coefficients(np.array([[1000.0, 1500.0, 0, 0, 0]]), F0, 1e-7)
        assert c["c_rp"][0] == pytest.approx(0.0, abs=1e-12)
        assert c["c_rs"][0] == pytest.approx(0.0, abs=1e-12)
        assert not c["viscous"]
        assert c["pi_u"][0] == pytest.approx(1000 * 1500**2, rel=1e-9)

    def test_complex_modulus_matches_target(self):
        # verify the tuned SLS reproduces (c, alpha) exactly at f0
        rho, cl, al = 1896.5, 2494.0, 106.0
        dt = 1e-8
        c = sls_coefficients(np.array([[rho, cl, 0, al, 0]]), F0, dt)
        omega = 2 * np.pi * F0
        # reconstruct tau from the coefficients
        b_r = c["b_r"][0]
        tau_sig = dt / 2 * (1 + b_r) / (1 - b_r)
        # M(omega) from pi_u & feed coefficient
        PiR_tp = c["pi_u"][0]
        feed = c["c_rp"][0] / dt  # = Pi_R (tp-1)/tau_sig * a_r/dt
        a_r = dt / (1 + dt / (2 * tau_sig))
        PiR_tp_minus_1 = feed * dt / a_r * tau_sig
        Pi_R = PiR_tp - PiR_tp_minus_1
        tau_eps = tau_sig * PiR_tp / Pi_R
        M = Pi_R * (1 + 1j * omega * tau_eps) / (1 + 1j * omega * tau_sig)
        s = np.sqrt(rho / M)  # complex slowness, Im<0 convention
        c_model = 1.0 / np.real(s)
        alpha_model = -omega * np.imag(s)
        assert c_model == pytest.approx(cl, rel=1e-6)
        assert alpha_model == pytest.approx(al, rel=1e-6)


class TestPlaneWave:
    @pytest.fixture(scope="class")
    def plane_result(self):
        shape = (40, 40, 150)
        grid, ppp = _water_grid(shape)
        mats = np.array([[RHO, C, 0.0, 0.0, 0.0]])
        amp = np.full(shape[:2], 60e3)
        out = run_fdtd(
            np.zeros(shape, np.uint8), mats, grid, source_amp=amp,
            source_phase=np.zeros(shape[:2]),
        )
        return out, grid, ppp

    def test_amplitude(self, plane_result):
        out, grid, _ = plane_result
        line = out["p_amp"][20, 20, 25:110]
        assert line.mean() == pytest.approx(60e3, rel=0.02)
        assert line.std() / line.mean() < 0.03

    def test_phase_velocity_matches_dispersion_relation(self, plane_result):
        out, grid, ppp = plane_result
        ph = out["p_phase"][20, 20, :]
        dphi = np.unwrap(ph[20:130])
        slope = -np.polyfit(np.arange(len(dphi)), dphi, 1)[0]
        # numerical dispersion relation for 4th-order staggered leapfrog
        from scipy.optimize import brentq

        c1, c2 = 9 / 8, -1 / 24
        w, dt, dx = 2 * np.pi * F0, grid.dt, grid.dx
        lhs = np.sin(w * dt / 2) / (C * dt / dx)

        def fun(kdx):
            return c1 * np.sin(kdx / 2) + c2 * np.sin(3 * kdx / 2) - lhs

        k_num_dx = brentq(fun, 0.01, 2.0)
        assert slope == pytest.approx(k_num_dx, rel=2e-3)
        # and within 1% of the physical wavenumber at 9 PPW
        assert slope == pytest.approx(2 * np.pi / 9, rel=0.01)

    def test_pml_reflection_low(self, plane_result):
        out, _, _ = plane_result
        # standing-wave ripple in amplitude ~ 2*sqrt(R); ripple < 3% => R < 2e-4
        line = out["p_amp"][20, 20, 30:110]
        ripple = (line.max() - line.min()) / (line.max() + line.min())
        assert ripple < 0.04


class TestAttenuation:
    def test_attenuation_matches_table(self):
        alpha = 60.0
        shape = (40, 40, 150)
        grid, ppp = _water_grid(shape, cycles=24)
        mats = np.array([[RHO, C, 0.0, alpha, 0.0]])
        out = run_fdtd(
            np.zeros(shape, np.uint8), mats, grid,
            source_amp=np.full(shape[:2], 60e3), source_phase=np.zeros(shape[:2]),
        )
        line = out["p_amp"][20, 20, :]
        z = np.arange(shape[2]) * grid.dx
        sel = slice(20, 115)
        fit = np.polyfit(z[sel], np.log(line[sel]), 1)
        assert -fit[0] == pytest.approx(alpha, rel=0.03)


class TestSlabTransmission:
    """Closed-form validation: normal-incidence transmission through a fluid
    slab vs the analytic transfer-matrix coefficient
    |T| = 1/sqrt(1 + ((Z2/Z1 - Z1/Z2)/2)^2 sin^2(k2 L)).

    The analogue of the reference's analytic-benchmark injection tier
    (SURVEY.md section 4, `BenchmarkTestFile`): media are given exactly, so
    the comparison isolates solver numerics. The plane source is a hard
    velocity source (it re-reflects the slab echo), so the sensor window is
    placed after the transmitted wave settles but before the source->slab
    round-trip echo arrives (single-pass regime), and the amplitude is
    normalized by a no-slab baseline run to cancel source calibration and
    aperture diffraction.
    """

    C2, RHO2 = 2000.0, 1600.0

    @pytest.fixture(scope="class")
    def slab_setup(self):
        ppw = 12
        dx = C / F0 / ppw
        shape = (48, 48, 136)
        z0 = 90  # slab start: far from the source so the echo window is long
        ppp = int(np.ceil(1 / F0 / stable_dt(dx, self.C2, cfl=0.5)))
        dt = 1 / F0 / ppp
        n_steps = int(13.5 * ppp)
        grid = FDTDGrid(
            shape=shape, dx=dx, dt=dt, n_steps=n_steps, frequency=F0,
            sensor_start=n_steps - 2 * ppp, source_plane_z=13, npml=12,
        )
        amp = np.full(shape[:2], 60e3, np.float32)
        mats = np.array(
            [[RHO, C, 0, 0, 0], [self.RHO2, self.C2, 0, 0, 0]]
        )

        cache = {}

        def transmitted(L_cells):
            if L_cells not in cache:
                idx = np.zeros(shape, np.uint8)
                if L_cells:
                    idx[:, :, z0 : z0 + L_cells] = 1
                out = run_fdtd(
                    idx, mats, grid, source_amp=amp, backend="xla"
                )
                cache[L_cells] = float(
                    np.median(out["p_amp"][20:28, 20:28, z0 + 9 : z0 + 20])
                )
            return cache[L_cells]

        return transmitted, dx

    @pytest.mark.slow
    @pytest.mark.tol_1
    @pytest.mark.parametrize("l_cells", [4, 6, 8])
    def test_matches_transfer_matrix(self, slab_setup, l_cells):
        transmitted, dx = slab_setup
        base = transmitted(0)
        t_meas = transmitted(l_cells) / base
        z1, z2 = RHO * C, self.RHO2 * self.C2
        k2l = 2 * np.pi * F0 / self.C2 * l_cells * dx
        t_an = 1.0 / np.sqrt(
            1 + 0.25 * (z2 / z1 - z1 / z2) ** 2 * np.sin(k2l) ** 2
        )
        assert t_meas == pytest.approx(t_an, rel=0.015)


class TestFocusedWater:
    @pytest.mark.slow
    def test_rayleigh_equivalence(self):
        """FDTD launched from a Rayleigh source plane reproduces the field
        re-radiated by that plane (the reference's design-basis water
        criterion; its own source model is the same monopole plane,
        `BabelIntegrationCONCAVE_PHASEDARRAY.py:407-452`). Also checks the
        full bowl-Rayleigh solution, whose residual is the shared
        plane-truncation approximation (~8% peak for this low-gain bowl)."""
        from babelbrain_tpu.tx import make_focused_bowl
        from babelbrain_tpu.ops import rayleigh_field, rayleigh_field_volume

        k = 2 * np.pi * F0 / C
        shape = (104, 104, 120)
        npml, zsrc = 12, 13
        grid, ppp = _water_grid(shape, cycles=20)
        FL, D = 30e-3, 24e-3
        dx = grid.dx
        x = (np.arange(shape[0]) - shape[0] / 2) * dx
        y = (np.arange(shape[1]) - shape[1] / 2) * dx
        z = np.arange(shape[2]) * dx
        z = z - z[zsrc]  # source plane at z=0
        # place the bowl fully below the source plane (rim 0.5 mm under it),
        # as the reference enforces (`BabelIntegrationSingle.py:267-278`)
        sag = FL - np.sqrt(FL**2 - (D / 2) ** 2)
        tx = make_focused_bowl(F0, FL, D, C).translated([0, 0, FL - sag - 0.5e-3])
        u0 = np.full(tx.num_subelements, 60e3, np.complex64)
        xp, yp = np.meshgrid(x, y, indexing="ij")
        pts = np.stack(
            [xp.ravel(), yp.ravel(), np.full(xp.size, 0.0)], 1
        ).astype(np.float32)
        src = np.asarray(
            rayleigh_field(k, tx.centers, tx.areas, u0, pts)
        ).reshape(shape[:2])
        src[:npml] = 0
        src[-npml:] = 0
        src[:, :npml] = 0
        src[:, -npml:] = 0

        mats = np.array([[RHO, C, 0.0, 0.0, 0.0]])
        out = run_fdtd(
            np.zeros(shape, np.uint8), mats, grid,
            source_amp=np.abs(src), source_phase=np.angle(src),
        )
        af = out["p_amp"][14:-14, 14:-14, zsrc + 5 : -npml - 4]

        # (a) apples-to-apples: field re-radiated by the same plane
        sel = np.abs(src) > 0
        plane_pts = np.stack(
            [xp[sel], yp[sel], np.zeros(sel.sum())], 1
        ).astype(np.float32)
        zq = z[zsrc + 5 : -npml - 4]
        xq, yq, zq3 = np.meshgrid(x[14:-14], y[14:-14], zq, indexing="ij")
        q = np.stack([xq.ravel(), yq.ravel(), zq3.ravel()], 1).astype(np.float32)
        ap = np.abs(
            np.asarray(
                rayleigh_field(
                    k, plane_pts, np.full(sel.sum(), dx * dx, np.float32),
                    src[sel], q,
                )
            )
        ).reshape(xq.shape)
        l2 = np.linalg.norm(af - ap) / np.linalg.norm(ap)
        assert af.max() / ap.max() == pytest.approx(1.0, abs=0.02)
        assert l2 < 0.08
        ia = np.unravel_index(np.argmax(af), af.shape)
        ip = np.unravel_index(np.argmax(ap), ap.shape)
        assert np.all(np.abs(np.array(ia) - np.array(ip)) <= 2)

        # (b) full bowl solution: looser (shared truncation approximation)
        ab = np.abs(rayleigh_field_volume(k, tx, u0, x[14:-14], y[14:-14], zq))
        assert af.max() / ab.max() == pytest.approx(1.0, abs=0.12)
        ib = np.unravel_index(np.argmax(ab), ab.shape)
        assert np.all(np.abs(np.array(ia) - np.array(ib)) <= 4)


class TestFluidSpecialization:
    def test_fluid_matches_viscoelastic_solver(self):
        """The 5-field acoustic path must reproduce the 15-field viscoelastic
        solver on a fluid-only medium (same physics, different state)."""
        shape = (48, 48, 100)
        grid, ppp = _water_grid(shape, cycles=14)
        amp = np.zeros(shape[:2])
        amp[14:-14, 14:-14] = 60e3
        ph = np.random.default_rng(5).uniform(-2, 2, shape[:2])
        mats_fluid = np.array([[RHO, C, 0.0, 20.0, 0.0]])
        # force the viscoelastic path by adding an unused shear material
        mats_shear = np.array(
            [[RHO, C, 0.0, 20.0, 0.0], [1896.5, 2494.0, 1594.0, 106.0, 214.0]]
        )
        idx = np.zeros(shape, np.uint8)  # nothing references material 1
        o_fluid = run_fdtd(idx, mats_fluid, grid, source_amp=amp, source_phase=ph)
        o_full = run_fdtd(idx, mats_shear, grid, source_amp=amp, source_phase=ph)
        # compare the physical interior only: inside the PML the two state
        # decompositions absorb differently (non-physical region)
        reg = (slice(13, -13), slice(13, -13), slice(15, -13))
        scale = o_full["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_fluid["p_amp"][reg], o_full["p_amp"][reg],
            atol=scale * 5e-4, rtol=1e-3,
        )


class TestAirReflector:
    def test_air_cavity_blocks_transmission(self):
        """A pressure-release reflector layer must block transmission (the
        reference's ReflectorMask, `BabelIntegrationBASE.py:2365`)."""
        shape = (40, 40, 150)
        grid, ppp = _water_grid(shape, cycles=22)
        mats = np.array([[RHO, C, 0.0, 0.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        reflector = np.zeros(shape, bool)
        reflector[:, :, 80:84] = True  # air layer
        amp = np.full(shape[:2], 60e3)
        out = run_fdtd(idx, mats, grid, source_amp=amp,
                       source_phase=np.zeros(shape[:2]),
                       reflector_mask=reflector)
        line = out["p_amp"][20, 20, :]
        # behind the air layer: near-total blockage
        assert line[95:120].max() < 0.05 * 60e3
        # in front: standing wave (incident + reflected), peaks up to ~2x
        assert line[30:75].max() > 1.4 * 60e3
        assert np.isfinite(out["p_amp"]).all()


class TestDomeSource:
    @pytest.mark.slow
    def test_dome_focuses_at_center(self):
        """A hemispheric dome source inside the domain focuses at its
        geometric center (DomeTx capability)."""
        from babelbrain_tpu.pipeline import build_domain
        from babelbrain_tpu.pipeline.acoustic import run_dome_sim
        from babelbrain_tpu.tx import make_concave_array

        mask = np.zeros((72, 72, 80), np.uint8)
        mask[36, 36, 40] = 5
        mats = np.array([[RHO, C, 0.0, 0.0, 0.0]])
        dom = build_domain(mask, F0, 6.0, materials=mats, water_only=True)
        # dome: elements over a hemisphere of radius 10 mm facing the target
        F = 10e-3
        rng = np.random.default_rng(3)
        n_el = 80
        b = np.arccos(rng.uniform(0.05, 0.95, n_el))
        a = rng.uniform(0, 2 * np.pi, n_el)
        ec = np.stack(
            [F * np.sin(b) * np.cos(a), F * np.sin(b) * np.sin(a),
             -F * np.cos(b)], axis=1,
        )
        tx = make_concave_array(F0, F, 2.2e-3, ec, C, ppw_surface=3)
        out = run_dome_sim(dom, tx, 60e3, assemble=False)
        pa = out["p_amp"]
        # the global max sits on the source shell (near-singular like the
        # Rayleigh surface); check the focal region instead: peak within the
        # inner 6 mm ball must be at the center and strongly amplified
        ii, jj, kk = np.mgrid[0 : pa.shape[0], 0 : pa.shape[1], 0 : pa.shape[2]]
        r = (
            np.sqrt(
                (ii - dom.focal_idx[0]) ** 2
                + (jj - dom.focal_idx[1]) ** 2
                + (kk - dom.focal_idx[2]) ** 2
            )
            * dom.dx
        )
        inner = np.where(r < 6e-3, pa, 0.0)
        pk = np.array(np.unravel_index(np.argmax(inner), pa.shape))
        dist = np.linalg.norm((pk - dom.focal_idx) * dom.dx)
        assert dist < 2e-3
        # strong focal gain vs the drive
        assert inner.max() > 3 * 60e3


class TestSelMapsAndSensors:
    """RMS/peak map selection + sensor time series (the reference's
    SelMapsRMSPeakList / SelRMSorPeak / SensorOutput / SensorSubSampling
    contract, `BabelIntegrationBASE.py:2338-2429`)."""

    @pytest.fixture(scope="class")
    def extras_result(self):
        shape = (24, 24, 96)
        grid, ppp = _water_grid(shape, cycles=18)
        mats = np.array([[RHO, C, 0.0, 0.0, 0.0]])
        amp = np.full(shape[:2], 60e3)
        mon = np.array([[12, 12, 40], [12, 12, 55]])
        out = run_fdtd(
            np.zeros(shape, np.uint8), mats, grid, source_amp=amp,
            sel_maps=("Pressure_rms", "Vz_peak", "Sigmazz_peak"),
            monitor_ijk=mon, sensor_subsampling=2,
        )
        return out, grid, ppp

    def test_pressure_rms_is_amp_over_sqrt2(self, extras_result):
        out, _, _ = extras_result
        sel = out["p_amp"][12, 12, 30:70]
        rms = out["Pressure_rms"][12, 12, 30:70]
        assert rms / sel == pytest.approx(np.full(sel.shape, 1 / np.sqrt(2)), rel=0.03)

    def test_vz_peak_matches_plane_wave_impedance(self, extras_result):
        out, _, _ = extras_result
        # plane wave: |v_z| = p / (rho c)
        v = out["Vz_peak"][12, 12, 30:70]
        expect = out["p_amp"][12, 12, 30:70] / (RHO * C)
        assert v == pytest.approx(expect, rel=0.05)

    def test_sigmazz_peak_equals_pressure_peak_in_fluid(self, extras_result):
        out, _, _ = extras_result
        np.testing.assert_allclose(
            out["Sigmazz_peak"], out["peak"], rtol=1e-6, atol=1e-3
        )

    def test_sensor_series_amplitude_and_cadence(self, extras_result):
        out, grid, ppp = extras_result
        series = out["sensor_series"]
        times = out["sensor_times"]
        assert series.shape[0] == 2
        n_expect = len(range(grid.sensor_start, grid.n_steps, 2))
        assert series.shape[1] == n_expect == times.shape[0]
        assert np.diff(times) == pytest.approx(
            np.full(n_expect - 1, 2 * grid.dt), rel=1e-4  # float32 times
        )
        # steady-state CW: series amplitude matches the carrier-DFT amplitude
        for i, (ii, jj, kk) in enumerate([(12, 12, 40), (12, 12, 55)]):
            assert np.abs(series[i]).max() == pytest.approx(
                out["p_amp"][ii, jj, kk], rel=0.03
            )

    def test_shear_path_extras(self):
        # viscoelastic solver branch of the same accumulators
        shape = (20, 20, 72)
        grid, _ = _water_grid(shape, cycles=12, cfl=0.5)
        mats = np.array(
            [[RHO, C, 0.0, 0.0, 0.0], [1800.0, 2400.0, 1200.0, 0.0, 0.0]]
        )
        idx = np.zeros(shape, np.uint8)
        idx[:, :, 40:44] = 1
        amp = np.full(shape[:2], 60e3)
        out = run_fdtd(
            idx, mats, grid, source_amp=amp,
            sel_maps=("Pressure_rms", "Vx_peak"),
            monitor_ijk=np.array([[10, 10, 30]]),
        )
        pre = slice(22, 36)
        rms = out["Pressure_rms"][10, 10, pre]
        amp_line = out["p_amp"][10, 10, pre]
        assert np.all(np.isfinite(out["Vx_peak"]))
        assert rms.mean() / amp_line.mean() == pytest.approx(
            1 / np.sqrt(2), rel=0.08
        )
        assert out["sensor_series"].shape[0] == 1

    def test_validation_errors(self):
        shape = (16, 16, 48)
        grid, _ = _water_grid(shape, cycles=2)
        mats = np.array([[RHO, C, 0.0, 0.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        with pytest.raises(ValueError, match="unknown sel_maps"):
            run_fdtd(idx, mats, grid, sel_maps=("Bogus_rms",))
        # velocity/stress maps are XLA-only; backend='pallas' must refuse
        # rather than silently fall back
        with pytest.raises(ValueError, match="XLA backend"):
            run_fdtd(idx, mats, grid, backend="pallas", sel_maps=("Vx_rms",))


class TestPointSourceSphericalSpreading:
    """Analytic anchor for the stress_point source (refocus backprop): a CW
    monopole in attenuating water must decay as e^(-alpha r)/r — an
    independent closed-form check that no golden file can drift with."""

    def test_inverse_r_and_attenuation(self):
        F0, C = 500e3, 1500.0
        alpha = 30.0  # Np/m
        shape = (72, 72, 72)
        dx = C / F0 / 9
        ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
        dt = 1 / F0 / ppp
        ns = ppp * 8
        grid = FDTDGrid(
            shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
            sensor_start=ns - 2 * ppp, source_type="stress_point",
            source_ijk=(36, 36, 36),
        )
        mats = np.array([[1000.0, C, 0.0, alpha, 0.0]])
        out = run_fdtd(np.zeros(shape, np.uint8), mats, grid,
                       point_amp=50e3, backend="xla")
        amp = out["p_amp"]
        # radial samples along +z, away from the source's near field and
        # clear of the PML (r in [6, 18] cells)
        rs = np.arange(6, 19)
        vals = amp[36, 36, 36 + rs]
        r_m = rs * dx
        # fit log(p * r) ~ -alpha * r: slope recovers the attenuation and
        # the flatness of p*r*e^{alpha r} verifies 1/r spreading
        y = np.log(vals * r_m)
        slope = np.polyfit(r_m, y, 1)[0]
        assert slope == pytest.approx(-alpha, abs=0.25 * alpha)
        comp = vals * r_m * np.exp(alpha * r_m)
        assert comp.std() / comp.mean() < 0.05


class TestRawCapture:
    def test_capture_matches_monitor_and_carrier(self):
        """run_fdtd_capture (raw SensorOutput capability,
        `BabelIntegrationBASE.py:2279-2295,2460-2538`): the captured series
        must equal the monitor-point series sample-for-sample, and a
        carrier-bin DFT of the raw window must reproduce p_amp."""
        from babelbrain_tpu.ops.fdtd import run_fdtd, run_fdtd_capture

        shape = (32, 32, 64)
        grid, ppp = _water_grid(shape, cycles=6)
        mats = np.array([[RHO, C, 0.0, 0.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        amp = np.zeros(shape[:2])
        amp[8:-8, 8:-8] = 60e3
        mask = np.zeros(shape, bool)
        mask[16, 16, 40] = True
        mask[10, 20, 30] = True

        t0 = grid.sensor_start
        cap = run_fdtd_capture(
            idx, mats, grid, source_amp=amp,
            t_start=t0, t_end=grid.n_steps, sensor_mask=mask,
        )
        mon = run_fdtd(
            idx, mats, grid, source_amp=amp, backend="xla",
            monitor_ijk=np.argwhere(mask), sensor_subsampling=1,
        )
        # same steps, same values (both record p after each window step)
        np.testing.assert_allclose(
            cap["series"].T, mon["sensor_series"], atol=1e-3
        )
        # carrier DFT of the raw series reproduces the in-kernel p_amp
        w = 2 * np.pi * grid.frequency
        n = np.round(cap["times"] / grid.dt).astype(int)
        t = n * grid.dt
        C_acc = (cap["series"] * np.cos(w * t)[:, None]).sum(axis=0)
        S_acc = (cap["series"] * np.sin(w * t)[:, None]).sum(axis=0)
        n_win = grid.n_steps - grid.sensor_start
        amp_rec = 2.0 / n_win * np.hypot(C_acc, S_acc)
        want = cap["p_amp"][mask]
        np.testing.assert_allclose(amp_rec, want, rtol=1e-4, atol=1e-3)

    def test_capture_full_volume_window(self):
        from babelbrain_tpu.ops.fdtd import run_fdtd_capture

        shape = (24, 24, 48)
        grid, ppp = _water_grid(shape, cycles=3)
        mats = np.array([[RHO, C, 0.0, 0.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        amp = np.zeros(shape[:2])
        amp[6:-6, 6:-6] = 60e3
        cap = run_fdtd_capture(
            idx, mats, grid, source_amp=amp,
            t_start=grid.n_steps - 6, subsample=2,
        )
        assert cap["series"].shape == (3,) + shape
        assert np.isfinite(cap["series"]).all()
        assert cap["series"][-1].max() > 0
