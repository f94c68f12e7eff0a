"""Pallas fluid-kernel tests (need the real TPU; run with BBT_TPU_TESTS=1)."""

import os

import numpy as np
import pytest

import jax

requires_tpu = pytest.mark.skipif(
    jax.devices()[0].platform == "cpu",
    reason="pallas TPU kernels need a TPU device (BBT_TPU_TESTS=1)",
)

pytestmark = [pytest.mark.tpu, requires_tpu]


class TestPallasFluid:
    def test_matches_xla_backend(self):
        from babelbrain_tpu.ops.fdtd import FDTDGrid, run_fdtd, stable_dt

        F0, C = 500e3, 1500.0
        shape = (64, 64, 128)
        dx = C / F0 / 9
        ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
        dt = 1 / F0 / ppp
        ns = ppp * 10
        grid = FDTDGrid(
            shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
            sensor_start=ns - 2 * ppp, source_plane_z=13,
        )
        mats = np.array([[1000.0, C, 0.0, 20.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        amp = np.zeros(shape[:2])
        amp[16:-16, 16:-16] = 60e3
        ph = np.random.default_rng(5).uniform(-2, 2, shape[:2])
        o_x = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                       backend="xla")
        o_p = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                       backend="pallas")
        reg = (slice(2, -2), slice(2, -2), slice(2, -2))
        scale = o_x["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_p["p_amp"][reg], o_x["p_amp"][reg], atol=scale * 1e-5, rtol=1e-4
        )


class TestPallasVisco:
    def test_matches_xla_backend_with_shear(self):
        from babelbrain_tpu.ops.fdtd import FDTDGrid, run_fdtd, stable_dt

        F0, C = 500e3, 1500.0
        shape = (64, 64, 128)
        dx = C / F0 / 9
        ppp = int(np.ceil(1 / F0 / stable_dt(dx, 2494.0, 0.9)))
        dt = 1 / F0 / ppp
        ns = ppp * 8
        grid = FDTDGrid(
            shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
            sensor_start=ns - 2 * ppp, source_plane_z=13,
        )
        mats = np.array(
            [[1000.0, C, 0.0, 20.0, 0.0], [1896.5, 2494.0, 1594.0, 106.0, 214.0]]
        )
        idx = np.zeros(shape, np.uint8)
        idx[:, :, 60:70] = 1
        amp = np.zeros(shape[:2])
        amp[16:-16, 16:-16] = 60e3
        ph = np.random.default_rng(5).uniform(-2, 2, shape[:2])
        o_x = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                       backend="xla")
        o_p = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                       backend="pallas")
        reg = (slice(2, -2), slice(2, -2), slice(2, -2))
        scale = o_x["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_p["p_amp"][reg], o_x["p_amp"][reg], atol=scale * 1e-5, rtol=1e-4
        )


class TestPallasNewPaths:
    """Round-4 fast-path features on the real chip (interpret-mode parity
    exists in test_fused_kernel.py; this asserts the Mosaic-compiled
    kernels agree too)."""

    def _water(self, shape, cmax, cycles=6, **kw):
        from babelbrain_tpu.ops.fdtd import FDTDGrid, stable_dt

        F0, C = 500e3, 1500.0
        dx = C / F0 / 9
        ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, 0.9)))
        dt = 1 / F0 / ppp
        ns = ppp * cycles
        return FDTDGrid(
            shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
            sensor_start=ns - 2 * ppp, source_plane_z=13, **kw,
        ), ppp

    def test_indexed_materials_match_xla_on_chip(self):
        from babelbrain_tpu.ops.fdtd import run_fdtd

        shape = (64, 64, 128)
        grid, _ = self._water(shape, 2494.0, cycles=5)
        mats = np.array(
            [[1000.0, 1500.0, 0.0, 20.0, 0.0],
             [1896.5, 2494.0, 1594.0, 106.0, 214.0]]
        )
        idx = np.zeros(shape, np.uint8)
        idx[:, :, 60:72] = 1
        amp = np.zeros(shape[:2])
        amp[16:-16, 16:-16] = 60e3
        o_x = run_fdtd(idx, mats, grid, source_amp=amp, backend="xla")
        # auto backend on the chip takes the Pallas visco path, which uses
        # indexed materials at this shape (N3=128 tiles the gather window)
        o_p = run_fdtd(idx, mats, grid, source_amp=amp, backend="pallas")
        reg = (slice(2, -2),) * 3
        scale = o_x["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_p["p_amp"][reg], o_x["p_amp"][reg],
            atol=scale * 2e-4, rtol=1e-3,
        )

    def test_pressure_maps_and_monitor_on_chip(self):
        from babelbrain_tpu.ops.fdtd import run_fdtd, stable_dt, FDTDGrid

        F0, C = 500e3, 1500.0
        shape = (64, 64, 128)
        dx = C / F0 / 9
        ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
        dt = 1 / F0 / ppp
        n_win = (2 * ppp // 3) * 3
        ns = ppp * 3 + n_win
        grid = FDTDGrid(
            shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
            sensor_start=ns - n_win, source_plane_z=13,
        )
        mats = np.array([[1000.0, C, 0.0, 20.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        amp = np.zeros(shape[:2])
        amp[16:-16, 16:-16] = 60e3
        mon = np.array([[32, 32, 80]])
        kw = dict(source_amp=amp,
                  sel_maps=("Pressure_rms", "Pressure_peak"),
                  monitor_ijk=mon)
        o_x = run_fdtd(idx, mats, grid, backend="xla",
                       sensor_subsampling=1, **kw)
        o_p = run_fdtd(idx, mats, grid, backend="pallas", **kw)
        scale = o_x["p_amp"].max()
        np.testing.assert_allclose(
            o_p["Pressure_rms"], o_x["Pressure_rms"], atol=scale * 1e-4,
            rtol=1e-3,
        )
        steps_p = np.round(o_p["sensor_times"] / dt).astype(int)
        steps_x = np.round(o_x["sensor_times"] / dt).astype(int)
        pos = np.searchsorted(steps_x, steps_p)
        np.testing.assert_allclose(
            o_p["sensor_series"], o_x["sensor_series"][:, pos],
            atol=scale * 1e-4,
        )

    def test_dome_volume_source_on_chip(self):
        from babelbrain_tpu.ops.fdtd import run_fdtd

        shape = (64, 64, 64)
        grid, _ = self._water(shape, 1500.0, cycles=4,
                              source_type="velocity_volume")
        mats = np.array([[1000.0, 1500.0, 0.0, 10.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        ii, jj, kk = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
        c = np.array(shape) / 2.0
        r = np.sqrt((ii - c[0]) ** 2 + (jj - c[1]) ** 2 + (kk - c[2]) ** 2)
        shell = (np.abs(r - 20.0) < 1.0) & (kk < c[2])
        nrm = np.stack([c[0] - ii, c[1] - jj, c[2] - kk]) / (r + 1e-6)
        vsrc = {
            "amp": np.where(shell, 60e3, 0.0).astype(np.float32),
            "phase": np.zeros(shape, np.float32),
            "ox": nrm[0].astype(np.float32),
            "oy": nrm[1].astype(np.float32),
            "oz": nrm[2].astype(np.float32),
        }
        o_x = run_fdtd(idx, mats, grid, volume_source=vsrc, backend="xla")
        # auto on chip: zero-shear promotion -> fused visco volumetric
        o_p = run_fdtd(idx, mats, grid, volume_source=vsrc, backend="auto")
        scale = o_x["p_amp"].max()
        np.testing.assert_allclose(
            o_p["p_amp"], o_x["p_amp"], atol=scale * 2e-4, rtol=1e-3
        )


class TestProductionConfigsOnChip:
    """The configurations that earn the bench headlines, parity-asserted
    on real silicon (VERDICT r4 task 5): Mosaic layout/VMEM behavior only
    exists on chip, and bench.py measures throughput without asserting
    numbers. Tiny grids + the compile cache keep the tier fast."""

    def _grid(self, shape, cmax, cycles, **kw):
        from babelbrain_tpu.ops.fdtd import FDTDGrid, stable_dt

        F0, C = 500e3, 1500.0
        dx = C / F0 / 9
        ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, 0.9)))
        dt = 1 / F0 / ppp
        ns = ppp * cycles
        return FDTDGrid(
            shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
            sensor_start=ns - 2 * ppp, source_plane_z=13, **kw,
        )

    def _fluid_case(self, shape=(64, 64, 128), cycles=6):
        from babelbrain_tpu.ops.fdtd import run_fdtd

        grid = self._grid(shape, 1500.0, cycles)
        mats = np.array([[1000.0, 1500.0, 0.0, 20.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        amp = np.zeros(shape[:2])
        amp[16:-16, 16:-16] = 60e3
        ph = np.random.default_rng(2).uniform(-2, 2, shape[:2])
        o_x = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                       backend="xla")
        return grid, mats, idx, amp, ph, o_x

    def test_fluid_fusedK8_production_quiet_depth(self):
        """Quiet-phase production depth K=8 (the bench.py headline
        kernel) compiled by Mosaic and parity-asserted vs XLA."""
        from babelbrain_tpu.ops.fdtd import run_fdtd

        grid, mats, idx, amp, ph, o_x = self._fluid_case()
        o_p = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                       backend="pallas", fuse_steps=8)
        reg = (slice(2, -2),) * 3
        scale = o_x["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_p["p_amp"][reg], o_x["p_amp"][reg], atol=scale * 1e-5,
            rtol=1e-4,
        )

    def test_fluid_fusedK6_production_dft_depth(self):
        """DFT-window production depth K=6 on chip."""
        from babelbrain_tpu.ops.fdtd import run_fdtd

        grid, mats, idx, amp, ph, o_x = self._fluid_case()
        o_p = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                       backend="pallas", fuse_steps=6)
        reg = (slice(2, -2),) * 3
        scale = o_x["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_p["p_amp"][reg], o_x["p_amp"][reg], atol=scale * 1e-5,
            rtol=1e-4,
        )

    def test_fluid_point_source_on_chip(self):
        """stress_point refocusing backprop through the Mosaic fusedK
        in-kernel injection (`BabelIntegrationBASE.py:2374`)."""
        from babelbrain_tpu.ops.fdtd import run_fdtd

        shape = (64, 64, 128)
        grid = self._grid(shape, 1500.0, 5, source_type="stress_point",
                          source_ijk=(33, 31, 80))
        mats = np.array([[1000.0, 1500.0, 0.0, 20.0, 0.0]])
        idx = np.zeros(shape, np.uint8)
        z2 = np.zeros(shape[:2])
        o_x = run_fdtd(idx, mats, grid, source_amp=z2, point_amp=1e6,
                       backend="xla")
        o_p = run_fdtd(idx, mats, grid, source_amp=z2, point_amp=1e6,
                       backend="pallas")
        ns = grid.npml + 2
        reg = (slice(ns, -ns),) * 3
        scale = o_x["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_p["p_amp"][reg], o_x["p_amp"][reg], atol=scale * 1e-4,
            rtol=1e-3,
        )

    @pytest.mark.slow
    def test_visco_indexed_headline_shape(self):
        """The label-mode bench configuration itself — indexed-material
        visco fusedK at 192x192x240 — parity-asserted on silicon (short
        run; the kernel is identical to the 42-cycle bench one)."""
        from babelbrain_tpu.ops.fdtd import run_fdtd
        from babelbrain_tpu.materials import material_array

        F0 = 500e3
        mats = material_array(F0)
        shape = (192, 192, 240)
        grid = self._grid(shape, float(mats[:, 1:3].max()), 3)
        idx = np.zeros(shape, np.uint16)
        idx[:, :, 60:70] = 3
        idx[:, :, 70:78] = 1
        idx[:, :, 78:84] = 2
        idx[:, :, 84:] = 4
        amp = np.zeros(shape[:2])
        amp[16:-16, 16:-16] = 60e3
        o_x = run_fdtd(idx, mats, grid, source_amp=amp, backend="xla")
        o_p = run_fdtd(idx, mats, grid, source_amp=amp, backend="pallas")
        reg = (slice(2, -2),) * 3
        scale = o_x["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_p["p_amp"][reg], o_x["p_amp"][reg], atol=scale * 2e-4,
            rtol=1e-3,
        )

    def test_vmem_fallback_recovers_on_chip(self):
        """Force the auto-K VMEM model to overcommit: the Mosaic OOM must
        be classified and retried at a shallower depth
        (`_pallas_with_vmem_fallback`), not brick the run."""
        from babelbrain_tpu.ops import fdtd_pallas as fp
        from babelbrain_tpu.ops.fdtd import run_fdtd

        shape = (96, 128, 192)
        grid = self._grid(shape, 2494.0, 3)
        mats = np.array(
            [[1000.0, 1500.0, 0.0, 20.0, 0.0],
             [1896.5, 2494.0, 1594.0, 106.0, 214.0]]
        )
        idx = np.zeros(shape, np.uint8)
        idx[:, :, 100:112] = 1
        amp = np.zeros(shape[:2])
        amp[16:-16, 16:-16] = 60e3
        o_x = run_fdtd(idx, mats, grid, source_amp=amp, backend="xla")
        real_auto = fp._viscoK_auto
        lies = lambda *a, **k: max(real_auto(*a, **k) + 3, 6)
        fp._viscoK_auto = lies
        try:
            o_p = run_fdtd(idx, mats, grid, source_amp=amp,
                           backend="pallas")
        finally:
            fp._viscoK_auto = real_auto
        reg = (slice(2, -2),) * 3
        scale = o_x["p_amp"][reg].max()
        np.testing.assert_allclose(
            o_p["p_amp"][reg], o_x["p_amp"][reg], atol=scale * 2e-4,
            rtol=1e-3,
        )

    def test_bhte_pallas_k5_on_chip(self):
        """BHTE Pallas production depth vs the XLA scan on silicon."""
        from babelbrain_tpu.materials.thermal import ThermalMaterialList
        from babelbrain_tpu.ops.bhte import bhte_run

        shape = (96, 96, 96)
        p = np.zeros(shape, np.float32)
        ii, jj, kk = np.mgrid[0:96, 0:96, 0:96]
        r2 = (ii - 48.0) ** 2 + (jj - 48.0) ** 2 + (kk - 48.0) ** 2
        p[:] = 6e5 * np.exp(-r2 / 120.0)
        mat = np.zeros(shape, np.uint8)
        mat[:, :, 40:52] = 1
        mats = ThermalMaterialList(
            density=np.array([1000.0, 1896.5]),
            sos=np.array([1500.0, 2494.0]),
            attenuation=np.array([4.0, 150.0]),
            specific_heat=np.array([4178.0, 1300.0]),
            conductivity=np.array([0.6, 0.32]),
            perfusion=np.array([0.0, 40.0]),
            absorption=np.array([0.9, 0.85]),
        )
        schedule = [(0, 40, True), (0, 20, False)]
        o_s = bhte_run(p, mat, mats, 1e-3, schedule, dt=0.01,
                       backend="xla")
        o_p = bhte_run(p, mat, mats, 1e-3, schedule, dt=0.01,
                       backend="pallas")
        np.testing.assert_allclose(
            np.asarray(o_p.temperature), np.asarray(o_s.temperature),
            atol=5e-4, rtol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(o_p.dose), np.asarray(o_s.dose),
            atol=1e-3, rtol=1e-4,
        )

    def test_dome_volumetric_fluid_kernel_on_chip(self):
        """Zero-shear dome volumetric drive on the FLUID fusedK kernel —
        the path the 670 kHz DomeTx CT workload takes (`README.md:80`)."""
        from babelbrain_tpu.ops.fdtd import run_fdtd

        shape = (64, 64, 64)
        grid = self._grid(shape, 2494.0, 4, source_type="velocity_volume")
        mats = np.array(
            [[1000.0, 1500.0, 0.0, 10.0, 0.0],
             [1896.0, 2494.0, 0.0, 150.0, 0.0]]
        )
        idx = np.zeros(shape, np.uint8)
        idx[:, :, 44:50] = 1
        ii, jj, kk = np.mgrid[0:64, 0:64, 0:64]
        c = np.array(shape) / 2.0
        r = np.sqrt((ii - c[0]) ** 2 + (jj - c[1]) ** 2 + (kk - c[2]) ** 2)
        shell = (np.abs(r - 20.0) < 1.0) & (kk < c[2])
        nrm = np.stack([c[0] - ii, c[1] - jj, c[2] - kk]) / (r + 1e-6)
        ph3 = (np.random.default_rng(3).uniform(-2, 2, shape)
               * shell).astype(np.float32)
        vsrc = {
            "amp": np.where(shell, 60e3, 0.0).astype(np.float32),
            "phase": ph3,
            "ox": nrm[0].astype(np.float32),
            "oy": nrm[1].astype(np.float32),
            "oz": nrm[2].astype(np.float32),
        }
        o_x = run_fdtd(idx, mats, grid, volume_source=vsrc, backend="xla")
        o_p = run_fdtd(idx, mats, grid, volume_source=vsrc,
                       backend="pallas")
        scale = o_x["p_amp"].max()
        np.testing.assert_allclose(
            o_p["p_amp"], o_x["p_amp"], atol=scale * 2e-4, rtol=1e-3
        )
