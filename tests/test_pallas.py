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
