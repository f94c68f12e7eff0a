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
