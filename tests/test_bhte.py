"""BHTE validation against closed-form solutions."""

import numpy as np
import pytest

from babelbrain_tpu.ops.bhte import (
    BLOOD_DENSITY,
    BLOOD_SPECIFIC_HEAT,
    absorption_heating,
    bhte_run,
    cem43,
)
from babelbrain_tpu.materials.thermal import ThermalMaterialList


def _uniform_mats(**over):
    base = dict(
        density=np.array([1041.0]),
        sos=np.array([1562.0]),
        attenuation=np.array([4.49]),
        specific_heat=np.array([3630.0]),
        conductivity=np.array([0.51]),
        perfusion=np.array([0.0]),
        absorption=np.array([0.85]),
    )
    base.update({k: np.array([v]) for k, v in over.items()})
    return ThermalMaterialList(**base)


class TestBHTE:
    def test_uniform_heating_rate(self):
        N = 20
        mats = _uniform_mats()
        idx = np.zeros((N, N, N), np.uint8)
        p = np.full((N, N, N), 1e6, np.float32)
        res = bhte_run(p, idx, mats, dx=1e-3, schedule=[(0, 100, True)], dt=0.01)
        Q = 0.85 * 4.49 * 1e12 / (1041 * 1562)
        expect = 37.0 + Q / (1041 * 3630.0)
        assert res.temperature[10, 10, 10] == pytest.approx(expect, abs=1e-3)

    def test_duty_cycle_scales_heating(self):
        N = 16
        mats = _uniform_mats()
        idx = np.zeros((N, N, N), np.uint8)
        p = np.full((N, N, N), 1e6, np.float32)
        r1 = bhte_run(p, idx, mats, dx=1e-3, schedule=[(0, 50, True)], duty_cycle=1.0)
        r3 = bhte_run(p, idx, mats, dx=1e-3, schedule=[(0, 50, True)], duty_cycle=0.3)
        rise1 = r1.temperature[8, 8, 8] - 37.0
        rise3 = r3.temperature[8, 8, 8] - 37.0
        assert rise3 / rise1 == pytest.approx(0.3, rel=1e-3)

    def test_perfusion_exponential_decay(self):
        N = 16
        mats = _uniform_mats(conductivity=0.0, perfusion=559.0, absorption=0.0)
        idx = np.zeros((N, N, N), np.uint8)
        T0 = np.full((N, N, N), 45.0, np.float32)
        res = bhte_run(
            np.zeros((N, N, N)), idx, mats, dx=1e-3,
            schedule=[(0, 1000, False)], initial_temperature=T0,
            arterial_temperature=37.0,
        )
        omega = 559.0 * 1041 / (60 * 1e6)
        rate = omega * BLOOD_DENSITY * BLOOD_SPECIFIC_HEAT / (1041 * 3630)
        expect = 37 + 8 * np.exp(-rate * 10.0)
        assert res.temperature[8, 8, 8] == pytest.approx(expect, abs=5e-3)

    def test_diffusion_conserves_energy_adiabatic(self):
        # hot cube in sealed box: total energy conserved by zero-flux BCs
        N = 16
        mats = _uniform_mats(absorption=0.0)
        idx = np.zeros((N, N, N), np.uint8)
        T0 = np.full((N, N, N), 37.0, np.float32)
        T0[6:10, 6:10, 6:10] = 45.0
        res = bhte_run(
            np.zeros((N, N, N)), idx, mats, dx=1e-3,
            schedule=[(0, 500, False)], initial_temperature=T0,
        )
        assert res.temperature.mean() == pytest.approx(T0.mean(), abs=1e-3)
        # and it actually diffused
        assert res.temperature.max() < 44.0
        assert res.peak_temperature.max() == pytest.approx(45.0, abs=1e-4)

    def test_cem43_accumulation(self):
        N = 8
        mats = _uniform_mats(conductivity=0.0, absorption=0.0)
        idx = np.zeros((N, N, N), np.uint8)
        T0 = np.full((N, N, N), 44.0, np.float32)
        res = bhte_run(
            np.zeros((N, N, N)), idx, mats, dx=1e-3,
            schedule=[(0, 100, False)], initial_temperature=T0,
        )
        # 1 s at 44 C: dose = 1 * 0.5^(43-44) = 2 s
        assert res.dose[4, 4, 4] == pytest.approx(2.0, rel=1e-3)
        assert cem43(1.0, [44.0]) == pytest.approx(2.0)

    def test_multi_field_time_multiplex(self):
        N = 16
        mats = _uniform_mats(conductivity=0.0)
        idx = np.zeros((N, N, N), np.uint8)
        pa = np.zeros((N, N, N), np.float32)
        pb = np.zeros((N, N, N), np.float32)
        pa[4, 4, 4] = 1e6
        pb[10, 10, 10] = 1e6
        # alternate fields: a on 10, b on 10, x5
        sched = []
        for _ in range(5):
            sched += [(0, 10, True), (1, 10, True)]
        res = bhte_run(np.stack([pa, pb]), idx, mats, dx=1e-3, schedule=sched)
        rise_a = res.temperature[4, 4, 4] - 37
        rise_b = res.temperature[10, 10, 10] - 37
        assert rise_a == pytest.approx(rise_b, rel=1e-6)
        assert rise_a > 0.1

    def test_monitor_points_trace(self):
        N = 12
        mats = _uniform_mats()
        idx = np.zeros((N, N, N), np.uint8)
        p = np.full((N, N, N), 5e5, np.float32)
        res = bhte_run(
            p, idx, mats, dx=1e-3, schedule=[(0, 30, True), (0, 30, False)],
            monitor_points=[[6, 6, 6], [2, 2, 2]],
        )
        assert res.monitor.shape == (2, 60)
        # rises then falls (diffusion to edges/cooling off)
        assert res.monitor[0, 29] > res.monitor[0, 0]

    def test_absorption_heating_formula(self):
        mats = _uniform_mats()
        q = absorption_heating(np.array([[[2e6]]]), np.zeros((1, 1, 1), int), mats, 0.5)
        expect = 0.85 * 4.49 * 4e12 / (1041 * 1562) * 0.5
        assert q[0, 0, 0] == pytest.approx(expect, rel=1e-6)


class TestFocalMetrics:
    def test_ellipsoid_axes(self):
        from babelbrain_tpu.pipeline.thermal import focal_metrics

        # gaussian blob with known -6 dB widths
        n = 48
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n].astype(float)
        sx, sy, sz = 3.0, 4.0, 8.0
        p = np.exp(
            -(((ii - 24) / sx) ** 2 + ((jj - 24) / sy) ** 2 + ((kk - 24) / sz) ** 2)
            / 2
        )
        m = focal_metrics(p, spacing_m=1e-3)
        # -6 dB radius = sigma*sqrt(2*ln(2)) -> full width = 2*that
        w = 2 * np.sqrt(2 * np.log(2))
        assert m["axes_mm"][0] == pytest.approx(sx * w, abs=1.2)
        assert m["axes_mm"][1] == pytest.approx(sy * w, abs=1.2)
        assert m["axes_mm"][2] == pytest.approx(sz * w, abs=1.2)
        assert m["peak_ijk"] == (24, 24, 24)
        assert m["volume_mm3"] > 0


class TestThermalExports:
    def test_summary_csv(self, tmp_path):
        from babelbrain_tpu.pipeline.thermal import (
            SonicationParams,
            ThermalResult,
            export_summary_csv,
            summary_row,
        )

        res = ThermalResult(
            temperature_end=np.zeros((2, 2, 2)),
            temperature_peak=np.zeros((2, 2, 2)),
            dose=np.zeros((2, 2, 2)),
            monitor=np.zeros((4, 10)),
            metrics={"TI": 1.5, "TIS": 0.5, "TIC": 2.0, "CEMBrain": 0.1,
                     "CEMSkin": 0.0, "CEMSkull": 0.3, "MI": 0.8,
                     "MaxBrainPressure": 5e5, "MaxIsppa": 10.0,
                     "MaxIspta": 3.0},
            ratio_losses=0.25,
        )
        p = SonicationParams(duration_on=30, duration_off=30, duty_cycle=0.3,
                             isppa=10.0)
        f = str(tmp_path / "summary.csv")
        export_summary_csv(f, [summary_row(p, res)])
        text = open(f).read()
        assert "TIC" in text and "0.25" in text and "30" in text

    def test_run_all_combinations(self, tmp_path):
        """Profile loop + consolidation (`CalculateThermalProcess.py:54-123`):
        per-combination ThermalField h5s, _AllCombinations.h5/.mat, and
        thermal concatenation chaining initial temperature/dose."""
        import os

        from babelbrain_tpu.materials import material_array
        from babelbrain_tpu.pipeline.io import load_dict_h5
        from babelbrain_tpu.pipeline.thermal import (
            SonicationParams,
            run_all_combinations,
        )

        shape = (24, 24, 32)
        mm = np.zeros(shape, np.uint8)
        mm[:, :, 8:10] = 1   # skin
        mm[:, :, 10:12] = 2  # cortical
        mm[:, :, 12:14] = 3  # trabecular
        mm[:, :, 14:] = 4    # brain
        mats = material_array(
            5e5, ("Water", "Skin", "Cortical", "Trabecular", "Brain")
        )
        ii, jj, kk = np.mgrid[:24, :24, :32].astype(float)
        blob = np.exp(-(((ii - 12) ** 2 + (jj - 12) ** 2) / 8.0
                        + ((kk - 22) ** 2) / 18.0))
        p = (1e5 * blob).astype(np.float32)
        pw = (1.2e5 * blob).astype(np.float32)
        combos = [
            SonicationParams(duration_on=1.0, duration_off=0.5,
                             duty_cycle=0.5, prf=100.0, isppa=8.0),
            SonicationParams(duration_on=2.0, duration_off=0.5,
                             duty_cycle=0.3, prf=10.0, isppa=8.0),
        ]
        base = str(tmp_path / "tcase")
        res, cons = run_all_combinations(
            p, pw, mm, mats, 1e-3, (12, 12, 22), combos,
            out_base=base, concatenate=True,
        )
        assert len(res) == 2
        assert cons["Index"].shape == (2, 5)
        np.testing.assert_allclose(cons["Index"][1], [0.3, 10.0, 2.0, 0.5, 8.0])
        assert set(cons["AllData"]) == {"0", "1"}
        assert cons["AllData"]["1"]["TI"] >= 0
        # concatenation: the second run starts from the first's end state,
        # so its monitored target temperature starts above baseline
        assert res[1].monitor[-1][0] > 37.0 + 0.5 * (res[0].monitor[-1][-1] - 37.0) - 0.3
        assert os.path.isfile(base + "_AllCombinations.h5")
        assert os.path.isfile(base + "_AllCombinations.mat")
        blob5 = load_dict_h5(base + "_AllCombinations.h5")
        assert "AllData" in blob5 and "Index" in blob5
        # per-combination files follow the GetThermalOutName contract
        per = [f for f in os.listdir(tmp_path) if "ThermalField-Duration" in f]
        assert len(per) == 2

    def test_rescale_isppa(self):
        from babelbrain_tpu.pipeline.thermal import ThermalResult, rescale_isppa

        res = ThermalResult(
            temperature_end=None, temperature_peak=None, dose=None,
            monitor=None, pressure_ratio=2.0,
        )
        p = np.ones((2, 2, 2))
        out = rescale_isppa(res, p, new_isppa=20.0, old_isppa=5.0)
        np.testing.assert_allclose(out, 2.0 * 2.0)  # ratio * sqrt(4)


class TestAnalyzeLossesReferenceParity:
    """Pin analyze_losses against the reference's `AnalyzeLosses` formulas
    (`CalculateTemperatureEffects.py:94-256`) evaluated by hand on a shared
    synthetic field (VERDICT weak item: no cross-check existed)."""

    def _setup(self):
        from babelbrain_tpu.materials import (
            build_thermal_material_list,
            material_array,
        )
        from babelbrain_tpu.pipeline.thermal import tissue_region_masks

        F0 = 500e3
        shape = (24, 24, 40)
        acoustic = material_array(
            F0, tissues=("Water", "Skin", "Cortical", "Trabecular", "Brain")
        )
        mats = build_thermal_material_list(
            acoustic, ct_mode=False, segmented_brain=False
        )
        mm = np.zeros(shape, np.uint8)
        mm[:, :, 10:14] = 1
        mm[:, :, 14:20] = 2
        mm[:, :, 20:] = 4
        rng = np.random.default_rng(2)
        zz = np.arange(shape[2])
        env = np.exp(-0.5 * ((zz - 28) / 4.0) ** 2)
        p = rng.uniform(0.3, 1.0, shape) * env[None, None, :] * 5e5
        pw = rng.uniform(0.3, 1.0, shape) * np.exp(
            -0.5 * ((zz - 26) / 4.0) ** 2
        )[None, None, :] * 8e5
        _, _, brain = tissue_region_masks(mm, ct_mode=False, segmented=False)
        return mats, mm, p, pw, brain

    def test_plane_integral_formulas(self):
        from babelbrain_tpu.pipeline.thermal import (
            analyze_losses,
            plane_energy,
        )

        mats, mm, p, pw, brain = self._setup()
        dx = 5e-4
        isppa = 5.0
        target = (12, 12, 28)
        pr, rl = analyze_losses(
            p, pw, mm, mats, target, dx, isppa, brain_mask=brain
        )
        # hand evaluation of the reference formulas
        rho = np.asarray(mats.density)[mm]
        sos = np.asarray(mats.sos)[mm]
        pt = np.where(brain, p, 0.0)
        pww = np.where(brain, pw, 0.0)
        czr = np.unravel_index(np.argmax(pt), pt.shape)[2]
        czw = np.unravel_index(np.argmax(pww), pww.shape)[2]
        rho0, sos0 = float(mats.density[0]), float(mats.sos[0])
        e_t = plane_energy(pt[:, :, czr], rho[:, :, czr], sos[:, :, czr], dx)
        e_w_at_t = plane_energy(pww[:, :, czr], rho0, sos0, dx)
        e_t_at_w = plane_energy(pt[:, :, czw], rho[:, :, czw], sos[:, :, czw], dx)
        e_w = plane_energy(pww[:, :, czw], rho0, sos0, dx)
        expect = e_t / e_w_at_t
        if expect > e_t_at_w / e_w + 0.2:
            expect = e_t_at_w / e_w
        assert rl == pytest.approx(expect, rel=1e-12)
        # PressureRatio from the TARGET voxel's properties (non-segmented,
        # `CalculateTemperatureEffects.py:246-256`)
        i, j, k = target
        p_adj = np.sqrt(isppa * 1e4 * 2.0 * sos[i, j, k] * rho[i, j, k])
        assert pr == pytest.approx(p_adj / pt.max(), rel=1e-12)

    def test_fixed_acoustic_power_override(self):
        from babelbrain_tpu.pipeline.thermal import (
            analyze_losses,
            plane_energy,
        )

        mats, mm, p, pw, brain = self._setup()
        dx = 5e-4
        pr, rl = analyze_losses(
            p, pw, mm, mats, (12, 12, 28), dx, 5.0, brain_mask=brain,
            fixed_acoustic_power=2.5,
        )
        pt = np.where(brain, p, 0.0)
        pww = np.where(brain, pw, 0.0)
        czr = np.unravel_index(np.argmax(pt), pt.shape)[2]
        rho0, sos0 = float(mats.density[0]), float(mats.sos[0])
        e_w_at_t = plane_energy(pww[:, :, czr], rho0, sos0, dx)
        assert rl == pytest.approx(2.5 / e_w_at_t, rel=1e-12)
        assert pr == pytest.approx(np.sqrt(rl), rel=1e-12)

    def test_dome_single_point_branch(self):
        from babelbrain_tpu.pipeline.thermal import analyze_losses

        mats, mm, p, pw, brain = self._setup()
        _, rl = analyze_losses(
            p, pw, mm, mats, (12, 12, 28), 5e-4, 5.0, brain_mask=brain,
            single_point_ratio=True,
        )
        pt = np.where(brain, p, 0.0)
        pww = np.where(brain, pw, 0.0)
        assert rl == pytest.approx((pt.max() / pww.max()) ** 2, rel=1e-12)


class TestBHTEPallas:
    """Temporally-blocked Pallas BHTE (`ops.bhte_pallas`): K fused
    timesteps per streaming sweep must reproduce the XLA scan."""

    def _setup(self):
        from babelbrain_tpu.materials import (
            build_thermal_material_list,
            material_array,
        )

        shape = (32, 32, 40)
        acoustic = material_array(
            500e3, tissues=("Water", "Skin", "Cortical", "Trabecular",
                            "Brain")
        )
        mats = build_thermal_material_list(
            acoustic, ct_mode=False, segmented_brain=False
        )
        idx = np.zeros(shape, np.uint8)
        idx[:, :, 10:14] = 1
        idx[:, :, 14:20] = 2
        idx[:, :, 20:] = 4
        p = np.zeros(shape, np.float32)
        p[12:20, 12:20, 24:32] = 2e6
        return shape, mats, idx, p

    def test_matches_xla_schedule(self):
        """On/off schedule with a tail not divisible by K: T/dose/peak and
        the sweep-cadence monitors must match the per-step XLA path."""
        from babelbrain_tpu.ops.bhte import bhte_run

        shape, mats, idx, p = self._setup()
        sched = [(0, 13, True), (0, 8, False), (0, 5, True)]
        common = dict(
            dt=0.01, duty_cycle=0.3, monitor_points=[(16, 16, 28)],
            arterial_temperature=37.0,
        )
        rx = bhte_run(p, idx, mats, 5e-4, sched, backend="xla", **common)
        rp = bhte_run(p, idx, mats, 5e-4, sched, backend="pallas", **common)
        np.testing.assert_allclose(rp.temperature, rx.temperature,
                                   rtol=0, atol=1e-5)
        np.testing.assert_allclose(rp.dose, rx.dose, rtol=1e-6)
        np.testing.assert_allclose(rp.peak_temperature, rx.peak_temperature,
                                   rtol=0, atol=1e-5)
        # monitors: pallas samples once per sweep at the recorded steps
        assert rp.monitor_steps is not None
        np.testing.assert_allclose(
            rp.monitor[0], rx.monitor[0][rp.monitor_steps],
            rtol=0, atol=1e-5,
        )
