"""Benchmark-file injection, multipoint steering, trajectory transforms."""

import os
import tempfile

import numpy as np
import pytest

from babelbrain_tpu.pipeline.benchmark import (
    load_benchmark_file,
    run_benchmark_acoustic,
    thermal_benchmark_regions,
)
from babelbrain_tpu.pipeline.io import save_dict_h5
from babelbrain_tpu.pipeline import transforms as tf


class TestBenchmarkFile:
    @pytest.fixture
    def bench_file(self, tmp_path):
        shape = (40, 40, 120)
        mm = np.zeros(shape, np.uint32)
        mm[:, :, 60:70] = 1  # slab of material 1
        mm[:, :, 70:] = 2
        data = {
            "TestType": 2,
            "MaterialMap": mm,
            "Materials": [
                {"Density": 1000.0, "LongSoS": 1500.0, "ShearSoS": 0.0,
                 "LongAtt": 0.0, "ShearAtt": 0.0, "SpecificHeat": 4178.0,
                 "Conductivity": 0.6, "Perfusion": 0.0, "Absorption": 0.0},
                {"Density": 1850.0, "LongSoS": 2400.0, "ShearSoS": 0.0,
                 "LongAtt": 150.0, "ShearAtt": 0.0, "SpecificHeat": 1700.0,
                 "Conductivity": 0.32, "Perfusion": 20.0, "Absorption": 0.16},
                {"Density": 1041.0, "LongSoS": 1562.0, "ShearSoS": 0.0,
                 "LongAtt": 4.0, "ShearAtt": 0.0, "SpecificHeat": 3630.0,
                 "Conductivity": 0.51, "Perfusion": 559.0, "Absorption": 0.85},
            ],
        }
        f = str(tmp_path / "bench.h5")
        save_dict_h5(data, f)
        return f, shape

    def test_load(self, bench_file):
        f, shape = bench_file
        b = load_benchmark_file(f)
        assert b["MaterialArray"].shape == (3, 5)
        assert b["MaterialArray"][1, 1] == 2400.0
        assert b["TestType"] == 2

    def test_acoustic_run_on_benchmark_medium(self, bench_file):
        f, shape = bench_file
        amp = np.zeros(shape[:2])
        amp[14:-14, 14:-14] = 60e3
        out = run_benchmark_acoustic(
            f, 500e3, 9.0, amp, np.zeros(shape[:2])
        )
        pa = out["p_amp"]
        assert np.isfinite(pa).all()
        line = pa[20, 20, :]
        # incident region near source amplitude, transmitted region reduced
        assert line[30:55].mean() > 30e3
        # transmission through high-impedance absorbing slab loses amplitude
        assert line[80:100].mean() < line[30:55].mean()
        assert line[80:100].mean() > 0.05 * 60e3

    def test_qcorr_scales_attenuation(self, bench_file, tmp_path):
        """QCorrArr in a benchmark file scales per-material attenuation
        (`BabelIntegrationBASE.py:2210-2217` contract): doubling the slab's
        Q correction must reduce the transmitted amplitude."""
        from babelbrain_tpu.pipeline.io import load_dict_h5

        f, shape = bench_file
        data = load_dict_h5(f)
        data["QCorrArr"] = np.array([1.0, 2.0, 1.0])
        f2 = str(tmp_path / "bench_q.h5")
        save_dict_h5(data, f2)
        amp = np.zeros(shape[:2])
        amp[14:-14, 14:-14] = 60e3
        base = run_benchmark_acoustic(f, 500e3, 9.0, amp, np.zeros(shape[:2]))
        qrun = run_benchmark_acoustic(f2, 500e3, 9.0, amp, np.zeros(shape[:2]))
        t_base = base["p_amp"][20, 20, 80:100].mean()
        t_q = qrun["p_amp"][20, 20, 80:100].mean()
        assert t_q < 0.8 * t_base
        with pytest.raises(ValueError, match="QCorrArr"):
            data["QCorrArr"] = np.array([1.0, 2.0])
            f3 = str(tmp_path / "bench_qbad.h5")
            save_dict_h5(data, f3)
            run_benchmark_acoustic(f3, 500e3, 9.0, amp, np.zeros(shape[:2]))

    def test_thermal_regions(self, bench_file):
        f, shape = bench_file
        b = load_benchmark_file(f)
        skull, brain_ids, region = thermal_benchmark_regions(
            b["MaterialMap"], int(b["TestType"])
        )
        assert skull.sum() == (np.asarray(b["MaterialMap"]) == 1).sum()
        assert brain_ids == [2]
        assert region == [0, 1]


class TestTransforms:
    def test_brainsight_roundtrip(self, tmp_path):
        m = np.eye(4)
        # orthonormal frame with z along a tilted direction
        z = np.array([0.3, 0.2, -0.93])
        z /= np.linalg.norm(z)
        x = np.cross([0, 0, 1.0], z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        m[:3, 0], m[:3, 1], m[:3, 2] = x, y, z
        m[:3, 3] = [-30.0, -20.0, 55.0]
        f = str(tmp_path / "traj.txt")
        tf.write_trajectory_brainsight(f, "M1", m)
        name, back = tf.read_trajectory_brainsight(f)
        assert name == "M1"
        np.testing.assert_allclose(back, m, atol=1e-3)
        tgt, d = tf.trajectory_target_direction(back)
        np.testing.assert_allclose(tgt, [-30, -20, 55], atol=1e-3)
        np.testing.assert_allclose(d, -z, atol=1e-3)

    def test_itk_tfm_roundtrip(self, tmp_path):
        m = np.eye(4)
        m[:3, 3] = [10.0, -5.0, 3.0]
        th = 0.3
        m[:2, :2] = [[np.cos(th), -np.sin(th)], [np.sin(th), np.cos(th)]]
        f = str(tmp_path / "t.tfm")
        tf.write_itk_tfm(f, m)
        back = tf.read_itk_tfm(f)
        np.testing.assert_allclose(back, m, atol=1e-6)


class TestCaseFanout:
    def test_run_fdtd_batch_matches_per_case(self):
        """Device fan-out over the 'case' axis: each batched simulation must
        reproduce its sequential single-run counterpart (vmap + shard_map of
        the identical scan; B=3 pads to the 8-device mesh)."""
        from babelbrain_tpu.ops.fdtd import (
            FDTDGrid, make_case_mesh, run_fdtd, run_fdtd_batch, stable_dt,
        )

        shape = (48, 48, 64)
        F0, C = 500e3, 1500.0
        dx = C / F0 / 6
        ppp = int(np.ceil(1 / F0 / stable_dt(dx, 2400.0, cfl=0.9)))
        dt = 1 / F0 / ppp
        nsteps = ppp * 4
        grid = FDTDGrid(
            shape=shape, dx=dx, dt=dt, n_steps=nsteps, frequency=F0,
            npml=10, sensor_start=nsteps - 2 * ppp, source_plane_z=11,
        )
        mats = np.array([[1000.0, C, 0, 0, 0], [1850.0, 2400.0, 0, 150.0, 0]])
        idx = np.zeros(shape, np.uint8)
        idx[:, :, 36:42] = 1
        rng = np.random.default_rng(3)
        amps = np.zeros((3,) + shape[:2], np.float32)
        amps[:, 14:-14, 14:-14] = 60e3 * rng.uniform(0.3, 1, (3, 20, 20))
        phases = rng.uniform(-3, 3, (3,) + shape[:2]).astype(np.float32)

        batch = run_fdtd_batch(
            idx, mats, grid, amps, phases, mesh=make_case_mesh()
        )
        assert batch["p_amp"].shape == (3,) + shape
        for b in range(3):
            single = run_fdtd(
                idx, mats, grid, source_amp=amps[b], source_phase=phases[b]
            )
            scale = single["p_amp"].max()
            np.testing.assert_allclose(
                batch["p_amp"][b] / scale, single["p_amp"] / scale, atol=1e-6
            )


class TestMultipoint:
    @pytest.mark.slow
    def test_two_point_steering_combines(self):
        from babelbrain_tpu.pipeline import build_domain, build_label_materials
        from babelbrain_tpu.pipeline.acoustic import (
            position_transducer,
            run_multipoint,
        )
        from babelbrain_tpu.tx import make_annular_array

        mask = np.zeros((56, 56, 88), np.uint8)
        mask[16:40, 16:40, 26:62] = 4
        mask[28, 28, 44] = 5
        mats = build_label_materials(500e3, False)
        mats = mats[:1]  # water only: fast fluid path
        dom = build_domain(mask, 500e3, 6.0, materials=mats, water_only=True)
        F = 62.94e-3
        tx = make_annular_array(
            500e3, F,
            [0.0, 31.6988e-3, 44.2688e-3, 53.6688e-3],
            [31.14e-3, 43.71e-3, 53.11e-3, 60.83e-3],
            1500.0, ppw_surface=2.5,
        ).translated([0, 0, F])
        tx = position_transducer(tx, dom, F)
        # two z-steered points (annular arrays steer in z only)
        results, combined = run_multipoint(
            dom, tx, [[0, 0, -6e-3], [0, 0, 6e-3]], 60e3
        )
        assert len(results) == 2
        # the auto fan-out path (case-sharded batch) must agree with the
        # reference-style sequential loop
        seq, _ = run_multipoint(
            dom, tx, [[0, 0, -6e-3], [0, 0, 6e-3]], 60e3, fanout=False
        )
        scale = seq[0].p_amp.max()
        np.testing.assert_allclose(
            results[0].p_amp / scale, seq[0].p_amp / scale, atol=1e-6
        )
        assert combined["p_amp_all"].shape[0] == 2
        # each field peaks at a different z
        z1 = np.unravel_index(
            np.argmax(combined["p_amp_all"][0]), results[0].p_amp.shape
        )[2]
        z2 = np.unravel_index(
            np.argmax(combined["p_amp_all"][1]), results[1].p_amp.shape
        )[2]
        assert abs(int(z1) - int(z2)) >= 3
        np.testing.assert_array_equal(
            combined["p_amp_max"], np.max(combined["p_amp_all"], axis=0)
        )
