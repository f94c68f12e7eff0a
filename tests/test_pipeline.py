"""Pipeline-layer tests: IO contracts, domain arithmetic, Step 1 on a
synthetic spherical-shell head phantom."""

import os
import tempfile

import numpy as np
import pytest

from babelbrain_tpu.pipeline import (
    Nifti,
    build_domain,
    build_label_materials,
    compute_time_stepping,
    generate_mask,
    load_dict_h5,
    load_nifti,
    remap_labels,
    save_dict_h5,
    save_nifti,
    snap_ppp,
)
from babelbrain_tpu.pipeline.domain import simulation_steps
from babelbrain_tpu.pipeline.profiles import (
    TRANSDUCER_REGISTRY,
    build_transducer,
    load_thermal_profile,
)


class TestIO:
    def test_nifti_roundtrip(self, rng):
        data = rng.normal(size=(12, 14, 10)).astype(np.float32)
        aff = np.diag([0.9, 0.9, 0.9, 1.0])
        aff[:3, 3] = [-5, 3, 7]
        f = tempfile.mktemp(suffix=".nii.gz")
        try:
            save_nifti(f, data, aff, b"hash:abc")
            back = load_nifti(f)
            np.testing.assert_allclose(back.data, data, atol=1e-7)
            np.testing.assert_allclose(back.affine, aff, atol=1e-5)
            assert back.descrip == b"hash:abc"
            np.testing.assert_allclose(back.zooms(), [0.9, 0.9, 0.9], atol=1e-6)
        finally:
            os.remove(f)

    def test_nifti_uint32(self):
        data = (np.arange(24).reshape(2, 3, 4) * 100).astype(np.uint32)
        f = tempfile.mktemp(suffix=".nii")
        try:
            save_nifti(f, data, np.eye(4))
            np.testing.assert_array_equal(load_nifti(f).data, data)
        finally:
            os.remove(f)

    def test_h5_nested_roundtrip(self, rng):
        d = {
            "p_amp": rng.normal(size=(4, 5, 6)).astype(np.float32),
            "Material": rng.normal(size=(5, 5)),
            "scalar": 3.25,
            "name": "CTX_500",
            "nested": {"x_vec": np.arange(7.0), "deep": {"v": 2}},
            "Materials": [{"Density": 1000.0}, {"Density": 1850.0}],
        }
        f = tempfile.mktemp(suffix=".h5")
        try:
            save_dict_h5(d, f)
            back = load_dict_h5(f)
            np.testing.assert_allclose(back["p_amp"], d["p_amp"])
            assert back["scalar"] == 3.25
            assert back["name"] == "CTX_500"
            np.testing.assert_allclose(back["nested"]["x_vec"], np.arange(7.0))
            assert back["nested"]["deep"]["v"] == 2
            assert back["Materials"][1]["Density"] == 1850.0
        finally:
            os.remove(f)

    def test_h5_concurrent_saves(self, rng, tmp_path):
        """Regression: two AsyncSaver workers writing h5 files at once
        corrupted HDF5's global metadata cache through the BLOSC
        direct-chunk path ('ring type mismatch occurred for cache entry',
        intermittent segfaults) before io._H5_LOCK serialized HDF5
        sessions. Without the lock this fails within a few iterations."""
        import threading

        payload = {
            "a": rng.normal(size=(48, 48, 80)).astype(np.float32),
            "b": rng.normal(size=(256, 256)),
            "n": {"c": np.arange(5000)},
        }
        errs = []

        def worker(tid):
            for i in range(25):
                try:
                    comp = "blosc" if (i + tid) % 2 == 0 else "gzip"
                    p = str(tmp_path / f"t{tid}.h5")
                    save_dict_h5(payload, p, compression=comp)
                    back = load_dict_h5(p)
                    assert back["a"].shape == (48, 48, 80)
                except Exception as e:  # pragma: no cover - failure path
                    errs.append((tid, i, repr(e)))
                    return

        ts = [threading.Thread(target=worker, args=(t,)) for t in range(3)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        assert not errs, errs


class TestDomainArithmetic:
    def test_snap_ppp_fixups(self):
        assert snap_ppp(31) == 32
        assert snap_ppp(23) == 24
        assert snap_ppp(47) == 48
        assert snap_ppp(71) == 72
        assert snap_ppp(74) == 75
        assert snap_ppp(79) == 80
        assert snap_ppp(34) == 35
        assert snap_ppp(21) == 25
        assert snap_ppp(20) == 20
        assert snap_ppp(12.3) == 15

    def test_time_stepping(self):
        mats = build_label_materials(500e3, segmented=False)
        dx, dt, ppp, adj = compute_time_stepping(mats, 500e3, 6.0, 0.5)
        # dx from the global smallest speed (Pichardo shear bound 1102.5)
        assert dx == pytest.approx(1102.515 / 500e3 / 6.0, rel=1e-6)
        assert ppp % 5 == 0 or ppp in (32, 24, 48, 72, 75, 80, 35)
        assert dt == pytest.approx(1 / 500e3 / ppp)

    def test_simulation_steps_multiple_of_ppp(self):
        n = simulation_steps(np.array([0.06, 0.06, 0.1]), 1500.0, 1e-7, 20)
        assert n % 20 == 0
        assert n * 1e-7 >= np.linalg.norm([0.06, 0.06, 0.1]) / 1500.0

    def test_remap_labels_plain(self):
        ids = np.array([[[0, 1, 2, 3, 4, 5]]])
        out = remap_labels(ids, segmented=False)
        np.testing.assert_array_equal(out[0, 0], [0, 1, 2, 3, 4, 4])

    def test_remap_labels_segmented(self):
        ids = np.array([[[0, 1, 2, 3, 4, 5, 6, 7, 8]]])
        out = remap_labels(ids, segmented=True)
        np.testing.assert_array_equal(out[0, 0], [0, 1, 2, 3, 4, 4, 5, 6, 7])

    def test_remap_labels_ct(self):
        ids = np.array([[[0, 1, 2, 3, 4, 5]]])
        ct = np.array([[[0, 0, 7, 9, 0, 0]]])
        out = remap_labels(ids, ct, segmented=False)
        # water0 skin1 brain2; bone -> 3 + ct index
        np.testing.assert_array_equal(out[0, 0], [0, 1, 10, 12, 2, 2])

    def test_build_domain_shapes(self):
        mask = np.zeros((40, 40, 60), np.uint8)
        mask[10:30, 10:30, 20:40] = 4
        mask[20, 20, 30] = 5
        dom = build_domain(mask, 500e3, 6.0)
        assert dom.material_map.shape == (64, 64, 84)
        # focal voxel: mask z=30 flips to 29, +12 offset
        np.testing.assert_array_equal(dom.focal_idx, [32, 32, 41])
        assert dom.z_vec[dom.focal_idx[2]] == 0.0
        # tissue below source plane removed
        assert dom.material_map[:, :, : dom.source_z + 1].max() == 0
        # crop/unflip roundtrip restores mask shape
        restored = dom.crop_and_unflip(dom.material_map)
        assert restored.shape == mask.shape


class TestStep1Phantom:
    @pytest.fixture(scope="class")
    def phantom(self):
        # spherical-shell head: skin r<46, bone 36<r<42, brain r<36
        n = 96
        aff = np.diag([2.0, 2.0, 2.0, 1.0])
        aff[:3, 3] = -96.0  # center at RAS origin
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n]
        ras = np.stack([ii, jj, kk], -1) * 2.0 - 96.0
        r = np.linalg.norm(ras, axis=-1)
        labels = np.zeros((n, n, n), np.int32)
        labels[r < 46] = 5  # skin
        labels[r < 42] = 7  # compact bone
        labels[r < 39] = 4  # spongy bone
        labels[r < 36] = 2  # GM
        labels[r < 25] = 1  # WM
        return labels, aff

    def test_generate_mask_structure(self, phantom):
        labels, aff = phantom
        res = generate_mask(
            labels, aff, target_ras=[0, 0, 32], direction_ras=[0, 0, -1],
            frequency=500e3, ppw=6.0, shape=(96, 96, 160),
        )
        m = res.mask
        assert m[tuple(res.target_idx)] == 5
        # tissue layers present along the trajectory in correct order:
        center = m[48, 48, :]
        kinds = [v for v in center[::-1] if v != 0]
        # from transducer side: skin... bone... brain
        first_skin = next(i for i, v in enumerate(kinds) if v == 1)
        first_bone = next(i for i, v in enumerate(kinds) if v in (2, 3))
        first_brain = next(i for i, v in enumerate(kinds) if v in (4, 5))
        assert first_skin < first_bone < first_brain
        assert (m == 3).sum() > 0  # trabecular core exists
        assert (m == 2).sum() > 0

    def test_generate_mask_ct(self, phantom):
        labels, aff = phantom
        # synthetic CT: bone ~1500 HU, soft ~40
        n = labels.shape[0]
        ct = np.where(np.isin(labels, [4, 7]), 1500.0, 40.0) + np.random.default_rng(
            0
        ).normal(0, 30, labels.shape)
        res = generate_mask(
            labels, aff, target_ras=[0, 0, 32], direction_ras=[0, 0, -1],
            frequency=500e3, ppw=6.0, shape=(96, 96, 160),
            ct_data=ct, ct_affine=aff,
        )
        assert res.unique_hu is not None
        bone = (res.mask == 2) | (res.mask == 3)
        assert res.ct_index[bone].max() > 0
        assert len(res.unique_hu) <= 1023
        # mapped HU values in the bone range
        vals = res.unique_hu[res.ct_index[bone]]
        assert np.median(vals) > 800


    def test_maximize_bone_rim(self):
        """Partial-volume rim fix (`BabelDatasetPreps.py:935-1017`): low-HU
        bone-edge voxels are boosted toward the interior mean, interior and
        non-bone voxels are untouched, and the boost is capped."""
        from babelbrain_tpu.pipeline.step1 import maximize_bone_rim

        n = 40
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n]
        r = np.sqrt((ii - 20.0) ** 2 + (jj - 20.0) ** 2 + (kk - 20.0) ** 2)
        bone = (r > 8) & (r < 14)
        ct = np.full((n, n, n), 40.0, np.float32)
        ct[bone] = 1500.0
        edge = bone & ((r < 9.5) | (r > 12.5))
        ct[edge] = 500.0  # partial-volume-depressed rim
        out = maximize_bone_rim(ct, bone, voxels_per_mm=3.0)
        assert (out[edge] > 700.0).mean() > 0.9  # rim pulled up
        assert out[edge].max() <= 1500.0 + 1e-3
        interior = bone & ~edge
        np.testing.assert_allclose(out[interior], ct[interior])
        np.testing.assert_allclose(out[~bone], ct[~bone])
        # boost clamp: a deep outlier cannot jump more than max_boost
        ct2 = ct.copy()
        sel = np.argwhere(edge)[0]
        ct2[tuple(sel)] = 100.0
        out2 = maximize_bone_rim(ct2, bone, voxels_per_mm=3.0, max_boost=200.0)
        assert out2[tuple(sel)] <= 300.0 + 1e-3

    def test_export_surface_meshes(self, phantom, tmp_path):
        from babelbrain_tpu.ops.mesh import mesh_volume
        from babelbrain_tpu.ops.voxelize import read_stl
        from babelbrain_tpu.pipeline.step1 import export_surface_meshes

        labels, aff = phantom
        res = generate_mask(
            labels, aff, target_ras=[0, 0, 32], direction_ras=[0, 0, -1],
            frequency=500e3, ppw=6.0, shape=(96, 96, 160),
        )
        out = export_surface_meshes(res, str(tmp_path / "case"), 4)
        assert set(out) == {"skin", "bone", "csf"}
        vols = {}
        for name, path in out.items():
            tris = read_stl(path)
            assert len(tris) > 100
            vols[name] = abs(mesh_volume(tris))
        # nested anatomy: head > brain region, head > skull shell
        assert vols["skin"] > vols["csf"]
        assert vols["skin"] > vols["bone"]


class TestProfiles:
    def test_registry_covers_all_families(self):
        kinds = {spec.kind for spec in TRANSDUCER_REGISTRY.values()}
        assert kinds == {
            "single", "annular", "concave", "flat", "flat_rings", "dome"
        }
        # every device the reference's start dialog offers
        # (`SelFiles/ui_form.py:253-271`)
        reference_txs = {
            "Single", "CTX_500", "CTX_250", "CTX_250_2ch", "DPX_500",
            "DPXPC_300", "H317", "H246", "BSonix", "REMOPD", "I12378",
            "ATAC", "R15148", "R15287", "R15473", "R15646", "IGT64_500",
            "H301", "DomeTx",
        }
        assert reference_txs <= set(TRANSDUCER_REGISTRY)

    def test_build_ctx500(self):
        tx = build_transducer(TRANSDUCER_REGISTRY["CTX_500"], 500e3)
        assert tx.num_elements == 4

    def test_build_ring_arrays(self):
        # 10-ring devices (`Babel_R15287/default.yaml`, `Babel_R15473/...`)
        for name, n in (("R15287", 10), ("R15473", 10), ("DPXPC_300", 4)):
            spec = TRANSDUCER_REGISTRY[name]
            tx = build_transducer(spec, 300e3)
            assert tx.num_elements == n, name
            # quadrature telescopes to the exact spherical band areas
            F = spec.focal_length
            b_in = np.arcsin(np.asarray(spec.in_diameters) / 2 / F)
            b_out = np.arcsin(np.asarray(spec.out_diameters) / 2 / F)
            total = 2 * np.pi * F**2 * np.sum(np.cos(b_in) - np.cos(b_out))
            np.testing.assert_allclose(tx.areas.sum(), total, rtol=1e-4)

    def test_build_flat(self):
        tx = build_transducer(TRANSDUCER_REGISTRY["REMOPD"], 490e3)
        assert tx.num_elements == 256

    def test_thermal_profile_yaml(self, tmp_path):
        p = tmp_path / "prof.yaml"
        p.write_text(
            "BaseIsppa: 10.0\n"
            "AllDC_PRF_Duration:\n"
            "  - DC: 0.3\n    PRF: 100\n    Duration: 30.0\n    DurationOff: 30.0\n"
            "  - DC: 0.5\n    PRF: 250\n    Duration: 10.0\n    DurationOff: 10.0\n"
            "    Repetitions: 3\n    NumberGroupedSonications: 2\n"
            "    PauseBetweenGroupedSonications: 5.0\n"
        )
        base, combos = load_thermal_profile(str(p))
        assert base == 10.0
        assert len(combos) == 2
        assert combos[1].repetitions == 3
        assert combos[1].grouped_sonications == 2
        assert combos[1].pause_between_groups == 5.0
        assert combos[0].isppa == 10.0


class TestCaseCache:
    @pytest.mark.slow
    def test_cache_hit_skips_recompute(self, tmp_path):
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            TransducerSpec,
        )
        from babelbrain_tpu.pipeline.runner import CaseConfig, run_case

        TRANSDUCER_REGISTRY.setdefault(
            "MiniCache",
            TransducerSpec("MiniCache", "single", diameter=20e-3,
                           focal_length=25e-3, frequencies=(500e3,)),
        )
        n = 64
        aff = np.diag([2.0, 2.0, 2.0, 1.0])
        aff[:3, 3] = -64.0
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n]
        r = np.linalg.norm(np.stack([ii, jj, kk], -1) * 2.0 - 64.0, axis=-1)
        labels = np.zeros((n, n, n), np.int32)
        labels[r < 30] = 5
        labels[r < 26] = 7
        labels[r < 22] = 2
        cfg = CaseConfig(tx_system="MiniCache", output_dir=str(tmp_path),
                         prefix="c")
        kw = dict(
            target_ras=[0, 0, 14], direction_ras=[0, 0, -1],
            mask_shape=(48, 48, 72),
        )
        r1 = run_case(cfg, labels, aff, **kw)
        assert not r1["cached"]
        r2 = run_case(cfg, labels, aff, **kw)
        assert r2["cached"]
        assert "p_amp" in r2["data_for_sim"]
        # changing an input invalidates the cache
        labels2 = labels.copy()
        labels2[0, 0, 0] = 1
        r3 = run_case(cfg, labels2, aff, **kw)
        assert not r3["cached"]

    @pytest.mark.slow
    def test_step1_reused_across_steering(self, tmp_path, monkeypatch):
        """Steering changes must reuse the Step-1 cache (the FileManager
        per-step hash-chain behavior): generate_mask is not called again."""
        import babelbrain_tpu.pipeline.runner as runner_mod
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            TransducerSpec,
        )
        from babelbrain_tpu.pipeline.runner import CaseConfig, run_case

        TRANSDUCER_REGISTRY.setdefault(
            "MiniCache",
            TransducerSpec("MiniCache", "single", diameter=20e-3,
                           focal_length=25e-3, frequencies=(500e3,)),
        )
        n = 64
        aff = np.diag([2.0, 2.0, 2.0, 1.0])
        aff[:3, 3] = -64.0
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n]
        r = np.linalg.norm(np.stack([ii, jj, kk], -1) * 2.0 - 64.0, axis=-1)
        labels = np.zeros((n, n, n), np.int32)
        labels[r < 30] = 5
        labels[r < 26] = 7
        labels[r < 22] = 2
        kw = dict(
            target_ras=[0, 0, 14], direction_ras=[0, 0, -1],
            mask_shape=(48, 48, 72),
        )
        cfg = CaseConfig(tx_system="MiniCache", output_dir=str(tmp_path),
                         prefix="s")
        r1 = run_case(cfg, labels, aff, **kw)
        assert not r1["cached"]

        def boom(*a, **k):
            raise AssertionError("generate_mask re-ran despite Step-1 cache")

        monkeypatch.setattr(runner_mod, "generate_mask", boom)
        cfg2 = CaseConfig(tx_system="MiniCache", output_dir=str(tmp_path),
                          prefix="s", steering=(0.0, 0.0, 2e-3))
        r2 = run_case(cfg2, labels, aff, **kw)
        assert not r2["cached"]  # full-case cache misses (steering changed)
        np.testing.assert_array_equal(
            r2["step1"].mask, r1["step1"].mask
        )


class TestCoregistration:
    def test_recover_known_rigid_transform(self, rng):
        from babelbrain_tpu.ops.imaging import resample_affine
        from babelbrain_tpu.pipeline.coreg import euler_matrix, register_rigid

        # structured phantom (ellipsoid + bright rods) so NCC has gradients
        n = 48
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n].astype(float)
        fixed = np.exp(
            -(((ii - 24) / 12) ** 2 + ((jj - 24) / 9) ** 2 + ((kk - 24) / 15) ** 2)
        )
        fixed += 0.7 * np.exp(-(((ii - 30) / 2) ** 2 + ((jj - 18) / 2) ** 2))
        fixed += 0.5 * np.exp(-(((jj - 30) / 2) ** 2 + ((kk - 14) / 2) ** 2))

        # apply a known rigid transform to create the moving image
        p_true = np.array([0.06, -0.04, 0.08, 2.0, -1.5, 1.0])
        R = np.asarray(euler_matrix(*p_true[:3]))
        c = np.array([24.0, 24, 24])
        off = c - R @ c + p_true[3:]
        moving = resample_affine(fixed, np.linalg.inv(R),
                                 -np.linalg.inv(R) @ off, (n, n, n), 1)

        p, m = register_rigid(fixed, moving, levels=(2,), iters_per_level=200)
        # recovered parameters close to truth (rot in rad, trans in voxels)
        np.testing.assert_allclose(p[:3], p_true[:3], atol=0.02)
        np.testing.assert_allclose(p[3:], p_true[3:], atol=0.5)


    def _phantom(self, n=48):
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n].astype(float)
        v = np.exp(
            -(((ii - 24) / 12) ** 2 + ((jj - 24) / 9) ** 2
              + ((kk - 24) / 15) ** 2)
        )
        v += 0.7 * np.exp(-(((ii - 30) / 2) ** 2 + ((jj - 18) / 2) ** 2))
        v += 0.5 * np.exp(-(((jj - 30) / 2) ** 2 + ((kk - 14) / 2) ** 2))
        return v

    def _misalign(self, fixed, p_true):
        from babelbrain_tpu.ops.imaging import resample_affine
        from babelbrain_tpu.pipeline.coreg import euler_matrix

        n = fixed.shape[0]
        R = np.asarray(euler_matrix(*p_true[:3]))
        c = np.full(3, n / 2.0)
        off = c - R @ c + p_true[3:]
        return resample_affine(fixed, np.linalg.inv(R),
                               -np.linalg.inv(R) @ off, fixed.shape, 1)

    @pytest.mark.slow
    def test_convergence_radius_large_misalignment(self):
        """Realistic CT<->T1 misalignments (~11 deg rotation, 5-voxel
        shifts) must still converge (VERDICT: convergence radius was
        untested)."""
        from babelbrain_tpu.pipeline.coreg import register_rigid

        fixed = self._phantom()
        p_true = np.array([0.2, -0.15, 0.12, 5.0, -4.0, 3.0])
        moving = self._misalign(fixed, p_true)
        p, m, q = register_rigid(fixed, moving, levels=(4, 2),
                                 iters_per_level=300, return_quality=True)
        np.testing.assert_allclose(p[:3], p_true[:3], atol=0.03)
        np.testing.assert_allclose(p[3:], p_true[3:], atol=0.8)
        assert q > 0.9  # NCC quality signals success

    @pytest.mark.slow
    def test_multimodal_contrast(self):
        """ZTE<->T1-like registration: the moving image has an INVERTED,
        nonlinearly remapped contrast (bright soft tissue / dark bone vs
        the fixed image). Gradient-NCC and Parzen MI must both recover the
        transform (the reference's elastix uses Mattes MI)."""
        from babelbrain_tpu.pipeline.coreg import register_rigid

        fixed = self._phantom()
        p_true = np.array([0.05, 0.08, -0.06, 2.0, -2.5, 1.5])
        shifted = self._misalign(fixed, p_true)
        # nonlinear contrast inversion: monotone-decreasing remap
        moving = 1.0 / (0.3 + shifted) - 0.5 * shifted**2
        p, _ = register_rigid(fixed, moving, levels=(2, 1),
                              iters_per_level=150)
        np.testing.assert_allclose(p[:3], p_true[:3], atol=0.03)
        np.testing.assert_allclose(p[3:], p_true[3:], atol=0.8)
        p_mi, _, q_mi = register_rigid(
            fixed, moving, levels=(2, 1), iters_per_level=150, metric="mi",
            return_quality=True,
        )
        np.testing.assert_allclose(p_mi[:3], p_true[:3], atol=0.05)
        np.testing.assert_allclose(p_mi[3:], p_true[3:], atol=1.0)
        assert q_mi > 0.2

    def test_failure_detection_quality(self):
        """Registering unrelated volumes must report a LOW quality score
        (failure detection, VERDICT: correctness-critical Step-1 link)."""
        from babelbrain_tpu.pipeline.coreg import register_rigid

        rng = np.random.default_rng(0)
        fixed = self._phantom()
        garbage = rng.normal(size=fixed.shape)
        _, _, q_bad = register_rigid(fixed, garbage, levels=(4,),
                                     iters_per_level=40,
                                     return_quality=True)
        _, _, q_good = register_rigid(fixed, fixed.copy(), levels=(4,),
                                      iters_per_level=40,
                                      return_quality=True)
        assert q_good > 0.95
        assert q_bad < 0.4


class TestBiasCorrection:
    def test_removes_smooth_shading(self, rng):
        from babelbrain_tpu.pipeline.bias import correct_bias_field

        n = 40
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n].astype(float) / (n - 1)
        r = np.sqrt((ii - 0.5) ** 2 + (jj - 0.5) ** 2 + (kk - 0.5) ** 2)
        mask = r < 0.4
        truth = np.where(mask, 1000.0, 10.0)
        truth[(r > 0.25) & (r < 0.32)] = 400.0  # bone-like shell
        bias = np.exp(0.8 * (ii - 0.5) + 0.5 * (jj - 0.5) ** 2)
        img = truth * bias * rng.normal(1.0, 0.01, truth.shape)

        corrected, est = correct_bias_field(img, mask)
        # shading across the soft-tissue region should collapse
        soft = mask & (truth == 1000.0)
        cv_before = img[soft].std() / img[soft].mean()
        cv_after = corrected[soft].std() / corrected[soft].mean()
        assert cv_after < 0.35 * cv_before
        # median intensity preserved
        assert np.median(corrected[mask]) == pytest.approx(
            np.median(img[mask]), rel=0.15
        )


class TestCalibration:
    def test_recovers_known_element_weights(self):
        from babelbrain_tpu.pipeline.calibration import (
            fit_element_weights,
            scan_plane_points,
        )
        from babelbrain_tpu.tx import make_annular_array
        from babelbrain_tpu.ops import expand_element_weights, rayleigh_field

        F0, C = 500e3, 1500.0
        k = 2 * np.pi * F0 / C
        tx = make_annular_array(
            F0, 62.94e-3,
            [0.0, 31.6988e-3, 44.2688e-3, 53.6688e-3],
            [31.14e-3, 43.71e-3, 53.11e-3, 60.83e-3],
            C, ppw_surface=3,
        ).translated([0, 0, 62.94e-3])

        # synthetic "measurement": known per-ring weights, plane at 30 mm
        rng = np.random.default_rng(11)
        w_true = (rng.uniform(0.6, 1.1, 4) * np.exp(1j * rng.uniform(-1, 1, 4)))
        u0 = expand_element_weights(tx, w_true.astype(np.complex64))
        pts = scan_plane_points(
            np.linspace(-20, 20, 21), np.linspace(-20, 20, 21), 30e-3
        )
        measured = np.asarray(
            rayleigh_field(k, tx.centers, tx.areas, u0, pts)
        )
        w_fit, resid = fit_element_weights(k, tx, pts, measured, lam=1e-4)
        # global phase is unobservable-ish; compare ratios normalized to ring 0
        ratio_true = w_true / w_true[0]
        ratio_fit = np.asarray(w_fit, np.complex128) / w_fit[0]
        np.testing.assert_allclose(ratio_fit, ratio_true, atol=0.03)
        assert resid < 0.02


class TestTargetMask:
    def test_ellipsoid_at_ras_coordinate(self, tmp_path):
        """`create_target_mask` rasterizes the PlanTUS seed at the RAS point
        mapped through the inverse affine (reference CreateVoxelMask.py)."""
        from babelbrain_tpu.pipeline.io import load_nifti, save_nifti
        from babelbrain_tpu.pipeline.step1 import create_target_mask

        affine = np.diag([2.0, 2.0, 2.0, 1.0])
        affine[:3, 3] = [-20.0, -30.0, -10.0]
        vol = np.zeros((32, 32, 32), np.float32)
        src = str(tmp_path / "t1.nii.gz")
        save_nifti(src, vol, affine)
        ras = affine[:3, :3] @ np.array([10, 12, 14]) + affine[:3, 3]
        mask, out = create_target_mask(src, ras, radii_vox=(2.0, 2.0, 2.0))
        assert out.endswith("t1_mask.nii.gz")
        assert mask[10, 12, 14] == 1.0
        # ellipsoid of radius 2 vox: 6-neighborhood in, corners out
        assert mask[12, 12, 14] == 1.0 and mask[10, 14, 14] == 1.0
        assert mask[12, 14, 16] == 0.0
        back = load_nifti(out)
        np.testing.assert_array_equal(back.data, mask)
        np.testing.assert_allclose(back.affine, affine, atol=1e-5)

    def test_out_of_bounds_raises(self, tmp_path):
        from babelbrain_tpu.pipeline.io import save_nifti
        from babelbrain_tpu.pipeline.step1 import create_target_mask

        src = str(tmp_path / "t1.nii.gz")
        save_nifti(src, np.zeros((8, 8, 8), np.float32), np.eye(4))
        with pytest.raises(ValueError):
            create_target_mask(src, (100.0, 0.0, 0.0))


class TestDomainFit:
    """Reference grow/tight-beam-shrink loop
    (`BabelIntegrationBASE.py:1874-2068`)."""

    def _mask(self):
        mask = np.zeros((60, 60, 80), np.uint8)
        mask[:, :, 30:36] = 2
        mask[30, 30, 55] = 5
        return mask

    def test_wide_cone_grows_offsets(self):
        from babelbrain_tpu.pipeline.domain import fit_domain_offsets

        off, shr = fit_domain_offsets(
            self._mask(), 0.5e-3, 64e-3, 63.2e-3, npml=12
        )
        # incident cylinder (RadiusFace ~ 17.8 mm = 35.5 cells around the
        # focus at x=30+12) enters the x/y PML -> offsets grow by ceil 6
        assert off[0] == off[1] == off[2] == off[3] == 18
        assert off[4] == off[5] == 12
        assert shr == (0, 0, 0, 0, 0, 0)

    def test_tight_narrow_beam_shrinks(self):
        from babelbrain_tpu.pipeline.domain import fit_domain_offsets

        off, shr = fit_domain_offsets(
            self._mask(), 0.5e-3, 10e-3, 63.2e-3, npml=12,
            tight_narrow_beam=True, z_beyond_focal_m=0.0225,
        )
        assert off == (12, 12, 12, 12, 12, 12)
        # x/y hug the ~2.4 mm beam radius; z-low crops the water standoff
        # down to the first tissue plane; z-high truncates past the focus
        assert shr[0] > 20 and shr[2] > 20
        assert shr[4] == 30  # water gap: first tissue at mask z=30
        assert shr[5] == 0   # focus at z=55 + 45 cells > mask extent

    def test_build_domain_with_shrinks(self):
        from babelbrain_tpu.pipeline.domain import (
            build_domain,
            fit_domain_offsets,
        )

        mask = self._mask()
        off, shr = fit_domain_offsets(
            mask, 0.5e-3, 10e-3, 63.2e-3, npml=12, tight_narrow_beam=True
        )
        dom = build_domain(
            np.flip(mask, 2), 500e3, 6.0, offsets=off, shrink_cells=shr
        )
        exp = tuple(
            mask.shape[d] + off[2 * d] + off[2 * d + 1]
            - shr[2 * d] - shr[2 * d + 1]
            for d in range(3)
        )
        assert dom.material_map.shape == exp
        # target survives the crop and stays a brain-material voxel
        assert dom.material_map[tuple(dom.focal_idx)] == 4
        assert dom.crop(dom.material_map).shape == dom.mask_shape


class TestCalibrationIngestion:
    """Hydrophone-profile ingestion + per-location ring fitting
    (`Calibration/TxCalibration.py` workflow)."""

    def test_csv_profile_round_trip(self, tmp_path):
        from babelbrain_tpu.pipeline.calibration import (
            load_hydrophone_profiles,
        )

        z = np.arange(30.0, 80.0, 2.0)
        locs = np.array([40.0, 55.0, 70.0])
        vals = np.outer(np.hanning(len(z)), [1.0, 1.2, 0.8]) * 1e5
        rows = [",".join(["z_mm"] + [f"{v}" for v in locs])]
        for i, zz in enumerate(z):
            rows.append(",".join([f"{zz}"] + [f"{v}" for v in vals[i]]))
        # numeric header row: genfromtxt turns 'z_mm' into nan, ignored
        p = tmp_path / "profiles.csv"
        p.write_text("\n".join(rows))
        z2, l2, v2 = load_hydrophone_profiles(p)
        np.testing.assert_allclose(z2, z)
        np.testing.assert_allclose(l2, locs)
        np.testing.assert_allclose(v2, vals)

    @pytest.mark.slow
    def test_calibration_recovers_ring_weights(self, tmp_path):
        """Synthetic hydrophone scan generated with KNOWN per-ring weight
        errors -> the YAML-driven workflow recovers them."""
        import yaml

        from babelbrain_tpu.ops.rayleigh import (
            rayleigh_field,
            steering_phases,
        )
        from babelbrain_tpu.pipeline import load_dict_h5
        from babelbrain_tpu.pipeline.calibration import (
            _expand_ring_weights,
            _ring_centers,
            run_calibration,
        )
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            build_transducer,
        )

        spec = TRANSDUCER_REGISTRY["CTX_500"]
        F0 = 500e3
        k = 2 * np.pi * F0 / 1500.0
        tx = build_transducer(spec, F0, sos_water=1500.0)
        outplane = spec.meta["natural_outplane"]
        w_true = np.array(
            [1.15, 0.85 * np.exp(0.25j), 1.05 * np.exp(-0.2j), 0.9],
            np.complex64,
        )
        z_mm = np.arange(35.0, 75.0, 1.0)
        locs = [45.0, 60.0]
        amp_cols, ph_cols = [], []
        for loc in locs:
            w_steer = steering_phases(
                k, _ring_centers(tx), [0.0, 0.0, loc * 1e-3 - outplane]
            )
            u0 = _expand_ring_weights(tx, w_steer * w_true)
            pts = np.zeros((len(z_mm), 3), np.float32)
            pts[:, 2] = z_mm * 1e-3 - outplane
            f = np.asarray(rayleigh_field(k, tx.centers, tx.areas, u0, pts))
            amp_cols.append(np.abs(f))
            ph_cols.append(np.angle(f))

        def write_csv(path, cols):
            rows = [",".join(["0"] + [f"{v}" for v in locs])]
            for i, zz in enumerate(z_mm):
                rows.append(
                    ",".join([f"{zz}"] + [f"{c[i]}" for c in cols])
                )
            path.write_text("\n".join(rows))

        write_csv(tmp_path / "amp.csv", amp_cols)
        write_csv(tmp_path / "phase.csv", ph_cols)
        cfgp = tmp_path / "calib.yaml"
        cfgp.write_text(yaml.safe_dump({
            "TxSystem": "CTX_500",
            "Frequency": F0,
            "ExcelFileProfiles": str(tmp_path / "amp.csv"),
            "ExcelFilePhase": str(tmp_path / "phase.csv"),
            "Lambda": 1e-6,
            "OutputResultsPath": str(tmp_path / "out"),
        }))
        written = run_calibration(str(cfgp))
        assert len(written) == 2
        for path, loc in zip(sorted(written), locs):
            fit = load_dict_h5(path)
            w = np.asarray(fit["Amplitudes"]) * np.exp(
                1j * np.asarray(fit["Phases"])
            )
            # global phase is unobservable: align on ring 0
            w = w * np.exp(-1j * np.angle(w[0])) * np.exp(
                1j * np.angle(w_true[0])
            )
            np.testing.assert_allclose(np.abs(w), np.abs(w_true), rtol=0.05)
            np.testing.assert_allclose(
                np.angle(w / w_true), 0.0, atol=0.08
            )
            assert fit["Residual"] < 0.05
