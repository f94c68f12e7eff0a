"""Golden-value tests for the tissue property database and CT mappings.

Golden values are computed from the published anchor constants (same fits the
reference builds its table from, `BabelIntegrationBASE.py:71-167`).
"""

import numpy as np
import pytest

from babelbrain_tpu.materials import (
    material_array,
    smallest_sos,
    speed_of_sound_water,
    tissue_properties,
)
from babelbrain_tpu.materials import ct_mapping as ctm
from babelbrain_tpu.materials import thermal as th
from babelbrain_tpu.materials.database import (
    fit_att_bone_shear,
    fit_att_cortical_long,
    fit_att_trabecular_long,
    fit_speed_cortical_long,
    fit_speed_cortical_shear,
    fit_speed_trabecular_long,
    fit_speed_trabecular_shear,
)


class TestTissueDatabase:
    def test_anchor_frequencies_cortical_long(self):
        # the linear fit must reproduce its own anchors
        assert fit_speed_cortical_long(270e3) == 2448.0
        assert fit_speed_cortical_long(836e3) == 2516.0

    def test_anchor_frequencies_trabecular_long(self):
        assert fit_speed_trabecular_long(270e3) == 2140.0
        assert fit_speed_trabecular_long(836e3) == 2300.0

    def test_shear_anchor_means(self):
        assert fit_speed_cortical_shear(270e3) == np.round(
            np.mean([1577.0, 1498.0, 1313.0])
        )
        assert fit_speed_trabecular_shear(836e3) == np.round(
            np.mean([1574.0, 1252.0, 1327.0])
        )

    def test_bone_attenuation_500khz(self):
        assert fit_att_cortical_long(500e3) == np.round(203.25090263 * 0.5 * 0.8)
        assert fit_att_trabecular_long(500e3) == np.round(202.76362433 * 0.5 * 0.8)
        assert fit_att_bone_shear(500e3) == np.round(
            (57.0 / 0.27 + 373.0 / 0.836) / 2 * 0.5
        )

    def test_soft_tissue_500khz(self):
        p = tissue_properties(500e3)
        np.testing.assert_allclose(p["Water"], [1000.0, 1500.0, 0, 0, 0])
        np.testing.assert_allclose(p["Skin"], [1116.0, 1537.0, 0, 2.3, 0])
        np.testing.assert_allclose(p["Brain"], [1041.0, 1562.0, 0, 3.45, 0])
        np.testing.assert_allclose(p["CSF"][3], 0.0990 * 0.5)

    def test_material_array_shape_and_order(self):
        arr = material_array(650e3)
        assert arr.shape == (8, 5)
        assert arr[0, 0] == 1000.0  # water density first
        assert arr[1, 0] == 1896.5  # cortical density

    def test_out_of_range_raises(self):
        with pytest.raises(ValueError):
            tissue_properties(50e3)

    def test_smallest_sos(self):
        # smallest across table at 500 kHz is trabecular shear
        s = smallest_sos(500e3)
        assert s == fit_speed_trabecular_shear(500e3)
        # with shear bound: Pichardo at water density = 0.422*1000+680.515
        assert smallest_sos(500e3, include_shear=True) == pytest.approx(1102.515)

    def test_water_sos(self):
        assert speed_of_sound_water(20.0) == pytest.approx(1482.34, abs=0.5)
        assert speed_of_sound_water(37.0) == pytest.approx(1523.4, abs=1.0)


class TestCTMappings:
    def test_webb_sos_default(self):
        np.testing.assert_allclose(
            ctm.hu_to_long_sos_webb(np.array([0.0, 1000.0])), [1320.0, 2070.0]
        )

    def test_webb_attenuation_monotone_decreasing_in_hu(self):
        att = ctm.hu_to_attenuation_webb(np.array([0.0, 500.0, 1500.0]), 500e3)
        assert att[0] > att[1] > att[2]
        # alpha_0 * 0.5^1.3 * 100 at HU=0
        assert att[0] == pytest.approx(26.0 * 0.5**1.3 * 100)

    def test_kwave_density_water_point(self):
        # HU=0 (water) should map near 1000 kg/m3
        assert ctm.hu_to_density_kwave(np.array([0.0]))[0] == pytest.approx(
            1012.0, abs=15
        )

    def test_porosity_roundtrip(self):
        hu = np.array([0.0, 1000.0, 2000.0])
        phi = ctm.hu_to_porosity(hu)
        np.testing.assert_allclose(phi, [1.0, 0.5, 0.0])
        np.testing.assert_allclose(ctm.porosity_to_density(phi), [1000, 1600, 2200])
        np.testing.assert_allclose(ctm.porosity_to_long_sos(phi), [1500, 2300, 3100])

    def test_all_methods_produce_physical_values(self):
        hu = np.linspace(300.0, 2000.0, 64)
        for method in ctm.MAPPING_METHODS:
            rho, sos, att = ctm.map_hu_to_properties(hu, 650e3, method)
            assert rho.shape == sos.shape == att.shape == hu.shape
            assert np.all(rho > 800) and np.all(rho < 3200), method
            assert np.all(sos > 1000) and np.all(sos < 4500), method
            assert np.all(att >= 0) and np.all(att < 5000), method

    def test_quantize_hu(self):
        vol = np.zeros((8, 8, 8))
        mask = np.zeros_like(vol, bool)
        vol[2:6, 2:6, 2:6] = np.linspace(300, 2100, 64).reshape(4, 4, 4)
        mask[2:6, 2:6, 2:6] = True
        uhu, idx = ctm.quantize_hu(vol, mask, bits=10)
        assert len(uhu) <= 64
        assert idx.max() == len(uhu) - 1
        assert idx[~mask].max() == 0
        # reconstruction error bounded by quantization step
        recon = uhu[idx[mask]]
        step = (2100 - 300) / 1022
        assert np.abs(recon - vol[mask]).max() <= step * 1.01


class TestThermalMaterials:
    def test_label_mode_five_tissues(self):
        mats = material_array(500e3, ("Water", "Skin", "Cortical", "Trabecular", "Brain"))
        ml = th.build_thermal_material_list(mats, ct_mode=False, segmented_brain=False)
        np.testing.assert_allclose(ml.specific_heat, [4178, 3391, 1313, 2274, 3630])
        np.testing.assert_allclose(ml.conductivity, [0.6, 0.37, 0.32, 0.31, 0.51])
        np.testing.assert_allclose(ml.perfusion, [0, 106, 10, 30, 559])
        np.testing.assert_allclose(ml.absorption, [0, 0.85, 0.16, 0.15, 0.85])

    def test_ct_mode_skull_averages(self):
        # 3 soft + 4 HU materials
        mats = np.zeros((7, 5))
        mats[:, 0] = 1000.0
        mats[:, 1] = 1500.0
        ml = th.build_thermal_material_list(mats, ct_mode=True, segmented_brain=False)
        np.testing.assert_allclose(ml.specific_heat[3:], (1313.0 + 2274.0) / 2)
        np.testing.assert_allclose(ml.conductivity[3:], (0.32 + 0.31) / 2)
        np.testing.assert_allclose(ml.absorption[3:], (0.16 + 0.15) / 2)
        np.testing.assert_allclose(ml.specific_heat[:3], [4178, 3391, 3630])

    def test_segmented_brain_adds_three(self):
        mats = material_array(500e3)
        ml = th.build_thermal_material_list(mats, ct_mode=False, segmented_brain=True)
        assert len(ml.specific_heat) == 8
        np.testing.assert_allclose(ml.specific_heat[5:], [3583.0, 3696.0, 4096.0])


class TestPseudoCT:
    def _head(self, rng):
        # synthetic ZTE-like: soft tissue ~1000, bone ~400, air 20
        n = 48
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n]
        r = np.sqrt((ii - 24.0) ** 2 + (jj - 24.0) ** 2 + (kk - 24.0) ** 2)
        img = np.full((n, n, n), 20.0)
        head = r < 20
        img[head] = 1000.0
        bone = (r > 14) & (r < 18)
        img[bone] = 400.0
        img += rng.normal(0, 10, img.shape)
        return img, head, bone

    def test_zte_pct_bone_range(self, rng):
        from babelbrain_tpu.materials.pseudo_ct import mri_to_pseudo_ct

        img, head, bone = self._head(rng)
        pct = mri_to_pseudo_ct(img, head, "ZTE")
        # bone at norm ~0.4 -> pCT ~ -2085*0.4+2329 ~ 1495 HU
        med = np.median(pct[bone])
        assert 1300 < med < 1700
        assert np.all(pct[~head] == -1000.0)
        # soft tissue mapped to ~42
        soft = head & ~bone
        assert np.median(pct[soft]) == 42.0

    def test_petra_pct(self, rng):
        from babelbrain_tpu.materials.pseudo_ct import mri_to_pseudo_ct

        img, head, bone = self._head(rng)
        pct = mri_to_pseudo_ct(img, head, "PETRA")
        med = np.median(pct[bone])
        assert 1100 < med < 1700

    def test_sdr(self):
        from babelbrain_tpu.materials.pseudo_ct import compute_sdr

        # uniform-density skull slab -> SDR = 1; porous core -> < 1
        vol = np.zeros((10, 10, 30))
        mask = np.zeros_like(vol, bool)
        vol[:, :, 10:20] = 1000.0
        mask[:, :, 10:20] = True
        assert compute_sdr(vol, mask) == pytest.approx(1.0)
        vol[:, :, 14:16] = 400.0
        assert compute_sdr(vol, mask) == pytest.approx(0.4, abs=0.01)


class TestPseudoCTNormalization:
    """Parity details of `CTZTEProcessing.py:556-594`."""

    def test_zte_percentile_norm(self):
        from babelbrain_tpu.materials.pseudo_ct import normalize_zte

        rng = np.random.default_rng(3)
        img = rng.uniform(500, 1500, (20, 20, 20))
        head = np.ones(img.shape, bool)
        norm = normalize_zte(img, head)
        cutoff = np.percentile(img[img > -500], 95)
        np.testing.assert_allclose(norm, img / cutoff)
        # outside the head -> -0.5 (`:595`)
        head[0, 0, 0] = False
        assert normalize_zte(img, head)[0, 0, 0] == -0.5

    def test_petra_two_peak_norm(self):
        from babelbrain_tpu.materials.pseudo_ct import normalize_petra

        rng = np.random.default_rng(4)
        # bimodal: tall peak at 300 (soft tissue), smaller at 900; the
        # reference divides by the HIGHEST-INTENSITY of the top-2 peaks
        img = np.concatenate([
            rng.normal(300, 5, 8000), rng.normal(900, 5, 4000),
        ]).reshape(20, 20, 30)
        norm = normalize_petra(img, np.ones(img.shape, bool))
        ref = img / norm  # recovered divisor
        assert 880 < ref.ravel()[0] < 920
