"""Bundled element-table + calibration-table validation.

The element coordinates are physical-device measurements the reference
ships as CSV/.mat resources (`TranscranialModeling/H317.py:15-52` etc.);
these tests pin the element counts, focal-sphere placement, and aperture of
every bundled device, plus the calibration tables used by the CT mapping
methods (`BabelIntegrationBASE.py:61-69,325-360,494-589`).
"""

import numpy as np
import pytest

from babelbrain_tpu.materials import ct_mapping as cm
from babelbrain_tpu.pipeline.profiles import TRANSDUCER_REGISTRY, build_transducer
from babelbrain_tpu.tx import element_table, remopd_positions

# (name, n_elements, focal_mm, aperture_mm within 5%)
DEVICES = [
    ("H317", 128, 135.0, 153.0),
    ("I12378", 128, 72.0, 102.0),
    ("ATAC", 128, 53.2, 54.0),
    ("H301", 128, 150.0, 142.0),
    ("IGT64_500", 64, 75.0, 65.0),
    ("R15646", 64, 65.0, 65.0),
    ("R15148", 128, 80.0, 100.0),
    ("DomeTx", 1024, 150.0, 300.0),
]


@pytest.mark.parametrize("name,n_el,focal_mm,aperture_mm", DEVICES)
def test_element_table_on_focal_sphere(name, n_el, focal_mm, aperture_mm):
    ec = element_table(name)
    assert ec.shape == (n_el, 3)
    r = np.linalg.norm(ec, axis=1) * 1e3
    # every element center sits on the sphere of radius F about the focus
    assert np.abs(r - focal_mm).max() < 0.05
    spec = TRANSDUCER_REGISTRY[name]
    assert abs(spec.focal_length * 1e3 - focal_mm) < 1e-6


@pytest.mark.parametrize("name,n_el,focal_mm,aperture_mm", DEVICES)
def test_built_transducer_aperture(name, n_el, focal_mm, aperture_mm):
    spec = TRANSDUCER_REGISTRY[name]
    tx = build_transducer(spec, spec.frequencies[0], ppw_surface=4.0)
    assert tx.num_elements == n_el
    ap = (tx.centers[:, 0].max() - tx.centers[:, 0].min()) * 1e3
    assert ap == pytest.approx(aperture_mm, rel=0.05)
    # sub-element quadrature conserves per-element disc area
    area_elem = np.pi * (spec.elem_diameter / 2) ** 2
    assert tx.total_area() == pytest.approx(n_el * area_elem, rel=0.02)


def test_remopd_positions_and_build():
    pos = remopd_positions()
    assert pos.shape == (256, 3)
    assert np.allclose(pos[:, 2], 0.0)
    spec = TRANSDUCER_REGISTRY["REMOPD"]
    tx = build_transducer(spec, 300e3)
    assert tx.num_elements == 256
    # elements sit at z=-1.2mm (`BabelIntegrationREMOPD.py:33`)
    assert np.allclose(tx.centers[:, 2], -1.2e-3)
    # total area = 256 squares of (pitch-kerf)^2
    assert tx.total_area() == pytest.approx(256 * (3.08e-3 - 0.5e-3) ** 2, rel=1e-3)


def test_h246_flat_rings():
    spec = TRANSDUCER_REGISTRY["H246"]
    tx = build_transducer(spec, 500e3)
    assert tx.num_elements == 2
    assert np.allclose(tx.centers[:, 2], 0.0)
    # exact annulus areas (`BabelIntegrationH246.py:255-257`)
    a1 = np.pi * (23.3e-3 / 2) ** 2
    a2 = np.pi * ((33.6e-3 / 2) ** 2 - (24.0e-3 / 2) ** 2)
    assert tx.total_area() == pytest.approx(a1 + a2, rel=1e-3)


def test_webb_table_default_combo():
    # default GE/120kVp/BonePlus row values (WebbHU_SoS.csv / WebbHU_Att.csv)
    sos = cm.hu_to_long_sos_webb(np.array([0.0, 1000.0]))
    assert sos[0] == pytest.approx(1320.0)
    assert sos[1] == pytest.approx(0.75 * 1000 + 1320.0)
    att = cm.hu_to_attenuation_webb(np.array([0.0]), 1e6)
    # alpha_0 * 1^beta * exp(0) * 100 with the GE,120,B row
    assert att[0] == pytest.approx(100.0 * cm._webb_tables()[1][cm.WEBB_DEFAULT_COMBO][0])
    assert len(cm.webb_combos()) > 50


def test_pichardo_map_bilinear():
    # map layout is [frequency, density] (the legacy-interp2d orientation;
    # see density_to_sos_pichardo docstring)
    rho, fmhz, sos, att = cm._pichardo_map()
    assert rho.shape == (500,) and sos.shape == (500, 500)
    # exact at grid nodes
    v = cm.density_to_sos_pichardo(rho[10], fmhz[20] * 1e6)
    assert v == pytest.approx(sos[20, 10])
    # midpoint = average of the four corners for a bilinear patch
    rq = 0.5 * (rho[10] + rho[11])
    fq = 0.5 * (fmhz[20] + fmhz[21])
    v = cm.density_to_sos_pichardo(rq, fq * 1e6)
    assert v == pytest.approx(sos[20:22, 10:12].mean())
    # linear extrapolation below the density grid
    below = cm.density_to_sos_pichardo(rho[0] - 50.0, fmhz[20] * 1e6)
    slope = (sos[20, 1] - sos[20, 0]) / (rho[1] - rho[0])
    assert below == pytest.approx(sos[20, 0] - 50.0 * slope, rel=1e-6)
    # physics: SoS rises strongly with density, mildly with frequency
    lo = cm.density_to_sos_pichardo(1300.0, 650e3)
    hi = cm.density_to_sos_pichardo(2800.0, 650e3)
    assert hi - lo > 1000.0
    # attenuation positive over the whole grid
    assert att.min() > 0


def test_density_to_hu_bony_roundtrip():
    # the calibration points themselves map exactly
    assert cm.density_to_hu_bony(1060.0) == pytest.approx(52.0388482)
    assert cm.density_to_hu_bony(2150.0) == pytest.approx(1659.90448)
    # midpoint linearity
    mid = cm.density_to_hu_bony(0.5 * (1660.0 + 1820.0))
    assert mid == pytest.approx(0.5 * (1003.99419 + 1234.90136))


def test_simnibs_petra_density_line():
    rho = cm.simnibs_petra_density(np.array([-1000.0, 0.0, 2000.0, 3150.0]))
    # floored at water below the line's water point
    assert rho[0] == 1000.0
    assert rho[1] == pytest.approx(1015.9349174735685)
    assert rho[2] == pytest.approx(2369.2173177111763)
    assert rho[3] == pytest.approx(3147.35469785)


def test_ucl_lowdose_monotonic():
    hu = np.linspace(-1000, 3000, 50)
    rho = cm.hu_to_density_ucl_lowdose(hu)
    assert np.all(np.diff(rho) >= 0)


def test_density_input_path_uses_hu_models():
    # bDensity path: density -> HU -> Webb SoS (`BabelIntegrationBASE.py:1184`)
    density = np.array([1500.0, 2000.0])
    d, sos, att = cm.map_hu_to_properties(
        np.zeros(2), 650e3, "Webb-Marsac", density_input=density
    )
    np.testing.assert_allclose(d, density)
    hu = cm.density_to_hu_bony(density)
    np.testing.assert_allclose(sos, cm.hu_to_long_sos_webb(hu))


class TestRegistrySemantics:
    """The per-device registry metadata must drive behavior: TPO <-> Z
    steering, steering-range enforcement, cone-to-focus mechanical-Z,
    1 W amplitude calibration."""

    def test_tpo_round_trip(self):
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            tpo_to_z_steering,
            z_steering_to_tpo,
        )

        spec = TRANSDUCER_REGISTRY["CTX_500"]
        # ZSteering = TPO - NaturalOutPlaneDistance (`Babel_RingTx.py:97`)
        z = tpo_to_z_steering(spec, 60e-3)
        assert z == pytest.approx(60e-3 - 52.38e-3)
        assert z_steering_to_tpo(spec, z) == pytest.approx(60e-3)
        with pytest.raises(ValueError):
            tpo_to_z_steering(spec, 90e-3)  # > MaximalTPODistance 82.5
        with pytest.raises(ValueError):
            tpo_to_z_steering(spec, 20e-3)  # < MinimalTPODistance 33.6

    def test_steering_range_enforced(self):
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            validate_steering,
        )

        h317 = TRANSDUCER_REGISTRY["H317"]
        validate_steering(h317, (10e-3, -10e-3, 40e-3))
        with pytest.raises(ValueError):
            validate_steering(h317, (25e-3, 0, 0))  # x beyond 20 mm
        with pytest.raises(ValueError):
            validate_steering(h317, (0, 0, 60e-3))  # z beyond 50 mm
        ctx = TRANSDUCER_REGISTRY["CTX_500"]
        validate_steering(ctx, (0, 0, 10e-3))
        with pytest.raises(ValueError):
            validate_steering(ctx, (5e-3, 0, 0))  # annular: z only
        with pytest.raises(ValueError):
            validate_steering(ctx, (0, 0, 50e-3))  # maps past TPO max
        # devices without a published range (Single/custom) are permissive
        validate_steering(TRANSDUCER_REGISTRY["Single"], (0, 0, 5e-3))

    def test_cone_to_focus_adjust(self):
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            cone_to_focus_adjust,
        )

        spec = TRANSDUCER_REGISTRY["H317"]
        # default cone 25 mm, skin-to-target 40 mm -> push Tx back 15 mm
        mech, extra = cone_to_focus_adjust(spec, 40e-3)
        assert mech == pytest.approx(25e-3 - 40e-3)
        assert extra == 0.0
        mech, extra = cone_to_focus_adjust(spec, 40e-3, 50e-3,
                                           z_steering=10e-3)
        assert mech == pytest.approx(10e-3)
        assert extra == pytest.approx(10e-3)
        with pytest.raises(ValueError):
            cone_to_focus_adjust(spec, 40e-3, 100e-3)  # > max 95.5 mm

    def test_amplitude_1w(self):
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            amplitude_for_1w,
        )

        dome = TRANSDUCER_REGISTRY["DomeTx"]
        assert amplitude_for_1w(dome, 220e3, 6) == pytest.approx(74065.04)
        assert amplitude_for_1w(dome, solver="Rayleigh") == pytest.approx(
            0.14475482330468514
        )
        with pytest.raises(ValueError):
            amplitude_for_1w(dome, 500e3, 6)
        with pytest.raises(ValueError):
            amplitude_for_1w(TRANSDUCER_REGISTRY["Single"], 500e3, 6)
