"""Registration robustness harness (VERDICT r3 task 7).

Capture-range sweep + failure-detection calibration for the rigid
CT<->T1-like registration that replaces the reference's elastix subprocess
(`BabelBrain/CTZTEProcessing.py:111`, `ExternalBin/elastix/rigid.txt`).

The phantom pair has genuinely different modality contrasts (CT: bright
skull / flat soft tissue; T1: dark skull / graded soft tissue), plus noise
and a synthetic multiplicative coil-shading bias on the MR volume. Known
rigid misalignments up to +/-15 deg and +/-20 mm are applied and must be
recovered; diverged and wrong-anatomy registrations must score below the
calibrated quality threshold while every converged one scores above it
(`coreg.QUALITY_THRESHOLD` / `registration_ok`).

Measured capture range on this phantom (documented, asserted below):
  NCC-on-gradients: rotations to 15 deg, translations to 20 mm (10 vox),
  combined 10 deg + 10 mm, all with noise + bias applied.
  MI: rotations to 10 deg, translations to 14 mm.
"""

import numpy as np
import pytest

from babelbrain_tpu.pipeline.coreg import (
    QUALITY_THRESHOLD,
    euler_matrix,
    register_rigid,
    registration_ok,
)

VOX_MM = 2.0
N = 72


def _head_pair(rng):
    """(ct, t1) volumes with distinct modality contrasts + noise + bias."""
    ii, jj, kk = np.mgrid[0:N, 0:N, 0:N]
    c = (N - 1) / 2.0
    r = np.sqrt(
        ((ii - c) / 1.0) ** 2 + ((jj - c) / 0.92) ** 2
        + ((kk - c) / 1.15) ** 2
    ) + 1e-9
    # angular shape + thickness modulation: real crania are strongly
    # orientation-dependent (occiput, frontal flattening, thickness
    # gradients); without this the shell — which dominates the gradient
    # energy — is rotation-invariant and no optimizer can see rotations
    ux = (ii - c) / (r + 1e-6)
    uy = (jj - c) / (r + 1e-6)
    uz = (kk - c) / (r + 1e-6)
    shape_mod = 1.0 + 0.10 * ux - 0.06 * uy + 0.08 * ux * uz - 0.05 * uz
    r_out = 26.0 * shape_mod
    thick = 4.0 + 2.5 * uz - 1.5 * ux * uy
    r_in = r_out - thick
    skull = (r > r_in) & (r < r_out)
    skin = (r >= r_out) & (r < r_out + 3.0)
    brain = r <= r_in
    ventricle = (
        np.sqrt((ii - c - 4) ** 2 + (jj - c) ** 2 + (kk - c + 3) ** 2) < 6
    )
    # strongly asymmetric internal structure: without it an ellipsoidal
    # head is nearly rotation-invariant and the sweep cannot measure
    # rotational capture at all
    blob1 = (
        np.sqrt((ii - c - 11) ** 2 + (jj - c - 4) ** 2 + (kk - c + 7) ** 2)
        < 5
    )
    blob2 = (
        np.sqrt((ii - c + 8) ** 2 + (jj - c - 10) ** 2 + (kk - c - 8) ** 2)
        < 4
    )
    sinus = (
        np.sqrt((ii - c) ** 2 + (jj - c + 18) ** 2 + (kk - c - 12) ** 2) < 5
    )
    ct = np.zeros((N, N, N))
    ct[skin] = 40.0
    ct[brain] = 35.0
    ct[skull] = 1400.0
    ct[ventricle & brain] = 8.0
    ct[blob1 & brain] = 90.0
    ct[blob2 & brain] = 500.0
    ct[sinus] = -600.0  # air pocket
    t1 = np.zeros((N, N, N))
    t1[skin] = 620.0
    t1[brain] = 800.0 + 4.0 * (r[brain] - 10)  # graded gm/wm-ish
    t1[skull] = 120.0
    t1[ventricle & brain] = 300.0
    t1[blob1 & brain] = 1100.0
    t1[blob2 & brain] = 450.0
    t1[sinus] = 30.0
    # coil-shading bias on the MR + independent noise on both
    x = (ii - c) / N
    y = (jj - c) / N
    z = (kk - c) / N
    bias = np.exp(0.5 * x + 0.35 * y - 0.3 * z + 0.4 * x * y)
    t1 = t1 * bias
    ct = ct + rng.normal(0, 12.0, ct.shape)
    t1 = t1 + rng.normal(0, 25.0, t1.shape)
    return ct, t1


def _apply_rigid(vol, rot_deg, trans_vox, rng_axis=0):
    """Misalign ``vol`` by a known rotation (deg, about ``rng_axis``) and
    translation (voxels), with linear interpolation."""
    from scipy import ndimage  # used only to BUILD the ground truth

    angles = [0.0, 0.0, 0.0]
    angles[rng_axis] = np.deg2rad(rot_deg)
    R = np.asarray(euler_matrix(*angles))
    c = np.array(vol.shape) / 2.0
    offset = c - R @ c + np.asarray(trans_vox, float)
    return ndimage.affine_transform(vol, R, offset=offset, order=1)


def _recovered_error(params, rot_deg, trans_vox, axis):
    """Error of the recovered transform vs the INVERSE of the applied one.

    moved(o) = ct(T_applied(o)) and the registration warps `moved` to the
    fixed frame, so it must estimate T_applied^-1: for a single-axis
    rotation that is -rot, and the translation part is -R^-1 t."""
    angles = [0.0, 0.0, 0.0]
    angles[axis] = np.deg2rad(rot_deg)
    R = np.asarray(euler_matrix(*angles))
    want_rot = np.zeros(3)
    want_rot[axis] = -rot_deg
    want_t = -R.T @ np.asarray(trans_vox, float)
    rots = np.rad2deg(params[:3])
    rot_err = np.abs(rots - want_rot).max()
    tr_err = np.abs(params[3:6] - want_t).max()
    return rot_err, tr_err


CASES_NCC = [
    # (rot_deg, axis, translation_vox)  - 1 vox = 2 mm
    (5.0, 2, (0, 0, 0)),
    (10.0, 2, (0, 0, 0)),
    (15.0, 0, (0, 0, 0)),
    (-15.0, 1, (0, 0, 0)),
    (0.0, 2, (5, -3, 2)),       # 10/6/4 mm
    (0.0, 2, (10, 0, -10)),     # 20 mm
    (10.0, 2, (5, 5, -5)),      # combined 10 deg + 10 mm
]
CASES_MI = [
    (10.0, 2, (0, 0, 0)),
    (0.0, 2, (7, 0, -4)),       # 14 mm
]
# sub-capture small-angle regime. Gradient-NCC's optimum is measurably
# biased ~2 deg from truth on this bias-field-shaded multi-modal pair;
# the terminal NGF (normalized-gradient-fields) polish in register_rigid
# removes that bias — measured floors on this phantom: <0.3 deg about x,
# <0.15 deg about z, <0.1 vox translation (elastix-grade,
# `ExternalBin/elastix/rigid.txt`). Rotations about y are the phantom's
# weakest-identifiability axis (its angular shape modulation has the
# smallest y-dependence) and floor at ~0.9 deg — pinned separately.
CASES_SMALL = [
    (2.5, 2, (0, 0, 0)),
    (0.5, 0, (0.5, 0.5, 0)),
    (2.0, 0, (1.0, 0, 0)),
    (3.0, 1, (0, 0, 1.5)),
]
CASES_SMALL_Y = [(1.0, 1, (0, 2.0, 0))]


@pytest.mark.slow
class TestCaptureRange:
    @pytest.fixture(scope="class")
    def pair(self):
        return _head_pair(np.random.default_rng(3))

    def _run(self, pair, rot, axis, tr, metric):
        ct, t1 = pair
        moved = _apply_rigid(ct, rot, tr, axis)
        p, _, q = register_rigid(
            t1, moved, metric=metric, return_quality=True,
        )
        rot_err, tr_err = _recovered_error(p, rot, tr, axis)
        return rot_err, tr_err, q

    @pytest.mark.parametrize("rot,axis,tr", CASES_NCC)
    def test_ncc_capture(self, pair, rot, axis, tr):
        rot_err, tr_err, q = self._run(pair, rot, axis, tr, "ncc")
        assert rot_err < 1.0, (rot_err, tr_err, q)
        assert tr_err < 1.0, (rot_err, tr_err, q)
        assert registration_ok(q, "ncc"), q

    @pytest.mark.parametrize("rot,axis,tr", CASES_MI)
    def test_mi_capture(self, pair, rot, axis, tr):
        rot_err, tr_err, q = self._run(pair, rot, axis, tr, "mi")
        assert rot_err < 1.5, (rot_err, tr_err, q)
        assert tr_err < 1.5, (rot_err, tr_err, q)
        assert registration_ok(q, "mi"), q

    @pytest.mark.parametrize("rot,axis,tr", CASES_SMALL)
    def test_small_angle_accuracy_floor(self, pair, rot, axis, tr):
        rot_err, tr_err, q = self._run(pair, rot, axis, tr, "ncc")
        assert rot_err < 0.5, (rot_err, tr_err, q)
        assert tr_err < 0.5, (rot_err, tr_err, q)

    @pytest.mark.parametrize("rot,axis,tr", CASES_SMALL_Y)
    def test_small_angle_floor_weak_y_axis(self, pair, rot, axis, tr):
        """y is this phantom's weakest-identifiability rotation axis
        (documented in CASES_SMALL's comment): floor ~0.9 deg."""
        rot_err, tr_err, q = self._run(pair, rot, axis, tr, "ncc")
        assert rot_err < 1.0, (rot_err, tr_err, q)
        assert tr_err < 0.5, (rot_err, tr_err, q)


@pytest.mark.slow
class TestFailureDetection:
    """The quality score must SEPARATE successes from failures — the
    calibrated thresholds in ``coreg.QUALITY_THRESHOLD`` sit between the
    worst success and the best failure on this harness."""

    def test_wrong_anatomy_scores_below_threshold(self):
        rng = np.random.default_rng(4)
        ct, t1 = _head_pair(rng)
        # "wrong anatomy": a shifted, differently-shaped ellipsoid set
        ii, jj, kk = np.mgrid[0:N, 0:N, 0:N]
        c = (N - 1) / 2.0
        r2 = np.sqrt(
            ((ii - c - 9) / 1.4) ** 2 + ((jj - c + 7) / 0.7) ** 2
            + ((kk - c) / 0.9) ** 2
        )
        other = np.where((r2 > 15) & (r2 < 18), 1400.0, 30.0)
        other = other + rng.normal(0, 12.0, other.shape)
        _, _, q_bad = register_rigid(
            t1, other, metric="ncc", return_quality=True,
        )
        assert not registration_ok(q_bad, "ncc"), q_bad

    def test_diverged_registration_scores_below_threshold(self):
        rng = np.random.default_rng(5)
        ct, t1 = _head_pair(rng)
        # far outside the capture range: 40 deg + 30 mm; with a handful of
        # iterations the optimizer cannot reach the basin
        moved = _apply_rigid(ct, 40.0, (15, -15, 10), 2)
        p, _, q = register_rigid(
            t1, moved, metric="ncc", return_quality=True,
            levels=(4,), iters_per_level=30,
        )
        rot_err, tr_err = _recovered_error(p, 40.0, (15, -15, 10), 2)
        assert rot_err > 2.0 or tr_err > 2.0  # genuinely failed
        assert not registration_ok(q, "ncc"), q

    def test_threshold_gap_documented(self):
        """The calibrated thresholds leave margin on both sides on this
        harness (see class docstring); the constants themselves are the
        deliverable consumed by pipeline callers."""
        assert 0.2 < QUALITY_THRESHOLD["ncc"] < 0.6
        assert 0.1 < QUALITY_THRESHOLD["mi"] < 0.5


@pytest.mark.slow
def test_bspline_bias_recovers_local_hotspot():
    """The N4-style B-spline bias basis must capture a local coil hot spot
    that the global polynomial cannot (`CTZTEProcessing.py:168` N4-class
    capability)."""
    from babelbrain_tpu.pipeline.bias import correct_bias_field

    rng = np.random.default_rng(6)
    n = 64
    ii, jj, kk = np.mgrid[0:n, 0:n, 0:n]
    c = (n - 1) / 2
    r = np.sqrt((ii - c) ** 2 + (jj - c) ** 2 + (kk - c) ** 2)
    head = r < 26
    img = np.where(head, 1000.0, 0.0)
    # local hot spot in one octant (surface coil), plus a global tilt
    hot = np.exp(
        0.9 * np.exp(-(((ii - 10.0) ** 2 + (jj - 10.0) ** 2
                        + (kk - 32.0) ** 2) / (2 * 14.0**2)))
        + 0.15 * (ii - c) / n
    )
    meas = img * hot + rng.normal(0, 8.0, img.shape)

    out_p, bias_p = correct_bias_field(meas, head, basis="poly", order=3)
    out_b, bias_b = correct_bias_field(meas, head, basis="bspline", n_ctrl=7)

    def cv(v):
        x = v[head]
        return np.std(x) / np.mean(x)

    assert cv(out_b) < cv(meas) * 0.45
    assert cv(out_b) <= cv(out_p) * 1.02  # at least matches the polynomial
    # the recovered field must correlate with the applied one inside the head
    bb = bias_b[head] / np.mean(bias_b[head])
    hh = hot[head] / np.mean(hot[head])
    corr = np.corrcoef(bb, hh)[0, 1]
    assert corr > 0.9, corr
