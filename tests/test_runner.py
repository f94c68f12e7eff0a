"""End-to-end pipeline test: Step 1 -> 2 -> 3 on a synthetic head phantom.

The miniature analogue of the reference's `test_full_pipeline_normal`
(SURVEY.md section 4) using a small custom transducer so it runs on the CPU
mesh in tens of seconds.
"""

import numpy as np
import pytest

from babelbrain_tpu.pipeline import load_dict_h5, load_nifti
from babelbrain_tpu.pipeline.profiles import TRANSDUCER_REGISTRY, TransducerSpec
from babelbrain_tpu.pipeline.runner import CaseConfig, run_case
from babelbrain_tpu.pipeline.thermal import SonicationParams


@pytest.fixture(scope="module")
def phantom():
    n = 96
    aff = np.diag([2.0, 2.0, 2.0, 1.0])
    aff[:3, 3] = -96.0
    ii, jj, kk = np.mgrid[0:n, 0:n, 0:n]
    ras = np.stack([ii, jj, kk], -1) * 2.0 - 96.0
    r = np.linalg.norm(ras, axis=-1)
    labels = np.zeros((n, n, n), np.int32)
    labels[r < 46] = 5
    labels[r < 42] = 7
    labels[r < 39] = 4
    labels[r < 36] = 2
    labels[r < 25] = 1
    return labels, aff


@pytest.fixture(scope="module")
def mini_tx():
    TRANSDUCER_REGISTRY["MiniTest"] = TransducerSpec(
        "MiniTest", "single", diameter=20e-3, focal_length=25e-3,
        frequencies=(500e3,),
    )
    return "MiniTest"


@pytest.mark.slow
class TestFullPipeline:
    @pytest.fixture(scope="class")
    def case_result(self, phantom, mini_tx, tmp_path_factory):
        labels, aff = phantom
        out = tmp_path_factory.mktemp("case")
        cfg = CaseConfig(
            tx_system="MiniTest",
            frequency=500e3,
            ppw=6.0,
            output_dir=str(out),
            prefix="phantom",
        )
        return run_case(
            cfg,
            labels,
            aff,
            target_ras=[0, 0, 25],
            direction_ras=[0, 0, -1],
            mask_shape=(64, 64, 104),
            thermal_params=SonicationParams(
                duration_on=2.0, duration_off=2.0, duty_cycle=0.5, isppa=10.0
            ),
        )

    def test_output_files_exist(self, case_result):
        import os

        for k in ("mask", "acoustic", "thermal"):
            assert os.path.isfile(case_result["files"][k]), k

    def test_mask_contract(self, case_result):
        nii = load_nifti(case_result["files"]["mask"])
        labels = set(np.unique(nii.data.astype(int)))
        assert labels <= {0, 1, 2, 3, 4, 5}
        assert 5 in labels  # target marked
        assert 2 in labels  # skull present

    def test_acoustic_focus_in_brain(self, case_result):
        d = load_dict_h5(case_result["files"]["acoustic"])
        pa = d["p_amp"]
        mm = d["MaterialMap"]
        assert pa.shape == mm.shape
        # the through-skull brain peak should sit near the water-path brain
        # peak (this low-gain mini bowl focuses proximal of the geometric
        # target, in water and tissue alike)
        brain = mm == 4
        pk = np.unravel_index(np.argmax(np.where(brain, pa, 0)), pa.shape)
        pw = np.asarray(d["p_amp_water"])
        pkw = np.unravel_index(np.argmax(np.where(brain, pw, 0)), pw.shape)
        dist_mm = np.linalg.norm(
            (np.array(pk) - np.array(pkw)) * d["SpatialStep"] * 1e3
        )
        assert dist_mm < 8.0
        # transmission through the skull attenuates the field but it's nonzero
        assert np.where(brain, pa, 0).max() > 0.1 * pa.max()

    def test_thermal_metrics(self, case_result):
        t = case_result["thermal"]
        assert t.metrics["TI"] >= 0
        assert t.metrics["TIC"] >= 0
        # with Isppa scaling the focal intensity is normalized: brain peak
        # pressure should give MaxIsppa ~ requested Isppa
        assert t.metrics["MaxIsppa"] == pytest.approx(10.0, rel=0.05)
        assert t.metrics["MI"] > 0
        # skull should heat at least as much as brain (absorption + conduction)
        assert t.metrics["TIC"] > 0.5 * t.metrics["TI"]
        d = load_dict_h5(case_result["files"]["thermal"])
        assert "TI" in d and "CEMBrain" in d and "RatioLosses" in d
