"""Production-code test hooks (env vars), mirroring the reference's set
(SURVEY.md section 4): forced step-2 error, paper-conditions materials,
Q-correction override, sel-mask dump, phase-programming bypass.
"""

import numpy as np
import pytest

from babelbrain_tpu.pipeline.domain import (
    build_domain,
    build_label_materials,
)


@pytest.fixture
def tiny_mask():
    mask = np.zeros((24, 24, 36), np.uint8)
    mask[4:20, 4:20, 14:18] = 1
    mask[4:20, 4:20, 15:17] = 2
    mask[12, 12, 8] = 5
    return mask


class TestEnvHooks:
    def test_qcorrection_scales_attenuation(self, monkeypatch):
        base = build_label_materials(500e3, segmented=False)
        monkeypatch.setenv("BBT_QCORRECTION", "2.0")
        scaled = build_label_materials(500e3, segmented=False)
        np.testing.assert_allclose(scaled[:, 3], 2.0 * base[:, 3])
        np.testing.assert_allclose(scaled[:, 4], 2.0 * base[:, 4])
        np.testing.assert_allclose(scaled[:, :3], base[:, :3])

    def test_paper_conditions_water_soft_tissue(self, monkeypatch):
        monkeypatch.setenv("BBT_PAPER_CONDITIONS", "1")
        mats = build_label_materials(500e3, segmented=False)
        # skin (1) and brain (4) become water; skull rows unchanged
        np.testing.assert_allclose(mats[1], mats[0])
        np.testing.assert_allclose(mats[4], mats[0])
        assert mats[2, 1] > 2000.0  # cortical still cortical

    def test_sel_mask_dump(self, monkeypatch, tmp_path, tiny_mask):
        out = tmp_path / "selmask"
        monkeypatch.setenv("BBT_SEL_MASK", str(out))
        dom = build_domain(tiny_mask, 500e3, 6.0)
        dumped = np.load(str(out) + ".npz")
        np.testing.assert_array_equal(dumped["material_map"], dom.material_map)
        assert dumped["source_z"] == dom.source_z

    def test_avoid_phase_programming(self, monkeypatch, tiny_mask):
        from babelbrain_tpu.pipeline.acoustic import (
            _source_for_steering,
            position_transducer,
        )
        from babelbrain_tpu.tx.geometry import make_focused_bowl

        dom = build_domain(tiny_mask, 500e3, 6.0)
        tx = make_focused_bowl(500e3, 25e-3, 20e-3, 1500.0, ppw_surface=4)
        tx = position_transducer(tx, dom, 25e-3)
        prog, _, _ = _source_for_steering(
            dom, tx, 60e3, steering_target=np.array([0.0, 0.0, 5e-3])
        )
        assert prog is not None
        monkeypatch.setenv("BBT_AVOID_PHASE_PROGRAMMING", "1")
        prog_off, _, _ = _source_for_steering(
            dom, tx, 60e3, steering_target=np.array([0.0, 0.0, 5e-3])
        )
        assert prog_off is None

    @pytest.mark.slow
    def test_force_error_step2(self, monkeypatch, tmp_path):
        """Functionally exercise the forced Step-2 error hook (the
        reference's TEST_FORCE_ERROR_BABEL_STEP2,
        `BabelIntegrationBASE.py:1034-1036`): run a tiny real case and
        assert the error fires after the acoustic step."""
        from babelbrain_tpu.pipeline.profiles import (
            TRANSDUCER_REGISTRY,
            TransducerSpec,
        )
        from babelbrain_tpu.pipeline.runner import CaseConfig, run_case

        TRANSDUCER_REGISTRY.setdefault(
            "MiniErrTest",
            TransducerSpec(
                "MiniErrTest", "single", diameter=16e-3,
                focal_length=20e-3, frequencies=(500e3,),
            ),
        )
        n = 48
        aff = np.diag([2.0, 2.0, 2.0, 1.0])
        aff[:3, 3] = -48.0
        ii, jj, kk = np.mgrid[0:n, 0:n, 0:n]
        r = np.linalg.norm(np.stack([ii, jj, kk], -1) * 2.0 - 48.0, axis=-1)
        labels = np.zeros((n, n, n), np.int32)
        labels[r < 30] = 5
        labels[r < 26] = 2
        labels[r < 22] = 1
        monkeypatch.setenv("BBT_FORCE_ERROR_STEP2", "1")
        cfg = CaseConfig(
            tx_system="MiniErrTest", frequency=500e3, ppw=6.0,
            output_dir=str(tmp_path), prefix="err",
        )
        with pytest.raises(RuntimeError, match="BBT_FORCE_ERROR_STEP2"):
            run_case(
                cfg, labels, aff, target_ras=[0, 0, 10],
                direction_ras=[0, 0, -1], mask_shape=(40, 40, 64),
            )
