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

    def test_force_error_step2(self, monkeypatch):
        import babelbrain_tpu.pipeline.runner as runner_mod

        assert hasattr(runner_mod, "run_case")
        src = open(runner_mod.__file__).read()
        assert "BBT_FORCE_ERROR_STEP2" in src
