"""Realistic digital-head validation corpus (VERDICT r4 task 8).

The reference's regression tests drive real Zenodo datasets through the
full pipeline (SURVEY.md section 4; doi 10.5281/zenodo.7894431). No
network access exists here, so the closest offline substitute is a
PROCEDURAL head phantom built from published cranial statistics and driven
through the CT, ZTE, PETRA, and Density imaging paths end-to-end:

  * outer-table/diploe/inner-table skull sandwich with angular thickness
    variation in the published adult range (parietal/frontal mean ~6.3 mm,
    sd ~1.5 mm; cortical tables ~1.5-2 mm — Lillie 2016 J Biomech,
    Alexander 2019; same anatomy the Webb HU tables in
    `materials/data/webb_tables.npz` were fitted on),
  * CT values per compartment from the HU ranges those tables span
    (cortical ~1200-1900 HU, diploe ~300-800 HU, soft tissue ~30-60 HU,
    air sinus -1000 HU; cap 2100 HU as `BabelDatasetPreps.py:836`),
  * a ZTE-like MR volume with the soft-bright/bone-dark contrast the
    pseudo-CT mapping expects (`CTZTEProcessing.py:591-628`),
  * a PETRA-like volume whose integer histogram carries the two peaks
    (water bath + soft tissue) the petra2Density normalization keys on
    (`CTZTEProcessing.py:556-577`),
  * a Density volume via the same mass-density law CT mode uses.

Cross-modality consistency (focal position and pressure within tiers) is
the validation: the three imaging paths describe the SAME head, so the
simulated fields must agree. The CT-mode field is additionally
regression-pinned against a golden (tol_1 on focal metrics, tol_5 on the
field), regenerable with BBT_GENERATE_GOLDEN=1.
"""

import os
from pathlib import Path

import numpy as np
import pytest

from babelbrain_tpu.pipeline.profiles import (
    TRANSDUCER_REGISTRY,
    TransducerSpec,
)
from babelbrain_tpu.pipeline.runner import CaseConfig, run_case

GOLDEN = Path(__file__).parent / "golden" / "digital_head_ct.npz"
GENERATE = os.environ.get("BBT_GENERATE_GOLDEN") == "1"

pytestmark = pytest.mark.slow

N = 96
VOX = 2.0


def build_head():
    """(labels, ct_hu, zte, petra, density, affine) at 2 mm isotropic."""
    rng = np.random.default_rng(11)
    aff = np.diag([VOX, VOX, VOX, 1.0])
    aff[:3, 3] = -N
    ii, jj, kk = np.mgrid[0:N, 0:N, 0:N]
    ras = np.stack([ii, jj, kk], -1) * VOX - N
    x, y, z = ras[..., 0], ras[..., 1], ras[..., 2]
    # compact cranium (runtime-sized test head, radius ~60 mm): the
    # validation targets are the SKULL statistics — thickness and HU
    # distributions at published adult values — not the head diameter
    r = np.sqrt((x / 0.97) ** 2 + (y / 0.92) ** 2 + z ** 2) + 1e-9
    ux, uy, uz = x / r, y / r, z / r
    # angular shape + published thickness statistics: mean 6.3 mm,
    # sd ~1.5 mm across the vault, thicker occiput
    r_skull_out = 60.0 * (1.0 + 0.05 * ux - 0.03 * uy * uz)
    thick = np.clip(
        6.3 + 1.5 * (0.8 * uz - 0.5 * ux * uy + 0.4 * uy), 3.5, 9.5
    )
    table = np.clip(1.8 + 0.3 * uz, 1.2, 2.4)  # cortical tables ~1.5-2 mm
    d_out = r - r_skull_out
    skin = (d_out > 0) & (d_out <= 5.0)
    outer_table = (d_out <= 0) & (d_out > -table)
    diploe = (d_out <= -table) & (d_out > -(thick - table))
    inner_table = (d_out <= -(thick - table)) & (d_out > -thick)
    brain = d_out <= -thick
    sinus = (
        np.sqrt(x ** 2 + (y + 40) ** 2 + (z - 25) ** 2) < 7
    ) & (brain | diploe | inner_table)

    # charm-style label ids as the pipeline consumes them (same
    # convention as tests/test_runner.py's phantom): 5 skin, 7 bone,
    # 4 CSF rim, 2 GM, 1 WM. The cortical/trabecular split comes from
    # the CT HU inside the bone mask (CT mode quantizes per-HU
    # materials), not from the label volume.
    labels = np.zeros((N, N, N), np.int32)
    labels[skin] = 5
    labels[outer_table | inner_table | diploe] = 7
    csf = brain & (d_out > -(thick + 3.0))
    labels[brain] = 2
    labels[csf] = 4
    labels[d_out <= -(thick + 18.0)] = 1
    labels[sinus] = 0  # air cavity

    # water-bath exterior (~20 HU): with a -1000 HU exterior the air
    # extraction would turn the whole coupling path into a reflector
    # mask and no energy would reach the skull; the intracranial sinus
    # stays the air cavity under test
    ct = np.full((N, N, N), 20.0)
    ct[skin] = 45.0 + rng.normal(0, 8, skin.sum())
    ct[brain] = 35.0 + rng.normal(0, 6, brain.sum())
    ct[outer_table] = 1550.0 + rng.normal(0, 180, outer_table.sum())
    ct[inner_table] = 1450.0 + rng.normal(0, 180, inner_table.sum())
    ct[diploe] = 550.0 + rng.normal(0, 140, diploe.sum())
    ct[sinus] = -1000.0
    ct = np.clip(ct, -1000.0, 2100.0)

    # ZTE-like MR: normalized soft-bright / bone-dark / air-dark
    zte = np.full((N, N, N), 600.0)  # water-bath signal, not air-dark
    zte[labels > 0] = 1000.0 + rng.normal(0, 25, int((labels > 0).sum()))
    bone = outer_table | inner_table | diploe
    zte[bone] = 340.0 + rng.normal(0, 40, int(bone.sum()))
    zte[sinus] = 25.0

    # PETRA-like MR: the petra2Density normalization integer-bins the
    # FULL image histogram and divides by the highest-intensity of the
    # two tallest peaks >=50 units apart (`CTZTEProcessing.py:556-577`)
    # — here the water bath (~600, tallest) and soft tissue (~1000, the
    # normalizer), with bone at norm ~0.35 so the linear law
    # pCT = -2080*norm + 2133.2 lands it near the CT cortical values
    petra = 600.0 + rng.normal(0, 4, (N, N, N))
    petra[labels > 0] = 1000.0 + rng.normal(0, 25, int((labels > 0).sum()))
    petra[bone] = 350.0 + rng.normal(0, 45, int(bone.sum()))
    petra[sinus] = 25.0

    # density volume: soft ~1000, bone via a linear HU law
    dens = np.full((N, N, N), 1000.0)
    dens[bone] = 1000.0 + 0.6 * np.clip(ct[bone], 0, None)
    dens[sinus] = 1.2
    return labels, ct, zte, petra, dens, aff


@pytest.fixture(scope="module")
def head():
    return build_head()


@pytest.fixture(scope="module")
def head_tx():
    TRANSDUCER_REGISTRY["HeadTest"] = TransducerSpec(
        "HeadTest", "single", diameter=30e-3, focal_length=55e-3,
        frequencies=(500e3,),
    )
    return "HeadTest"


def _run_mode(head, tx, tmpdir, ct_type, vol):
    labels, ct, zte, petra, dens, aff = head
    cfg = CaseConfig(
        tx_system=tx, frequency=500e3, ppw=6.0, ct_type=ct_type,
        output_dir=str(tmpdir), prefix=f"dh_{ct_type.lower()}",
    )
    return run_case(
        cfg, labels, aff,
        target_ras=[0.0, 0.0, 20.0], direction_ras=[0, 0, -1],
        ct_data=vol, ct_affine=aff, mask_shape=(84, 84, 192),
    )


def _focal_metrics(res):
    import babelbrain_tpu.pipeline.io as pio

    d = pio.load_dict_h5(res["files"]["acoustic"])
    pa = np.asarray(d["p_amp"])
    pk = np.unravel_index(np.argmax(pa), pa.shape)
    xv = np.asarray(d["x_vec"])
    yv = np.asarray(d["y_vec"])
    zv = np.asarray(d["z_vec"])
    pos = np.array([xv[pk[0]], yv[pk[1]], zv[pk[2]]])
    vol6 = float((pa >= pa.max() / 2).sum())
    return pa, pos, float(pa.max()), vol6


class TestDigitalHead:
    @pytest.fixture(scope="class")
    def runs(self, head, head_tx, tmp_path_factory):
        out = {}
        labels, ct, zte, petra, dens, aff = head
        base = tmp_path_factory.mktemp("digital_head")
        out["CT"] = _run_mode(head, head_tx, base, "CT", ct)
        out["ZTE"] = _run_mode(head, head_tx, base, "ZTE", zte)
        out["PETRA"] = _run_mode(head, head_tx, base, "PETRA", petra)
        out["Density"] = _run_mode(head, head_tx, base, "Density", dens)
        return out

    def test_all_modes_complete_with_ct_materials(self, runs):
        for mode, res in runs.items():
            data = res["data_for_sim"]
            assert np.isfinite(np.asarray(data["p_amp"])).all(), mode
            # per-HU material list engaged in every imaging mode
            assert np.asarray(data["Material"]).shape[0] > 4, mode
            assert "SDR" in data, mode

    def test_modes_agree_on_focus(self, runs):
        """The imaging paths describe one head: focal positions
        within 6 mm (3 voxels) and peak pressures within 35% (the
        pseudo-CT/density laws are approximations of the CT truth, not
        reparameterizations — the reference quotes similar ZTE-vs-CT
        spreads for transcranial pressure)."""
        metrics = {m: _focal_metrics(r) for m, r in runs.items()}
        _, pos_ct, pk_ct, _ = metrics["CT"]
        for mode in ("ZTE", "PETRA", "Density"):
            _, pos, pk, _ = metrics[mode]
            assert np.linalg.norm(pos - pos_ct) <= 6.0, (mode, pos, pos_ct)
            assert abs(pk - pk_ct) / pk_ct <= 0.35, (mode, pk, pk_ct)

    def test_skull_statistics_realistic(self, head):
        """The phantom's skull HU distribution spans the published adult
        range the Webb tables cover (`materials/data/webb_tables.npz`)."""
        labels, ct, _, _, _, _ = head
        bone_hu = ct[labels == 7]
        assert 300 < np.median(bone_hu) < 1800
        assert bone_hu.max() <= 2100.0
        q10, q90 = np.quantile(bone_hu, (0.1, 0.9))
        assert q90 - q10 > 500  # bimodal table/diploe spread, not a slab

    def test_ct_mode_regression_golden(self, runs):
        """tol_1 on focal metrics / tol_5 on the field vs the stored
        golden (the reference's tolerance-tier scheme, `pytest.ini:44-61`)."""
        pa, pos, pk, vol6 = _focal_metrics(runs["CT"])
        # compact golden: central field crop + metrics
        c = tuple(s // 2 for s in pa.shape)
        crop = pa[c[0] - 16:c[0] + 16, c[1] - 16:c[1] + 16,
                  c[2] - 24:c[2] + 24].astype(np.float32)
        if GENERATE:
            GOLDEN.parent.mkdir(exist_ok=True)
            np.savez_compressed(
                GOLDEN, crop=crop, pos=pos, peak=pk, vol6=vol6
            )
            pytest.skip("golden regenerated")
        if not GOLDEN.exists():
            pytest.fail(
                "golden missing: run BBT_GENERATE_GOLDEN=1 pytest "
                "tests/test_digital_head.py"
            )
        g = np.load(GOLDEN)
        assert abs(pk - float(g["peak"])) / float(g["peak"]) < 0.01  # tol_1
        assert np.linalg.norm(pos - g["pos"]) < VOX  # same voxel
        gcrop = np.asarray(g["crop"])
        l2 = np.linalg.norm(crop - gcrop) / (np.linalg.norm(gcrop) + 1e-9)
        assert l2 < 0.05  # tol_5 on the field
