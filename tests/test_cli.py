"""CLI surface tests (the headless replacement for the reference GUI)."""

import json

import numpy as np

from babelbrain_tpu.cli import main
from babelbrain_tpu.pipeline.io import save_nifti
from babelbrain_tpu.pipeline.step1 import LABELS


def test_list_tx(capsys):
    main(["list-tx"])
    out = capsys.readouterr().out
    # all 19 devices of the reference start dialog
    for name in ("CTX_500", "DPXPC_300", "R15287", "R15473", "DomeTx", "H317"):
        assert name in out


def test_plan_subcommand(tmp_path, capsys):
    n = 72
    lab = np.zeros((n, n, n), np.uint8)
    c = np.array([36.0, 36, 36])
    ii = np.indices(lab.shape).astype(float)
    r = np.sqrt(((ii - c[:, None, None, None]) ** 2).sum(0))
    lab[r < 32] = LABELS["skin"]
    lab[r < 29] = LABELS["cortical"]
    lab[r < 25] = LABELS["brain"]
    labels = str(tmp_path / "lab.nii.gz")
    save_nifti(labels, lab, np.eye(4))
    csv = str(tmp_path / "pl.csv")
    traj = str(tmp_path / "traj.txt")
    main([
        "plan", "--labels", labels, "--target", "36,36,48",
        "--max-distance", "60", "--min-distance", "5",
        "--optimal-distance", "22", "--max-angle", "20",
        "--out", csv, "--trajectory-out", traj,
    ])
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["candidates"] > 100
    # best entry on the near (+z) pole
    assert summary["best_entry_ras"][2] > 60
    rows = open(csv).read().strip().splitlines()
    assert len(rows) == 11
    from babelbrain_tpu.pipeline.transforms import read_trajectory_brainsight

    name, m = read_trajectory_brainsight(traj)
    np.testing.assert_allclose(m[:3, 3], [36, 36, 48], atol=1e-3)
