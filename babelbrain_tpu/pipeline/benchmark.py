"""Benchmark-file injection (ITRUSST-style cross-validation media).

Implements the reference's ``BenchmarkTestFile`` mechanism
(`TranscranialModeling/BabelIntegrationBASE.py:1253-1260,1313-1321,2210-2217`;
SURVEY.md section 4): an h5 supplies ``Materials`` (list of dicts with
Density/LongSoS/ShearSoS/LongAtt/ShearAtt [+thermal props]), a
``MaterialMap`` volume, a ``TestType`` in {1,2,3}, and optionally
``QCorrArr`` and ``FixedAcousticPower``. The simulation then runs on exactly
that medium, making results directly comparable across solvers.
"""

from __future__ import annotations

import numpy as np

from ..ops.fdtd import FDTDGrid, run_fdtd
from .domain import compute_time_stepping, sensor_window, simulation_steps
from .io import load_dict_h5


def load_benchmark_file(path: str) -> dict:
    data = load_dict_h5(path)
    mats = []
    for entry in data["Materials"]:
        mats.append(
            [
                float(entry["Density"]),
                float(entry["LongSoS"]),
                float(entry.get("ShearSoS", 0.0)),
                float(entry.get("LongAtt", 0.0)),
                float(entry.get("ShearAtt", 0.0)),
            ]
        )
    data["MaterialArray"] = np.asarray(mats)
    return data


def thermal_benchmark_regions(material_map, test_type: int):
    """Region masks per TestType (`CalculateTemperatureEffects.py:868-906`).

    Returns (skull_mask, brain_ids, id_region_benchmark)."""
    mm = np.asarray(material_map)
    if test_type == 1:
        return mm > 0, [int(mm.max())], [0]
    if test_type == 2:
        return mm == 1, [int(mm.max())], [0, 1]
    if test_type == 3:
        mx = int(mm.max())
        return (mm > 1) & (mm <= mx - 2), [mx], [mx - 2, mx - 3]
    raise ValueError(f"TestType must be 1..3, got {test_type}")


def run_benchmark_acoustic(
    path: str,
    frequency: float,
    ppw: float,
    source_amp: np.ndarray,
    source_phase: np.ndarray,
    *,
    npml: int = 12,
    alpha_cfl: float = 0.5,
    source_plane_z: int = 13,
    mesh=None,
    backend: str = "auto",
):
    """Run the FDTD on a benchmark medium with a given CW source plane.

    An optional ``QCorrArr`` in the file scales each material's attenuation
    columns — the reference's per-material Q correction for benchmark media
    (`BabelIntegrationBASE.py:2210-2217`; our SLS is exact at the carrier so
    the array acts directly on the alpha columns).
    """
    bench = load_benchmark_file(path)
    mats = bench["MaterialArray"]
    if "QCorrArr" in bench:
        q = np.asarray(bench["QCorrArr"], np.float64).reshape(-1)
        if len(q) != len(mats):
            raise ValueError(
                f"QCorrArr has {len(q)} entries for {len(mats)} materials"
            )
        mats = mats.copy()
        mats[:, 3] *= q
        mats[:, 4] *= q
        bench["MaterialArray"] = mats
    mat_map = np.asarray(bench["MaterialMap"]).astype(np.uint32)
    dx, dt, ppp, _ = compute_time_stepping(
        mats, frequency, ppw, alpha_cfl, bound_by_tissue_minimum=False
    )
    shape = mat_map.shape
    n_steps = simulation_steps(
        (np.array(shape) - 2 * npml) * dx, mats[0, 1], dt, ppp
    )
    grid = FDTDGrid(
        shape=shape,
        dx=dx,
        dt=dt,
        n_steps=n_steps,
        frequency=frequency,
        npml=npml,
        sensor_start=sensor_window(n_steps, ppp),
        source_plane_z=source_plane_z,
    )
    out = run_fdtd(
        mat_map, mats, grid, source_amp=source_amp, source_phase=source_phase,
        mesh=mesh, backend=backend,
    )
    out["grid"] = grid
    out["benchmark"] = bench
    return out
