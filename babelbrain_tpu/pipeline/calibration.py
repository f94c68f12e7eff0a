"""Transducer calibration from hydrophone scans.

Re-implements the capability of `BabelBrain/Calibration/TxCalibration.py`
(SURVEY.md section 2.7): given a measured complex pressure field on a plane
(hydrophone raster scan at a known standoff) and the array geometry, fit
per-element complex weights so the modeled Rayleigh field reproduces the
measurement. The reference runs a regularized fitting process
(`RUN_FITTING_Process`); here the same problem is solved directly as
Tikhonov-regularized complex least squares:

    min_w || A w - p ||^2 + lam ||w - 1||^2

where A[:, e] is the field of element e with unit drive at the measurement
points. The optional per-element phase-only projection mirrors the
reference's programming constraint for amplitude-locked drivers.

The resulting weights feed ``run_acoustic_sim(element_weights=...)`` (the
reference's ``OptimizedWeightsFile``/``AdjustWeightAmplitudes`` path,
`BabelIntegrationBASE.py:2224-2234`).
"""

from __future__ import annotations

import numpy as np

from ..ops.rayleigh import rayleigh_field


def element_field_matrix(wavenumber, tx, points) -> np.ndarray:
    """(P, E) complex matrix: field of each physical element (unit drive)."""
    E = tx.num_elements
    A = np.zeros((len(points), E), np.complex64)
    ids = np.asarray(tx.elem_ids)
    for e in range(E):
        sel = ids == e
        u0 = np.zeros(tx.num_subelements, np.complex64)
        u0[sel] = 1.0
        A[:, e] = rayleigh_field(
            wavenumber, tx.centers[sel], tx.areas[sel], u0[sel], points
        )
    return A


def fit_element_weights(
    wavenumber,
    tx,
    scan_points,
    measured_complex,
    *,
    lam: float = 1e-2,
    phase_only: bool = False,
):
    """Fit per-element complex weights to a hydrophone measurement.

    Returns (weights (E,) complex, relative residual). ``lam`` regularizes
    toward the nominal uniform drive (w = 1).
    """
    A = element_field_matrix(wavenumber, tx, np.asarray(scan_points, np.float32))
    p = np.asarray(measured_complex, np.complex128).ravel()
    E = A.shape[1]
    # normal equations with Tikhonov toward w0 = 1
    AtA = A.conj().T @ A
    scale = np.trace(AtA).real / E
    w0 = np.ones(E, np.complex128)
    rhs = A.conj().T @ p + lam * scale * w0
    w = np.linalg.solve(AtA + lam * scale * np.eye(E), rhs)
    if phase_only:
        w = np.exp(1j * np.angle(w))
    resid = np.linalg.norm(A @ w - p) / np.linalg.norm(p)
    return w.astype(np.complex64), float(resid)


def scan_plane_points(x_mm, y_mm, z_m):
    """Build hydrophone raster points (meters) from scan axes in mm."""
    xp, yp = np.meshgrid(
        np.asarray(x_mm, np.float64) * 1e-3,
        np.asarray(y_mm, np.float64) * 1e-3,
        indexing="ij",
    )
    return np.stack(
        [xp.ravel(), yp.ravel(), np.full(xp.size, z_m)], axis=1
    ).astype(np.float32)
