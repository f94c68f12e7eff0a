"""MRI intensity bias-field correction (the N4ITK-subprocess replacement).

The reference runs SimpleITK's N4 bias correction on ZTE/PETRA images before
pseudo-CT conversion (`BabelBrain/CTZTEProcessing.py:168`). This module
implements the same capability as a smooth multiplicative bias estimate:
fit a low-order 3-D polynomial to the log-intensity of head voxels by
weighted least squares (closed form, one lstsq on a few tens of
coefficients), and divide it out. For the piecewise-constant-ish tissue
intensities of ZTE/PETRA this removes the slowly-varying coil shading that
matters for the histogram-based pCT normalization.
"""

from __future__ import annotations

import numpy as np


def _poly_basis(shape, order):
    """Normalized polynomial basis evaluated on the grid, (V, n_terms)."""
    coords = [
        (np.arange(n, dtype=np.float64) / max(n - 1, 1)) * 2.0 - 1.0
        for n in shape
    ]
    ii, jj, kk = np.meshgrid(*coords, indexing="ij")
    terms = []
    for a in range(order + 1):
        for b in range(order + 1 - a):
            for c in range(order + 1 - a - b):
                terms.append((ii**a) * (jj**b) * (kk**c))
    return np.stack([t.ravel() for t in terms], axis=1)


def correct_bias_field(
    image: np.ndarray,
    mask: np.ndarray,
    order: int = 3,
    clip_percentiles=(2.0, 98.0),
):
    """Estimate and remove a smooth multiplicative bias field.

    Returns (corrected_image, bias_field). The corrected image preserves the
    median intensity inside ``mask``.
    """
    img = np.asarray(image, np.float64)
    m = np.asarray(mask, bool)
    basis = np.ascontiguousarray(_poly_basis(img.shape, order))

    corrected = img.copy()
    total_log_bias = np.zeros(img.shape)
    for _ in range(3):
        # fit only the dominant intensity mode (N4's histogram-sharpening
        # idea): tissue near the in-mask median, excluding bone/air
        med = np.median(corrected[m & (corrected > 0)])
        sel = m & (corrected > 0.65 * med) & (corrected < 1.5 * med)
        if sel.sum() < basis.shape[1] * 4:
            break
        logv = np.log(corrected[sel])
        A = basis[sel.ravel()]
        coef, *_ = np.linalg.lstsq(A, logv - logv.mean(), rcond=None)
        log_b = (basis @ coef).reshape(img.shape)
        total_log_bias += log_b
        corrected = corrected / np.exp(log_b)

    total_log_bias -= np.median(total_log_bias[m])
    bias = np.exp(total_log_bias)
    corrected = img / bias
    return corrected, bias
