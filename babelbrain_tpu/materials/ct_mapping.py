"""CT / pseudo-CT Hounsfield-unit to acoustic-property mappings.

Re-implements the seven mapping methods of the reference
(`TranscranialModeling/BabelIntegrationBASE.py:210-644,1193-1239`):
``Webb-Marsac`` (default), ``Aubry``, ``Pichardo``, ``McDannold``,
``Marsac-Aubry``, ``Pichardo-Marsac``, ``McDannold-Marsac`` — each maps the
quantized unique-HU vector of a skull CT to per-HU density, longitudinal
speed of sound, and longitudinal attenuation.

All constants are published calibrations (citations inline). Pure NumPy.
"""

from __future__ import annotations

import numpy as np

MAPPING_METHODS = (
    "Webb-Marsac",
    "Aubry",
    "Pichardo",
    "McDannold",
    "Marsac-Aubry",
    "Pichardo-Marsac",
    "McDannold-Marsac",
)

# Webb et al. IEEE TUFFC 65(7):1111 (2018) Tables I/II and IEEE TUFFC
# 68(5):1532 (2020) Table IV; default scanner combo GE / 120 kVp / BonePlus
# kernel / axial 0.5, slice 0.6 (the reference's default `CTMapCombo`,
# `BabelIntegrationBASE.py:1091`).
WEBB_DEFAULT_COMBO = ("GE", "120", "B", "", "0.5, 0.6")
_WEBB_SOS = {  # (Scanner, Energy, Kernel, Other, Res) -> (slope m/s/HU, intercept km/s)
    ("GE", "120", "B", "", "0.5, 0.6"): (0.75, 1.32),
}
_WEBB_ATT = {  # -> (alpha_0 Np/cm/MHz^beta, beta, c 1/HU)
    ("GE", "120", "B", "", "0.5, 0.6"): (26.0, 1.3, -0.0016),
}


def hu_to_long_sos_webb(hu, combo=WEBB_DEFAULT_COMBO):
    """HU -> longitudinal SoS (m/s); Webb 2018 linear calibration."""
    slope, intercept = _WEBB_SOS[tuple(combo)]
    return slope * np.asarray(hu, np.float64) + intercept * 1000.0


def hu_to_attenuation_webb(hu, frequency, combo=WEBB_DEFAULT_COMBO):
    """HU -> longitudinal attenuation (Np/m); Webb 2020 exponential model.

    alpha = alpha_0 * (f/MHz)^beta * exp(c*HU), alpha_0 in Np/cm -> x100 Np/m.
    """
    a0, beta, c = _WEBB_ATT[tuple(combo)]
    hu = np.asarray(hu, np.float64)
    return a0 * (frequency / 1e6) ** beta * np.exp(hu * c) * 100.0


def hu_to_density_marsac(hu):
    """HU -> density; Marsac 2017 linear normalization between water/air and
    max bone (`BabelIntegrationBASE.py:305-323`)."""
    hu = np.asarray(hu, np.float64)
    rho_min, rho_max = 1000.0, 2700.0
    return rho_min + (rho_max - rho_min) * hu / hu.max()


def hu_to_density_air_tissue(hu):
    """HU -> density via linear air(-1000 HU, 1.293)/tissue(27 HU, 1041) fit
    (`BabelIntegrationBASE.py:276-303`)."""
    return np.polyval(np.array([1.01237293, 1.01366593e3]), np.asarray(hu, np.float64))


def hu_to_density_kwave(hu):
    """HU -> density, k-Wave hounsfield2density piecewise-linear model
    (Schneider 1996 / Mast 2000; `BabelIntegrationBASE.py:237-274`)."""
    hu_shift = np.asarray(hu, np.float64) + 1000.0
    density = np.zeros_like(hu_shift)
    m = hu_shift < 930
    density[m] = np.polyval([1.025793065681423, -5.680404011488714], hu_shift[m])
    m = (hu_shift >= 930) & (hu_shift <= 1098)
    density[m] = np.polyval([0.9082709691264, 103.6151457847139], hu_shift[m])
    m = (hu_shift > 1098) & (hu_shift < 1260)
    density[m] = np.polyval([0.5108369316599, 539.9977189228704], hu_shift[m])
    m = hu_shift >= 1260
    density[m] = np.polyval([0.6625370912451, 348.8555178455294], hu_shift[m])
    return density


def hu_to_porosity(hu):
    """HU -> porosity, Aubry 2003 model (`BabelIntegrationBASE.py:422-437`)."""
    hu = np.asarray(hu, np.float64)
    return 1.0 - hu / hu.max()


def porosity_to_density(phi):
    """Porosity -> density (`BabelIntegrationBASE.py:439-454`)."""
    phi = np.asarray(phi, np.float64)
    return 1000.0 * phi + 2200.0 * (1.0 - phi)


def porosity_to_long_sos(phi):
    """Porosity -> longitudinal SoS (`BabelIntegrationBASE.py:456-471`)."""
    phi = np.asarray(phi, np.float64)
    return 1500.0 * phi + 3100.0 * (1.0 - phi)


def porosity_to_long_att(phi, frequency):
    """Porosity -> longitudinal attenuation Np/m
    (`BabelIntegrationBASE.py:473-492`)."""
    phi = np.asarray(phi, np.float64)
    amin = 2.302555836 * frequency / 1e6
    amax = 92.10223344 * frequency / 1e6
    return amin + (amax - amin) * np.sqrt(phi)


def density_to_long_sos_mcdannold(density):
    """Density -> longitudinal SoS, McDannold polynomial
    (`BabelIntegrationBASE.py:405-420`)."""
    poly = np.flip(np.array([1.24e-3, -7.63e-7, 1.69e-10, 5.31e-16, -2.79e-18]))
    return 1.0 / np.polyval(poly, np.asarray(density, np.float64))


def density_to_long_att_mcdannold(density, frequency):
    """Density -> longitudinal attenuation (Np/m), McDannold polynomial at
    660 kHz with linear frequency scaling (`BabelIntegrationBASE.py:383-403`)."""
    poly = np.flip(np.array([5.71e3, -9.02, 5.40e-3, -1.41e-6, 1.36e-10]))
    return np.polyval(poly, np.asarray(density, np.float64)) * frequency / 660e3


def density_to_sos_pichardo(density, frequency):
    """Density -> long SoS, bilinear interp of the Pichardo density/frequency
    map (`BabelIntegrationBASE.py:590-606`). The reference ships this table
    in `MapPichardo.h5`; we reconstruct the equivalent smooth mapping by a
    piecewise-linear density model anchored at water (1000, 1480+ @~0.27-0.84
    MHz) and cortical bone; for densities within bone the Pichardo 2017
    relation is close to linear in density.
    """
    # Anchors consistent with Pichardo 2011/2017: water ~1500 m/s at 1000
    # kg/m3, trabecular ~2150-2300 at 1738, cortical ~2450-2520 at 1896.5.
    f = float(frequency)
    from .database import fit_speed_cortical_long, fit_speed_trabecular_long

    rho_ref = np.array([1000.0, 1738.0, 1896.5])
    sos_ref = np.array(
        [1500.0, float(fit_speed_trabecular_long(f)), float(fit_speed_cortical_long(f))]
    )
    return np.interp(np.asarray(density, np.float64), rho_ref, sos_ref)


def density_to_att_pichardo(density, frequency):
    """Density -> long attenuation (Np/m); piecewise-linear reconstruction of
    the Pichardo map (`BabelIntegrationBASE.py:608-624`), anchored at water
    (0) and the bone fits of the tissue database."""
    f = float(frequency)
    from .database import fit_att_cortical_long, fit_att_trabecular_long

    rho_ref = np.array([1000.0, 1738.0, 1896.5])
    att_ref = np.array(
        [0.0, float(fit_att_trabecular_long(f)), float(fit_att_cortical_long(f))]
    )
    return np.interp(np.asarray(density, np.float64), rho_ref, att_ref)


def density_to_lsos_marsac(density):
    """Density -> long SoS, Marsac linear min-max map
    (`BabelIntegrationBASE.py:363-381`)."""
    density = np.asarray(density, np.float64)
    cmin, cmax = 1500.0, 3000.0
    return cmin + (cmax - cmin) * (density - density.min()) / (
        density.max() - density.min()
    )


def simnibs_petra_density(hu):
    """PETRA pseudo-CT HU -> density (SimNIBS cph2025 calibration line,
    `BabelIntegrationBASE.py:346-360`): linear ramp clipped at water density.
    """
    hu = np.asarray(hu, np.float64)
    # Calibration endpoints: the reference's csv line maps [0 .. 3150] HU
    # onto [~1000 .. 3147.35] kg/m3 monotonically; approximated linearly.
    max_hu, max_rho = 3150.0, 3147.35469785
    rho = 1000.0 + (max_rho - 1000.0) * np.clip(hu, 0.0, max_hu) / max_hu
    return np.maximum(rho, 1000.0)


def map_hu_to_properties(
    unique_hu: np.ndarray,
    frequency: float,
    method: str = "Webb-Marsac",
    *,
    is_petra: bool = False,
    density_input: np.ndarray | None = None,
    webb_combo=WEBB_DEFAULT_COMBO,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Map the quantized unique-HU vector to (density, long SoS, long att).

    Dispatch mirrors `BabelIntegrationBASE.py:1193-1239`. Shear is disabled in
    CT mode (as in the reference, `:1343-1344`). When ``density_input`` is
    given the CT volume already holds density (``bDensity`` path).
    """
    hu = np.asarray(unique_hu, np.float64)
    phi = hu_to_porosity(hu)

    if density_input is not None:
        density = np.asarray(density_input, np.float64)
    elif method == "Webb-Marsac" and is_petra:
        density = simnibs_petra_density(hu)
    elif method in ("Webb-Marsac", "Marsac-Aubry", "Pichardo-Marsac", "McDannold-Marsac"):
        density = hu_to_density_marsac(hu)
    elif method == "Aubry":
        density = porosity_to_density(phi)
    elif method in ("Pichardo", "McDannold"):
        density = hu_to_density_air_tissue(hu)
    else:
        raise ValueError(f"Unknown mapping method: {method}")

    if method == "Webb-Marsac":
        sos = hu_to_long_sos_webb(hu, webb_combo)
        att = hu_to_attenuation_webb(hu, frequency, webb_combo)
    elif method == "Aubry":
        sos = porosity_to_long_sos(phi)
        att = porosity_to_long_att(phi, frequency)
    elif method == "Pichardo" or method == "Pichardo-Marsac":
        sos = density_to_sos_pichardo(density, frequency)
        att = density_to_att_pichardo(density, frequency)
    elif method == "McDannold" or method == "McDannold-Marsac":
        sos = density_to_long_sos_mcdannold(density)
        att = density_to_long_att_mcdannold(density, frequency)
    elif method == "Marsac-Aubry":
        sos = density_to_lsos_marsac(density)
        att = porosity_to_long_att(hu, frequency)

    return density, sos, att


def quantize_hu(
    hu_volume: np.ndarray, bone_mask: np.ndarray, bits: int = 10
) -> tuple[np.ndarray, np.ndarray]:
    """Quantize bone HU values to 2**bits - 1 levels and return
    ``(unique_hu, index_volume)``.

    This is the data path that makes CT-mode FDTD tractable (one material per
    quantized HU; the reference uses the same 10-bit default,
    `BabelBrain/BabelDatasetPreps.py:1019-1045`). ``index_volume`` is 0 where
    ``bone_mask`` is False and the 0-based quantization index elsewhere.
    """
    levels = (1 << bits) - 1
    vals = hu_volume[bone_mask].astype(np.float64)
    if vals.size == 0:
        return np.zeros(0), np.zeros(hu_volume.shape, np.uint32)
    lo, hi = vals.min(), vals.max()
    edges = np.linspace(lo, hi, levels)
    idx = np.clip(np.searchsorted(edges, vals, side="left"), 0, levels - 1)
    unique_idx = np.unique(idx)
    remap = np.zeros(levels, np.uint32)
    remap[unique_idx] = np.arange(len(unique_idx), dtype=np.uint32)
    unique_hu = edges[unique_idx]
    out = np.zeros(hu_volume.shape, np.uint32)
    out[bone_mask] = remap[idx]
    return unique_hu, out
