"""ZTE / PETRA MRI to pseudo-CT conversion.

Re-implements `BabelBrain/CTZTEProcessing.py:501-628` (``ConvertZTE_PETRA_pCT``):
normalize the ZTE/PETRA intensity image, then map normalized intensity to
Hounsfield units with the published linear calibrations

    ZTE   (Wiesinger 2018):  pCT = -2085 * norm + 2329
    PETRA (Treeby/UCL petra-to-ct): pCT = -2080 * norm + 2133.2

(defaults `BabelBrain/Options/Options.py:105-108`), with air/background set
to -1000 HU. Normalization differs per modality:
  * ZTE: divide by the median intensity of a soft-tissue mask (the
    reference uses the 95th-percentile-capped head region, `:591`);
  * PETRA: divide by the intensity-histogram peak over the head region
    (`:556-577`).
"""

from __future__ import annotations

import numpy as np

ZTE_SLOPE, ZTE_OFFSET = -2085.0, 2329.0
PETRA_SLOPE, PETRA_OFFSET = -2080.0, 2133.2


def normalize_zte(zte: np.ndarray, head_mask: np.ndarray):
    """Normalize ZTE intensities to ~1.0 in soft tissue."""
    vals = zte[head_mask]
    cap = np.percentile(vals, 95)
    ref = np.median(vals[(vals > 0.1 * cap) & (vals <= cap)])
    return zte / ref


def normalize_petra(petra: np.ndarray, head_mask: np.ndarray, bins: int = 512):
    """Normalize PETRA intensities by the histogram peak over the head."""
    vals = petra[head_mask]
    hist, edges = np.histogram(vals[vals > 0.05 * vals.max()], bins=bins)
    peak = 0.5 * (edges[np.argmax(hist)] + edges[np.argmax(hist) + 1])
    return petra / peak


def mri_to_pseudo_ct(
    image: np.ndarray,
    head_mask: np.ndarray,
    modality: str = "ZTE",
    *,
    slope: float | None = None,
    offset: float | None = None,
    norm_range: tuple = (0.1, 0.65),
    air_hu: float = -1000.0,
) -> np.ndarray:
    """Convert a ZTE or PETRA image to pseudo-CT HU.

    ``norm_range`` bounds the normalized intensities treated as bone (the
    reference's pCT range selection, GUI-adjustable ZTE range slider);
    values outside the head get ``air_hu``; soft tissue (norm above the
    range) gets a soft-tissue HU of ~42.
    """
    modality = modality.upper()
    if modality == "ZTE":
        norm = normalize_zte(image, head_mask)
        s = ZTE_SLOPE if slope is None else slope
        o = ZTE_OFFSET if offset is None else offset
    elif modality == "PETRA":
        norm = normalize_petra(image, head_mask)
        s = PETRA_SLOPE if slope is None else slope
        o = PETRA_OFFSET if offset is None else offset
    else:
        raise ValueError(f"modality must be ZTE or PETRA, got {modality}")

    pct = np.full(image.shape, air_hu, np.float64)
    lo, hi = norm_range
    bone = head_mask & (norm >= lo) & (norm <= hi)
    soft = head_mask & (norm > hi)
    pct[bone] = s * norm[bone] + o
    pct[soft] = 42.0
    # in-head air cavities (near-zero signal)
    cavity = head_mask & (norm < lo)
    pct[cavity] = air_hu
    return pct


def compute_sdr(hu_volume, skull_mask, spacing_mm=1.0, ray_spacing_mm=1.8,
                min_skull_voxels=3, center_region=0.5):
    """Skull density ratio: mean over z-rays of min(center HU)/max(HU)
    (`TranscranialModeling/BabelIntegrationBASE.py:816-854`, SkullGAN
    definition)."""
    vol = np.asarray(hu_volume)
    mask = np.asarray(skull_mask).astype(bool)
    step = max(1, int(round(ray_spacing_mm / spacing_mm)))
    vals = []
    for i in range(0, vol.shape[0], step):
        for j in range(0, vol.shape[1], step):
            ray = vol[i, j, :]
            sk = np.nonzero(mask[i, j, :])[0]
            if sk.size < min_skull_voxels:
                continue
            mid = len(sk) // 2
            half = len(sk) * center_region / 2
            b = max(0, int(round(mid - half)))
            e = min(len(sk), 1 + int(round(mid + half)))
            # min over the *skull voxels* of the central region (gaps between
            # skull voxels are water/marrow-labeled and carry no HU here)
            center_min = ray[sk[b:e]].min() if e > b else ray[sk[mid]]
            m = ray[sk].max()
            if m > 0:
                vals.append(center_min / m)
    return float(np.mean(vals)) if vals else float("nan")
