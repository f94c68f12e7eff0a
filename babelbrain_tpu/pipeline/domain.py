"""Simulation-domain arithmetic: grid spacing, time stepping, material maps.

Re-implements the numerics of the reference's ``UpdateConditions``
(`TranscranialModeling/BabelIntegrationBASE.py:1753-2221`):

* dx = c_min / (f * PPW), with c_min over the material table (long+shear)
  bounded by the global tissue minimum.
* "ideal" dt from the CFL bound, then snapped so the period is an integer
  number of steps (PPP), with the same awkward-prime fixups and
  round-up-to-multiple-of-5 rule (`:1808-1827`) so sensor windows divide
  evenly.
* domain = input mask + PML offsets (+ cone-fitting growth); z-flip of the
  input mask (the reference simulates with z reversed, `:1844`).
* material-ID remapping for label mode and CT mode, including the
  tissue-layer removal below the source plane (`:2160-2201`).

Mask label convention (Step 1 contract, `BabelDatasetPreps.py:771-772`):
0 water, 1 skin, 2 cortical, 3 trabecular, 4 brain, 5 target (brain voxel),
6 white matter, 7 gray matter, 8 CSF.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..materials import material_array, smallest_sos
from ..ops.fdtd import stable_dt


def snap_ppp(ppp: float) -> int:
    """Round points-per-period up, avoiding awkward prime factors
    (`BabelIntegrationBASE.py:1809-1827`)."""
    ppp = int(np.ceil(ppp))
    fixups = {31: 32, 34: 35, 23: 24, 71: 72, 74: 75, 79: 80, 47: 48}
    if ppp in fixups:
        return fixups[ppp]
    if ppp % 5 != 0:
        ppp = (ppp // 5 + 1) * 5
    return ppp


def compute_time_stepping(
    materials: np.ndarray,
    frequency: float,
    ppw: float,
    alpha_cfl: float = 0.5,
    bound_by_tissue_minimum: bool = True,
):
    """Return (dx, dt, ppp, adjusted_cfl).

    dx from the smallest propagating speed; dt from the 4th-order CFL bound
    at the largest speed, snapped to an integer divisor of the period.
    """
    mats = np.asarray(materials, np.float64)
    speeds = mats[:, 1:3].ravel()
    # speeds below 500 m/s belong to sub-resolution reflector materials
    # (air cavities); they set an impedance contrast, not a resolved
    # wavelength, so they must not shrink the grid
    resolved = speeds[speeds >= 500.0]
    cmin = resolved.min()
    if bound_by_tissue_minimum:
        cmin = min(cmin, smallest_sos(frequency, include_shear=True))
    cmax = speeds.max()
    dx = cmin / frequency / ppw
    dt_ideal = stable_dt(dx, cmax, cfl=alpha_cfl)
    ppp = snap_ppp(1.0 / frequency / dt_ideal)
    dt = 1.0 / frequency / ppp
    return dx, dt, ppp, dt / dt_ideal * alpha_cfl


def sensor_window(
    n_steps: int, ppp: int, cycles_to_track: int = 2
) -> int:
    """First step of the carrier-DFT window (last N cycles)."""
    return max(0, n_steps - cycles_to_track * ppp)


def simulation_steps(domain_extent_m, water_sos: float, dt: float, ppp: int) -> int:
    """Total steps = time for a wavefront to cross the domain diagonal
    (excluding PML), rounded up to whole periods (`:2082-2089`)."""
    t_cross = float(np.linalg.norm(domain_extent_m)) / water_sos
    n = int(np.floor(t_cross / dt))
    return (n // ppp + 1) * ppp


@dataclass
class Domain:
    """Assembled simulation domain (all arrays in sim orientation: z flipped
    vs the input NIfTI, increasing z = away from transducer)."""

    material_map: np.ndarray  # (N1,N2,N3) uint32 material indices
    materials: np.ndarray  # (M,5)
    dx: float
    dt: float
    ppp: int
    n_steps: int
    sensor_start: int
    source_z: int
    npml: int
    offsets: tuple  # (xl, xr, yl, yr, zl, zr)
    focal_idx: np.ndarray  # (3,) voxel index of the target in sim grid
    x_vec: np.ndarray
    y_vec: np.ndarray
    z_vec: np.ndarray
    frequency: float
    mask_shape: tuple = ()
    meta: dict = field(default_factory=dict)

    def crop(self, volume):
        """Remove PML/padding -> input-mask-shaped volume (sim orientation)."""
        xl, xr, yl, yr, zl, zr = self.offsets
        return volume[xl:-xr, yl:-yr, zl:-zr]

    def crop_and_unflip(self, volume):
        """Back to the input NIfTI orientation (`ReturnResults` contract)."""
        return np.flip(self.crop(volume), axis=2)


LABEL_WATER, LABEL_SKIN, LABEL_CORTICAL, LABEL_TRABECULAR = 0, 1, 2, 3
LABEL_BRAIN, LABEL_TARGET, LABEL_WM, LABEL_GM, LABEL_CSF = 4, 5, 6, 7, 8


def _q_correction(mats: np.ndarray) -> np.ndarray:
    """Env hook ``BBT_QCORRECTION=<float>``: scale the attenuation columns.

    Counterpart of the reference's ``BABEL_PYTEST_QFACTOR`` override
    (`BabelIntegrationBASE.py:1109-1111`), which rescales the Q-factor
    correction applied to its relaxation model. Our SLS is tuned exactly at
    the carrier so the correction is identically 1 by design; the hook lets
    attenuation-sensitivity tests scale it without editing material tables.
    """
    import os

    q = os.environ.get("BBT_QCORRECTION")
    if q:
        mats = mats.copy()
        mats[:, 3] *= float(q)
        mats[:, 4] *= float(q)
    return mats


def build_label_materials(frequency: float, segmented: bool, no_shear=False):
    """Label-mode material table: water, skin, cortical, trabecular, brain
    (+WM, GM, CSF) — `BabelIntegrationBASE.py:1357-1377`.

    Env hook: ``BBT_PAPER_CONDITIONS=1`` models all soft tissues as water
    (the reference's ``BABEL_PYTEST_PAPER`` hook,
    `BabelIntegrationBASE.py:1323-1335`), reproducing its paper conditions.
    """
    import os

    paper = os.environ.get("BBT_PAPER_CONDITIONS") == "1"
    tissues = ["Water", "Skin", "Cortical", "Trabecular", "Brain"]
    if segmented:
        tissues += ["WhiteMatter", "GrayMatter", "CSF"]
    if paper:
        tissues = [
            "Water" if t not in ("Cortical", "Trabecular") else t
            for t in tissues
        ]
    mats = material_array(frequency, tissues)
    if no_shear:
        mats[:, 2] = 0.0
        mats[:, 4] = 0.0
    return _q_correction(mats)


AIR_MATERIAL = np.array([1.2, 343.0, 0.0, 30.0, 0.0])


def build_ct_materials(
    frequency: float, segmented: bool, hu_density, hu_sos, hu_att,
    with_air: bool = False,
):
    """CT-mode material table: water + soft tissues + one material per
    quantized HU (`BabelIntegrationBASE.py:1322-1354`); shear disabled.

    ``with_air`` appends a low-impedance air material as the LAST index;
    intracranial air cavities mapped to it reflect nearly all energy — the
    physically-grounded equivalent of the reference's ``ReflectorMask``
    (`BabelIntegrationBASE.py:2365` ReflectorMask argument).
    """
    tissues = ["Water", "Skin", "Brain"]
    if segmented:
        tissues += ["WhiteMatter", "GrayMatter", "CSF"]
    soft = material_array(frequency, tissues)
    soft[:, 2] = 0.0
    soft[:, 4] = 0.0
    n_hu = len(hu_density)
    skull = np.zeros((n_hu, 5))
    skull[:, 0] = hu_density
    skull[:, 1] = hu_sos
    skull[:, 3] = hu_att
    if with_air:
        raise NotImplementedError(
            "air is handled as a pressure-release reflector mask, not a "
            "material (extreme impedance contrast is unstable on the grid); "
            "pass reflector_mask to run_fdtd / air_mask to build_domain"
        )
    return _q_correction(np.concatenate([soft, skull]))


def remap_labels(
    mask_ids: np.ndarray,
    ct_index_map: np.ndarray | None = None,
    segmented: bool | None = None,
) -> np.ndarray:
    """Map Step-1 label IDs to material-table indices.

    Label mode (`:2194-2198`): target(5) -> brain index; with segmentation the
    IDs 6..8 shift down by 1 (indices 5..7).
    CT mode (`:2163-2192`): bone labels (2,3) take their CT material index
    (already offset by the soft-tissue count); other tissues map onto
    [water, skin, brain, (WM, GM, CSF)].
    """
    ids = np.asarray(mask_ids).astype(np.int64)
    if segmented is None:
        segmented = bool((ids > 5).any())
    out = ids.copy()
    if ct_index_map is None:
        if segmented:
            out[ids == 5] = 4
            out[ids >= 6] -= 1
        else:
            out[ids == 5] = 4
        return out.astype(np.uint32)

    ct = np.asarray(ct_index_map).astype(np.int64)
    n_soft = 6 if segmented else 3
    bone = (ids == LABEL_CORTICAL) | (ids == LABEL_TRABECULAR)
    if segmented:
        # water0, skin1, brain2, WM3, GM4, CSF5
        remap = {0: 0, 1: 1, 4: 2, 5: 2, 6: 3, 7: 4, 8: 5}
    else:
        remap = {0: 0, 1: 1, 4: 2, 5: 2}
    for src, dst in remap.items():
        out[ids == src] = dst
    out[bone] = ct[bone] + n_soft
    return out.astype(np.uint32)


def build_domain(
    mask_nifti_data: np.ndarray,
    frequency: float,
    ppw: float,
    *,
    materials: np.ndarray | None = None,
    ct_index_map: np.ndarray | None = None,
    air_mask: np.ndarray | None = None,
    npml: int = 12,
    alpha_cfl: float = 0.5,
    cycles_to_track: int = 2,
    z_into_skin_m: float = 0.0,
    pad_cone_cells: tuple = (0, 0),
    water_only: bool = False,
    extra_steps_cycles: float = 0.0,
) -> Domain:
    """Assemble the simulation domain from a Step-1 mask volume.

    ``mask_nifti_data`` is in NIfTI orientation (z increasing toward the
    transducer as produced by Step 1); it is z-flipped into sim orientation
    here, exactly as the reference does (`:1844`).

    ``pad_cone_cells`` = extra (x,y) halo so a wide Rayleigh incident cone
    fits inside the non-PML region (the reference grows offsets iteratively,
    `:2029-2055`; callers compute the need from the transducer geometry).
    """
    mask = np.flip(np.asarray(mask_nifti_data), axis=2).astype(np.uint32)
    segmented = bool((mask > 5).any())
    if materials is None:
        materials = build_label_materials(frequency, segmented)
    dx, dt, ppp, adj_cfl = compute_time_stepping(
        materials, frequency, ppw, alpha_cfl
    )

    px, py = pad_cone_cells
    xl = xr = npml + int(px)
    yl = yr = npml + int(py)
    z_into_pix = int(np.round(z_into_skin_m / dx))
    zl = npml
    zr = npml
    src_z = npml + z_into_pix + 1

    shape = (
        mask.shape[0] + xl + xr,
        mask.shape[1] + yl + yr,
        mask.shape[2] + zl + zr,
    )
    mat_map = np.zeros(shape, np.uint32)
    if not water_only:
        ids = mask
        ct = None
        if ct_index_map is not None:
            ct = np.flip(np.asarray(ct_index_map), axis=2).astype(np.uint32)
        remapped = remap_labels(ids, ct, segmented)
        mat_map[xl:-xr, yl:-yr, zl:-zr] = remapped
        # remove tissue layers at/below the source plane (water instead)
        mat_map[:, :, : src_z + 1] = 0

    reflector = None
    if air_mask is not None:
        am = np.flip(np.asarray(air_mask).astype(bool), axis=2)
        reflector = np.zeros(shape, bool)
        reflector[xl:-xr, yl:-yr, zl:-zr] = am
        reflector[:, :, : src_z + 1] = False

    focal = np.argwhere(mask == LABEL_TARGET)
    if len(focal) == 0:
        focal_idx = np.array(shape) // 2
    else:
        focal_idx = focal[0] + np.array([xl, yl, zl])

    x_vec = (np.arange(shape[0]) - focal_idx[0]) * dx
    y_vec = (np.arange(shape[1]) - focal_idx[1]) * dx
    z_vec = (np.arange(shape[2]) - focal_idx[2]) * dx

    extent = (np.array(shape) - 2 * npml) * dx
    n_steps = simulation_steps(extent, materials[0, 1], dt, ppp)
    n_steps += int(np.round(extra_steps_cycles * ppp))

    # env hook ``BBT_SEL_MASK=<path>``: dump the assembled simulation-region
    # debug volume (the reference's ``BABELBRAIN_SEL_MASK``,
    # `BabelIntegrationBASE.py:2127-2151`)
    import os

    sel_path = os.environ.get("BBT_SEL_MASK")
    if sel_path:
        np.savez_compressed(
            sel_path if sel_path.endswith(".npz") else sel_path + ".npz",
            material_map=mat_map,
            focal_idx=np.asarray(focal_idx),
            offsets=np.array((xl, xr, yl, yr, zl, zr)),
            source_z=src_z,
            dx=dx,
        )
    return Domain(
        material_map=mat_map,
        materials=np.asarray(materials, np.float64),
        dx=dx,
        dt=dt,
        ppp=ppp,
        n_steps=n_steps,
        sensor_start=sensor_window(n_steps, ppp, cycles_to_track),
        source_z=src_z,
        npml=npml,
        offsets=(xl, xr, yl, yr, zl, zr),
        focal_idx=np.asarray(focal_idx),
        x_vec=x_vec,
        y_vec=y_vec,
        z_vec=z_vec,
        frequency=frequency,
        mask_shape=tuple(mask.shape),
        meta={
            "adjusted_cfl": adj_cfl,
            "segmented": segmented,
            "reflector_mask": reflector,
        },
    )


def cone_padding_cells(
    aperture: float,
    focal_length: float,
    dx: float,
    mask_shape_xy: tuple,
    npml: int = 12,
    margin: float = 1.1,
) -> tuple:
    """Extra (x, y) cells so the transducer cone cross-section fits inside
    the non-PML region (simplified form of the grow loop `:2029-2055`)."""
    radius_cells = margin * (aperture / 2.0) / dx
    need = []
    for n in mask_shape_xy:
        half = n / 2.0
        need.append(int(max(0, np.ceil(radius_cells - half))))
    return tuple(need)
