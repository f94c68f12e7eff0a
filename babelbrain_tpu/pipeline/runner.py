"""Headless end-to-end runner (the RunCases-equivalent primary API).

The reference drives everything from three worker functions + file contracts
(SURVEY.md section 3.5 marks the batch path as the primary API). This module
is the library-first equivalent: one call runs Step 1 -> Step 2 -> Step 3 on
a case, with skip-if-output-exists caching like the reference
(`BabelIntegrationBASE.py:962-966`) and ``CTS:``-style stage timing.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass, field

import numpy as np

from ..utils.timing import stage_timer
from . import io as pio
from .acoustic import position_transducer, run_acoustic_sim
from .domain import (
    build_ct_materials,
    build_domain,
    build_label_materials,
    cone_padding_cells,
)
from .profiles import TRANSDUCER_REGISTRY, build_transducer
from .step1 import Step1Result, generate_mask
from .thermal import SonicationParams, run_sonication
from ..materials.ct_mapping import map_hu_to_properties
from ..materials.pseudo_ct import compute_sdr


def case_hash(**kwargs) -> str:
    """blake2s content hash for cache keys (the FileManager idea,
    `BabelBrain/FileManager.py:163-293`)."""
    h = hashlib.blake2s(digest_size=8)
    for k in sorted(kwargs):
        v = kwargs[k]
        h.update(str(k).encode())
        if isinstance(v, np.ndarray):
            h.update(v.tobytes())
        else:
            h.update(repr(v).encode())
    return h.hexdigest()


@dataclass
class CaseConfig:
    """One sonication case (target x transducer x frequency x PPW)."""

    tx_system: str = "CTX_500"
    frequency: float = 500e3
    ppw: float = 6.0
    source_amp_pa: float = 60e3
    steering: tuple = (0.0, 0.0, 0.0)
    mapping_method: str = "Webb-Marsac"
    # imaging input type, like the reference's start-dialog CTType combo
    # (`SelFiles/ui_form.py:227-231`): 'CT' | 'ZTE' | 'PETRA' | 'Density'
    ct_type: str = "CT"
    zte_range: tuple = (0.1, 0.6)
    hu_threshold: float = 300.0
    density_threshold: float = 1200.0  # `BabelDatasetPreps.py:391,410-413`
    coregister: bool = False  # rigid-register CT/ZTE/PETRA to T1 first
    rotation_z: float = 0.0  # array rotation about the beam axis (degrees)
    do_refocus: bool = False
    segment_brain: bool = False
    bone_rim_correction: bool = False
    elem_centers: np.ndarray | None = None
    output_dir: str = "."
    prefix: str = "case"
    export_meshes: bool = False
    meta: dict = field(default_factory=dict)


def run_case(
    cfg: CaseConfig,
    labels_data,
    labels_affine,
    target_ras,
    direction_ras,
    *,
    ct_data=None,
    ct_affine=None,
    t1_data=None,
    t1_affine=None,
    thermal_params: SonicationParams | None = None,
    mask_shape=None,
    mesh=None,
    force_recalc=False,
):
    """Run the full pipeline for one case; returns a results dict and writes
    the reference's output files (BabelViscoInput.nii.gz, DataForSim.h5,
    ThermalField h5).

    Caching: a blake2s hash over the inputs + config is stored next to the
    outputs; when it matches and ``force_recalc`` is False, Steps 1+2 are
    reloaded from disk instead of recomputed (the reference's
    skip-if-output-exists + FileManager hash-chain behavior,
    `BabelIntegrationBASE.py:962-966`, `FileManager.py:223`).
    """
    spec = TRANSDUCER_REGISTRY[cfg.tx_system]
    out_base = os.path.join(
        cfg.output_dir,
        f"{cfg.prefix}_{cfg.tx_system}_{int(cfg.frequency/1e3)}kHz_{int(cfg.ppw)}PPW",
    )
    os.makedirs(cfg.output_dir, exist_ok=True)

    ct_type = cfg.ct_type.upper().replace("REAL ", "")
    if ct_data is not None and ct_type in ("ZTE", "PETRA"):
        # MRI -> pseudo-CT conversion in the imaging grid, mirroring Step 1's
        # CTZTEProcessing branch (`BabelDatasetPreps.py:843-851`,
        # `CTZTEProcessing.py:501-628`)
        from ..materials.pseudo_ct import mri_to_pseudo_ct
        from ..ops import imaging as im

        if cfg.coregister and t1_data is not None:
            # rigid MRI->T1 registration, the elastix-equivalent step
            # (`CTZTEProcessing.py:111,289`): resample onto the T1 grid,
            # estimate the transform, apply it
            from .coreg import register_rigid

            t1 = np.asarray(t1_data, np.float32)
            mv = im.resample_from_to(
                np.asarray(ct_data, np.float32), ct_affine,
                t1_affine, t1.shape, order=1,
            )
            _, mat = register_rigid(t1, mv)
            ct_data = im.resample_affine(mv, mat, t1.shape, order=1)
            ct_affine = t1_affine
        head = im.resample_from_to(
            (np.asarray(labels_data) > 0).astype(np.float32),
            labels_affine,
            ct_affine if ct_affine is not None else labels_affine,
            np.asarray(ct_data).shape,
            order=0,
        ) > 0.5
        with stage_timer(f"{ct_type} to pseudo-CT", level=1, step=1):
            ct_data = mri_to_pseudo_ct(
                np.asarray(ct_data, np.float64), head, ct_type,
                norm_range=tuple(cfg.zte_range),
            )
    bone_threshold = (
        cfg.density_threshold if ct_type == "DENSITY" else cfg.hu_threshold
    )

    chash = case_hash(
        labels=np.asarray(labels_data),
        target=np.asarray(target_ras, float),
        direction=np.asarray(direction_ras, float),
        ct=np.asarray(ct_data) if ct_data is not None else "none",
        tx=cfg.tx_system,
        freq=cfg.frequency,
        ppw=cfg.ppw,
        steering=tuple(cfg.steering),
        refocus=cfg.do_refocus,
        rotz=cfg.rotation_z,
        mapping=cfg.mapping_method,
        ct_type=cfg.ct_type,
        zte_range=tuple(cfg.zte_range),
        thr=(cfg.hu_threshold, cfg.density_threshold),
        segment=cfg.segment_brain,
        rim=cfg.bone_rim_correction,
        amp=cfg.source_amp_pa,
        mask_shape=tuple(mask_shape) if mask_shape else "auto",
        # physics-changing env hooks must invalidate the cache too, else a
        # re-run with a hook toggled would silently return stale results
        env_hooks=(
            os.environ.get("BBT_QCORRECTION", ""),
            os.environ.get("BBT_PAPER_CONDITIONS", ""),
            os.environ.get("BBT_AVOID_PHASE_PROGRAMMING", ""),
        ),
    )
    hash_file = out_base + ".hash"
    h5_path_probe = out_base + "_DataForSim.h5"
    if (
        not force_recalc
        and os.path.isfile(hash_file)
        and os.path.isfile(h5_path_probe)
        and open(hash_file).read().strip() == chash
    ):
        cached = pio.load_dict_h5(h5_path_probe)
        return {
            "step1": None,
            "domain": None,
            "acoustic": None,
            "thermal": None,
            "cached": True,
            "data_for_sim": cached,
            "files": {
                "mask": out_base + "_BabelViscoInput.nii.gz",
                "acoustic": h5_path_probe,
                "thermal": None,
            },
        }

    # ---------------- Step 1 ----------------
    # Per-step cache (the FileManager hash-chain idea, `FileManager.py:163-293`):
    # Step 1 only depends on the trajectory + imaging inputs, so steering /
    # refocus / power / thermal changes reuse the domain files.
    s1_hash = case_hash(
        labels=np.asarray(labels_data),
        target=np.asarray(target_ras, float),
        direction=np.asarray(direction_ras, float),
        ct=np.asarray(ct_data) if ct_data is not None else "none",
        freq=cfg.frequency,
        ppw=cfg.ppw,
        ct_type=cfg.ct_type,
        zte_range=tuple(cfg.zte_range),
        thr=(cfg.hu_threshold, cfg.density_threshold),
        segment=cfg.segment_brain,
        rim=cfg.bone_rim_correction,
        mask_shape=tuple(mask_shape) if mask_shape else "auto",
    )
    s1_cache = out_base + "_Step1.h5"
    s1 = None
    if not force_recalc and os.path.isfile(s1_cache):
        try:
            blob = pio.load_dict_h5(s1_cache)
            if str(np.asarray(blob["hash"]).item()) in (s1_hash, repr(s1_hash)):
                s1 = Step1Result(
                    mask=np.asarray(blob["mask"]),
                    affine=np.asarray(blob["affine"]),
                    dx_mm=float(np.asarray(blob["dx_mm"])),
                    target_idx=np.asarray(blob["target_idx"]),
                    ct_index=np.asarray(blob["ct_index"])
                    if "ct_index" in blob else None,
                    unique_hu=np.asarray(blob["unique_hu"])
                    if "unique_hu" in blob else None,
                    air_mask=np.asarray(blob["air_mask"]).astype(bool)
                    if "air_mask" in blob else None,
                )
        except (OSError, KeyError, ValueError):
            s1 = None
    if s1 is None:
        with stage_timer("Step1 domain generation", level=2, step=1):
            s1 = generate_mask(
                labels_data,
                labels_affine,
                target_ras,
                direction_ras,
                cfg.frequency,
                cfg.ppw,
                shape=mask_shape,
                segment_brain_tissue=cfg.segment_brain,
                ct_data=ct_data,
                ct_affine=ct_affine,
                hu_threshold=bone_threshold,
                bone_rim_correction=cfg.bone_rim_correction,
            )
            pio.save_nifti(
                out_base + "_BabelViscoInput.nii.gz", s1.mask, s1.affine
            )
            if s1.ct_index is not None:
                pio.save_nifti(out_base + "_CT.nii.gz", s1.ct_index, s1.affine)
                np.savez(out_base + "_CT-cal.npz", UniqueHU=s1.unique_hu)
            blob = {
                "hash": s1_hash,
                "mask": s1.mask,
                "affine": s1.affine,
                "dx_mm": s1.dx_mm,
                "target_idx": s1.target_idx,
            }
            if s1.ct_index is not None:
                blob["ct_index"] = s1.ct_index
                blob["unique_hu"] = s1.unique_hu
            if s1.air_mask is not None:
                blob["air_mask"] = s1.air_mask.astype(np.uint8)
            pio.save_dict_h5(blob, s1_cache)
    if cfg.export_meshes:
        from .step1 import export_surface_meshes

        with stage_timer("Step1 surface meshes", level=2, step=1):
            export_surface_meshes(s1, out_base)

    # ---------------- Step 2 ----------------
    h5_path = out_base + "_DataForSim.h5"
    ct_mode = s1.ct_index is not None
    with stage_timer("Step2 acoustic simulation", level=2, step=2):
        if ct_mode:
            rho, sos, att = map_hu_to_properties(
                s1.unique_hu,
                cfg.frequency,
                cfg.mapping_method,
                is_petra=(ct_type == "PETRA"),
                density_input=s1.unique_hu if ct_type == "DENSITY" else None,
            )
            materials = build_ct_materials(
                cfg.frequency, cfg.segment_brain, rho, sos, att
            )
        else:
            materials = build_label_materials(cfg.frequency, cfg.segment_brain)
        pad = cone_padding_cells(
            spec.diameter, spec.focal_length or 0.0, s1.dx_mm * 1e-3,
            s1.mask.shape[:2],
        )
        dom = build_domain(
            s1.mask,
            cfg.frequency,
            cfg.ppw,
            materials=materials,
            ct_index_map=s1.ct_index if ct_mode else None,
            air_mask=s1.air_mask
            if (ct_mode and s1.air_mask is not None and s1.air_mask.any())
            else None,
            pad_cone_cells=pad,
        )
        tx = build_transducer(
            spec, cfg.frequency, elem_centers=cfg.elem_centers,
            rotation_z=cfg.rotation_z,
        )
        tx, mech_adjust = position_transducer(
            tx, dom, spec.focal_length or 0.0, return_adjustment=True
        )
        steering = np.asarray(cfg.steering)
        result = run_acoustic_sim(
            dom,
            tx,
            cfg.source_amp_pa,
            steering_target=steering if np.any(steering != 0) else None,
            do_refocus=cfg.do_refocus,
            mesh=mesh,
        )
        data = dict(result.data_for_sim)
        data["TxSystem"] = cfg.tx_system
        data["Frequency"] = cfg.frequency
        for k, v in zip(("XSteering", "YSteering", "ZSteering"), cfg.steering):
            data[k] = v
        # mechanical z correction applied to fit the bowl below the source
        # plane, reported along the trajectory direction in RAS (the
        # reference's AdjustmentInRAS, `_BabelBaseTx.py:407` + §3.2/S10)
        data["AdjustmentInRAS"] = mech_adjust * 1e3 * np.asarray(direction_ras)
        if ct_mode:
            # skull-density ratio of the quantized-HU volume within the
            # skull labels (`BabelIntegrationBASE.py:816,1392`); restrict to
            # bone-range HU so partial-volume edge voxels don't skew the ray
            # minima (the reference rays only traverse thresholded bone)
            hu_vol = s1.unique_hu[s1.ct_index]
            skull = np.isin(s1.mask, (2, 3)) & (hu_vol > 300.0)
            data["SDR"] = compute_sdr(hu_vol, skull, spacing_mm=s1.dx_mm)
        pio.save_dict_h5(data, h5_path)

    if os.environ.get("BBT_FORCE_ERROR_STEP2") == "1":
        # error-path test hook (the reference's TEST_FORCE_ERROR_BABEL_STEP2,
        # `BabelIntegrationBASE.py:1034-1036`)
        raise RuntimeError("forced Step-2 error (BBT_FORCE_ERROR_STEP2)")

    # ---------------- Step 3 ----------------
    thermal = None
    if isinstance(thermal_params, (list, tuple)):
        # full thermal profile: one BHTE run per combination + consolidation
        # (`CalculateThermalProcess.py:54-123`)
        from .thermal import run_all_combinations

        with stage_timer("Step3 thermal simulation", level=2, step=3):
            p_water = data.get("p_amp_water", result.p_amp)
            t_all, _ = run_all_combinations(
                result.p_amp,
                np.asarray(p_water),
                data["MaterialMap"],
                materials,
                dom.dx,
                data["TargetLocation"],
                list(thermal_params),
                out_base=out_base,
                ct_mode=ct_mode,
                segmented=cfg.segment_brain,
                frequency=cfg.frequency,
            )
            thermal = t_all[-1]
    elif thermal_params is not None:
        with stage_timer("Step3 thermal simulation", level=2, step=3):
            p_water = data.get("p_amp_water", result.p_amp)
            thermal = run_sonication(
                result.p_amp,
                np.asarray(p_water),
                data["MaterialMap"],
                materials,
                dom.dx,
                data["TargetLocation"],
                thermal_params,
                ct_mode=ct_mode,
                segmented=cfg.segment_brain,
                frequency=cfg.frequency,
            )
            tdict = {
                "MaterialList": {
                    "Density": materials[:, 0],
                    "SoS": materials[:, 1],
                    "Attenuation": materials[:, 3],
                },
                "p_map": result.p_amp * thermal.pressure_ratio,
                "MaterialMap": data["MaterialMap"],
                "TempEndFUS": thermal.temperature_end,
                "FinalTemp": thermal.temperature_end,
                "FinalDose": thermal.dose,
                "DoseEndFUS": thermal.dose,
                "TemperaturePoints": thermal.monitor,
                "TargetLocation": data["TargetLocation"],
                "RatioLosses": thermal.ratio_losses,
                "PressureRatio": thermal.pressure_ratio,
                "dt": 0.01,
            }
            tdict.update(thermal.metrics)
            pio.save_dict_h5(tdict, out_base + "_ThermalField.h5")

    with open(hash_file, "w") as f:
        f.write(chash)
    return {
        "step1": s1,
        "domain": dom,
        "acoustic": result,
        "thermal": thermal,
        "cached": False,
        "data_for_sim": data,
        "files": {
            "mask": out_base + "_BabelViscoInput.nii.gz",
            "acoustic": h5_path,
            "thermal": out_base + "_ThermalField.h5" if thermal else None,
        },
    }
