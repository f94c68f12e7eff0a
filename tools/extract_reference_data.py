"""One-time extraction of device/calibration DATA tables from the reference.

These are physical-device element coordinates and published calibration
measurements (Webb 2018/2020, Pichardo 2017, UCL petra-to-ct, SimNIBS
cph2025) that the reference redistributes as CSV/.mat/.h5 resources — facts
about hardware and tissue, not code. We convert them into .npz package data
under ``babelbrain_tpu/{tx,materials}/data/`` with the exact per-device frame
transforms the reference applies at load time, so downstream geometry and
HU-mapping code is a fresh implementation operating on identical data.

Sources (path:line into /root/reference/TranscranialModeling):
  H317.py:15-52, I12378.py:19-53, ATAC.py:19-52, H301.py:19-36,
  IGT64_500.py:19-31, R15646.py:19-30, R15148.py:19-28,
  BabelIntegrationDomeTx.py:16-22, BabelIntegrationREMOPD.py:28-39,
  BabelIntegrationBASE.py:61-69 (MapPichardo), :494-589 (Webb tables),
  :325-344 (UCL low-dose), :346-360 (cph2025 line).

Run: python tools/extract_reference_data.py
"""

import csv
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import h5py
import numpy as np
from scipy.io import loadmat

REF = "/root/reference/TranscranialModeling"
HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TX_DATA = os.path.join(HERE, "babelbrain_tpu", "tx", "data")
MAT_DATA = os.path.join(HERE, "babelbrain_tpu", "materials", "data")
os.makedirs(TX_DATA, exist_ok=True)
os.makedirs(MAT_DATA, exist_ok=True)


def focus_frame(apex_xyz_mm: np.ndarray, focal_mm: float) -> np.ndarray:
    """Apex-frame mm -> our focus-at-origin frame in meters (geometry.py
    convention: bowl at negative z, geometric focus at the origin)."""
    out = apex_xyz_mm / 1000.0
    out[:, 2] -= focal_mm / 1000.0
    return out


def extract_elements():
    tables = {}

    # H317: CSV inches, z measured from the rim plane -> z' = F - z (mm)
    t = np.loadtxt(
        os.path.join(REF, "H-317 XYZ Coordinates_revB update 1.18.22.csv"),
        delimiter=",", skiprows=1,
    )
    assert t.shape == (128, 4)
    xyz = t[:, 1:] * 25.4
    xyz[:, 2] = 135.0 - xyz[:, 2]
    tables["H317"] = focus_frame(xyz, 135.0)

    # I12378: CSV mm, z' = F - z
    xyz = np.loadtxt(os.path.join(REF, "I12378.csv"), delimiter=",")
    assert xyz.shape == (128, 3)
    xyz = xyz.copy()
    xyz[:, 2] = 72.0 - xyz[:, 2]
    tables["I12378"] = focus_frame(xyz, 72.0)

    # ATAC: CSV mm verbatim (already apex frame)
    xyz = np.loadtxt(os.path.join(REF, "ATACArray.csv"), delimiter=",")
    assert xyz.shape == (128, 3)
    tables["ATAC"] = focus_frame(xyz.copy(), 53.2)

    # H301: polar table (theta deg, radius mm) on the F=150 sphere
    rows = []
    with open(os.path.join(REF, "H301.csv")) as f:
        for line in f:
            th, r = line.split("\t")
            rows.append((float(th), float(r)))
    theta = np.deg2rad(np.array([r[0] for r in rows]))
    radii = np.array([r[1] for r in rows])
    assert radii.size == 128
    a = 150.0 - np.sqrt(150.0**2 - radii**2)
    # V1=[0,0,1], V2=cross(V1,[1,0,0])=[0,1,0]; cross(V1, r*V2) = [-r,0,0]
    xyz = np.stack([-radii * np.sin(theta), radii * np.cos(theta), a], axis=1)
    assert np.allclose(np.linalg.norm(xyz - [0, 0, 150.0], axis=1), 150.0)
    tables["H301"] = focus_frame(xyz, 150.0)

    # IGT64_500: CSV with header, z' = 75 - Z
    rows = list(csv.DictReader(open(os.path.join(REF, "IGT64_500.csv"),
                                    encoding="utf-8-sig")))
    xyz = np.array([[float(r["X"]), float(r["Y"]), 75.0 - float(r["Z"])]
                    for r in rows])
    assert xyz.shape == (64, 3)
    tables["IGT64_500"] = focus_frame(xyz, 75.0)

    # R15646: space-separated, cols Nel X Y Z theta phi ...; z' = 65 - Z
    t = np.loadtxt(os.path.join(REF, "R15646.csv"), skiprows=1)
    xyz = np.stack([t[:, 1], t[:, 2], 65.0 - t[:, 3]], axis=1)
    assert xyz.shape == (64, 3)
    tables["R15646"] = focus_frame(xyz, 65.0)

    # R15148: .mat, mm verbatim (apex frame), F=80
    xyz = loadmat(os.path.join(REF, "R15148_1001.mat"))["IGT128"].astype(float)
    assert xyz.shape == (128, 3)
    tables["R15148"] = focus_frame(xyz, 80.0)

    # DomeTx: CSV mm + per-element area mm^2; F=150
    t = np.loadtxt(os.path.join(REF, "DomeTxTransducerGeometry.csv"),
                   delimiter=",")
    assert t.shape == (1024, 4)
    xyz = t[:, :3].copy()
    tables["DomeTx"] = focus_frame(xyz, 150.0)
    tables["DomeTx_area_mm2"] = t[:, 3]

    # REMOPD: .mat element positions (meters, z=0 plane)
    pos = loadmat(os.path.join(REF, "REMOPD_ElementPosition.mat"))[
        "REMOPD_ElementPosition"].astype(float)
    assert pos.shape == (256, 3)
    tables["REMOPD"] = pos

    np.savez_compressed(os.path.join(TX_DATA, "element_tables.npz"), **tables)
    for k, v in tables.items():
        if k.endswith("_mm2") or k == "REMOPD":
            continue
        r = np.linalg.norm(v, axis=1) * 1e3
        print(f"{k}: {v.shape[0]} elems, |r-F| max {np.abs(r - r.mean()).max():.3f} mm (F~{r.mean():.1f})")


def _read_blosc_dataset(dset):
    try:
        return np.asarray(dset)
    except OSError:
        from babelbrain_tpu.native import blosc_decompress
        full = np.zeros(dset.shape, dset.dtype)
        cshape = dset.chunks
        for ci in range(dset.id.get_num_chunks()):
            info = dset.id.get_chunk_info(ci)
            _, raw = dset.id.read_direct_chunk(info.chunk_offset)
            arr = np.frombuffer(blosc_decompress(raw), dset.dtype).reshape(cshape)
            sl = tuple(slice(o, min(o + c, s))
                       for o, c, s in zip(info.chunk_offset, cshape, dset.shape))
            full[sl] = arr[tuple(slice(0, s.stop - s.start) for s in sl)]
        return full


def extract_calibrations():
    # Pichardo density/frequency -> SoS/attenuation maps (BLOSC-compressed)
    with h5py.File(os.path.join(REF, "MapPichardo.h5"), "r") as f:
        np.savez_compressed(
            os.path.join(MAT_DATA, "pichardo_map.npz"),
            rho=_read_blosc_dataset(f["rho"]),
            freq_mhz=_read_blosc_dataset(f["freq"]),
            sos=_read_blosc_dataset(f["MapSoS"]),
            att=_read_blosc_dataset(f["MapAtt"]),
        )

    # UCL low-dose PETRA->CT calibration (HU -> density interp table)
    with h5py.File(os.path.join(REF,
                   "ct-calibration-low-dose-30-March-2023-v1.h5"), "r") as f:
        cal = np.asarray(f["ct_calibration"])[0].T  # (2, 10): HU row, rho row
    np.savez_compressed(os.path.join(MAT_DATA, "ucl_lowdose.npz"),
                        hu=cal[0], density=cal[1])

    # SimNIBS cph2025 HU->density line (+ the hard-coded cap point)
    pts = np.loadtxt(os.path.join(
        REF, "ct_to_density_calibration_cph2025_line_v1.csv"), delimiter=",")
    np.savez_compressed(os.path.join(MAT_DATA, "cph2025_line.npz"),
                        hu=pts[:, 0], density=pts[:, 1])

    # Webb scanner-parameter calibration tables (SoS 2018, Att 2020)
    def read_webb(fname, value_cols):
        rows = list(csv.DictReader(open(os.path.join(REF, fname),
                                        encoding="utf-8-sig")))
        keys = np.array([
            "|".join([r["Scanner"], r["Energy"], r["Kernel"], r["Other"],
                      r["Res"]]) for r in rows])
        vals = {c: np.array([float(r[c]) for r in rows]) for c in value_cols}
        return keys, vals

    k_sos, v_sos = read_webb("WebbHU_SoS.csv", ["Slope", "Intercept"])
    k_att, v_att = read_webb("WebbHU_Att.csv", ["Alpha_0", "Beta", "c"])
    np.savez_compressed(
        os.path.join(MAT_DATA, "webb_tables.npz"),
        sos_keys=k_sos, sos_slope=v_sos["Slope"], sos_intercept=v_sos["Intercept"],
        att_keys=k_att, att_alpha0=v_att["Alpha_0"], att_beta=v_att["Beta"],
        att_c=v_att["c"],
    )
    print(f"webb: {k_sos.size} SoS rows, {k_att.size} Att rows")
    print("pichardo/ucl/cph2025 saved")


if __name__ == "__main__":
    extract_elements()
    extract_calibrations()
