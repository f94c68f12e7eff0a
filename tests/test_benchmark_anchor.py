"""External field anchors (VERDICT r3 task 2).

Every other field test in this repo compares against goldens produced by
this same solver. This tier anchors the end-to-end water path to an
EXTERNAL truth: the O'Neil (1949) spherical-cap radiator solution — the
published analytic reference the ITRUSST transcranial-benchmark
inter-comparison itself validates against in water (Aubry et al. 2022;
the reference cites that study as its correctness anchor, `README.md:27`).

Geometry follows the inter-comparison's benchmark transducer: a focused
bowl with 64 mm aperture and 64 mm radius of curvature driven at 500 kHz
with a 60 kPa surface drive (`BabelIntegrationBASE.py:904-912` homogeneous
-medium fixture semantics). The truth values are computed here by direct
numerical quadrature of the Rayleigh-Sommerfeld integral over the cap —
independent of both `ops.rayleigh` (vmapped/blocked JAX) and the FDTD.

Assertions use the reference's tol_5 regression tier (5%,
`pytest.ini:55-57`) on:
  * focal (peak) pressure,
  * focal position,
  * -6 dB axial length and lateral width (sub-voxel interpolated).

A second case pushes the same beam through a flat bone slab supplied via
the reference's ``BenchmarkTestFile`` mechanism (`pipeline.benchmark`,
`BabelIntegrationBASE.py:1253-1260`) and checks the transmitted focal
pressure against the analytic plane-wave slab transmission and the
ray-optics focal shift.
"""

import numpy as np
import pytest

from babelbrain_tpu.ops.fdtd import FDTDGrid, run_fdtd, stable_dt

F0 = 500e3
C_W, RHO_W = 1500.0, 1000.0
ROC = 64e-3      # bowl radius of curvature (benchmark geometry)
APERTURE = 64e-3
P0 = 60e3        # rho*c*u_n surface drive (Pa)
PPW = 6.0


def oneil_pressure(points, n_theta=4000, n_phi=720):
    """|p| at field points by direct quadrature of the Rayleigh integral
    over the spherical cap (O'Neil 1949), focus at the origin.

    p(x) = (i k / 2 pi) * P0 * integral_cap e^{ikr}/r dS
    with cap points (R sin t cos f, R sin t sin f, -R cos t).
    """
    k = 2 * np.pi * F0 / C_W
    tmax = np.arcsin(APERTURE / 2 / ROC)
    th = (np.arange(n_theta) + 0.5) * (tmax / n_theta)
    ph = (np.arange(n_phi) + 0.5) * (2 * np.pi / n_phi)
    st, ct = np.sin(th), np.cos(th)
    cap = np.stack(
        [
            np.outer(ROC * st, np.cos(ph)).ravel(),
            np.outer(ROC * st, np.sin(ph)).ravel(),
            np.repeat(-ROC * ct, n_phi),
        ],
        axis=1,
    )
    dS = np.repeat(ROC**2 * st * (tmax / n_theta) * (2 * np.pi / n_phi),
                   n_phi)
    out = np.empty(len(points))
    for i, p in enumerate(np.asarray(points, np.float64)):
        r = np.linalg.norm(cap - p[None, :], axis=1)
        val = np.sum(dS * np.exp(1j * k * r) / r)
        out[i] = np.abs(1j * k / (2 * np.pi) * P0 * val)
    return out


def oneil_axis(z_vals):
    """On-axis |p| (exact 1-D quadrature form of the same integral)."""
    k = 2 * np.pi * F0 / C_W
    tmax = np.arcsin(APERTURE / 2 / ROC)
    n = 200_000
    th = (np.arange(n) + 0.5) * (tmax / n)
    st, ct = np.sin(th), np.cos(th)
    out = np.empty(len(z_vals))
    for i, z in enumerate(np.asarray(z_vals, np.float64)):
        r = np.sqrt((ROC * st) ** 2 + (z + ROC * ct) ** 2)
        val = np.sum(np.exp(1j * k * r) / r * ROC**2 * st) * (tmax / n)
        out[i] = np.abs(1j * k * P0 * val)
    return out


def _width_m6db(x, y):
    """-6 dB full width of profile y(x), linearly interpolated."""
    pk = int(np.argmax(y))
    half = y[pk] * 10 ** (-6 / 20)

    def cross(direction):
        i = pk
        while 0 < i < len(y) - 1 and y[i] > half:
            i += direction
        j = i - direction
        f = (y[j] - half) / (y[j] - y[i])
        return x[j] + f * (x[i] - x[j])

    return abs(cross(1) - cross(-1))


def _rayleigh_plane_p_vz(tx, u0, x_vec, z_src_m):
    """Pressure phasor P and exact normal-velocity phasor Vz (as rho*c*Vz,
    a pressure-equivalent) on the source plane, by direct numpy evaluation
    of the Rayleigh integral and its z-derivative.

    Driving the FDTD's velocity plane with the TRUE Vz (instead of the
    monopole approximation vz = p/(rho c)) makes the source model exact up
    to plane truncation: by Rayleigh's theorem the forward field is fully
    determined by vz on the plane.
    """
    k = 2 * np.pi * F0 / C_W
    omega = 2 * np.pi * F0
    xp, yp = np.meshgrid(x_vec, x_vec, indexing="ij")
    pts = np.stack(
        [xp.ravel(), yp.ravel(), np.full(xp.size, z_src_m)], 1
    )
    w = np.asarray(u0, np.complex128) * np.asarray(tx.areas, np.float64) \
        * (1j * k / (2 * np.pi))
    c = np.asarray(tx.centers, np.float64)
    P = np.zeros(len(pts), np.complex128)
    dPdz = np.zeros(len(pts), np.complex128)
    for s in range(0, len(pts), 2048):
        q = pts[s:s + 2048]
        d = q[:, None, :] - c[None, :, :]
        r = np.linalg.norm(d, axis=2)
        g = np.exp(1j * k * r) / r
        P[s:s + 2048] = g @ w
        dPdz[s:s + 2048] = (g * (1j * k - 1.0 / r) * d[:, :, 2] / r) @ w
    # time convention resolved empirically: pick the Vz sign that matches
    # the plane-wave limit vz ~ p/(rho c) at the beam center
    i_pk = int(np.argmax(np.abs(P)))
    cands = [sgn * 1j * (C_W / omega) * dPdz for sgn in (+1, -1)]
    errs = [abs(v[i_pk] - P[i_pk]) for v in cands]
    vz_rc = cands[int(np.argmin(errs))]
    # ops.rayleigh / the FDTD sin(wt + phi) injection use the conjugate
    # phasor convention (verified numerically: repo field = -conj(this)),
    # so convert before handing the plane to the kernel
    return (-np.conj(P).reshape(xp.shape),
            -np.conj(vz_rc).reshape(xp.shape))


@pytest.fixture(scope="module")
def water_run():
    """FDTD water run of the benchmark bowl, driven by the exact Rayleigh
    normal velocity on its source plane (the clinical Step-2 water path
    with the source-model approximation removed)."""
    from babelbrain_tpu.tx import make_focused_bowl

    dx = C_W / F0 / PPW
    npml = 12
    # source plane 24 mm before the focus; domain extends 16 mm beyond
    z_src_m = -24e-3
    n_lat = 88          # +/- ~21 mm laterally around the axis
    shape = (
        n_lat + 2 * npml, n_lat + 2 * npml,
        int(round((24e-3 + 16e-3) / dx)) + 2 * npml + 2,
    )
    zsrc_idx = npml + 1
    i0 = shape[0] // 2
    z_vec = (np.arange(shape[2]) - zsrc_idx) * dx + z_src_m
    x_vec = (np.arange(shape[0]) - i0) * dx

    tx = make_focused_bowl(F0, ROC, APERTURE, C_W, ppw_surface=6.0)
    u0 = np.full(tx.num_subelements, P0, np.complex64)
    _, plane = _rayleigh_plane_p_vz(tx, u0, x_vec, z_src_m)
    plane = plane.copy()
    plane[:npml] = plane[-npml:] = 0
    plane[:, :npml] = plane[:, -npml:] = 0

    ppp = int(np.ceil(1 / F0 / stable_dt(dx, C_W, 0.5)))
    dt = 1 / F0 / ppp
    n_steps = (int(np.ceil(60e-3 / C_W / dt)) // ppp + 3) * ppp
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=n_steps, frequency=F0,
        npml=npml, sensor_start=n_steps - 2 * ppp,
        source_plane_z=zsrc_idx,
    )
    mats = np.array([[RHO_W, C_W, 0.0, 0.0, 0.0]])
    out = run_fdtd(
        np.zeros(shape, np.uint8), mats, grid,
        source_amp=np.abs(plane), source_phase=np.angle(plane),
    )
    return out, x_vec, z_vec, i0, zsrc_idx, dx


@pytest.mark.slow
class TestONeilWaterAnchor:
    def test_focal_pressure_and_position(self, water_run):
        out, x_vec, z_vec, i0, zsrc, dx = water_run
        axis = out["p_amp"][i0, i0, :]
        sel = slice(zsrc + 6, len(z_vec) - 14)
        zf_idx = int(np.argmax(axis[sel])) + sel.start
        p_focal = axis[zf_idx]
        z_focal = z_vec[zf_idx]

        z_ref = np.linspace(-18e-3, 10e-3, 281)
        p_ref = oneil_axis(z_ref)
        p_ref_pk = p_ref.max()
        z_ref_pk = z_ref[int(np.argmax(p_ref))]

        assert abs(p_focal - p_ref_pk) / p_ref_pk < 0.05, (
            f"focal pressure {p_focal/1e3:.1f} kPa vs O'Neil "
            f"{p_ref_pk/1e3:.1f} kPa"
        )
        assert abs(z_focal - z_ref_pk) < 1.5 * dx

    def test_axial_minus6db_length(self, water_run):
        out, x_vec, z_vec, i0, zsrc, dx = water_run
        axis = out["p_amp"][i0, i0, :]
        sel = slice(zsrc + 6, len(z_vec) - 14)
        l_fdtd = _width_m6db(z_vec[sel], axis[sel])
        z_ref = np.linspace(-18e-3, 12e-3, 601)
        l_ref = _width_m6db(z_ref, oneil_axis(z_ref))
        assert abs(l_fdtd - l_ref) / l_ref < 0.05, (l_fdtd, l_ref)

    def test_lateral_minus6db_width(self, water_run):
        out, x_vec, z_vec, i0, zsrc, dx = water_run
        axis = out["p_amp"][i0, i0, :]
        sel = slice(zsrc + 6, len(z_vec) - 14)
        zf_idx = int(np.argmax(axis[sel])) + sel.start
        lat = out["p_amp"][:, i0, zf_idx]
        w_fdtd = _width_m6db(x_vec, lat)
        x_ref = np.linspace(-4e-3, 4e-3, 81)
        pts = np.stack(
            [x_ref, np.zeros_like(x_ref),
             np.full_like(x_ref, z_vec[zf_idx])], 1
        )
        w_ref = _width_m6db(x_ref, oneil_pressure(pts))
        assert abs(w_fdtd - w_ref) / w_ref < 0.05, (w_fdtd, w_ref)


@pytest.mark.slow
def test_benchmark_file_skull_slab(tmp_path, water_run):
    """Focused beam through a flat bone slab supplied as a
    ``BenchmarkTestFile`` (TestType=2): transmitted focal pressure matches
    the analytic CW slab transmission of the dominant (paraxial) rays and
    the focus shifts toward the transducer by the ray-optics amount."""
    from babelbrain_tpu.pipeline.benchmark import run_benchmark_acoustic
    from babelbrain_tpu.pipeline.io import save_dict_h5
    from babelbrain_tpu.tx import make_focused_bowl

    out_w, x_vec, z_vec, i0, zsrc, dx = water_run
    # inter-comparison skull medium: c=2800 m/s, rho=1850 kg/m^3 (lossless
    # here so the anchor stays analytic)
    C_B, RHO_B = 2800.0, 1850.0
    shape = out_w["p_amp"].shape
    t_slab = 12 * dx  # ~5.9 mm
    k0 = zsrc + 14
    mat_map = np.zeros(shape, np.uint32)
    mat_map[:, :, k0:k0 + 12] = 1

    mats_h5 = {
        "Materials": [
            {"Density": RHO_W, "LongSoS": C_W, "ShearSoS": 0.0,
             "LongAtt": 0.0, "ShearAtt": 0.0},
            {"Density": RHO_B, "LongSoS": C_B, "ShearSoS": 0.0,
             "LongAtt": 0.0, "ShearAtt": 0.0},
        ],
        "MaterialMap": mat_map,
        "TestType": 2,
    }
    path = str(tmp_path / "bench_slab.h5")
    save_dict_h5(mats_h5, path)

    tx = make_focused_bowl(F0, ROC, APERTURE, C_W, ppw_surface=6.0)
    z_src_m = z_vec[zsrc]
    u0 = np.full(tx.num_subelements, P0, np.complex64)
    _, plane = _rayleigh_plane_p_vz(tx, u0, x_vec, z_src_m)
    plane = plane.copy()
    npml = 12
    plane[:npml] = plane[-npml:] = 0
    plane[:, :npml] = plane[:, -npml:] = 0

    out = run_benchmark_acoustic(
        path, F0, PPW, np.abs(plane), np.angle(plane),
        source_plane_z=zsrc,
    )
    # the benchmark runner re-derives dx from the medium (c_max=2800);
    # compare against a reference water run only through positions in m
    dxb = out["grid"].dx
    zb = (np.arange(shape[2]) - zsrc) * dxb + z_src_m

    axis_w = out_w["p_amp"][i0, i0, :]
    axis_s = out["p_amp"][i0, i0, :]
    sel_w = slice(zsrc + 6, shape[2] - 14)
    zf_w = z_vec[int(np.argmax(axis_w[sel_w])) + sel_w.start]
    p_w = axis_w[sel_w].max()
    sel_s = slice(k0 + 14, shape[2] - 14)
    zf_s = zb[int(np.argmax(axis_s[sel_s])) + sel_s.start]
    p_s = axis_s[sel_s].max()

    # analytic CW pressure transmission of a lossless slab at normal
    # incidence (transfer matrix)
    t_real = 12 * dxb
    Z1, Z2 = RHO_W * C_W, RHO_B * C_B
    k2 = 2 * np.pi * F0 / C_B
    T = 1.0 / np.sqrt(
        np.cos(k2 * t_real) ** 2
        + 0.25 * (Z2 / Z1 + Z1 / Z2) ** 2 * np.sin(k2 * t_real) ** 2
    )
    assert abs(p_s / p_w - T) / T < 0.15, (p_s / p_w, T)

    # ray optics: the faster slab pulls the focus toward the transducer by
    # t (c2/c1 - 1) for paraxial rays; the bowl's ~30 deg edge rays sit
    # near the critical angle (asin(c1/c2) = 32.4 deg) and shift up to
    # ~2x the paraxial amount, so the measured shift must land between
    # 1x and 2x the paraxial prediction, toward the transducer
    shift_ref = -t_real * (C_B / C_W - 1.0)
    shift = zf_s - zf_w
    assert shift < 0, shift
    assert 0.9 * abs(shift_ref) <= abs(shift) <= 2.0 * abs(shift_ref), (
        shift, shift_ref
    )
