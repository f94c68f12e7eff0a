"""Staggered-grid viscoelastic FDTD for transcranial ultrasound (JAX/TPU).

Re-implements, TPU-natively, the solver contract of BabelViscoFDTD's
``StaggeredFDTD_3D_with_relaxation`` as reconstructed in SURVEY.md section
2.9 (call sites `TranscranialModeling/BabelIntegrationBASE.py:2338-2429`):
isotropic velocity-stress formulation on a Virieux staggered grid with
4th-order spatial / 2nd-order temporal accuracy, Q-factor (relaxation)
attenuation, CPML absorbing boundaries, CW plane sources with per-pixel
amplitude+phase, and carrier-frequency field extraction.

TPU-first design decisions (vs the reference's CUDA/OpenCL/Metal kernels):

* The whole time loop is one ``lax.scan`` under ``jit`` — XLA fuses each
  step's stencils into a handful of HBM-bandwidth-bound loops.
* Carrier-frequency amplitude/phase maps are accumulated **in-kernel** as a
  running DFT over the final cycles instead of storing a giant sensor
  time-series and FFT-ing afterwards (the reference's memory-bound design,
  `BabelIntegrationBASE.py:2460-2538`). For steady-state CW this is exact.
* Attenuation: one standard-linear-solid (SLS) relaxation mechanism per
  modulus (P and S), tuned **exactly** at the carrier: the relaxation times
  are chosen so both the phase velocity and the attenuation coefficient at
  ``f0`` equal the material table values (loss angle delta = 2*atan(alpha*c/omega),
  omega*tau_eps = tan(pi/4 + delta_p/2), tau_sig = 1/(omega^2 tau_eps)).
  Memory-variable updates follow Robertsson et al. (Geophysics 1994) with a
  shared stress-relaxation time per material.
* CPML (Roden & Gedney) with slab-only psi memory arrays: psi exists only in
  the boundary slabs of the axis its derivative runs along, so PML overhead
  on HBM traffic is O(npml/N).
* No complex dtypes on device (some TPU runtimes cannot transfer them);
  field extraction returns cos/sin accumulator pairs.

Material handling: per-voxel ``uint32`` index + per-material coefficient
table expanded (host-side) into full-grid property fields for the XLA path.
The viscoelastic Pallas fusedK kernels instead stream ONE int32 index
volume and keep the coefficient table resident in VMEM (single-vreg lane
``dynamic_gather`` per stage — bit-exact, +10% at the headline shape) when
the material count fits the gather window (min(128, N3) lanes, always true
for label mode) and the window tiling is efficient
(``_build_indexed_materials``). The fluid CT kernels keep the expanded
fields: Mosaic's gather is single-vreg-only, so a 1026-entry CT table
needs a 9-chunk select tree whose VPU cost exceeds the stream savings —
the material streams measure ~0% of sweep time (``tools/probe_roofline.py``
matcost probe; the kernels are not HBM-bound).
"""

from __future__ import annotations

import functools
import dataclasses
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# 4th-order staggered-grid coefficients
_C1 = 9.0 / 8.0
_C2 = -1.0 / 24.0


# ---------------------------------------------------------------------------
# spatial derivatives (zero-padded boundaries; PML owns the edges)
# ---------------------------------------------------------------------------


def _shift(f, offset, axis):
    """f shifted so out[i] = f[i+offset], zero-padded."""
    n = f.shape[axis]
    pad = [(0, 0)] * f.ndim
    if offset >= 0:
        pad[axis] = (0, offset)
        g = jnp.pad(f, pad)
        idx = [slice(None)] * f.ndim
        idx[axis] = slice(offset, offset + n)
    else:
        pad[axis] = (-offset, 0)
        g = jnp.pad(f, pad)
        idx = [slice(None)] * f.ndim
        idx[axis] = slice(0, n)
    return g[tuple(idx)]


def d_plus(f, axis):
    """Derivative at half point i+1/2 from integer-point samples (x 1/dx)."""
    return _C1 * (_shift(f, 1, axis) - f) + _C2 * (_shift(f, 2, axis) - _shift(f, -1, axis))


def d_minus(f, axis):
    """Derivative at integer point i from half-point samples (x 1/dx)."""
    return _C1 * (f - _shift(f, -1, axis)) + _C2 * (_shift(f, 1, axis) - _shift(f, -2, axis))


# ---------------------------------------------------------------------------
# CPML
# ---------------------------------------------------------------------------


def cpml_profiles(n, npml, dx, dt, cmax, reflection_limit=1e-5, m=3.0):
    """1-D CPML (b, a) coefficient profiles for integer and half positions.

    sigma(d) = sigma_max * (d/L)^m with
    sigma_max = -(m+1) * cmax * ln(R) / (2 L)   [Roden & Gedney 2000]
    b = exp(-sigma dt), a = b - 1 (kappa=1, alpha=0).
    Returns dict with 'b_int', 'a_int', 'b_half', 'a_half' arrays of length n
    (nonzero only in the first/last npml cells).
    """
    L = npml * dx
    sigma_max = -(m + 1.0) * cmax * np.log(reflection_limit) / (2.0 * L)

    def sigma_at(pos):  # pos: distance from interior edge of PML, in cells
        d = np.clip(pos, 0.0, npml) / npml
        return sigma_max * d**m

    out = {}
    for name, off in (("int", 0.0), ("half", 0.5)):
        coord = np.arange(n) + off
        depth_lo = npml - coord  # >0 inside lo PML
        depth_hi = coord - (n - 1 - npml)
        sig = sigma_at(depth_lo) + sigma_at(depth_hi)
        b = np.exp(-sig * dt)
        a = b - 1.0
        a[sig == 0] = 0.0
        out[f"b_{name}"] = b.astype(np.float32)
        out[f"a_{name}"] = a.astype(np.float32)
    return out


def _axis_reshape(arr, axis, ndim=3):
    shape = [1] * ndim
    shape[axis] = arr.shape[0]
    return arr.reshape(shape)


class _CPML:
    """Slab psi-memory bookkeeping for one derivative field along one axis."""

    def __init__(self, axis, staggered, profiles, npml):
        self.axis = axis
        self.npml = npml
        p = profiles[axis]["half" if staggered else "int"]
        self.b_lo = p["b_lo"]
        self.a_lo = p["a_lo"]
        self.b_hi = p["b_hi"]
        self.a_hi = p["a_hi"]

    def init_state(self, shape, zeros_fn=None):
        slab = list(shape)
        slab[self.axis] = self.npml + 2
        make = zeros_fn if zeros_fn is not None else (
            lambda sh: jnp.zeros(sh, jnp.float32)
        )
        return (make(tuple(slab)), make(tuple(slab)))

    def apply(self, D, psi, mask_lo=None, mask_hi=None):
        """Update psi slabs and return corrected derivative + new psi.

        mask_lo/mask_hi (f32 scalars) gate the slab updates so that, under
        domain decomposition, only the shards owning a global edge apply the
        PML along the sharded axis.
        """
        ax, ns = self.axis, self.npml + 2
        psi_lo, psi_hi = psi
        idx_lo = [slice(None)] * D.ndim
        idx_lo[ax] = slice(0, ns)
        idx_lo = tuple(idx_lo)
        idx_hi = [slice(None)] * D.ndim
        idx_hi[ax] = slice(D.shape[ax] - ns, D.shape[ax])
        idx_hi = tuple(idx_hi)

        d_lo = D[idx_lo]
        feed_lo = self.a_lo * d_lo if mask_lo is None else mask_lo * self.a_lo * d_lo
        new_lo = self.b_lo * psi_lo + feed_lo
        D = D.at[idx_lo].set(d_lo + new_lo)
        d_hi = D[idx_hi]
        feed_hi = self.a_hi * d_hi if mask_hi is None else mask_hi * self.a_hi * d_hi
        new_hi = self.b_hi * psi_hi + feed_hi
        D = D.at[idx_hi].set(d_hi + new_hi)
        return D, (new_lo, new_hi)


def _build_cpml_profiles_np(shape, npml, dx, dt, cmax, reflection_limit):
    """Like _build_cpml_profiles but with numpy leaves (for pallas closures)."""
    out = []
    ns = npml + 2
    for axis, n in enumerate(shape):
        prof = cpml_profiles(n, npml, dx, dt, cmax, reflection_limit)
        entry = {}
        for stag in ("int", "half"):
            b = prof[f"b_{stag}"]
            a = prof[f"a_{stag}"]
            entry[stag] = {
                "b_lo": b[:ns], "a_lo": a[:ns], "b_hi": b[-ns:], "a_hi": a[-ns:],
            }
        out.append(entry)
    return out


def _build_cpml_profiles(shape, npml, dx, dt, cmax, reflection_limit):
    """Per-axis slab-trimmed (b, a) coefficient sets, device-ready."""
    out = []
    ns = npml + 2
    for axis, n in enumerate(shape):
        prof = cpml_profiles(n, npml, dx, dt, cmax, reflection_limit)
        entry = {}
        for stag in ("int", "half"):
            b = prof[f"b_{stag}"]
            a = prof[f"a_{stag}"]
            entry[stag] = {
                "b_lo": _axis_reshape(jnp.asarray(b[:ns]), axis),
                "a_lo": _axis_reshape(jnp.asarray(a[:ns]), axis),
                "b_hi": _axis_reshape(jnp.asarray(b[-ns:]), axis),
                "a_hi": _axis_reshape(jnp.asarray(a[-ns:]), axis),
            }
        out.append(entry)
    return out


# ---------------------------------------------------------------------------
# SLS (standard linear solid) coefficient tuning
# ---------------------------------------------------------------------------


def sls_coefficients(materials: np.ndarray, frequency: float, dt: float):
    """Per-material solver coefficients with exact carrier-frequency tuning.

    materials: (M, 5) [rho, c_long, c_shear, att_long (Np/m), att_shear].
    Returns dict of (M,) float64 arrays:
      pi_u, mu_u    unrelaxed moduli factors used in the stress update
      c_rp, c_rs    memory-variable feed coefficients (include dt folding)
      b_r           memory decay factor
      rho_inv
      viscous       True if any material has attenuation
    """
    m = np.asarray(materials, np.float64)
    rho, cl, cs, al, ash = m[:, 0], m[:, 1], m[:, 2], m[:, 3], m[:, 4]
    omega = 2 * np.pi * frequency

    def modulus(c, alpha):
        """Complex modulus with loss angle from (c, alpha) at omega."""
        q = alpha * c / omega
        s = (1.0 / np.where(c > 0, c, 1.0)) * (1.0 - 1j * q)  # complex slowness
        M = rho / s**2
        return np.where(c > 0, M, 0.0)

    Mp = modulus(cl, al)  # P modulus rho*cl^2 e^{i delta_p}
    Ms = modulus(cs, ash)

    # shared tau_sigma per material from the P loss angle
    delta_p = np.angle(Mp + (Mp == 0))
    x = np.tan(np.pi / 4 + delta_p / 2)  # omega*tau_eps_p
    tau_sig = 1.0 / (omega * x)
    tau_eps_p = x / omega

    # S relaxation time chosen to hit the S loss angle with shared tau_sigma
    delta_s = np.angle(Ms + (Ms == 0))
    tau_eps_s = np.tan(delta_s + np.arctan(omega * tau_sig)) / omega
    tau_eps_s = np.where(cs > 0, tau_eps_s, tau_sig)

    def relaxed(M_target, tau_eps):
        F = (1 + 1j * omega * tau_eps) / (1 + 1j * omega * tau_sig)
        MR = np.real(M_target / F)
        return MR

    Pi_R = relaxed(Mp, tau_eps_p)
    Mu_R = relaxed(Ms, tau_eps_s)

    tp = tau_eps_p / tau_sig
    ts = tau_eps_s / tau_sig
    pi_u = Pi_R * tp
    mu_u = Mu_R * ts

    # memory update: r^{n+1} = b_r r^n - a_r * phi,
    #   phi = c_rp * theta_dot - 2 c_rs * (theta_dot - d v_i/d x_i) etc.
    half = dt / (2.0 * tau_sig)
    b_r = (1.0 - half) / (1.0 + half)
    a_r = dt / (1.0 + half)
    c_rp = Pi_R * (tp - 1.0) / tau_sig * a_r / dt  # folded so phi*dt later
    c_rs = Mu_R * (ts - 1.0) / tau_sig * a_r / dt
    # snap lossless materials to exactly zero feed (kills fp noise from tan(pi/4))
    c_rp = np.where(al > 0, c_rp, 0.0)
    c_rs = np.where(ash > 0, c_rs, 0.0)

    return {
        "pi_u": pi_u,
        "mu_u": mu_u,
        "c_rp": c_rp * dt,
        "c_rs": c_rs * dt,
        "b_r": b_r,
        "rho_inv": 1.0 / rho,
        "viscous": bool(np.any(al > 0) or np.any(ash > 0)),
    }


# ---------------------------------------------------------------------------
# simulation setup & run
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class FDTDGrid:
    shape: tuple  # (N1, N2, N3)
    dx: float
    dt: float
    n_steps: int
    frequency: float
    npml: int = 12
    reflection_limit: float = 1e-5
    sensor_start: int = 0  # first step of the DFT window
    source_plane_z: int = 13  # z-index of the CW source plane
    source_type: str = "velocity_plane"  # or "stress_point" / "velocity_volume"
    source_ijk: tuple = (0, 0, 0)  # for stress_point
    ramp_cycles: float = 4.0


def stable_dt(dx: float, cmax: float, cfl: float = 1.0) -> float:
    """4th-order staggered-grid 3-D stability bound."""
    return cfl * dx / (cmax * np.sqrt(3.0) * (abs(_C1) + abs(_C2)))


def _material_fields(mat_idx, coefs, has_shear=True):
    """Expand per-material coefficient tables to full-grid f32 fields (host)."""
    idx = np.asarray(mat_idx)
    keys = (
        ("pi_u", "mu_u", "c_rp", "c_rs", "b_r", "rho_inv")
        if has_shear
        else ("pi_u", "c_rp", "b_r", "rho_inv")
    )
    out = {}
    for k in keys:
        out[k] = np.asarray(coefs[k], np.float32)[idx]
    return out


_JIT_CACHE: dict = {}
_JIT_STATS = {"builds": 0, "hits": 0}


def fdtd_executable_stats(reset: bool = False) -> dict:
    """In-process jitted-executable reuse counters for ``run_fdtd``.

    ``builds`` counts fresh traces/compiles; ``hits`` counts calls served
    by an already-built executable. The reference's case loop is
    compile-free (`BabelIntegrationBASE.py:884-1037`); with shape
    bucketing (``build_domain(shape_bucket=...)``) a targets x
    frequencies x PPW matrix collapses to a handful of builds, and
    ``run_cases`` reports these counters in its summary."""
    out = dict(_JIT_STATS)
    if reset:
        _JIT_STATS["builds"] = 0
        _JIT_STATS["hits"] = 0
    return out


def _cached_executable(key, make):
    """Memoize jitted callables across run_fdtd calls.

    The key must capture everything baked into the trace as constants
    (grid, cmax-derived CPML profiles, viscosity, oz_scale, backend
    variant, fused-depth overrides); all field/material data flows in as
    traced arguments. Callers skip the cache when closures would capture
    per-case arrays (monitor indices)."""
    fn = _JIT_CACHE.get(key)
    if fn is None:
        _JIT_STATS["builds"] += 1
        fn = make()
        _JIT_CACHE[key] = fn
    else:
        _JIT_STATS["hits"] += 1
    return fn


def _pallas_with_vmem_fallback(call, max_shrink=3):
    """Run ``call(k_shrink)``, retrying with progressively shallower fused
    depths when the TPU compile fails on the VMEM budget.

    The auto-K VMEM models (``_fusedK_auto``/``_viscoK_auto``) are fitted
    to today's kernel layouts; if a layout change invalidates them the
    failure mode is a Mosaic out-of-VMEM error at compile time on the real
    chip only.  This compile-probe fallback turns that into a graceful
    K decrement instead of a production failure.
    """
    from .fdtd_pallas import is_vmem_oom

    for shrink in range(max_shrink + 1):
        try:
            return call(shrink)
        except Exception as e:  # noqa: BLE001 - classify then re-raise
            if shrink < max_shrink and is_vmem_oom(e):
                continue
            raise


def _build_indexed_materials(coefs, mat_idx, reflector_mask, n3):
    """Indexed-material inputs for the visco fusedK Pallas kernels.

    Returns ``(idx_i32 (N1,N2,N3), table (8,128) f32)`` with table rows
    [rho_inv, pi_u, mu_u, c_rp, c_rs, b_r], or ``None`` when the material
    count does not fit the single-vreg gather window (min(128, N3) lanes,
    minus the zero pad row the sharded driver uses as the dead material).
    Reflector (air-cavity) voxels get twin materials with zeroed moduli —
    the same fold ``_fold_reflector`` applies to expanded volumes, kept
    per-material so the kernel's table gather stays exact.
    """
    keys = ("rho_inv", "pi_u", "mu_u", "c_rp", "c_rs", "b_r")
    M = len(np.asarray(coefs["pi_u"]))
    cap = min(128, int(n3)) - 1
    # the in-kernel gather runs on 128-lane windows over the z axis; when
    # the windows overlap heavily the redundant gather work outweighs the
    # stream savings (measured on v5e: +10% at N3=240 [7% overlap] but
    # -19% at N3=192 [33% overlap]) -> only use indexed mode when the
    # window tiling is efficient
    n3i = int(n3)
    if n3i > 128:
        starts = list(range(0, n3i - 127, 128))
        if starts[-1] + 128 < n3i:
            starts.append(n3i - 128)
        if len(starts) * 128 > 1.15 * n3i:
            return None
    idx = np.asarray(mat_idx).astype(np.int32)
    has_refl = reflector_mask is not None and np.asarray(reflector_mask).any()
    n_rows = 2 * M if has_refl else M
    if n_rows > cap:
        return None
    tab = np.zeros((8, 128), np.float32)
    for r, k in enumerate(keys):
        v = np.asarray(coefs[k], np.float32)
        tab[r, :M] = v
        if has_refl:
            tab[r, M:2 * M] = v if k in ("rho_inv", "b_r") else 0.0
    if has_refl:
        idx = np.where(np.asarray(reflector_mask, bool), idx + M, idx)
    return idx.astype(np.int32), tab


def _fold_reflector(props_np, reflector_mask, has_shear):
    """Fold a pressure-release reflector mask into the modulus fields.

    The reference passes air cavities as a ``ReflectorMask`` whose voxels are
    forced to zero stress every step (`BabelIntegrationBASE.py:2365`). With
    zero initial conditions that is exactly equivalent to zeroing the moduli
    (pi_u/mu_u) and the relaxation feeds (c_rp/c_rs) at those voxels: stress
    and pressure then stay identically zero there while velocities still
    evolve against the zero-stress (pressure-release) surface. Folding into
    the material fields makes the reflector free on EVERY backend — XLA,
    sharded, and all fused Pallas kernels — with no extra HBM stream.
    """
    keep = 1.0 - np.asarray(reflector_mask).astype(np.float32)
    props_np["pi_u"] = props_np["pi_u"] * keep
    props_np["c_rp"] = props_np["c_rp"] * keep
    if has_shear:
        props_np["mu_u"] = props_np["mu_u"] * keep
        props_np["c_rs"] = props_np["c_rs"] * keep


def _make_step_fn(grid: FDTDGrid, profiles, viscous, has_shear, oz_scale, comm,
                  extras=(), monitor_idx=None):
    """Build the per-step update closure (traced once under scan).

    ``comm`` (parallel.halo.DomainComm) supplies ghost planes for the
    x-derivatives, so the same closure serves single-device runs (zero ghost)
    and shard_map domain decomposition (ppermute halos).

    ``extras``: optional RMS/peak field maps beyond the carrier DFT, named
    like the reference's ``SelMapsRMSPeakList`` entries ("Pressure_rms",
    "Vx_peak", "Sigmaxx_rms", ...; `BabelIntegrationBASE.py:2338-2429`).
    ``monitor_idx``: flat voxel indices whose pressure time series is
    emitted as a scan output (the reference's ``SensorOutput`` capability).
    """
    dt_dx = grid.dt / grid.dx
    omega = 2.0 * np.pi * grid.frequency
    zsrc = grid.source_plane_z

    cp = {}

    def get_cpml(name, axis, staggered):
        cp[name] = _CPML(axis, staggered, profiles, grid.npml)
        return cp[name]

    # velocity-update derivative fields (stress derivatives)
    c_sxx_x = get_cpml("sxx_x", 0, True)
    c_sxy_y = get_cpml("sxy_y", 1, False)
    c_sxz_z = get_cpml("sxz_z", 2, False)
    c_sxy_x = get_cpml("sxy_x", 0, False)
    c_syy_y = get_cpml("syy_y", 1, True)
    c_syz_z = get_cpml("syz_z", 2, False)
    c_sxz_x = get_cpml("sxz_x", 0, False)
    c_syz_y = get_cpml("syz_y", 1, False)
    c_szz_z = get_cpml("szz_z", 2, True)
    # stress-update derivative fields (velocity derivatives)
    c_vx_x = get_cpml("vx_x", 0, False)
    c_vy_y = get_cpml("vy_y", 1, False)
    c_vz_z = get_cpml("vz_z", 2, False)
    c_vx_y = get_cpml("vx_y", 1, True)
    c_vy_x = get_cpml("vy_x", 0, True)
    c_vx_z = get_cpml("vx_z", 2, True)
    c_vz_x = get_cpml("vz_x", 0, True)
    c_vy_z = get_cpml("vy_z", 2, True)
    c_vz_y = get_cpml("vz_y", 1, True)

    def init_cpml_state(shape, zeros_fn=None):
        return {name: c.init_state(shape, zeros_fn) for name, c in cp.items()}

    # y derivatives need ghost planes only under y-sharding (static choice so
    # the single-device trace is unchanged)
    if comm.sharded_y:
        dpy = lambda f: comm.crop_y(d_plus(comm.pad_y(f), 1))
        dmy = lambda f: comm.crop_y(d_minus(comm.pad_y(f), 1))
    else:
        dpy = lambda f: d_plus(f, 1)
        dmy = lambda f: d_minus(f, 1)

    def step(carry, n):
        s = carry
        f = s["fields"]
        psi = s["psi"]
        p = s["props"]
        vx, vy, vz = f["vx"], f["vy"], f["vz"]
        sxx, syy, szz = f["sxx"], f["syy"], f["szz"]
        sxy, sxz, syz = f["sxy"], f["sxz"], f["syz"]

        t = n.astype(jnp.float32) * grid.dt
        m_lo, m_hi = comm.edge_masks()
        my_lo, my_hi = comm.edge_masks_y()

        # ---- velocity update ----
        sxx_p = comm.pad_x(sxx)
        sxy_p = comm.pad_x(sxy)
        sxz_p = comm.pad_x(sxz)
        dsxx_x, psi["sxx_x"] = c_sxx_x.apply(
            comm.crop_x(d_plus(sxx_p, 0)), psi["sxx_x"], m_lo, m_hi
        )
        dsxy_y, psi["sxy_y"] = c_sxy_y.apply(
            dmy(sxy), psi["sxy_y"], my_lo, my_hi
        )
        dsxz_z, psi["sxz_z"] = c_sxz_z.apply(d_minus(sxz, 2), psi["sxz_z"])
        vx = vx + dt_dx * p["rho_inv"] * (dsxx_x + dsxy_y + dsxz_z)

        dsxy_x, psi["sxy_x"] = c_sxy_x.apply(
            comm.crop_x(d_minus(sxy_p, 0)), psi["sxy_x"], m_lo, m_hi
        )
        dsyy_y, psi["syy_y"] = c_syy_y.apply(
            dpy(syy), psi["syy_y"], my_lo, my_hi
        )
        dsyz_z, psi["syz_z"] = c_syz_z.apply(d_minus(syz, 2), psi["syz_z"])
        vy = vy + dt_dx * p["rho_inv"] * (dsxy_x + dsyy_y + dsyz_z)

        dsxz_x, psi["sxz_x"] = c_sxz_x.apply(
            comm.crop_x(d_minus(sxz_p, 0)), psi["sxz_x"], m_lo, m_hi
        )
        dsyz_y, psi["syz_y"] = c_syz_y.apply(
            dmy(syz), psi["syz_y"], my_lo, my_hi
        )
        dszz_z, psi["szz_z"] = c_szz_z.apply(d_plus(szz, 2), psi["szz_z"])
        vz = vz + dt_dx * p["rho_inv"] * (dsxz_x + dsyz_y + dszz_z)

        # ---- source injection ----
        ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt
        ramp = jnp.where(
            n < ramp_steps,
            0.5 * (1.0 - jnp.cos(np.pi * n / ramp_steps)),
            1.0,
        ).astype(jnp.float32)
        if grid.source_type == "velocity_plane":
            amp2d = s["src_amp"]
            ph2d = s["src_phase"]
            sval = amp2d * jnp.sin(omega * t + ph2d) * ramp * oz_scale
            plane = vz[:, :, zsrc]
            vz = vz.at[:, :, zsrc].set(jnp.where(amp2d > 0, sval, plane))
        elif grid.source_type == "velocity_volume":
            # dome transducers: the whole array sits inside the domain and
            # drives particle velocity along per-voxel normals
            # (`BabelIntegrationDOME_PHASEDARRAY.py:344-407` capability)
            amp3 = s["src_amp3d"]
            sv = amp3 * jnp.sin(omega * t + s["src_phase3d"]) * ramp * oz_scale
            on = amp3 > 0
            vx = jnp.where(on, sv * s["src_ox"], vx)
            vy = jnp.where(on, sv * s["src_oy"], vy)
            vz = jnp.where(on, sv * s["src_oz"], vz)
        carry_fields = dict(f)

        # ---- stress update ----
        vx_p = comm.pad_x(vx)
        vy_p = comm.pad_x(vy)
        vz_p = comm.pad_x(vz)
        dvx_x, psi["vx_x"] = c_vx_x.apply(
            comm.crop_x(d_minus(vx_p, 0)), psi["vx_x"], m_lo, m_hi
        )
        dvy_y, psi["vy_y"] = c_vy_y.apply(
            dmy(vy), psi["vy_y"], my_lo, my_hi
        )
        dvz_z, psi["vz_z"] = c_vz_z.apply(d_minus(vz, 2), psi["vz_z"])
        theta = dvx_x + dvy_y + dvz_z

        pi_u = p["pi_u"]
        mu_u = p["mu_u"]

        if viscous:
            b_r = p["b_r"]
            c_rp = p["c_rp"]
            c_rs = p["c_rs"]
            rxx, ryy, rzz = f["rxx"], f["ryy"], f["rzz"]
            phi_xx = c_rp * theta - 2.0 * c_rs * (theta - dvx_x)
            phi_yy = c_rp * theta - 2.0 * c_rs * (theta - dvy_y)
            phi_zz = c_rp * theta - 2.0 * c_rs * (theta - dvz_z)
            # note: phi includes the 1/dx from derivative scaling below
            new_rxx = b_r * rxx - phi_xx / grid.dx
            new_ryy = b_r * ryy - phi_yy / grid.dx
            new_rzz = b_r * rzz - phi_zz / grid.dx
            sxx = sxx + dt_dx * (pi_u * theta - 2 * mu_u * (theta - dvx_x)) + (
                grid.dt * 0.5
            ) * (new_rxx + rxx)
            syy = syy + dt_dx * (pi_u * theta - 2 * mu_u * (theta - dvy_y)) + (
                grid.dt * 0.5
            ) * (new_ryy + ryy)
            szz = szz + dt_dx * (pi_u * theta - 2 * mu_u * (theta - dvz_z)) + (
                grid.dt * 0.5
            ) * (new_rzz + rzz)
            carry_fields.update(rxx=new_rxx, ryy=new_ryy, rzz=new_rzz)
        else:
            sxx = sxx + dt_dx * (pi_u * theta - 2 * mu_u * (theta - dvx_x))
            syy = syy + dt_dx * (pi_u * theta - 2 * mu_u * (theta - dvy_y))
            szz = szz + dt_dx * (pi_u * theta - 2 * mu_u * (theta - dvz_z))

        # shear stresses (skip entirely for fluid-only media)
        if has_shear:
            dvx_y, psi["vx_y"] = c_vx_y.apply(
                dpy(vx), psi["vx_y"], my_lo, my_hi
            )
            dvy_x, psi["vy_x"] = c_vy_x.apply(
                comm.crop_x(d_plus(vy_p, 0)), psi["vy_x"], m_lo, m_hi
            )
            dvx_z, psi["vx_z"] = c_vx_z.apply(d_plus(vx, 2), psi["vx_z"])
            dvz_x, psi["vz_x"] = c_vz_x.apply(
                comm.crop_x(d_plus(vz_p, 0)), psi["vz_x"], m_lo, m_hi
            )
            dvy_z, psi["vy_z"] = c_vy_z.apply(d_plus(vy, 2), psi["vy_z"])
            dvz_y, psi["vz_y"] = c_vz_y.apply(
                dpy(vz), psi["vz_y"], my_lo, my_hi
            )
            exy = dvx_y + dvy_x
            exz = dvx_z + dvz_x
            eyz = dvy_z + dvz_y
            if viscous:
                rxy, rxz, ryz = f["rxy"], f["rxz"], f["ryz"]
                new_rxy = b_r * rxy - c_rs * exy / grid.dx
                new_rxz = b_r * rxz - c_rs * exz / grid.dx
                new_ryz = b_r * ryz - c_rs * eyz / grid.dx
                sxy = sxy + dt_dx * mu_u * exy + grid.dt * 0.5 * (new_rxy + rxy)
                sxz = sxz + dt_dx * mu_u * exz + grid.dt * 0.5 * (new_rxz + rxz)
                syz = syz + dt_dx * mu_u * eyz + grid.dt * 0.5 * (new_ryz + ryz)
                carry_fields.update(rxy=new_rxy, rxz=new_rxz, ryz=new_ryz)
            else:
                sxy = sxy + dt_dx * mu_u * exy
                sxz = sxz + dt_dx * mu_u * exz
                syz = syz + dt_dx * mu_u * eyz

        if grid.source_type == "stress_point":
            i0, j0, k0 = grid.source_ijk
            i_loc = jnp.int32(i0) - comm.local_x_offset(sxx.shape[0])
            j_loc = jnp.int32(j0) - comm.local_y_offset(sxx.shape[1])
            in_range = (
                (i_loc >= 0) & (i_loc < sxx.shape[0])
                & (j_loc >= 0) & (j_loc < sxx.shape[1])
            ).astype(jnp.float32)
            i_c = jnp.clip(i_loc, 0, sxx.shape[0] - 1)
            j_c = jnp.clip(j_loc, 0, sxx.shape[1] - 1)
            sval = s["src_amp_point"] * jnp.sin(omega * t) * ramp * in_range
            sxx = sxx.at[i_c, j_c, k0].add(sval)
            syy = syy.at[i_c, j_c, k0].add(sval)
            szz = szz.at[i_c, j_c, k0].add(sval)

        # ---- carrier DFT + peak accumulation ----
        pressure = -(sxx + syy + szz) * (1.0 / 3.0)
        in_window = (n >= grid.sensor_start).astype(jnp.float32)
        cosw = jnp.cos(omega * t) * in_window
        sinw = jnp.sin(omega * t) * in_window
        acc_c = s["acc_cos"] + pressure * cosw
        acc_s = s["acc_sin"] + pressure * sinw
        peak = jnp.maximum(s["peak"], jnp.abs(pressure) * in_window)

        carry_fields.update(
            vx=vx, vy=vy, vz=vz, sxx=sxx, syy=syy, szz=szz, sxy=sxy, sxz=sxz, syz=syz
        )
        new_carry = dict(
            s,
            fields=carry_fields,
            psi=psi,
            acc_cos=acc_c,
            acc_sin=acc_s,
            peak=peak,
        )
        if extras:
            new_carry["extra"] = _update_extras(
                s["extra"], extras, in_window,
                Pressure=pressure, Vx=vx, Vy=vy, Vz=vz,
                Sigmaxx=sxx, Sigmayy=syy, Sigmazz=szz,
            )
        y = None
        if monitor_idx is not None:
            y = _monitor_gather(pressure, monitor_idx, comm)
        return new_carry, y

    return step, init_cpml_state


def _monitor_gather(pressure, monitor_idx, comm):
    """Sensor-point gather in GLOBAL (i, j, k) coordinates.

    Under domain decomposition each shard gathers the points it owns and a
    psum replicates the series (zeros elsewhere); single device reduces to
    a plain gather.
    """
    mi, mj, mk = monitor_idx
    i_loc = mi - comm.local_x_offset(pressure.shape[0])
    j_loc = mj - comm.local_y_offset(pressure.shape[1])
    own = (
        (i_loc >= 0) & (i_loc < pressure.shape[0])
        & (j_loc >= 0) & (j_loc < pressure.shape[1])
    ).astype(pressure.dtype)
    vals = pressure[
        jnp.clip(i_loc, 0, pressure.shape[0] - 1),
        jnp.clip(j_loc, 0, pressure.shape[1] - 1),
        mk,
    ]
    return comm.psum(vals * own)



def _update_extras(ex, extras, in_window, **fields):
    """Accumulate the optional RMS/peak maps (``SelMapsRMSPeakList`` parity,
    `BabelIntegrationBASE.py:2338-2429`): ``<Field>_rms`` sums squares over
    the sensor window (normalized to RMS after the scan), ``<Field>_peak``
    tracks the running max of |field|."""
    ex = dict(ex)
    for name, v in fields.items():
        if name + "_rms" in extras:
            ex[name + "_rms"] = ex[name + "_rms"] + v * v * in_window
        if name + "_peak" in extras:
            ex[name + "_peak"] = jnp.maximum(
                ex[name + "_peak"], jnp.abs(v) * in_window
            )
    return ex


def _make_fluid_step_fn(grid: FDTDGrid, profiles, viscous, oz_scale, comm,
                        extras=(), monitor_idx=None):
    """Specialized acoustic (fluid) stepper: state (p, vx, vy, vz[, r]).

    When no material carries shear (the CT-mapping mode disables shear
    entirely, `BabelIntegrationBASE.py:1343-1351`), the viscoelastic system
    collapses to sxx=syy=szz=-p with one shared memory variable: 5 state
    arrays and 6 CPML'd derivatives instead of 15 and 18 — a ~3x cut in HBM
    traffic, which bounds this solver.
    """
    dt_dx = grid.dt / grid.dx
    omega = 2.0 * np.pi * grid.frequency
    zsrc = grid.source_plane_z

    cp = {}

    def get_cpml(name, axis, staggered):
        cp[name] = _CPML(axis, staggered, profiles, grid.npml)
        return cp[name]

    c_p_x = get_cpml("p_x", 0, True)
    c_p_y = get_cpml("p_y", 1, True)
    c_p_z = get_cpml("p_z", 2, True)
    c_vx_x = get_cpml("vx_x", 0, False)
    c_vy_y = get_cpml("vy_y", 1, False)
    c_vz_z = get_cpml("vz_z", 2, False)

    def init_cpml_state(shape, zeros_fn=None):
        return {name: c.init_state(shape, zeros_fn) for name, c in cp.items()}

    if comm.sharded_y:
        dpy = lambda f: comm.crop_y(d_plus(comm.pad_y(f), 1))
        dmy = lambda f: comm.crop_y(d_minus(comm.pad_y(f), 1))
    else:
        dpy = lambda f: d_plus(f, 1)
        dmy = lambda f: d_minus(f, 1)

    def step(carry, n):
        s = carry
        f = s["fields"]
        psi = s["psi"]
        pr = s["props"]
        p = f["p"]
        vx, vy, vz = f["vx"], f["vy"], f["vz"]

        t = n.astype(jnp.float32) * grid.dt
        m_lo, m_hi = comm.edge_masks()
        my_lo, my_hi = comm.edge_masks_y()

        # ---- velocity update: v_i -= dt/rho * d+(p, i) ----
        p_pad = comm.pad_x(p)
        dp_x, psi["p_x"] = c_p_x.apply(
            comm.crop_x(d_plus(p_pad, 0)), psi["p_x"], m_lo, m_hi
        )
        dp_y, psi["p_y"] = c_p_y.apply(dpy(p), psi["p_y"], my_lo, my_hi)
        dp_z, psi["p_z"] = c_p_z.apply(d_plus(p, 2), psi["p_z"])
        rho_inv = pr["rho_inv"]
        vx = vx - dt_dx * rho_inv * dp_x
        vy = vy - dt_dx * rho_inv * dp_y
        vz = vz - dt_dx * rho_inv * dp_z

        # ---- source injection ----
        ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt
        ramp = jnp.where(
            n < ramp_steps,
            0.5 * (1.0 - jnp.cos(np.pi * n / ramp_steps)),
            1.0,
        ).astype(jnp.float32)
        if grid.source_type == "velocity_plane":
            amp2d = s["src_amp"]
            ph2d = s["src_phase"]
            sval = amp2d * jnp.sin(omega * t + ph2d) * ramp * oz_scale
            plane = vz[:, :, zsrc]
            vz = vz.at[:, :, zsrc].set(jnp.where(amp2d > 0, sval, plane))
        elif grid.source_type == "velocity_volume":
            amp3 = s["src_amp3d"]
            sv = amp3 * jnp.sin(omega * t + s["src_phase3d"]) * ramp * oz_scale
            on = amp3 > 0
            vx = jnp.where(on, sv * s["src_ox"], vx)
            vy = jnp.where(on, sv * s["src_oy"], vy)
            vz = jnp.where(on, sv * s["src_oz"], vz)

        # ---- pressure update ----
        vx_pad = comm.pad_x(vx)
        dvx_x, psi["vx_x"] = c_vx_x.apply(
            comm.crop_x(d_minus(vx_pad, 0)), psi["vx_x"], m_lo, m_hi
        )
        dvy_y, psi["vy_y"] = c_vy_y.apply(dmy(vy), psi["vy_y"], my_lo, my_hi)
        dvz_z, psi["vz_z"] = c_vz_z.apply(d_minus(vz, 2), psi["vz_z"])
        theta = dvx_x + dvy_y + dvz_z

        carry_fields = dict(f)
        if viscous:
            r = f["r"]
            new_r = pr["b_r"] * r - pr["c_rp"] * theta / grid.dx
            p = p - dt_dx * pr["pi_u"] * theta - grid.dt * 0.5 * (new_r + r)
            carry_fields["r"] = new_r
        else:
            p = p - dt_dx * pr["pi_u"] * theta

        if grid.source_type == "stress_point":
            i0, j0, k0 = grid.source_ijk
            i_loc = jnp.int32(i0) - comm.local_x_offset(p.shape[0])
            j_loc = jnp.int32(j0) - comm.local_y_offset(p.shape[1])
            in_range = (
                (i_loc >= 0) & (i_loc < p.shape[0])
                & (j_loc >= 0) & (j_loc < p.shape[1])
            ).astype(jnp.float32)
            i_c = jnp.clip(i_loc, 0, p.shape[0] - 1)
            j_c = jnp.clip(j_loc, 0, p.shape[1] - 1)
            sval = s["src_amp_point"] * jnp.sin(omega * t) * ramp * in_range
            p = p.at[i_c, j_c, k0].add(-sval)

        # ---- carrier DFT + peak accumulation ----
        in_window = (n >= grid.sensor_start).astype(jnp.float32)
        cosw = jnp.cos(omega * t) * in_window
        sinw = jnp.sin(omega * t) * in_window
        acc_c = s["acc_cos"] + p * cosw
        acc_s = s["acc_sin"] + p * sinw
        peak = jnp.maximum(s["peak"], jnp.abs(p) * in_window)

        carry_fields.update(p=p, vx=vx, vy=vy, vz=vz)
        new_carry = dict(
            s,
            fields=carry_fields,
            psi=psi,
            acc_cos=acc_c,
            acc_sin=acc_s,
            peak=peak,
        )
        if extras:
            # fluid media: sigma_xx = sigma_yy = sigma_zz = -p
            new_carry["extra"] = _update_extras(
                s["extra"], extras, in_window,
                Pressure=p, Vx=vx, Vy=vy, Vz=vz,
                Sigmaxx=-p, Sigmayy=-p, Sigmazz=-p,
            )
        y = None
        if monitor_idx is not None:
            y = _monitor_gather(p, monitor_idx, comm)
        return new_carry, y

    return step, init_cpml_state


def _simulate_local(props, src_amp, src_phase, point_amp, grid, profiles,
                    viscous, has_shear, oz_scale, comm, vary_axes=(),
                    extras=(), monitor_idx=None, capture=None):
    """Run the scan on (possibly shard-local) blocks; returns accumulators.

    ``vary_axes``: extra mesh axes the inputs vary over (e.g. the 'case'
    fan-out axis) so the zero-initialized scan carry gets matching
    device-varying types.

    With ``extras``/``monitor_idx`` (single-device XLA path only) the return
    grows to (acc_c, acc_s, peak, extra_maps, monitor_series).
    """
    if has_shear:
        step, init_cpml_state = _make_step_fn(
            grid, profiles, viscous, has_shear, oz_scale, comm,
            extras=extras, monitor_idx=monitor_idx,
        )
    else:
        step, init_cpml_state = _make_fluid_step_fn(
            grid, profiles, viscous, oz_scale, comm,
            extras=extras, monitor_idx=monitor_idx,
        )
    shape = props["pi_u"].shape

    def zeros_fn(sh=shape):
        z = jnp.zeros(sh, jnp.float32)
        names = comm.axis_names() + tuple(vary_axes)
        if names:
            # mark as device-varying so the scan carry typing is consistent
            z = jax.lax.pcast(z, names, to="varying")
        return z

    zeros = zeros_fn
    if has_shear:
        fields = {
            k: zeros()
            for k in ("vx", "vy", "vz", "sxx", "syy", "szz", "sxy", "sxz", "syz")
        }
        if viscous:
            fields.update({k: zeros() for k in ("rxx", "ryy", "rzz", "rxy", "rxz", "ryz")})
    else:
        fields = {k: zeros() for k in ("p", "vx", "vy", "vz")}
        if viscous:
            fields["r"] = zeros()
    carry = {
        "fields": fields,
        "psi": init_cpml_state(shape, zeros_fn),
        "props": props,
        "acc_cos": zeros(),
        "acc_sin": zeros(),
        "peak": zeros(),
        "src_amp": src_amp,
        "src_phase": src_phase,
        "src_amp_point": point_amp,
    }
    if grid.source_type == "velocity_volume":
        for k in ("src_amp3d", "src_phase3d", "src_ox", "src_oy", "src_oz"):
            carry[k] = props.pop(k)
    if extras:
        carry["extra"] = {name: zeros() for name in extras}
    if capture is None:
        carry, ys = jax.lax.scan(step, carry, jnp.arange(grid.n_steps))
        if not extras and monitor_idx is None:
            return carry["acc_cos"], carry["acc_sin"], carry["peak"]
        return (
            carry["acc_cos"], carry["acc_sin"], carry["peak"],
            carry.get("extra", {}), ys,
        )

    # raw time-series capture (the reference's full SensorOutput record,
    # `BabelIntegrationBASE.py:2279-2295,2460-2538`): the scan runs in
    # three segments and the middle one emits the pressure of every
    # ``sub``-th step over the capture gather set
    t0, t1, sub, cap_idx = capture
    pressure_of = (
        (lambda f: f["p"])
        if not has_shear
        else (lambda f: -(f["sxx"] + f["syy"] + f["szz"]) * (1.0 / 3.0))
    )

    def cap_step(carry, ns):
        def body(c, n):
            c2, _ = step(c, n)
            return c2, None
        carry, _ = jax.lax.scan(body, carry, ns)
        p = pressure_of(carry["fields"])
        if cap_idx is None:
            return carry, p
        return carry, p[cap_idx]

    if t0 > 0:
        carry, _ = jax.lax.scan(
            lambda c, n: (step(c, n)[0], None), carry, jnp.arange(t0)
        )
    n_groups = (t1 - t0) // sub
    groups = t0 + jnp.arange(n_groups * sub).reshape(n_groups, sub)
    carry, series = jax.lax.scan(cap_step, carry, groups)
    rem = t0 + n_groups * sub
    if rem < grid.n_steps:
        carry, _ = jax.lax.scan(
            lambda c, n: (step(c, n)[0], None), carry,
            jnp.arange(rem, grid.n_steps),
        )
    return carry["acc_cos"], carry["acc_sin"], carry["peak"], series


def run_fdtd(
    mat_idx: np.ndarray,
    materials: np.ndarray,
    grid: FDTDGrid,
    source_amp: np.ndarray | None = None,
    source_phase: np.ndarray | None = None,
    point_amp: float = 0.0,
    mesh=None,
    backend: str = "auto",
    reflector_mask=None,
    volume_source: dict | None = None,
    sel_maps: tuple = (),
    monitor_ijk: np.ndarray | None = None,
    sensor_subsampling: int = 1,
    fuse_steps: int | None = None,
):
    """Run the CW simulation and return carrier amplitude/phase/peak maps.

    Parameters
    ----------
    mat_idx : (N1,N2,N3) uint material index volume.
    materials : (M,5) [rho, c_l, c_s, alpha_l, alpha_s].
    grid : FDTDGrid.
    source_amp, source_phase : (N1,N2) CW plane-source amplitude (Pa) and
        phase, typically |u|, angle(u) of the Rayleigh field at the source
        plane (`BabelIntegrationSingle.py:313-346` contract).
    point_amp : stress amplitude for ``stress_point`` sources (refocusing
        backpropagation, `BabelIntegrationBASE.py:2374`).
    mesh : optional ``jax.sharding.Mesh`` with axis name 'x' (1-D) or axis
        names ('x', 'y') (2-D plane decomposition); the domain is decomposed
        along its first (and second) grid axis with ppermute halo exchange
        per step. Requires N1 (N2) divisible by the mesh axis size and the
        local extent >= npml+2 (so each PML slab lives on one edge shard).
        The pallas backend supports 1-D x decomposition only.
    backend : 'auto' | 'xla' | 'pallas'. 'pallas' uses the fused
        streaming-slab TPU kernels (plane AND stress-point sources, fluid
        and shear media, reflector masks); 'auto' picks pallas on a TPU
        backend whenever the source type allows (volumetric dome sources
        and sel_maps/monitor capture stay on the XLA path).
    reflector_mask : optional bool volume of air-cavity voxels forced to
        zero stress (the reference's ``ReflectorMask``,
        `BabelIntegrationBASE.py:2365`). Folded into the modulus fields
        (see ``_fold_reflector``) so it is free on every backend.

    sel_maps : optional extra output maps, named ``<Field>_rms`` /
        ``<Field>_peak`` with Field in {Pressure, Vx, Vy, Vz, Sigmaxx,
        Sigmayy, Sigmazz} — the reference's ``SelMapsRMSPeakList`` +
        ``SelRMSorPeak`` capability (`BabelIntegrationBASE.py:2338-2429`).
    monitor_ijk : optional (K,3) voxel indices whose pressure time series is
        returned (the reference's ``SensorOutput``/``SensorMap`` record;
        full-volume time series are deliberately not materialized — the
        carrier DFT is accumulated in-kernel instead).
    fuse_steps : optional pinned fused depth for the pallas kernels
        (default: deepest K that fits VMEM). Pinning the SAME K on a
        sharded and an unsharded run makes them bit-comparable: different
        fused depths produce different (equally valid) compiler
        instruction schedules whose FMA contractions can differ by an ULP
        for volumetric phased drives.
    sensor_subsampling : cadence for the monitor series (the reference's
        ``SensorSubSampling``); samples start at ``grid.sensor_start``.

    ``sel_maps`` limited to ``Pressure_rms``/``Pressure_peak`` and
    ``monitor_ijk`` stay on the fused Pallas fast path for unsharded fluid
    runs (the RMS accumulator is fused into the DFT sweeps; the monitor
    series is gathered once per sweep, so its cadence is the fused depth
    and ``sensor_subsampling`` is ignored there — ``sensor_times`` always
    reports the true sample times). Velocity/stress maps, shear media, and
    sharded runs use the XLA path (extra maps shard like the volume,
    monitor series are psum'd to a replicated vector).

    Returns
    -------
    dict with 'p_amp' (Pa), 'p_phase' (rad, FFT-bin convention of the
    reference), 'peak' (Pa), each (N1,N2,N3) float32 numpy arrays; plus one
    entry per requested ``sel_maps`` name, and 'sensor_series' (K, nT) +
    'sensor_times' (nT,) when ``monitor_ijk`` is given.
    """
    from ..parallel.halo import DomainComm

    sel_maps = tuple(sel_maps)
    allowed = {
        f"{f}_{k}"
        for f in ("Pressure", "Vx", "Vy", "Vz", "Sigmaxx", "Sigmayy", "Sigmazz")
        for k in ("rms", "peak")
    }
    bad = set(sel_maps) - allowed
    if bad:
        raise ValueError(f"unknown sel_maps entries: {sorted(bad)}")
    want_extras = bool(sel_maps) or monitor_ijk is not None
    # Pressure maps + monitor capture are fused into the fluid fusedK DFT
    # kernel (`BabelIntegrationBASE.py:2338-2429` SelMapsRMSPeakList parity
    # without abandoning the fast path); everything else (velocity/stress
    # maps, shear media, sharded runs) falls back to the XLA scan
    pallas_extras_wanted = (
        want_extras
        and set(sel_maps) <= {"Pressure_rms", "Pressure_peak"}
        and mesh is None
        and backend in ("auto", "pallas")
        and grid.source_type in ("velocity_plane", "stress_point")
    )
    if want_extras and not pallas_extras_wanted:
        if backend == "pallas":
            raise ValueError(
                "only Pressure_rms/Pressure_peak sel_maps and monitor_ijk "
                "run on the (unsharded, fluid) pallas path; other maps are "
                "served by the XLA backend"
            )
        backend = "xla"

    mats = np.asarray(materials, np.float64)
    coefs = sls_coefficients(mats, grid.frequency, grid.dt)
    has_shear = bool(np.any(mats[:, 2] > 0))
    viscous = coefs["viscous"]

    # Zero-shear volumetric sources (dome in CT mode — shear is disabled
    # there, `BabelIntegrationBASE.py:1343-1351`) run through the FLUID
    # fusedK kernel with in-kernel dome injection — ~3x the visco
    # volumetric rate the round-4 zero-shear promotion used, and it
    # shards (the 670 kHz DomeTx CT workload, `README.md:80`, gets both
    # the fast kernel and the mesh).

    props_np = _material_fields(mat_idx, coefs, has_shear)

    rho0, c0 = mats[0, 0], mats[0, 1]
    oz_scale = 1.0 / (rho0 * c0)  # pressure -> particle velocity (plane wave)

    cmax = max(mats[:, 1].max(), mats[:, 2].max())
    profiles = _build_cpml_profiles(
        grid.shape, grid.npml, grid.dx, grid.dt, cmax, grid.reflection_limit
    )

    src_amp = np.asarray(
        source_amp if source_amp is not None else np.zeros(grid.shape[:2]), np.float32
    )
    src_phase = np.asarray(
        source_phase if source_phase is not None else np.zeros(grid.shape[:2]),
        np.float32,
    )

    vol_src_np = None
    if volume_source is not None:
        vol_src_np = {
            k: np.asarray(volume_source[k], np.float32)
            for k in ("amp", "phase", "ox", "oy", "oz")
        }

    if reflector_mask is not None:
        _fold_reflector(props_np, reflector_mask, has_shear)

    if mesh is not None:
        from ..parallel.halo import mesh_axis_sizes

        mesh_nx, mesh_ny = mesh_axis_sizes(mesh)
    else:
        mesh_nx = mesh_ny = 1

    use_pallas = False
    pallas_src_ok = grid.source_type in ("velocity_plane", "stress_point")
    mesh_on_tpu = (
        mesh is not None
        and next(iter(mesh.devices.flat)).platform == "tpu"
    )
    pallas_sharded = (
        mesh is not None
        and (backend == "pallas" or (backend == "auto" and mesh_on_tpu))
        and mesh_ny == 1  # pallas ghost-plane kernels decompose x only
        and (pallas_src_ok
             or (grid.source_type == "velocity_volume" and not has_shear))
    )
    if pallas_sharded and backend == "auto":
        # auto mode falls back to the XLA sharded path when the pallas
        # constraints (even local extent) don't hold, instead of raising
        n1_local, rem = divmod(grid.shape[0], max(mesh_nx, 1))
        if rem or n1_local % 2 or n1_local < grid.npml + 2:
            pallas_sharded = False
        elif grid.source_type == "velocity_volume":
            # sharded volumetric REQUIRES the fused overlap driver (the
            # 1-step ghost-exchange fallback has no volumetric injection)
            from .fdtd_pallas import _fusedK_auto, _sharded_fusedK_plan

            gl = dataclasses.replace(
                grid, shape=(n1_local,) + tuple(grid.shape[1:])
            )
            if _sharded_fusedK_plan(
                n1_local, 2, grid.npml, None, gl,
                auto_fn=functools.partial(_fusedK_auto, volume_src=True),
            ) is None:
                pallas_sharded = False
    # dome volumetric sources run fused: zero-shear (CT) media on the
    # fluid fusedK kernel (sharded included), shear media on the
    # (unsharded) visco volumetric kernel
    pallas_ok = mesh is None and (
        pallas_src_ok or grid.source_type == "velocity_volume"
    )
    if backend in ("auto", "pallas") and pallas_ok:
        plat = jax.devices()[0].platform
        use_pallas = backend == "pallas" or plat != "cpu"
    pallas_extras = False
    if want_extras:
        feasible = pallas_extras_wanted and use_pallas and not has_shear
        if feasible:
            from .fdtd_pallas import _fusedK_auto

            window = grid.n_steps - grid.sensor_start
            kd = _fusedK_auto(grid, 2, with_dft=True)
            feasible = any(window % k == 0 for k in range(3, kd + 1))
        if feasible:
            pallas_extras = True
        else:
            if backend == "pallas":
                raise ValueError(
                    "pallas sel_maps/monitor need a fluid medium and a "
                    "sensor window divisible by a fused depth >= 3"
                )
            backend = "xla"
            use_pallas = False
    if backend == "pallas" and not (use_pallas or pallas_sharded):
        raise ValueError(
            "pallas backend requires a velocity_plane or stress_point source"
        )

    if pallas_sharded:
        from jax.sharding import PartitionSpec as P

        from .fdtd_pallas import simulate_fluid_pallas, simulate_visco_pallas

        nb = 2
        n_shards = mesh.devices.size
        n1_local, rem = divmod(grid.shape[0], n_shards)
        if rem or n1_local % nb:
            raise ValueError(
                f"N1={grid.shape[0]} must divide into mesh size {n_shards} "
                f"with an even local extent"
            )
        if n1_local < grid.npml + 2:
            raise ValueError("shard too thin for the PML slab; reduce mesh size")
        profiles_np = _build_cpml_profiles_np(
            grid.shape, grid.npml, grid.dx, grid.dt, cmax,
            grid.reflection_limit,
        )
        grid_local = dataclasses.replace(
            grid, shape=(n1_local, grid.shape[1], grid.shape[2])
        )
        comm = DomainComm("x", n_shards)
        interpret = next(iter(mesh.devices.flat)).platform == "cpu"
        spec3 = P("x", None, None)
        spec2 = P("x", None)
        props = {k: jnp.asarray(v) for k, v in props_np.items()}
        if has_shear:
            indexed = _build_indexed_materials(
                coefs, mat_idx, reflector_mask, grid.shape[2]
            )
            extra_args, extra_specs = (), ()
            if indexed is not None:
                extra_args = (jnp.asarray(indexed[0]),
                              jnp.asarray(indexed[1]))
                extra_specs = (spec3, P())

            def run_sharded_visco(pr, a, p, pa, *mats):
                mkw = (dict(mat_idx=mats[0], mat_table=mats[1])
                       if mats else {})
                return simulate_visco_pallas(
                    pr, a, p, pa,
                    grid=grid_local, profiles_np=profiles_np,
                    viscous=viscous, oz_scale=oz_scale, nb=nb,
                    comm=comm, interpret=interpret,
                    fuse_steps=fuse_steps, **mkw,
                )

            fn = jax.jit(
                jax.shard_map(
                    run_sharded_visco,
                    mesh=mesh,
                    in_specs=({k: spec3 for k in props_np}, spec2, spec2,
                              P()) + extra_specs,
                    out_specs=(spec3, spec3, spec3),
                    # pallas_call outputs carry no vma annotation
                    check_vma=False,
                )
            )
            acc_c, acc_s, peak = fn(
                props, jnp.asarray(src_amp), jnp.asarray(src_phase),
                jnp.float32(point_amp), *extra_args,
            )
        else:
            vol_in = ()
            vol_specs = ()
            if vol_src_np is not None:
                vs_j = {k: jnp.asarray(v) for k, v in vol_src_np.items()}
                vol_in = (vs_j,)
                vol_specs = ({k: spec3 for k in vs_j},)

            def run_sharded_fluid(pr, a, p, pa, *vols):
                vkw = dict(volume_source=vols[0]) if vols else {}
                return simulate_fluid_pallas(
                    pr, a, p, pa,
                    grid=grid_local, profiles_np=profiles_np,
                    viscous=viscous, oz_scale=oz_scale, nb=nb,
                    comm=comm, interpret=interpret,
                    fuse_steps=fuse_steps, **vkw,
                )

            fn = jax.jit(
                jax.shard_map(
                    run_sharded_fluid,
                    mesh=mesh,
                    in_specs=({k: spec3 for k in props_np}, spec2, spec2,
                              P()) + vol_specs,
                    out_specs=(spec3, spec3, spec3),
                    # pallas_call outputs carry no vma annotation
                    check_vma=False,
                )
            )
            acc_c, acc_s, peak = fn(
                props, jnp.asarray(src_amp), jnp.asarray(src_phase),
                jnp.float32(point_amp), *vol_in,
            )
        acc_c = np.asarray(acc_c)
        acc_s = np.asarray(acc_s)
        n_win = grid.n_steps - grid.sensor_start
        amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
        phase = np.arctan2(-acc_s, acc_c)
        return {
            "p_amp": amp.astype(np.float32),
            "p_phase": phase.astype(np.float32),
            "peak": np.asarray(peak),
        }

    if use_pallas:
        from .fdtd_pallas import simulate_fluid_pallas, simulate_visco_pallas

        nb = 2
        if grid.shape[0] % nb:
            raise ValueError("N1 must be even for the pallas backend")
        profiles_np = _build_cpml_profiles_np(
            grid.shape, grid.npml, grid.dx, grid.dt, cmax,
            grid.reflection_limit,
        )
        props = {k: jnp.asarray(v) for k, v in props_np.items()}
        # off-TPU (explicit backend='pallas' on CPU) run the interpreter
        interpret = jax.devices()[0].platform == "cpu"
        if has_shear:
            vol_in = (None,)
            if vol_src_np is not None:
                vol_in = ({k: jnp.asarray(v) for k, v in vol_src_np.items()},)
            indexed = _build_indexed_materials(
                coefs, mat_idx, reflector_mask, grid.shape[2]
            )
            extra_args = ()
            if indexed is not None:
                extra_args = (jnp.asarray(indexed[0]),
                              jnp.asarray(indexed[1]))

            def call(shrink):
                def run_visco(pr, a, p, pa, vol, *mats):
                    mkw = (dict(mat_idx=mats[0], mat_table=mats[1])
                           if mats else {})
                    return simulate_visco_pallas(
                        pr, a, p, pa,
                        grid=grid, profiles_np=profiles_np, viscous=viscous,
                        oz_scale=oz_scale, nb=nb, interpret=interpret,
                        k_shrink=shrink, fuse_steps=fuse_steps,
                        volume_source=vol, **mkw,
                    )

                key = ("visco", grid, float(cmax), float(oz_scale),
                       viscous, indexed is not None,
                       vol_src_np is not None, fuse_steps, shrink,
                       interpret)
                fn = _cached_executable(key, lambda: jax.jit(run_visco))
                return fn(
                    props, jnp.asarray(src_amp), jnp.asarray(src_phase),
                    jnp.float32(point_amp), *vol_in, *extra_args,
                )

            acc_c, acc_s, peak = _pallas_with_vmem_fallback(call)
        else:
            sel_p2 = "Pressure_rms" in sel_maps
            pmon_idx = None
            if pallas_extras and monitor_ijk is not None:
                mi_np = np.asarray(monitor_ijk, np.int64).reshape(-1, 3)
                pmon_idx = tuple(jnp.asarray(mi_np[:, d]) for d in range(3))
            vol_in = (None,)
            if vol_src_np is not None:
                vol_in = ({k: jnp.asarray(v) for k, v in vol_src_np.items()},)

            def call(shrink):
                def run_fluid(pr, a, p, pa, vol):
                    return simulate_fluid_pallas(
                        pr, a, p, pa,
                        grid=grid, profiles_np=profiles_np, viscous=viscous,
                        oz_scale=oz_scale, nb=nb, interpret=interpret,
                        k_shrink=shrink, fuse_steps=fuse_steps,
                        sel_p2=sel_p2 and pallas_extras,
                        monitor_idx=pmon_idx,
                        volume_source=vol,
                    )

                if pmon_idx is None:
                    key = ("fluid", grid, float(cmax), float(oz_scale),
                           viscous, vol_src_np is not None,
                           sel_p2 and pallas_extras, fuse_steps, shrink,
                           interpret)
                    fn = _cached_executable(key, lambda: jax.jit(run_fluid))
                else:
                    # monitor voxel indices live in the closure: per-case
                    fn = jax.jit(run_fluid)
                return fn(
                    props, jnp.asarray(src_amp), jnp.asarray(src_phase),
                    jnp.float32(point_amp), *vol_in,
                )

            out = _pallas_with_vmem_fallback(call)
            acc_c, acc_s, peak = out[:3]
            p_extras = out[3] if len(out) > 3 else {}
        acc_c = np.asarray(acc_c)
        acc_s = np.asarray(acc_s)
        n_win = grid.n_steps - grid.sensor_start
        amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
        phase = np.arctan2(-acc_s, acc_c)
        result = {
            "p_amp": amp.astype(np.float32),
            "p_phase": phase.astype(np.float32),
            "peak": np.asarray(peak),
        }
        if pallas_extras:
            if "Pressure_peak" in sel_maps:
                result["Pressure_peak"] = np.asarray(peak)
            if "Pressure_rms" in sel_maps:
                result["Pressure_rms"] = np.sqrt(
                    np.asarray(p_extras["acc_p2"]) / n_win
                ).astype(np.float32)
            if monitor_ijk is not None:
                # cadence = the fused depth of the window sweeps (the
                # returned times are exact for the emitted samples)
                result["sensor_series"] = (
                    np.asarray(p_extras["monitor_series"]).T
                    .astype(np.float32)
                )
                result["sensor_times"] = (
                    np.asarray(p_extras["monitor_steps"]) * grid.dt
                ).astype(np.float32)
        return result

    if vol_src_np is not None:
        # XLA path carries the volumetric source through the props dict
        # (popped into the scan carry by _simulate_local)
        for k, v in vol_src_np.items():
            props_np["src_" + (k + "3d" if k in ("amp", "phase") else k)] = v

    monitor_idx = None
    if monitor_ijk is not None:
        mi = np.asarray(monitor_ijk, np.int64).reshape(-1, 3)
        monitor_idx = tuple(jnp.asarray(mi[:, d]) for d in range(3))
    if mesh is None:
        comm = DomainComm()

        def _mk_xla():
            return jax.jit(
                functools.partial(
                    _simulate_local,
                    grid=grid,
                    profiles=profiles,
                    viscous=viscous,
                    has_shear=has_shear,
                    oz_scale=oz_scale,
                    comm=comm,
                    extras=sel_maps,
                    monitor_idx=monitor_idx,
                )
            )

        if monitor_idx is None:
            key = ("xla", grid, float(cmax), float(oz_scale), viscous,
                   has_shear, sel_maps, vol_src_np is not None)
            fn = _cached_executable(key, _mk_xla)
        else:
            fn = _mk_xla()
    else:
        from jax.sharding import NamedSharding, PartitionSpec as P

        if grid.shape[0] % mesh_nx or grid.shape[1] % mesh_ny:
            raise ValueError(
                f"grid {grid.shape[:2]} not divisible by mesh ({mesh_nx}, {mesh_ny})"
            )
        if (
            grid.shape[0] // mesh_nx < grid.npml + 2
            or grid.shape[1] // mesh_ny < grid.npml + 2
        ):
            raise ValueError("shard too thin for the PML slab; reduce mesh size")
        ax_x = "x" if mesh_nx > 1 else None
        ax_y = "y" if mesh_ny > 1 else None
        comm = DomainComm(ax_x, mesh_nx, axis_name_y=ax_y, n_shards_y=mesh_ny)
        spec3 = P(ax_x, ax_y, None)
        spec2 = P(ax_x, ax_y)
        out_specs = (spec3, spec3, spec3)
        if want_extras:
            # extras shard like the volume; the monitor series is psum'd
            # to a replicated per-step vector inside the step fn
            out_specs = out_specs + (
                {name: spec3 for name in sel_maps},
                None if monitor_idx is None else P(),
            )
        fn = jax.jit(
            jax.shard_map(
                functools.partial(
                    _simulate_local,
                    grid=grid,
                    profiles=profiles,
                    viscous=viscous,
                    has_shear=has_shear,
                    oz_scale=oz_scale,
                    comm=comm,
                    extras=sel_maps,
                    monitor_idx=monitor_idx,
                ),
                mesh=mesh,
                in_specs=({k: spec3 for k in props_np}, spec2, spec2, P()),
                out_specs=out_specs,
            )
        )

    multi_host = jax.process_count() > 1
    if mesh is not None:
        # explicit global shardings: each process supplies the full array and
        # device_put keeps only its addressable shards — this is what makes
        # the same call work across hosts over DCN (jax.distributed)
        ns3 = NamedSharding(mesh, spec3)
        ns2 = NamedSharding(mesh, spec2)
        ns0 = NamedSharding(mesh, P())
        props = {k: jax.device_put(np.asarray(v), ns3) for k, v in props_np.items()}
        args = (
            props,
            jax.device_put(src_amp, ns2),
            jax.device_put(src_phase, ns2),
            jax.device_put(np.float32(point_amp), ns0),
        )
    else:
        props = {k: jnp.asarray(v) for k, v in props_np.items()}
        args = (
            props, jnp.asarray(src_amp), jnp.asarray(src_phase),
            jnp.float32(point_amp),
        )
    out = fn(*args)

    def to_np(x):
        if multi_host:
            from jax.experimental import multihost_utils

            return np.asarray(multihost_utils.process_allgather(x, tiled=True))
        return np.asarray(x)

    acc_c, acc_s, peak = out[:3]
    acc_c = to_np(acc_c)
    acc_s = to_np(acc_s)
    peak = to_np(peak)
    n_win = grid.n_steps - grid.sensor_start
    # FFT-bin convention: X = sum p e^{-i w t} = C - iS; amp=2|X|/N
    amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
    phase = np.arctan2(-acc_s, acc_c)
    result = {
        "p_amp": amp.astype(np.float32),
        "p_phase": phase.astype(np.float32),
        "peak": np.asarray(peak),
    }
    if want_extras:
        extra_maps, ys = out[3], out[4]
        for name in sel_maps:
            v = np.asarray(extra_maps[name])
            result[name] = (
                np.sqrt(v / n_win).astype(np.float32)
                if name.endswith("_rms") else v
            )
        if monitor_idx is not None:
            sel = np.arange(grid.sensor_start, grid.n_steps, sensor_subsampling)
            result["sensor_series"] = np.asarray(ys)[sel].T.astype(np.float32)
            result["sensor_times"] = (sel * grid.dt).astype(np.float32)
    return result


def run_fdtd_capture(
    mat_idx: np.ndarray,
    materials: np.ndarray,
    grid: FDTDGrid,
    source_amp: np.ndarray | None = None,
    source_phase: np.ndarray | None = None,
    point_amp: float = 0.0,
    *,
    t_start: int = 0,
    t_end: int | None = None,
    subsample: int = 1,
    sensor_mask: np.ndarray | None = None,
    reflector_mask=None,
):
    """Opt-in RAW pressure time-series capture (transient / non-CW).

    The reference records a full [sensors x time] series and FFTs it
    afterwards (`BabelIntegrationBASE.py:2279-2295,2460-2538`); the CW
    production path here replaces that with the in-kernel carrier DFT, but
    transient analysis needs the raw capability. This runs the XLA stepper
    with a segmented scan: steps [t_start, t_end) emit the pressure of
    every ``subsample``-th step, gathered over ``sensor_mask`` (bool
    volume; None = the full volume — size the window to memory:
    ``n_samples * n_sensors * 4`` bytes live on device).

    Returns dict with 'series' (n_samples, n_sensors) float32 (or
    (n_samples,) + grid.shape when ``sensor_mask`` is None), 'times' (s;
    sample m is the state after step ``t_start + (m+1)*subsample - 1``),
    'sensor_ijk' (n_sensors, 3) when a mask is given, and the standard
    'p_amp'/'p_phase'/'peak' carrier outputs of the same run.
    """
    from ..parallel.halo import DomainComm

    mats = np.asarray(materials, np.float64)
    coefs = sls_coefficients(mats, grid.frequency, grid.dt)
    has_shear = bool(np.any(mats[:, 2] > 0))
    props_np = _material_fields(mat_idx, coefs, has_shear)
    if reflector_mask is not None:
        _fold_reflector(props_np, reflector_mask, has_shear)
    viscous = coefs["viscous"]
    rho0, c0 = mats[0, 0], mats[0, 1]
    cmax = max(mats[:, 1].max(), mats[:, 2].max())
    profiles = _build_cpml_profiles(
        grid.shape, grid.npml, grid.dx, grid.dt, cmax, grid.reflection_limit
    )
    src_amp = np.asarray(
        source_amp if source_amp is not None else np.zeros(grid.shape[:2]),
        np.float32,
    )
    src_phase = np.asarray(
        source_phase if source_phase is not None else np.zeros(grid.shape[:2]),
        np.float32,
    )
    t_end = int(t_end if t_end is not None else grid.n_steps)
    t_start = int(t_start)
    sub = int(subsample)
    if not (0 <= t_start < t_end <= grid.n_steps) or sub < 1:
        raise ValueError("capture window must satisfy "
                         "0 <= t_start < t_end <= n_steps, subsample >= 1")
    cap_idx = None
    ijk = None
    if sensor_mask is not None:
        ijk = np.argwhere(np.asarray(sensor_mask, bool))
        cap_idx = tuple(jnp.asarray(ijk[:, d]) for d in range(3))

    fn = jax.jit(
        functools.partial(
            _simulate_local,
            grid=grid, profiles=profiles, viscous=viscous,
            has_shear=has_shear, oz_scale=1.0 / (rho0 * c0),
            comm=DomainComm(),
            capture=(t_start, t_end, sub, cap_idx),
        )
    )
    props = {k: jnp.asarray(v) for k, v in props_np.items()}
    acc_c, acc_s, peak, series = fn(
        props, jnp.asarray(src_amp), jnp.asarray(src_phase),
        jnp.float32(point_amp),
    )
    acc_c = np.asarray(acc_c)
    acc_s = np.asarray(acc_s)
    n_win = grid.n_steps - grid.sensor_start
    n_groups = (t_end - t_start) // sub
    out = {
        "p_amp": (2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)).astype(
            np.float32
        ),
        "p_phase": np.arctan2(-acc_s, acc_c).astype(np.float32),
        "peak": np.asarray(peak),
        "series": np.asarray(series).astype(np.float32),
        "times": (
            (t_start + (np.arange(n_groups) + 1) * sub - 1) * grid.dt
        ).astype(np.float32),
    }
    if ijk is not None:
        out["sensor_ijk"] = ijk
    return out


def make_case_mesh(n_devices: int | None = None):
    """1-D mesh with axis name 'case' for embarrassingly-parallel fan-out."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.sharding.Mesh(devs, ("case",))


def run_fdtd_batch(
    mat_idx: np.ndarray,
    materials: np.ndarray,
    grid: FDTDGrid,
    source_amps: np.ndarray,
    source_phases: np.ndarray,
    mesh=None,
    reflector_mask=None,
):
    """Run B independent plane-source simulations, fanned out over devices.

    Multipoint steering is embarrassingly parallel (the reference loops
    steering points sequentially, `CalculateFieldProcess.py:78-111`;
    SURVEY.md section 2.8 maps it to a trivial sharding axis): every case
    shares the material map/grid and differs only in its CW source plane.

    Parameters
    ----------
    source_amps, source_phases : (B, N1, N2) per-case source planes.
    mesh : optional 1-D ``jax.sharding.Mesh`` with axis name 'case'
        (see ``make_case_mesh``); cases are padded up to a multiple of the
        mesh size and distributed one-per-device, each running the full
        single-device scan locally (no halo traffic at all).

    Returns a dict of stacked (B, N1, N2, N3) arrays with the same keys as
    ``run_fdtd``.
    """
    from jax.sharding import PartitionSpec as P

    from ..parallel.halo import DomainComm

    mats = np.asarray(materials, np.float64)
    coefs = sls_coefficients(mats, grid.frequency, grid.dt)
    has_shear = bool(np.any(mats[:, 2] > 0))
    props_np = _material_fields(mat_idx, coefs, has_shear)
    viscous = coefs["viscous"]
    rho0, c0 = mats[0, 0], mats[0, 1]
    cmax = max(mats[:, 1].max(), mats[:, 2].max())
    profiles = _build_cpml_profiles(
        grid.shape, grid.npml, grid.dx, grid.dt, cmax, grid.reflection_limit
    )
    if reflector_mask is not None:
        _fold_reflector(props_np, reflector_mask, has_shear)

    amps = np.asarray(source_amps, np.float32)
    phases = np.asarray(source_phases, np.float32)
    if amps.ndim != 3 or amps.shape != phases.shape:
        raise ValueError("source_amps/source_phases must be (B, N1, N2)")
    n_cases = amps.shape[0]

    def make_batched(vary_axes=()):
        local = functools.partial(
            _simulate_local,
            grid=grid,
            profiles=profiles,
            viscous=viscous,
            has_shear=has_shear,
            oz_scale=1.0 / (rho0 * c0),
            comm=DomainComm(),
            vary_axes=vary_axes,
        )
        return jax.vmap(
            lambda a, p, props: local(props, a, p, jnp.float32(0.0)),
            in_axes=(0, 0, None),
        )

    pad = 0
    if mesh is None:
        fn = jax.jit(make_batched())
    else:
        n_dev = mesh.devices.size
        axis = mesh.axis_names[0]
        batched = make_batched(vary_axes=(axis,))
        pad = (-n_cases) % n_dev
        if pad:
            amps = np.concatenate([amps, np.zeros((pad,) + amps.shape[1:], np.float32)])
            phases = np.concatenate(
                [phases, np.zeros((pad,) + phases.shape[1:], np.float32)]
            )
        fn = jax.jit(
            jax.shard_map(
                batched,
                mesh=mesh,
                in_specs=(P(axis), P(axis), {k: P() for k in props_np}),
                out_specs=(P(axis), P(axis), P(axis)),
            )
        )

    props = {k: jnp.asarray(v) for k, v in props_np.items()}
    acc_c, acc_s, peak = fn(jnp.asarray(amps), jnp.asarray(phases), props)
    acc_c = np.asarray(acc_c)[:n_cases]
    acc_s = np.asarray(acc_s)[:n_cases]
    n_win = grid.n_steps - grid.sensor_start
    amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
    phase = np.arctan2(-acc_s, acc_c)
    return {
        "p_amp": amp.astype(np.float32),
        "p_phase": phase.astype(np.float32),
        "peak": np.asarray(peak)[:n_cases],
    }
