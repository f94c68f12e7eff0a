"""Pallas TPU kernels for the fluid (acoustic) FDTD path.

The jnp/XLA fluid stepper reaches ~1.6 Gcells/s on a v5e chip; XLA's
elementwise pipelines measure ~0.4 TB/s of HBM traffic while hand-written
Pallas streaming kernels sustain ~1.3 TB/s on the same chip. These kernels
recover that factor with a **streaming-slab** design:

* grid iterates over x-slabs of ``nb`` planes; every array is read exactly
  once per step (no halo re-reads) — the x-stencil halo comes from a VMEM
  ring that keeps the previous slab plus a 2-plane tail, with outputs
  written one slab behind the input stream;
* y/z derivatives are computed in-plane with padded shifts;
* y/z CPML (psi memory slabs + profile coefficients) live in-kernel; the
  x-axis CPML slabs are corrected by a cheap jnp post-pass on the 14 first
  and last planes (`fdtd.py` helpers), keeping the kernels free of
  boundary special cases;
* the carrier DFT (cos/sin accumulators) and peak tracking are fused into
  the pressure kernel, so no extra field passes exist at all.

State per step: p, vx, vy, vz, r (SLS memory) — the CT-mode production
configuration where the reference disables shear entirely
(`TranscranialModeling/BabelIntegrationBASE.py:1343-1351`).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_C1 = 9.0 / 8.0
_C2 = -1.0 / 24.0


def _shift_y(g, off):
    if off > 0:
        return jnp.pad(g[:, off:, :], ((0, 0), (0, off), (0, 0)))
    return jnp.pad(g[:, :off, :], ((0, 0), (-off, 0), (0, 0)))


def _shift_z(g, off):
    if off > 0:
        return jnp.pad(g[:, :, off:], ((0, 0), (0, 0), (0, off)))
    return jnp.pad(g[:, :, :off], ((0, 0), (0, 0), (-off, 0)))


def _d_plus_y(g):
    return _C1 * (_shift_y(g, 1) - g) + _C2 * (_shift_y(g, 2) - _shift_y(g, -1))


def _d_minus_y(g):
    return _C1 * (g - _shift_y(g, -1)) + _C2 * (_shift_y(g, 1) - _shift_y(g, -2))


def _d_plus_z(g):
    return _C1 * (_shift_z(g, 1) - g) + _C2 * (_shift_z(g, 2) - _shift_z(g, -1))


def _d_minus_z(g):
    return _C1 * (g - _shift_z(g, -1)) + _C2 * (_shift_z(g, 1) - _shift_z(g, -2))


def _apply_cpml_inplane(d, psi_lo, psi_hi, b_lo, a_lo, b_hi, a_hi, axis):
    """In-kernel CPML for an in-plane derivative ``d`` (slab, (nb,N2,N3)).

    psi_* are this slab's memory blocks ((nb, ns, N3) for y, (nb, N2, ns)
    for z); b/a are closure constants shaped to broadcast. Returns the
    corrected derivative and new psi values.
    """
    ns = psi_lo.shape[axis]
    if axis == 1:
        d_lo = d[:, :ns, :]
        d_hi = d[:, -ns:, :]
    else:
        d_lo = d[:, :, :ns]
        d_hi = d[:, :, -ns:]
    new_lo = b_lo * psi_lo + a_lo * d_lo
    new_hi = b_hi * psi_hi + a_hi * d_hi
    # static-slice concatenation (scatter ops don't lower in Pallas TPU)
    if axis == 1:
        d = jnp.concatenate(
            [d_lo + new_lo, d[:, ns:-ns, :], d_hi + new_hi], axis=1
        )
    else:
        d = jnp.concatenate(
            [d_lo + new_lo, d[:, :, ns:-ns], d_hi + new_hi], axis=2
        )
    return d, new_lo, new_hi


def _point_src_row(amp_point, nk, grid, omega, ramp_steps):
    """(2,) SMEM row [-amp*sin(w t)*ramp, 0] for the fluid point source at
    step ``nk`` (sign folded so the kernel ADDS it to p, matching the XLA
    path's ``p.at[ijk].add(-sval)``)."""
    t = nk.astype(jnp.float32) * grid.dt
    ramp = jnp.where(
        nk < ramp_steps,
        0.5 * (1.0 - jnp.cos(np.pi * nk / ramp_steps)), 1.0,
    ).astype(jnp.float32)
    v = -amp_point * jnp.sin(omega * t) * ramp
    return jnp.stack([v, jnp.float32(0.0)])


def _mask_y_consts(c4, ycoef_mask):
    """Scale a (b_lo, a_lo, b_hi, a_hi) profile-constant tuple by the
    static (lo, hi) edge mask — used by the y-tiled visco drivers so a
    tile whose y boundary is interior runs no y-CPML there."""
    lo, hi = ycoef_mask
    return (c4[0] * lo, c4[1] * lo, c4[2] * hi, c4[3] * hi)


def _make_profiles_const(profiles, axis, stag, ns):
    """Slab-trimmed (b, a) numpy constants shaped for in-plane broadcast."""
    p = profiles[axis][stag]
    if axis == 1:
        shape = (1, ns, 1)
    else:
        shape = (1, 1, ns)
    return (
        np.asarray(p["b_lo"]).reshape(shape),
        np.asarray(p["a_lo"]).reshape(shape),
        np.asarray(p["b_hi"]).reshape(shape),
        np.asarray(p["a_hi"]).reshape(shape),
    )


def _pack_x_coefs(profiles, stag, ns, nb, kx):
    """(b_lo, a_lo, b_hi, a_hi) packed into (kx+1)*nb-plane coefficient
    arrays for the in-kernel x-CPML (see build_fluid_pallas_step).

    Lo: the first ns planes carry the profile, the rest (incl. the dummy
    block) are zero, making the correction a no-op outside the slab. Hi:
    the hi region's planes map to global [N1 - kx*nb, N1), so the profile
    occupies its last ns planes before the dummy.
    """
    p = profiles[0][stag]
    P = (kx + 1) * nb
    out = []
    for prof, lo in ((p["b_lo"], True), (p["a_lo"], True),
                     (p["b_hi"], False), (p["a_hi"], False)):
        arr = np.zeros((P, 1, 1), np.float32)
        if lo:
            arr[:ns, 0, 0] = np.asarray(prof)
        else:
            arr[kx * nb - ns : kx * nb, 0, 0] = np.asarray(prof)
        out.append(arr)
    return tuple(out)


def _x_cpml_blocks(ns, nb, n_slabs, N2, N3):
    """Block specs/maps for in-kernel x-CPML psi state.

    The psi state rides in (kx+1)-block arrays: blocks 0..kx-1 hold the lo
    (or hi) PML planes, block kx is a dummy every interior slab parks on —
    Pallas elides repeated same-index loads/stores, so psi traffic stays
    O(npml/N1). Interior slabs see all-zero coefficients, making the
    correction branch-free. Lo and hi apply in parallel (not sequentially
    as fdtd._CPML.apply); exact whenever both slabs never act on the same
    plane, which run_fdtd's size constraints plus edge masks guarantee.
    """
    kx = -(-ns // nb)
    if n_slabs < kx:
        raise ValueError(
            f"N1={n_slabs * nb} too small for in-kernel x-CPML ({kx} blocks)"
        )
    px_planes = (kx + 1) * nb
    lo_map = lambda i: (jnp.minimum(jnp.maximum(i - 1, 0), kx), 0, 0)

    def hi_map(i):
        s = jnp.maximum(i - 1, 0)
        return (jnp.where(s >= n_slabs - kx, s - (n_slabs - kx), kx), 0, 0)

    return {
        "kx": kx,
        "px_planes": px_planes,
        "psix_lo": pl.BlockSpec((nb, N2, N3), lo_map, memory_space=pltpu.VMEM),
        "psix_hi": pl.BlockSpec((nb, N2, N3), hi_map, memory_space=pltpu.VMEM),
        "coef_lo": pl.BlockSpec((nb, 1, 1), lo_map, memory_space=pltpu.VMEM),
        "coef_hi": pl.BlockSpec((nb, 1, 1), hi_map, memory_space=pltpu.VMEM),
        "shape": jax.ShapeDtypeStruct((px_planes, N2, N3), jnp.float32),
    }


def _x_cpml_apply(d, psi_lo_ref, psi_hi_ref, bxl, axl, bxh, axh):
    """In-kernel x-CPML: correct slab derivative d, return new psi pair."""
    new_lo = bxl[...] * psi_lo_ref[...] + axl[...] * d
    new_hi = bxh[...] * psi_hi_ref[...] + axh[...] * d
    return d + new_lo + new_hi, new_lo, new_hi


def build_fluid_pallas_step(grid, profiles_np, viscous, oz_scale, nb=2,
                            interpret=False, with_dft=True):
    """Return (vel_fn, press_fn) jitted pallas pipelines for one time step.

    ``profiles_np`` is the output of ``fdtd._build_cpml_profiles`` computed
    with numpy leaves. x-axis CPML is NOT handled here (jnp post-pass).

    ``with_dft=False`` builds the **quiet-phase** pressure kernel: before
    the sensor window opens (``grid.sensor_start``, = all but the last 2
    cycles in production, `BabelIntegrationBASE.py:2108-2109`) the carrier
    DFT and peak accumulators are masked to zero anyway, so the quiet
    kernel simply doesn't stream them — 6 fewer full-volume HBM accesses
    per step on ~95% of production timesteps.
    """
    N1, N2, N3 = grid.shape
    if N1 % nb:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb}")
    ns = grid.npml + 2
    n_slabs = N1 // nb
    dt_dx = np.float32(grid.dt / grid.dx)
    dt = np.float32(grid.dt)
    inv_dx = np.float32(1.0 / grid.dx)

    # closure constants (numpy -> baked into the kernels)
    by = _make_profiles_const(profiles_np, 1, "half", ns)
    bz = _make_profiles_const(profiles_np, 2, "half", ns)
    by_i = _make_profiles_const(profiles_np, 1, "int", ns)
    bz_i = _make_profiles_const(profiles_np, 2, "int", ns)

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    coef_y = pl.BlockSpec((1, ns, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    coef_z = pl.BlockSpec((1, 1, ns), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    slab_y = lambda idx: pl.BlockSpec((nb, ns, N3), idx, memory_space=pltpu.VMEM)
    slab_z = lambda idx: pl.BlockSpec((nb, N2, ns), idx, memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)
    lag = lambda i: (jnp.maximum(i - 1, 0), 0, 0)
    ghost_spec = pl.BlockSpec(
        (2, N2, N3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )

    xb = _x_cpml_blocks(ns, nb, n_slabs, N2, N3)
    kx = xb["kx"]
    px_planes = xb["px_planes"]
    psix_lo_spec, psix_hi_spec = xb["psix_lo"], xb["psix_hi"]
    coefx_lo, coefx_hi = xb["coef_lo"], xb["coef_hi"]
    psix_shape = xb["shape"]

    def window(ring, tail, incoming, i, ghost_lo, ghost_hi):
        """(nb+4, N2, N3) x-window around output slab s = i-1.

        ghost_lo/ghost_hi are the neighbor shards' boundary planes (zeros at
        global edges), used at the first/last output slab.
        """
        s = i - 1
        prev2 = jnp.where(s >= 1, tail[...], ghost_lo)
        cur_slab = ring[(i - 1) % 2]
        nxt2 = jnp.where(s < n_slabs - 1, incoming[0:2], ghost_hi)
        return jnp.concatenate([prev2, cur_slab, nxt2], axis=0)

    x_cpml = _x_cpml_apply

    # ------------------------------------------------------------------
    # velocity kernel (CW plane source + x-CPML fused in: no jnp post-pass
    # traffic at all)
    # ------------------------------------------------------------------
    zsrc = grid.source_plane_z

    def vel_kernel(
        p_ref, vx_ref, vy_ref, vz_ref, rho_ref,
        psi_py_lo_ref, psi_py_hi_ref, psi_pz_lo_ref, psi_pz_hi_ref,
        ghost_lo_ref, ghost_hi_ref,
        amp_ref, cph_ref, sph_ref, tsrc_ref,
        cy_blo, cy_alo, cy_bhi, cy_ahi, cz_blo, cz_alo, cz_bhi, cz_ahi,
        psix_lo_ref, psix_hi_ref, bxl, axl, bxh, axh,
        ovx, ovy, ovz,
        opsi_py_lo, opsi_py_hi, opsi_pz_lo, opsi_pz_hi,
        opsix_lo, opsix_hi,
        ring, tail,
    ):
        i = pl.program_id(0)
        incoming = p_ref[...]

        @pl.when(i < n_slabs)
        def _():
            ring[i % 2] = incoming

        @pl.when(i >= 1)
        def _():
            w = window(ring, tail, incoming, i, ghost_lo_ref[...], ghost_hi_ref[...])
            # d_plus x at local plane j: c1*(w[j+3]-w[j+2]) + c2*(w[j+4]-w[j+1])
            dpx = _C1 * (w[3 : 3 + nb] - w[2 : 2 + nb]) + _C2 * (
                w[4 : 4 + nb] - w[1 : 1 + nb]
            )
            dpx, npx_lo, npx_hi = x_cpml(
                dpx, psix_lo_ref, psix_hi_ref, bxl, axl, bxh, axh
            )
            ps = w[2 : 2 + nb]
            dpy = _d_plus_y(ps)
            dpz = _d_plus_z(ps)
            dpy, npy_lo, npy_hi = _apply_cpml_inplane(
                dpy, psi_py_lo_ref[...], psi_py_hi_ref[...],
                cy_blo[...], cy_alo[...], cy_bhi[...], cy_ahi[...], axis=1,
            )
            dpz, npz_lo, npz_hi = _apply_cpml_inplane(
                dpz, psi_pz_lo_ref[...], psi_pz_hi_ref[...],
                cz_blo[...], cz_alo[...], cz_bhi[...], cz_ahi[...], axis=2,
            )
            rho_inv = rho_ref[...]
            ovx[...] = vx_ref[...] - dt_dx * rho_inv * dpx
            ovy[...] = vy_ref[...] - dt_dx * rho_inv * dpy
            vz_new = vz_ref[...] - dt_dx * rho_inv * dpz
            # CW source: sin(wt + ph) = sin(wt)cos(ph) + cos(wt)sin(ph);
            # src planes arrive as (nb, N2, 1) blocks
            amp = amp_ref[...]
            sval = tsrc_ref[0, 0] * cph_ref[...] + tsrc_ref[0, 1] * sph_ref[...]
            z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
            on_src = (z_iota == zsrc) & (amp > 0)
            ovz[...] = jnp.where(on_src, sval * amp, vz_new)
            opsi_py_lo[...] = npy_lo
            opsi_py_hi[...] = npy_hi
            opsi_pz_lo[...] = npz_lo
            opsi_pz_hi[...] = npz_hi
            opsix_lo[...] = npx_lo
            opsix_hi[...] = npx_hi
            tail[...] = w[nb : nb + 2]

    # (N1, N2, 1) source planes: the trailing singleton keeps the block's
    # last two dims equal to the array's (Mosaic tiling requirement)
    plane = lambda: pl.BlockSpec((nb, N2, 1), lag, memory_space=pltpu.VMEM)
    vel_call = pl.pallas_call(
        vel_kernel,
        grid=(n_slabs + 1,),
        in_specs=[
            slab(cur),  # p (streamed)
            slab(lag), slab(lag), slab(lag),  # vx, vy, vz
            slab(lag),  # rho_inv
            slab_y(lag), slab_y(lag), slab_z(lag), slab_z(lag),  # psi in
            ghost_spec, ghost_spec,
            plane(), plane(), plane(),  # src amp, cos(ph), sin(ph)
            pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM),
            coef_y, coef_y, coef_y, coef_y, coef_z, coef_z, coef_z, coef_z,
            psix_lo_spec, psix_hi_spec,
            coefx_lo, coefx_lo, coefx_hi, coefx_hi,
        ],
        out_specs=[
            slab(lag), slab(lag), slab(lag),
            slab_y(lag), slab_y(lag), slab_z(lag), slab_z(lag),
            psix_lo_spec, psix_hi_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32),
            jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32),
            jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32),
            jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32),
            jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32),
            jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32),
            jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32),
            psix_shape, psix_shape,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, nb, N2, N3), jnp.float32),
            pltpu.VMEM((2, N2, N3), jnp.float32),
        ],
        input_output_aliases={
            1: 0, 2: 1, 3: 2, 5: 3, 6: 4, 7: 5, 8: 6, 23: 7, 24: 8,
        },
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    # ------------------------------------------------------------------
    # pressure kernel
    # ------------------------------------------------------------------
    def press_kernel(*refs):
        it = iter(refs)
        vx_ref, vy_ref, vz_ref, p_ref, r_ref = (next(it) for _ in range(5))
        piu_ref, crp_ref, br_ref = (next(it) for _ in range(3))
        if with_dft:
            acc_c_ref, acc_s_ref, peak_ref = (next(it) for _ in range(3))
        psi_vy_lo_ref, psi_vy_hi_ref, psi_vz_lo_ref, psi_vz_hi_ref = (
            next(it) for _ in range(4)
        )
        ghost_lo_ref, ghost_hi_ref = next(it), next(it)
        if with_dft:
            scal_ref = next(it)
        (cy_blo, cy_alo, cy_bhi, cy_ahi, cz_blo, cz_alo, cz_bhi, cz_ahi) = (
            next(it) for _ in range(8)
        )
        psix_lo_ref, psix_hi_ref, bxl, axl, bxh, axh = (
            next(it) for _ in range(6)
        )
        op, orr = next(it), next(it)
        if with_dft:
            oacc_c, oacc_s, opeak = (next(it) for _ in range(3))
        opsi_vy_lo, opsi_vy_hi, opsi_vz_lo, opsi_vz_hi = (
            next(it) for _ in range(4)
        )
        opsix_lo, opsix_hi, ring, tail = (next(it) for _ in range(4))

        i = pl.program_id(0)
        incoming = vx_ref[...]

        @pl.when(i < n_slabs)
        def _():
            ring[i % 2] = incoming

        @pl.when(i >= 1)
        def _():
            w = window(ring, tail, incoming, i, ghost_lo_ref[...], ghost_hi_ref[...])
            # d_minus x at local j: c1*(w[j+2]-w[j+1]) + c2*(w[j+3]-w[j])
            dvx = _C1 * (w[2 : 2 + nb] - w[1 : 1 + nb]) + _C2 * (
                w[3 : 3 + nb] - w[0:nb]
            )
            dvx, nvx_lo2, nvx_hi2 = x_cpml(
                dvx, psix_lo_ref, psix_hi_ref, bxl, axl, bxh, axh
            )
            opsix_lo[...] = nvx_lo2
            opsix_hi[...] = nvx_hi2
            dvy = _d_minus_y(vy_ref[...])
            dvz = _d_minus_z(vz_ref[...])
            dvy, nvy_lo, nvy_hi = _apply_cpml_inplane(
                dvy, psi_vy_lo_ref[...], psi_vy_hi_ref[...],
                cy_blo[...], cy_alo[...], cy_bhi[...], cy_ahi[...], axis=1,
            )
            dvz, nvz_lo, nvz_hi = _apply_cpml_inplane(
                dvz, psi_vz_lo_ref[...], psi_vz_hi_ref[...],
                cz_blo[...], cz_alo[...], cz_bhi[...], cz_ahi[...], axis=2,
            )
            theta = dvx + dvy + dvz
            p_old = p_ref[...]
            if viscous:
                r_old = r_ref[...]
                new_r = br_ref[...] * r_old - crp_ref[...] * theta * inv_dx
                p_new = (
                    p_old
                    - dt_dx * piu_ref[...] * theta
                    - dt * 0.5 * (new_r + r_old)
                )
                orr[...] = new_r
            else:
                p_new = p_old - dt_dx * piu_ref[...] * theta
                orr[...] = r_ref[...]
            op[...] = p_new
            if with_dft:
                cosw = scal_ref[0, 0]
                sinw = scal_ref[0, 1]
                oacc_c[...] = acc_c_ref[...] + p_new * cosw
                oacc_s[...] = acc_s_ref[...] + p_new * sinw
                opeak[...] = jnp.maximum(
                    peak_ref[...],
                    jnp.abs(p_new) * (cosw * cosw + sinw * sinw > 0),
                )
            opsi_vy_lo[...] = nvy_lo
            opsi_vy_hi[...] = nvy_hi
            opsi_vz_lo[...] = nvz_lo
            opsi_vz_hi[...] = nvz_hi
            tail[...] = w[nb : nb + 2]

    vol = lambda: jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)
    n_acc = 3 if with_dft else 0
    press_in_specs = (
        [
            slab(cur),  # vx streamed
            slab(lag), slab(lag),  # vy, vz
            slab(lag), slab(lag),  # p, r
            slab(lag), slab(lag), slab(lag),  # piu, crp, br
        ]
        + [slab(lag)] * n_acc  # acc_c, acc_s, peak
        + [slab_y(lag), slab_y(lag), slab_z(lag), slab_z(lag)]  # psi in
        + [ghost_spec, ghost_spec]
        + (
            [pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)]
            if with_dft else []
        )
        + [coef_y, coef_y, coef_y, coef_y, coef_z, coef_z, coef_z, coef_z]
        + [psix_lo_spec, psix_hi_spec]
        + [coefx_lo, coefx_lo, coefx_hi, coefx_hi]
    )
    press_out_specs = (
        [slab(lag)] * (2 + n_acc)
        + [slab_y(lag), slab_y(lag), slab_z(lag), slab_z(lag)]
        + [psix_lo_spec, psix_hi_spec]
    )
    press_out_shape = (
        [vol()] * (2 + n_acc)
        + [
            jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32),
            jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32),
            jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32),
            jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32),
        ]
        + [psix_shape, psix_shape]
    )
    # aliases: p->p, r->r, [accs], psi y/z, psi x
    psi_in0 = 8 + n_acc
    psix_in0 = psi_in0 + 4 + 2 + (1 if with_dft else 0) + 8
    press_aliases = {3: 0, 4: 1}
    for a in range(n_acc):
        press_aliases[8 + a] = 2 + a
    for a in range(4):
        press_aliases[psi_in0 + a] = 2 + n_acc + a
    press_aliases[psix_in0] = 6 + n_acc
    press_aliases[psix_in0 + 1] = 7 + n_acc
    press_call = pl.pallas_call(
        press_kernel,
        grid=(n_slabs + 1,),
        in_specs=press_in_specs,
        out_specs=press_out_specs,
        out_shape=press_out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, nb, N2, N3), jnp.float32),
            pltpu.VMEM((2, N2, N3), jnp.float32),
        ],
        input_output_aliases=press_aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )

    coefs = {
        "y_half": tuple(jnp.asarray(c) for c in by),
        "z_half": tuple(jnp.asarray(c) for c in bz),
        "y_int": tuple(jnp.asarray(c) for c in by_i),
        "z_int": tuple(jnp.asarray(c) for c in bz_i),
        "x_half_pack": _pack_x_coefs(profiles_np, "half", ns, nb, kx),
        "x_int_pack": _pack_x_coefs(profiles_np, "int", ns, nb, kx),
        "px_planes": px_planes,
    }
    return vel_call, press_call, coefs


def build_fluid_fused_step(grid, profiles_np, viscous, oz_scale, nb=4,
                           interpret=False, with_dft=True, edge_offset=0):
    """Single-sweep fused step: velocity AND pressure updates in ONE
    streaming pass (single-device x-extent only).

    The two-kernel pipeline streams ~19 volume-equivalents of HBM traffic
    per step (vel: 5R+3W, press: 8R+2W, plus psi slabs); measured on-chip it
    is HBM-bound (math and gathers hide entirely behind the DMA stream —
    see bench notes). Fusing the half-steps removes the intermediate
    re-read of vx/vy/vz/p (14 volumes total: 9R+5W), a ~1.3x step-time
    reduction at identical numerics.

    Software pipeline across the slab stream (iteration i):
      * stash incoming p slab i in a 3-slot ring;
      * velocity update for slab i-1 (p window from the ring);
      * pressure update for slab i-2 — its x-stencil of vx uses the 2-plane
        tail of vx_new(i-3), the ring slab vx_new(i-2), and the first 2
        planes of the vx_new(i-1) just computed; vy/vz derivatives are
        in-plane so one ring slot each suffices.
    Grid runs n_slabs + 2 iterations; outputs write with lag-1 (velocities)
    and lag-2 (p, r, accumulators) index maps. Identical update equations
    as build_fluid_pallas_step, so bit-parity is expected up to f32
    reassociation (verified on-chip vs both the XLA path and the two-kernel
    pair).
    """
    N1, N2, N3 = grid.shape
    if N1 % nb:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb}")
    ns = grid.npml + 2
    n_slabs = N1 // nb
    dt_dx = np.float32(grid.dt / grid.dx)
    dt = np.float32(grid.dt)
    inv_dx = np.float32(1.0 / grid.dx)
    zsrc = grid.source_plane_z
    point = grid.source_type == "stress_point"
    # dome transducers in zero-shear (CT) media: per-voxel velocity drive
    # along per-voxel normals on the ACOUSTIC system — the fluid-kernel
    # counterpart of the visco volumetric capability
    # (`BabelIntegrationDOME_PHASEDARRAY.py:344-407`)
    vol_src = grid.source_type == "velocity_volume"
    if point:
        i0_pt, j0_pt, k0_pt = (int(v) for v in grid.source_ijk)
        s_pt, li_pt = divmod(i0_pt, nb)

    by = _make_profiles_const(profiles_np, 1, "half", ns)
    bz = _make_profiles_const(profiles_np, 2, "half", ns)
    by_i = _make_profiles_const(profiles_np, 1, "int", ns)
    bz_i = _make_profiles_const(profiles_np, 2, "int", ns)

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    coef_y = pl.BlockSpec((1, ns, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    coef_z = pl.BlockSpec((1, 1, ns), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    slab_y = lambda idx: pl.BlockSpec((nb, ns, N3), idx, memory_space=pltpu.VMEM)
    slab_z = lambda idx: pl.BlockSpec((nb, N2, ns), idx, memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)
    lag1 = lambda i: (jnp.minimum(jnp.maximum(i - 1, 0), n_slabs - 1), 0, 0)
    lag2 = lambda i: (jnp.minimum(jnp.maximum(i - 2, 0), n_slabs - 1), 0, 0)
    ghost_spec = pl.BlockSpec(
        (2, N2, N3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )

    # x-CPML psi blocks, one pair per lag (velocity acts on d+x of p at
    # lag 1; pressure on d-x of vx at lag 2)
    kx = -(-ns // nb)
    if n_slabs < kx + 1:
        raise ValueError(
            f"N1={N1} too small for the fused pipeline ({kx + 1} blocks)"
        )
    px_planes = (kx + 1) * nb
    h0 = int(edge_offset)
    lo1 = lambda i: (jnp.minimum(jnp.maximum(i - 1 - h0, 0), kx), 0, 0)
    lo2 = lambda i: (jnp.minimum(jnp.maximum(i - 2 - h0, 0), kx), 0, 0)

    def hi_of(lag):
        base = n_slabs - kx - h0

        def m(i):
            s = jnp.minimum(jnp.maximum(i - lag, 0), n_slabs - 1)
            return (jnp.where((s >= base) & (s < n_slabs - h0), s - base,
                              kx), 0, 0)
        return m

    psix1 = lambda m: pl.BlockSpec((nb, N2, N3), m, memory_space=pltpu.VMEM)
    coefx1 = lambda m: pl.BlockSpec((nb, 1, 1), m, memory_space=pltpu.VMEM)
    psix_shape = jax.ShapeDtypeStruct((px_planes, N2, N3), jnp.float32)

    def kernel(*refs):
        it = iter(refs)
        p_ref, vx_ref, vy_ref, vz_ref = (next(it) for _ in range(4))
        r_ref, rho_ref, piu_ref, crp_ref, br_ref = (next(it) for _ in range(5))
        if with_dft:
            acc_c_ref, acc_s_ref, peak_ref = (next(it) for _ in range(3))
        (psi_py_lo_ref, psi_py_hi_ref, psi_pz_lo_ref, psi_pz_hi_ref,
         psi_vy_lo_ref, psi_vy_hi_ref, psi_vz_lo_ref, psi_vz_hi_ref) = (
            next(it) for _ in range(8)
        )
        gp_lo_ref, gp_hi_ref, gv_lo_ref, gv_hi_ref = (
            next(it) for _ in range(4)
        )
        if not vol_src:
            amp_ref, cph_ref, sph_ref = (next(it) for _ in range(3))
        tsrc_ref = next(it)
        if vol_src:
            (vamp_ref, vcph_ref, vsph_ref, vox_ref, voy_ref, voz_ref) = (
                next(it) for _ in range(6)
            )
        if point:
            psrc_ref = next(it)
        if with_dft:
            scal_ref = next(it)
        (cyh_blo, cyh_alo, cyh_bhi, cyh_ahi,
         czh_blo, czh_alo, czh_bhi, czh_ahi,
         cyi_blo, cyi_alo, cyi_bhi, cyi_ahi,
         czi_blo, czi_alo, czi_bhi, czi_ahi) = (next(it) for _ in range(16))
        (psixp_lo_ref, psixp_hi_ref, bxh_l, axh_l, bxh_h, axh_h,
         psixv_lo_ref, psixv_hi_ref, bxi_l, axi_l, bxi_h, axi_h) = (
            next(it) for _ in range(12)
        )
        ovx, ovy, ovz, op, orr = (next(it) for _ in range(5))
        if with_dft:
            oacc_c, oacc_s, opeak = (next(it) for _ in range(3))
        (opsi_py_lo, opsi_py_hi, opsi_pz_lo, opsi_pz_hi,
         opsi_vy_lo, opsi_vy_hi, opsi_vz_lo, opsi_vz_hi,
         opsixp_lo, opsixp_hi, opsixv_lo, opsixv_hi) = (
            next(it) for _ in range(12)
        )
        p_ring, vx_ring, vx_tail, vy_ring, vz_ring = (
            next(it) for _ in range(5)
        )

        i = pl.program_id(0)
        incoming = p_ref[...]

        if point:
            ii_p = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
            jj_p = jax.lax.broadcasted_iota(jnp.int32, (1, N2, 1), 1)
            kk_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
            pmask = (
                (ii_p == li_pt) & (jj_p == j0_pt) & (kk_p == k0_pt)
            ).astype(jnp.float32)

        @pl.when(i < n_slabs)
        def _():
            p_ring[i % 3] = incoming

        # ---- velocity update for slab sv = i-1 ----
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            sv = i - 1
            prev2 = jnp.where(
                sv >= 1, p_ring[(i - 2) % 3][nb - 2 :], gp_lo_ref[...]
            )
            nxt2 = jnp.where(
                sv < n_slabs - 1, incoming[0:2], gp_hi_ref[...]
            )
            w = jnp.concatenate([prev2, p_ring[(i - 1) % 3], nxt2], axis=0)
            dpx = _C1 * (w[3 : 3 + nb] - w[2 : 2 + nb]) + _C2 * (
                w[4 : 4 + nb] - w[1 : 1 + nb]
            )
            dpx, npx_lo, npx_hi = _x_cpml_apply(
                dpx, psixp_lo_ref, psixp_hi_ref, bxh_l, axh_l, bxh_h, axh_h
            )
            ps = w[2 : 2 + nb]
            dpy = _d_plus_y(ps)
            dpz = _d_plus_z(ps)
            dpy, npy_lo, npy_hi = _apply_cpml_inplane(
                dpy, psi_py_lo_ref[...], psi_py_hi_ref[...],
                cyh_blo[...], cyh_alo[...], cyh_bhi[...], cyh_ahi[...], axis=1,
            )
            dpz, npz_lo, npz_hi = _apply_cpml_inplane(
                dpz, psi_pz_lo_ref[...], psi_pz_hi_ref[...],
                czh_blo[...], czh_alo[...], czh_bhi[...], czh_ahi[...], axis=2,
            )
            rho_inv = rho_ref[...]
            vx_new = vx_ref[...] - dt_dx * rho_inv * dpx
            vy_new = vy_ref[...] - dt_dx * rho_inv * dpy
            vz_new = vz_ref[...] - dt_dx * rho_inv * dpz
            if vol_src:
                vamp = vamp_ref[...]
                sv3 = (
                    tsrc_ref[0, 0] * vcph_ref[...]
                    + tsrc_ref[0, 1] * vsph_ref[...]
                ) * vamp
                on3 = vamp > 0
                vx_new = jnp.where(on3, sv3 * vox_ref[...], vx_new)
                vy_new = jnp.where(on3, sv3 * voy_ref[...], vy_new)
                vz_new = jnp.where(on3, sv3 * voz_ref[...], vz_new)
            else:
                amp = amp_ref[...]
                sval = (tsrc_ref[0, 0] * cph_ref[...]
                        + tsrc_ref[0, 1] * sph_ref[...])
                z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
                on_src = (z_iota == zsrc) & (amp > 0)
                vz_new = jnp.where(on_src, sval * amp, vz_new)
            ovx[...] = vx_new
            ovy[...] = vy_new
            ovz[...] = vz_new
            opsi_py_lo[...] = npy_lo
            opsi_py_hi[...] = npy_hi
            opsi_pz_lo[...] = npz_lo
            opsi_pz_hi[...] = npz_hi
            opsixp_lo[...] = npx_lo
            opsixp_hi[...] = npx_hi

        # ---- pressure update for slab sp = i-2 ----
        @pl.when(i >= 2)
        def _():
            sp = i - 2
            prev2 = jnp.where(sp >= 1, vx_tail[...], gv_lo_ref[...])
            nxt2 = jnp.where(sp < n_slabs - 1, ovx[0:2], gv_hi_ref[...])
            w = jnp.concatenate(
                [prev2, vx_ring[(i - 2) % 2], nxt2], axis=0
            )
            dvx = _C1 * (w[2 : 2 + nb] - w[1 : 1 + nb]) + _C2 * (
                w[3 : 3 + nb] - w[0:nb]
            )
            dvx, nvx_lo2, nvx_hi2 = _x_cpml_apply(
                dvx, psixv_lo_ref, psixv_hi_ref, bxi_l, axi_l, bxi_h, axi_h
            )
            opsixv_lo[...] = nvx_lo2
            opsixv_hi[...] = nvx_hi2
            dvy = _d_minus_y(vy_ring[0])
            dvz = _d_minus_z(vz_ring[0])
            dvy, nvy_lo, nvy_hi = _apply_cpml_inplane(
                dvy, psi_vy_lo_ref[...], psi_vy_hi_ref[...],
                cyi_blo[...], cyi_alo[...], cyi_bhi[...], cyi_ahi[...], axis=1,
            )
            dvz, nvz_lo, nvz_hi = _apply_cpml_inplane(
                dvz, psi_vz_lo_ref[...], psi_vz_hi_ref[...],
                czi_blo[...], czi_alo[...], czi_bhi[...], czi_ahi[...], axis=2,
            )
            theta = dvx + dvy + dvz
            p_old = p_ring[(i - 2) % 3]
            if viscous:
                r_old = r_ref[...]
                new_r = br_ref[...] * r_old - crp_ref[...] * theta * inv_dx
                p_new = (
                    p_old
                    - dt_dx * piu_ref[...] * theta
                    - dt * 0.5 * (new_r + r_old)
                )
                orr[...] = new_r
            else:
                p_new = p_old - dt_dx * piu_ref[...] * theta
                orr[...] = r_ref[...]
            if point:
                sel = (sp == s_pt).astype(jnp.float32)
                p_new = p_new + psrc_ref[0, 0] * sel * pmask
            op[...] = p_new
            opsi_vy_lo[...] = nvy_lo
            opsi_vy_hi[...] = nvy_hi
            opsi_vz_lo[...] = nvz_lo
            opsi_vz_hi[...] = nvz_hi
            if with_dft:
                cosw = scal_ref[0, 0]
                sinw = scal_ref[0, 1]
                oacc_c[...] = acc_c_ref[...] + p_new * cosw
                oacc_s[...] = acc_s_ref[...] + p_new * sinw
                opeak[...] = jnp.maximum(
                    peak_ref[...],
                    jnp.abs(p_new) * (cosw * cosw + sinw * sinw > 0),
                )
            vx_tail[...] = vx_ring[(i - 2) % 2][nb - 2 :]

        # stash this iteration's velocities for the next two iterations
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            vx_ring[(i - 1) % 2] = ovx[...]
            vy_ring[0] = ovy[...]
            vz_ring[0] = ovz[...]

    plane = lambda: pl.BlockSpec((nb, N2, 1), lag1, memory_space=pltpu.VMEM)
    smem = lambda: pl.BlockSpec((1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM)
    n_acc = 3 if with_dft else 0
    vol = lambda: jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)

    in_specs = (
        [slab(cur)]                                   # p
        + [slab(lag1)] * 3                            # vx, vy, vz
        + [slab(lag2)]                                # r
        + [slab(lag1)]                                # rho_inv
        + [slab(lag2)] * 3                            # piu, crp, br
        + [slab(lag2)] * n_acc                        # accs
        + [slab_y(lag1), slab_y(lag1), slab_z(lag1), slab_z(lag1)]  # psi_p
        + [slab_y(lag2), slab_y(lag2), slab_z(lag2), slab_z(lag2)]  # psi_v
        + [ghost_spec] * 4                            # gp_lo/hi, gv_lo/hi
        + ([] if vol_src
           else [plane(), plane(), plane()])          # src amp/cos/sin
        + [smem()]                                    # tsrc
        + ([slab(lag1)] * 6 if vol_src else [])       # dome drive volumes
        + ([smem()] if point else [])                 # psrc
        + ([smem()] if with_dft else [])              # scal
        + [coef_y] * 4 + [coef_z] * 4                 # half profiles
        + [coef_y] * 4 + [coef_z] * 4                 # int profiles
        + [psix1(lo1), psix1(hi_of(1))]
        + [coefx1(lo1), coefx1(lo1), coefx1(hi_of(1)), coefx1(hi_of(1))]
        + [psix1(lo2), psix1(hi_of(2))]
        + [coefx1(lo2), coefx1(lo2), coefx1(hi_of(2)), coefx1(hi_of(2))]
    )
    out_specs = (
        [slab(lag1)] * 3                              # vx, vy, vz
        + [slab(lag2)] * 2                            # p, r
        + [slab(lag2)] * n_acc
        + [slab_y(lag1), slab_y(lag1), slab_z(lag1), slab_z(lag1)]
        + [slab_y(lag2), slab_y(lag2), slab_z(lag2), slab_z(lag2)]
        + [psix1(lo1), psix1(hi_of(1)), psix1(lo2), psix1(hi_of(2))]
    )
    out_shape = (
        [vol()] * (5 + n_acc)
        + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 2
        + [psix_shape] * 4
    )
    # aliases: vx/vy/vz, p, r, accs, the 8 psi y/z slabs, the 4 psix arrays
    aliases = {1: 0, 2: 1, 3: 2, 0: 3, 4: 4}
    for a in range(n_acc):
        aliases[9 + a] = 5 + a
    for a in range(8):
        aliases[9 + n_acc + a] = 5 + n_acc + a
    # inputs: 9 fields/coefs, n_acc accs, 8 psi y/z, 4 ghosts, 3 src planes,
    # tsrc smem, (6 dome drives), (psrc), (scal), 16 y/z profile constants
    # -> first psix input
    base_in = (9 + n_acc + 8 + 4 + (6 if vol_src else 3) + 1
               + (1 if point else 0)
               + (1 if with_dft else 0) + 16)
    aliases[base_in] = 13 + n_acc          # psixp_lo
    aliases[base_in + 1] = 14 + n_acc      # psixp_hi
    aliases[base_in + 6] = 15 + n_acc      # psixv_lo
    aliases[base_in + 7] = 16 + n_acc      # psixv_hi

    call = pl.pallas_call(
        kernel,
        grid=(n_slabs + 2,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((3, nb, N2, N3), jnp.float32),  # p ring
            pltpu.VMEM((2, nb, N2, N3), jnp.float32),  # vx ring
            pltpu.VMEM((2, N2, N3), jnp.float32),      # vx tail
            pltpu.VMEM((1, nb, N2, N3), jnp.float32),  # vy ring
            pltpu.VMEM((1, nb, N2, N3), jnp.float32),  # vz ring
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )
    coefs = {
        "y_half": tuple(jnp.asarray(c) for c in by),
        "z_half": tuple(jnp.asarray(c) for c in bz),
        "y_int": tuple(jnp.asarray(c) for c in by_i),
        "z_int": tuple(jnp.asarray(c) for c in bz_i),
        "x_half_pack": _pack_x_coefs(profiles_np, "half", ns, nb, kx),
        "x_int_pack": _pack_x_coefs(profiles_np, "int", ns, nb, kx),
        "px_planes": px_planes,
    }
    return call, coefs


def build_fluid_fused2_step(grid, profiles_np, viscous, oz_scale, nb=4,
                            interpret=False, with_dft=True, edge_offset=0):
    """TWO timesteps per streaming sweep (temporal blocking).

    The single-step fused kernel is HBM-bound at ~15 volume-equivalents per
    step; running two leapfrog steps per sweep amortizes every stream over
    two updates (~7.5 volumes/step). Pipeline at grid iteration i:

        V1 slab i-1   velocity(t)  from p(t) ring        (p0 ring, depth 3)
        P1 slab i-2   pressure(t)  from v(t+1/2) rings   (vx1 d3, vy1/vz1 d2)
        V2 slab i-3   velocity(t+1) from p(t+1) ring     (p1 ring, depth 3)
        P2 slab i-4   pressure(t+1), DFT/peak for BOTH steps

    Outputs: velocities at lag-3 (v of t+1), p/r/accumulators at lag-4;
    grid runs n_slabs + 4 iterations. CPML psi memories stream in at the
    first-visit lag, live in small VMEM rings between their two updates,
    and stream out at the second-visit lag. Numerics are the identical
    update equations twice, so results are bit-equal to two applications
    of the single-step kernel. Requires n_slabs >= kx + 3 and an even
    number of steps inside each scan phase (the driver pairs steps).
    """
    N1, N2, N3 = grid.shape
    if N1 % nb:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb}")
    ns = grid.npml + 2
    n_slabs = N1 // nb
    dt_dx = np.float32(grid.dt / grid.dx)
    dt = np.float32(grid.dt)
    inv_dx = np.float32(1.0 / grid.dx)
    zsrc = grid.source_plane_z
    point = grid.source_type == "stress_point"
    if point:
        # fluid point source (CT-mode refocus backprop,
        # `BabelIntegrationBASE.py:2374`): injected in-kernel at the
        # pressure stages so the fused sweep stays exact
        i0_pt, j0_pt, k0_pt = (int(v) for v in grid.source_ijk)
        s_pt, li_pt = divmod(i0_pt, nb)

    by = _make_profiles_const(profiles_np, 1, "half", ns)
    bz = _make_profiles_const(profiles_np, 2, "half", ns)
    by_i = _make_profiles_const(profiles_np, 1, "int", ns)
    bz_i = _make_profiles_const(profiles_np, 2, "int", ns)

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    coef_y = pl.BlockSpec((1, ns, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    coef_z = pl.BlockSpec((1, 1, ns), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    slab_y = lambda idx: pl.BlockSpec((nb, ns, N3), idx, memory_space=pltpu.VMEM)
    slab_z = lambda idx: pl.BlockSpec((nb, N2, ns), idx, memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)

    def lagk(k):
        return lambda i: (jnp.minimum(jnp.maximum(i - k, 0), n_slabs - 1), 0, 0)

    ghost_spec = pl.BlockSpec(
        (2, N2, N3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )

    kx = -(-ns // nb)
    if n_slabs < kx + 3:
        raise ValueError(f"N1={N1} too small for the 2-step fused pipeline")
    px_planes = (kx + 1) * nb
    h0 = int(edge_offset)

    def lo_of(lag):
        return lambda i: (jnp.minimum(jnp.maximum(i - lag - h0, 0), kx),
                          0, 0)

    def hi_of(lag):
        base = n_slabs - kx - h0

        def m(i):
            s = jnp.minimum(jnp.maximum(i - lag, 0), n_slabs - 1)
            return (jnp.where((s >= base) & (s < n_slabs - h0), s - base,
                              kx), 0, 0)
        return m

    psixb = lambda m: pl.BlockSpec((nb, N2, N3), m, memory_space=pltpu.VMEM)
    coefxb = lambda m: pl.BlockSpec((nb, 1, 1), m, memory_space=pltpu.VMEM)
    psix_shape = jax.ShapeDtypeStruct((px_planes, N2, N3), jnp.float32)

    def kernel(*refs):
        it = iter(refs)
        p_ref, vx_ref, vy_ref, vz_ref = (next(it) for _ in range(4))
        r_ref, rho_ref, piu_ref, crp_ref, br_ref = (next(it) for _ in range(5))
        if with_dft:
            acc_c_ref, acc_s_ref, peak_ref = (next(it) for _ in range(3))
        (psi_py_lo_ref, psi_py_hi_ref, psi_pz_lo_ref, psi_pz_hi_ref,
         psi_vy_lo_ref, psi_vy_hi_ref, psi_vz_lo_ref, psi_vz_hi_ref) = (
            next(it) for _ in range(8)
        )
        ghost_ref = next(it)  # zeros (single-device x extent)
        (amp1_ref, cph1_ref, sph1_ref, amp3_ref, cph3_ref, sph3_ref) = (
            next(it) for _ in range(6)
        )
        tsrc_ref = next(it)  # (2, 2): [sin(wt)*sc, cos(wt)*sc] per step
        if point:
            psrc_ref = next(it)  # (2, 2): [-amp*sin(wt)*ramp, 0] per step
        if with_dft:
            scal_ref = next(it)  # (2, 2): [cos*m, sin*m] per step
        cyh_c = tuple(next(it) for _ in range(4))
        czh_c = tuple(next(it) for _ in range(4))
        cyi_c = tuple(next(it) for _ in range(4))
        czi_c = tuple(next(it) for _ in range(4))
        (psixp1_lo_ref, psixp1_hi_ref, psixv2_lo_ref, psixv2_hi_ref) = (
            next(it) for _ in range(4)
        )
        (bxh_l1, axh_l1, bxh_h1, axh_h1,
         bxh_l3, axh_l3, bxh_h3, axh_h3,
         bxi_l2, axi_l2, bxi_h2, axi_h2,
         bxi_l4, axi_l4, bxi_h4, axi_h4) = (next(it) for _ in range(16))
        ovx, ovy, ovz, op, orr = (next(it) for _ in range(5))
        if with_dft:
            oacc_c, oacc_s, opeak = (next(it) for _ in range(3))
        (opsixp_lo, opsixp_hi, opsixv_lo, opsixv_hi) = (
            next(it) for _ in range(4)
        )
        (opsi_py_lo, opsi_py_hi, opsi_pz_lo, opsi_pz_hi,
         opsi_vy_lo, opsi_vy_hi, opsi_vz_lo, opsi_vz_hi) = (
            next(it) for _ in range(8)
        )
        (p0_ring, vx1_ring, vy1_ring, vz1_ring, p1_ring, r1_ring,
         vx2_ring, vy2_ring, vz2_ring,
         rho_ring, piu_ring, crp_ring, br_ring,
         ppy_lo_r, ppy_hi_r, ppz_lo_r, ppz_hi_r,
         pvy_lo_r, pvy_hi_r, pvz_lo_r, pvz_hi_r,
         pxp_lo_r, pxp_hi_r, pxv_lo_r, pxv_hi_r) = (
            next(it) for _ in range(25)
        )

        i = pl.program_id(0)
        incoming = p_ref[...]
        ghost = ghost_ref[...]

        if point:
            ii_p = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
            jj_p = jax.lax.broadcasted_iota(jnp.int32, (1, N2, 1), 1)
            kk_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
            pmask = (
                (ii_p == li_pt) & (jj_p == j0_pt) & (kk_p == k0_pt)
            ).astype(jnp.float32)

        def inject_point(p_n, sp, step_idx):
            if not point:
                return p_n
            sel = (sp == s_pt).astype(jnp.float32)
            return p_n + psrc_ref[step_idx, 0] * sel * pmask

        @pl.when(i < n_slabs)
        def _():
            p0_ring[i % 3] = incoming

        def vel_update(sv, w, rho_inv, v_in, psi_y, psi_z, psix_pair,
                       xc, amp, cph, sph, ts):
            """Shared velocity update; returns (vx, vy, vz, psi updates)."""
            dpx = _C1 * (w[3 : 3 + nb] - w[2 : 2 + nb]) + _C2 * (
                w[4 : 4 + nb] - w[1 : 1 + nb]
            )
            psix_lo, psix_hi = psix_pair
            new_lo = xc[0] * psix_lo + xc[1] * dpx
            new_hi = xc[2] * psix_hi + xc[3] * dpx
            dpx = dpx + new_lo + new_hi
            ps = w[2 : 2 + nb]
            dpy = _d_plus_y(ps)
            dpz = _d_plus_z(ps)
            dpy, npy_lo, npy_hi = _apply_cpml_inplane(
                dpy, psi_y[0], psi_y[1],
                cyh_c[0][...], cyh_c[1][...], cyh_c[2][...], cyh_c[3][...],
                axis=1,
            )
            dpz, npz_lo, npz_hi = _apply_cpml_inplane(
                dpz, psi_z[0], psi_z[1],
                czh_c[0][...], czh_c[1][...], czh_c[2][...], czh_c[3][...],
                axis=2,
            )
            vx_n = v_in[0] - dt_dx * rho_inv * dpx
            vy_n = v_in[1] - dt_dx * rho_inv * dpy
            vz_n = v_in[2] - dt_dx * rho_inv * dpz
            sval = ts[0] * cph + ts[1] * sph
            z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
            on_src = (z_iota == zsrc) & (amp > 0)
            vz_n = jnp.where(on_src, sval * amp, vz_n)
            return (vx_n, vy_n, vz_n, npy_lo, npy_hi, npz_lo, npz_hi,
                    new_lo, new_hi)

        def press_update(sp, w, vy_s, vz_s, p_old, r_old, piu, crp, br,
                         psi_y, psi_z, psix_pair, xc):
            dvx = _C1 * (w[2 : 2 + nb] - w[1 : 1 + nb]) + _C2 * (
                w[3 : 3 + nb] - w[0:nb]
            )
            psix_lo, psix_hi = psix_pair
            new_lo = xc[0] * psix_lo + xc[1] * dvx
            new_hi = xc[2] * psix_hi + xc[3] * dvx
            dvx = dvx + new_lo + new_hi
            dvy = _d_minus_y(vy_s)
            dvz = _d_minus_z(vz_s)
            dvy, nvy_lo, nvy_hi = _apply_cpml_inplane(
                dvy, psi_y[0], psi_y[1],
                cyi_c[0][...], cyi_c[1][...], cyi_c[2][...], cyi_c[3][...],
                axis=1,
            )
            dvz, nvz_lo, nvz_hi = _apply_cpml_inplane(
                dvz, psi_z[0], psi_z[1],
                czi_c[0][...], czi_c[1][...], czi_c[2][...], czi_c[3][...],
                axis=2,
            )
            theta = dvx + dvy + dvz
            if viscous:
                r_new = br * r_old - crp * theta * inv_dx
                p_new = (
                    p_old - dt_dx * piu * theta - dt * 0.5 * (r_new + r_old)
                )
            else:
                r_new = r_old
                p_new = p_old - dt_dx * piu * theta
            return (p_new, r_new, nvy_lo, nvy_hi, nvz_lo, nvz_hi,
                    new_lo, new_hi)

        # ---- V1: velocity(t) for slab i-1 ----
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            sv = i - 1
            prev2 = jnp.where(sv >= 1, p0_ring[(i - 2) % 3][nb - 2 :], ghost)
            nxt2 = jnp.where(sv < n_slabs - 1, incoming[0:2], ghost)
            w = jnp.concatenate([prev2, p0_ring[(i - 1) % 3], nxt2], axis=0)
            (vx_n, vy_n, vz_n, npy_lo, npy_hi, npz_lo, npz_hi,
             nxp_lo, nxp_hi) = vel_update(
                sv, w, rho_ref[...],
                (vx_ref[...], vy_ref[...], vz_ref[...]),
                (psi_py_lo_ref[...], psi_py_hi_ref[...]),
                (psi_pz_lo_ref[...], psi_pz_hi_ref[...]),
                (psixp1_lo_ref[...], psixp1_hi_ref[...]),
                (bxh_l1[...], axh_l1[...], bxh_h1[...], axh_h1[...]),
                amp1_ref[...], cph1_ref[...], sph1_ref[...],
                (tsrc_ref[0, 0], tsrc_ref[0, 1]),
            )
            vx1_ring[sv % 3] = vx_n
            vy1_ring[sv % 3] = vy_n
            vz1_ring[sv % 3] = vz_n
            ppy_lo_r[sv % 3] = npy_lo
            ppy_hi_r[sv % 3] = npy_hi
            ppz_lo_r[sv % 3] = npz_lo
            ppz_hi_r[sv % 3] = npz_hi
            pxp_lo_r[sv % 3] = nxp_lo
            pxp_hi_r[sv % 3] = nxp_hi

        # ---- P1: pressure(t) for slab i-2 ----
        @pl.when((i >= 2) & (i <= n_slabs + 1))
        def _():
            sp = i - 2
            prev2 = jnp.where(sp >= 1, vx1_ring[(sp - 1) % 3][nb - 2 :], ghost)
            nxt2 = jnp.where(sp < n_slabs - 1, vx1_ring[(sp + 1) % 3][0:2],
                             ghost)
            w = jnp.concatenate([prev2, vx1_ring[sp % 3], nxt2], axis=0)
            (p_n, r_n, nvy_lo, nvy_hi, nvz_lo, nvz_hi,
             nxv_lo, nxv_hi) = press_update(
                sp, w, vy1_ring[sp % 3], vz1_ring[sp % 3],
                p0_ring[sp % 3], r_ref[...],
                piu_ref[...], crp_ref[...], br_ref[...],
                (psi_vy_lo_ref[...], psi_vy_hi_ref[...]),
                (psi_vz_lo_ref[...], psi_vz_hi_ref[...]),
                (psixv2_lo_ref[...], psixv2_hi_ref[...]),
                (bxi_l2[...], axi_l2[...], bxi_h2[...], axi_h2[...]),
            )
            p_n = inject_point(p_n, sp, 0)
            p1_ring[sp % 3] = p_n
            r1_ring[sp % 3] = r_n
            pvy_lo_r[sp % 3] = nvy_lo
            pvy_hi_r[sp % 3] = nvy_hi
            pvz_lo_r[sp % 3] = nvz_lo
            pvz_hi_r[sp % 3] = nvz_hi
            pxv_lo_r[sp % 3] = nxv_lo
            pxv_hi_r[sp % 3] = nxv_hi

        # ---- V2: velocity(t+1) for slab i-3 ----
        @pl.when((i >= 3) & (i <= n_slabs + 2))
        def _():
            sv = i - 3
            prev2 = jnp.where(sv >= 1, p1_ring[(sv - 1) % 3][nb - 2 :], ghost)
            nxt2 = jnp.where(sv < n_slabs - 1, p1_ring[(sv + 1) % 3][0:2],
                             ghost)
            w = jnp.concatenate([prev2, p1_ring[sv % 3], nxt2], axis=0)
            (vx_n, vy_n, vz_n, npy_lo, npy_hi, npz_lo, npz_hi,
             nxp_lo, nxp_hi) = vel_update(
                sv, w, rho_ring[sv % 2],
                (vx1_ring[sv % 3], vy1_ring[sv % 3], vz1_ring[sv % 3]),
                (ppy_lo_r[sv % 3], ppy_hi_r[sv % 3]),
                (ppz_lo_r[sv % 3], ppz_hi_r[sv % 3]),
                (pxp_lo_r[sv % 3], pxp_hi_r[sv % 3]),
                (bxh_l3[...], axh_l3[...], bxh_h3[...], axh_h3[...]),
                amp3_ref[...], cph3_ref[...], sph3_ref[...],
                (tsrc_ref[1, 0], tsrc_ref[1, 1]),
            )
            vx2_ring[sv % 3] = vx_n
            vy2_ring[sv % 2] = vy_n
            vz2_ring[sv % 2] = vz_n
            ovx[...] = vx_n
            ovy[...] = vy_n
            ovz[...] = vz_n
            opsi_py_lo[...] = npy_lo
            opsi_py_hi[...] = npy_hi
            opsi_pz_lo[...] = npz_lo
            opsi_pz_hi[...] = npz_hi
            opsixp_lo[...] = nxp_lo
            opsixp_hi[...] = nxp_hi

        # ---- P2: pressure(t+1) for slab i-4, DFT for both steps ----
        @pl.when(i >= 4)
        def _():
            sp = i - 4
            prev2 = jnp.where(sp >= 1, vx2_ring[(sp - 1) % 3][nb - 2 :], ghost)
            nxt2 = jnp.where(sp < n_slabs - 1, vx2_ring[(sp + 1) % 3][0:2],
                             ghost)
            w = jnp.concatenate([prev2, vx2_ring[sp % 3], nxt2], axis=0)
            p1s = p1_ring[sp % 3]
            (p_n, r_n, nvy_lo, nvy_hi, nvz_lo, nvz_hi,
             nxv_lo, nxv_hi) = press_update(
                sp, w, vy2_ring[sp % 2], vz2_ring[sp % 2],
                p1s, r1_ring[sp % 3],
                piu_ring[sp % 2], crp_ring[sp % 2], br_ring[sp % 2],
                (pvy_lo_r[sp % 3], pvy_hi_r[sp % 3]),
                (pvz_lo_r[sp % 3], pvz_hi_r[sp % 3]),
                (pxv_lo_r[sp % 3], pxv_hi_r[sp % 3]),
                (bxi_l4[...], axi_l4[...], bxi_h4[...], axi_h4[...]),
            )
            p_n = inject_point(p_n, sp, 1)
            op[...] = p_n
            orr[...] = r_n
            opsi_vy_lo[...] = nvy_lo
            opsi_vy_hi[...] = nvy_hi
            opsi_vz_lo[...] = nvz_lo
            opsi_vz_hi[...] = nvz_hi
            opsixv_lo[...] = nxv_lo
            opsixv_hi[...] = nxv_hi
            if with_dft:
                c1, s1 = scal_ref[0, 0], scal_ref[0, 1]
                c2, s2 = scal_ref[1, 0], scal_ref[1, 1]
                oacc_c[...] = acc_c_ref[...] + p1s * c1 + p_n * c2
                oacc_s[...] = acc_s_ref[...] + p1s * s1 + p_n * s2
                opeak[...] = jnp.maximum(
                    peak_ref[...],
                    jnp.maximum(
                        jnp.abs(p1s) * (c1 * c1 + s1 * s1 > 0),
                        jnp.abs(p_n) * (c2 * c2 + s2 * s2 > 0),
                    ),
                )

        # end-of-body material stashes (read by V2/P2 two iterations later)
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            rho_ring[(i - 1) % 2] = rho_ref[...]

        @pl.when((i >= 2) & (i <= n_slabs + 1))
        def _():
            piu_ring[(i - 2) % 2] = piu_ref[...]
            crp_ring[(i - 2) % 2] = crp_ref[...]
            br_ring[(i - 2) % 2] = br_ref[...]

    plane1 = lambda: pl.BlockSpec((nb, N2, 1), lagk(1), memory_space=pltpu.VMEM)
    plane3 = lambda: pl.BlockSpec((nb, N2, 1), lagk(3), memory_space=pltpu.VMEM)
    smem22 = lambda: pl.BlockSpec((2, 2), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    n_acc = 3 if with_dft else 0
    vol = lambda: jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)

    in_specs = (
        [slab(cur)]                                   # p
        + [slab(lagk(1))] * 3                         # vx, vy, vz
        + [slab(lagk(2))]                             # r
        + [slab(lagk(1))]                             # rho_inv
        + [slab(lagk(2))] * 3                         # piu, crp, br
        + [slab(lagk(4))] * n_acc                     # accs
        + [slab_y(lagk(1)), slab_y(lagk(1)),
           slab_z(lagk(1)), slab_z(lagk(1))]          # psi_p (first visit)
        + [slab_y(lagk(2)), slab_y(lagk(2)),
           slab_z(lagk(2)), slab_z(lagk(2))]          # psi_v (first visit)
        + [ghost_spec]                                # zero ghost
        + [plane1(), plane1(), plane1(),
           plane3(), plane3(), plane3()]              # src planes x2 lags
        + [smem22()]                                  # tsrc (2 steps)
        + ([smem22()] if point else [])               # psrc (2 steps)
        + ([smem22()] if with_dft else [])            # scal (2 steps)
        + [coef_y] * 4 + [coef_z] * 4                 # half profiles
        + [coef_y] * 4 + [coef_z] * 4                 # int profiles
        + [psixb(lo_of(1)), psixb(hi_of(1)),
           psixb(lo_of(2)), psixb(hi_of(2))]          # psix first visits
        + [coefxb(lo_of(1)), coefxb(lo_of(1)),
           coefxb(hi_of(1)), coefxb(hi_of(1))]        # x half coefs @V1
        + [coefxb(lo_of(3)), coefxb(lo_of(3)),
           coefxb(hi_of(3)), coefxb(hi_of(3))]        # x half coefs @V2
        + [coefxb(lo_of(2)), coefxb(lo_of(2)),
           coefxb(hi_of(2)), coefxb(hi_of(2))]        # x int coefs @P1
        + [coefxb(lo_of(4)), coefxb(lo_of(4)),
           coefxb(hi_of(4)), coefxb(hi_of(4))]        # x int coefs @P2
    )
    out_specs = (
        [slab(lagk(3))] * 3                           # vx, vy, vz (t+1)
        + [slab(lagk(4))] * 2                         # p, r (t+1)
        + [slab(lagk(4))] * n_acc
        + [psixb(lo_of(3)), psixb(hi_of(3)),
           psixb(lo_of(4)), psixb(hi_of(4))]          # psix second visits
        + [slab_y(lagk(3)), slab_y(lagk(3)),
           slab_z(lagk(3)), slab_z(lagk(3))]          # psi_p out
        + [slab_y(lagk(4)), slab_y(lagk(4)),
           slab_z(lagk(4)), slab_z(lagk(4))]          # psi_v out
    )
    out_shape = (
        [vol()] * (5 + n_acc)
        + [psix_shape] * 4
        + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 2
        + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 2
    )
    # aliases: fields, accs, psix, psi y/z
    aliases = {1: 0, 2: 1, 3: 2, 0: 3, 4: 4}
    for a in range(n_acc):
        aliases[9 + a] = 5 + a
    psix_in0 = (9 + n_acc + 8 + 1 + 6 + 1 + (1 if point else 0)
                + (1 if with_dft else 0) + 16)
    for a in range(4):  # psix
        aliases[psix_in0 + a] = 5 + n_acc + a
    for a in range(8):  # psi y/z
        aliases[9 + n_acc + a] = 9 + n_acc + a

    ring_slab = lambda d: pltpu.VMEM((d, nb, N2, N3), jnp.float32)
    ring_y = lambda d: pltpu.VMEM((d, nb, ns, N3), jnp.float32)
    ring_z = lambda d: pltpu.VMEM((d, nb, N2, ns), jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(n_slabs + 4,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            ring_slab(3),            # p0
            ring_slab(3), ring_slab(3), ring_slab(3),  # vx1, vy1, vz1
            ring_slab(3), ring_slab(3),                # p1, r1
            ring_slab(3), ring_slab(2), ring_slab(2),  # vx2, vy2, vz2
            ring_slab(2), ring_slab(2), ring_slab(2), ring_slab(2),  # mats
            ring_y(3), ring_y(3), ring_z(3), ring_z(3),  # psi_p rings
            ring_y(3), ring_y(3), ring_z(3), ring_z(3),  # psi_v rings
            ring_slab(3), ring_slab(3),                  # psix_p rings
            ring_slab(3), ring_slab(3),                  # psix_v rings
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )
    coefs = {
        "y_half": tuple(jnp.asarray(c) for c in by),
        "z_half": tuple(jnp.asarray(c) for c in bz),
        "y_int": tuple(jnp.asarray(c) for c in by_i),
        "z_int": tuple(jnp.asarray(c) for c in bz_i),
        "x_half_pack": _pack_x_coefs(profiles_np, "half", ns, nb, kx),
        "x_int_pack": _pack_x_coefs(profiles_np, "int", ns, nb, kx),
        "px_planes": px_planes,
    }
    return call, coefs


# ---------------------------------------------------------------------------
# full-step integration (kernels + jnp x-CPML post-passes + source)
# ---------------------------------------------------------------------------


def make_fluid_pallas_step(grid, profiles_np, viscous, oz_scale, nb=2,
                           comm=None, interpret=False, with_dft=True,
                           fused=None):
    """Build the complete per-timestep function for lax.scan.

    Carry layout: dict with fields (p, vx, vy, vz, r), psi blocks (y/z in
    kernel-layout arrays + x slab pairs), props, accumulators, sources.

    With ``comm`` (a ``parallel.halo.DomainComm`` used inside shard_map) the
    x axis is domain-decomposed: 2-plane ghost exchanges feed the kernels'
    x-stencil windows and the x-CPML post-passes are masked to the global
    edge shards. ``interpret=True`` runs the kernels in pallas interpret
    mode (CPU-mesh testing). ``with_dft=False`` builds the quiet-phase step
    (pre-sensor-window): the DFT/peak accumulators pass through the carry
    untouched instead of streaming through the kernel.

    ``fused`` selects the single-sweep kernel (build_fluid_fused_step, ~1.3x
    less HBM traffic). Default: on when the x axis is not sharded (the fused
    pipeline needs freshly-updated velocity ghosts, which only exist between
    kernels when x is decomposed).
    """
    N1, N2, N3 = grid.shape
    ns = grid.npml + 2
    dt_dx = grid.dt / grid.dx
    omega = 2.0 * np.pi * grid.frequency
    zsrc = grid.source_plane_z

    if comm is None:
        from ..parallel.halo import DomainComm

        comm = DomainComm()
    if fused is None:
        fused = not (comm.sharded_x or comm.sharded_y)
    if fused:
        return _make_fluid_fused_step_fn(
            grid, profiles_np, viscous, oz_scale, nb, comm,
            interpret, with_dft,
        )

    vel_call, press_call, kcoefs = build_fluid_pallas_step(
        grid, profiles_np, viscous, oz_scale, nb, interpret=interpret,
        with_dft=with_dft,
    )

    bxh_lo, axh_lo, bxh_hi, axh_hi = (
        jnp.asarray(c) for c in kcoefs["x_half_pack"]
    )
    bxi_lo, axi_lo, bxi_hi, axi_hi = (
        jnp.asarray(c) for c in kcoefs["x_int_pack"]
    )

    def step(carry, n):
        s = carry
        f = s["fields"]
        pr = s["props"]
        t = n.astype(jnp.float32) * grid.dt

        # under domain decomposition only the global-edge shards apply the
        # x-PML; the masks fold into the feed (a) coefficients
        is_first, is_last = comm.edge_masks()

        # ---- velocity kernel (CW plane source + x-CPML fused in) ----
        ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt
        ramp = jnp.where(
            n < ramp_steps, 0.5 * (1.0 - jnp.cos(np.pi * n / ramp_steps)), 1.0
        ).astype(jnp.float32)
        scale = ramp * oz_scale
        tsrc = jnp.stack(
            [jnp.sin(omega * t) * scale, jnp.cos(omega * t) * scale]
        ).reshape(1, 2)
        gp_lo, gp_hi = comm.ghosts(f["p"])
        (
            vx, vy, vz, psi_py_lo, psi_py_hi, psi_pz_lo, psi_pz_hi,
            psix_p_lo, psix_p_hi,
        ) = vel_call(
            f["p"], f["vx"], f["vy"], f["vz"], pr["rho_inv"],
            s["psi_py_lo"], s["psi_py_hi"], s["psi_pz_lo"], s["psi_pz_hi"],
            gp_lo, gp_hi,
            s["src_amp"], s["src_cph"], s["src_sph"], tsrc,
            *kcoefs["y_half"], *kcoefs["z_half"],
            s["psix_p_lo"], s["psix_p_hi"],
            bxh_lo, axh_lo * is_first, bxh_hi, axh_hi * is_last,
        )

        # ---- pressure kernel (x-CPML fused in) ----
        gv_lo, gv_hi = comm.ghosts(vx)
        if with_dft:
            in_window = (n >= grid.sensor_start).astype(jnp.float32)
            cosw = jnp.cos(omega * t) * in_window
            sinw = jnp.sin(omega * t) * in_window
            scal = jnp.stack([cosw, sinw]).reshape(1, 2)
            acc_args = (s["acc_cos"], s["acc_sin"], s["peak"])
            scal_args = (scal,)
        else:
            acc_args = scal_args = ()
        outs = press_call(
            vx, vy, vz, f["p"], f["r"],
            pr["pi_u"], pr["c_rp"], pr["b_r"],
            *acc_args,
            s["psi_vy_lo"], s["psi_vy_hi"], s["psi_vz_lo"], s["psi_vz_hi"],
            gv_lo, gv_hi,
            *scal_args,
            *kcoefs["y_int"], *kcoefs["z_int"],
            s["psix_v_lo"], s["psix_v_hi"],
            bxi_lo, axi_lo * is_first, bxi_hi, axi_hi * is_last,
        )
        if with_dft:
            (
                p_new, r_new, acc_c, acc_s, peak,
                psi_vy_lo, psi_vy_hi, psi_vz_lo, psi_vz_hi,
                psix_v_lo, psix_v_hi,
            ) = outs
        else:
            (
                p_new, r_new,
                psi_vy_lo, psi_vy_hi, psi_vz_lo, psi_vz_hi,
                psix_v_lo, psix_v_hi,
            ) = outs
            acc_c, acc_s, peak = s["acc_cos"], s["acc_sin"], s["peak"]
            in_window = cosw = sinw = None

        if grid.source_type == "stress_point":
            s, p_new, acc_c, acc_s, peak = _fluid_point_post(
                s, p_new, acc_c, acc_s, peak, grid, comm, n, omega, ramp,
                in_window, cosw, sinw, with_dft,
            )

        new_carry = dict(
            s,
            fields=dict(p=p_new, vx=vx, vy=vy, vz=vz, r=r_new),
            psi_py_lo=psi_py_lo, psi_py_hi=psi_py_hi,
            psi_pz_lo=psi_pz_lo, psi_pz_hi=psi_pz_hi,
            psi_vy_lo=psi_vy_lo, psi_vy_hi=psi_vy_hi,
            psi_vz_lo=psi_vz_lo, psi_vz_hi=psi_vz_hi,
            psix_p_lo=psix_p_lo, psix_p_hi=psix_p_hi,
            psix_v_lo=psix_v_lo, psix_v_hi=psix_v_hi,
            acc_cos=acc_c, acc_sin=acc_s, peak=peak,
        )
        return new_carry, None

    return step


def _fluid_point_post(s, p_new, acc_c, acc_s, peak, grid, comm, n, omega,
                      ramp, in_window, cosw, sinw, with_dft):
    """Exact post-kernel fluid point-source correction for 1-step kernels.

    Mirrors the XLA order (pressure update -> injection -> DFT): the kernel
    accumulated the pre-injection pressure, so the single affected voxel's
    DFT terms are amended and its peak is re-tracked via the ``peak_src``
    carry scalar (same pattern as the visco post, below)."""
    N1 = p_new.shape[0]
    i0, j0, k0 = grid.source_ijk
    li = i0 - comm.local_x_offset(N1)
    own = ((li >= 0) & (li < N1)).astype(jnp.float32)
    lic = jnp.clip(li, 0, N1 - 1)
    t = n.astype(jnp.float32) * grid.dt
    sval = s["src_amp_point"] * jnp.sin(omega * t) * ramp * own
    p_new = p_new.at[lic, j0, k0].add(-sval)
    if with_dft:
        acc_c = acc_c.at[lic, j0, k0].add(-sval * cosw)
        acc_s = acc_s.at[lic, j0, k0].add(-sval * sinw)
        p_post = p_new[lic, j0, k0]
        peak_src = jnp.maximum(
            s["peak_src"], jnp.abs(p_post) * in_window * own
        )
        peak = peak.at[lic, j0, k0].set(
            jnp.where(own > 0, peak_src, peak[lic, j0, k0])
        )
        s = dict(s, peak_src=peak_src)
    return s, p_new, acc_c, acc_s, peak


def _make_fluid_fused_step_fn(grid, profiles_np, viscous, oz_scale, nb, comm,
                              interpret, with_dft, edge_offset=0,
                              xcoef_scale=None):
    """Step closure for the single-sweep fused kernel (x axis unsharded;
    y-sharding still works — in-plane ghosting is handled by the y psi/CPML
    masks exactly as in the two-kernel path since y derivatives never cross
    the kernel boundary here). ``edge_offset``/``xcoef_scale`` serve the
    sharded overlap driver (x-PML shifted inward and masked to the global
    edge shards)."""
    omega = 2.0 * np.pi * grid.frequency

    call, kcoefs = build_fluid_fused_step(
        grid, profiles_np, viscous, oz_scale, nb, interpret=interpret,
        with_dft=with_dft, edge_offset=edge_offset,
    )
    bxh_lo, axh_lo, bxh_hi, axh_hi = (
        jnp.asarray(c) for c in kcoefs["x_half_pack"]
    )
    bxi_lo, axi_lo, bxi_hi, axi_hi = (
        jnp.asarray(c) for c in kcoefs["x_int_pack"]
    )
    if xcoef_scale is not None:
        lo_s, hi_s = xcoef_scale
        bxh_lo, axh_lo = bxh_lo * lo_s, axh_lo * lo_s
        bxh_hi, axh_hi = bxh_hi * hi_s, axh_hi * hi_s
        bxi_lo, axi_lo = bxi_lo * lo_s, axi_lo * lo_s
        bxi_hi, axi_hi = bxi_hi * hi_s, axi_hi * hi_s
    N1, N2, N3 = grid.shape
    zero_ghost = jnp.zeros((2, N2, N3), jnp.float32)
    ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt
    point = grid.source_type == "stress_point"
    vol_src = grid.source_type == "velocity_volume"

    def step(carry, n):
        s = carry
        f = s["fields"]
        pr = s["props"]
        t = n.astype(jnp.float32) * grid.dt

        ramp = jnp.where(
            n < ramp_steps, 0.5 * (1.0 - jnp.cos(np.pi * n / ramp_steps)), 1.0
        ).astype(jnp.float32)
        scale = ramp * oz_scale
        tsrc = jnp.stack(
            [jnp.sin(omega * t) * scale, jnp.cos(omega * t) * scale]
        ).reshape(1, 2)
        if vol_src:
            vsrc_in = tuple(
                s[k] for k in ("srcv_amp", "srcv_cph", "srcv_sph",
                               "srcv_ox", "srcv_oy", "srcv_oz")
            )
        else:
            vsrc_in = ()
        if point:
            psrc_in = (_point_src_row(
                s["src_amp_point"], n, grid, omega, ramp_steps
            ).reshape(1, 2),)
        else:
            psrc_in = ()
        if with_dft:
            in_window = (n >= grid.sensor_start).astype(jnp.float32)
            cosw = jnp.cos(omega * t) * in_window
            sinw = jnp.sin(omega * t) * in_window
            scal = jnp.stack([cosw, sinw]).reshape(1, 2)
            acc_in = (s["acc_cos"], s["acc_sin"], s["peak"])
            scal_in = (scal,)
        else:
            acc_in = scal_in = ()

        outs = call(
            f["p"], f["vx"], f["vy"], f["vz"], f["r"],
            pr["rho_inv"], pr["pi_u"], pr["c_rp"], pr["b_r"],
            *acc_in,
            s["psi_py_lo"], s["psi_py_hi"], s["psi_pz_lo"], s["psi_pz_hi"],
            s["psi_vy_lo"], s["psi_vy_hi"], s["psi_vz_lo"], s["psi_vz_hi"],
            zero_ghost, zero_ghost, zero_ghost, zero_ghost,
            *(() if vol_src
              else (s["src_amp"], s["src_cph"], s["src_sph"])),
            tsrc,
            *vsrc_in,
            *psrc_in,
            *scal_in,
            *kcoefs["y_half"], *kcoefs["z_half"],
            *kcoefs["y_int"], *kcoefs["z_int"],
            s["psix_p_lo"], s["psix_p_hi"],
            bxh_lo, axh_lo, bxh_hi, axh_hi,
            s["psix_v_lo"], s["psix_v_hi"],
            bxi_lo, axi_lo, bxi_hi, axi_hi,
        )
        it = iter(outs)
        vx, vy, vz, p_new, r_new = (next(it) for _ in range(5))
        if with_dft:
            acc_c, acc_s, peak = (next(it) for _ in range(3))
        else:
            acc_c, acc_s, peak = s["acc_cos"], s["acc_sin"], s["peak"]
        (psi_py_lo, psi_py_hi, psi_pz_lo, psi_pz_hi,
         psi_vy_lo, psi_vy_hi, psi_vz_lo, psi_vz_hi,
         psix_p_lo, psix_p_hi, psix_v_lo, psix_v_hi) = (
            next(it) for _ in range(12)
        )
        new_carry = dict(
            s,
            fields=dict(p=p_new, vx=vx, vy=vy, vz=vz, r=r_new),
            psi_py_lo=psi_py_lo, psi_py_hi=psi_py_hi,
            psi_pz_lo=psi_pz_lo, psi_pz_hi=psi_pz_hi,
            psi_vy_lo=psi_vy_lo, psi_vy_hi=psi_vy_hi,
            psi_vz_lo=psi_vz_lo, psi_vz_hi=psi_vz_hi,
            psix_p_lo=psix_p_lo, psix_p_hi=psix_p_hi,
            psix_v_lo=psix_v_lo, psix_v_hi=psix_v_hi,
            acc_cos=acc_c, acc_sin=acc_s, peak=peak,
        )
        return new_carry, None

    return step


def _make_fluid_fused2_step_fn(grid, profiles_np, viscous, oz_scale, nb,
                               interpret, with_dft, edge_offset=0,
                               xcoef_scale=None):
    """Two-timestep step closure (scan over step PAIRS; n is the first of
    the two step indices)."""
    omega = 2.0 * np.pi * grid.frequency
    call, kcoefs = build_fluid_fused2_step(
        grid, profiles_np, viscous, oz_scale, nb, interpret=interpret,
        with_dft=with_dft, edge_offset=edge_offset,
    )
    xh = tuple(jnp.asarray(c) for c in kcoefs["x_half_pack"])
    xi = tuple(jnp.asarray(c) for c in kcoefs["x_int_pack"])
    if xcoef_scale is not None:
        xh, xi = _scale_xpacks(xh, xi, xcoef_scale)
    N1, N2, N3 = grid.shape
    zero_ghost = jnp.zeros((2, N2, N3), jnp.float32)
    ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt
    point = grid.source_type == "stress_point"

    def step(carry, n):
        s = carry
        f = s["fields"]
        pr = s["props"]

        def src_row(nk):
            t = nk.astype(jnp.float32) * grid.dt
            ramp = jnp.where(
                nk < ramp_steps,
                0.5 * (1.0 - jnp.cos(np.pi * nk / ramp_steps)), 1.0,
            ).astype(jnp.float32)
            sc = ramp * oz_scale
            return jnp.stack([jnp.sin(omega * t) * sc,
                              jnp.cos(omega * t) * sc])

        tsrc = jnp.stack([src_row(n), src_row(n + 1)])  # (2, 2)
        if point:
            psrc = jnp.stack(
                [_point_src_row(s["src_amp_point"], nk, grid, omega,
                                ramp_steps)
                 for nk in (n, n + 1)]
            )
            psrc_in = (psrc,)
        else:
            psrc_in = ()
        if with_dft:
            def scal_row(nk):
                t = nk.astype(jnp.float32) * grid.dt
                m = (nk >= grid.sensor_start).astype(jnp.float32)
                return jnp.stack([jnp.cos(omega * t) * m,
                                  jnp.sin(omega * t) * m])

            scal = jnp.stack([scal_row(n), scal_row(n + 1)])
            acc_in = (s["acc_cos"], s["acc_sin"], s["peak"])
            scal_in = (scal,)
        else:
            acc_in = scal_in = ()

        outs = call(
            f["p"], f["vx"], f["vy"], f["vz"], f["r"],
            pr["rho_inv"], pr["pi_u"], pr["c_rp"], pr["b_r"],
            *acc_in,
            s["psi_py_lo"], s["psi_py_hi"], s["psi_pz_lo"], s["psi_pz_hi"],
            s["psi_vy_lo"], s["psi_vy_hi"], s["psi_vz_lo"], s["psi_vz_hi"],
            zero_ghost,
            s["src_amp"], s["src_cph"], s["src_sph"],
            s["src_amp"], s["src_cph"], s["src_sph"],
            tsrc,
            *psrc_in,
            *scal_in,
            *kcoefs["y_half"], *kcoefs["z_half"],
            *kcoefs["y_int"], *kcoefs["z_int"],
            s["psix_p_lo"], s["psix_p_hi"], s["psix_v_lo"], s["psix_v_hi"],
            xh[0], xh[1], xh[2], xh[3],
            xh[0], xh[1], xh[2], xh[3],
            xi[0], xi[1], xi[2], xi[3],
            xi[0], xi[1], xi[2], xi[3],
        )
        it = iter(outs)
        vx, vy, vz, p_new, r_new = (next(it) for _ in range(5))
        if with_dft:
            acc_c, acc_s, peak = (next(it) for _ in range(3))
        else:
            acc_c, acc_s, peak = s["acc_cos"], s["acc_sin"], s["peak"]
        psix_p_lo, psix_p_hi, psix_v_lo, psix_v_hi = (
            next(it) for _ in range(4)
        )
        (psi_py_lo, psi_py_hi, psi_pz_lo, psi_pz_hi,
         psi_vy_lo, psi_vy_hi, psi_vz_lo, psi_vz_hi) = (
            next(it) for _ in range(8)
        )
        new_carry = dict(
            s,
            fields=dict(p=p_new, vx=vx, vy=vy, vz=vz, r=r_new),
            psi_py_lo=psi_py_lo, psi_py_hi=psi_py_hi,
            psi_pz_lo=psi_pz_lo, psi_pz_hi=psi_pz_hi,
            psi_vy_lo=psi_vy_lo, psi_vy_hi=psi_vy_hi,
            psi_vz_lo=psi_vz_lo, psi_vz_hi=psi_vz_hi,
            psix_p_lo=psix_p_lo, psix_p_hi=psix_p_hi,
            psix_v_lo=psix_v_lo, psix_v_hi=psix_v_hi,
            acc_cos=acc_c, acc_sin=acc_s, peak=peak,
        )
        return new_carry, None

    return step


def build_fluid_fusedK_step(grid, profiles_np, viscous, oz_scale, K, nb=4,
                            interpret=False, with_dft=False, edge_offset=0,
                            with_p2=False, _mat_const=False,
                            _tiny_const=False, _no_xcpml=False):
    """K timesteps per streaming sweep (deep temporal blocking).

    ``edge_offset`` (h0, in slabs) shifts the in-kernel x-CPML inward: the
    lo PML covers slabs [h0, h0+kx] and the hi PML ends at slab
    n_slabs-1-h0. This serves the sharded overlap-and-discard driver
    (``simulate_fluid_pallas`` under an x mesh), whose extended local
    domains carry h0 slabs of halo/dead planes on each side; slabs outside
    the shifted windows park on the dummy coefficient block (zero b AND a,
    so psi stays 0 and the correction is a no-op).

    With ``with_dft`` the final pressure stage also accumulates the
    carrier DFT cos/sin streams and the peak tracker for ALL K steps; the
    intermediate pressure rings deepen to 2K-2k+1 slots so step-k
    pressures survive until stage K reads them (the quiet phase keeps
    them at depth 3).

    Generalizes ``build_fluid_fused2_step``: per grid iteration i the
    pipeline runs stages V_k (velocity of step k, slab lag 2k-1) and P_k
    (pressure of step k, slab lag 2k) for k = 1..K. State between stages
    lives in VMEM rings:

      * p_k / r_k / vx_k / vy_k / vz_k slabs: depth-3 rings (consecutive
        stages are 2 lags apart; x-stencil neighbors come from the ring
        plus the value the upstream stage just produced this iteration);
      * material fields (rho_inv, pi_u, c_rp, b_r): stashed at the end of
        the body on first HBM visit, single ring of depth 2K-2 (the last
        reader, stage K, runs earlier in the same iteration the slot is
        recycled);
      * CPML psi memories (in-plane y/z slabs and the x psi blocks): one
        shared ring of depth 2K-1 per stream, updated in place by each
        stage (slot for slab s is first written at i=s+1 and last read at
        i=s+2K-1; the next writer of that slot is stage 1 at i=s+2K).

    HBM traffic per sweep is the same ~14 volume-equivalents as the 1-step
    fused kernel, i.e. 14/K volumes per timestep. Numerics are the
    identical update equations applied K times — bit-equal to K
    applications of the single-step kernel. Requires
    n_slabs >= kx + 2K - 1.
    """
    N1, N2, N3 = grid.shape
    if N1 % nb:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb}")
    if K < 2:
        raise ValueError("K must be >= 2")
    ns = grid.npml + 2
    n_slabs = N1 // nb
    dt_dx = np.float32(grid.dt / grid.dx)
    dt = np.float32(grid.dt)
    inv_dx = np.float32(1.0 / grid.dx)
    zsrc = grid.source_plane_z
    point = grid.source_type == "stress_point"
    # dome transducers in zero-shear (CT) media: per-voxel velocity drive
    # along per-voxel normals on the acoustic system — six drive streams
    # stashed in depth-Dm rings so every velocity stage injects in-kernel
    # (`BabelIntegrationDOME_PHASEDARRAY.py:344-407`; the 670 kHz DomeTx CT
    # workload, `README.md:80`, runs through THIS kernel instead of the 3x
    # slower visco volumetric one)
    volume_src = grid.source_type == "velocity_volume"
    if point:
        i0_pt, j0_pt, k0_pt = (int(v) for v in grid.source_ijk)
        s_pt, li_pt = divmod(i0_pt, nb)

    by = _make_profiles_const(profiles_np, 1, "half", ns)
    bz = _make_profiles_const(profiles_np, 2, "half", ns)
    by_i = _make_profiles_const(profiles_np, 1, "int", ns)
    bz_i = _make_profiles_const(profiles_np, 2, "int", ns)

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    coef_y = pl.BlockSpec((1, ns, 1), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    coef_z = pl.BlockSpec((1, 1, ns), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    slab_y = lambda idx: pl.BlockSpec((nb, ns, N3), idx,
                                      memory_space=pltpu.VMEM)
    slab_z = lambda idx: pl.BlockSpec((nb, N2, ns), idx,
                                      memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)

    def lagk(k):
        return lambda i: (jnp.minimum(jnp.maximum(i - k, 0), n_slabs - 1),
                          0, 0)

    ghost_spec = pl.BlockSpec(
        (2, N2, N3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )

    kx = -(-ns // nb)
    if n_slabs < kx + 2 * K - 1:
        raise ValueError(
            f"N1={N1} too small for the {K}-step fused pipeline"
        )
    px_planes = (kx + 1) * nb
    h0 = int(edge_offset)

    def lo_of(lag):
        return lambda i: (jnp.minimum(jnp.maximum(i - lag - h0, 0), kx),
                          0, 0)

    def hi_of(lag):
        base = n_slabs - kx - h0

        def m(i):
            s = jnp.minimum(jnp.maximum(i - lag, 0), n_slabs - 1)
            return (jnp.where((s >= base) & (s < n_slabs - h0), s - base,
                              kx), 0, 0)
        return m

    psixb = lambda m: pl.BlockSpec((nb, N2, N3), m, memory_space=pltpu.VMEM)
    xfull = pl.BlockSpec((px_planes, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    psix_shape = jax.ShapeDtypeStruct((px_planes, N2, N3), jnp.float32)

    Dm = 2 * K - 2   # material stash ring depth
    Dp = 2 * K - 1   # shared psi ring depth

    # absolute-slot addressing for the x-CPML psi scratch: x-psi is nonzero
    # only on the slabs the PML packs cover, so stages 2..K keep it in a
    # (kx+2)-slot scratch indexed by slab position (slot kx+1 = shared
    # garbage slot for interior/dead slabs whose coefficients are zero)
    # instead of depth-(2K-1) rings — VMEM stays O(npml) as K grows.
    def lo_slot(s):
        return jnp.where((s >= h0) & (s <= h0 + kx), s - h0, kx + 1)

    def hi_slot(s):
        base = n_slabs - kx - h0
        return jnp.where((s >= base) & (s < n_slabs - h0), s - base, kx + 1)

    def p_depth(k):
        """Ring depth for p after step k (0 = incoming p)."""
        if not with_dft or k == 0:
            return 3
        return max(3, 2 * K - 2 * k + 1)

    # perf-probe only (`tools/probe_roofline.py`): pin the material streams
    # to block 0 so Pallas elides their HBM reads — isolates the material
    # traffic share of the sweep time (numerics intentionally wrong)
    mat_lag = (lambda k: (lambda i: (0, 0, 0))) if _mat_const else lagk
    # perf-probe only: shrink material blocks to (nb,1,1) broadcasts so the
    # stream traffic physically disappears (numerics intentionally wrong)
    mat_shape = (nb, 1, 1) if _mat_const == "thin" else (nb, N2, N3)
    mslab = lambda idx: pl.BlockSpec(mat_shape, idx, memory_space=pltpu.VMEM)
    # perf-probe only: pin the many tiny per-stage streams (x-CPML coef
    # blocks, source-plane slivers) to block 0 — isolates the per-iteration
    # DMA-issue overhead share (numerics intentionally wrong)
    if _tiny_const:
        const0 = lambda i: (0, 0, 0)
        lo_of = hi_of = lambda lag: const0
        lagk_tiny = lambda k: const0
    else:
        lagk_tiny = lagk

    # ---- declarative in/out/scratch orderings (indexed by name) ----
    in_entries = (
        [("p", slab(cur)),
         ("vx", slab(lagk(1))), ("vy", slab(lagk(1))), ("vz", slab(lagk(1))),
         ("r", slab(lagk(2))),
         ("rho", mslab(mat_lag(1))),
         ("piu", mslab(mat_lag(2))), ("crp", mslab(mat_lag(2))),
         ("br", mslab(mat_lag(2))),
         ("psi_py_lo", slab_y(lagk(1))), ("psi_py_hi", slab_y(lagk(1))),
         ("psi_pz_lo", slab_z(lagk(1))), ("psi_pz_hi", slab_z(lagk(1))),
         ("psi_vy_lo", slab_y(lagk(2))), ("psi_vy_hi", slab_y(lagk(2))),
         ("psi_vz_lo", slab_z(lagk(2))), ("psi_vz_hi", slab_z(lagk(2))),
         ("ghost", ghost_spec)]
        + ([("acc_c", slab(lagk(2 * K))), ("acc_s", slab(lagk(2 * K))),
            ("peak", slab(lagk(2 * K)))] if with_dft else [])
        + ([("acc_p2", slab(lagk(2 * K)))] if with_dft and with_p2 else [])
        + ([(f"{nm}{k}", pl.BlockSpec((nb, N2, 1), lagk_tiny(2 * k - 1),
                                      memory_space=pltpu.VMEM))
            for k in range(1, K + 1) for nm in ("amp", "cph", "sph")]
           if not volume_src else [])
        + ([(nm, slab(lagk(1)))
            for nm in ("vamp", "vcph", "vsph", "vox", "voy", "voz")]
           if volume_src else [])
        + [("tsrc", pl.BlockSpec((K, 2), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM))]
        + ([("psrc", pl.BlockSpec((K, 2), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))]
           if point else [])
        + ([("scal", pl.BlockSpec((K, 2), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM))]
           if with_dft else [])
        + [(f"cyh{j}", coef_y) for j in range(4)]
        + [(f"czh{j}", coef_z) for j in range(4)]
        + [(f"cyi{j}", coef_y) for j in range(4)]
        + [(f"czi{j}", coef_z) for j in range(4)]
        + [("psix_p_lo", psixb(lo_of(1))), ("psix_p_hi", psixb(hi_of(1))),
           ("psix_v_lo", psixb(lo_of(2))), ("psix_v_hi", psixb(hi_of(2)))]
        # full x-CPML coefficient packs, loaded once (constant index map ->
        # Pallas elides the repeated copies); stages dynamic-slice their
        # nb-plane window in-kernel instead of streaming 8K per-lag blocks
        + [(f"xc{fam}{j}", xfull) for fam in ("h", "i") for j in range(4)]
    )
    out_entries = (
        [("ovx", slab(lagk(2 * K - 1))), ("ovy", slab(lagk(2 * K - 1))),
         ("ovz", slab(lagk(2 * K - 1))),
         ("op", slab(lagk(2 * K))), ("orr", slab(lagk(2 * K)))]
        + ([("oacc_c", slab(lagk(2 * K))), ("oacc_s", slab(lagk(2 * K))),
            ("opeak", slab(lagk(2 * K)))] if with_dft else [])
        + ([("oacc_p2", slab(lagk(2 * K)))] if with_dft and with_p2 else [])
        + [("opsix_p_lo", psixb(lo_of(2 * K - 1))),
           ("opsix_p_hi", psixb(hi_of(2 * K - 1))),
           ("opsix_v_lo", psixb(lo_of(2 * K))),
           ("opsix_v_hi", psixb(hi_of(2 * K)))]
        + [("opsi_py_lo", slab_y(lagk(2 * K - 1))),
           ("opsi_py_hi", slab_y(lagk(2 * K - 1))),
           ("opsi_pz_lo", slab_z(lagk(2 * K - 1))),
           ("opsi_pz_hi", slab_z(lagk(2 * K - 1))),
           ("opsi_vy_lo", slab_y(lagk(2 * K))),
           ("opsi_vy_hi", slab_y(lagk(2 * K))),
           ("opsi_vz_lo", slab_z(lagk(2 * K))),
           ("opsi_vz_hi", slab_z(lagk(2 * K)))]
    )
    vol = lambda: jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)
    out_shape_by_name = {
        "ovx": vol(), "ovy": vol(), "ovz": vol(), "op": vol(), "orr": vol(),
        "oacc_c": vol(), "oacc_s": vol(), "opeak": vol(), "oacc_p2": vol(),
        "opsix_p_lo": psix_shape, "opsix_p_hi": psix_shape,
        "opsix_v_lo": psix_shape, "opsix_v_hi": psix_shape,
        "opsi_py_lo": jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32),
        "opsi_py_hi": jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32),
        "opsi_pz_lo": jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32),
        "opsi_pz_hi": jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32),
        "opsi_vy_lo": jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32),
        "opsi_vy_hi": jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32),
        "opsi_vz_lo": jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32),
        "opsi_vz_hi": jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32),
    }
    in_idx = {nm: j for j, (nm, _) in enumerate(in_entries)}
    out_idx = {nm: j for j, (nm, _) in enumerate(out_entries)}
    aliases = {
        in_idx["vx"]: out_idx["ovx"], in_idx["vy"]: out_idx["ovy"],
        in_idx["vz"]: out_idx["ovz"], in_idx["p"]: out_idx["op"],
        in_idx["r"]: out_idx["orr"],
        in_idx["psix_p_lo"]: out_idx["opsix_p_lo"],
        in_idx["psix_p_hi"]: out_idx["opsix_p_hi"],
        in_idx["psix_v_lo"]: out_idx["opsix_v_lo"],
        in_idx["psix_v_hi"]: out_idx["opsix_v_hi"],
    }
    if with_dft:
        aliases[in_idx["acc_c"]] = out_idx["oacc_c"]
        aliases[in_idx["acc_s"]] = out_idx["oacc_s"]
        aliases[in_idx["peak"]] = out_idx["opeak"]
        if with_p2:
            aliases[in_idx["acc_p2"]] = out_idx["oacc_p2"]
    for nm in ("psi_py_lo", "psi_py_hi", "psi_pz_lo", "psi_pz_hi",
               "psi_vy_lo", "psi_vy_hi", "psi_vz_lo", "psi_vz_hi"):
        aliases[in_idx[nm]] = out_idx["o" + nm]

    ring_slab = lambda d: pltpu.VMEM((d, nb, N2, N3), jnp.float32)
    ring_y = lambda d: pltpu.VMEM((d, nb, ns, N3), jnp.float32)
    ring_z = lambda d: pltpu.VMEM((d, nb, N2, ns), jnp.float32)
    mring = lambda d: pltpu.VMEM((d,) + mat_shape, jnp.float32)
    scratch_entries = (
        [(f"p{k}_ring", ring_slab(p_depth(k))) for k in range(K)]
        + [(f"r{k}_ring", ring_slab(3)) for k in range(1, K)]
        + [(f"vx{k}_ring", ring_slab(3)) for k in range(1, K + 1)]
        + [(f"vy{k}_ring", ring_slab(3 if k < K else 2))
           for k in range(1, K + 1)]
        + [(f"vz{k}_ring", ring_slab(3 if k < K else 2))
           for k in range(1, K + 1)]
        + [("rho_ring", mring(Dm)), ("piu_ring", mring(Dm)),
           ("crp_ring", mring(Dm)), ("br_ring", mring(Dm))]
        + ([(f"{nm}_r", ring_slab(Dm))
            for nm in ("vamp", "vcph", "vsph", "vox", "voy", "voz")]
           if volume_src else [])
        + [("ppy_lo_r", ring_y(Dp)), ("ppy_hi_r", ring_y(Dp)),
           ("ppz_lo_r", ring_z(Dp)), ("ppz_hi_r", ring_z(Dp)),
           ("pvy_lo_r", ring_y(Dp)), ("pvy_hi_r", ring_y(Dp)),
           ("pvz_lo_r", ring_z(Dp)), ("pvz_hi_r", ring_z(Dp))]
        + [("pxp_lo_s", ring_slab(kx + 2)), ("pxp_hi_s", ring_slab(kx + 2)),
           ("pxv_lo_s", ring_slab(kx + 2)), ("pxv_hi_s", ring_slab(kx + 2))]
    )

    def kernel(*refs):
        n_in = len(in_entries)
        n_out = len(out_entries)
        R = {nm: refs[j] for j, (nm, _) in enumerate(in_entries)}
        R.update({nm: refs[n_in + j] for j, (nm, _) in enumerate(out_entries)})
        R.update({nm: refs[n_in + n_out + j]
                  for j, (nm, _) in enumerate(scratch_entries)})

        cyh_c = tuple(R[f"cyh{j}"] for j in range(4))
        czh_c = tuple(R[f"czh{j}"] for j in range(4))
        cyi_c = tuple(R[f"cyi{j}"] for j in range(4))
        czi_c = tuple(R[f"czi{j}"] for j in range(4))

        def xcoef(fam, s):
            """(b_lo, a_lo, b_hi, a_hi) nb-plane windows for slab s, sliced
            from the resident full packs (replaces 8K per-lag streams)."""
            blo = jnp.clip(s - h0, 0, kx) * nb
            base = n_slabs - kx - h0
            bhi = jnp.where(
                (s >= base) & (s < n_slabs - h0), s - base, kx
            ) * nb
            return (R[f"xc{fam}0"][pl.ds(blo, nb)],
                    R[f"xc{fam}1"][pl.ds(blo, nb)],
                    R[f"xc{fam}2"][pl.ds(bhi, nb)],
                    R[f"xc{fam}3"][pl.ds(bhi, nb)])

        i = pl.program_id(0)
        incoming = R["p"][...]
        ghost = R["ghost"][...]

        if point:
            ii_p = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
            jj_p = jax.lax.broadcasted_iota(jnp.int32, (1, N2, 1), 1)
            kk_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
            pmask = (
                (ii_p == li_pt) & (jj_p == j0_pt) & (kk_p == k0_pt)
            ).astype(jnp.float32)

        def inject_point(p_n, sp, k):
            if not point:
                return p_n
            sel = (sp == s_pt).astype(jnp.float32)
            return p_n + R["psrc"][k - 1, 0] * sel * pmask

        @pl.when(i < n_slabs)
        def _():
            R["p0_ring"][i % 3] = incoming

        def vel_update(w, rho_inv, v_in, psi_y, psi_z, psix_pair,
                       xc, amp, cph, sph, ts, vsrc6=None):
            dpx = _C1 * (w[3 : 3 + nb] - w[2 : 2 + nb]) + _C2 * (
                w[4 : 4 + nb] - w[1 : 1 + nb]
            )
            psix_lo, psix_hi = psix_pair
            if _no_xcpml:  # perf probe only: numerics wrong at x edges
                new_lo, new_hi = psix_lo, psix_hi
            else:
                new_lo = xc[0] * psix_lo + xc[1] * dpx
                new_hi = xc[2] * psix_hi + xc[3] * dpx
                dpx = dpx + new_lo + new_hi
            ps = w[2 : 2 + nb]
            dpy = _d_plus_y(ps)
            dpz = _d_plus_z(ps)
            dpy, npy_lo, npy_hi = _apply_cpml_inplane(
                dpy, psi_y[0], psi_y[1],
                cyh_c[0][...], cyh_c[1][...], cyh_c[2][...], cyh_c[3][...],
                axis=1,
            )
            dpz, npz_lo, npz_hi = _apply_cpml_inplane(
                dpz, psi_z[0], psi_z[1],
                czh_c[0][...], czh_c[1][...], czh_c[2][...], czh_c[3][...],
                axis=2,
            )
            vx_n = v_in[0] - dt_dx * rho_inv * dpx
            vy_n = v_in[1] - dt_dx * rho_inv * dpy
            vz_n = v_in[2] - dt_dx * rho_inv * dpz
            if volume_src:
                vamp, vcph, vsph, vox, voy, voz = vsrc6
                sv3 = (ts[0] * vcph + ts[1] * vsph) * vamp
                on3 = vamp > 0
                vx_n = jnp.where(on3, sv3 * vox, vx_n)
                vy_n = jnp.where(on3, sv3 * voy, vy_n)
                vz_n = jnp.where(on3, sv3 * voz, vz_n)
            else:
                sval = ts[0] * cph + ts[1] * sph
                z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
                on_src = (z_iota == zsrc) & (amp > 0)
                vz_n = jnp.where(on_src, sval * amp, vz_n)
            return (vx_n, vy_n, vz_n, npy_lo, npy_hi, npz_lo, npz_hi,
                    new_lo, new_hi)

        def press_update(w, vy_s, vz_s, p_old, r_old, piu, crp, br,
                         psi_y, psi_z, psix_pair, xc):
            dvx = _C1 * (w[2 : 2 + nb] - w[1 : 1 + nb]) + _C2 * (
                w[3 : 3 + nb] - w[0:nb]
            )
            psix_lo, psix_hi = psix_pair
            if _no_xcpml:  # perf probe only
                new_lo, new_hi = psix_lo, psix_hi
            else:
                new_lo = xc[0] * psix_lo + xc[1] * dvx
                new_hi = xc[2] * psix_hi + xc[3] * dvx
                dvx = dvx + new_lo + new_hi
            dvy = _d_minus_y(vy_s)
            dvz = _d_minus_z(vz_s)
            dvy, nvy_lo, nvy_hi = _apply_cpml_inplane(
                dvy, psi_y[0], psi_y[1],
                cyi_c[0][...], cyi_c[1][...], cyi_c[2][...], cyi_c[3][...],
                axis=1,
            )
            dvz, nvz_lo, nvz_hi = _apply_cpml_inplane(
                dvz, psi_z[0], psi_z[1],
                czi_c[0][...], czi_c[1][...], czi_c[2][...], czi_c[3][...],
                axis=2,
            )
            theta = dvx + dvy + dvz
            if viscous:
                r_new = br * r_old - crp * theta * inv_dx
                p_new = (
                    p_old - dt_dx * piu * theta - dt * 0.5 * (r_new + r_old)
                )
            else:
                r_new = r_old
                p_new = p_old - dt_dx * piu * theta
            return (p_new, r_new, nvy_lo, nvy_hi, nvz_lo, nvz_hi,
                    new_lo, new_hi)

        def v_stage(k):
            lag = 2 * k - 1

            @pl.when((i >= lag) & (i <= n_slabs + lag - 1))
            def _():
                sv = i - lag
                p_ring = R[f"p{k - 1}_ring"]
                Dk = p_depth(k - 1)
                prev2 = jnp.where(sv >= 1, p_ring[(sv - 1) % Dk][nb - 2:],
                                  ghost)
                if k == 1:
                    nxt_src = incoming[0:2]
                else:
                    nxt_src = p_ring[(sv + 1) % Dk][0:2]
                nxt2 = jnp.where(sv < n_slabs - 1, nxt_src, ghost)
                w = jnp.concatenate([prev2, p_ring[sv % Dk], nxt2], axis=0)
                if k == 1:
                    rho_inv = R["rho"][...]
                    v_in = (R["vx"][...], R["vy"][...], R["vz"][...])
                    psi_y = (R["psi_py_lo"][...], R["psi_py_hi"][...])
                    psi_z = (R["psi_pz_lo"][...], R["psi_pz_hi"][...])
                    psix = (R["psix_p_lo"][...], R["psix_p_hi"][...])
                else:
                    rho_inv = R["rho_ring"][sv % Dm]
                    v_in = (R[f"vx{k - 1}_ring"][sv % 3],
                            R[f"vy{k - 1}_ring"][sv % 3],
                            R[f"vz{k - 1}_ring"][sv % 3])
                    psi_y = (R["ppy_lo_r"][sv % Dp], R["ppy_hi_r"][sv % Dp])
                    psi_z = (R["ppz_lo_r"][sv % Dp], R["ppz_hi_r"][sv % Dp])
                    psix = (R["pxp_lo_s"][lo_slot(sv)],
                            R["pxp_hi_s"][hi_slot(sv)])
                vsrc6 = None
                if volume_src:
                    names = ("vamp", "vcph", "vsph", "vox", "voy", "voz")
                    if k == 1:
                        vsrc6 = tuple(R[nm][...] for nm in names)
                    else:
                        vsrc6 = tuple(
                            R[f"{nm}_r"][sv % Dm] for nm in names
                        )
                if volume_src:
                    p_amp = p_cph = p_sph = None
                else:
                    p_amp = R[f"amp{k}"][...]
                    p_cph = R[f"cph{k}"][...]
                    p_sph = R[f"sph{k}"][...]
                (vx_n, vy_n, vz_n, npy_lo, npy_hi, npz_lo, npz_hi,
                 nxp_lo, nxp_hi) = vel_update(
                    w, rho_inv, v_in, psi_y, psi_z, psix,
                    xcoef("h", sv),
                    p_amp, p_cph, p_sph,
                    (R["tsrc"][k - 1, 0], R["tsrc"][k - 1, 1]),
                    vsrc6,
                )
                dv = 3 if k < K else 2
                R[f"vx{k}_ring"][sv % 3] = vx_n
                R[f"vy{k}_ring"][sv % dv] = vy_n
                R[f"vz{k}_ring"][sv % dv] = vz_n
                if k == K:
                    R["ovx"][...] = vx_n
                    R["ovy"][...] = vy_n
                    R["ovz"][...] = vz_n
                    R["opsi_py_lo"][...] = npy_lo
                    R["opsi_py_hi"][...] = npy_hi
                    R["opsi_pz_lo"][...] = npz_lo
                    R["opsi_pz_hi"][...] = npz_hi
                    R["opsix_p_lo"][...] = nxp_lo
                    R["opsix_p_hi"][...] = nxp_hi
                else:
                    R["ppy_lo_r"][sv % Dp] = npy_lo
                    R["ppy_hi_r"][sv % Dp] = npy_hi
                    R["ppz_lo_r"][sv % Dp] = npz_lo
                    R["ppz_hi_r"][sv % Dp] = npz_hi
                    R["pxp_lo_s"][lo_slot(sv)] = nxp_lo
                    R["pxp_hi_s"][hi_slot(sv)] = nxp_hi

        def p_stage(k):
            lag = 2 * k

            @pl.when((i >= lag) & (i <= n_slabs + lag - 1))
            def _():
                sp = i - lag
                dv = 3 if k < K else 2
                vx_ring = R[f"vx{k}_ring"]
                prev2 = jnp.where(sp >= 1, vx_ring[(sp - 1) % 3][nb - 2:],
                                  ghost)
                nxt2 = jnp.where(sp < n_slabs - 1, vx_ring[(sp + 1) % 3][0:2],
                                 ghost)
                w = jnp.concatenate([prev2, vx_ring[sp % 3], nxt2], axis=0)
                p_old = R[f"p{k - 1}_ring"][sp % p_depth(k - 1)]
                if k == 1:
                    r_old = R["r"][...]
                    piu = R["piu"][...]
                    crp = R["crp"][...]
                    br = R["br"][...]
                    psi_y = (R["psi_vy_lo"][...], R["psi_vy_hi"][...])
                    psi_z = (R["psi_vz_lo"][...], R["psi_vz_hi"][...])
                    psix = (R["psix_v_lo"][...], R["psix_v_hi"][...])
                else:
                    r_old = R[f"r{k - 1}_ring"][sp % 3]
                    piu = R["piu_ring"][sp % Dm]
                    crp = R["crp_ring"][sp % Dm]
                    br = R["br_ring"][sp % Dm]
                    psi_y = (R["pvy_lo_r"][sp % Dp], R["pvy_hi_r"][sp % Dp])
                    psi_z = (R["pvz_lo_r"][sp % Dp], R["pvz_hi_r"][sp % Dp])
                    psix = (R["pxv_lo_s"][lo_slot(sp)],
                            R["pxv_hi_s"][hi_slot(sp)])
                (p_n, r_n, nvy_lo, nvy_hi, nvz_lo, nvz_hi,
                 nxv_lo, nxv_hi) = press_update(
                    w, R[f"vy{k}_ring"][sp % dv], R[f"vz{k}_ring"][sp % dv],
                    p_old, r_old, piu, crp, br, psi_y, psi_z, psix,
                    xcoef("i", sp),
                )
                p_n = inject_point(p_n, sp, k)
                if k == K:
                    R["op"][...] = p_n
                    R["orr"][...] = r_n
                    R["opsi_vy_lo"][...] = nvy_lo
                    R["opsi_vy_hi"][...] = nvy_hi
                    R["opsi_vz_lo"][...] = nvz_lo
                    R["opsi_vz_hi"][...] = nvz_hi
                    R["opsix_v_lo"][...] = nxv_lo
                    R["opsix_v_hi"][...] = nxv_hi
                    if with_dft:
                        # carrier DFT + peak (+ optional RMS) over all K
                        # step pressures
                        acc_c = R["acc_c"][...]
                        acc_s = R["acc_s"][...]
                        pk = R["peak"][...]
                        a2 = R["acc_p2"][...] if with_p2 else None
                        for j in range(1, K + 1):
                            pj = (p_n if j == K
                                  else R[f"p{j}_ring"][sp % p_depth(j)])
                            cj = R["scal"][j - 1, 0]
                            sj = R["scal"][j - 1, 1]
                            on = (cj * cj + sj * sj > 0)
                            acc_c = acc_c + pj * cj
                            acc_s = acc_s + pj * sj
                            pk = jnp.maximum(pk, jnp.abs(pj) * on)
                            if with_p2:
                                a2 = a2 + pj * pj * on
                        R["oacc_c"][...] = acc_c
                        R["oacc_s"][...] = acc_s
                        R["opeak"][...] = pk
                        if with_p2:
                            R["oacc_p2"][...] = a2
                else:
                    R[f"p{k}_ring"][sp % p_depth(k)] = p_n
                    R[f"r{k}_ring"][sp % 3] = r_n
                    R["pvy_lo_r"][sp % Dp] = nvy_lo
                    R["pvy_hi_r"][sp % Dp] = nvy_hi
                    R["pvz_lo_r"][sp % Dp] = nvz_lo
                    R["pvz_hi_r"][sp % Dp] = nvz_hi
                    R["pxv_lo_s"][lo_slot(sp)] = nxv_lo
                    R["pxv_hi_s"][hi_slot(sp)] = nxv_hi

        for k in range(1, K + 1):
            v_stage(k)
            p_stage(k)

        # end-of-body material stashes (first HBM visit -> ring)
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            R["rho_ring"][(i - 1) % Dm] = R["rho"][...]

        @pl.when((i >= 2) & (i <= n_slabs + 1))
        def _():
            R["piu_ring"][(i - 2) % Dm] = R["piu"][...]
            R["crp_ring"][(i - 2) % Dm] = R["crp"][...]
            R["br_ring"][(i - 2) % Dm] = R["br"][...]

        # end-of-body dome-drive stashes (first HBM visit -> ring)
        if volume_src:
            @pl.when((i >= 1) & (i <= n_slabs))
            def _():
                for nm in ("vamp", "vcph", "vsph", "vox", "voy", "voz"):
                    R[f"{nm}_r"][(i - 1) % Dm] = R[nm][...]

    call = pl.pallas_call(
        kernel,
        grid=(n_slabs + 2 * K,),
        in_specs=[spec for _, spec in in_entries],
        out_specs=[spec for nm, spec in out_entries],
        out_shape=[out_shape_by_name[nm] for nm, _ in out_entries],
        scratch_shapes=[s for _, s in scratch_entries],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )
    coefs = {
        "y_half": tuple(jnp.asarray(c) for c in by),
        "z_half": tuple(jnp.asarray(c) for c in bz),
        "y_int": tuple(jnp.asarray(c) for c in by_i),
        "z_int": tuple(jnp.asarray(c) for c in bz_i),
        "x_half_pack": _pack_x_coefs(profiles_np, "half", ns, nb, kx),
        "x_int_pack": _pack_x_coefs(profiles_np, "int", ns, nb, kx),
        "px_planes": px_planes,
    }
    return call, coefs


def _scale_xpacks(xh, xi, xcoef_scale):
    """Scale (b_lo, a_lo, b_hi, a_hi) x-CPML packs by the edge masks so
    only the shards owning a global x edge apply the PML (b AND a are
    zeroed: psi stays 0 and the correction is a no-op elsewhere)."""
    lo_s, hi_s = xcoef_scale
    xh = (xh[0] * lo_s, xh[1] * lo_s, xh[2] * hi_s, xh[3] * hi_s)
    xi = (xi[0] * lo_s, xi[1] * lo_s, xi[2] * hi_s, xi[3] * hi_s)
    return xh, xi


def _make_fluid_fusedK_step_fn(grid, profiles_np, viscous, oz_scale, K, nb,
                               interpret, with_dft=False, edge_offset=0,
                               xcoef_scale=None, with_p2=False,
                               _mat_const=False, _tiny_const=False,
                               _no_xcpml=False):
    """K-timestep step closure (scan over step GROUPS of K; n is the
    first of the K step indices)."""
    omega = 2.0 * np.pi * grid.frequency
    call, kcoefs = build_fluid_fusedK_step(
        grid, profiles_np, viscous, oz_scale, K, nb, interpret=interpret,
        with_dft=with_dft, edge_offset=edge_offset, with_p2=with_p2,
        _mat_const=_mat_const, _tiny_const=_tiny_const,
        _no_xcpml=_no_xcpml,
    )
    xh = tuple(jnp.asarray(c) for c in kcoefs["x_half_pack"])
    xi = tuple(jnp.asarray(c) for c in kcoefs["x_int_pack"])
    if xcoef_scale is not None:
        xh, xi = _scale_xpacks(xh, xi, xcoef_scale)
    N1, N2, N3 = grid.shape
    zero_ghost = jnp.zeros((2, N2, N3), jnp.float32)
    ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt
    vol_src = grid.source_type == "velocity_volume"

    def step(carry, n):
        s = carry
        f = s["fields"]
        pr = s["props"]

        def src_row(nk):
            t = nk.astype(jnp.float32) * grid.dt
            ramp = jnp.where(
                nk < ramp_steps,
                0.5 * (1.0 - jnp.cos(np.pi * nk / ramp_steps)), 1.0,
            ).astype(jnp.float32)
            sc = ramp * oz_scale
            return jnp.stack([jnp.sin(omega * t) * sc,
                              jnp.cos(omega * t) * sc])

        tsrc = jnp.stack([src_row(n + j) for j in range(K)])  # (K, 2)
        if vol_src:
            vsrc_in = tuple(
                s[k] for k in ("srcv_amp", "srcv_cph", "srcv_sph",
                               "srcv_ox", "srcv_oy", "srcv_oz")
            )
        else:
            vsrc_in = ()
        if grid.source_type == "stress_point":
            psrc_in = (jnp.stack(
                [_point_src_row(s["src_amp_point"], n + j, grid, omega,
                                ramp_steps) for j in range(K)]
            ),)
        else:
            psrc_in = ()
        if with_dft:
            def scal_row(nk):
                t = nk.astype(jnp.float32) * grid.dt
                m = (nk >= grid.sensor_start).astype(jnp.float32)
                return jnp.stack([jnp.cos(omega * t) * m,
                                  jnp.sin(omega * t) * m])

            acc_in = (s["acc_cos"], s["acc_sin"], s["peak"])
            if with_p2:
                acc_in = acc_in + (s["acc_p2"],)
            scal_in = (jnp.stack([scal_row(n + j) for j in range(K)]),)
        else:
            acc_in = scal_in = ()
        src = (() if vol_src
               else (s["src_amp"], s["src_cph"], s["src_sph"]))
        outs = call(
            f["p"], f["vx"], f["vy"], f["vz"], f["r"],
            pr["rho_inv"], pr["pi_u"], pr["c_rp"], pr["b_r"],
            s["psi_py_lo"], s["psi_py_hi"], s["psi_pz_lo"], s["psi_pz_hi"],
            s["psi_vy_lo"], s["psi_vy_hi"], s["psi_vz_lo"], s["psi_vz_hi"],
            zero_ghost,
            *acc_in,
            *(pl_in for _ in range(K) for pl_in in src),
            *vsrc_in,
            tsrc,
            *psrc_in,
            *scal_in,
            *kcoefs["y_half"], *kcoefs["z_half"],
            *kcoefs["y_int"], *kcoefs["z_int"],
            s["psix_p_lo"], s["psix_p_hi"], s["psix_v_lo"], s["psix_v_hi"],
            *xh, *xi,
        )
        it = iter(outs)
        vx, vy, vz, p_new, r_new = (next(it) for _ in range(5))
        acc_p2 = s.get("acc_p2")
        if with_dft:
            acc_c, acc_s, peak = (next(it) for _ in range(3))
            if with_p2:
                acc_p2 = next(it)
        else:
            acc_c, acc_s, peak = s["acc_cos"], s["acc_sin"], s["peak"]
        psix_p_lo, psix_p_hi, psix_v_lo, psix_v_hi = (
            next(it) for _ in range(4)
        )
        (psi_py_lo, psi_py_hi, psi_pz_lo, psi_pz_hi,
         psi_vy_lo, psi_vy_hi, psi_vz_lo, psi_vz_hi) = (
            next(it) for _ in range(8)
        )
        new_carry = dict(
            s,
            fields=dict(p=p_new, vx=vx, vy=vy, vz=vz, r=r_new),
            psi_py_lo=psi_py_lo, psi_py_hi=psi_py_hi,
            psi_pz_lo=psi_pz_lo, psi_pz_hi=psi_pz_hi,
            psi_vy_lo=psi_vy_lo, psi_vy_hi=psi_vy_hi,
            psi_vz_lo=psi_vz_lo, psi_vz_hi=psi_vz_hi,
            psix_p_lo=psix_p_lo, psix_p_hi=psix_p_hi,
            psix_v_lo=psix_v_lo, psix_v_hi=psix_v_hi,
            acc_cos=acc_c, acc_sin=acc_s, peak=peak,
        )
        if acc_p2 is not None:
            new_carry["acc_p2"] = acc_p2
        return new_carry, None

    return step


def _tile_padded_bytes(shape):
    """f32 bytes of a VMEM buffer after Mosaic (8, 128) tiling of the last
    two dims — z-type psi slabs (..., N2, ns=14) pad their last dim to 128,
    a ~9x blowup the budget estimators must account for."""
    s = list(shape)
    s[-1] = -(-s[-1] // 128) * 128
    s[-2] = -(-s[-2] // 8) * 8
    out = 4
    for v in s:
        out *= int(v)
    return out


def _fusedK_auto(grid, nb, K_cap=12, budget_bytes=118 * 1024 * 1024,
                 with_dft=False, volume_src=False):
    """Pick the deepest K whose VMEM footprint (rings + double-buffered
    block streams) fits the budget; 0/1 means 'no fusedK'.

    ``with_dft`` accounts for the deeper p rings (step-k pressures live
    until stage K accumulates the carrier DFT) and the acc/peak block
    streams. The x-CPML psi scratch is absolute-slot addressed (4(kx+2)
    slabs, K-independent) and the x coefficient packs are resident
    (streamed once), so rings grow at 23 slabs per fused step.
    ``volume_src`` adds the six dome-drive streams + their depth-(2K-2)
    stash rings."""
    N1, N2, N3 = grid.shape
    if N1 % nb:
        return 0
    ns = grid.npml + 2
    n_slabs = N1 // nb
    kx = -(-ns // nb)
    slab_b = _tile_padded_bytes((nb, N2, N3))
    y_b = _tile_padded_bytes((nb, ns, N3))
    z_b = _tile_padded_bytes((nb, N2, ns))
    for K in range(K_cap, 1, -1):
        if n_slabs < kx + 2 * K - 1:
            continue
        ring_slabs = 23 * K - 13 + 4 * (kx + 2)
        buf_slabs = 44
        if with_dft:
            ring_slabs += (K - 1) * (K - 2)
            buf_slabs += 12
        if volume_src:
            ring_slabs += 6 * (2 * K - 2)
            buf_slabs += 12
        est = (ring_slabs + buf_slabs) * slab_b \
            + (4 * (2 * K - 1) + 16) * (y_b + z_b) \
            + 4 * 1024 * 1024
        if est <= budget_bytes:
            return K
    return 0


def _sharded_fusedK_plan(L, nb, npml, fuse_steps, grid, K_cap=6,
                         auto_fn=None):
    """Pick (K, H, h0) for the sharded overlap-and-discard fused driver.

    H = halo/overlap width in planes (a multiple of nb, >= 4K: each fused
    step widens the contaminated fringe by 4 planes — 2 per half-step).
    ``auto_fn`` is the VMEM-budget K selector (fluid ``_fusedK_auto`` or
    visco ``_viscoK_auto``). Returns None when no K >= 2 fits the shard
    extent or VMEM.

    H must also satisfy ``H <= L - (npml + 2)``: a halo that reaches into a
    global-edge neighbor's x-PML slab would evolve WITHOUT the PML
    correction during the sweep (interior shards carry zeroed x coefs),
    corrupting planes that the contamination-width argument assumes valid.
    Thin shards fall back to the 1-step ghost-exchange path.
    """
    import dataclasses as _dc

    if auto_fn is None:
        auto_fn = _fusedK_auto
    ns = npml + 2
    kx = -(-ns // nb)
    cand = [int(fuse_steps)] if fuse_steps else list(range(K_cap, 1, -1))
    for K in cand:
        if K < 2:
            return None
        H = -((-4 * K) // nb) * nb
        if H > L - ns:
            continue
        N1e = L + 2 * H
        ge = _dc.replace(grid, shape=(N1e,) + tuple(grid.shape[1:]))
        if (N1e // nb) < kx + 2 * K - 1:
            continue
        if fuse_steps is None and (
            auto_fn(ge, nb, K_cap=K) < K
            or auto_fn(ge, nb, K_cap=K, with_dft=True) < K
        ):
            continue
        return K, H, H // nb
    return None


def _simulate_fluid_pallas_sharded_fused(props, src_amp, src_phase, grid,
                                         profiles_np, viscous, oz_scale, nb,
                                         comm, interpret, K, H, h0,
                                         volume_source=None):
    """Fused K-step sweeps under x domain decomposition: overlap-and-discard.

    Each shard's state lives on an EXTENDED local domain with H halo planes
    per side. Once per K-step sweep the halos are refreshed from the
    neighbors' interior boundary planes (2 ppermutes per state array over
    ICI) and the unsharded fusedK kernel runs over the extended domain:
    garbage from the array edge creeps inward 4 planes per step, so the
    interior L planes stay BIT-EXACT vs the single-device kernel. The
    in-kernel x-CPML is shifted inward by ``h0`` slabs (``edge_offset``)
    so the global-edge shards' PML lands exactly on the physical edge
    planes, and the coefficient packs are masked to zero on interior
    shards. Dead zones beyond the global edges self-maintain zeros because
    the extended material fields are zero there (rho_inv = pi_u = 0).

    This is what makes multi-chip throughput track the single-chip fused
    number instead of the 1-step ghost-exchange kernel (~4x slower) — the
    deliverable SURVEY.md section 2.8 maps out.
    """
    import dataclasses as _dc

    from jax import lax

    L, N2, N3 = grid.shape
    N1e = L + 2 * H
    ge = _dc.replace(grid, shape=(N1e, N2, N3))
    ns = grid.npml + 2
    n_quiet = int(max(0, min(grid.sensor_start, grid.n_steps)))
    px_planes = (-(-ns // nb) + 1) * nb

    ax = comm.axis_name
    fwd = [(i, i + 1) for i in range(comm.n_shards - 1)]
    bwd = [(i + 1, i) for i in range(comm.n_shards - 1)]
    idx = lax.axis_index(ax)
    is_first = (idx == 0).astype(jnp.float32)
    is_last = (idx == comm.n_shards - 1).astype(jnp.float32)

    def extend(f):
        """(L, ...) -> (N1e, ...) with neighbor data (zeros at edges)."""
        gl = lax.ppermute(f[L - H:], ax, fwd)
        gr = lax.ppermute(f[:H], ax, bwd)
        return jnp.concatenate([gl, f, gr], axis=0)

    def refresh_group(arrs):
        """Refill the H-plane halos of a GROUP of same-shaped extended
        arrays with ONE ppermute per direction (the halo slices are
        stacked into a single message). Same bytes as per-array
        permutes, but a fused-step sweep refreshes 13+ state arrays: one
        bundled collective per direction amortizes the per-message
        latency and lets the ICI link run at wire speed — the measured
        answer to the 37%-upper-bound halo model (see dryrun printout;
        interior/boundary sweep splitting was REJECTED because the
        6H-plane strip recompute costs more than the 2H-plane
        communication it would hide at every realistic shard size)."""
        lo_exp = jnp.stack([a[L:L + H] for a in arrs])
        hi_exp = jnp.stack([a[H:2 * H] for a in arrs])
        from_left = lax.ppermute(lo_exp, ax, fwd)
        from_right = lax.ppermute(hi_exp, ax, bwd)
        out = []
        for i, a in enumerate(arrs):
            a = lax.dynamic_update_slice(a, from_left[i], (0,) * a.ndim)
            out.append(lax.dynamic_update_slice(
                a, from_right[i], (N1e - H,) + (0,) * (a.ndim - 1)
            ))
        return out

    props_e = {k: extend(v) for k, v in props.items()}
    amp_e = extend(src_amp)
    ph_e = extend(src_phase)

    z3 = lambda: jnp.zeros((N1e, N2, N3), jnp.float32)
    zy = lambda: jnp.zeros((N1e, ns, N3), jnp.float32)
    zz = lambda: jnp.zeros((N1e, N2, ns), jnp.float32)
    zx = lambda: jnp.zeros((px_planes, N2, N3), jnp.float32)
    carry = {
        "fields": dict(p=z3(), vx=z3(), vy=z3(), vz=z3(), r=z3()),
        "props": props_e,
        "psi_py_lo": zy(), "psi_py_hi": zy(),
        "psi_pz_lo": zz(), "psi_pz_hi": zz(),
        "psi_vy_lo": zy(), "psi_vy_hi": zy(),
        "psi_vz_lo": zz(), "psi_vz_hi": zz(),
        "acc_cos": z3(), "acc_sin": z3(), "peak": z3(),
        "psix_p_lo": zx(), "psix_p_hi": zx(),
        "psix_v_lo": zx(), "psix_v_hi": zx(),
        "src_amp": amp_e[:, :, None],
        "src_cph": jnp.cos(ph_e)[:, :, None],
        "src_sph": jnp.sin(ph_e)[:, :, None],
    }
    if volume_source is not None:
        # dome drives are constant in time: extended ONCE (halo values =
        # neighbor's drive, so halo planes evolve exactly as the
        # neighbor's interior -> overlap-and-discard stays bit-exact);
        # never refreshed. Dead zones beyond the global edges extend to
        # amp=0, masking the injection off there.
        vs = volume_source
        carry["srcv_amp"] = extend(jnp.asarray(vs["amp"], jnp.float32))
        ph3 = jnp.asarray(vs["phase"], jnp.float32)
        carry["srcv_cph"] = extend(jnp.cos(ph3))
        carry["srcv_sph"] = extend(jnp.sin(ph3))
        carry["srcv_ox"] = extend(jnp.asarray(vs["ox"], jnp.float32))
        carry["srcv_oy"] = extend(jnp.asarray(vs["oy"], jnp.float32))
        carry["srcv_oz"] = extend(jnp.asarray(vs["oz"], jnp.float32))

    _STATE = ("p", "vx", "vy", "vz", "r")
    _PSI_Y = ("psi_py_lo", "psi_py_hi", "psi_vy_lo", "psi_vy_hi")
    _PSI_Z = ("psi_pz_lo", "psi_pz_hi", "psi_vz_lo", "psi_vz_hi")

    def with_refresh(stepfn):
        def step(carry, n):
            f = dict(carry["fields"])
            vols = refresh_group([f[k] for k in _STATE])
            for k, v in zip(_STATE, vols):
                f[k] = v
            c = dict(carry, fields=f)
            for grp in (_PSI_Y, _PSI_Z):
                arrs = refresh_group([c[k] for k in grp])
                for k, v in zip(grp, arrs):
                    c[k] = v
            return stepfn(c, n)
        return step

    scale = (is_first, is_last)
    mk = dict(edge_offset=h0, xcoef_scale=scale)

    def run_phase(carry, n0, n1, with_dft):
        count = n1 - n0
        if count <= 0:
            return carry
        remK = n0
        if count // K > 0:
            stepK = with_refresh(_make_fluid_fusedK_step_fn(
                ge, profiles_np, viscous, oz_scale, K, nb, interpret,
                with_dft=with_dft, **mk,
            ))
            carry, _ = jax.lax.scan(
                stepK, carry, n0 + K * jnp.arange(count // K)
            )
            remK = n0 + K * (count // K)
        if remK < n1:
            step1 = with_refresh(_make_fluid_fused_step_fn(
                ge, profiles_np, viscous, oz_scale, nb, comm, interpret,
                with_dft, **mk,
            ))
            carry, _ = jax.lax.scan(step1, carry, jnp.arange(remK, n1))
        return carry

    carry = run_phase(carry, 0, n_quiet, with_dft=False)
    carry = run_phase(carry, n_quiet, grid.n_steps, with_dft=True)
    sl = slice(H, H + L)
    return (carry["acc_cos"][sl], carry["acc_sin"][sl], carry["peak"][sl])


def is_vmem_oom(err: Exception) -> bool:
    """True when a Pallas compile failed on the VMEM budget — the signal
    the auto-K fallback retries on (the hand-fit VMEM models in
    ``_fusedK_auto``/``_viscoK_auto`` encode today's kernel layouts; a
    Mosaic OOM at compile time on the real chip must degrade K, not brick
    the run)."""
    msg = str(err)
    return ("vmem" in msg.lower() and "memory" in msg.lower()) or \
        "Ran out of memory" in msg or \
        "tpu_compile_helper" in msg or "Mosaic" in msg


def simulate_fluid_pallas(props, src_amp, src_phase, point_amp=0.0, *,
                          grid, profiles_np, viscous,
                          oz_scale, nb=2, comm=None, interpret=False,
                          fuse_steps=None, k_shrink=0,
                          sel_p2=False, monitor_idx=None,
                          volume_source=None):
    """Scan driver mirroring fdtd._simulate_local for the pallas fluid path.

    With ``comm`` the first axis of every (N1, ...) array is the LOCAL shard
    extent (call under shard_map with grid.shape set to the local shape).

    Two scan phases: steps before ``grid.sensor_start`` use the quiet
    kernels (no DFT/peak streaming — bit-identical because the window mask
    zeroes those updates anyway), the rest use the accumulating kernels.

    Under x domain decomposition with a plane or volumetric source, the
    sweep runs the overlap-and-discard fused driver
    (``_simulate_fluid_pallas_sharded_fused``) whenever a K >= 2 plan fits
    the shard extent, falling back to the 1-step ghost-exchange kernels
    otherwise (plane sources only — sharded volumetric REQUIRES a fused
    plan and raises otherwise).

    ``volume_source`` (dict amp/phase/ox/oy/oz of (N1,N2,N3) arrays)
    drives per-voxel particle velocity along per-voxel normals on the
    acoustic system — the zero-shear dome path
    (`BabelIntegrationDOME_PHASEDARRAY.py:344-407`).
    """
    N1, N2, N3 = grid.shape
    vol_src = grid.source_type == "velocity_volume"
    if comm is not None and comm.sharded_x and not comm.sharded_y and \
            grid.source_type in ("velocity_plane", "velocity_volume"):
        plan = _sharded_fusedK_plan(
            N1, nb, grid.npml, fuse_steps, grid,
            auto_fn=functools.partial(_fusedK_auto, volume_src=vol_src),
        )
        if plan is not None:
            return _simulate_fluid_pallas_sharded_fused(
                props, src_amp, src_phase, grid, profiles_np, viscous,
                oz_scale, nb, comm, interpret, *plan,
                volume_source=volume_source,
            )
        if vol_src:
            raise ValueError(
                "sharded volumetric sources need a fused overlap plan "
                f"(shard extent {N1} too thin for K>=2)"
            )
    ns = grid.npml + 2
    n_quiet = int(max(0, min(grid.sensor_start, grid.n_steps)))
    px_planes = (-(-ns // nb) + 1) * nb  # in-kernel x-CPML block count
    z3 = lambda: jnp.zeros((N1, N2, N3), jnp.float32)
    zy = lambda: jnp.zeros((N1, ns, N3), jnp.float32)
    zz = lambda: jnp.zeros((N1, N2, ns), jnp.float32)
    zx = lambda: jnp.zeros((px_planes, N2, N3), jnp.float32)
    carry = {
        "fields": dict(p=z3(), vx=z3(), vy=z3(), vz=z3(), r=z3()),
        "props": props,
        "psi_py_lo": zy(), "psi_py_hi": zy(),
        "psi_pz_lo": zz(), "psi_pz_hi": zz(),
        "psi_vy_lo": zy(), "psi_vy_hi": zy(),
        "psi_vz_lo": zz(), "psi_vz_hi": zz(),
        "psix_p_lo": zx(), "psix_p_hi": zx(),
        "psix_v_lo": zx(), "psix_v_hi": zx(),
        "acc_cos": z3(), "acc_sin": z3(), "peak": z3(),
        "src_amp": src_amp[:, :, None],
        "src_cph": jnp.cos(src_phase)[:, :, None],
        "src_sph": jnp.sin(src_phase)[:, :, None],
    }
    if grid.source_type == "stress_point":
        carry["src_amp_point"] = jnp.float32(point_amp)
        carry["peak_src"] = jnp.float32(0.0)
    if vol_src:
        vs = volume_source
        carry["srcv_amp"] = jnp.asarray(vs["amp"], jnp.float32)
        ph3 = jnp.asarray(vs["phase"], jnp.float32)
        carry["srcv_cph"] = jnp.cos(ph3)
        carry["srcv_sph"] = jnp.sin(ph3)
        carry["srcv_ox"] = jnp.asarray(vs["ox"], jnp.float32)
        carry["srcv_oy"] = jnp.asarray(vs["oy"], jnp.float32)
        carry["srcv_oz"] = jnp.asarray(vs["oz"], jnp.float32)

    if comm is None:
        from ..parallel.halo import DomainComm

        comm = DomainComm()
    kx = -(-ns // nb)
    unsharded = not (comm.sharded_x or comm.sharded_y)
    use_fused2 = unsharded and N1 // nb >= kx + 3 and not vol_src
    want_extras = sel_p2 or monitor_idx is not None
    if fuse_steps is None:
        K = _fusedK_auto(grid, nb, volume_src=vol_src) if unsharded else 0
        K_dft = (_fusedK_auto(grid, nb, with_dft=True, volume_src=vol_src)
                 if unsharded else 0)
        if k_shrink:
            K = 0 if K - k_shrink < 2 else K - k_shrink
            K_dft = 0 if K_dft - k_shrink < 2 else K_dft - k_shrink
    else:
        K = int(fuse_steps)
        if K >= 3 and (not unsharded or N1 // nb < kx + 2 * K - 1):
            raise ValueError(
                f"fuse_steps={K} needs an unsharded x-extent with "
                f"N1/nb >= {kx + 2 * K - 1}"
            )
        K_dft = K
    if want_extras:
        # Pressure_rms / monitor capture live in the fusedK DFT kernel
        # only, so the sensor window must run entirely in K-step sweeps:
        # pick the deepest K <= K_dft that divides the window
        window = grid.n_steps - n_quiet
        K_fit = 0
        for k in range(min(K_dft, window), 2, -1):
            if window % k == 0:
                K_fit = k
                break
        if K_fit < 3:
            raise ValueError(
                f"sel_maps/monitor need a sensor window divisible by a "
                f"fused depth 3..{K_dft} (window={window} steps)"
            )
        K_dft = K_fit
        if sel_p2:
            carry["acc_p2"] = z3()
    use_fusedK = K >= 3
    monitor_ys = []

    def run_phase(carry, n0, n1, with_dft):
        """Advance steps [n0, n1): K-step fused sweeps, then 2-step fused
        sweeps, then a 1-step tail."""
        count = n1 - n0
        if count <= 0:
            return carry
        remK = n0
        Kp = K_dft if with_dft else K
        if (use_fusedK or (with_dft and want_extras)) and Kp >= 3 \
                and count // Kp > 0:
            stepK = _make_fluid_fusedK_step_fn(
                grid, profiles_np, viscous, oz_scale, Kp, nb, interpret,
                with_dft=with_dft, with_p2=sel_p2 and with_dft,
            )
            if with_dft and monitor_idx is not None:
                mi, mj, mk = monitor_idx

                def stepK_mon(c, n, _s=stepK):
                    c2, _ = _s(c, n)
                    return c2, c2["fields"]["p"][mi, mj, mk]

                carry, ys = jax.lax.scan(
                    stepK_mon, carry, n0 + Kp * jnp.arange(count // Kp)
                )
                monitor_ys.append((ys, n0, Kp))
            else:
                carry, _ = jax.lax.scan(
                    stepK, carry, n0 + Kp * jnp.arange(count // Kp)
                )
            remK = n0 + Kp * (count // Kp)
        n_pairs = (n1 - remK) // 2 if use_fused2 else 0
        if n_pairs > 0:
            step2 = _make_fluid_fused2_step_fn(
                grid, profiles_np, viscous, oz_scale, nb, interpret, with_dft
            )
            carry, _ = jax.lax.scan(
                step2, carry, remK + 2 * jnp.arange(n_pairs)
            )
        rem0 = remK + 2 * n_pairs
        if rem0 < n1:
            if vol_src:
                # tail steps of a volumetric run use the 1-step fused
                # kernel (the two-kernel 1-step path has no volumetric
                # injection)
                step1 = _make_fluid_fused_step_fn(
                    grid, profiles_np, viscous, oz_scale, nb, comm,
                    interpret, with_dft,
                )
            else:
                step1 = make_fluid_pallas_step(
                    grid, profiles_np, viscous, oz_scale, nb, comm=comm,
                    interpret=interpret, with_dft=with_dft,
                )
            carry, _ = jax.lax.scan(step1, carry, jnp.arange(rem0, n1))
        return carry

    carry = run_phase(carry, 0, n_quiet, with_dft=False)
    carry = run_phase(carry, n_quiet, grid.n_steps, with_dft=True)
    if not want_extras:
        return carry["acc_cos"], carry["acc_sin"], carry["peak"]
    extras = {}
    if sel_p2:
        extras["acc_p2"] = carry["acc_p2"]
    if monitor_idx is not None:
        ys, n0, Kp = monitor_ys[0]
        extras["monitor_series"] = ys
        extras["monitor_steps"] = n0 + Kp * np.arange(ys.shape[0]) + Kp - 1
    return carry["acc_cos"], carry["acc_sin"], carry["peak"], extras


# ---------------------------------------------------------------------------
# viscoelastic (shear) kernels — label-mode media
# ---------------------------------------------------------------------------


def build_visco_pallas_step(grid, profiles_np, viscous, oz_scale, nb=2,
                            interpret=False, with_dft=True):
    """Streaming-slab kernels for the full velocity-stress system.

    Same architecture as the fluid pair: x-slabs stream with VMEM rings for
    every array whose x-derivative is needed (3 per kernel), y/z CPML
    in-kernel, x-CPML fused in via clamped psi blocks. A velocity_plane
    CW source is fused into the velocity kernel (no jnp vz post-pass).
    ``with_dft=False`` builds the quiet-phase stress kernel that skips the
    DFT/peak accumulator streams (see build_fluid_pallas_step).
    """
    N1, N2, N3 = grid.shape
    fuse_src = grid.source_type == "velocity_plane"
    zsrc = grid.source_plane_z
    if N1 % nb or nb < 2:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb} >= 2")
    ns = grid.npml + 2
    n_slabs = N1 // nb
    dt_dx = np.float32(grid.dt / grid.dx)
    dt = np.float32(grid.dt)
    inv_dx = np.float32(1.0 / grid.dx)

    cy_h = _make_profiles_const(profiles_np, 1, "half", ns)
    cz_h = _make_profiles_const(profiles_np, 2, "half", ns)
    cy_i = _make_profiles_const(profiles_np, 1, "int", ns)
    cz_i = _make_profiles_const(profiles_np, 2, "int", ns)

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    slab_y = lambda idx: pl.BlockSpec((nb, ns, N3), idx, memory_space=pltpu.VMEM)
    slab_z = lambda idx: pl.BlockSpec((nb, N2, ns), idx, memory_space=pltpu.VMEM)
    coef_y = pl.BlockSpec((1, ns, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    coef_z = pl.BlockSpec((1, 1, ns), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)
    lag = lambda i: (jnp.maximum(i - 1, 0), 0, 0)
    ghost_spec = pl.BlockSpec(
        (2, N2, N3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    xb = _x_cpml_blocks(ns, nb, n_slabs, N2, N3)
    psix_lo_spec, psix_hi_spec = xb["psix_lo"], xb["psix_hi"]
    coefx_lo, coefx_hi = xb["coef_lo"], xb["coef_hi"]
    psix_shape = xb["shape"]

    def stash(ring, incoming, i):
        @pl.when(i < n_slabs)
        def _():
            ring[i % 2] = incoming

    def window(ring, tail, incoming, i, ghost_lo, ghost_hi):
        s = i - 1
        prev2 = jnp.where(s >= 1, tail[...], ghost_lo)
        nxt = jnp.where(s < n_slabs - 1, incoming[0:2], ghost_hi)
        return jnp.concatenate([prev2, ring[(i - 1) % 2], nxt], axis=0)

    def dpx_w(w):
        return _C1 * (w[3 : 3 + nb] - w[2 : 2 + nb]) + _C2 * (
            w[4 : 4 + nb] - w[1 : 1 + nb]
        )

    def dmx_w(w):
        return _C1 * (w[2 : 2 + nb] - w[1 : 1 + nb]) + _C2 * (
            w[3 : 3 + nb] - w[0:nb]
        )

    def cpml(d, lo_ref, hi_ref, coefs, axis):
        return _apply_cpml_inplane(
            d, lo_ref[...], hi_ref[...],
            coefs[0][...], coefs[1][...], coefs[2][...], coefs[3][...],
            axis=axis,
        )

    # ------------------------------------------------------------------
    # velocity kernel: streams sxx, sxy, sxz
    # ------------------------------------------------------------------
    def vel_kernel(*refs):
        it = iter(refs)
        sxx_ref, sxy_ref, sxz_ref = (next(it) for _ in range(3))
        syy_ref, szz_ref, syz_ref, vx_ref, vy_ref, vz_ref, rho_ref = (
            next(it) for _ in range(7)
        )
        (p_sxyy_lo, p_sxyy_hi, p_syyy_lo, p_syyy_hi, p_syzy_lo, p_syzy_hi,
         p_sxzz_lo, p_sxzz_hi, p_syzz_lo, p_syzz_hi, p_szzz_lo,
         p_szzz_hi) = (next(it) for _ in range(12))
        g_xx_lo, g_xx_hi, g_xy_lo, g_xy_hi, g_xz_lo, g_xz_hi = (
            next(it) for _ in range(6)
        )
        if fuse_src:
            amp_ref, cph_ref, sph_ref, tsrc_ref = (
                next(it) for _ in range(4)
            )
        (cyh_blo, cyh_alo, cyh_bhi, cyh_ahi,
         czh_blo, czh_alo, czh_bhi, czh_ahi,
         cyi_blo, cyi_alo, cyi_bhi, cyi_ahi,
         czi_blo, czi_alo, czi_bhi, czi_ahi) = (
            next(it) for _ in range(16)
        )
        (px_sxx_lo, px_sxx_hi, px_sxy_lo, px_sxy_hi, px_sxz_lo,
         px_sxz_hi) = (next(it) for _ in range(6))
        (cxh_blo, cxh_alo, cxh_bhi, cxh_ahi,
         cxi_blo, cxi_alo, cxi_bhi, cxi_ahi) = (
            next(it) for _ in range(8)
        )
        ovx, ovy, ovz = (next(it) for _ in range(3))
        (o_sxyy_lo, o_sxyy_hi, o_syyy_lo, o_syyy_hi, o_syzy_lo, o_syzy_hi,
         o_sxzz_lo, o_sxzz_hi, o_syzz_lo, o_syzz_hi, o_szzz_lo,
         o_szzz_hi) = (next(it) for _ in range(12))
        (ox_sxx_lo, ox_sxx_hi, ox_sxy_lo, ox_sxy_hi, ox_sxz_lo,
         ox_sxz_hi) = (next(it) for _ in range(6))
        ring_xx, ring_xy, ring_xz, tail_xx, tail_xy, tail_xz = (
            next(it) for _ in range(6)
        )
        i = pl.program_id(0)
        in_xx = sxx_ref[...]
        in_xy = sxy_ref[...]
        in_xz = sxz_ref[...]
        stash(ring_xx, in_xx, i)
        stash(ring_xy, in_xy, i)
        stash(ring_xz, in_xz, i)

        @pl.when(i >= 1)
        def _():
            w_xx = window(ring_xx, tail_xx, in_xx, i, g_xx_lo[...], g_xx_hi[...])
            w_xy = window(ring_xy, tail_xy, in_xy, i, g_xy_lo[...], g_xy_hi[...])
            w_xz = window(ring_xz, tail_xz, in_xz, i, g_xz_lo[...], g_xz_hi[...])
            cyh = (cyh_blo, cyh_alo, cyh_bhi, cyh_ahi)
            czh = (czh_blo, czh_alo, czh_bhi, czh_ahi)
            cyi = (cyi_blo, cyi_alo, cyi_bhi, cyi_ahi)
            czi = (czi_blo, czi_alo, czi_bhi, czi_ahi)

            sxy = w_xy[2 : 2 + nb]
            sxz = w_xz[2 : 2 + nb]
            dsxx_x, nx_sxx_lo, nx_sxx_hi = _x_cpml_apply(
                dpx_w(w_xx), px_sxx_lo, px_sxx_hi,
                cxh_blo, cxh_alo, cxh_bhi, cxh_ahi,
            )
            dsxy_x, nx_sxy_lo, nx_sxy_hi = _x_cpml_apply(
                dmx_w(w_xy), px_sxy_lo, px_sxy_hi,
                cxi_blo, cxi_alo, cxi_bhi, cxi_ahi,
            )
            dsxz_x, nx_sxz_lo, nx_sxz_hi = _x_cpml_apply(
                dmx_w(w_xz), px_sxz_lo, px_sxz_hi,
                cxi_blo, cxi_alo, cxi_bhi, cxi_ahi,
            )
            ox_sxx_lo[...] = nx_sxx_lo
            ox_sxx_hi[...] = nx_sxx_hi
            ox_sxy_lo[...] = nx_sxy_lo
            ox_sxy_hi[...] = nx_sxy_hi
            ox_sxz_lo[...] = nx_sxz_lo
            ox_sxz_hi[...] = nx_sxz_hi
            dsxy_y, n_sxyy_lo, n_sxyy_hi = cpml(
                _d_minus_y(sxy), p_sxyy_lo, p_sxyy_hi, cyi, 1
            )
            dsyy_y, n_syyy_lo, n_syyy_hi = cpml(
                _d_plus_y(syy_ref[...]), p_syyy_lo, p_syyy_hi, cyh, 1
            )
            dsyz_y, n_syzy_lo, n_syzy_hi = cpml(
                _d_minus_y(syz_ref[...]), p_syzy_lo, p_syzy_hi, cyi, 1
            )
            dsxz_z, n_sxzz_lo, n_sxzz_hi = cpml(
                _d_minus_z(sxz), p_sxzz_lo, p_sxzz_hi, czi, 2
            )
            dsyz_z, n_syzz_lo, n_syzz_hi = cpml(
                _d_minus_z(syz_ref[...]), p_syzz_lo, p_syzz_hi, czi, 2
            )
            dszz_z, n_szzz_lo, n_szzz_hi = cpml(
                _d_plus_z(szz_ref[...]), p_szzz_lo, p_szzz_hi, czh, 2
            )
            rho_inv = rho_ref[...]
            ovx[...] = vx_ref[...] + dt_dx * rho_inv * (dsxx_x + dsxy_y + dsxz_z)
            ovy[...] = vy_ref[...] + dt_dx * rho_inv * (dsxy_x + dsyy_y + dsyz_z)
            vz_new = vz_ref[...] + dt_dx * rho_inv * (dsxz_x + dsyz_y + dszz_z)
            if fuse_src:
                # CW plane source fused in (no jnp vz post-pass):
                # sin(wt + ph) = sin(wt)cos(ph) + cos(wt)sin(ph)
                amp = amp_ref[...]
                sval = (
                    tsrc_ref[0, 0] * cph_ref[...]
                    + tsrc_ref[0, 1] * sph_ref[...]
                )
                z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
                on_src = (z_iota == zsrc) & (amp > 0)
                ovz[...] = jnp.where(on_src, sval * amp, vz_new)
            else:
                ovz[...] = vz_new
            o_sxyy_lo[...] = n_sxyy_lo
            o_sxyy_hi[...] = n_sxyy_hi
            o_syyy_lo[...] = n_syyy_lo
            o_syyy_hi[...] = n_syyy_hi
            o_syzy_lo[...] = n_syzy_lo
            o_syzy_hi[...] = n_syzy_hi
            o_sxzz_lo[...] = n_sxzz_lo
            o_sxzz_hi[...] = n_sxzz_hi
            o_syzz_lo[...] = n_syzz_lo
            o_syzz_hi[...] = n_syzz_hi
            o_szzz_lo[...] = n_szzz_lo
            o_szzz_hi[...] = n_szzz_hi
            tail_xx[...] = w_xx[nb : nb + 2]
            tail_xy[...] = w_xy[nb : nb + 2]
            tail_xz[...] = w_xz[nb : nb + 2]

    plane = lambda: pl.BlockSpec((nb, N2, 1), lag, memory_space=pltpu.VMEM)
    smem2 = lambda: pl.BlockSpec(
        (1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    src_specs = [plane(), plane(), plane(), smem2()] if fuse_src else []
    vel_psix_in0 = 3 + 7 + 12 + 6 + len(src_specs) + 16
    vel_aliases = {6: 0, 7: 1, 8: 2}  # vx, vy, vz
    for a in range(12):  # psi y + z
        vel_aliases[10 + a] = 3 + a
    for a in range(6):  # psi x
        vel_aliases[vel_psix_in0 + a] = 15 + a
    vel_call = pl.pallas_call(
        vel_kernel,
        grid=(n_slabs + 1,),
        in_specs=(
            [slab(cur)] * 3
            + [slab(lag)] * 7
            + [slab_y(lag)] * 6
            + [slab_z(lag)] * 6
            + [ghost_spec] * 6
            + src_specs
            + [coef_y] * 4 + [coef_z] * 4 + [coef_y] * 4 + [coef_z] * 4
            + [psix_lo_spec, psix_hi_spec] * 3
            + [coefx_lo, coefx_lo, coefx_hi, coefx_hi] * 2
        ),
        out_specs=(
            [slab(lag)] * 3 + [slab_y(lag)] * 6 + [slab_z(lag)] * 6
            + [psix_lo_spec, psix_hi_spec] * 3
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)] * 3
            + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 6
            + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 6
            + [psix_shape] * 6
        ),
        scratch_shapes=[pltpu.VMEM((2, nb, N2, N3), jnp.float32)] * 3
        + [pltpu.VMEM((2, N2, N3), jnp.float32)] * 3,
        input_output_aliases=vel_aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )

    # ------------------------------------------------------------------
    # stress kernel: streams vx, vy, vz
    # ------------------------------------------------------------------
    def stress_kernel(*refs):
        it = iter(refs)
        vx_ref, vy_ref, vz_ref = (next(it) for _ in range(3))
        sxx_ref, syy_ref, szz_ref, sxy_ref, sxz_ref, syz_ref = (
            next(it) for _ in range(6)
        )
        rxx_ref, ryy_ref, rzz_ref, rxy_ref, rxz_ref, ryz_ref = (
            next(it) for _ in range(6)
        )
        piu_ref, muu_ref, crp_ref, crs_ref, br_ref = (
            next(it) for _ in range(5)
        )
        if with_dft:
            acc_c_ref, acc_s_ref, peak_ref = (next(it) for _ in range(3))
        (p_vyy_lo, p_vyy_hi, p_vxy_lo, p_vxy_hi, p_vzy_lo, p_vzy_hi,
         p_vzz_lo, p_vzz_hi, p_vxz_lo, p_vxz_hi, p_vyz_lo, p_vyz_hi) = (
            next(it) for _ in range(12)
        )
        g_x_lo, g_x_hi, g_y_lo, g_y_hi, g_z_lo, g_z_hi = (
            next(it) for _ in range(6)
        )
        if with_dft:
            scal_ref = next(it)
        (cyh_blo, cyh_alo, cyh_bhi, cyh_ahi,
         czh_blo, czh_alo, czh_bhi, czh_ahi,
         cyi_blo, cyi_alo, cyi_bhi, cyi_ahi,
         czi_blo, czi_alo, czi_bhi, czi_ahi) = (
            next(it) for _ in range(16)
        )
        px_vx_lo, px_vx_hi, px_vy_lo, px_vy_hi, px_vz_lo, px_vz_hi = (
            next(it) for _ in range(6)
        )
        (xh_blo, xh_alo, xh_bhi, xh_ahi,
         xi_blo, xi_alo, xi_bhi, xi_ahi) = (next(it) for _ in range(8))
        osxx, osyy, oszz, osxy, osxz, osyz = (next(it) for _ in range(6))
        orxx, oryy, orzz, orxy, orxz, oryz = (next(it) for _ in range(6))
        if with_dft:
            oacc_c, oacc_s, opeak = (next(it) for _ in range(3))
        (o_vyy_lo, o_vyy_hi, o_vxy_lo, o_vxy_hi, o_vzy_lo, o_vzy_hi,
         o_vzz_lo, o_vzz_hi, o_vxz_lo, o_vxz_hi, o_vyz_lo, o_vyz_hi) = (
            next(it) for _ in range(12)
        )
        ox_vx_lo, ox_vx_hi, ox_vy_lo, ox_vy_hi, ox_vz_lo, ox_vz_hi = (
            next(it) for _ in range(6)
        )
        ring_x, ring_y, ring_z, tail_x, tail_y, tail_z = (
            next(it) for _ in range(6)
        )
        i = pl.program_id(0)
        in_x = vx_ref[...]
        in_y = vy_ref[...]
        in_z = vz_ref[...]
        stash(ring_x, in_x, i)
        stash(ring_y, in_y, i)
        stash(ring_z, in_z, i)

        @pl.when(i >= 1)
        def _():
            w_x = window(ring_x, tail_x, in_x, i, g_x_lo[...], g_x_hi[...])
            w_y = window(ring_y, tail_y, in_y, i, g_y_lo[...], g_y_hi[...])
            w_z = window(ring_z, tail_z, in_z, i, g_z_lo[...], g_z_hi[...])
            cyh = (cyh_blo, cyh_alo, cyh_bhi, cyh_ahi)
            czh = (czh_blo, czh_alo, czh_bhi, czh_ahi)
            cyi = (cyi_blo, cyi_alo, cyi_bhi, cyi_ahi)
            czi = (czi_blo, czi_alo, czi_bhi, czi_ahi)

            vx = w_x[2 : 2 + nb]
            vy = w_y[2 : 2 + nb]
            vz = w_z[2 : 2 + nb]
            dvx_x, nx_vx_lo, nx_vx_hi = _x_cpml_apply(
                dmx_w(w_x), px_vx_lo, px_vx_hi,
                xi_blo, xi_alo, xi_bhi, xi_ahi,
            )
            dvy_x, nx_vy_lo, nx_vy_hi = _x_cpml_apply(
                dpx_w(w_y), px_vy_lo, px_vy_hi,
                xh_blo, xh_alo, xh_bhi, xh_ahi,
            )
            dvz_x, nx_vz_lo, nx_vz_hi = _x_cpml_apply(
                dpx_w(w_z), px_vz_lo, px_vz_hi,
                xh_blo, xh_alo, xh_bhi, xh_ahi,
            )
            ox_vx_lo[...] = nx_vx_lo
            ox_vx_hi[...] = nx_vx_hi
            ox_vy_lo[...] = nx_vy_lo
            ox_vy_hi[...] = nx_vy_hi
            ox_vz_lo[...] = nx_vz_lo
            ox_vz_hi[...] = nx_vz_hi
            dvy_y, n_vyy_lo, n_vyy_hi = cpml(
                _d_minus_y(vy), p_vyy_lo, p_vyy_hi, cyi, 1
            )
            dvx_y, n_vxy_lo, n_vxy_hi = cpml(
                _d_plus_y(vx), p_vxy_lo, p_vxy_hi, cyh, 1
            )
            dvz_y, n_vzy_lo, n_vzy_hi = cpml(
                _d_plus_y(vz), p_vzy_lo, p_vzy_hi, cyh, 1
            )
            dvz_z, n_vzz_lo, n_vzz_hi = cpml(
                _d_minus_z(vz), p_vzz_lo, p_vzz_hi, czi, 2
            )
            dvx_z, n_vxz_lo, n_vxz_hi = cpml(
                _d_plus_z(vx), p_vxz_lo, p_vxz_hi, czh, 2
            )
            dvy_z, n_vyz_lo, n_vyz_hi = cpml(
                _d_plus_z(vy), p_vyz_lo, p_vyz_hi, czh, 2
            )
            theta = dvx_x + dvy_y + dvz_z
            pi_u = piu_ref[...]
            mu_u = muu_ref[...]
            b_r = br_ref[...]
            c_rp = crp_ref[...]
            c_rs = crs_ref[...]

            def diag(s_old, r_old, d_own):
                if viscous:
                    phi = c_rp * theta - 2.0 * c_rs * (theta - d_own)
                    r_new = b_r * r_old - phi * inv_dx
                    s_new = (
                        s_old
                        + dt_dx * (pi_u * theta - 2 * mu_u * (theta - d_own))
                        + dt * 0.5 * (r_new + r_old)
                    )
                else:
                    r_new = r_old
                    s_new = s_old + dt_dx * (
                        pi_u * theta - 2 * mu_u * (theta - d_own)
                    )
                return s_new, r_new

            sxx_n, rxx_n = diag(sxx_ref[...], rxx_ref[...], dvx_x)
            syy_n, ryy_n = diag(syy_ref[...], ryy_ref[...], dvy_y)
            szz_n, rzz_n = diag(szz_ref[...], rzz_ref[...], dvz_z)

            def shear(s_old, r_old, e):
                if viscous:
                    r_new = b_r * r_old - c_rs * e * inv_dx
                    s_new = s_old + dt_dx * mu_u * e + dt * 0.5 * (r_new + r_old)
                else:
                    r_new = r_old
                    s_new = s_old + dt_dx * mu_u * e
                return s_new, r_new

            sxy_n, rxy_n = shear(sxy_ref[...], rxy_ref[...], dvx_y + dvy_x)
            sxz_n, rxz_n = shear(sxz_ref[...], rxz_ref[...], dvx_z + dvz_x)
            syz_n, ryz_n = shear(syz_ref[...], ryz_ref[...], dvy_z + dvz_y)

            osxx[...] = sxx_n
            osyy[...] = syy_n
            oszz[...] = szz_n
            osxy[...] = sxy_n
            osxz[...] = sxz_n
            osyz[...] = syz_n
            orxx[...] = rxx_n
            oryy[...] = ryy_n
            orzz[...] = rzz_n
            orxy[...] = rxy_n
            orxz[...] = rxz_n
            oryz[...] = ryz_n
            if with_dft:
                pressure = -(sxx_n + syy_n + szz_n) * (1.0 / 3.0)
                cosw = scal_ref[0, 0]
                sinw = scal_ref[0, 1]
                oacc_c[...] = acc_c_ref[...] + pressure * cosw
                oacc_s[...] = acc_s_ref[...] + pressure * sinw
                opeak[...] = jnp.maximum(
                    peak_ref[...],
                    jnp.abs(pressure) * (cosw * cosw + sinw * sinw > 0),
                )
            o_vyy_lo[...] = n_vyy_lo
            o_vyy_hi[...] = n_vyy_hi
            o_vxy_lo[...] = n_vxy_lo
            o_vxy_hi[...] = n_vxy_hi
            o_vzy_lo[...] = n_vzy_lo
            o_vzy_hi[...] = n_vzy_hi
            o_vzz_lo[...] = n_vzz_lo
            o_vzz_hi[...] = n_vzz_hi
            o_vxz_lo[...] = n_vxz_lo
            o_vxz_hi[...] = n_vxz_hi
            o_vyz_lo[...] = n_vyz_lo
            o_vyz_hi[...] = n_vyz_hi
            tail_x[...] = w_x[nb : nb + 2]
            tail_y[...] = w_y[nb : nb + 2]
            tail_z[...] = w_z[nb : nb + 2]

    n_acc = 3 if with_dft else 0
    s_psi_in0 = 20 + n_acc
    s_psix_in0 = s_psi_in0 + 12 + 6 + (1 if with_dft else 0) + 16
    stress_aliases = {}
    for a in range(6):  # stresses
        stress_aliases[3 + a] = a
    for a in range(6):  # memory vars
        stress_aliases[9 + a] = 6 + a
    for a in range(n_acc):  # accs, peak
        stress_aliases[20 + a] = 12 + a
    for a in range(12):  # psi y + z
        stress_aliases[s_psi_in0 + a] = 12 + n_acc + a
    for a in range(6):  # psi x
        stress_aliases[s_psix_in0 + a] = 24 + n_acc + a
    stress_call = pl.pallas_call(
        stress_kernel,
        grid=(n_slabs + 1,),
        in_specs=(
            [slab(cur)] * 3          # vx, vy, vz streamed
            + [slab(lag)] * 6        # stresses
            + [slab(lag)] * 6        # memory vars
            + [slab(lag)] * 5        # props
            + [slab(lag)] * n_acc    # acc_c, acc_s, peak
            + [slab_y(lag)] * 6 + [slab_z(lag)] * 6
            + [ghost_spec] * 6
            + ([smem2()] if with_dft else [])
            + [coef_y] * 4 + [coef_z] * 4 + [coef_y] * 4 + [coef_z] * 4
            + [psix_lo_spec, psix_hi_spec] * 3
            + [coefx_lo, coefx_lo, coefx_hi, coefx_hi] * 2
        ),
        out_specs=(
            [slab(lag)] * (12 + n_acc) + [slab_y(lag)] * 6 + [slab_z(lag)] * 6
            + [psix_lo_spec, psix_hi_spec] * 3
        ),
        out_shape=(
            [jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)] * (12 + n_acc)
            + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 6
            + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 6
            + [psix_shape] * 6
        ),
        scratch_shapes=[pltpu.VMEM((2, nb, N2, N3), jnp.float32)] * 3
        + [pltpu.VMEM((2, N2, N3), jnp.float32)] * 3,
        input_output_aliases=stress_aliases,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=110 * 1024 * 1024),
        interpret=interpret,
    )

    kc = {
        "y_half": tuple(jnp.asarray(c) for c in cy_h),
        "z_half": tuple(jnp.asarray(c) for c in cz_h),
        "y_int": tuple(jnp.asarray(c) for c in cy_i),
        "z_int": tuple(jnp.asarray(c) for c in cz_i),
        "x_half_pack": _pack_x_coefs(profiles_np, "half", ns, nb, xb["kx"]),
        "x_int_pack": _pack_x_coefs(profiles_np, "int", ns, nb, xb["kx"]),
        "px_planes": xb["px_planes"],
    }
    return vel_call, stress_call, kc


def build_visco_fused_step(grid, profiles_np, viscous, oz_scale, nb=4,
                           interpret=False, with_dft=True, edge_offset=0,
                           ycoef_mask=None):
    """Single-sweep fused viscoelastic step (velocity AND stress updates in
    one streaming pass; single-device x extent).

    Same temporal pipeline as build_fluid_fused_step: velocity for slab
    i-1 from the streamed old stresses, stress for slab i-2 from the
    freshly computed velocities held in slab-keyed VMEM rings. Removes the
    intermediate re-read of the 3 velocities and the second read of the 6
    stresses (~45 -> ~35 volume-equivalents of HBM traffic per step).
    Update equations identical to build_visco_pallas_step.
    """
    N1, N2, N3 = grid.shape
    fuse_src = grid.source_type == "velocity_plane"
    vol_src = grid.source_type == "velocity_volume"
    zsrc = grid.source_plane_z
    point = grid.source_type == "stress_point"
    if point:
        i0_pt, j0_pt, k0_pt = (int(v) for v in grid.source_ijk)
        s_pt, li_pt = divmod(i0_pt, nb)
    if N1 % nb or nb < 2:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb} >= 2")
    ns = grid.npml + 2
    n_slabs = N1 // nb
    dt_dx = np.float32(grid.dt / grid.dx)
    dt = np.float32(grid.dt)
    inv_dx = np.float32(1.0 / grid.dx)

    cy_h = _make_profiles_const(profiles_np, 1, "half", ns)
    cz_h = _make_profiles_const(profiles_np, 2, "half", ns)
    cy_i = _make_profiles_const(profiles_np, 1, "int", ns)
    cz_i = _make_profiles_const(profiles_np, 2, "int", ns)
    if ycoef_mask is not None:
        cy_h = _mask_y_consts(cy_h, ycoef_mask)
        cy_i = _mask_y_consts(cy_i, ycoef_mask)

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    slab_y = lambda idx: pl.BlockSpec((nb, ns, N3), idx, memory_space=pltpu.VMEM)
    slab_z = lambda idx: pl.BlockSpec((nb, N2, ns), idx, memory_space=pltpu.VMEM)
    coef_y = pl.BlockSpec((1, ns, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    coef_z = pl.BlockSpec((1, 1, ns), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)
    lag1 = lambda i: (jnp.minimum(jnp.maximum(i - 1, 0), n_slabs - 1), 0, 0)
    lag2 = lambda i: (jnp.minimum(jnp.maximum(i - 2, 0), n_slabs - 1), 0, 0)
    ghost_spec = pl.BlockSpec(
        (2, N2, N3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )

    kx = -(-ns // nb)
    if n_slabs < kx + 1:
        raise ValueError(f"N1={N1} too small for the fused pipeline")
    px_planes = (kx + 1) * nb
    h0 = int(edge_offset)
    lo1m = lambda i: (jnp.minimum(jnp.maximum(i - 1 - h0, 0), kx), 0, 0)
    lo2m = lambda i: (jnp.minimum(jnp.maximum(i - 2 - h0, 0), kx), 0, 0)

    def hi_of(lag):
        base = n_slabs - kx - h0

        def m(i):
            s = jnp.minimum(jnp.maximum(i - lag, 0), n_slabs - 1)
            return (jnp.where((s >= base) & (s < n_slabs - h0), s - base,
                              kx), 0, 0)
        return m

    psixb = lambda m: pl.BlockSpec((nb, N2, N3), m, memory_space=pltpu.VMEM)
    coefxb = lambda m: pl.BlockSpec((nb, 1, 1), m, memory_space=pltpu.VMEM)
    psix_shape = jax.ShapeDtypeStruct((px_planes, N2, N3), jnp.float32)

    def dpx_w(w):
        return _C1 * (w[3 : 3 + nb] - w[2 : 2 + nb]) + _C2 * (
            w[4 : 4 + nb] - w[1 : 1 + nb]
        )

    def dmx_w(w):
        return _C1 * (w[2 : 2 + nb] - w[1 : 1 + nb]) + _C2 * (
            w[3 : 3 + nb] - w[0:nb]
        )

    def kernel(*refs):
        it = iter(refs)
        sxx_ref, sxy_ref, sxz_ref = (next(it) for _ in range(3))  # cur
        syy_ref, szz_ref, syz_ref = (next(it) for _ in range(3))  # lag1
        vx_ref, vy_ref, vz_ref, rho_ref = (next(it) for _ in range(4))
        rxx_ref, ryy_ref, rzz_ref, rxy_ref, rxz_ref, ryz_ref = (
            next(it) for _ in range(6)
        )
        piu_ref, muu_ref, crp_ref, crs_ref, br_ref = (
            next(it) for _ in range(5)
        )
        if with_dft:
            acc_c_ref, acc_s_ref, peak_ref = (next(it) for _ in range(3))
        psi_v = [next(it) for _ in range(12)]   # vel-phase psi (lag1)
        psi_s = [next(it) for _ in range(12)]   # stress-phase psi (lag2)
        ghost_ref = next(it)
        if fuse_src:
            amp_ref, cph_ref, sph_ref, tsrc_ref = (
                next(it) for _ in range(4)
            )
        if vol_src:
            # dome transducer: per-voxel velocity drive along normals
            # (`BabelIntegrationDOME_PHASEDARRAY.py:344-407` capability)
            (amp3_ref, cph3_ref, sph3_ref, ox_ref, oy_ref, oz_ref,
             tsrc_ref) = (next(it) for _ in range(7))
        if point:
            psrc_ref = next(it)
        if with_dft:
            scal_ref = next(it)
        cyh = tuple(next(it) for _ in range(4))
        czh = tuple(next(it) for _ in range(4))
        cyi = tuple(next(it) for _ in range(4))
        czi = tuple(next(it) for _ in range(4))
        (px_sxx_lo, px_sxx_hi, px_sxy_lo, px_sxy_hi, px_sxz_lo,
         px_sxz_hi) = (next(it) for _ in range(6))
        (cxh_blo1, cxh_alo1, cxh_bhi1, cxh_ahi1,
         cxi_blo1, cxi_alo1, cxi_bhi1, cxi_ahi1) = (
            next(it) for _ in range(8)
        )
        (px_vx_lo, px_vx_hi, px_vy_lo, px_vy_hi, px_vz_lo, px_vz_hi) = (
            next(it) for _ in range(6)
        )
        (cxh_blo2, cxh_alo2, cxh_bhi2, cxh_ahi2,
         cxi_blo2, cxi_alo2, cxi_bhi2, cxi_ahi2) = (
            next(it) for _ in range(8)
        )
        ovx, ovy, ovz = (next(it) for _ in range(3))
        osxx, osyy, oszz, osxy, osxz, osyz = (next(it) for _ in range(6))
        orxx, oryy, orzz, orxy, orxz, oryz = (next(it) for _ in range(6))
        if with_dft:
            oacc_c, oacc_s, opeak = (next(it) for _ in range(3))
        opsi_v = [next(it) for _ in range(12)]
        opsi_s = [next(it) for _ in range(12)]
        (ox_sxx_lo, ox_sxx_hi, ox_sxy_lo, ox_sxy_hi, ox_sxz_lo,
         ox_sxz_hi) = (next(it) for _ in range(6))
        (ox_vx_lo, ox_vx_hi, ox_vy_lo, ox_vy_hi, ox_vz_lo, ox_vz_hi) = (
            next(it) for _ in range(6)
        )
        (ring_xx, ring_xy, ring_xz, ring_yy, ring_zz, ring_yz,
         rvx, rvy, rvz) = (next(it) for _ in range(9))

        i = pl.program_id(0)
        ghost = ghost_ref[...]

        @pl.when(i < n_slabs)
        def _():
            ring_xx[i % 3] = sxx_ref[...]
            ring_xy[i % 3] = sxy_ref[...]
            ring_xz[i % 3] = sxz_ref[...]

        def cpml(d, lo_ref, hi_ref, coefs, axis):
            return _apply_cpml_inplane(
                d, lo_ref[...], hi_ref[...],
                coefs[0][...], coefs[1][...], coefs[2][...], coefs[3][...],
                axis=axis,
            )

        def win(ring, s):
            prev2 = jnp.where(s >= 1, ring[(s - 1) % 3][nb - 2 :], ghost)
            nxt2 = jnp.where(s < n_slabs - 1, ring[(s + 1) % 3][0:2], ghost)
            return jnp.concatenate([prev2, ring[s % 3], nxt2], axis=0)

        # ---- velocity update for slab sv = i-1 ----
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            sv = i - 1
            w_xx = win(ring_xx, sv)
            w_xy = win(ring_xy, sv)
            w_xz = win(ring_xz, sv)
            sxy = w_xy[2 : 2 + nb]
            sxz = w_xz[2 : 2 + nb]
            dsxx_x, nx_sxx_lo, nx_sxx_hi = _x_cpml_apply(
                dpx_w(w_xx), px_sxx_lo, px_sxx_hi,
                cxh_blo1, cxh_alo1, cxh_bhi1, cxh_ahi1,
            )
            dsxy_x, nx_sxy_lo, nx_sxy_hi = _x_cpml_apply(
                dmx_w(w_xy), px_sxy_lo, px_sxy_hi,
                cxi_blo1, cxi_alo1, cxi_bhi1, cxi_ahi1,
            )
            dsxz_x, nx_sxz_lo, nx_sxz_hi = _x_cpml_apply(
                dmx_w(w_xz), px_sxz_lo, px_sxz_hi,
                cxi_blo1, cxi_alo1, cxi_bhi1, cxi_ahi1,
            )
            ox_sxx_lo[...] = nx_sxx_lo
            ox_sxx_hi[...] = nx_sxx_hi
            ox_sxy_lo[...] = nx_sxy_lo
            ox_sxy_hi[...] = nx_sxy_hi
            ox_sxz_lo[...] = nx_sxz_lo
            ox_sxz_hi[...] = nx_sxz_hi
            dsxy_y, n0, n1 = cpml(_d_minus_y(sxy), psi_v[0], psi_v[1], cyi, 1)
            opsi_v[0][...] = n0
            opsi_v[1][...] = n1
            dsyy_y, n0, n1 = cpml(
                _d_plus_y(syy_ref[...]), psi_v[2], psi_v[3], cyh, 1
            )
            opsi_v[2][...] = n0
            opsi_v[3][...] = n1
            dsyz_y, n0, n1 = cpml(
                _d_minus_y(syz_ref[...]), psi_v[4], psi_v[5], cyi, 1
            )
            opsi_v[4][...] = n0
            opsi_v[5][...] = n1
            dsxz_z, n0, n1 = cpml(_d_minus_z(sxz), psi_v[6], psi_v[7], czi, 2)
            opsi_v[6][...] = n0
            opsi_v[7][...] = n1
            dsyz_z, n0, n1 = cpml(
                _d_minus_z(syz_ref[...]), psi_v[8], psi_v[9], czi, 2
            )
            opsi_v[8][...] = n0
            opsi_v[9][...] = n1
            dszz_z, n0, n1 = cpml(
                _d_plus_z(szz_ref[...]), psi_v[10], psi_v[11], czh, 2
            )
            opsi_v[10][...] = n0
            opsi_v[11][...] = n1
            rho_inv = rho_ref[...]
            vx_n = vx_ref[...] + dt_dx * rho_inv * (dsxx_x + dsxy_y + dsxz_z)
            vy_n = vy_ref[...] + dt_dx * rho_inv * (dsxy_x + dsyy_y + dsyz_z)
            vz_n = vz_ref[...] + dt_dx * rho_inv * (dsxz_x + dsyz_y + dszz_z)
            if fuse_src:
                amp = amp_ref[...]
                sval = (
                    tsrc_ref[0, 0] * cph_ref[...]
                    + tsrc_ref[0, 1] * sph_ref[...]
                )
                z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
                on_src = (z_iota == zsrc) & (amp > 0)
                vz_n = jnp.where(on_src, sval * amp, vz_n)
            if vol_src:
                amp3 = amp3_ref[...]
                sval3 = (
                    tsrc_ref[0, 0] * cph3_ref[...]
                    + tsrc_ref[0, 1] * sph3_ref[...]
                ) * amp3
                on3 = amp3 > 0
                vx_n = jnp.where(on3, sval3 * ox_ref[...], vx_n)
                vy_n = jnp.where(on3, sval3 * oy_ref[...], vy_n)
                vz_n = jnp.where(on3, sval3 * oz_ref[...], vz_n)
            ovx[...] = vx_n
            ovy[...] = vy_n
            ovz[...] = vz_n
            rvx[sv % 3] = vx_n
            rvy[sv % 3] = vy_n
            rvz[sv % 3] = vz_n
            # hold syy/szz/syz for this slab's stress update next iteration
            ring_yy[sv % 2] = syy_ref[...]
            ring_zz[sv % 2] = szz_ref[...]
            ring_yz[sv % 2] = syz_ref[...]

        # ---- stress update for slab sp = i-2 ----
        @pl.when(i >= 2)
        def _():
            sp = i - 2
            w_x = win(rvx, sp)
            w_y = win(rvy, sp)
            w_z = win(rvz, sp)
            vx = w_x[2 : 2 + nb]
            vy = w_y[2 : 2 + nb]
            vz = w_z[2 : 2 + nb]
            dvx_x, nx_vx_lo, nx_vx_hi = _x_cpml_apply(
                dmx_w(w_x), px_vx_lo, px_vx_hi,
                cxi_blo2, cxi_alo2, cxi_bhi2, cxi_ahi2,
            )
            dvy_x, nx_vy_lo, nx_vy_hi = _x_cpml_apply(
                dpx_w(w_y), px_vy_lo, px_vy_hi,
                cxh_blo2, cxh_alo2, cxh_bhi2, cxh_ahi2,
            )
            dvz_x, nx_vz_lo, nx_vz_hi = _x_cpml_apply(
                dpx_w(w_z), px_vz_lo, px_vz_hi,
                cxh_blo2, cxh_alo2, cxh_bhi2, cxh_ahi2,
            )
            ox_vx_lo[...] = nx_vx_lo
            ox_vx_hi[...] = nx_vx_hi
            ox_vy_lo[...] = nx_vy_lo
            ox_vy_hi[...] = nx_vy_hi
            ox_vz_lo[...] = nx_vz_lo
            ox_vz_hi[...] = nx_vz_hi
            dvy_y, n0, n1 = cpml(_d_minus_y(vy), psi_s[0], psi_s[1], cyi, 1)
            opsi_s[0][...] = n0
            opsi_s[1][...] = n1
            dvx_y, n0, n1 = cpml(_d_plus_y(vx), psi_s[2], psi_s[3], cyh, 1)
            opsi_s[2][...] = n0
            opsi_s[3][...] = n1
            dvz_y, n0, n1 = cpml(_d_plus_y(vz), psi_s[4], psi_s[5], cyh, 1)
            opsi_s[4][...] = n0
            opsi_s[5][...] = n1
            dvz_z, n0, n1 = cpml(_d_minus_z(vz), psi_s[6], psi_s[7], czi, 2)
            opsi_s[6][...] = n0
            opsi_s[7][...] = n1
            dvx_z, n0, n1 = cpml(_d_plus_z(vx), psi_s[8], psi_s[9], czh, 2)
            opsi_s[8][...] = n0
            opsi_s[9][...] = n1
            dvy_z, n0, n1 = cpml(_d_plus_z(vy), psi_s[10], psi_s[11], czh, 2)
            opsi_s[10][...] = n0
            opsi_s[11][...] = n1
            theta = dvx_x + dvy_y + dvz_z
            pi_u = piu_ref[...]
            mu_u = muu_ref[...]
            b_r = br_ref[...]
            c_rp = crp_ref[...]
            c_rs = crs_ref[...]

            def diag(s_old, r_old, d_own):
                if viscous:
                    phi = c_rp * theta - 2.0 * c_rs * (theta - d_own)
                    r_new = b_r * r_old - phi * inv_dx
                    s_new = (
                        s_old
                        + dt_dx * (pi_u * theta - 2 * mu_u * (theta - d_own))
                        + dt * 0.5 * (r_new + r_old)
                    )
                else:
                    r_new = r_old
                    s_new = s_old + dt_dx * (
                        pi_u * theta - 2 * mu_u * (theta - d_own)
                    )
                return s_new, r_new

            sxx_n, rxx_n = diag(ring_xx[sp % 3], rxx_ref[...], dvx_x)
            syy_n, ryy_n = diag(ring_yy[sp % 2], ryy_ref[...], dvy_y)
            szz_n, rzz_n = diag(ring_zz[sp % 2], rzz_ref[...], dvz_z)

            def shear(s_old, r_old, e):
                if viscous:
                    r_new = b_r * r_old - c_rs * e * inv_dx
                    s_new = (
                        s_old + dt_dx * mu_u * e + dt * 0.5 * (r_new + r_old)
                    )
                else:
                    r_new = r_old
                    s_new = s_old + dt_dx * mu_u * e
                return s_new, r_new

            sxy_n, rxy_n = shear(ring_xy[sp % 3], rxy_ref[...], dvx_y + dvy_x)
            sxz_n, rxz_n = shear(ring_xz[sp % 3], rxz_ref[...], dvx_z + dvz_x)
            syz_n, ryz_n = shear(ring_yz[sp % 2], ryz_ref[...], dvy_z + dvz_y)

            if point:
                ii_p = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
                jj_p = jax.lax.broadcasted_iota(jnp.int32, (1, N2, 1), 1)
                kk_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
                sel = (sp == s_pt).astype(jnp.float32)
                inj = psrc_ref[0, 0] * sel * (
                    (ii_p == li_pt) & (jj_p == j0_pt) & (kk_p == k0_pt)
                ).astype(jnp.float32)
                sxx_n = sxx_n + inj
                syy_n = syy_n + inj
                szz_n = szz_n + inj

            osxx[...] = sxx_n
            osyy[...] = syy_n
            oszz[...] = szz_n
            osxy[...] = sxy_n
            osxz[...] = sxz_n
            osyz[...] = syz_n
            orxx[...] = rxx_n
            oryy[...] = ryy_n
            orzz[...] = rzz_n
            orxy[...] = rxy_n
            orxz[...] = rxz_n
            oryz[...] = ryz_n
            if with_dft:
                pressure = -(sxx_n + syy_n + szz_n) * (1.0 / 3.0)
                cosw = scal_ref[0, 0]
                sinw = scal_ref[0, 1]
                oacc_c[...] = acc_c_ref[...] + pressure * cosw
                oacc_s[...] = acc_s_ref[...] + pressure * sinw
                opeak[...] = jnp.maximum(
                    peak_ref[...],
                    jnp.abs(pressure) * (cosw * cosw + sinw * sinw > 0),
                )

    plane = lambda: pl.BlockSpec((nb, N2, 1), lag1, memory_space=pltpu.VMEM)
    smem2 = lambda: pl.BlockSpec(
        (1, 2), lambda i: (0, 0), memory_space=pltpu.SMEM
    )
    n_acc = 3 if with_dft else 0
    vol = lambda: jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)
    n_src = 4 if fuse_src else (7 if vol_src else 0)

    psi_v_specs = (
        [slab_y(lag1)] * 6 + [slab_z(lag1)] * 6
    )
    psi_s_specs = (
        [slab_y(lag2)] * 6 + [slab_z(lag2)] * 6
    )
    in_specs = (
        [slab(cur)] * 3                                # sxx, sxy, sxz
        + [slab(lag1)] * 3                             # syy, szz, syz
        + [slab(lag1)] * 4                             # vx, vy, vz, rho
        + [slab(lag2)] * 6                             # r's
        + [slab(lag2)] * 5                             # props
        + [slab(lag2)] * n_acc                         # accs
        + psi_v_specs
        + psi_s_specs
        + [ghost_spec]
        + ([plane(), plane(), plane(), smem2()] if fuse_src else [])
        + ([slab(lag1)] * 6 + [smem2()] if vol_src else [])
        + ([smem2()] if point else [])                 # psrc
        + ([smem2()] if with_dft else [])
        + [coef_y] * 4 + [coef_z] * 4 + [coef_y] * 4 + [coef_z] * 4
        + [psixb(lo1m), psixb(hi_of(1))] * 3           # psix sxx/sxy/sxz
        + [coefxb(lo1m), coefxb(lo1m), coefxb(hi_of(1)), coefxb(hi_of(1))] * 2
        + [psixb(lo2m), psixb(hi_of(2))] * 3           # psix vx/vy/vz
        + [coefxb(lo2m), coefxb(lo2m), coefxb(hi_of(2)), coefxb(hi_of(2))] * 2
    )
    out_specs = (
        [slab(lag1)] * 3                               # vx, vy, vz
        + [slab(lag2)] * 12                            # s's + r's
        + [slab(lag2)] * n_acc
        + [slab_y(lag1)] * 6 + [slab_z(lag1)] * 6      # psi_v
        + [slab_y(lag2)] * 6 + [slab_z(lag2)] * 6      # psi_s
        + [psixb(lo1m), psixb(hi_of(1))] * 3
        + [psixb(lo2m), psixb(hi_of(2))] * 3
    )
    out_shape = (
        [vol()] * (15 + n_acc)
        + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 6
        + [psix_shape] * 6
        + [psix_shape] * 6
    )
    # aliases: velocities, then stresses (inputs sxx,sxy,sxz=0-2 /
    # syy,szz,syz=3-5 onto outputs ordered sxx,syy,szz,sxy,sxz,syz at 3-8)
    aliases = {6: 0, 7: 1, 8: 2,
               0: 3, 3: 4, 4: 5, 1: 6, 2: 7, 5: 8}
    for a in range(6):                  # r's: inputs 10..15 -> outputs 9..14
        aliases[10 + a] = 9 + a
    for a in range(n_acc):
        aliases[21 + a] = 15 + a
    psi_in0 = 21 + n_acc
    for a in range(24):                 # psi_v + psi_s
        aliases[psi_in0 + a] = 15 + n_acc + a
    psix_in0 = (
        psi_in0 + 24 + 1 + n_src + (1 if point else 0)
        + (1 if with_dft else 0) + 16
    )
    for a in range(6):                  # psix stress (first block group)
        aliases[psix_in0 + a] = 39 + n_acc + a
    psixv_in0 = psix_in0 + 6 + 8
    for a in range(6):
        aliases[psixv_in0 + a] = 45 + n_acc + a

    ring_slab = lambda d: pltpu.VMEM((d, nb, N2, N3), jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(n_slabs + 2,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            ring_slab(3), ring_slab(3), ring_slab(3),  # sxx, sxy, sxz
            ring_slab(2), ring_slab(2), ring_slab(2),  # syy, szz, syz
            ring_slab(3), ring_slab(3), ring_slab(3),  # vx, vy, vz (new)
        ],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )
    kc = {
        "y_half": tuple(jnp.asarray(c) for c in cy_h),
        "z_half": tuple(jnp.asarray(c) for c in cz_h),
        "y_int": tuple(jnp.asarray(c) for c in cy_i),
        "z_int": tuple(jnp.asarray(c) for c in cz_i),
        "x_half_pack": _pack_x_coefs(profiles_np, "half", ns, nb, kx),
        "x_int_pack": _pack_x_coefs(profiles_np, "int", ns, nb, kx),
        "px_planes": px_planes,
    }
    return call, kc


def build_visco_fused2_step(grid, profiles_np, viscous, oz_scale, nb=2,
                            interpret=False, with_dft=True):
    """TWO viscoelastic timesteps per streaming sweep (temporal blocking).

    Pipeline at grid iteration i: velocity(t) slab i-1, stress(t) slab i-2,
    velocity(t+1) slab i-3, stress(t+1) slab i-4 — every field/material/psi
    array streams once per TWO steps (~17.5 volume-equivalents/step vs ~35
    for the 1-step fused kernel). All intermediate state lives in slab-keyed
    VMEM rings; CPML psi memories enter at their first-visit lag and exit at
    the second. Bit-equal to two applications of build_visco_fused_step.
    Requires velocity_plane sources (the stress_point post-correction can't
    see the intermediate step) and an even step count per scan phase.
    """
    N1, N2, N3 = grid.shape
    if grid.source_type != "velocity_plane":
        raise ValueError("fused2 visco requires a velocity_plane source")
    zsrc = grid.source_plane_z
    if N1 % nb or nb < 2:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb} >= 2")
    ns = grid.npml + 2
    n_slabs = N1 // nb
    dt_dx = np.float32(grid.dt / grid.dx)
    dt = np.float32(grid.dt)
    inv_dx = np.float32(1.0 / grid.dx)

    cy_h = _make_profiles_const(profiles_np, 1, "half", ns)
    cz_h = _make_profiles_const(profiles_np, 2, "half", ns)
    cy_i = _make_profiles_const(profiles_np, 1, "int", ns)
    cz_i = _make_profiles_const(profiles_np, 2, "int", ns)

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    slab_y = lambda idx: pl.BlockSpec((nb, ns, N3), idx, memory_space=pltpu.VMEM)
    slab_z = lambda idx: pl.BlockSpec((nb, N2, ns), idx, memory_space=pltpu.VMEM)
    coef_y = pl.BlockSpec((1, ns, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    coef_z = pl.BlockSpec((1, 1, ns), lambda i: (0, 0, 0), memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)

    def lagk(k):
        return lambda i: (jnp.minimum(jnp.maximum(i - k, 0), n_slabs - 1), 0, 0)

    ghost_spec = pl.BlockSpec(
        (2, N2, N3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    kx = -(-ns // nb)
    if n_slabs < kx + 3:
        raise ValueError(f"N1={N1} too small for the 2-step fused pipeline")
    px_planes = (kx + 1) * nb

    def lo_of(lag):
        return lambda i: (jnp.minimum(jnp.maximum(i - lag, 0), kx), 0, 0)

    def hi_of(lag):
        def m(i):
            s = jnp.minimum(jnp.maximum(i - lag, 0), n_slabs - 1)
            return (jnp.where(s >= n_slabs - kx, s - (n_slabs - kx), kx), 0, 0)
        return m

    psixb = lambda m: pl.BlockSpec((nb, N2, N3), m, memory_space=pltpu.VMEM)
    coefxb = lambda m: pl.BlockSpec((nb, 1, 1), m, memory_space=pltpu.VMEM)
    psix_shape = jax.ShapeDtypeStruct((px_planes, N2, N3), jnp.float32)

    def dpx_w(w):
        return _C1 * (w[3 : 3 + nb] - w[2 : 2 + nb]) + _C2 * (
            w[4 : 4 + nb] - w[1 : 1 + nb]
        )

    def dmx_w(w):
        return _C1 * (w[2 : 2 + nb] - w[1 : 1 + nb]) + _C2 * (
            w[3 : 3 + nb] - w[0:nb]
        )

    def kernel(*refs):
        it = iter(refs)
        sxx_ref, sxy_ref, sxz_ref = (next(it) for _ in range(3))  # cur
        syy_ref, szz_ref, syz_ref = (next(it) for _ in range(3))  # lag1
        vx_ref, vy_ref, vz_ref, rho_ref = (next(it) for _ in range(4))
        r_refs = [next(it) for _ in range(6)]                     # lag2
        piu_ref, muu_ref, crp_ref, crs_ref, br_ref = (
            next(it) for _ in range(5)
        )
        if with_dft:
            acc_c_ref, acc_s_ref, peak_ref = (next(it) for _ in range(3))
        psi_v_in = [next(it) for _ in range(12)]   # lag1
        psi_s_in = [next(it) for _ in range(12)]   # lag2
        ghost_ref = next(it)
        (amp1_ref, cph1_ref, sph1_ref, amp3_ref, cph3_ref, sph3_ref,
         tsrc_ref) = (next(it) for _ in range(7))
        if with_dft:
            scal_ref = next(it)
        cyh = tuple(next(it) for _ in range(4))
        czh = tuple(next(it) for _ in range(4))
        cyi = tuple(next(it) for _ in range(4))
        czi = tuple(next(it) for _ in range(4))
        psix_s_in = [next(it) for _ in range(6)]   # sxx/sxy/sxz lo+hi @1
        cx1 = [next(it) for _ in range(8)]         # half+int packs @1
        cx3 = [next(it) for _ in range(8)]         # half+int packs @3
        psix_v_in = [next(it) for _ in range(6)]   # vx/vy/vz lo+hi @2
        cx2 = [next(it) for _ in range(8)]
        cx4 = [next(it) for _ in range(8)]
        ovx, ovy, ovz = (next(it) for _ in range(3))
        os_out = [next(it) for _ in range(6)]      # sxx..syz (t+1)
        or_out = [next(it) for _ in range(6)]
        if with_dft:
            oacc_c, oacc_s, opeak = (next(it) for _ in range(3))
        opsi_v = [next(it) for _ in range(12)]     # lag3
        opsi_s = [next(it) for _ in range(12)]     # lag4
        opsix_s = [next(it) for _ in range(6)]     # lag3 maps
        opsix_v = [next(it) for _ in range(6)]     # lag4 maps
        (r_xx0, r_xy0, r_xz0, r_yy0, r_zz0, r_yz0,
         rv1x, rv1y, rv1z,
         r_xx1, r_yy1, r_zz1, r_xy1, r_xz1, r_yz1,
         rr1, rv2x, rv2y, rv2z,
         rrho, rpiu, rmuu, rcrp, rcrs, rbr,
         rpsi_v_y, rpsi_v_z, rpsi_s_y, rpsi_s_z,
         rpsix_s, rpsix_v) = (next(it) for _ in range(31))

        def _psi_get(ry, rz, k, slot):
            return ry[k, slot] if k < 6 else rz[k - 6, slot]

        def _psi_set(ry, rz, k, slot, val):
            if k < 6:
                ry[k, slot] = val
            else:
                rz[k - 6, slot] = val

        i = pl.program_id(0)
        ghost = ghost_ref[...]

        @pl.when(i < n_slabs)
        def _():
            r_xx0[i % 3] = sxx_ref[...]
            r_xy0[i % 3] = sxy_ref[...]
            r_xz0[i % 3] = sxz_ref[...]

        def win(ring, s):
            prev2 = jnp.where(s >= 1, ring[(s - 1) % 3][nb - 2 :], ghost)
            nxt2 = jnp.where(s < n_slabs - 1, ring[(s + 1) % 3][0:2], ghost)
            return jnp.concatenate([prev2, ring[s % 3], nxt2], axis=0)

        def cpml_arr(d, lo, hi, coefs, axis):
            return _apply_cpml_inplane(
                d, lo, hi,
                coefs[0][...], coefs[1][...], coefs[2][...], coefs[3][...],
                axis=axis,
            )

        def vel_body(sv, w_xx, w_xy, w_xz, syy, szz, syz, v_in, rho_inv,
                     psi12, psix6, cx, amp, cph, sph, ts):
            """Velocity update; psi12/psix6 = lists of CURRENT psi values.
            Returns (vx, vy, vz, new_psi12, new_psix6)."""
            sxy = w_xy[2 : 2 + nb]
            sxz = w_xz[2 : 2 + nb]
            xh = (cx[0][...], cx[1][...], cx[2][...], cx[3][...])
            xi = (cx[4][...], cx[5][...], cx[6][...], cx[7][...])
            d = dpx_w(w_xx)
            nlo = xh[0] * psix6[0] + xh[1] * d
            nhi = xh[2] * psix6[1] + xh[3] * d
            dsxx_x = d + nlo + nhi
            npx = [nlo, nhi]
            d = dmx_w(w_xy)
            nlo = xi[0] * psix6[2] + xi[1] * d
            nhi = xi[2] * psix6[3] + xi[3] * d
            dsxy_x = d + nlo + nhi
            npx += [nlo, nhi]
            d = dmx_w(w_xz)
            nlo = xi[0] * psix6[4] + xi[1] * d
            nhi = xi[2] * psix6[5] + xi[3] * d
            dsxz_x = d + nlo + nhi
            npx += [nlo, nhi]
            np12 = []
            dsxy_y, n0, n1 = cpml_arr(_d_minus_y(sxy), psi12[0], psi12[1], cyi, 1)
            np12 += [n0, n1]
            dsyy_y, n0, n1 = cpml_arr(_d_plus_y(syy), psi12[2], psi12[3], cyh, 1)
            np12 += [n0, n1]
            dsyz_y, n0, n1 = cpml_arr(_d_minus_y(syz), psi12[4], psi12[5], cyi, 1)
            np12 += [n0, n1]
            dsxz_z, n0, n1 = cpml_arr(_d_minus_z(sxz), psi12[6], psi12[7], czi, 2)
            np12 += [n0, n1]
            dsyz_z, n0, n1 = cpml_arr(_d_minus_z(syz), psi12[8], psi12[9], czi, 2)
            np12 += [n0, n1]
            dszz_z, n0, n1 = cpml_arr(_d_plus_z(szz), psi12[10], psi12[11], czh, 2)
            np12 += [n0, n1]
            vx_n = v_in[0] + dt_dx * rho_inv * (dsxx_x + dsxy_y + dsxz_z)
            vy_n = v_in[1] + dt_dx * rho_inv * (dsxy_x + dsyy_y + dsyz_z)
            vz_n = v_in[2] + dt_dx * rho_inv * (dsxz_x + dsyz_y + dszz_z)
            sval = ts[0] * cph + ts[1] * sph
            z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
            on_src = (z_iota == zsrc) & (amp > 0)
            vz_n = jnp.where(on_src, sval * amp, vz_n)
            return vx_n, vy_n, vz_n, np12, npx

        def stress_body(sp, w_x, w_y, w_z, s_old6, r_old6, props5,
                        psi12, psix6, cx):
            """Stress update; returns (s6, r6, new_psi12, new_psix6)."""
            vx = w_x[2 : 2 + nb]
            vy = w_y[2 : 2 + nb]
            vz = w_z[2 : 2 + nb]
            xh = (cx[0][...], cx[1][...], cx[2][...], cx[3][...])
            xi = (cx[4][...], cx[5][...], cx[6][...], cx[7][...])
            d = dmx_w(w_x)
            nlo = xi[0] * psix6[0] + xi[1] * d
            nhi = xi[2] * psix6[1] + xi[3] * d
            dvx_x = d + nlo + nhi
            npx = [nlo, nhi]
            d = dpx_w(w_y)
            nlo = xh[0] * psix6[2] + xh[1] * d
            nhi = xh[2] * psix6[3] + xh[3] * d
            dvy_x = d + nlo + nhi
            npx += [nlo, nhi]
            d = dpx_w(w_z)
            nlo = xh[0] * psix6[4] + xh[1] * d
            nhi = xh[2] * psix6[5] + xh[3] * d
            dvz_x = d + nlo + nhi
            npx += [nlo, nhi]
            np12 = []
            dvy_y, n0, n1 = cpml_arr(_d_minus_y(vy), psi12[0], psi12[1], cyi, 1)
            np12 += [n0, n1]
            dvx_y, n0, n1 = cpml_arr(_d_plus_y(vx), psi12[2], psi12[3], cyh, 1)
            np12 += [n0, n1]
            dvz_y, n0, n1 = cpml_arr(_d_plus_y(vz), psi12[4], psi12[5], cyh, 1)
            np12 += [n0, n1]
            dvz_z, n0, n1 = cpml_arr(_d_minus_z(vz), psi12[6], psi12[7], czi, 2)
            np12 += [n0, n1]
            dvx_z, n0, n1 = cpml_arr(_d_plus_z(vx), psi12[8], psi12[9], czh, 2)
            np12 += [n0, n1]
            dvy_z, n0, n1 = cpml_arr(_d_plus_z(vy), psi12[10], psi12[11], czh, 2)
            np12 += [n0, n1]
            theta = dvx_x + dvy_y + dvz_z
            pi_u, mu_u, c_rp, c_rs, b_r = props5

            def diag(s_old, r_old, d_own):
                if viscous:
                    phi = c_rp * theta - 2.0 * c_rs * (theta - d_own)
                    r_new = b_r * r_old - phi * inv_dx
                    s_new = (
                        s_old
                        + dt_dx * (pi_u * theta - 2 * mu_u * (theta - d_own))
                        + dt * 0.5 * (r_new + r_old)
                    )
                else:
                    r_new = r_old
                    s_new = s_old + dt_dx * (
                        pi_u * theta - 2 * mu_u * (theta - d_own)
                    )
                return s_new, r_new

            def shear(s_old, r_old, e):
                if viscous:
                    r_new = b_r * r_old - c_rs * e * inv_dx
                    s_new = (
                        s_old + dt_dx * mu_u * e + dt * 0.5 * (r_new + r_old)
                    )
                else:
                    r_new = r_old
                    s_new = s_old + dt_dx * mu_u * e
                return s_new, r_new

            sxx_n, rxx_n = diag(s_old6[0], r_old6[0], dvx_x)
            syy_n, ryy_n = diag(s_old6[1], r_old6[1], dvy_y)
            szz_n, rzz_n = diag(s_old6[2], r_old6[2], dvz_z)
            sxy_n, rxy_n = shear(s_old6[3], r_old6[3], dvx_y + dvy_x)
            sxz_n, rxz_n = shear(s_old6[4], r_old6[4], dvx_z + dvz_x)
            syz_n, ryz_n = shear(s_old6[5], r_old6[5], dvy_z + dvz_y)
            return ((sxx_n, syy_n, szz_n, sxy_n, sxz_n, syz_n),
                    (rxx_n, ryy_n, rzz_n, rxy_n, rxz_n, ryz_n), np12, npx)

        # ---- V1: velocity(t) slab i-1 ----
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            sv = i - 1
            vx_n, vy_n, vz_n, np12, npx = vel_body(
                sv, win(r_xx0, sv), win(r_xy0, sv), win(r_xz0, sv),
                syy_ref[...], szz_ref[...], syz_ref[...],
                (vx_ref[...], vy_ref[...], vz_ref[...]), rho_ref[...],
                [p[...] for p in psi_v_in],
                [p[...] for p in psix_s_in],
                cx1,
                amp1_ref[...], cph1_ref[...], sph1_ref[...],
                (tsrc_ref[0, 0], tsrc_ref[0, 1]),
            )
            rv1x[sv % 3] = vx_n
            rv1y[sv % 3] = vy_n
            rv1z[sv % 3] = vz_n
            for k in range(12):
                _psi_set(rpsi_v_y, rpsi_v_z, k, sv % 3, np12[k])
            for k in range(6):
                rpsix_s[k, sv % 3] = npx[k]
            # hold syy/szz/syz(t) for S1 next iteration
            r_yy0[sv % 2] = syy_ref[...]
            r_zz0[sv % 2] = szz_ref[...]
            r_yz0[sv % 2] = syz_ref[...]

        # ---- S1: stress(t) slab i-2 ----
        @pl.when((i >= 2) & (i <= n_slabs + 1))
        def _():
            sp = i - 2
            s6, r6, np12, npx = stress_body(
                sp, win(rv1x, sp), win(rv1y, sp), win(rv1z, sp),
                (r_xx0[sp % 3], r_yy0[sp % 2], r_zz0[sp % 2],
                 r_xy0[sp % 3], r_xz0[sp % 3], r_yz0[sp % 2]),
                [r[...] for r in r_refs],
                (piu_ref[...], muu_ref[...], crp_ref[...], crs_ref[...],
                 br_ref[...]),
                [p[...] for p in psi_s_in],
                [p[...] for p in psix_v_in],
                cx2,
            )
            r_xx1[sp % 3] = s6[0]
            r_yy1[sp % 3] = s6[1]
            r_zz1[sp % 3] = s6[2]
            r_xy1[sp % 3] = s6[3]
            r_xz1[sp % 3] = s6[4]
            r_yz1[sp % 3] = s6[5]
            for k in range(6):
                rr1[k, sp % 3] = r6[k]
            for k in range(12):
                _psi_set(rpsi_s_y, rpsi_s_z, k, sp % 3, np12[k])
            for k in range(6):
                rpsix_v[k, sp % 3] = npx[k]

        # ---- V2: velocity(t+1) slab i-3 ----
        @pl.when((i >= 3) & (i <= n_slabs + 2))
        def _():
            sv = i - 3
            vx_n, vy_n, vz_n, np12, npx = vel_body(
                sv, win(r_xx1, sv), win(r_xy1, sv), win(r_xz1, sv),
                r_yy1[sv % 3], r_zz1[sv % 3], r_yz1[sv % 3],
                (rv1x[sv % 3], rv1y[sv % 3], rv1z[sv % 3]), rrho[sv % 2],
                [_psi_get(rpsi_v_y, rpsi_v_z, k, sv % 3) for k in range(12)],
                [rpsix_s[k, sv % 3] for k in range(6)],
                cx3,
                amp3_ref[...], cph3_ref[...], sph3_ref[...],
                (tsrc_ref[1, 0], tsrc_ref[1, 1]),
            )
            rv2x[sv % 3] = vx_n
            rv2y[sv % 3] = vy_n
            rv2z[sv % 3] = vz_n
            ovx[...] = vx_n
            ovy[...] = vy_n
            ovz[...] = vz_n
            for k in range(12):
                opsi_v[k][...] = np12[k]
            for k in range(6):
                opsix_s[k][...] = npx[k]

        # ---- S2: stress(t+1) slab i-4, DFT for both steps ----
        @pl.when(i >= 4)
        def _():
            sp = i - 4
            s1_old = (r_xx1[sp % 3], r_yy1[sp % 3], r_zz1[sp % 3],
                      r_xy1[sp % 3], r_xz1[sp % 3], r_yz1[sp % 3])
            s6, r6, np12, npx = stress_body(
                sp, win(rv2x, sp), win(rv2y, sp), win(rv2z, sp),
                s1_old,
                [rr1[k, sp % 3] for k in range(6)],
                (rpiu[sp % 2], rmuu[sp % 2], rcrp[sp % 2], rcrs[sp % 2],
                 rbr[sp % 2]),
                [_psi_get(rpsi_s_y, rpsi_s_z, k, sp % 3) for k in range(12)],
                [rpsix_v[k, sp % 3] for k in range(6)],
                cx4,
            )
            for k in range(6):
                os_out[k][...] = s6[k]
                or_out[k][...] = r6[k]
            for k in range(12):
                opsi_s[k][...] = np12[k]
            for k in range(6):
                opsix_v[k][...] = npx[k]
            if with_dft:
                p1 = -(s1_old[0] + s1_old[1] + s1_old[2]) * (1.0 / 3.0)
                p2 = -(s6[0] + s6[1] + s6[2]) * (1.0 / 3.0)
                c1, s1w = scal_ref[0, 0], scal_ref[0, 1]
                c2, s2w = scal_ref[1, 0], scal_ref[1, 1]
                oacc_c[...] = acc_c_ref[...] + p1 * c1 + p2 * c2
                oacc_s[...] = acc_s_ref[...] + p1 * s1w + p2 * s2w
                opeak[...] = jnp.maximum(
                    peak_ref[...],
                    jnp.maximum(
                        jnp.abs(p1) * (c1 * c1 + s1w * s1w > 0),
                        jnp.abs(p2) * (c2 * c2 + s2w * s2w > 0),
                    ),
                )

        # end-of-body material stashes
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            rrho[(i - 1) % 2] = rho_ref[...]

        @pl.when((i >= 2) & (i <= n_slabs + 1))
        def _():
            rpiu[(i - 2) % 2] = piu_ref[...]
            rmuu[(i - 2) % 2] = muu_ref[...]
            rcrp[(i - 2) % 2] = crp_ref[...]
            rcrs[(i - 2) % 2] = crs_ref[...]
            rbr[(i - 2) % 2] = br_ref[...]

    plane1 = lambda: pl.BlockSpec((nb, N2, 1), lagk(1), memory_space=pltpu.VMEM)
    plane3 = lambda: pl.BlockSpec((nb, N2, 1), lagk(3), memory_space=pltpu.VMEM)
    smem22 = lambda: pl.BlockSpec((2, 2), lambda i: (0, 0),
                                  memory_space=pltpu.SMEM)
    n_acc = 3 if with_dft else 0
    vol = lambda: jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)

    in_specs = (
        [slab(cur)] * 3
        + [slab(lagk(1))] * 3
        + [slab(lagk(1))] * 4
        + [slab(lagk(2))] * 6
        + [slab(lagk(2))] * 5
        + [slab(lagk(4))] * n_acc
        + [slab_y(lagk(1))] * 6 + [slab_z(lagk(1))] * 6   # psi_v in
        + [slab_y(lagk(2))] * 6 + [slab_z(lagk(2))] * 6   # psi_s in
        + [ghost_spec]
        + [plane1(), plane1(), plane1(), plane3(), plane3(), plane3(),
           smem22()]
        + ([smem22()] if with_dft else [])
        + [coef_y] * 4 + [coef_z] * 4 + [coef_y] * 4 + [coef_z] * 4
        + [psixb(lo_of(1)), psixb(hi_of(1))] * 3          # psix_s in
        + [coefxb(lo_of(1)), coefxb(lo_of(1)),
           coefxb(hi_of(1)), coefxb(hi_of(1))] * 2        # cx1
        + [coefxb(lo_of(3)), coefxb(lo_of(3)),
           coefxb(hi_of(3)), coefxb(hi_of(3))] * 2        # cx3
        + [psixb(lo_of(2)), psixb(hi_of(2))] * 3          # psix_v in
        + [coefxb(lo_of(2)), coefxb(lo_of(2)),
           coefxb(hi_of(2)), coefxb(hi_of(2))] * 2        # cx2
        + [coefxb(lo_of(4)), coefxb(lo_of(4)),
           coefxb(hi_of(4)), coefxb(hi_of(4))] * 2        # cx4
    )
    out_specs = (
        [slab(lagk(3))] * 3
        + [slab(lagk(4))] * 12
        + [slab(lagk(4))] * n_acc
        + [slab_y(lagk(3))] * 6 + [slab_z(lagk(3))] * 6   # psi_v out
        + [slab_y(lagk(4))] * 6 + [slab_z(lagk(4))] * 6   # psi_s out
        + [psixb(lo_of(3)), psixb(hi_of(3))] * 3
        + [psixb(lo_of(4)), psixb(hi_of(4))] * 3
    )
    out_shape = (
        [vol()] * (15 + n_acc)
        + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)] * 6
        + [jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)] * 6
        + [psix_shape] * 12
    )
    # aliases: inputs sxx,sxy,sxz=0-2 / syy,szz,syz=3-5 / v=6-8 / r=10-15
    aliases = {6: 0, 7: 1, 8: 2,
               0: 3, 3: 4, 4: 5, 1: 6, 2: 7, 5: 8}
    for a in range(6):
        aliases[10 + a] = 9 + a
    for a in range(n_acc):
        aliases[21 + a] = 15 + a
    psi_in0 = 21 + n_acc
    for a in range(24):
        aliases[psi_in0 + a] = 15 + n_acc + a
    psix_s_in0 = psi_in0 + 24 + 1 + 7 + (1 if with_dft else 0) + 16
    for a in range(6):
        aliases[psix_s_in0 + a] = 39 + n_acc + a
    psix_v_in0 = psix_s_in0 + 6 + 16
    for a in range(6):
        aliases[psix_v_in0 + a] = 45 + n_acc + a

    ring_slab = lambda d: pltpu.VMEM((d, nb, N2, N3), jnp.float32)
    ring_y = lambda d: pltpu.VMEM((d, nb, ns, N3), jnp.float32)
    ring_z = lambda d: pltpu.VMEM((d, nb, N2, ns), jnp.float32)
    scratch = (
        [ring_slab(3)] * 3 + [ring_slab(2)] * 3   # s0: xx/xy/xz, yy/zz/yz
        + [ring_slab(3)] * 3                      # v1
        + [ring_slab(3)] * 6                      # s1 (xx,yy,zz,xy,xz,yz)
        + [pltpu.VMEM((6, 3, nb, N2, N3), jnp.float32)]  # r1
        + [ring_slab(3), ring_slab(3), ring_slab(3)]     # v2 (x-windows
                                                         # needed for all 3)
        + [ring_slab(2)] * 6                      # rho + 5 props
        + [pltpu.VMEM((6, 3, nb, ns, N3), jnp.float32),  # psi_v y rings
           pltpu.VMEM((6, 3, nb, N2, ns), jnp.float32),  # psi_v z rings
           pltpu.VMEM((6, 3, nb, ns, N3), jnp.float32),  # psi_s y rings
           pltpu.VMEM((6, 3, nb, N2, ns), jnp.float32)]  # psi_s z rings
        + [pltpu.VMEM((6, 3, nb, N2, N3), jnp.float32)]  # psix_s rings
        + [pltpu.VMEM((6, 3, nb, N2, N3), jnp.float32)]  # psix_v rings
    )
    call = pl.pallas_call(
        kernel,
        grid=(n_slabs + 4,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=125 * 1024 * 1024
        ),
        interpret=interpret,
    )
    kc = {
        "y_half": tuple(jnp.asarray(c) for c in cy_h),
        "z_half": tuple(jnp.asarray(c) for c in cz_h),
        "y_int": tuple(jnp.asarray(c) for c in cy_i),
        "z_int": tuple(jnp.asarray(c) for c in cz_i),
        "x_half_pack": _pack_x_coefs(profiles_np, "half", ns, nb, kx),
        "x_int_pack": _pack_x_coefs(profiles_np, "int", ns, nb, kx),
        "px_planes": px_planes,
    }
    return call, kc


def _make_visco_fused_step_fn(grid, profiles_np, viscous, oz_scale, nb, comm,
                              interpret, with_dft, edge_offset=0,
                              xcoef_scale=None, ycoef_mask=None):
    """Step closure for the fused single-sweep viscoelastic kernel."""
    N1, N2, N3 = grid.shape
    omega = 2.0 * np.pi * grid.frequency
    fuse_src = grid.source_type == "velocity_plane"

    call, kc = build_visco_fused_step(
        grid, profiles_np, viscous, oz_scale, nb, interpret=interpret,
        with_dft=with_dft, edge_offset=edge_offset, ycoef_mask=ycoef_mask,
    )
    bxh = tuple(jnp.asarray(c) for c in kc["x_half_pack"])
    bxi = tuple(jnp.asarray(c) for c in kc["x_int_pack"])
    if xcoef_scale is not None:
        bxh, bxi = _scale_xpacks(bxh, bxi, xcoef_scale)
    zero_ghost = jnp.zeros((2, N2, N3), jnp.float32)
    ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt

    def step(carry, n):
        s = carry
        f = s["fields"]
        pr = s["props"]
        t = n.astype(jnp.float32) * grid.dt
        ramp = jnp.where(
            n < ramp_steps, 0.5 * (1.0 - jnp.cos(np.pi * n / ramp_steps)), 1.0
        ).astype(jnp.float32)

        if fuse_src:
            scale = ramp * oz_scale
            tsrc = jnp.stack(
                [jnp.sin(omega * t) * scale, jnp.cos(omega * t) * scale]
            ).reshape(1, 2)
            src_args = (s["src_amp3"], s["src_cph"], s["src_sph"], tsrc)
        elif grid.source_type == "velocity_volume":
            scale = ramp * oz_scale
            tsrc = jnp.stack(
                [jnp.sin(omega * t) * scale, jnp.cos(omega * t) * scale]
            ).reshape(1, 2)
            src_args = (s["srcv_amp"], s["srcv_cph"], s["srcv_sph"],
                        s["srcv_ox"], s["srcv_oy"], s["srcv_oz"], tsrc)
        else:
            src_args = ()
        if grid.source_type == "stress_point":
            # visco point ADDS +amp*sin to the diagonal stresses
            psrc_args = (-_point_src_row(
                s["src_amp_point"], n, grid, omega, ramp_steps
            ).reshape(1, 2),)
        else:
            psrc_args = ()
        if with_dft:
            in_window = (n >= grid.sensor_start).astype(jnp.float32)
            cosw = jnp.cos(omega * t) * in_window
            sinw = jnp.sin(omega * t) * in_window
            scal = jnp.stack([cosw, sinw]).reshape(1, 2)
            acc_args = (s["acc_cos"], s["acc_sin"], s["peak"])
            scal_args = (scal,)
        else:
            acc_args = scal_args = ()

        psi_v_in = [s[k] for k in _V_PSI_KEYS]
        psi_s_in = [s[k] for k in _S_PSI_KEYS]
        outs = call(
            f["sxx"], f["sxy"], f["sxz"],
            f["syy"], f["szz"], f["syz"],
            f["vx"], f["vy"], f["vz"], pr["rho_inv"],
            f["rxx"], f["ryy"], f["rzz"], f["rxy"], f["rxz"], f["ryz"],
            pr["pi_u"], pr["mu_u"], pr["c_rp"], pr["c_rs"], pr["b_r"],
            *acc_args,
            *psi_v_in,
            *psi_s_in,
            zero_ghost,
            *src_args,
            *psrc_args,
            *scal_args,
            *kc["y_half"], *kc["z_half"], *kc["y_int"], *kc["z_int"],
            s["psi_sxxx_lo"], s["psi_sxxx_hi"],
            s["psi_sxyx_lo"], s["psi_sxyx_hi"],
            s["psi_sxzx_lo"], s["psi_sxzx_hi"],
            *bxh, *bxi,
            s["psi_vxx_lo"], s["psi_vxx_hi"],
            s["psi_vyx_lo"], s["psi_vyx_hi"],
            s["psi_vzx_lo"], s["psi_vzx_hi"],
            *bxh, *bxi,
        )
        it = iter(outs)
        vx, vy, vz = (next(it) for _ in range(3))
        sxx, syy, szz, sxy, sxz, syz = (next(it) for _ in range(6))
        rxx, ryy, rzz, rxy, rxz, ryz = (next(it) for _ in range(6))
        if with_dft:
            acc_c, acc_s, peak = (next(it) for _ in range(3))
        else:
            acc_c, acc_s, peak = s["acc_cos"], s["acc_sin"], s["peak"]
        psi_v_out = [next(it) for _ in range(12)]
        psi_s_out = [next(it) for _ in range(12)]
        (n_sxxx_lo, n_sxxx_hi, n_sxyx_lo, n_sxyx_hi,
         n_sxzx_lo, n_sxzx_hi) = (next(it) for _ in range(6))
        (n_vxx_lo, n_vxx_hi, n_vyx_lo, n_vyx_hi,
         n_vzx_lo, n_vzx_hi) = (next(it) for _ in range(6))

        new_carry = dict(
            s,
            fields=dict(
                vx=vx, vy=vy, vz=vz, sxx=sxx, syy=syy, szz=szz,
                sxy=sxy, sxz=sxz, syz=syz,
                rxx=rxx, ryy=ryy, rzz=rzz, rxy=rxy, rxz=rxz, ryz=ryz,
            ),
            acc_cos=acc_c, acc_sin=acc_s, peak=peak,
            psi_sxxx_lo=n_sxxx_lo, psi_sxxx_hi=n_sxxx_hi,
            psi_sxyx_lo=n_sxyx_lo, psi_sxyx_hi=n_sxyx_hi,
            psi_sxzx_lo=n_sxzx_lo, psi_sxzx_hi=n_sxzx_hi,
            psi_vxx_lo=n_vxx_lo, psi_vxx_hi=n_vxx_hi,
            psi_vyx_lo=n_vyx_lo, psi_vyx_hi=n_vyx_hi,
            psi_vzx_lo=n_vzx_lo, psi_vzx_hi=n_vzx_hi,
            **dict(zip(_V_PSI_KEYS, psi_v_out)),
            **dict(zip(_S_PSI_KEYS, psi_s_out)),
        )
        return new_carry, None

    return step


def make_visco_pallas_step(grid, profiles_np, viscous, oz_scale, nb=2,
                           comm=None, interpret=False, with_dft=True,
                           fused=None):
    """Complete viscoelastic per-timestep function (kernels + x-CPML post).

    ``comm`` domain-decomposes x (ghost planes into the kernels' stencil
    windows, x-CPML posts masked to the global edge shards, point source
    owned by one shard). ``interpret`` runs the kernels in interpret mode.
    ``with_dft=False`` builds the quiet-phase step (pre-sensor-window, no
    DFT/peak streaming). ``fused`` selects the single-sweep kernel
    (default: on when unsharded).
    """
    N1, N2, N3 = grid.shape
    ns = grid.npml + 2
    dt_dx = grid.dt / grid.dx
    omega = 2.0 * np.pi * grid.frequency
    zsrc = grid.source_plane_z
    fuse_src = grid.source_type == "velocity_plane"

    if comm is None:
        from ..parallel.halo import DomainComm

        comm = DomainComm()
    if fused is None:
        fused = not (comm.sharded_x or comm.sharded_y)
    if fused:
        return _make_visco_fused_step_fn(
            grid, profiles_np, viscous, oz_scale, nb, comm, interpret,
            with_dft,
        )

    vel_call, stress_call, kc = build_visco_pallas_step(
        grid, profiles_np, viscous, oz_scale, nb, interpret=interpret,
        with_dft=with_dft,
    )

    bxh = tuple(jnp.asarray(c) for c in kc["x_half_pack"])
    bxi = tuple(jnp.asarray(c) for c in kc["x_int_pack"])

    def step(carry, n):
        s = carry
        f = s["fields"]
        pr = s["props"]
        t = n.astype(jnp.float32) * grid.dt

        # edge masks fold into the x-CPML feed (a) coefficients
        is_first, is_last = comm.edge_masks()
        xh_coefs = (bxh[0], bxh[1] * is_first, bxh[2], bxh[3] * is_last)
        xi_coefs = (bxi[0], bxi[1] * is_first, bxi[2], bxi[3] * is_last)

        # ---- source scaling ----
        ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt
        ramp = jnp.where(
            n < ramp_steps, 0.5 * (1.0 - jnp.cos(np.pi * n / ramp_steps)), 1.0
        ).astype(jnp.float32)

        # ---- velocity kernel (x-CPML + CW plane source fused) ----
        psi_v_in = [s[k] for k in _V_PSI_KEYS]
        gxx = comm.ghosts(f["sxx"])
        gxy = comm.ghosts(f["sxy"])
        gxz = comm.ghosts(f["sxz"])
        if fuse_src:
            scale = ramp * oz_scale
            tsrc = jnp.stack(
                [jnp.sin(omega * t) * scale, jnp.cos(omega * t) * scale]
            ).reshape(1, 2)
            src_args = (s["src_amp3"], s["src_cph"], s["src_sph"], tsrc)
        else:
            src_args = ()
        outs = vel_call(
            f["sxx"], f["sxy"], f["sxz"],
            f["syy"], f["szz"], f["syz"], f["vx"], f["vy"], f["vz"],
            pr["rho_inv"],
            *psi_v_in,
            *gxx, *gxy, *gxz,
            *src_args,
            *kc["y_half"], *kc["z_half"], *kc["y_int"], *kc["z_int"],
            s["psi_sxxx_lo"], s["psi_sxxx_hi"],
            s["psi_sxyx_lo"], s["psi_sxyx_hi"],
            s["psi_sxzx_lo"], s["psi_sxzx_hi"],
            *xh_coefs, *xi_coefs,
        )
        vx, vy, vz = outs[0], outs[1], outs[2]
        psi_v_out = outs[3:15]
        (n_sxxx_lo, n_sxxx_hi, n_sxyx_lo, n_sxyx_hi,
         n_sxzx_lo, n_sxzx_hi) = outs[15:21]

        # ---- stress kernel (x-CPML fused) ----
        if with_dft:
            in_window = (n >= grid.sensor_start).astype(jnp.float32)
            cosw = jnp.cos(omega * t) * in_window
            sinw = jnp.sin(omega * t) * in_window
            scal = jnp.stack([cosw, sinw]).reshape(1, 2)
            acc_args = (s["acc_cos"], s["acc_sin"], s["peak"])
            scal_args = (scal,)
        else:
            acc_args = scal_args = ()
        psi_s_in = [s[k] for k in _S_PSI_KEYS]
        gvx = comm.ghosts(vx)
        gvy = comm.ghosts(vy)
        gvz = comm.ghosts(vz)
        souts = stress_call(
            vx, vy, vz,
            f["sxx"], f["syy"], f["szz"], f["sxy"], f["sxz"], f["syz"],
            f["rxx"], f["ryy"], f["rzz"], f["rxy"], f["rxz"], f["ryz"],
            pr["pi_u"], pr["mu_u"], pr["c_rp"], pr["c_rs"], pr["b_r"],
            *acc_args,
            *psi_s_in,
            *gvx, *gvy, *gvz,
            *scal_args,
            *kc["y_half"], *kc["z_half"], *kc["y_int"], *kc["z_int"],
            s["psi_vxx_lo"], s["psi_vxx_hi"],
            s["psi_vyx_lo"], s["psi_vyx_hi"],
            s["psi_vzx_lo"], s["psi_vzx_hi"],
            *xh_coefs, *xi_coefs,
        )
        (sxx, syy, szz, sxy, sxz, syz,
         rxx, ryy, rzz, rxy, rxz, ryz) = souts[:12]
        if with_dft:
            acc_c, acc_s, peak = souts[12:15]
            psi_s_out = souts[15:27]
            (n_vxx_lo, n_vxx_hi, n_vyx_lo, n_vyx_hi,
             n_vzx_lo, n_vzx_hi) = souts[27:33]
        else:
            acc_c, acc_s, peak = s["acc_cos"], s["acc_sin"], s["peak"]
            psi_s_out = souts[12:24]
            (n_vxx_lo, n_vxx_hi, n_vyx_lo, n_vyx_hi,
             n_vzx_lo, n_vzx_hi) = souts[24:30]

        if grid.source_type == "stress_point":
            # The stress kernel accumulated the DFT/peak BEFORE this
            # injection; the XLA reference order (fdtd.py stress step) is
            # inject-then-accumulate. Correct the source voxel exactly:
            # dp = -sval, and re-derive its peak from post-injection
            # pressure tracked in the ``peak_src`` carry scalar.
            i0, j0, k0 = grid.source_ijk
            li = i0 - comm.local_x_offset(N1)
            own = ((li >= 0) & (li < N1)).astype(jnp.float32)
            lic = jnp.clip(li, 0, N1 - 1)
            sval = s["src_amp_point"] * jnp.sin(omega * t) * ramp * own
            sxx = sxx.at[lic, j0, k0].add(sval)
            syy = syy.at[lic, j0, k0].add(sval)
            szz = szz.at[lic, j0, k0].add(sval)
            if with_dft:
                acc_c = acc_c.at[lic, j0, k0].add(-sval * cosw)
                acc_s = acc_s.at[lic, j0, k0].add(-sval * sinw)
                p_post = -(
                    sxx[lic, j0, k0] + syy[lic, j0, k0] + szz[lic, j0, k0]
                ) * (1.0 / 3.0)
                peak_src = jnp.maximum(
                    s["peak_src"], jnp.abs(p_post) * in_window * own
                )
                peak = peak.at[lic, j0, k0].set(
                    jnp.where(own > 0, peak_src, peak[lic, j0, k0])
                )
                s = dict(s, peak_src=peak_src)

        new_carry = dict(
            s,
            fields=dict(
                vx=vx, vy=vy, vz=vz, sxx=sxx, syy=syy, szz=szz,
                sxy=sxy, sxz=sxz, syz=syz,
                rxx=rxx, ryy=ryy, rzz=rzz, rxy=rxy, rxz=rxz, ryz=ryz,
            ),
            acc_cos=acc_c, acc_sin=acc_s, peak=peak,
            psi_sxxx_lo=n_sxxx_lo, psi_sxxx_hi=n_sxxx_hi,
            psi_sxyx_lo=n_sxyx_lo, psi_sxyx_hi=n_sxyx_hi,
            psi_sxzx_lo=n_sxzx_lo, psi_sxzx_hi=n_sxzx_hi,
            psi_vxx_lo=n_vxx_lo, psi_vxx_hi=n_vxx_hi,
            psi_vyx_lo=n_vyx_lo, psi_vyx_hi=n_vyx_hi,
            psi_vzx_lo=n_vzx_lo, psi_vzx_hi=n_vzx_hi,
            **dict(zip(_V_PSI_KEYS, psi_v_out)),
            **dict(zip(_S_PSI_KEYS, psi_s_out)),
        )
        return new_carry, None

    return step


_V_PSI_KEYS = [
    "psi_sxyy_lo", "psi_sxyy_hi", "psi_syyy_lo", "psi_syyy_hi",
    "psi_syzy_lo", "psi_syzy_hi",
    "psi_sxzz_lo", "psi_sxzz_hi", "psi_syzz_lo", "psi_syzz_hi",
    "psi_szzz_lo", "psi_szzz_hi",
]
_S_PSI_KEYS = [
    "psi_vyy_lo", "psi_vyy_hi", "psi_vxy_lo", "psi_vxy_hi",
    "psi_vzy_lo", "psi_vzy_hi",
    "psi_vzz_lo", "psi_vzz_hi", "psi_vxz_lo", "psi_vxz_hi",
    "psi_vyz_lo", "psi_vyz_hi",
]


def _make_visco_fused2_step_fn(grid, profiles_np, viscous, oz_scale, nb,
                               interpret, with_dft):
    """Two-timestep visco step closure (scan over step pairs)."""
    omega = 2.0 * np.pi * grid.frequency
    call, kc = build_visco_fused2_step(
        grid, profiles_np, viscous, oz_scale, nb, interpret=interpret,
        with_dft=with_dft,
    )
    bxh = tuple(jnp.asarray(c) for c in kc["x_half_pack"])
    bxi = tuple(jnp.asarray(c) for c in kc["x_int_pack"])
    N1, N2, N3 = grid.shape
    zero_ghost = jnp.zeros((2, N2, N3), jnp.float32)
    ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt

    def step(carry, n):
        s = carry
        f = s["fields"]
        pr = s["props"]

        def src_row(nk):
            t = nk.astype(jnp.float32) * grid.dt
            ramp = jnp.where(
                nk < ramp_steps,
                0.5 * (1.0 - jnp.cos(np.pi * nk / ramp_steps)), 1.0,
            ).astype(jnp.float32)
            sc = ramp * oz_scale
            return jnp.stack([jnp.sin(omega * t) * sc,
                              jnp.cos(omega * t) * sc])

        tsrc = jnp.stack([src_row(n), src_row(n + 1)])
        if with_dft:
            def scal_row(nk):
                t = nk.astype(jnp.float32) * grid.dt
                m = (nk >= grid.sensor_start).astype(jnp.float32)
                return jnp.stack([jnp.cos(omega * t) * m,
                                  jnp.sin(omega * t) * m])

            scal = jnp.stack([scal_row(n), scal_row(n + 1)])
            acc_in = (s["acc_cos"], s["acc_sin"], s["peak"])
            scal_in = (scal,)
        else:
            acc_in = scal_in = ()

        psi_v_in = [s[k] for k in _V_PSI_KEYS]
        psi_s_in = [s[k] for k in _S_PSI_KEYS]
        outs = call(
            f["sxx"], f["sxy"], f["sxz"],
            f["syy"], f["szz"], f["syz"],
            f["vx"], f["vy"], f["vz"], pr["rho_inv"],
            f["rxx"], f["ryy"], f["rzz"], f["rxy"], f["rxz"], f["ryz"],
            pr["pi_u"], pr["mu_u"], pr["c_rp"], pr["c_rs"], pr["b_r"],
            *acc_in,
            *psi_v_in,
            *psi_s_in,
            zero_ghost,
            s["src_amp3"], s["src_cph"], s["src_sph"],
            s["src_amp3"], s["src_cph"], s["src_sph"],
            tsrc,
            *scal_in,
            *kc["y_half"], *kc["z_half"], *kc["y_int"], *kc["z_int"],
            s["psi_sxxx_lo"], s["psi_sxxx_hi"],
            s["psi_sxyx_lo"], s["psi_sxyx_hi"],
            s["psi_sxzx_lo"], s["psi_sxzx_hi"],
            *bxh, *bxi,
            *bxh, *bxi,
            s["psi_vxx_lo"], s["psi_vxx_hi"],
            s["psi_vyx_lo"], s["psi_vyx_hi"],
            s["psi_vzx_lo"], s["psi_vzx_hi"],
            *bxh, *bxi,
            *bxh, *bxi,
        )
        it = iter(outs)
        vx, vy, vz = (next(it) for _ in range(3))
        sxx, syy, szz, sxy, sxz, syz = (next(it) for _ in range(6))
        rxx, ryy, rzz, rxy, rxz, ryz = (next(it) for _ in range(6))
        if with_dft:
            acc_c, acc_s, peak = (next(it) for _ in range(3))
        else:
            acc_c, acc_s, peak = s["acc_cos"], s["acc_sin"], s["peak"]
        psi_v_out = [next(it) for _ in range(12)]
        psi_s_out = [next(it) for _ in range(12)]
        (n_sxxx_lo, n_sxxx_hi, n_sxyx_lo, n_sxyx_hi,
         n_sxzx_lo, n_sxzx_hi) = (next(it) for _ in range(6))
        (n_vxx_lo, n_vxx_hi, n_vyx_lo, n_vyx_hi,
         n_vzx_lo, n_vzx_hi) = (next(it) for _ in range(6))
        new_carry = dict(
            s,
            fields=dict(
                vx=vx, vy=vy, vz=vz, sxx=sxx, syy=syy, szz=szz,
                sxy=sxy, sxz=sxz, syz=syz,
                rxx=rxx, ryy=ryy, rzz=rzz, rxy=rxy, rxz=rxz, ryz=ryz,
            ),
            acc_cos=acc_c, acc_sin=acc_s, peak=peak,
            psi_sxxx_lo=n_sxxx_lo, psi_sxxx_hi=n_sxxx_hi,
            psi_sxyx_lo=n_sxyx_lo, psi_sxyx_hi=n_sxyx_hi,
            psi_sxzx_lo=n_sxzx_lo, psi_sxzx_hi=n_sxzx_hi,
            psi_vxx_lo=n_vxx_lo, psi_vxx_hi=n_vxx_hi,
            psi_vyx_lo=n_vyx_lo, psi_vyx_hi=n_vyx_hi,
            psi_vzx_lo=n_vzx_lo, psi_vzx_hi=n_vzx_hi,
            **dict(zip(_V_PSI_KEYS, psi_v_out)),
            **dict(zip(_S_PSI_KEYS, psi_s_out)),
        )
        return new_carry, None

    return step


_S6 = ("xx", "yy", "zz", "xy", "xz", "yz")


def build_visco_fusedK_step(grid, profiles_np, viscous, oz_scale, K, nb=2,
                            interpret=False, with_dft=False, edge_offset=0,
                            indexed_materials=False, pack_z=False,
                            ycoef_mask=None, _no_inplane_cpml=False,
                            _no_xcpml=False, _cheap_derivs=False,
                            _no_psix_ring=False, _no_psiyz_ring=False,
                            _no_xwin=False, _cheap_updates=False,
                            _min_streams=False):
    """K viscoelastic timesteps per streaming sweep (deep temporal blocking).

    Generalizes ``build_visco_fused2_step`` exactly the way
    ``build_fluid_fusedK_step`` generalizes the fluid pair kernel: per grid
    iteration i the pipeline runs stages V_k (velocity of step k, slab lag
    2k-1) and S_k (stress of step k, slab lag 2k) for k = 1..K. All 15
    fields live in VMEM rings between stages:

      * per-step stress rings: xx/xy/xz depth 3 (x-windows at V_{k+1});
        yy/zz/yz depth 3 (depth 2 for the incoming step 0); with ``with_dft``
        the diagonal rings of intermediate steps deepen to 2K-2k+1 so S_K
        can accumulate every step's carrier DFT;
      * velocity rings: depth 3 ALL components (the stress stage x-derives
        vx, vy AND vz, unlike the fluid system);
      * memory-variable rings r_k: (6, 3) slots;
      * material rings (rho + 5 moduli): depth 2K-2, stashed at the end of
        the body on first HBM visit; with ``indexed_materials`` the six
        expanded property volumes are replaced by ONE int32 material-index
        stream + a resident (8, 128) coefficient table — each stage
        gathers its coefficients with single-vreg lane ``dynamic_gather``
        (bit-exact: the gather returns the very f32 table values the
        expansion would), the stash ring holds the index (depth 2K-1), and
        both the HBM traffic and the VMEM of label-mode media drop by ~5
        volume-equivalents. Requires M <= min(128, N3) materials — always
        true for label mode, the only mode with shear
        (`BabelIntegrationBASE.py:1343-1377`);
      * CPML psi rings (12 y/z per half-step family + 6 x-psi maps per
        family): shared rings of depth 2K-1.

    HBM traffic per sweep stays at the 1-step fused kernel's ~35 volume
    equivalents, i.e. ~35/K volumes per timestep. Bit-equal to K
    applications of the single-step kernel. Supports velocity_plane and
    stress_point sources (the point is injected in-kernel at each stress
    stage). Requires n_slabs >= kx + 2K - 1. Label-mode is the default
    non-CT clinical mode (`BabelIntegrationBASE.py:1357-1377`) — this
    kernel is what keeps it on the fast path.
    """
    N1, N2, N3 = grid.shape
    if N1 % nb or nb < 2:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb} >= 2")
    if K < 2:
        raise ValueError("K must be >= 2")
    ns = grid.npml + 2
    n_slabs = N1 // nb
    dt_dx = np.float32(grid.dt / grid.dx)
    dt = np.float32(grid.dt)
    inv_dx = np.float32(1.0 / grid.dx)
    zsrc = grid.source_plane_z
    plane_src = grid.source_type == "velocity_plane"
    point = grid.source_type == "stress_point"
    # dome transducers: per-voxel velocity drive along per-voxel normals
    # (`BabelIntegrationDOME_PHASEDARRAY.py:344-407`); six extra volume
    # streams (amp, cos/sin phase, normal components) stashed in rings so
    # every velocity stage can inject in-kernel
    volume_src = grid.source_type == "velocity_volume"
    if point:
        i0_pt, j0_pt, k0_pt = (int(v) for v in grid.source_ijk)
        s_pt, li_pt = divmod(i0_pt, nb)

    cy_h = _make_profiles_const(profiles_np, 1, "half", ns)
    cz_h = _make_profiles_const(profiles_np, 2, "half", ns)
    cy_i = _make_profiles_const(profiles_np, 1, "int", ns)
    cz_i = _make_profiles_const(profiles_np, 2, "int", ns)
    if ycoef_mask is not None:
        # y-tiled sweeps: a tile whose lo/hi y boundary is interior (halo)
        # zeroes that family's b AND a, so psi stays 0 and the correction
        # is a no-op — mirrors the sharded drivers' x-edge masking
        cy_h = _mask_y_consts(cy_h, ycoef_mask)
        cy_i = _mask_y_consts(cy_i, ycoef_mask)

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    slab_y = lambda idx: pl.BlockSpec((nb, ns, N3), idx,
                                      memory_space=pltpu.VMEM)
    slab_z = lambda idx: pl.BlockSpec((nb, N2, ns), idx,
                                      memory_space=pltpu.VMEM)
    slab_zp = lambda idx: pl.BlockSpec((nb, N2, 6 * ns), idx,
                                       memory_space=pltpu.VMEM)
    coef_y = pl.BlockSpec((1, ns, 1), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    coef_z = pl.BlockSpec((1, 1, ns), lambda i: (0, 0, 0),
                          memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)

    def lagk(k):
        return lambda i: (jnp.minimum(jnp.maximum(i - k, 0), n_slabs - 1),
                          0, 0)

    ghost_spec = pl.BlockSpec(
        (2, N2, N3), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
    )
    kx = -(-ns // nb)
    if n_slabs < kx + 2 * K - 1:
        raise ValueError(f"N1={N1} too small for the {K}-step fused pipeline")
    px_planes = (kx + 1) * nb
    h0 = int(edge_offset)

    def lo_of(lag):
        return lambda i: (jnp.minimum(jnp.maximum(i - lag - h0, 0), kx),
                          0, 0)

    def hi_of(lag):
        base = n_slabs - kx - h0

        def m(i):
            s = jnp.minimum(jnp.maximum(i - lag, 0), n_slabs - 1)
            return (jnp.where((s >= base) & (s < n_slabs - h0), s - base,
                              kx), 0, 0)
        return m

    psixb = lambda m: pl.BlockSpec((nb, N2, N3), m, memory_space=pltpu.VMEM)
    xfull = pl.BlockSpec((px_planes, 1, 1), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM)
    psix_shape = jax.ShapeDtypeStruct((px_planes, N2, N3), jnp.float32)
    smemK = lambda: pl.BlockSpec((K, 2), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM)
    plane_at = lambda lag: pl.BlockSpec((nb, N2, 1), lagk(lag),
                                        memory_space=pltpu.VMEM)

    Dm = 2 * K - 2
    Dp = 2 * K - 1

    def sdepth(k, c):
        """Ring depth of stress component c after step k (0 = incoming)."""
        if k == 0:
            return 3 if c in ("xx", "xy", "xz") else 2
        if with_dft and c in ("xx", "yy", "zz"):
            return max(3, 2 * K - 2 * k + 1)
        return 3

    def dpx_w(w):
        return _C1 * (w[3 : 3 + nb] - w[2 : 2 + nb]) + _C2 * (
            w[4 : 4 + nb] - w[1 : 1 + nb]
        )

    def dmx_w(w):
        return _C1 * (w[2 : 2 + nb] - w[1 : 1 + nb]) + _C2 * (
            w[3 : 3 + nb] - w[0:nb]
        )

    if _no_xwin:  # perf probe only: windows/x-derivatives removed
        dpx_w = dmx_w = lambda w: w
        win_mid = lambda w: w
    else:
        win_mid = lambda w: w[2 : 2 + nb]

    if _cheap_derivs:  # perf probe only: in-plane derivatives removed
        dy_p = dy_m = dz_p = dz_m = lambda g: g
    else:
        dy_p, dy_m = _d_plus_y, _d_minus_y
        dz_p, dz_m = _d_plus_z, _d_minus_z

    # ---- declarative in/out/scratch orderings (indexed by name) ----
    if indexed_materials:
        mat_in = [
            ("midx", slab(lagk(1))),
            ("mtab", pl.BlockSpec((8, 128), lambda i: (0, 0),
                                  memory_space=pltpu.VMEM)),
        ]
        mat_in2 = []
    else:
        mat_in = [("rho", slab(lagk(1)))]
        mat_in2 = [("piu", slab(lagk(2))), ("muu", slab(lagk(2))),
                   ("crp", slab(lagk(2))), ("crs", slab(lagk(2))),
                   ("br", slab(lagk(2)))]
    in_entries = (
        [("sxx", slab(cur)), ("sxy", slab(cur)), ("sxz", slab(cur)),
         ("syy", slab(lagk(1))), ("szz", slab(lagk(1))),
         ("syz", slab(lagk(1))),
         ("vx", slab(lagk(1))), ("vy", slab(lagk(1))), ("vz", slab(lagk(1)))]
        + mat_in
        + [(f"r_{c}", slab(lagk(2))) for c in _S6]
        + mat_in2
        + ([("acc_c", slab(lagk(2 * K))), ("acc_s", slab(lagk(2 * K))),
            ("peak", slab(lagk(2 * K)))] if with_dft else [])
        # y psi slabs stream individually (cheap sublane padding); with
        # ``pack_z`` the six z psi slabs of each family are LANE-PACKED
        # into one stream — (nb, N2, ns) buffers tile-pad ns=14 lanes to
        # 128 (a ~9x blowup), so packing cuts their VMEM footprint ~6x.
        # MEASURED tradeoff on v5e: the unaligned 14-lane slices/concats
        # cost ~11% throughput at K=2, so packing is OFF by default and
        # only worth enabling when the freed VMEM buys a deeper K.
        + ([] if _min_streams else
           [(f"psi_v{j}", slab_y(lagk(1))) for j in range(6)]
           + ([("psi_vz_pk", slab_zp(lagk(1)))] if pack_z else
              [(f"psi_v{j}", slab_z(lagk(1))) for j in range(6, 12)])
           + [(f"psi_s{j}", slab_y(lagk(2))) for j in range(6)]
           + ([("psi_sz_pk", slab_zp(lagk(2)))] if pack_z else
              [(f"psi_s{j}", slab_z(lagk(2))) for j in range(6, 12)]))
        + [("ghost", ghost_spec)]
        + ([(f"{nm}{k}", plane_at(2 * k - 1))
            for k in range(1, K + 1) for nm in ("amp", "cph", "sph")]
           if plane_src else [])
        + ([(nm, slab(lagk(1)))
            for nm in ("vamp", "vcph", "vsph", "vox", "voy", "voz")]
           if volume_src else [])
        + [("tsrc", smemK())]
        + ([("psrc", smemK())] if point else [])
        + ([("scal", smemK())] if with_dft else [])
        + [(f"cyh{j}", coef_y) for j in range(4)]
        + [(f"czh{j}", coef_z) for j in range(4)]
        + [(f"cyi{j}", coef_y) for j in range(4)]
        + [(f"czi{j}", coef_z) for j in range(4)]
        + ([] if _min_streams else
           [(f"pxs{j}", psixb((lo_of if j % 2 == 0 else hi_of)(1)))
            for j in range(6)]
           + [(f"pxv{j}", psixb((lo_of if j % 2 == 0 else hi_of)(2)))
            for j in range(6)])
        # resident x-CPML coefficient packs (half + int family), loaded
        # once and dynamic-sliced per stage in-kernel — replaces 16K
        # per-lag tiny block streams
        + [(f"xc{fam}{j}", xfull) for fam in ("h", "i") for j in range(4)]
    )
    out_entries = (
        [("ovx", slab(lagk(2 * K - 1))), ("ovy", slab(lagk(2 * K - 1))),
         ("ovz", slab(lagk(2 * K - 1)))]
        + [(f"os_{c}", slab(lagk(2 * K))) for c in _S6]
        + [(f"or_{c}", slab(lagk(2 * K))) for c in _S6]
        + ([("oacc_c", slab(lagk(2 * K))), ("oacc_s", slab(lagk(2 * K))),
            ("opeak", slab(lagk(2 * K)))] if with_dft else [])
        + ([] if _min_streams else
           [(f"opsi_v{j}", slab_y(lagk(2 * K - 1))) for j in range(6)]
           + ([("opsi_vz_pk", slab_zp(lagk(2 * K - 1)))] if pack_z else
              [(f"opsi_v{j}", slab_z(lagk(2 * K - 1)))
               for j in range(6, 12)])
           + [(f"opsi_s{j}", slab_y(lagk(2 * K))) for j in range(6)]
           + ([("opsi_sz_pk", slab_zp(lagk(2 * K)))] if pack_z else
              [(f"opsi_s{j}", slab_z(lagk(2 * K))) for j in range(6, 12)])
           + [(f"opxs{j}",
               psixb((lo_of if j % 2 == 0 else hi_of)(2 * K - 1)))
              for j in range(6)]
           + [(f"opxv{j}", psixb((lo_of if j % 2 == 0 else hi_of)(2 * K)))
              for j in range(6)])
    )
    vol = lambda: jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)
    shp_y = jax.ShapeDtypeStruct((N1, ns, N3), jnp.float32)
    shp_zp = jax.ShapeDtypeStruct((N1, N2, 6 * ns), jnp.float32)

    shp_z = jax.ShapeDtypeStruct((N1, N2, ns), jnp.float32)

    def out_shape_of(nm):
        if nm.endswith("z_pk"):
            return shp_zp
        if nm.startswith("opsi_"):
            return shp_y if int(nm[6:]) < 6 else shp_z
        if nm.startswith("opx"):
            return psix_shape
        return vol()

    in_idx = {nm: j for j, (nm, _) in enumerate(in_entries)}
    out_idx = {nm: j for j, (nm, _) in enumerate(out_entries)}
    aliases = {
        in_idx["vx"]: out_idx["ovx"], in_idx["vy"]: out_idx["ovy"],
        in_idx["vz"]: out_idx["ovz"],
    }
    for c in _S6:
        aliases[in_idx["s" + c]] = out_idx["os_" + c]
        aliases[in_idx["r_" + c]] = out_idx["or_" + c]
    if with_dft:
        aliases[in_idx["acc_c"]] = out_idx["oacc_c"]
        aliases[in_idx["acc_s"]] = out_idx["oacc_s"]
        aliases[in_idx["peak"]] = out_idx["opeak"]
    for j in range(0 if _min_streams else (6 if pack_z else 12)):
        aliases[in_idx[f"psi_v{j}"]] = out_idx[f"opsi_v{j}"]
        aliases[in_idx[f"psi_s{j}"]] = out_idx[f"opsi_s{j}"]
    if pack_z and not _min_streams:
        aliases[in_idx["psi_vz_pk"]] = out_idx["opsi_vz_pk"]
        aliases[in_idx["psi_sz_pk"]] = out_idx["opsi_sz_pk"]
    for j in range(0 if _min_streams else 6):
        aliases[in_idx[f"pxs{j}"]] = out_idx[f"opxs{j}"]
        aliases[in_idx[f"pxv{j}"]] = out_idx[f"opxv{j}"]

    ring_slab = lambda d: pltpu.VMEM((d, nb, N2, N3), jnp.float32)
    scratch_entries = (
        [(f"s0_{c}", ring_slab(sdepth(0, c))) for c in _S6]
        + [(f"s{k}_{c}", ring_slab(sdepth(k, c)))
           for k in range(1, K) for c in _S6]
        + [(f"r{k}", pltpu.VMEM((6, 3, nb, N2, N3), jnp.float32))
           for k in range(1, K)]
        + [(f"v{k}{c}", ring_slab(3))
           for k in range(1, K + 1) for c in ("x", "y", "z")]
        + ([("midx_r", pltpu.VMEM((2 * K - 1, nb, N2, N3), jnp.int32))]
           if indexed_materials else
           [("rho_r", ring_slab(Dm)), ("piu_r", ring_slab(Dm)),
            ("muu_r", ring_slab(Dm)), ("crp_r", ring_slab(Dm)),
            ("crs_r", ring_slab(Dm)), ("br_r", ring_slab(Dm))])
        + ([(f"{nm}_r", ring_slab(Dm))
            for nm in ("vamp", "vcph", "vsph", "vox", "voy", "voz")]
           if volume_src else [])
        + [("pv_y", pltpu.VMEM((6, Dp, nb, ns, N3), jnp.float32)),
           ("pv_z", pltpu.VMEM((Dp, nb, N2, 6 * ns), jnp.float32)
            if pack_z else
            pltpu.VMEM((6, Dp, nb, N2, ns), jnp.float32)),
           ("ps_y", pltpu.VMEM((6, Dp, nb, ns, N3), jnp.float32)),
           ("ps_z", pltpu.VMEM((Dp, nb, N2, 6 * ns), jnp.float32)
            if pack_z else
            pltpu.VMEM((6, Dp, nb, N2, ns), jnp.float32))]
        + [("pxs_r", pltpu.VMEM((6, Dp, nb, N2, N3), jnp.float32)),
           ("pxv_r", pltpu.VMEM((6, Dp, nb, N2, N3), jnp.float32))]
    )

    def kernel(*refs):
        n_in = len(in_entries)
        n_out = len(out_entries)
        R = {nm: refs[j] for j, (nm, _) in enumerate(in_entries)}
        R.update({nm: refs[n_in + j] for j, (nm, _) in enumerate(out_entries)})
        R.update({nm: refs[n_in + n_out + j]
                  for j, (nm, _) in enumerate(scratch_entries)})

        cyh = tuple(R[f"cyh{j}"] for j in range(4))
        czh = tuple(R[f"czh{j}"] for j in range(4))
        cyi = tuple(R[f"cyi{j}"] for j in range(4))
        czi = tuple(R[f"czi{j}"] for j in range(4))

        i = pl.program_id(0)
        ghost = R["ghost"][...]

        if point:
            ii_p = jax.lax.broadcasted_iota(jnp.int32, (nb, 1, 1), 0)
            jj_p = jax.lax.broadcasted_iota(jnp.int32, (1, N2, 1), 1)
            kk_p = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
            pmask = (
                (ii_p == li_pt) & (jj_p == j0_pt) & (kk_p == k0_pt)
            ).astype(jnp.float32)

        @pl.when(i < n_slabs)
        def _():
            R["s0_xx"][i % 3] = R["sxx"][...]
            R["s0_xy"][i % 3] = R["sxy"][...]
            R["s0_xz"][i % 3] = R["sxz"][...]

        def win(ring, s, D):
            if _no_xwin:  # perf probe only: no window/concat, wrong numbers
                return ring[s % D]
            prev2 = jnp.where(s >= 1, ring[(s - 1) % D][nb - 2:], ghost)
            nxt2 = jnp.where(s < n_slabs - 1, ring[(s + 1) % D][0:2], ghost)
            return jnp.concatenate([prev2, ring[s % D], nxt2], axis=0)

        def cpml_arr(d, lo, hi, coefs, axis):
            if _no_inplane_cpml:  # perf probe only: boundaries wrong
                return d, lo, hi
            return _apply_cpml_inplane(
                d, lo, hi,
                coefs[0][...], coefs[1][...], coefs[2][...], coefs[3][...],
                axis=axis,
            )

        if indexed_materials:
            g_starts = list(range(0, N3 - 127, 128))
            gW = min(128, N3)
            if not g_starts or g_starts[-1] + 128 < N3:
                g_starts.append(max(N3 - gW, 0))

            def mgather(c, idx3):
                """f32 coefficient c for an int32 index slab via 128-lane
                windowed ``dynamic_gather`` from the resident table (the
                gather is exact, so this is bit-equal to the pre-expanded
                property volumes)."""
                pieces = []
                prev_end = 0
                for s0 in g_starts:
                    i2 = idx3[:, :, s0:s0 + gW].reshape(nb * N2, gW)
                    x = jnp.broadcast_to(
                        R["mtab"][c, :gW][None, :], (nb * N2, gW)
                    )
                    g = jnp.take_along_axis(
                        x, i2, axis=1, mode="promise_in_bounds"
                    ).reshape(nb, N2, gW)
                    pieces.append(g[:, :, prev_end - s0:])
                    prev_end = s0 + gW
                if len(pieces) == 1:
                    return pieces[0]
                return jnp.concatenate(pieces, axis=2)

        def xcoef8(s):
            """(b_lo, a_lo, b_hi, a_hi) x-CPML windows for slab s, half
            then int family, dynamic-sliced from the resident packs."""
            blo = jnp.clip(s - h0, 0, kx) * nb
            base = n_slabs - kx - h0
            bhi = jnp.where(
                (s >= base) & (s < n_slabs - h0), s - base, kx
            ) * nb
            out = []
            for fam in ("h", "i"):
                out += [R[f"xc{fam}0"][pl.ds(blo, nb)],
                        R[f"xc{fam}1"][pl.ds(blo, nb)],
                        R[f"xc{fam}2"][pl.ds(bhi, nb)],
                        R[f"xc{fam}3"][pl.ds(bhi, nb)]]
            return tuple(out)

        def xc_apply(d, p_lo, p_hi, c0, c1, c2, c3):
            if _no_xcpml:  # perf probe only: numerics wrong at x edges
                return d, p_lo, p_hi
            nlo = c0 * p_lo + c1 * d
            nhi = c2 * p_hi + c3 * d
            return d + nlo + nhi, nlo, nhi

        def vel_body(w_xx, w_xy, w_xz, syy, szz, syz, v_in, rho_inv,
                     psi12, psix6, cx, src3, ts, vsrc6=None):
            sxy = win_mid(w_xy)
            sxz = win_mid(w_xz)
            xh = (cx[0], cx[1], cx[2], cx[3])
            xi = (cx[4], cx[5], cx[6], cx[7])
            dsxx_x, nlo, nhi = xc_apply(
                dpx_w(w_xx), psix6[0], psix6[1], xh[0], xh[1], xh[2], xh[3]
            )
            npx = [nlo, nhi]
            dsxy_x, nlo, nhi = xc_apply(
                dmx_w(w_xy), psix6[2], psix6[3], xi[0], xi[1], xi[2], xi[3]
            )
            npx += [nlo, nhi]
            dsxz_x, nlo, nhi = xc_apply(
                dmx_w(w_xz), psix6[4], psix6[5], xi[0], xi[1], xi[2], xi[3]
            )
            npx += [nlo, nhi]
            np12 = []
            dsxy_y, n0, n1 = cpml_arr(dy_m(sxy), psi12[0], psi12[1],
                                      cyi, 1)
            np12 += [n0, n1]
            dsyy_y, n0, n1 = cpml_arr(dy_p(syy), psi12[2], psi12[3],
                                      cyh, 1)
            np12 += [n0, n1]
            dsyz_y, n0, n1 = cpml_arr(dy_m(syz), psi12[4], psi12[5],
                                      cyi, 1)
            np12 += [n0, n1]
            dsxz_z, n0, n1 = cpml_arr(dz_m(sxz), psi12[6], psi12[7],
                                      czi, 2)
            np12 += [n0, n1]
            dsyz_z, n0, n1 = cpml_arr(dz_m(syz), psi12[8], psi12[9],
                                      czi, 2)
            np12 += [n0, n1]
            dszz_z, n0, n1 = cpml_arr(dz_p(szz), psi12[10], psi12[11],
                                      czh, 2)
            np12 += [n0, n1]
            vx_n = v_in[0] + dt_dx * rho_inv * (dsxx_x + dsxy_y + dsxz_z)
            vy_n = v_in[1] + dt_dx * rho_inv * (dsxy_x + dsyy_y + dsyz_z)
            vz_n = v_in[2] + dt_dx * rho_inv * (dsxz_x + dsyz_y + dszz_z)
            if plane_src:
                amp, cph, sph = src3
                sval = ts[0] * cph + ts[1] * sph
                z_iota = jax.lax.broadcasted_iota(jnp.int32, (1, 1, N3), 2)
                on_src = (z_iota == zsrc) & (amp > 0)
                vz_n = jnp.where(on_src, sval * amp, vz_n)
            if volume_src:
                vamp, vcph, vsph, vox, voy, voz = vsrc6
                sv = (ts[0] * vcph + ts[1] * vsph) * vamp
                on = vamp > 0
                vx_n = jnp.where(on, sv * vox, vx_n)
                vy_n = jnp.where(on, sv * voy, vy_n)
                vz_n = jnp.where(on, sv * voz, vz_n)
            return vx_n, vy_n, vz_n, np12, npx

        def stress_body(w_x, w_y, w_z, s_old6, r_old6, props5,
                        psi12, psix6, cx):
            vx = win_mid(w_x)
            vy = win_mid(w_y)
            vz = win_mid(w_z)
            xh = (cx[0], cx[1], cx[2], cx[3])
            xi = (cx[4], cx[5], cx[6], cx[7])
            dvx_x, nlo, nhi = xc_apply(
                dmx_w(w_x), psix6[0], psix6[1], xi[0], xi[1], xi[2], xi[3]
            )
            npx = [nlo, nhi]
            dvy_x, nlo, nhi = xc_apply(
                dpx_w(w_y), psix6[2], psix6[3], xh[0], xh[1], xh[2], xh[3]
            )
            npx += [nlo, nhi]
            dvz_x, nlo, nhi = xc_apply(
                dpx_w(w_z), psix6[4], psix6[5], xh[0], xh[1], xh[2], xh[3]
            )
            npx += [nlo, nhi]
            np12 = []
            dvy_y, n0, n1 = cpml_arr(dy_m(vy), psi12[0], psi12[1],
                                     cyi, 1)
            np12 += [n0, n1]
            dvx_y, n0, n1 = cpml_arr(dy_p(vx), psi12[2], psi12[3],
                                     cyh, 1)
            np12 += [n0, n1]
            dvz_y, n0, n1 = cpml_arr(dy_p(vz), psi12[4], psi12[5],
                                     cyh, 1)
            np12 += [n0, n1]
            dvz_z, n0, n1 = cpml_arr(dz_m(vz), psi12[6], psi12[7],
                                     czi, 2)
            np12 += [n0, n1]
            dvx_z, n0, n1 = cpml_arr(dz_p(vx), psi12[8], psi12[9],
                                     czh, 2)
            np12 += [n0, n1]
            dvy_z, n0, n1 = cpml_arr(dz_p(vy), psi12[10], psi12[11],
                                     czh, 2)
            np12 += [n0, n1]
            theta = dvx_x + dvy_y + dvz_z
            pi_u, mu_u, c_rp, c_rs, b_r = props5

            def diag(s_old, r_old, d_own):
                if _cheap_updates:  # perf probe only
                    return s_old + d_own, r_old
                if viscous:
                    phi = c_rp * theta - 2.0 * c_rs * (theta - d_own)
                    r_new = b_r * r_old - phi * inv_dx
                    s_new = (
                        s_old
                        + dt_dx * (pi_u * theta - 2 * mu_u * (theta - d_own))
                        + dt * 0.5 * (r_new + r_old)
                    )
                else:
                    r_new = r_old
                    s_new = s_old + dt_dx * (
                        pi_u * theta - 2 * mu_u * (theta - d_own)
                    )
                return s_new, r_new

            def shear(s_old, r_old, e):
                if _cheap_updates:  # perf probe only
                    return s_old + e, r_old
                if viscous:
                    r_new = b_r * r_old - c_rs * e * inv_dx
                    s_new = (
                        s_old + dt_dx * mu_u * e + dt * 0.5 * (r_new + r_old)
                    )
                else:
                    r_new = r_old
                    s_new = s_old + dt_dx * mu_u * e
                return s_new, r_new

            sxx_n, rxx_n = diag(s_old6[0], r_old6[0], dvx_x)
            syy_n, ryy_n = diag(s_old6[1], r_old6[1], dvy_y)
            szz_n, rzz_n = diag(s_old6[2], r_old6[2], dvz_z)
            sxy_n, rxy_n = shear(s_old6[3], r_old6[3], dvx_y + dvy_x)
            sxz_n, rxz_n = shear(s_old6[4], r_old6[4], dvx_z + dvz_x)
            syz_n, ryz_n = shear(s_old6[5], r_old6[5], dvy_z + dvz_y)
            return ((sxx_n, syy_n, szz_n, sxy_n, sxz_n, syz_n),
                    (rxx_n, ryy_n, rzz_n, rxy_n, rxz_n, ryz_n), np12, npx)

        def v_stage(k):
            lag = 2 * k - 1

            @pl.when((i >= lag) & (i <= n_slabs + lag - 1))
            def _():
                sv = i - lag
                if k == 1:
                    w_xx = win(R["s0_xx"], sv, 3)
                    w_xy = win(R["s0_xy"], sv, 3)
                    w_xz = win(R["s0_xz"], sv, 3)
                    syy, szz, syz = R["syy"][...], R["szz"][...], R["syz"][...]
                    v_in = (R["vx"][...], R["vy"][...], R["vz"][...])
                    if indexed_materials:
                        rho_inv = mgather(0, R["midx"][...])
                    else:
                        rho_inv = R["rho"][...]
                    if _min_streams:  # perf probe only: wrong numbers
                        psi12 = (
                            [jnp.zeros((nb, ns, N3), jnp.float32)] * 6
                            + [jnp.zeros((nb, N2, ns), jnp.float32)] * 6
                        )
                        psix6 = [jnp.zeros((nb, N2, N3), jnp.float32)] * 6
                    elif pack_z:
                        vz_pk = R["psi_vz_pk"][...]
                        psi12 = [R[f"psi_v{j}"][...] for j in range(6)] + [
                            vz_pk[:, :, m * ns:(m + 1) * ns]
                            for m in range(6)
                        ]
                        psix6 = [R[f"pxs{j}"][...] for j in range(6)]
                    else:
                        psi12 = [R[f"psi_v{j}"][...] for j in range(12)]
                        psix6 = [R[f"pxs{j}"][...] for j in range(6)]
                else:
                    km = k - 1
                    w_xx = win(R[f"s{km}_xx"], sv, sdepth(km, "xx"))
                    w_xy = win(R[f"s{km}_xy"], sv, 3)
                    w_xz = win(R[f"s{km}_xz"], sv, 3)
                    syy = R[f"s{km}_yy"][sv % sdepth(km, "yy")]
                    szz = R[f"s{km}_zz"][sv % sdepth(km, "zz")]
                    syz = R[f"s{km}_yz"][sv % 3]
                    v_in = (R[f"v{km}x"][sv % 3], R[f"v{km}y"][sv % 3],
                            R[f"v{km}z"][sv % 3])
                    if indexed_materials:
                        rho_inv = mgather(0, R["midx_r"][sv % (2 * K - 1)])
                    else:
                        rho_inv = R["rho_r"][sv % Dm]
                    if pack_z:
                        vz_pk = R["pv_z"][sv % Dp]
                        psi12 = [R["pv_y"][j, sv % Dp] for j in range(6)] + [
                            vz_pk[:, :, m * ns:(m + 1) * ns]
                            for m in range(6)
                        ]
                    elif _no_psiyz_ring:  # perf probe only: wrong numbers
                        psi12 = (
                            [jnp.zeros((nb, ns, N3), jnp.float32)] * 6
                            + [jnp.zeros((nb, N2, ns), jnp.float32)] * 6
                        )
                    else:
                        psi12 = [R["pv_y"][j, sv % Dp] for j in range(6)] + [
                            R["pv_z"][j, sv % Dp] for j in range(6)
                        ]
                    if _no_psix_ring:  # perf probe only: wrong numbers
                        psix6 = [jnp.zeros((nb, N2, N3), jnp.float32)] * 6
                    else:
                        psix6 = [R["pxs_r"][j, sv % Dp] for j in range(6)]
                src3 = ((R[f"amp{k}"][...], R[f"cph{k}"][...],
                         R[f"sph{k}"][...]) if plane_src else None)
                vsrc6 = None
                if volume_src:
                    names = ("vamp", "vcph", "vsph", "vox", "voy", "voz")
                    if k == 1:
                        vsrc6 = tuple(R[nm][...] for nm in names)
                    else:
                        vsrc6 = tuple(
                            R[f"{nm}_r"][sv % Dm] for nm in names
                        )
                vx_n, vy_n, vz_n, np12, npx = vel_body(
                    w_xx, w_xy, w_xz, syy, szz, syz, v_in, rho_inv,
                    psi12, psix6,
                    xcoef8(sv),
                    src3, (R["tsrc"][k - 1, 0], R["tsrc"][k - 1, 1]),
                    vsrc6,
                )
                R[f"v{k}x"][sv % 3] = vx_n
                R[f"v{k}y"][sv % 3] = vy_n
                R[f"v{k}z"][sv % 3] = vz_n
                if k == 1:
                    # hold syy/szz/syz(t) for S1 next iteration
                    R["s0_yy"][sv % 2] = syy
                    R["s0_zz"][sv % 2] = szz
                    R["s0_yz"][sv % 2] = syz
                if k == K:
                    R["ovx"][...] = vx_n
                    R["ovy"][...] = vy_n
                    R["ovz"][...] = vz_n
                    if not _min_streams:
                        for j in range(6):
                            R[f"opsi_v{j}"][...] = np12[j]
                        if pack_z:
                            R["opsi_vz_pk"][...] = jnp.concatenate(
                                np12[6:12], axis=2
                            )
                        else:
                            for j in range(6, 12):
                                R[f"opsi_v{j}"][...] = np12[j]
                        for j in range(6):
                            R[f"opxs{j}"][...] = npx[j]
                else:
                    if not _no_psiyz_ring:
                        for j in range(6):
                            R["pv_y"][j, sv % Dp] = np12[j]
                        if pack_z:
                            R["pv_z"][sv % Dp] = jnp.concatenate(
                                np12[6:12], axis=2
                            )
                        else:
                            for j in range(6):
                                R["pv_z"][j, sv % Dp] = np12[6 + j]
                    if not _no_psix_ring:
                        for j in range(6):
                            R["pxs_r"][j, sv % Dp] = npx[j]

        def s_stage(k):
            lag = 2 * k

            @pl.when((i >= lag) & (i <= n_slabs + lag - 1))
            def _():
                sp = i - lag
                w_x = win(R[f"v{k}x"], sp, 3)
                w_y = win(R[f"v{k}y"], sp, 3)
                w_z = win(R[f"v{k}z"], sp, 3)
                if k == 1:
                    s_old6 = (R["s0_xx"][sp % 3], R["s0_yy"][sp % 2],
                              R["s0_zz"][sp % 2], R["s0_xy"][sp % 3],
                              R["s0_xz"][sp % 3], R["s0_yz"][sp % 2])
                    r_old6 = [R[f"r_{c}"][...] for c in _S6]
                    if indexed_materials:
                        idx2 = R["midx_r"][sp % (2 * K - 1)]
                        props5 = tuple(mgather(c, idx2) for c in range(1, 6))
                    else:
                        props5 = (R["piu"][...], R["muu"][...],
                                  R["crp"][...], R["crs"][...],
                                  R["br"][...])
                    if _min_streams:  # perf probe only: wrong numbers
                        psi12 = (
                            [jnp.zeros((nb, ns, N3), jnp.float32)] * 6
                            + [jnp.zeros((nb, N2, ns), jnp.float32)] * 6
                        )
                        psix6 = [jnp.zeros((nb, N2, N3), jnp.float32)] * 6
                    elif pack_z:
                        sz_pk = R["psi_sz_pk"][...]
                        psi12 = [R[f"psi_s{j}"][...] for j in range(6)] + [
                            sz_pk[:, :, m * ns:(m + 1) * ns]
                            for m in range(6)
                        ]
                        psix6 = [R[f"pxv{j}"][...] for j in range(6)]
                    else:
                        psi12 = [R[f"psi_s{j}"][...] for j in range(12)]
                        psix6 = [R[f"pxv{j}"][...] for j in range(6)]
                else:
                    km = k - 1
                    s_old6 = tuple(
                        R[f"s{km}_{c}"][sp % sdepth(km, c)] for c in _S6
                    )
                    r_old6 = [R[f"r{km}"][j, sp % 3] for j in range(6)]
                    if indexed_materials:
                        idx2 = R["midx_r"][sp % (2 * K - 1)]
                        props5 = tuple(mgather(c, idx2) for c in range(1, 6))
                    else:
                        props5 = (R["piu_r"][sp % Dm], R["muu_r"][sp % Dm],
                                  R["crp_r"][sp % Dm], R["crs_r"][sp % Dm],
                                  R["br_r"][sp % Dm])
                    if pack_z:
                        sz_pk = R["ps_z"][sp % Dp]
                        psi12 = [R["ps_y"][j, sp % Dp] for j in range(6)] + [
                            sz_pk[:, :, m * ns:(m + 1) * ns]
                            for m in range(6)
                        ]
                    elif _no_psiyz_ring:  # perf probe only: wrong numbers
                        psi12 = (
                            [jnp.zeros((nb, ns, N3), jnp.float32)] * 6
                            + [jnp.zeros((nb, N2, ns), jnp.float32)] * 6
                        )
                    else:
                        psi12 = [R["ps_y"][j, sp % Dp] for j in range(6)] + [
                            R["ps_z"][j, sp % Dp] for j in range(6)
                        ]
                    if _no_psix_ring:  # perf probe only: wrong numbers
                        psix6 = [jnp.zeros((nb, N2, N3), jnp.float32)] * 6
                    else:
                        psix6 = [R["pxv_r"][j, sp % Dp] for j in range(6)]
                s6, r6, np12, npx = stress_body(
                    w_x, w_y, w_z, s_old6, r_old6, props5, psi12, psix6,
                    xcoef8(sp),
                )
                if point:
                    sel = (sp == s_pt).astype(jnp.float32)
                    inj = R["psrc"][k - 1, 0] * sel * pmask
                    s6 = (s6[0] + inj, s6[1] + inj, s6[2] + inj,
                          s6[3], s6[4], s6[5])
                if k == K:
                    for j, c in enumerate(_S6):
                        R[f"os_{c}"][...] = s6[j]
                        R[f"or_{c}"][...] = r6[j]
                    if not _min_streams:
                        for j in range(6):
                            R[f"opsi_s{j}"][...] = np12[j]
                        if pack_z:
                            R["opsi_sz_pk"][...] = jnp.concatenate(
                                np12[6:12], axis=2
                            )
                        else:
                            for j in range(6, 12):
                                R[f"opsi_s{j}"][...] = np12[j]
                        for j in range(6):
                            R[f"opxv{j}"][...] = npx[j]
                    if with_dft:
                        acc_c = R["acc_c"][...]
                        acc_s = R["acc_s"][...]
                        pk = R["peak"][...]
                        for j in range(1, K + 1):
                            if j == K:
                                pj = -(s6[0] + s6[1] + s6[2]) * (1.0 / 3.0)
                            else:
                                pj = -(
                                    R[f"s{j}_xx"][sp % sdepth(j, "xx")]
                                    + R[f"s{j}_yy"][sp % sdepth(j, "yy")]
                                    + R[f"s{j}_zz"][sp % sdepth(j, "zz")]
                                ) * (1.0 / 3.0)
                            cj = R["scal"][j - 1, 0]
                            sj = R["scal"][j - 1, 1]
                            acc_c = acc_c + pj * cj
                            acc_s = acc_s + pj * sj
                            pk = jnp.maximum(
                                pk, jnp.abs(pj) * (cj * cj + sj * sj > 0)
                            )
                        R["oacc_c"][...] = acc_c
                        R["oacc_s"][...] = acc_s
                        R["opeak"][...] = pk
                else:
                    for j, c in enumerate(_S6):
                        R[f"s{k}_{c}"][sp % sdepth(k, c)] = s6[j]
                        R[f"r{k}"][j, sp % 3] = r6[j]
                    if not _no_psiyz_ring:
                        for j in range(6):
                            R["ps_y"][j, sp % Dp] = np12[j]
                        if pack_z:
                            R["ps_z"][sp % Dp] = jnp.concatenate(
                                np12[6:12], axis=2
                            )
                        else:
                            for j in range(6):
                                R["ps_z"][j, sp % Dp] = np12[6 + j]
                    if not _no_psix_ring:
                        for j in range(6):
                            R["pxv_r"][j, sp % Dp] = npx[j]

        for k in range(1, K + 1):
            v_stage(k)
            s_stage(k)

        # end-of-body volume-source stashes (first HBM visit -> ring)
        if volume_src:
            @pl.when((i >= 1) & (i <= n_slabs))
            def _():
                for nm in ("vamp", "vcph", "vsph", "vox", "voy", "voz"):
                    R[f"{nm}_r"][(i - 1) % Dm] = R[nm][...]

        # end-of-body material stashes (first HBM visit -> ring)
        if indexed_materials:
            @pl.when((i >= 1) & (i <= n_slabs))
            def _():
                R["midx_r"][(i - 1) % (2 * K - 1)] = R["midx"][...]
        else:
            @pl.when((i >= 1) & (i <= n_slabs))
            def _():
                R["rho_r"][(i - 1) % Dm] = R["rho"][...]

            @pl.when((i >= 2) & (i <= n_slabs + 1))
            def _():
                R["piu_r"][(i - 2) % Dm] = R["piu"][...]
                R["muu_r"][(i - 2) % Dm] = R["muu"][...]
                R["crp_r"][(i - 2) % Dm] = R["crp"][...]
                R["crs_r"][(i - 2) % Dm] = R["crs"][...]
                R["br_r"][(i - 2) % Dm] = R["br"][...]

    call = pl.pallas_call(
        kernel,
        grid=(n_slabs + 2 * K,),
        in_specs=[spec for _, spec in in_entries],
        out_specs=[spec for _, spec in out_entries],
        out_shape=[out_shape_of(nm) for nm, _ in out_entries],
        scratch_shapes=[s for _, s in scratch_entries],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )
    kc = {
        "y_half": tuple(jnp.asarray(c) for c in cy_h),
        "z_half": tuple(jnp.asarray(c) for c in cz_h),
        "y_int": tuple(jnp.asarray(c) for c in cy_i),
        "z_int": tuple(jnp.asarray(c) for c in cz_i),
        "x_half_pack": _pack_x_coefs(profiles_np, "half", ns, nb, kx),
        "x_int_pack": _pack_x_coefs(profiles_np, "int", ns, nb, kx),
        "px_planes": px_planes,
    }
    return call, kc


def _make_visco_fusedK_step_fn(grid, profiles_np, viscous, oz_scale, K, nb,
                               interpret, with_dft, edge_offset=0,
                               xcoef_scale=None, indexed_materials=False,
                               pack_z=False, ycoef_mask=None,
                               _no_inplane_cpml=False, _no_xcpml=False,
                               _cheap_derivs=False, _no_psix_ring=False,
                               _no_psiyz_ring=False, _no_xwin=False,
                               _cheap_updates=False, _min_streams=False):
    """K-timestep visco step closure (scan over step groups of K).

    With ``indexed_materials`` the carry must hold ``midx`` (int32 volume)
    and ``mtab`` ((8, 128) f32 coefficient table) instead of streaming the
    six expanded property volumes from ``carry['props']``."""
    omega = 2.0 * np.pi * grid.frequency
    call, kc = build_visco_fusedK_step(
        grid, profiles_np, viscous, oz_scale, K, nb, interpret=interpret,
        with_dft=with_dft, edge_offset=edge_offset,
        indexed_materials=indexed_materials, pack_z=pack_z,
        ycoef_mask=ycoef_mask, _no_inplane_cpml=_no_inplane_cpml,
        _no_xcpml=_no_xcpml, _cheap_derivs=_cheap_derivs,
        _no_psix_ring=_no_psix_ring, _no_psiyz_ring=_no_psiyz_ring,
        _no_xwin=_no_xwin, _cheap_updates=_cheap_updates,
        _min_streams=_min_streams,
    )
    bxh = tuple(jnp.asarray(c) for c in kc["x_half_pack"])
    bxi = tuple(jnp.asarray(c) for c in kc["x_int_pack"])
    if xcoef_scale is not None:
        bxh, bxi = _scale_xpacks(bxh, bxi, xcoef_scale)
    N1, N2, N3 = grid.shape
    zero_ghost = jnp.zeros((2, N2, N3), jnp.float32)
    ramp_steps = grid.ramp_cycles / grid.frequency / grid.dt
    plane_src = grid.source_type == "velocity_plane"
    point = grid.source_type == "stress_point"
    vol_src = grid.source_type == "velocity_volume"

    def step(carry, n):
        s = carry
        f = s["fields"]
        pr = s["props"]

        def src_row(nk):
            t = nk.astype(jnp.float32) * grid.dt
            ramp = jnp.where(
                nk < ramp_steps,
                0.5 * (1.0 - jnp.cos(np.pi * nk / ramp_steps)), 1.0,
            ).astype(jnp.float32)
            sc = ramp * oz_scale
            return jnp.stack([jnp.sin(omega * t) * sc,
                              jnp.cos(omega * t) * sc])

        tsrc = jnp.stack([src_row(n + j) for j in range(K)])
        if plane_src:
            src_planes = tuple(
                p for _ in range(K)
                for p in (s["src_amp3"], s["src_cph"], s["src_sph"])
            )
        elif vol_src:
            src_planes = tuple(
                s[k] for k in ("srcv_amp", "srcv_cph", "srcv_sph",
                               "srcv_ox", "srcv_oy", "srcv_oz")
            )
        else:
            src_planes = ()
        if point:
            # visco point source ADDS +amp*sin to the diagonal stresses
            # (`ops/fdtd.py` stress_point contract), so negate the fluid row
            psrc_in = (-jnp.stack(
                [_point_src_row(s["src_amp_point"], n + j, grid, omega,
                                ramp_steps) for j in range(K)]
            ),)
        else:
            psrc_in = ()
        if with_dft:
            def scal_row(nk):
                t = nk.astype(jnp.float32) * grid.dt
                m = (nk >= grid.sensor_start).astype(jnp.float32)
                return jnp.stack([jnp.cos(omega * t) * m,
                                  jnp.sin(omega * t) * m])

            scal_in = (jnp.stack([scal_row(n + j) for j in range(K)]),)
            acc_in = (s["acc_cos"], s["acc_sin"], s["peak"])
        else:
            acc_in = scal_in = ()

        if _min_streams:
            psi_v_in = []
            psi_s_in = []
        elif pack_z:
            # z psi slabs travel lane-packed through the kernel (6 -> 1
            # stream per family); carry keys stay unpacked for the
            # fused1/2 fallback kernels
            psi_v_in = [s[k] for k in _V_PSI_KEYS[:6]] + [
                jnp.concatenate([s[k] for k in _V_PSI_KEYS[6:]], axis=2)
            ]
            psi_s_in = [s[k] for k in _S_PSI_KEYS[:6]] + [
                jnp.concatenate([s[k] for k in _S_PSI_KEYS[6:]], axis=2)
            ]
        else:
            psi_v_in = [s[k] for k in _V_PSI_KEYS]
            psi_s_in = [s[k] for k in _S_PSI_KEYS]
        if indexed_materials:
            mat_a = (s["midx"], s["mtab"])
            mat_b = ()
        else:
            mat_a = (pr["rho_inv"],)
            mat_b = (pr["pi_u"], pr["mu_u"], pr["c_rp"], pr["c_rs"],
                     pr["b_r"])
        outs = call(
            f["sxx"], f["sxy"], f["sxz"],
            f["syy"], f["szz"], f["syz"],
            f["vx"], f["vy"], f["vz"], *mat_a,
            f["rxx"], f["ryy"], f["rzz"], f["rxy"], f["rxz"], f["ryz"],
            *mat_b,
            *acc_in,
            *psi_v_in,
            *psi_s_in,
            zero_ghost,
            *src_planes,
            tsrc,
            *psrc_in,
            *scal_in,
            *kc["y_half"], *kc["z_half"], *kc["y_int"], *kc["z_int"],
            *(() if _min_streams else (
                s["psi_sxxx_lo"], s["psi_sxxx_hi"],
                s["psi_sxyx_lo"], s["psi_sxyx_hi"],
                s["psi_sxzx_lo"], s["psi_sxzx_hi"],
                s["psi_vxx_lo"], s["psi_vxx_hi"],
                s["psi_vyx_lo"], s["psi_vyx_hi"],
                s["psi_vzx_lo"], s["psi_vzx_hi"],
            )),
            *bxh, *bxi,
        )
        it = iter(outs)
        vx, vy, vz = (next(it) for _ in range(3))
        sxx, syy, szz, sxy, sxz, syz = (next(it) for _ in range(6))
        rxx, ryy, rzz, rxy, rxz, ryz = (next(it) for _ in range(6))
        if with_dft:
            acc_c, acc_s, peak = (next(it) for _ in range(3))
        else:
            acc_c, acc_s, peak = s["acc_cos"], s["acc_sin"], s["peak"]
        if _min_streams:
            psi_v_out = [s[k] for k in _V_PSI_KEYS]
            psi_s_out = [s[k] for k in _S_PSI_KEYS]
            (n_sxxx_lo, n_sxxx_hi, n_sxyx_lo, n_sxyx_hi,
             n_sxzx_lo, n_sxzx_hi) = (
                s["psi_sxxx_lo"], s["psi_sxxx_hi"], s["psi_sxyx_lo"],
                s["psi_sxyx_hi"], s["psi_sxzx_lo"], s["psi_sxzx_hi"],
            )
            (n_vxx_lo, n_vxx_hi, n_vyx_lo, n_vyx_hi,
             n_vzx_lo, n_vzx_hi) = (
                s["psi_vxx_lo"], s["psi_vxx_hi"], s["psi_vyx_lo"],
                s["psi_vyx_hi"], s["psi_vzx_lo"], s["psi_vzx_hi"],
            )
        elif pack_z:
            nsp = grid.npml + 2
            psi_v_out = [next(it) for _ in range(7)]
            psi_s_out = [next(it) for _ in range(7)]
            psi_v_out = psi_v_out[:6] + [
                psi_v_out[6][:, :, m * nsp:(m + 1) * nsp] for m in range(6)
            ]
            psi_s_out = psi_s_out[:6] + [
                psi_s_out[6][:, :, m * nsp:(m + 1) * nsp] for m in range(6)
            ]
        else:
            psi_v_out = [next(it) for _ in range(12)]
            psi_s_out = [next(it) for _ in range(12)]
        if not _min_streams:
            (n_sxxx_lo, n_sxxx_hi, n_sxyx_lo, n_sxyx_hi,
             n_sxzx_lo, n_sxzx_hi) = (next(it) for _ in range(6))
            (n_vxx_lo, n_vxx_hi, n_vyx_lo, n_vyx_hi,
             n_vzx_lo, n_vzx_hi) = (next(it) for _ in range(6))
        new_carry = dict(
            s,
            fields=dict(
                vx=vx, vy=vy, vz=vz, sxx=sxx, syy=syy, szz=szz,
                sxy=sxy, sxz=sxz, syz=syz,
                rxx=rxx, ryy=ryy, rzz=rzz, rxy=rxy, rxz=rxz, ryz=ryz,
            ),
            acc_cos=acc_c, acc_sin=acc_s, peak=peak,
            psi_sxxx_lo=n_sxxx_lo, psi_sxxx_hi=n_sxxx_hi,
            psi_sxyx_lo=n_sxyx_lo, psi_sxyx_hi=n_sxyx_hi,
            psi_sxzx_lo=n_sxzx_lo, psi_sxzx_hi=n_sxzx_hi,
            psi_vxx_lo=n_vxx_lo, psi_vxx_hi=n_vxx_hi,
            psi_vyx_lo=n_vyx_lo, psi_vyx_hi=n_vyx_hi,
            psi_vzx_lo=n_vzx_lo, psi_vzx_hi=n_vzx_hi,
            **dict(zip(_V_PSI_KEYS, psi_v_out)),
            **dict(zip(_S_PSI_KEYS, psi_s_out)),
        )
        return new_carry, None

    return step


def _viscoK_auto(grid, nb, K_cap=5, budget_bytes=118 * 1024 * 1024,
                 with_dft=False, indexed=False, pack_z=False,
                 volume_src=False):
    """Deepest K whose visco-fusedK VMEM footprint fits; 0/1 = no fusedK.

    Counts the ring slabs declared by ``build_visco_fusedK_step`` plus the
    double-buffered block streams. ``pack_z`` lane-packs the z psi slabs
    (6 -> 1 buffer per family, ~6x less VMEM there but ~11% slower per
    sweep); ``indexed`` replaces the 6 material volumes with one int32
    index stream + a (2K-1)-slot index ring."""
    N1, N2, N3 = grid.shape
    if N1 % nb:
        return 0
    ns = grid.npml + 2
    n_slabs = N1 // nb
    kx = -(-ns // nb)
    slab_b = _tile_padded_bytes((nb, N2, N3))
    y_b = _tile_padded_bytes((nb, ns, N3))
    z_b = _tile_padded_bytes((nb, N2, ns))
    zp_b = _tile_padded_bytes((nb, N2, 6 * ns))
    for K in range(K_cap, 1, -1):
        if n_slabs < kx + 2 * K - 1:
            continue
        Dp = 2 * K - 1

        def sdepth(k, c):
            if k == 0:
                return 3 if c in ("xx", "xy", "xz") else 2
            if with_dft and c in ("xx", "yy", "zz"):
                return max(3, 2 * K - 2 * k + 1)
            return 3

        rings = sum(sdepth(0, c) for c in _S6)
        rings += sum(sdepth(k, c) for k in range(1, K) for c in _S6)
        rings += (K - 1) * 18          # r rings
        rings += K * 9                 # velocity rings
        rings += (2 * K - 1) if indexed else 6 * (2 * K - 2)  # materials
        rings += 12 * Dp               # psix rings
        if volume_src:
            rings += 6 * (2 * K - 2)   # dome drive stash rings
        n_mat = 1 if indexed else 6
        n_in = 15 + n_mat + 12 + (6 if volume_src else 0) \
            + (3 if with_dft else 0)
        n_out = 27 + (3 if with_dft else 0)
        bufs = 2 * (n_in + n_out)
        if pack_z:
            psi_yz = (12 * Dp + 48) * y_b + (2 * Dp + 8) * zp_b
        else:
            psi_yz = (12 * Dp + 48) * (y_b + z_b)
        est = (rings + bufs) * slab_b + psi_yz + 6 * 1024 * 1024
        if est <= budget_bytes:
            return K
    return 0


def _YSPLIT_OPTIN():
    import os

    return os.environ.get("BBT_VISCO_YSPLIT", "") == "1"


def _visco_ysplit_plan(grid, nb, indexed=False, volume_src=False, K_cap=6):
    """(K, Hy) for the sequential y-tiled visco fusedK driver, or None.

    The 15-field visco rings scale with the slab cross-section nb*N2*N3,
    so at clinical shapes VMEM caps the fused depth at K=2. Splitting the
    domain into TWO y tiles of N2/2 own columns + Hy = 4K recomputed halo
    columns (overlap-and-discard along y, same contamination radius as
    the sharded-x driver: 4 planes per fused step) shrinks every ring by
    ~2x and buys the deeper K the measured time/cell/step = A/K + B model
    pays for. The recompute overhead is 2*Hy/N2; each +1 K is worth
    ~11 %, so the split must buy >= +2 fused depths to win — the caller
    enforces that threshold."""
    import dataclasses

    N1, N2, N3 = grid.shape
    if N2 % 2:
        return None
    own = N2 // 2
    ns = grid.npml + 2
    for K in range(K_cap, 1, -1):
        Hy = 4 * K
        N2e = own + Hy
        if own < Hy or N2e < 2 * ns + 2:
            continue
        ge = dataclasses.replace(grid, shape=(N1, N2e, N3))
        if _viscoK_auto(ge, nb, K_cap=K, indexed=indexed,
                        volume_src=volume_src) < K:
            continue
        if _viscoK_auto(ge, nb, K_cap=K, with_dft=True, indexed=indexed,
                        volume_src=volume_src) < K:
            continue
        return K, Hy
    return None


def _simulate_visco_pallas_ysplit_fused(props, src_amp, src_phase, point_amp,
                                        grid, profiles_np, viscous, oz_scale,
                                        nb, interpret, K, Hy,
                                        mat_idx=None, mat_table=None,
                                        volume_source=None):
    """Sequential y-tiled fused visco sweeps (overlap-and-discard along y).

    Two tiles per sweep on ONE device: tile 0 owns columns [0, N2/2) and
    carries Hy halo columns on its hi side, tile 1 mirrors. Once per
    K-step sweep each tile's halo is refilled from the other tile's valid
    interior (plain HBM slices — no collectives), then the fusedK kernel
    runs on the (N1, N2/2 + Hy, N3) tile with the interior y boundary's
    CPML coefficients statically zeroed (``ycoef_mask``). Garbage creeps
    inward 4 columns per step from the tile edge, so with Hy = 4K the
    owned columns stay BIT-EXACT vs the unsplit kernel at the same K.
    y-psi memories live whole on the tile that owns that physical edge;
    z- and x-psi state splits along y like the fields."""
    import dataclasses

    from jax import lax

    N1, N2, N3 = grid.shape
    own = N2 // 2
    N2e = own + Hy
    ns = grid.npml + 2
    n_quiet = int(max(0, min(grid.sensor_start, grid.n_steps)))
    px_planes = (-(-ns // nb) + 1) * nb
    indexed = mat_idx is not None and mat_table is not None
    plane_src = grid.source_type == "velocity_plane"
    point = grid.source_type == "stress_point"
    vol_src = grid.source_type == "velocity_volume"
    offs = (0, own - Hy)
    masks = ((1.0, 0.0), (0.0, 1.0))

    def ysl(a, t):
        return a[:, offs[t]:offs[t] + N2e]

    grids = []
    for t in (0, 1):
        gkw = {}
        if point:
            i0, j0, k0 = (int(v) for v in grid.source_ijk)
            jt = j0 - offs[t]
            gkw["source_ijk"] = (i0, jt if 0 <= jt < N2e else 0, k0)
        grids.append(dataclasses.replace(grid, shape=(N1, N2e, N3), **gkw))

    z3 = lambda: jnp.zeros((N1, N2e, N3), jnp.float32)
    zy = lambda: jnp.zeros((N1, ns, N3), jnp.float32)
    zz = lambda: jnp.zeros((N1, N2e, ns), jnp.float32)
    zx = lambda: jnp.zeros((px_planes, N2e, N3), jnp.float32)
    _F15 = ("vx", "vy", "vz", "sxx", "syy", "szz", "sxy", "sxz", "syz",
            "rxx", "ryy", "rzz", "rxy", "rxz", "ryz")
    _ZPSI = [k for k in (_V_PSI_KEYS + _S_PSI_KEYS)
             if not k[:-3].endswith("y")]
    _XPSI = ("psi_sxxx_lo", "psi_sxxx_hi", "psi_sxyx_lo", "psi_sxyx_hi",
             "psi_sxzx_lo", "psi_sxzx_hi", "psi_vxx_lo", "psi_vxx_hi",
             "psi_vyx_lo", "psi_vyx_hi", "psi_vzx_lo", "psi_vzx_hi")

    def mk_carry(t):
        c = {
            "fields": {k: z3() for k in _F15},
            "props": {k: ysl(v, t) for k, v in props.items()},
            "acc_cos": z3(), "acc_sin": z3(), "peak": z3(),
        }
        for k in _XPSI:
            c[k] = zx()
        for k in _V_PSI_KEYS + _S_PSI_KEYS:
            c[k] = zy() if k[:-3].endswith("y") else zz()
        if plane_src:
            amp_t = ysl(src_amp, t)
            ph_t = ysl(src_phase, t)
            c["src_amp3"] = amp_t[:, :, None]
            c["src_cph"] = jnp.cos(ph_t)[:, :, None]
            c["src_sph"] = jnp.sin(ph_t)[:, :, None]
        if point:
            j0 = int(grid.source_ijk[1])
            contains = 1.0 if 0 <= j0 - offs[t] < N2e else 0.0
            c["src_amp_point"] = jnp.float32(point_amp) * contains
        if vol_src:
            vs = volume_source
            c["srcv_amp"] = ysl(jnp.asarray(vs["amp"], jnp.float32), t)
            ph3 = ysl(jnp.asarray(vs["phase"], jnp.float32), t)
            c["srcv_cph"] = jnp.cos(ph3)
            c["srcv_sph"] = jnp.sin(ph3)
            for nm in ("ox", "oy", "oz"):
                c["srcv_" + nm] = ysl(jnp.asarray(vs[nm], jnp.float32), t)
        if indexed:
            c["midx"] = ysl(mat_idx, t)
            c["mtab"] = mat_table
        return c

    carry = (mk_carry(0), mk_carry(1))

    def refresh(c0, c1):
        """Refill halo columns from the other tile's valid interior."""
        def upd(a0, a1):
            # tile0 halo = global [own, own+Hy) = tile1 ext cols [Hy, 2Hy)
            a0 = lax.dynamic_update_slice_in_dim(
                a0, lax.slice_in_dim(a1, Hy, 2 * Hy, axis=1), own, axis=1
            )
            # tile1 halo = global [own-Hy, own) = tile0 ext cols [own-Hy, own)
            a1 = lax.dynamic_update_slice_in_dim(
                a1, lax.slice_in_dim(a0, own - Hy, own, axis=1), 0, axis=1
            )
            return a0, a1

        f0 = dict(c0["fields"])
        f1 = dict(c1["fields"])
        for k in _F15:
            f0[k], f1[k] = upd(f0[k], f1[k])
        c0 = dict(c0, fields=f0)
        c1 = dict(c1, fields=f1)
        for k in _ZPSI + list(_XPSI):
            a0, a1 = upd(c0[k], c1[k])
            c0[k] = a0
            c1[k] = a1
        return c0, c1

    def run_phase(carry, n0, n1, with_dft):
        count = n1 - n0
        if count <= 0:
            return carry
        remK = n0
        if count // K > 0:
            stepKs = [
                _make_visco_fusedK_step_fn(
                    grids[t], profiles_np, viscous, oz_scale, K, nb,
                    interpret, with_dft=with_dft,
                    indexed_materials=indexed, ycoef_mask=masks[t],
                )
                for t in (0, 1)
            ]

            def step(c2, n):
                c0, c1 = refresh(c2[0], c2[1])
                c0, _ = stepKs[0](c0, n)
                c1, _ = stepKs[1](c1, n)
                return (c0, c1), None

            carry, _ = jax.lax.scan(
                step, carry, n0 + K * jnp.arange(count // K)
            )
            remK = n0 + K * (count // K)
        if remK < n1:
            step1s = [
                _make_visco_fused_step_fn(
                    grids[t], profiles_np, viscous, oz_scale, nb, None,
                    interpret, with_dft, ycoef_mask=masks[t],
                )
                for t in (0, 1)
            ]

            def step1(c2, n):
                c0, c1 = refresh(c2[0], c2[1])
                c0, _ = step1s[0](c0, n)
                c1, _ = step1s[1](c1, n)
                return (c0, c1), None

            carry, _ = jax.lax.scan(step1, carry, jnp.arange(remK, n1))
        return carry

    carry = run_phase(carry, 0, n_quiet, with_dft=False)
    carry = run_phase(carry, n_quiet, grid.n_steps, with_dft=True)
    c0, c1 = carry

    def join(k):
        return jnp.concatenate([c0[k][:, :own], c1[k][:, Hy:]], axis=1)

    return join("acc_cos"), join("acc_sin"), join("peak")


def _simulate_visco_pallas_sharded_fused(props, src_amp, src_phase, grid,
                                         profiles_np, viscous, oz_scale, nb,
                                         comm, interpret, K, H, h0,
                                         mat_idx=None, mat_table=None):
    """Visco overlap-and-discard fused sweeps under x decomposition.

    Same scheme as ``_simulate_fluid_pallas_sharded_fused``: extended local
    domains with H halo planes per side, refreshed once per K-step sweep
    (fields + y/z psi memories), x-CPML shifted inward by h0 slabs and
    masked to the global-edge shards. Interior planes are bit-exact vs the
    single-device kernels."""
    import dataclasses as _dc

    from jax import lax

    L, N2, N3 = grid.shape
    N1e = L + 2 * H
    ge = _dc.replace(grid, shape=(N1e, N2, N3))
    ns = grid.npml + 2
    n_quiet = int(max(0, min(grid.sensor_start, grid.n_steps)))
    px_planes = (-(-ns // nb) + 1) * nb

    ax = comm.axis_name
    fwd = [(i, i + 1) for i in range(comm.n_shards - 1)]
    bwd = [(i + 1, i) for i in range(comm.n_shards - 1)]
    idx = lax.axis_index(ax)
    is_first = (idx == 0).astype(jnp.float32)
    is_last = (idx == comm.n_shards - 1).astype(jnp.float32)

    def extend(f):
        gl = lax.ppermute(f[L - H:], ax, fwd)
        gr = lax.ppermute(f[:H], ax, bwd)
        return jnp.concatenate([gl, f, gr], axis=0)

    def refresh_group(arrs):
        """Bundled halo refresh: one ppermute per direction for a group
        of same-shaped arrays (see the fluid sharded driver — a visco
        sweep refreshes 15 fields + 24 psi slabs, so bundling cuts the
        per-sweep collective count from 78 to 6)."""
        lo_exp = jnp.stack([a[L:L + H] for a in arrs])
        hi_exp = jnp.stack([a[H:2 * H] for a in arrs])
        from_left = lax.ppermute(lo_exp, ax, fwd)
        from_right = lax.ppermute(hi_exp, ax, bwd)
        out = []
        for i, a in enumerate(arrs):
            a = lax.dynamic_update_slice(a, from_left[i], (0,) * a.ndim)
            out.append(lax.dynamic_update_slice(
                a, from_right[i], (N1e - H,) + (0,) * (a.ndim - 1)
            ))
        return out

    indexed = mat_idx is not None and mat_table is not None
    props_e = {k: extend(v) for k, v in props.items()}
    amp_e = extend(src_amp)
    ph_e = extend(src_phase)

    z3 = lambda: jnp.zeros((N1e, N2, N3), jnp.float32)
    zy = lambda: jnp.zeros((N1e, ns, N3), jnp.float32)
    zz = lambda: jnp.zeros((N1e, N2, ns), jnp.float32)
    zx = lambda: jnp.zeros((px_planes, N2, N3), jnp.float32)
    _F15 = ("vx", "vy", "vz", "sxx", "syy", "szz", "sxy", "sxz", "syz",
            "rxx", "ryy", "rzz", "rxy", "rxz", "ryz")
    carry = {
        "fields": {k: z3() for k in _F15},
        "props": props_e,
        "acc_cos": z3(), "acc_sin": z3(), "peak": z3(),
        "src_amp3": amp_e[:, :, None],
        "src_cph": jnp.cos(ph_e)[:, :, None],
        "src_sph": jnp.sin(ph_e)[:, :, None],
        "psi_sxxx_lo": zx(), "psi_sxxx_hi": zx(),
        "psi_sxyx_lo": zx(), "psi_sxyx_hi": zx(),
        "psi_sxzx_lo": zx(), "psi_sxzx_hi": zx(),
        "psi_vxx_lo": zx(), "psi_vxx_hi": zx(),
        "psi_vyx_lo": zx(), "psi_vyx_hi": zx(),
        "psi_vzx_lo": zx(), "psi_vzx_hi": zx(),
    }
    for k in _V_PSI_KEYS + _S_PSI_KEYS:
        axis_y = k[:-3].endswith("y")
        carry[k] = zy() if axis_y else zz()

    _YKEYS = [k for k in (_V_PSI_KEYS + _S_PSI_KEYS)
              if k[:-3].endswith("y")]
    _ZKEYS = [k for k in (_V_PSI_KEYS + _S_PSI_KEYS)
              if not k[:-3].endswith("y")]

    def with_refresh(stepfn):
        def step(carry, n):
            vols = refresh_group([carry["fields"][k] for k in _F15])
            c = dict(carry, fields=dict(zip(_F15, vols)))
            for grp in (_YKEYS, _ZKEYS):
                arrs = refresh_group([c[k] for k in grp])
                for k, v in zip(grp, arrs):
                    c[k] = v
            return stepfn(c, n)
        return step

    if indexed:
        # dead zones beyond the global edges must carry ZERO properties so
        # they self-maintain zeros (bit-exactness vs the single-device
        # kernel relies on it); extend() zero-fills them with index 0 =
        # water, so remap them to the table's zero pad row
        dead_id = min(128, N3) - 1
        mi_e = extend(mat_idx)
        pos = jax.lax.broadcasted_iota(jnp.int32, (N1e, 1, 1), 0)
        dead = ((pos < H) & (is_first > 0)) | (
            (pos >= N1e - H) & (is_last > 0)
        )
        carry["midx"] = jnp.where(dead, jnp.int32(dead_id), mi_e)
        carry["mtab"] = mat_table

    mk = dict(edge_offset=h0, xcoef_scale=(is_first, is_last))

    def run_phase(carry, n0, n1, with_dft):
        count = n1 - n0
        if count <= 0:
            return carry
        remK = n0
        if count // K > 0:
            stepK = with_refresh(_make_visco_fusedK_step_fn(
                ge, profiles_np, viscous, oz_scale, K, nb, interpret,
                with_dft=with_dft, indexed_materials=indexed, **mk,
            ))
            carry, _ = jax.lax.scan(
                stepK, carry, n0 + K * jnp.arange(count // K)
            )
            remK = n0 + K * (count // K)
        if remK < n1:
            step1 = with_refresh(_make_visco_fused_step_fn(
                ge, profiles_np, viscous, oz_scale, nb, comm, interpret,
                with_dft, **mk,
            ))
            carry, _ = jax.lax.scan(step1, carry, jnp.arange(remK, n1))
        return carry

    carry = run_phase(carry, 0, n_quiet, with_dft=False)
    carry = run_phase(carry, n_quiet, grid.n_steps, with_dft=True)
    sl = slice(H, H + L)
    return (carry["acc_cos"][sl], carry["acc_sin"][sl], carry["peak"][sl])


def simulate_visco_pallas(props, src_amp, src_phase, point_amp, grid,
                          profiles_np, viscous, oz_scale, nb=2,
                          comm=None, interpret=False, fuse_steps=None,
                          volume_source=None, mat_idx=None, mat_table=None,
                          k_shrink=0, _probe_flags=None):
    """Scan driver for the viscoelastic pallas path (optionally sharded).

    Two scan phases like the fluid driver: quiet kernels before
    ``grid.sensor_start``, accumulating kernels inside the window. On an
    unsharded x extent steps run through the deepest K-step temporally
    blocked kernel that fits VMEM (``_viscoK_auto``), then the two-step
    fused kernel, then a 1-step fused tail. Under x decomposition with a
    plane source, the overlap-and-discard fused driver runs whenever a
    K >= 2 plan fits the shard extent.

    ``mat_idx`` (int32 (N1,N2,N3)) + ``mat_table`` ((8,128) f32 rows
    [rho_inv, pi_u, mu_u, c_rp, c_rs, b_r]) switch the fusedK kernels to
    indexed materials (in-kernel single-vreg table gather, bit-exact vs
    the expanded volumes); requires <= min(128, N3) materials — always
    true for label mode. The fused1/fused2 tail kernels still consume
    ``props``.
    """
    N1, N2, N3 = grid.shape
    indexed = mat_idx is not None and mat_table is not None
    if comm is not None and comm.sharded_x and not comm.sharded_y and \
            grid.source_type == "velocity_plane":
        plan = _sharded_fusedK_plan(
            N1, nb, grid.npml, fuse_steps, grid, K_cap=4,
            auto_fn=functools.partial(_viscoK_auto, indexed=indexed),
        )
        if plan is not None:
            return _simulate_visco_pallas_sharded_fused(
                props, src_amp, src_phase, grid, profiles_np, viscous,
                oz_scale, nb, comm, interpret, *plan,
                mat_idx=mat_idx, mat_table=mat_table,
            )
    ns = grid.npml + 2
    n_quiet = int(max(0, min(grid.sensor_start, grid.n_steps)))
    z3 = lambda: jnp.zeros((N1, N2, N3), jnp.float32)
    zy = lambda: jnp.zeros((N1, ns, N3), jnp.float32)
    zz = lambda: jnp.zeros((N1, N2, ns), jnp.float32)
    px_planes = (-(-ns // nb) + 1) * nb  # in-kernel x-CPML block count
    zx = lambda: jnp.zeros((px_planes, N2, N3), jnp.float32)
    carry = {
        "fields": {
            k: z3()
            for k in (
                "vx", "vy", "vz", "sxx", "syy", "szz", "sxy", "sxz", "syz",
                "rxx", "ryy", "rzz", "rxy", "rxz", "ryz",
            )
        },
        "props": props,
        "acc_cos": z3(), "acc_sin": z3(), "peak": z3(),
        "src_amp_point": point_amp,
        "psi_sxxx_lo": zx(), "psi_sxxx_hi": zx(),
        "psi_sxyx_lo": zx(), "psi_sxyx_hi": zx(),
        "psi_sxzx_lo": zx(), "psi_sxzx_hi": zx(),
        "psi_vxx_lo": zx(), "psi_vxx_hi": zx(),
        "psi_vyx_lo": zx(), "psi_vyx_hi": zx(),
        "psi_vzx_lo": zx(), "psi_vzx_hi": zx(),
    }
    if indexed:
        carry["midx"] = mat_idx
        carry["mtab"] = mat_table
    if grid.source_type == "stress_point":
        carry["peak_src"] = jnp.float32(0.0)
    if grid.source_type == "velocity_plane":
        carry["src_amp3"] = src_amp[:, :, None]
        carry["src_cph"] = jnp.cos(src_phase)[:, :, None]
        carry["src_sph"] = jnp.sin(src_phase)[:, :, None]
    if grid.source_type == "velocity_volume":
        vs = volume_source
        carry["srcv_amp"] = jnp.asarray(vs["amp"], jnp.float32)
        carry["srcv_cph"] = jnp.cos(jnp.asarray(vs["phase"], jnp.float32))
        carry["srcv_sph"] = jnp.sin(jnp.asarray(vs["phase"], jnp.float32))
        carry["srcv_ox"] = jnp.asarray(vs["ox"], jnp.float32)
        carry["srcv_oy"] = jnp.asarray(vs["oy"], jnp.float32)
        carry["srcv_oz"] = jnp.asarray(vs["oz"], jnp.float32)
    for k in _V_PSI_KEYS + _S_PSI_KEYS:
        # derivative axis is the last letter of the field part: psi_sxyY_lo
        axis_y = k[:-3].endswith("y")
        carry[k] = zy() if axis_y else zz()

    if comm is None:
        from ..parallel.halo import DomainComm

        comm = DomainComm()
    kx = -(-ns // nb)
    unsharded = not (comm.sharded_x or comm.sharded_y)
    use_fused2 = (
        unsharded
        and grid.source_type == "velocity_plane"
        and N1 // nb >= kx + 3
    )
    fusable_src = grid.source_type in (
        "velocity_plane", "stress_point", "velocity_volume"
    )
    vol_src = grid.source_type == "velocity_volume"
    packz = packz_dft = False
    if fuse_steps is None:
        def _pick(dft):
            """z-packing costs ~12%/sweep (measured: packed K=3 5.48 vs
            unpacked K=2 6.29 Gcells/s at the headline shape) while each
            +1 K is worth ~11%, so packing must buy >= 2 extra K to win."""
            kp = _viscoK_auto(grid, nb, with_dft=dft, indexed=indexed,
                              volume_src=vol_src)
            kz = _viscoK_auto(grid, nb, with_dft=dft, indexed=indexed,
                              pack_z=True, volume_src=vol_src)
            return (kz, True) if kz >= kp + 2 else (kp, False)

        if unsharded and fusable_src:
            K, packz = _pick(False)
            K_dft, packz_dft = _pick(True)
            if k_shrink:
                K = 0 if K - k_shrink < 2 else K - k_shrink
                K_dft = 0 if K_dft - k_shrink < 2 else K_dft - k_shrink
            elif not packz and not packz_dft and _YSPLIT_OPTIN():
                # y-tiled sweeps (opt-in probe only): splitting the
                # cross-section in two fits K=4 at the headline shape,
                # but MEASURED on chip it loses — 5.21 Gcells/s vs the
                # unsplit K=2's 6.29 at (192,192,240). The A term of the
                # time/cell/step = A/K + B model is dominated by per-sweep
                # HBM traffic plus per-iteration fixed cost that does NOT
                # shrink with the tile cross-section, and the per-sweep
                # halo refresh materializes dozens of dynamic_update_slice
                # copies. Kept behind BBT_VISCO_YSPLIT=1 as a measured
                # negative result (same status as z-psi lane packing).
                ys = _visco_ysplit_plan(grid, nb, indexed=indexed,
                                        volume_src=vol_src)
                if ys is not None and ys[0] >= max(K, K_dft, 2) + 2:
                    return _simulate_visco_pallas_ysplit_fused(
                        props, src_amp, src_phase, point_amp, grid,
                        profiles_np, viscous, oz_scale, nb, interpret,
                        *ys, mat_idx=mat_idx, mat_table=mat_table,
                        volume_source=volume_source,
                    )
        else:
            K = K_dft = 0
    else:
        K = int(fuse_steps)
        if K >= 2 and (not (unsharded and fusable_src)
                       or N1 // nb < kx + 2 * K - 1):
            raise ValueError(
                f"fuse_steps={K} needs an unsharded x-extent with "
                f"N1/nb >= {kx + 2 * K - 1}"
            )
        K_dft = K
    use_fusedK = K >= 2

    def run_phase(carry, n0, n1, with_dft):
        count = n1 - n0
        if count <= 0:
            return carry
        remK = n0
        Kp = K_dft if with_dft else K
        if use_fusedK and Kp >= 2 and count // Kp > 0:
            stepK = _make_visco_fusedK_step_fn(
                grid, profiles_np, viscous, oz_scale, Kp, nb, interpret,
                with_dft=with_dft, indexed_materials=indexed,
                pack_z=packz_dft if with_dft else packz,
                **(_probe_flags or {}),
            )
            carry, _ = jax.lax.scan(
                stepK, carry, n0 + Kp * jnp.arange(count // Kp)
            )
            remK = n0 + Kp * (count // Kp)
        n_pairs = (n1 - remK) // 2 if use_fused2 else 0
        if n_pairs > 0:
            step2 = _make_visco_fused2_step_fn(
                grid, profiles_np, viscous, oz_scale, nb, interpret, with_dft
            )
            carry, _ = jax.lax.scan(
                step2, carry, remK + 2 * jnp.arange(n_pairs)
            )
        rem0 = remK + 2 * n_pairs
        if rem0 < n1:
            step1 = make_visco_pallas_step(
                grid, profiles_np, viscous, oz_scale, nb, comm=comm,
                interpret=interpret, with_dft=with_dft,
            )
            carry, _ = jax.lax.scan(step1, carry, jnp.arange(rem0, n1))
        return carry

    carry = run_phase(carry, 0, n_quiet, with_dft=False)
    carry = run_phase(carry, n_quiet, grid.n_steps, with_dft=True)
    return carry["acc_cos"], carry["acc_sin"], carry["peak"]
