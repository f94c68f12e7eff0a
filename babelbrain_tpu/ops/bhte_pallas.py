"""Temporally-blocked Pallas BHTE kernel (Pennes bio-heat, FTCS).

The XLA scan in ``ops.bhte`` streams ~17 volume-equivalents of HBM traffic
per step (T/dose/peak read+write, 6 interface conductivities, 2 coefficient
maps, Q) and measures ~9.6 Gcells/s on-chip — already near the streaming
bound for that traffic. This kernel applies the same K-step temporal
blocking as the FDTD fusedK kernels: one streaming sweep advances K
timesteps, with the step-invariant coefficient maps stashed in VMEM rings on
first visit, so traffic drops to ~(16 + 6)/K volumes per step.

Contract parity with ``ops.bhte._bhte_scan`` (`RayleighAndBHTE.BHTE`,
SURVEY.md section 2.9): 7-point Laplacian with harmonic-mean interface
conductivities, edge-replicated (adiabatic) boundaries, perfusion relaxation
toward the arterial temperature, CEM43 dose increment ``R^(43-T)`` with
R = 0.5 above 43 C / 0.25 below, and a running peak tracker. Bit-exact is
not guaranteed vs the XLA path (different reassociation) but every update
equation is identical; parity is tested to f32 tolerance.

Schedule segments (field index, on/off) are constant within a sweep — the
driver runs one scan per schedule segment, so no per-step field indexing is
needed in-kernel (the reference's multi-field time multiplexing becomes a
segment loop). Monitor points are gathered BETWEEN sweeps (cadence = K
steps; the reference's own monitoring cadence is ``nFactorMonitoring``
steps, 5 by default at dt=10 ms).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2R_HI = np.float32(np.log2(0.5))
_LOG2R_LO = np.float32(np.log2(0.25))


def _shift_edge_y(g, off):
    """In-plane y shift with edge replication (adiabatic boundary)."""
    if off > 0:
        return jnp.concatenate([g[:, off:, :], g[:, -1:, :]], axis=1)
    return jnp.concatenate([g[:, :1, :], g[:, :off, :]], axis=1)


def _shift_edge_z(g, off):
    if off > 0:
        return jnp.concatenate([g[:, :, off:], g[:, :, -1:]], axis=2)
    return jnp.concatenate([g[:, :, :1], g[:, :, :off]], axis=2)


def build_bhte_fusedK_step(shape, K, nb=4, interpret=False, with_q=True):
    """K BHTE timesteps per streaming sweep.

    Stage k (k = 1..K) updates slab ``i - k`` at grid iteration i from the
    previous step's temperatures held in depth-3 VMEM rings (the 7-point
    stencil needs the +-1 slab window). Coefficient maps (6 interface
    conductivities, inv_rho_cp*dt, perfusion*dt, Q) stream once per sweep
    and live in depth-(K+1) stash rings. dose/peak accumulate through
    per-level depth-2 rings. ``with_q=False`` drops the Q stream for 'off'
    schedule segments.
    """
    N1, N2, N3 = shape
    if N1 % nb:
        raise ValueError(f"N1={N1} must be divisible by slab size {nb}")
    n_slabs = N1 // nb
    if n_slabs < K + 1:
        raise ValueError(f"N1={N1} too small for the {K}-step BHTE pipeline")

    slab = lambda idx: pl.BlockSpec((nb, N2, N3), idx, memory_space=pltpu.VMEM)
    cur = lambda i: (jnp.minimum(i, n_slabs - 1), 0, 0)

    def lagk(k):
        return lambda i: (jnp.minimum(jnp.maximum(i - k, 0), n_slabs - 1),
                          0, 0)

    Dm = K + 1  # coefficient stash depth

    in_entries = (
        [("T", slab(cur)),
         ("dose", slab(lagk(1))), ("peak", slab(lagk(1))),
         ("kxp", slab(lagk(1))), ("kxm", slab(lagk(1))),
         ("kyp", slab(lagk(1))), ("kym", slab(lagk(1))),
         ("kzp", slab(lagk(1))), ("kzm", slab(lagk(1))),
         ("irc", slab(lagk(1))), ("perf", slab(lagk(1)))]
        + ([("q", slab(lagk(1)))] if with_q else [])
        + [("scal", pl.BlockSpec((1, 2), lambda i: (0, 0),
                                 memory_space=pltpu.SMEM))]
    )
    out_entries = [("oT", slab(lagk(K))), ("odose", slab(lagk(K))),
                   ("opeak", slab(lagk(K)))]
    in_idx = {nm: j for j, (nm, _) in enumerate(in_entries)}
    out_idx = {nm: j for j, (nm, _) in enumerate(out_entries)}
    aliases = {in_idx["T"]: out_idx["oT"], in_idx["dose"]: out_idx["odose"],
               in_idx["peak"]: out_idx["opeak"]}

    ring_slab = lambda d: pltpu.VMEM((d, nb, N2, N3), jnp.float32)
    coeff_names = ["kxp", "kxm", "kyp", "kym", "kzp", "kzm", "irc", "perf"] \
        + (["q"] if with_q else [])
    scratch_entries = (
        [(f"T{k}_ring", ring_slab(3)) for k in range(K)]
        + [(f"d{k}_ring", ring_slab(2)) for k in range(1, K)]
        + [(f"p{k}_ring", ring_slab(2)) for k in range(1, K)]
        + [(f"{nm}_r", ring_slab(Dm)) for nm in coeff_names]
    )

    def kernel(*refs):
        n_in = len(in_entries)
        n_out = len(out_entries)
        R = {nm: refs[j] for j, (nm, _) in enumerate(in_entries)}
        R.update({nm: refs[n_in + j] for j, (nm, _) in enumerate(out_entries)})
        R.update({nm: refs[n_in + n_out + j]
                  for j, (nm, _) in enumerate(scratch_entries)})

        i = pl.program_id(0)
        incoming = R["T"][...]

        @pl.when(i < n_slabs)
        def _():
            R["T0_ring"][i % 3] = incoming

        def window(ring, s, D, nxt_src=None):
            """(nb+2, N2, N3) x-window with edge replication at the global
            ends (adiabatic boundary, `ops.bhte._shift` mode='edge')."""
            cur_slab = ring[s % D]
            prev1 = jnp.where(s >= 1, ring[(s - 1) % D][nb - 1:],
                              cur_slab[0:1])
            if nxt_src is None:
                nxt_src = ring[(s + 1) % D][0:1]
            nxt1 = jnp.where(s < n_slabs - 1, nxt_src, cur_slab[nb - 1:])
            return jnp.concatenate([prev1, cur_slab, nxt1], axis=0)

        def stage(k):
            @pl.when((i >= k) & (i <= n_slabs + k - 1))
            def _():
                s = i - k
                ring = R[f"T{k - 1}_ring"]
                if k == 1:
                    w = window(ring, s, 3, nxt_src=incoming[0:1])
                else:
                    w = window(ring, s, 3)
                T = w[1 : 1 + nb]
                if k == 1:
                    dose = R["dose"][...]
                    peak = R["peak"][...]
                    c = {nm: R[nm][...] for nm in coeff_names}
                else:
                    dose = R[f"d{k - 1}_ring"][s % 2]
                    peak = R[f"p{k - 1}_ring"][s % 2]
                    c = {nm: R[f"{nm}_r"][s % Dm] for nm in coeff_names}
                lap = (
                    c["kxp"] * (w[2 : 2 + nb] - T)
                    + c["kxm"] * (w[0:nb] - T)
                    + c["kyp"] * (_shift_edge_y(T, 1) - T)
                    + c["kym"] * (_shift_edge_y(T, -1) - T)
                    + c["kzp"] * (_shift_edge_z(T, 1) - T)
                    + c["kzm"] * (_shift_edge_z(T, -1) - T)
                )
                tart = R["scal"][0, 0]
                T_new = T + lap * c["irc"] + c["perf"] * (tart - T)
                if with_q:
                    T_new = T_new + c["q"] * c["irc"]
                R_log2 = jnp.where(T_new >= 43.0, _LOG2R_HI, _LOG2R_LO)
                dose_new = dose + jnp.exp2(R_log2 * (43.0 - T_new))
                peak_new = jnp.maximum(peak, T_new)
                if k == K:
                    R["oT"][...] = T_new
                    R["odose"][...] = dose_new
                    R["opeak"][...] = peak_new
                else:
                    R[f"T{k}_ring"][s % 3] = T_new
                    R[f"d{k}_ring"][s % 2] = dose_new
                    R[f"p{k}_ring"][s % 2] = peak_new

        for k in range(1, K + 1):
            stage(k)

        # coefficient stash (first HBM visit -> ring), end of body so the
        # recycled slot's last reader (stage K, same iteration) ran already
        @pl.when((i >= 1) & (i <= n_slabs))
        def _():
            for nm in coeff_names:
                R[f"{nm}_r"][(i - 1) % Dm] = R[nm][...]

    vol = lambda: jax.ShapeDtypeStruct((N1, N2, N3), jnp.float32)
    call = pl.pallas_call(
        kernel,
        grid=(n_slabs + K,),
        in_specs=[spec for _, spec in in_entries],
        out_specs=[spec for _, spec in out_entries],
        out_shape=[vol(), vol(), vol()],
        scratch_shapes=[sh for _, sh in scratch_entries],
        input_output_aliases=aliases,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return call


def _bhteK_auto(shape, nb, K_cap=8, budget_bytes=100 * 1024 * 1024,
                with_q=True):
    """Deepest K whose ring + stream footprint fits VMEM (0/1 = none)."""
    N1, N2, N3 = shape
    if N1 % nb:
        return 0
    slab_b = nb * N2 * N3 * 4
    nc = 9 if with_q else 8
    for K in range(K_cap, 1, -1):
        if N1 // nb < K + 1:
            continue
        rings = 3 * K + 2 * (K - 1) * 2 + nc * (K + 1)
        bufs = 2 * (12 + 3)
        if (rings + bufs) * slab_b + 2 * 1024 * 1024 <= budget_bytes:
            return K
    return 0


@functools.partial(
    jax.jit, static_argnames=("n_steps", "K", "nb", "interpret", "with_q")
)
def _segment_scan(T0, dose0, peak0, Q_seg, coeffs, scal, monitor_idx, *,
                  n_steps, K, nb, interpret, with_q):
    shape = T0.shape
    mons = []

    def sweep_fn(Kk):
        call = build_bhte_fusedK_step(shape, Kk, nb, interpret, with_q)

        def body(carry, _):
            T, dose, peak = carry
            args = [T, dose, peak] + list(coeffs) \
                + ([Q_seg] if with_q else []) + [scal]
            T, dose, peak = call(*args)
            return (T, dose, peak), T.reshape(-1)[monitor_idx]

        return body

    carry = (T0, dose0, peak0)
    done = 0
    if K >= 2 and n_steps // K > 0:
        carry, ys = jax.lax.scan(sweep_fn(K), carry, None,
                                 length=n_steps // K)
        mons.append(ys)
        done = K * (n_steps // K)
    if done < n_steps:
        carry, ys = jax.lax.scan(sweep_fn(1), carry, None,
                                 length=n_steps - done)
        mons.append(ys)
    T, dose, peak = carry
    mons = jnp.concatenate(mons, axis=0) if mons else jnp.zeros(
        (0, np.size(monitor_idx)), jnp.float32
    )
    return T, dose, peak, mons


def bhte_segment_pallas(T0, dose0, peak0, Q_seg, coeff6, n_steps, t_arterial,
                        monitor_idx, *, nb=4, interpret=False,
                        fuse_steps=None):
    """Advance one constant-(field, on) schedule segment with fused sweeps.

    ``Q_seg`` is the segment's heat map ALREADY scaled by the on-flag (None
    for off segments). Returns (T, dose, peak, monitors, monitor_steps):
    monitors are gathered once per sweep (and once per tail step), with the
    global step index of each sample in ``monitor_steps``. The scan body is
    jitted (cached on (n_steps, K) so repeated schedule segments don't
    re-trace).
    """
    shape = T0.shape
    with_q = Q_seg is not None
    K = fuse_steps if fuse_steps is not None else _bhteK_auto(
        shape, nb, with_q=with_q
    )
    K = max(int(K), 1)
    scal = jnp.asarray([[t_arterial, 0.0]], jnp.float32)
    q_arg = Q_seg if with_q else T0  # dummy, unused when with_q=False
    T, dose, peak, mons = _segment_scan(
        T0, dose0, peak0, q_arg, tuple(coeff6), scal, monitor_idx,
        n_steps=int(n_steps), K=K, nb=nb, interpret=interpret,
        with_q=with_q,
    )
    done = K * (n_steps // K) if K >= 2 else 0
    mon_steps = list(range(K - 1, done, K)) + list(range(done, n_steps))
    return T, dose, peak, mons, np.asarray(mon_steps, np.int64)
