"""Roofline probes for the fused FDTD kernels (VERDICT r3 task 6).

Measures, on the real chip:

  stream   HBM streaming bandwidth (y = x + 1 over 256 MB)
  vpu      VPU FMA throughput (long FMA chain on a VMEM-resident block)
  matcost  fluid fusedK sweep time with material streams pinned to block 0
           (Pallas elides the repeated reads) vs the production kernel —
           the direct measurement of the material-traffic share
  gather   cost of the chunked dynamic_gather table expansion
           (1026-entry CT table -> 4 coefficient slabs, and the 1-vreg
           label-mode variant)

Usage: python tools/probe_roofline.py [stream vpu matcost gather ...]
"""
import functools
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache")
)
sys.path.insert(0, _ROOT)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPE = (192, 192, 240)
F0 = 500e3
PPW = 6.0


def _sync(x):
    return float(np.asarray(x[(0,) * (x.ndim - 1) + (slice(0, 2),)])[0])


def _time_best(fn, n=3):
    fn()  # warm
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        best = min(best, time.perf_counter() - t0)
    return best


def _diff_time(make_fn, n1, n2):
    """Time fn(n2) - fn(n1) (in-jit repetition) to cancel dispatch+readback
    overhead — the tunneled runtime adds ~10-300 ms per dispatch.

    Each length is timed independently (best of 4) and the bests are
    differenced; differencing per-round pairs fabricates impossible rates
    when one round's dispatch jitter lands asymmetrically."""
    f1, f2 = make_fn(n1), make_fn(n2)
    _sync(f1())
    _sync(f2())
    b1 = b2 = np.inf
    for _ in range(4):
        t0 = time.perf_counter()
        _sync(f1())
        b1 = min(b1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        _sync(f2())
        b2 = min(b2, time.perf_counter() - t0)
    return (b2 - b1) / (n2 - n1)


def probe_stream():
    n = 32 * 1024 * 1024  # 128 MB f32
    x = jnp.zeros((n // 512, 512), jnp.float32)

    def make(reps):
        @jax.jit
        def run(x):
            return jax.lax.fori_loop(0, reps, lambda i, a: a + 1.0, x)
        return lambda: run(x)

    per_pass = _diff_time(make, 10, 60)
    gbs = 2 * 4 * n / per_pass / 1e9
    print(json.dumps({"probe": "stream", "GBps": round(gbs, 1)}), flush=True)


def probe_vpu():
    """Peak-ish VPU f32 throughput: dependent-chain FMAs x 8 parallel
    accumulators on a VMEM-resident block, repetition inside the kernel."""
    R, C = 256, 512

    def make(rep):
        def kern(x_ref, o_ref):
            x = x_ref[...]
            accs = tuple(x * (1.0 + 0.01 * j) for j in range(8))

            def body(_, accs):
                return tuple(a * 1.000001 + x for a in accs)

            accs = jax.lax.fori_loop(0, rep, body, accs)
            o = accs[0]
            for a in accs[1:]:
                o = o + a
            o_ref[...] = o

        f = jax.jit(pl.pallas_call(
            kern, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32)))
        x = jnp.ones((R, C), jnp.float32)
        return lambda: f(x)

    per_rep = _diff_time(make, 200, 1200)
    flops = R * C * 8 * 2
    print(json.dumps(
        {"probe": "vpu", "Gflops": round(flops / per_rep / 1e9, 1)}
    ), flush=True)


def _fluid_setup(nb=2):
    from babelbrain_tpu.materials.ct_mapping import map_hu_to_properties
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid, _build_cpml_profiles_np, _material_fields,
        sls_coefficients, stable_dt,
    )

    hu = np.linspace(300.0, 2100.0, 1023)
    rho, sos, att = map_hu_to_properties(hu, F0, "Webb-Marsac")
    mats = np.zeros((1026, 5))
    mats[0] = [1000.0, 1500.0, 0, 0, 0]
    mats[1] = [1116.0, 1537.0, 0, 2.99, 0]
    mats[2] = [1041.0, 1562.0, 0, 4.49, 0]
    mats[3:, 0] = rho
    mats[3:, 1] = sos
    mats[3:, 3] = att
    cmax = mats[:, 1:2].max()
    dx = 1482.3 / F0 / PPW
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, cfl=0.5)))
    dt = 1 / F0 / ppp
    n_steps = 42 * ppp
    grid = FDTDGrid(
        shape=SHAPE, dx=dx, dt=dt, n_steps=n_steps, frequency=F0,
        sensor_start=n_steps - 2 * ppp, source_plane_z=13,
    )
    prof = _build_cpml_profiles_np(SHAPE, 12, dx, dt, cmax, 1e-5)
    idx = np.zeros(SHAPE, np.uint16)
    rng = np.random.default_rng(0)
    idx[:, :, 60:70] = 1
    idx[:, :, 70:88] = rng.integers(3, 1026, (192, 192, 18))
    idx[:, :, 88:] = 2
    coefs = sls_coefficients(mats, F0, grid.dt)
    props = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in _material_fields(idx, coefs, has_shear=False).items()
    }
    return grid, prof, props, idx, coefs


def probe_matcost():
    from babelbrain_tpu.ops.fdtd_pallas import (
        _fusedK_auto, _make_fluid_fusedK_step_fn,
    )

    nb = 2
    grid, prof, props, _, _ = _fluid_setup(nb)
    K = _fusedK_auto(grid, nb)
    N1, N2, N3 = grid.shape
    ns = grid.npml + 2
    px_planes = (-(-ns // nb) + 1) * nb
    z3 = lambda: jnp.zeros((N1, N2, N3), jnp.float32)
    zy = lambda: jnp.zeros((N1, ns, N3), jnp.float32)
    zz = lambda: jnp.zeros((N1, N2, ns), jnp.float32)
    zx = lambda: jnp.zeros((px_planes, N2, N3), jnp.float32)
    amp = jnp.zeros((N1, N2), jnp.float32).at[16:-16, 16:-16].set(60e3)
    carry0 = {
        "fields": dict(p=z3(), vx=z3(), vy=z3(), vz=z3(), r=z3()),
        "props": props,
        "psi_py_lo": zy(), "psi_py_hi": zy(),
        "psi_pz_lo": zz(), "psi_pz_hi": zz(),
        "psi_vy_lo": zy(), "psi_vy_hi": zy(),
        "psi_vz_lo": zz(), "psi_vz_hi": zz(),
        "psix_p_lo": zx(), "psix_p_hi": zx(),
        "psix_v_lo": zx(), "psix_v_hi": zx(),
        "acc_cos": z3(), "acc_sin": z3(), "peak": z3(),
        "src_amp": amp[:, :, None],
        "src_cph": jnp.ones((N1, N2, 1), jnp.float32),
        "src_sph": jnp.zeros((N1, N2, 1), jnp.float32),
    }
    out = {"probe": "matcost", "K": K}
    for name, mc in (("production", False), ("mat_const", True)):
        step = _make_fluid_fusedK_step_fn(
            grid, prof, True, 1.0 / (1000 * 1500), K, nb, False,
            with_dft=False, _mat_const=mc,
        )

        def make(ns, _step=step):
            @jax.jit
            def run(carry):
                carry, _ = jax.lax.scan(_step, carry, jnp.arange(ns) * K)
                return carry["fields"]["p"]
            return lambda: run(carry0)

        per_sweep = _diff_time(make, 10, 60)
        mcups = np.prod(SHAPE) * K / per_sweep / 1e6
        out[name + "_mcells_per_s"] = round(mcups, 1)
    out["material_traffic_share"] = round(
        1.0 - out["production_mcells_per_s"] / out["mat_const_mcells_per_s"], 3
    )
    print(json.dumps(out))


def probe_gather():
    """Chunked lane-gather expansion: uint16 idx slab -> f32 coef slabs.

    CT variant: 1026-entry table = 9 x 128-lane chunks + select tree,
    4 coefficients. Label variant: <=128-entry table = single gather per
    coefficient, 6 coefficients. Timing differenced over in-kernel reps.
    """
    nb, N2, N3 = 2, SHAPE[1], SHAPE[2]
    M_CT = 1026
    R = nb * N2

    rng = np.random.default_rng(0)
    idx_np = rng.integers(0, M_CT, size=(nb, N2, N3)).astype(np.int32)
    tabs = rng.standard_normal((6, 9 * 128)).astype(np.float32)
    tab_d = jnp.asarray(tabs)

    starts = list(range(0, N3 - 127, 128))
    if starts[-1] + 128 < N3:
        starts.append(N3 - 128)

    def expand(idx2, tab_ref, c, n_chunks):
        """(R,128) int32 -> (R,128) f32 via chunked lane gathers+selects."""
        out = None
        for chunk in range(n_chunks):
            trow = tab_ref[c, chunk * 128:(chunk + 1) * 128][None, :]
            x = jnp.broadcast_to(trow, (R, 128))
            loc = jnp.clip(idx2 - chunk * 128, 0, 127)
            g = jnp.take_along_axis(x, loc, axis=1,
                                    mode="promise_in_bounds")
            sel = (idx2 >> 7) == chunk
            out = g if out is None else jnp.where(sel, g, out)
        return out

    def make_kern(rep, n_coef, n_chunks, mod):
        def kern(idx_ref, tab_ref, *orefs):
            idx3 = idx_ref[...]
            for r in range(rep):
                for c in range(n_coef):
                    pieces = []
                    prev_end = 0
                    for s in starts:
                        i2 = idx3[:, :, s:s + 128].reshape(R, 128)
                        g = expand(
                            (i2 + (r % 2)) % mod, tab_ref, c, n_chunks
                        ).reshape(nb, N2, 128)
                        pieces.append(g[:, :, prev_end - s:])
                        prev_end = s + 128
                    acc = jnp.concatenate(pieces, axis=2)
                    if r == rep - 1:
                        orefs[c][...] = acc

        return jax.jit(pl.pallas_call(
            kern,
            out_shape=[jax.ShapeDtypeStruct((nb, N2, N3), jnp.float32)]
            * n_coef,
        ))

    for name, n_coef, n_chunks, mod, idx_in in (
        ("gather_ct", 4, 9, M_CT, idx_np),
        ("gather_label", 6, 1, 16, idx_np % 16),
    ):
        idx_dev = jnp.asarray(idx_in)

        def make(rep, _f=None):
            f = make_kern(rep, n_coef, n_chunks, mod)
            return lambda: f(idx_dev, tab_d)[0]

        # correctness on the rep=2 build (last rep offsets idx by 1)
        f2 = make_kern(2, n_coef, n_chunks, mod)
        outs = f2(idx_dev, tab_d)
        want = tabs[1].reshape(-1)[(idx_in + 1) % mod]
        ok = bool(np.array_equal(np.asarray(outs[1]), want))
        per_rep = _diff_time(make, 5, 45)
        print(json.dumps({
            "probe": name, "bitexact": ok,
            "per_slab_us": round(per_rep * 1e6, 2),
            "ns_per_elem": round(per_rep / (nb * N2 * N3) * 1e9, 3),
        }), flush=True)


ALL = {
    "stream": probe_stream,
    "vpu": probe_vpu,
    "matcost": probe_matcost,
    "gather": probe_gather,
}

if __name__ == "__main__":
    names = sys.argv[1:] or list(ALL)
    print("devices:", jax.devices())
    for n in names:
        ALL[n]()
