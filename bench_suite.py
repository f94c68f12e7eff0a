#!/usr/bin/env python
"""Extended benchmark suite: one JSON line per solver on the real TPU chip.

``bench.py`` stays the single-line driver contract (fluid CT-mode FDTD, the
clinical through-skull path). This suite additionally measures the other
three device-resident solvers so the full perf surface is reproducible:

  * fdtd_fluid_ct   — CT mode (1026 quantized-HU materials, no shear),
                      production sensor window, K-step fused Pallas sweep.
  * fdtd_visco_label— label mode (5 tissues incl. skull shear), 15-field
                      viscoelastic update, K-step fused Pallas sweep.
  * rayleigh        — Rayleigh-Sommerfeld pair throughput (MXU distance
                      form + VPU transcendentals).
  * bhte            — Pennes bio-heat FTCS stepper (XLA scan), thermal-run
                      shaped schedule.

Timing: tiny-slice readback as the sync point (block_until_ready is
unreliable on tunneled runtimes); BHTE uses two scan lengths differenced to
cancel dispatch+readback. Usage: ``python bench_suite.py [name ...]``.
"""

import functools
import json
import os
import sys
import time

import numpy as np

_ROOT = os.path.dirname(os.path.abspath(__file__))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR", os.path.join(_ROOT, ".jax_cache")
)
sys.path.insert(0, _ROOT)

SHAPE = (192, 192, 240)
F0 = 500e3
PPW = 6.0


# Measured stage ceilings per metric (VERDICT r4 task 10): the value a
# perfect schedule of the CURRENT kernel structure could reach, from the
# measured time/cell/step = A/K + B model at K -> inf (1/B) or the
# 818 GB/s HBM / 3.55 Tflop/s VPU probes (tools/probe_roofline.py):
#   fluid fusedK:  B = 12 ps/cell/step (round-4 depth sweep) -> 83.3 G
#   visco fusedK:  B = 144 ps (round-5 depth sweep at narrow shapes;
#                  flat in K, insensitive to every arithmetic/scratch
#                  ablation -> the kernel sits at ~90% of its
#                  stream-structure ceiling) -> 6.9 G
#   dome fluid:    B = 15.4 ps (round-5 K=4/K=5 pair with the in-kernel
#                  volumetric injection) -> 64.9 G
#   rayleigh:      VPU bound at ~40 f32 ops/pair (distance, rsqrt,
#                  sincos, complex accumulate) -> 3.55e12/40 = 88.8 Gpair
#   bhte XLA scan: HBM bound at ~17 volumes/step = 68 B/cell ->
#                  818/68e-9 = 12.0 G
#   bhte pallas:   B from the K=5 sweep structure: measured 61.3 G at
#                  ~(16+6)/5 volumes/step -> HBM no longer binding; use
#                  the per-stage model 1/B with B ~= 12 ps -> 83.3 G
CEILINGS = {
    "fdtd_fluid_ct_mcells_per_s": 83300.0,
    "fdtd_visco_label_mcells_per_s": 6900.0,
    "fdtd_visco_narrow_mcells_per_s": 6900.0,
    "fdtd_dome_volumetric_mcells_per_s": 64900.0,
    "rayleigh_gpairs_per_s": 88.8,
    "bhte_mcells_per_s": 12000.0,
    "bhte_pallas_mcells_per_s": 83300.0,
}


def _emit(metric, value, unit, baseline):
    """baseline = this repo's measured XLA-path number for the same solver
    and shape (COMPONENTS.md perf table), or None when the metric IS the
    XLA path / has no published reference number. pct_of_stage_ceiling =
    value / the measured stage-structure ceiling (CEILINGS above), so perf
    regressions and remaining headroom read as percentages."""
    ceil = CEILINGS.get(metric)
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(value, 1),
                "unit": unit,
                "vs_baseline": (
                    round(value / baseline, 3) if baseline else None
                ),
                "pct_of_stage_ceiling": (
                    round(100.0 * value / ceil, 1) if ceil else None
                ),
            }
        ),
        flush=True,
    )


def _grid_and_profiles(mats, include_shear):
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        stable_dt,
    )

    cmax = (mats[:, 1:3] if include_shear else mats[:, 1:2]).max()
    dx = 1482.3 / F0 / PPW
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, cfl=0.5)))
    dt = 1 / F0 / ppp
    n_steps = 42 * ppp
    grid = FDTDGrid(
        shape=SHAPE, dx=dx, dt=dt, n_steps=n_steps, frequency=F0,
        sensor_start=n_steps - 2 * ppp, source_plane_z=13,
    )
    prof = _build_cpml_profiles_np(SHAPE, 12, dx, dt, cmax, 1e-5)
    return grid, prof


def bench_fluid_ct():
    import jax
    import jax.numpy as jnp

    from babelbrain_tpu.materials import map_hu_to_properties
    from babelbrain_tpu.ops.fdtd import _material_fields, sls_coefficients
    from babelbrain_tpu.ops.fdtd_pallas import simulate_fluid_pallas

    hu = np.linspace(300.0, 2100.0, 1023)
    rho, sos, att = map_hu_to_properties(hu, F0, "Webb-Marsac")
    mats = np.zeros((1026, 5))
    mats[0] = [1000.0, 1500.0, 0, 0, 0]
    mats[1] = [1116.0, 1537.0, 0, 2.99, 0]
    mats[2] = [1041.0, 1562.0, 0, 4.49, 0]
    mats[3:, 0] = rho
    mats[3:, 1] = sos
    mats[3:, 3] = att
    grid, prof = _grid_and_profiles(mats, include_shear=False)

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
    amp = jax.device_put(
        jnp.zeros(SHAPE[:2], jnp.float32).at[16:-16, 16:-16].set(60e3)
    )
    ph = jax.device_put(jnp.zeros(SHAPE[:2], jnp.float32))

    fn = jax.jit(
        functools.partial(
            simulate_fluid_pallas,
            grid=grid, profiles_np=prof, viscous=True,
            oz_scale=1.0 / (1000.0 * 1500.0), nb=2,
        )
    )
    sync = lambda out: float(np.asarray(out[0][0, 0, :2])[0])
    sync(fn(props, amp, ph))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        sync(fn(props, amp, ph))
        best = min(best, time.time() - t0)
    mcups = np.prod(SHAPE) / (best / grid.n_steps) / 1e6
    # baseline: this repo's measured XLA fluid path, ~1.8 Gcells/s
    _emit("fdtd_fluid_ct_mcells_per_s", mcups, "Mcells/s", 1800.0)


def bench_visco_label():
    import jax
    import jax.numpy as jnp

    from babelbrain_tpu.materials import material_array
    from babelbrain_tpu.ops.fdtd import _material_fields, sls_coefficients
    from babelbrain_tpu.ops.fdtd_pallas import simulate_visco_pallas

    mats = material_array(F0)  # water/cortical/trabecular/skin/brain order
    grid, prof = _grid_and_profiles(mats, include_shear=True)

    idx = np.zeros(SHAPE, np.uint16)
    idx[:, :, 60:70] = 3        # skin
    idx[:, :, 70:78] = 1        # cortical (shear)
    idx[:, :, 78:84] = 2        # trabecular (shear)
    idx[:, :, 84:88] = 1
    idx[:, :, 88:] = 4          # brain

    coefs = sls_coefficients(mats, F0, grid.dt)
    props = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in _material_fields(idx, coefs, has_shear=True).items()
    }
    from babelbrain_tpu.ops.fdtd import _build_indexed_materials

    mi, mt = _build_indexed_materials(coefs, idx, None, SHAPE[2])
    mi_d = jax.device_put(jnp.asarray(mi))
    mt_d = jax.device_put(jnp.asarray(mt))
    amp = jax.device_put(
        jnp.zeros(SHAPE[:2], jnp.float32).at[16:-16, 16:-16].set(60e3)
    )
    ph = jax.device_put(jnp.zeros(SHAPE[:2], jnp.float32))

    fn = jax.jit(
        functools.partial(
            simulate_visco_pallas,
            grid=grid, profiles_np=prof, viscous=True,
            oz_scale=1.0 / (1000.0 * 1500.0), nb=2,
        )
    )
    sync = lambda out: float(np.asarray(out[0][0, 0, :2])[0])
    pa = jnp.float32(0.0)
    run = lambda: sync(fn(props, amp, ph, pa, mat_idx=mi_d, mat_table=mt_d))
    run()
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    mcups = np.prod(SHAPE) / (best / grid.n_steps) / 1e6
    # baseline: this repo's measured XLA viscoelastic path, ~0.6 Gcells/s
    _emit("fdtd_visco_label_mcells_per_s", mcups, "Mcells/s", 600.0)


def bench_rayleigh():
    """Device-only Rayleigh throughput: times _rayleigh_blocks with the
    host prep done once and a tiny-slice readback as the sync point, so
    the metric is decoupled from the ~35 MB/s tunnel (the full
    rayleigh_field path adds an 8 MB device->host readback)."""
    import jax.numpy as jnp

    from babelbrain_tpu.ops.rayleigh import _rayleigh_blocks

    M, P = 16384, 1_048_576
    rng = np.random.default_rng(1)
    centers = rng.normal(0, 0.03, (M, 3)).astype(np.float32)
    centers[:, 2] -= 0.08
    areas = np.full(M, 1e-7, np.float64)
    u0 = np.exp(1j * rng.uniform(0, 2 * np.pi, M))
    pts = rng.normal(0, 0.04, (P, 3)).astype(np.float32)
    kr = 2 * np.pi * F0 / 1482.3
    w = u0 * areas * (1j * kr / (2.0 * np.pi))
    c_d = jnp.asarray(centers)
    wre = jnp.asarray(np.real(w), jnp.float32)
    wim = jnp.asarray(np.imag(w), jnp.float32)
    pts_d = jnp.asarray(pts)

    def run():
        out = _rayleigh_blocks(kr, 0.0, c_d, wre, wim, pts_d, 8192, 2048)
        return float(np.asarray(out[0, :2])[0])

    run()  # compile + warm
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    gpairs = M * P / best / 1e9
    # the blocked MXU evaluation IS the XLA path; no reference number exists
    _emit("rayleigh_gpairs_per_s", gpairs, "Gpairs/s", None)


def bench_bhte():
    import jax.numpy as jnp

    from babelbrain_tpu.materials import material_array, build_thermal_material_list
    from babelbrain_tpu.ops import bhte as B

    shape = (192, 192, 192)
    # pipeline label-mode order (Water, Skin, Cortical, Trabecular, Brain)
    acoustic = material_array(
        F0, tissues=("Water", "Skin", "Cortical", "Trabecular", "Brain")
    )
    mats = build_thermal_material_list(
        acoustic, ct_mode=False, segmented_brain=False
    )
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 60:70] = 1   # skin
    idx[:, :, 70:88] = 2   # cortical
    idx[:, :, 88:] = 4     # brain
    p = np.zeros(shape, np.float32)
    p[80:110, 80:110, 110:150] = 1e6
    dt, dx = 0.01, 1482.3 / F0 / PPW

    Q = np.stack([B.absorption_heating(p, idx, mats, 0.3),
                  np.zeros(shape, np.float32)])
    coeff = {k: jnp.asarray(v)
             for k, v in B._build_coeff_maps(idx, mats, dx, dt).items()}
    t0f = np.asarray(mats.init_temperature, np.float64)[idx]
    T0 = jnp.asarray(t0f, jnp.float32)
    dose0 = jnp.zeros(shape, jnp.float32)
    mon = jnp.zeros(1, jnp.int32)
    tart = jnp.float32(37.0)
    Qj = jnp.asarray(Q)

    def run(n):
        fs = jnp.zeros(n, jnp.int32)
        on = jnp.ones(n, jnp.bool_)
        out = B._bhte_scan(T0, dose0, Qj, fs, on, coeff, mon, tart, n)
        return float(np.asarray(out[0][0, 0, :2])[0])

    n1, n2 = 50, 350
    run(n1); run(n2)  # compile both lengths
    best = np.inf
    for _ in range(3):
        t0 = time.time(); run(n1); ta = time.time() - t0
        t0 = time.time(); run(n2); tb = time.time() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    mcups = np.prod(shape) / best / 1e6
    # the XLA scan IS the production path; no reference number exists
    _emit("bhte_mcells_per_s", mcups, "Mcells/s", None)


def bench_bhte_pallas():
    """Fused K-step Pallas BHTE (`ops.bhte_pallas`): one streaming sweep
    advances K timesteps with the coefficient maps stashed in VMEM."""
    import jax
    import jax.numpy as jnp

    from babelbrain_tpu.materials import (
        build_thermal_material_list,
        material_array,
    )
    from babelbrain_tpu.ops import bhte as B
    from babelbrain_tpu.ops.bhte_pallas import (
        _bhteK_auto,
        bhte_segment_pallas,
    )

    shape = (192, 192, 192)
    acoustic = material_array(
        F0, tissues=("Water", "Skin", "Cortical", "Trabecular", "Brain")
    )
    mats = build_thermal_material_list(
        acoustic, ct_mode=False, segmented_brain=False
    )
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 60:70] = 1
    idx[:, :, 70:88] = 2
    idx[:, :, 88:] = 4
    p = np.zeros(shape, np.float32)
    p[80:110, 80:110, 110:150] = 1e6
    dt, dx = 0.01, 1482.3 / F0 / PPW
    Q = jnp.asarray(B.absorption_heating(p, idx, mats, 0.3))
    coeff = {k: jnp.asarray(v)
             for k, v in B._build_coeff_maps(idx, mats, dx, dt).items()}
    km = coeff["k"]
    hm, sh = B._harmonic_mean, B._shift
    i2 = coeff["inv_dx2"]
    c6 = [hm(km, sh(km, 1, 0)) * i2, hm(km, sh(km, -1, 0)) * i2,
          hm(km, sh(km, 1, 1)) * i2, hm(km, sh(km, -1, 1)) * i2,
          hm(km, sh(km, 1, 2)) * i2, hm(km, sh(km, -1, 2)) * i2,
          coeff["inv_rho_cp_dt"], coeff["perf_dt"]]
    c6 = [jax.device_put(c) for c in c6]
    t0f = np.asarray(mats.init_temperature, np.float64)[idx]
    T0 = jax.device_put(jnp.asarray(t0f, jnp.float32))
    dose0 = jax.device_put(jnp.zeros(shape, jnp.float32))
    peak0 = jax.device_put(jnp.full(shape, -1e9, jnp.float32))
    mon = jnp.zeros(1, jnp.int32)
    K = min(_bhteK_auto(shape, 4), 5)

    def run(n):
        out = bhte_segment_pallas(
            T0, dose0, peak0, Q, c6, n, 37.0, mon, nb=4, fuse_steps=K,
        )
        return float(np.asarray(out[0][0, 0, :2])[0])

    n1, n2 = 5 * K, 45 * K
    run(n1); run(n2)
    best = np.inf
    for _ in range(3):
        t0 = time.time(); run(n1); ta = time.time() - t0
        t0 = time.time(); run(n2); tb = time.time() - t0
        best = min(best, (tb - ta) / (n2 - n1))
    mcups = np.prod(shape) / best / 1e6
    # baseline: this repo's measured XLA BHTE scan, ~9.6 Gcells/s
    _emit("bhte_pallas_mcells_per_s", mcups, "Mcells/s", 9600.0)


def bench_visco_narrow():
    """Label-mode viscoelastic FDTD on a tight-narrow-beam grid
    (192x128x192): the plane cross-section is small enough for the K=4
    fused visco kernel to fit VMEM (the 192x240 headline shape caps at
    K=2 — the chip's 128 MB VMEM bounds the 15-field ring set)."""
    import jax
    import jax.numpy as jnp

    from babelbrain_tpu.materials import material_array
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _material_fields,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops.fdtd_pallas import simulate_visco_pallas

    shape = (192, 128, 192)
    mats = material_array(F0)
    cmax = mats[:, 1:3].max()
    dx = 1482.3 / F0 / PPW
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, cfl=0.5)))
    dt = 1 / F0 / ppp
    n_steps = 42 * ppp
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=n_steps, frequency=F0,
        sensor_start=n_steps - 2 * ppp, source_plane_z=13,
    )
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, cmax, 1e-5)
    idx = np.zeros(shape, np.uint16)
    idx[:, :, 60:70] = 3
    idx[:, :, 70:78] = 1
    idx[:, :, 78:84] = 2
    idx[:, :, 84:88] = 1
    idx[:, :, 88:] = 4
    coefs = sls_coefficients(mats, F0, grid.dt)
    props = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in _material_fields(idx, coefs, has_shear=True).items()
    }
    from babelbrain_tpu.ops.fdtd import _build_indexed_materials

    # N3=192 tiles the 128-lane gather windows with 33% overlap, so the
    # builder rejects indexed mode here (measured slower); mirror the
    # production run_fdtd decision
    built = _build_indexed_materials(coefs, idx, None, shape[2])
    mkw = {}
    if built is not None:
        mkw = dict(mat_idx=jax.device_put(jnp.asarray(built[0])),
                   mat_table=jax.device_put(jnp.asarray(built[1])))
    amp = jax.device_put(
        jnp.zeros(shape[:2], jnp.float32).at[16:-16, 16:-16].set(60e3)
    )
    ph = jax.device_put(jnp.zeros(shape[:2], jnp.float32))
    fn = jax.jit(
        functools.partial(
            simulate_visco_pallas,
            grid=grid, profiles_np=prof, viscous=True,
            oz_scale=1.0 / (1000.0 * 1500.0), nb=2,
        )
    )
    sync = lambda out: float(np.asarray(out[0][0, 0, :2])[0])
    pa = jnp.float32(0.0)
    run = lambda: sync(fn(props, amp, ph, pa, **mkw))
    run()
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        run()
        best = min(best, time.time() - t0)
    mcups = np.prod(shape) / (best / grid.n_steps) / 1e6
    # baseline: this repo's measured XLA viscoelastic path, ~0.6 Gcells/s
    _emit("fdtd_visco_narrow_mcells_per_s", mcups, "Mcells/s", 600.0)


ALL = {
    "fdtd_fluid_ct": bench_fluid_ct,
    "fdtd_visco_label": bench_visco_label,
    "fdtd_visco_narrow": bench_visco_narrow,
    "rayleigh": bench_rayleigh,
    "bhte": bench_bhte,
    "bhte_pallas": bench_bhte_pallas,
}




def bench_dome():
    """Dome volumetric-source FDTD (the reference's heaviest documented
    workload class, `README.md:80`): in-kernel volumetric drive on the
    FLUID fusedK kernel (CT-mode dome media are zero-shear fluid,
    `BabelIntegrationBASE.py:1343-1351`; round 4 promoted them onto the
    15-field visco kernel at ~3.7 Gcells/s — the acoustic system is ~3x
    cheaper per cell and fuses deeper)."""
    import jax
    import jax.numpy as jnp

    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _material_fields,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops.fdtd_pallas import simulate_fluid_pallas

    shape = (192, 192, 192)
    mats = np.array([[1000.0, 1500.0, 0.0, 4.0, 0.0]])
    cmax = mats[0, 1]
    dx = 1482.3 / F0 / PPW
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, cfl=0.5)))
    dt = 1 / F0 / ppp
    # 42 cycles like the fluid entry: at 20 cycles the per-run dispatch
    # overhead through the tunnel was ~15% of the measured time
    n_steps = 42 * ppp
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=n_steps, frequency=F0,
        sensor_start=n_steps - 2 * ppp, source_plane_z=13,
        source_type="velocity_volume",
    )
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, cmax, 1e-5)
    idx = np.zeros(shape, np.uint16)
    coefs = sls_coefficients(mats, F0, grid.dt)
    # fluid (4-field) properties: the acoustic system the CT dome runs
    props = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in _material_fields(idx, coefs, has_shear=False).items()
    }
    # hemispheric shell of velocity sources around the focus
    ii, jj, kk = np.mgrid[0:shape[0], 0:shape[1], 0:shape[2]]
    c = np.array(shape) / 2.0
    r = np.sqrt((ii - c[0]) ** 2 + (jj - c[1]) ** 2 + (kk - c[2]) ** 2)
    shell = (np.abs(r - 80.0) < 1.0) & (kk < c[2])
    amp3 = np.where(shell, 60e3, 0.0).astype(np.float32)
    nrm = np.stack([c[0] - ii, c[1] - jj, c[2] - kk]) / (r + 1e-6)
    vsrc = {
        "amp": jnp.asarray(amp3),
        "phase": jnp.zeros(shape, jnp.float32),
        "ox": jnp.asarray(nrm[0].astype(np.float32)),
        "oy": jnp.asarray(nrm[1].astype(np.float32)),
        "oz": jnp.asarray(nrm[2].astype(np.float32)),
    }
    zeros2 = jnp.zeros(shape[:2], jnp.float32)
    fn = jax.jit(
        functools.partial(
            simulate_fluid_pallas,
            grid=grid, profiles_np=prof, viscous=True,
            oz_scale=1.0 / (1000.0 * 1500.0), nb=2, volume_source=vsrc,
        )
    )
    sync = lambda out: float(np.asarray(out[0][0, 0, :2])[0])
    sync(fn(props, zeros2, zeros2))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        sync(fn(props, zeros2, zeros2))
        best = min(best, time.time() - t0)
    mcups = np.prod(shape) / (best / grid.n_steps) / 1e6
    # baseline: this repo's measured XLA fluid volumetric path, ~1.8 Gcells/s
    _emit("fdtd_dome_volumetric_mcells_per_s", mcups, "Mcells/s", 1800.0)


ALL["fdtd_dome"] = bench_dome


def main():
    names = sys.argv[1:] or list(ALL)
    for n in names:
        ALL[n]()


if __name__ == "__main__":
    main()
