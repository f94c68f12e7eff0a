"""Fused single-sweep fluid kernel: interpret-mode parity vs the XLA solver.

The fused kernel (ops.fdtd_pallas.build_fluid_fused_step) computes the
velocity AND pressure half-steps in one streaming pass; it must stay
numerically equivalent to ops/fdtd.py (the source of truth) and to the
two-kernel pipeline. Runs the Pallas interpreter on the CPU mesh.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


@pytest.mark.slow
def test_fused_matches_xla_interpret():
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _material_fields,
        run_fdtd,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (32, 32, 64)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 6
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_plane_z=13,
    )
    mats = np.array([[1000.0, C, 0.0, 20.0, 0.0]])
    idx = np.zeros(shape, np.uint8)
    amp = np.zeros(shape[:2])
    amp[8:-8, 8:-8] = 60e3
    ph = np.random.default_rng(5).uniform(-2, 2, shape[:2])
    o_x = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                   backend="xla")

    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jnp.asarray(v)
        for k, v in _material_fields(idx, coefs, has_shear=False).items()
    }
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, C, 1e-5)
    out = fp.simulate_fluid_pallas(
        props, jnp.asarray(amp, jnp.float32), jnp.asarray(ph, jnp.float32),
        grid=grid, profiles_np=prof, viscous=True,
        oz_scale=1.0 / (1000.0 * C), nb=4, interpret=True,
    )
    acc_c, acc_s, _ = (np.asarray(o) for o in out)
    n_win = ns - grid.sensor_start
    p_amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
    reg = (slice(2, -2),) * 3
    scale = o_x["p_amp"][reg].max()
    np.testing.assert_allclose(
        p_amp[reg], o_x["p_amp"][reg], atol=scale * 1e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_fusedK_matches_xla_interpret():
    """Deep temporal blocking (K=3 steps/sweep) vs the XLA solver.

    Exercises the fusedK quiet phase, the fused2 remainder/DFT phase, and
    the 1-step tail in one run (quiet count not divisible by 3).
    """
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _material_fields,
        run_fdtd,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (32, 32, 64)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 6
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_plane_z=13,
    )
    mats = np.array([[1000.0, C, 0.0, 20.0, 0.0]])
    idx = np.zeros(shape, np.uint8)
    amp = np.zeros(shape[:2])
    amp[8:-8, 8:-8] = 60e3
    ph = np.random.default_rng(5).uniform(-2, 2, shape[:2])
    o_x = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                   backend="xla")

    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jnp.asarray(v)
        for k, v in _material_fields(idx, coefs, has_shear=False).items()
    }
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, C, 1e-5)
    out = fp.simulate_fluid_pallas(
        props, jnp.asarray(amp, jnp.float32), jnp.asarray(ph, jnp.float32),
        grid=grid, profiles_np=prof, viscous=True,
        oz_scale=1.0 / (1000.0 * C), nb=2, interpret=True, fuse_steps=3,
    )
    acc_c, acc_s, _ = (np.asarray(o) for o in out)
    n_win = ns - grid.sensor_start
    p_amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
    reg = (slice(2, -2),) * 3
    scale = o_x["p_amp"][reg].max()
    np.testing.assert_allclose(
        p_amp[reg], o_x["p_amp"][reg], atol=scale * 1e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_visco_fused_matches_xla_interpret():
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _material_fields,
        run_fdtd,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (32, 32, 64)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, 2494.0, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 5
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_plane_z=13,
    )
    mats = np.array(
        [[1000.0, C, 0.0, 20.0, 0.0], [1896.5, 2494.0, 1594.0, 106.0, 214.0]]
    )
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 30:38] = 1
    amp = np.zeros(shape[:2])
    amp[8:-8, 8:-8] = 60e3
    ph = np.random.default_rng(5).uniform(-2, 2, shape[:2])
    o_x = run_fdtd(idx, mats, grid, source_amp=amp, source_phase=ph,
                   backend="xla")

    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jnp.asarray(v)
        for k, v in _material_fields(idx, coefs, has_shear=True).items()
    }
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, 2494.0, 1e-5)
    out = fp.simulate_visco_pallas(
        props, jnp.asarray(amp, jnp.float32), jnp.asarray(ph, jnp.float32),
        jnp.float32(0.0), grid=grid, profiles_np=prof, viscous=True,
        oz_scale=1.0 / (1000.0 * C), nb=4, interpret=True,
    )
    acc_c, acc_s, _ = (np.asarray(o) for o in out)
    n_win = ns - grid.sensor_start
    p_amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
    reg = (slice(2, -2),) * 3
    scale = o_x["p_amp"][reg].max()
    np.testing.assert_allclose(
        p_amp[reg], o_x["p_amp"][reg], atol=scale * 2e-4, rtol=1e-3
    )


@pytest.mark.slow
def test_fluid_point_source_pallas_matches_xla():
    """Fluid stress-point source (CT-mode refocus backprop,
    `BabelIntegrationBASE.py:2374`) through the fusedK in-kernel injection
    plus the 1-step post-correction tail: bit-parity vs the XLA solver."""
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _material_fields,
        run_fdtd,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (32, 32, 64)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 4
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_plane_z=13,
        source_type="stress_point", source_ijk=(17, 15, 40),
    )
    mats = np.array([[1000.0, C, 0.0, 20.0, 0.0]])
    idx = np.zeros(shape, np.uint8)
    pamp = 50e3
    o_x = run_fdtd(idx, mats, grid, point_amp=pamp, backend="xla")

    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jnp.asarray(v)
        for k, v in _material_fields(idx, coefs, has_shear=False).items()
    }
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, C, 1e-5)
    zeros2 = jnp.zeros(shape[:2], jnp.float32)
    out = fp.simulate_fluid_pallas(
        props, zeros2, zeros2, jnp.float32(pamp),
        grid=grid, profiles_np=prof, viscous=True,
        oz_scale=1.0 / (1000.0 * C), nb=2, interpret=True, fuse_steps=3,
    )
    acc_c, acc_s, peak = (np.asarray(o) for o in out)
    n_win = ns - grid.sensor_start
    p_amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
    scale = o_x["p_amp"].max()
    np.testing.assert_allclose(p_amp, o_x["p_amp"], atol=scale * 1e-6)
    np.testing.assert_allclose(peak, o_x["peak"], atol=scale * 1e-6)


@pytest.mark.slow
def test_reflector_fold_pallas_matches_xla():
    """Air-cavity reflector (`BabelIntegrationBASE.py:2365`) folded into
    the modulus fields: the fused Pallas kernels and the XLA path agree,
    and the cavity voxels carry exactly zero pressure."""
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _fold_reflector,
        _material_fields,
        run_fdtd,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (32, 32, 64)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 4
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_plane_z=13,
    )
    mats = np.array([[1000.0, C, 0.0, 20.0, 0.0]])
    idx = np.zeros(shape, np.uint8)
    amp = np.zeros(shape[:2])
    amp[6:-6, 6:-6] = 60e3
    refl = np.zeros(shape, bool)
    refl[:, :, 44:48] = True
    o_x = run_fdtd(idx, mats, grid, source_amp=amp, reflector_mask=refl,
                   backend="xla")

    coefs = sls_coefficients(mats, F0, dt)
    props_np = _material_fields(idx, coefs, has_shear=False)
    _fold_reflector(props_np, refl, False)
    props = {k: jnp.asarray(v) for k, v in props_np.items()}
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, C, 1e-5)
    out = fp.simulate_fluid_pallas(
        props, jnp.asarray(amp, jnp.float32),
        jnp.zeros(shape[:2], jnp.float32),
        grid=grid, profiles_np=prof, viscous=True,
        oz_scale=1.0 / (1000.0 * C), nb=2, interpret=True, fuse_steps=3,
    )
    acc_c, acc_s, _ = (np.asarray(o) for o in out)
    n_win = ns - grid.sensor_start
    p_amp = 2.0 / n_win * np.sqrt(acc_c**2 + acc_s**2)
    scale = o_x["p_amp"].max()
    np.testing.assert_allclose(p_amp, o_x["p_amp"], atol=scale * 1e-5)
    assert p_amp[refl].max() == 0.0
    # transmission beyond the cavity is blocked
    assert o_x["p_amp"][:, :, 50:].max() < 1e-3 * scale


def test_dome_volume_source_fluid_pallas_matches_xla():
    """Zero-shear (CT-mode) dome volumetric drive on the FLUID fusedK
    kernel (in-kernel per-voxel velocity injection) vs the XLA solver.
    This is the path the reference's heaviest documented workload takes
    (670 kHz DomeTx + CT, `README.md:80`,
    `BabelIntegrationDOME_PHASEDARRAY.py:344-407`): CT media are
    zero-shear (`BabelIntegrationBASE.py:1343-1351`), so the dome runs
    the acoustic system, not the 15-field viscoelastic one."""
    from babelbrain_tpu.ops.fdtd import FDTDGrid, run_fdtd, stable_dt

    F0, C = 500e3, 1500.0
    shape = (48, 48, 48)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, 2494.0, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 3
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_type="velocity_volume",
    )
    # zero-shear media only (water + CT-like bone without shear)
    mats = np.array([
        [1000.0, C, 0.0, 20.0, 0.0],
        [1896.0, 2494.0, 0.0, 150.0, 0.0],
    ])
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 30:36] = 1
    rng = np.random.default_rng(4)
    ii, jj, kk = np.mgrid[0:48, 0:48, 0:48]
    r = np.sqrt((ii - 24.0) ** 2 + (jj - 24.0) ** 2 + (kk - 24.0) ** 2)
    shell = (r > 14) & (r < 16) & (kk < 24)
    amp3 = np.where(shell, 60e3, 0.0).astype(np.float32)
    ph3 = (rng.uniform(-2, 2, shape) * shell).astype(np.float32)
    rr = np.maximum(r, 1e-6)
    vs = dict(
        amp=amp3, phase=ph3,
        ox=((24.0 - ii) / rr).astype(np.float32),
        oy=((24.0 - jj) / rr).astype(np.float32),
        oz=((24.0 - kk) / rr).astype(np.float32),
    )
    o_x = run_fdtd(idx, mats, grid, volume_source=vs, backend="xla")
    o_p = run_fdtd(idx, mats, grid, volume_source=vs, backend="pallas")
    scale = o_x["p_amp"].max()
    assert scale > 0
    np.testing.assert_allclose(o_p["p_amp"], o_x["p_amp"],
                               atol=scale * 1e-5)
    np.testing.assert_allclose(o_p["peak"], o_x["peak"], atol=scale * 1e-5)


@pytest.mark.slow
def test_dome_volume_source_pallas_matches_xla():
    """Dome volumetric velocity sources
    (`BabelIntegrationDOME_PHASEDARRAY.py:344-407` capability) on the fused
    visco Pallas kernel vs the XLA solver."""
    from babelbrain_tpu.ops.fdtd import FDTDGrid, run_fdtd, stable_dt

    F0, C = 500e3, 1500.0
    shape = (48, 48, 48)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, 2494.0, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 3
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_type="velocity_volume",
    )
    mats = np.array([
        [1000.0, C, 0.0, 20.0, 0.0],
        [1896.0, 2494.0, 1500.0, 150.0, 300.0],
    ])
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 30:36] = 1
    rng = np.random.default_rng(4)
    ii, jj, kk = np.mgrid[0:48, 0:48, 0:48]
    r = np.sqrt((ii - 24.0) ** 2 + (jj - 24.0) ** 2 + (kk - 24.0) ** 2)
    shell = (r > 14) & (r < 16) & (kk < 24)
    amp3 = np.where(shell, 60e3, 0.0).astype(np.float32)
    ph3 = (rng.uniform(-2, 2, shape) * shell).astype(np.float32)
    rr = np.maximum(r, 1e-6)
    vs = dict(
        amp=amp3, phase=ph3,
        ox=((24.0 - ii) / rr).astype(np.float32),
        oy=((24.0 - jj) / rr).astype(np.float32),
        oz=((24.0 - kk) / rr).astype(np.float32),
    )
    o_x = run_fdtd(idx, mats, grid, volume_source=vs, backend="xla")
    o_p = run_fdtd(idx, mats, grid, volume_source=vs, backend="pallas")
    scale = o_x["p_amp"].max()
    np.testing.assert_allclose(o_p["p_amp"], o_x["p_amp"],
                               atol=scale * 1e-5)
    np.testing.assert_allclose(o_p["peak"], o_x["peak"], atol=scale * 1e-5)


def test_visco_indexed_materials_bitexact():
    """Indexed-material fusedK kernels (int32 index + in-kernel table
    gather) must be BIT-equal to the expanded-volume kernels — the gather
    returns the same f32 coefficients the host-side expansion produces
    (label-mode material-table contract, `BabelIntegrationBASE.py:1357-1377`)."""
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _build_indexed_materials,
        _fold_reflector,
        _material_fields,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (32, 32, 64)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, 2494.0, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 2
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - ppp, source_plane_z=13,
    )
    mats = np.array(
        [[1000.0, C, 0.0, 20.0, 0.0], [1896.5, 2494.0, 1594.0, 106.0, 214.0],
         [1116.0, 1537.0, 0.0, 2.99, 0.0]]
    )
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 30:38] = 1
    idx[:, :, 38:42] = 2
    refl = np.zeros(shape, bool)
    refl[10:20, 10:20, 50:53] = True
    amp = np.zeros(shape[:2])
    amp[8:-8, 8:-8] = 60e3
    ph = np.random.default_rng(5).uniform(-2, 2, shape[:2])

    coefs = sls_coefficients(mats, F0, dt)
    props_np = _material_fields(idx, coefs, has_shear=True)
    _fold_reflector(props_np, refl, True)
    props = {k: jnp.asarray(v) for k, v in props_np.items()}
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, 2494.0, 1e-5)

    common = dict(
        grid=grid, profiles_np=prof, viscous=True,
        oz_scale=1.0 / (1000.0 * C), nb=2, interpret=True, fuse_steps=2,
    )
    ref = fp.simulate_visco_pallas(
        props, jnp.asarray(amp, jnp.float32), jnp.asarray(ph, jnp.float32),
        jnp.float32(0.0), **common,
    )
    mi, mt = _build_indexed_materials(coefs, idx, refl, shape[2])
    got = fp.simulate_visco_pallas(
        props, jnp.asarray(amp, jnp.float32), jnp.asarray(ph, jnp.float32),
        jnp.float32(0.0), mat_idx=jnp.asarray(mi), mat_table=jnp.asarray(mt),
        **common,
    )
    for a, b, nm in zip(ref, got, ("acc_c", "acc_s", "peak")):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b), err_msg=nm)
    # reflector voxels carry exactly zero pressure on both paths
    n_win = ns - grid.sensor_start
    p_amp = 2.0 / n_win * np.sqrt(
        np.asarray(got[0]) ** 2 + np.asarray(got[1]) ** 2
    )
    assert p_amp[refl].max() == 0.0
    assert p_amp.max() > 0


def test_vmem_fallback_retries_then_succeeds():
    """`_pallas_with_vmem_fallback` must decrement K on Mosaic VMEM OOMs
    and re-raise anything else (robust auto-K, VERDICT r3 task 9)."""
    from babelbrain_tpu.ops.fdtd import _pallas_with_vmem_fallback

    calls = []

    def flaky(shrink):
        calls.append(shrink)
        if shrink < 2:
            raise RuntimeError(
                "INTERNAL: Mosaic failed to compile TPU kernel: Ran out of "
                "memory in memory space vmem"
            )
        return "ok"

    assert _pallas_with_vmem_fallback(flaky) == "ok"
    assert calls == [0, 1, 2]

    def broken(shrink):
        raise ValueError("some unrelated error")

    with pytest.raises(ValueError, match="unrelated"):
        _pallas_with_vmem_fallback(broken)

    def always_oom(shrink):
        raise RuntimeError("Ran out of memory in memory space vmem")

    with pytest.raises(RuntimeError, match="vmem"):
        _pallas_with_vmem_fallback(always_oom, max_shrink=1)


def test_k_shrink_reduces_auto_depth():
    """k_shrink lowers the auto-selected fused depth and the shallower
    sweep stays bit-equal (it is the same update applied in smaller
    groups)."""
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _material_fields,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (32, 32, 32)  # caps auto-K at ~5 so the interpret builds stay fast
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
    dt = 1 / F0 / ppp
    ns = 18  # one-ish fused sweep per depth: keeps this in the fast tier
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns, source_plane_z=13,
    )
    mats = np.array([[1000.0, C, 0.0, 20.0, 0.0]])
    idx = np.zeros(shape, np.uint8)
    amp = np.zeros(shape[:2])
    amp[4:-4, 4:-4] = 60e3
    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jnp.asarray(v)
        for k, v in _material_fields(idx, coefs, has_shear=False).items()
    }
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, C, 1e-5)
    zeros2 = jnp.zeros(shape[:2], jnp.float32)
    outs = {}
    for shrink in (0, 2):
        outs[shrink] = fp.simulate_fluid_pallas(
            props, jnp.asarray(amp, jnp.float32), zeros2, jnp.float32(0.0),
            grid=grid, profiles_np=prof, viscous=True,
            oz_scale=1.0 / (1000.0 * C), nb=2, interpret=True,
            k_shrink=shrink,
        )
    for a, b in zip(outs[0], outs[2]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pressure_maps_and_monitor_on_pallas_fast_path():
    """Pressure_rms / Pressure_peak sel_maps and monitor capture fused into
    the fluid fusedK DFT kernel (VERDICT r3 task 5): parity vs the XLA
    path without leaving the Pallas backend."""
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        run_fdtd,
        stable_dt,
    )

    F0, C = 500e3, 1500.0
    shape = (64, 32, 64)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, C, 0.9)))
    dt = 1 / F0 / ppp
    # short window divisible by 3 for the fused capture (fast tier)
    n_win = (ppp // 3) * 3
    ns = ppp * 2 + n_win
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - n_win, source_plane_z=13,
    )
    mats = np.array([[1000.0, C, 0.0, 20.0, 0.0]])
    idx = np.zeros(shape, np.uint8)
    amp = np.zeros(shape[:2])
    amp[8:-8, 8:-8] = 60e3
    mon = np.array([[32, 16, 40], [20, 10, 30]])
    kw = dict(
        source_amp=amp,
        sel_maps=("Pressure_rms", "Pressure_peak"),
        monitor_ijk=mon,
    )
    o_x = run_fdtd(idx, mats, grid, backend="xla",
                   sensor_subsampling=1, **kw)
    o_p = run_fdtd(idx, mats, grid, backend="pallas", **kw)

    scale = o_x["p_amp"].max()
    np.testing.assert_allclose(
        o_p["p_amp"], o_x["p_amp"], atol=scale * 1e-6
    )
    np.testing.assert_allclose(
        o_p["Pressure_rms"], o_x["Pressure_rms"], atol=scale * 1e-6
    )
    np.testing.assert_allclose(
        o_p["Pressure_peak"], o_x["Pressure_peak"], atol=scale * 1e-6
    )
    # monitor series: the pallas cadence is the fused depth; the XLA run
    # with subsampling 1 must agree exactly at the emitted sample times
    steps_p = np.round(o_p["sensor_times"] / dt).astype(int)
    steps_x = np.round(o_x["sensor_times"] / dt).astype(int)
    pos = np.searchsorted(steps_x, steps_p)
    assert np.all(steps_x[pos] == steps_p)
    np.testing.assert_allclose(
        o_p["sensor_series"], o_x["sensor_series"][:, pos],
        atol=scale * 1e-6,
    )


def test_visco_ysplit_bitexact():
    """Sequential y-tiled visco fusedK driver (overlap-and-discard along
    y, `_simulate_visco_pallas_ysplit_fused`): owned columns must be
    BIT-exact vs the unsplit fusedK kernel at the same depth. The split
    is what buys label mode — the default non-CT clinical mode
    (`BabelIntegrationBASE.py:1357-1377`) — fused depths K>=4 at clinical
    cross-sections where the 15-field rings otherwise cap K at 2."""
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _material_fields,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (48, 32, 48)
    npml = 8
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, 2494.0, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 2
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0, npml=npml,
        sensor_start=ns - ppp, source_plane_z=npml + 1,
    )
    mats = np.array(
        [[1000.0, C, 0, 20.0, 0], [1896.5, 2494.0, 1594.0, 106.0, 214.0]]
    )
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 28:36] = 1
    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jnp.asarray(v)
        for k, v in _material_fields(idx, coefs, True).items()
    }
    prof = _build_cpml_profiles_np(shape, npml, dx, dt, 2494.0, 1e-5)
    rng = np.random.default_rng(3)
    amp = np.zeros(shape[:2], np.float32)
    amp[8:-8, 6:26] = 60e3
    ph = rng.uniform(-3, 3, shape[:2]).astype(np.float32)
    oz = 1.0 / (1000.0 * C)
    o_ref = fp.simulate_visco_pallas(
        props, jnp.asarray(amp), jnp.asarray(ph), jnp.float32(0.0), grid,
        prof, True, oz, nb=2, interpret=True, fuse_steps=2,
    )
    o_ys = fp._simulate_visco_pallas_ysplit_fused(
        props, jnp.asarray(amp), jnp.asarray(ph), 0.0, grid, prof, True,
        oz, 2, True, 2, 8,
    )
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(o_ys[i]), np.asarray(o_ref[i])
        )


@pytest.mark.slow
def test_visco_ysplit_indexed_and_point_bitexact():
    """y-tiled visco driver with the production label-mode configuration
    (indexed materials) and with a refocusing stress-point source whose
    voxel sits INSIDE the tile-overlap band (both tiles must inject it
    for the halos to evolve like the neighbor's interior)."""
    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles_np,
        _build_indexed_materials,
        _material_fields,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.ops import fdtd_pallas as fp

    F0, C = 500e3, 1500.0
    shape = (64, 48, 48)
    dx = C / F0 / 9
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, 2494.0, 0.9)))
    dt = 1 / F0 / ppp
    ns = ppp * 3
    mats = np.array(
        [[1000.0, C, 0, 20.0, 0], [1896.5, 2494.0, 1594.0, 106.0, 214.0]]
    )
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 28:36] = 1
    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jnp.asarray(v)
        for k, v in _material_fields(idx, coefs, True).items()
    }
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, 2494.0, 1e-5)
    rng = np.random.default_rng(3)
    amp = np.zeros(shape[:2], np.float32)
    amp[10:-10, 8:40] = 60e3
    ph = rng.uniform(-3, 3, shape[:2]).astype(np.float32)
    oz = 1.0 / (1000.0 * C)
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_plane_z=13,
    )
    ind = _build_indexed_materials(coefs, idx, None, shape[2])
    mi, mt = jnp.asarray(ind[0]), jnp.asarray(ind[1])
    o_ref = fp.simulate_visco_pallas(
        props, jnp.asarray(amp), jnp.asarray(ph), jnp.float32(0.0), grid,
        prof, True, oz, nb=2, interpret=True, fuse_steps=2,
        mat_idx=mi, mat_table=mt,
    )
    o_ys = fp._simulate_visco_pallas_ysplit_fused(
        props, jnp.asarray(amp), jnp.asarray(ph), 0.0, grid, prof, True,
        oz, 2, True, 2, 8, mat_idx=mi, mat_table=mt,
    )
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(o_ys[i]), np.asarray(o_ref[i])
        )
    # stress point at j=25: inside tile 0's halo band AND tile 1's interior
    gp = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=ns, frequency=F0,
        sensor_start=ns - 2 * ppp, source_type="stress_point",
        source_ijk=(33, 25, 24),
    )
    z2 = jnp.zeros(shape[:2], jnp.float32)
    o_ref = fp.simulate_visco_pallas(
        props, z2, z2, jnp.float32(1e6), gp, prof, True, oz, nb=2,
        interpret=True, fuse_steps=2,
    )
    o_ys = fp._simulate_visco_pallas_ysplit_fused(
        props, z2, z2, 1e6, gp, prof, True, oz, 2, True, 2, 8,
    )
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(o_ys[i]), np.asarray(o_ref[i])
        )
