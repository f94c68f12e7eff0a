#!/usr/bin/env python
"""Headline benchmark: viscoelastic FDTD cell-update throughput on one chip.

Full through-skull configuration (viscous + shear, CPML, CW source,
in-kernel carrier DFT) at 6 PPW; reports Mcell-updates/s from a cached,
device-resident invocation (host->device transfers and compile excluded).
The reference publishes no throughput numbers (BASELINE.md); ``vs_baseline``
compares against a ~1000 Mcells/s single-GPU BabelViscoFDTD estimate (its
stated 8 GB-class hardware floor).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import functools
import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    import jax
    import jax.numpy as jnp

    from babelbrain_tpu.ops.fdtd import (
        FDTDGrid,
        _build_cpml_profiles,
        _material_fields,
        _simulate_local,
        sls_coefficients,
        stable_dt,
    )
    from babelbrain_tpu.materials import material_array
    from babelbrain_tpu.parallel.halo import DomainComm

    F0 = 500e3
    PPW = 6.0
    mats = material_array(F0, ("Water", "Skin", "Cortical", "Trabecular", "Brain"))
    cmax = mats[:, 1:3].max()
    dx = 1345.0 / F0 / PPW  # trabecular shear SoS sets the grid
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, cfl=0.5)))
    dt = 1 / F0 / ppp

    shape = (192, 192, 240)
    n_cells = int(np.prod(shape))
    n_steps = 3 * ppp

    idx = np.zeros(shape, np.uint8)
    idx[:, :, 60:70] = 1
    idx[:, :, 70:76] = 2
    idx[:, :, 76:82] = 3
    idx[:, :, 82:88] = 2
    idx[:, :, 88:] = 4

    grid = FDTDGrid(
        shape=shape,
        dx=dx,
        dt=dt,
        n_steps=n_steps,
        frequency=F0,
        sensor_start=max(0, n_steps - 2 * ppp),
        source_plane_z=13,
    )
    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in _material_fields(idx, coefs).items()
    }
    amp = np.zeros(shape[:2], np.float32)
    amp[16:-16, 16:-16] = 60e3
    amp_d = jax.device_put(jnp.asarray(amp))
    ph_d = jax.device_put(jnp.zeros(shape[:2], jnp.float32))

    fn = jax.jit(
        functools.partial(
            _simulate_local,
            grid=grid,
            profiles=_build_cpml_profiles(shape, 12, dx, dt, cmax, 1e-5),
            viscous=True,
            has_shear=True,
            oz_scale=1.0 / (1000.0 * 1500.0),
            comm=DomainComm(),
        )
    )

    # compile + warm
    out = fn(props, amp_d, ph_d, jnp.float32(0.0))
    jax.block_until_ready(out)
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        out = fn(props, amp_d, ph_d, jnp.float32(0.0))
        jax.block_until_ready(out)
        best = min(best, time.time() - t0)
    mcups = n_cells * n_steps / best / 1e6

    baseline_mcups = 1000.0  # single-GPU BabelViscoFDTD estimate (none published)
    print(
        json.dumps(
            {
                "metric": "fdtd_cell_updates_per_s_single_chip",
                "value": round(mcups, 1),
                "unit": "Mcells/s",
                "vs_baseline": round(mcups / baseline_mcups, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
