#!/usr/bin/env python
"""Headline benchmark: FDTD cell-update throughput on one TPU chip.

Measures the CT-mode production configuration (quantized-HU fluid media —
the reference disables shear for CT mapping, so this is the clinical
through-skull path) at 6 PPW with the Pallas streaming-slab kernels, using
the production sensor window: the carrier DFT only accumulates over the
last 2 cycles (`BabelIntegrationBASE.py:2108-2109`), so most timesteps run
the quiet-phase kernels that skip the accumulator streams entirely — in
production that is the auto-selected K=6 temporally-blocked sweep (six
leapfrog steps per HBM pass); the windowed steps run the 2-step sweep.

Timing methodology: full production-shaped run (42 cycles, window = last
2) timed with an 8-byte device->host readback as the sync point
(block_until_ready is unreliable on tunneled runtimes, and large readbacks
would pollute the measurement with tunnel bandwidth); ~30 ms dispatch
overhead is <2% of the ~3 s run.

The reference publishes no throughput numbers (BASELINE.md); ``vs_baseline``
compares against a ~1000 Mcells/s single-GPU BabelViscoFDTD estimate (its
stated 8 GB-class hardware floor).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import functools
import json
import os
import sys
import time

import numpy as np

# persistent compile cache: tunneled remote-compilation is slow, cache hits
# across invocations make reruns near-instant
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/repo/.jax_cache")


def main():
    sys.path.insert(0, "/root/repo")
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
    from babelbrain_tpu.materials import map_hu_to_properties

    F0 = 500e3
    PPW = 6.0
    # CT-mode material table: water + skin + brain + 1023 quantized-HU bone
    hu = np.linspace(300.0, 2100.0, 1023)
    rho, sos, att = map_hu_to_properties(hu, F0, "Webb-Marsac")
    mats = np.zeros((1026, 5))
    mats[0] = [1000.0, 1500.0, 0, 0, 0]
    mats[1] = [1116.0, 1537.0, 0, 2.99, 0]
    mats[2] = [1041.0, 1562.0, 0, 4.49, 0]
    mats[3:, 0] = rho
    mats[3:, 1] = sos
    mats[3:, 3] = att

    cmax = mats[:, 1].max()
    dx = 1482.3 / F0 / PPW
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, cfl=0.5)))
    dt = 1 / F0 / ppp

    shape = (192, 192, 240)
    n_cells = int(np.prod(shape))

    idx = np.zeros(shape, np.uint16)
    rng = np.random.default_rng(0)
    idx[:, :, 60:70] = 1
    idx[:, :, 70:88] = rng.integers(3, 1026, (192, 192, 18))
    idx[:, :, 88:] = 2

    coefs = sls_coefficients(mats, F0, dt)
    props = {
        k: jax.device_put(jnp.asarray(v))
        for k, v in _material_fields(idx, coefs, has_shear=False).items()
    }
    amp = jax.device_put(
        jnp.zeros(shape[:2], jnp.float32).at[16:-16, 16:-16].set(60e3)
    )
    ph = jax.device_put(jnp.zeros(shape[:2], jnp.float32))
    prof = _build_cpml_profiles_np(shape, 12, dx, dt, cmax, 1e-5)

    def sync(out):
        return float(np.asarray(out[0][0, 0, :2])[0])

    # production-shaped run: 42 cycles total (through-skull transit + ring-up
    # at this z-extent), carrier DFT over the last 2 cycles only
    n_steps = 42 * ppp
    grid = FDTDGrid(
        shape=shape, dx=dx, dt=dt, n_steps=n_steps, frequency=F0,
        sensor_start=n_steps - 2 * ppp, source_plane_z=13,
    )
    # nb=2 slabs let the auto-selected 6-step temporal-blocked kernel fit
    # VMEM (fuse_steps auto -> K=6 at this shape; ~2.3 HBM volumes/step)
    fn = jax.jit(
        functools.partial(
            simulate_fluid_pallas,
            grid=grid, profiles_np=prof, viscous=True,
            oz_scale=1.0 / (1000.0 * 1500.0), nb=2,
        )
    )
    sync(fn(props, amp, ph))
    best = np.inf
    for _ in range(3):
        t0 = time.time()
        sync(fn(props, amp, ph))
        best = min(best, time.time() - t0)
    step_time = best / n_steps
    mcups = n_cells / step_time / 1e6

    baseline_mcups = 1000.0  # single-GPU BabelViscoFDTD estimate (none published)
    print(
        json.dumps(
            {
                "metric": "fdtd_cell_updates_per_s_single_chip",
                "value": round(mcups, 1),
                "unit": "Mcells/s",
                "vs_baseline": round(mcups / baseline_mcups, 3),
                # measured A/K + B stage model at K -> inf (B = 12
                # ps/cell/step, bench_suite.CEILINGS): remaining headroom
                # as a percentage, not raw Gcells/s
                "pct_of_stage_ceiling": round(100.0 * mcups / 83300.0, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
