#!/usr/bin/env python
"""Headline benchmark: viscoelastic FDTD cell-update throughput on one chip.

Runs the full through-skull configuration (viscous + shear, CPML, CW source,
in-kernel carrier DFT) on a clinically-sized grid at 6 PPW and reports
Mcell-updates/s. The reference publishes no throughput numbers
(BASELINE.md), so ``vs_baseline`` is measured against an estimated
single-GPU BabelViscoFDTD rate of ~1000 Mcells/s (8 GB-class GPU, the
reference's stated hardware floor).

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

import json
import sys
import time

import numpy as np


def main():
    sys.path.insert(0, "/root/repo")
    import jax

    from babelbrain_tpu.ops.fdtd import FDTDGrid, run_fdtd, stable_dt
    from babelbrain_tpu.materials import material_array

    F0 = 500e3
    PPW = 6.0
    mats = material_array(
        F0, ("Water", "Skin", "Cortical", "Trabecular", "Brain")
    )
    cmin = 1345.0  # trabecular shear at 500 kHz (grid-setting minimum)
    cmax = mats[:, 1:3].max()
    dx = cmin / F0 / PPW
    ppp = int(np.ceil(1 / F0 / stable_dt(dx, cmax, cfl=0.5)))
    dt = 1 / F0 / ppp

    shape = (256, 256, 256)
    n_cells = int(np.prod(shape))

    # layered head-like phantom: water / skin / skull / brain along z
    idx = np.zeros(shape, np.uint8)
    idx[:, :, 60:70] = 1
    idx[:, :, 70:76] = 2
    idx[:, :, 76:82] = 3
    idx[:, :, 82:88] = 2
    idx[:, :, 88:] = 4

    warm_steps = ppp
    bench_steps = ppp * 4

    amp = np.zeros(shape[:2], np.float32)
    amp[16:-16, 16:-16] = 60e3

    def run(n_steps):
        grid = FDTDGrid(
            shape=shape,
            dx=dx,
            dt=dt,
            n_steps=n_steps,
            frequency=F0,
            sensor_start=max(0, n_steps - 2 * ppp),
            source_plane_z=13,
        )
        return run_fdtd(idx, mats, grid, source_amp=amp, source_phase=np.zeros(shape[:2]))

    # warmup / compile
    run(warm_steps)
    t0 = time.time()
    run(warm_steps)
    t_warm = time.time() - t0
    t0 = time.time()
    run(bench_steps)
    t_bench = time.time() - t0
    # subtract fixed overhead (host prep + transfers) via two-point measure
    step_time = (t_bench - t_warm) / (bench_steps - warm_steps)
    mcups = n_cells / step_time / 1e6

    baseline_mcups = 1000.0  # single-GPU BabelViscoFDTD estimate (no published number)
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
