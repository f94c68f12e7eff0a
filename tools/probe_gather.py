"""Probe: Mosaic dynamic_gather support + cost for material-table lookup.

Tests jnp.take_along_axis inside a Pallas TPU kernel:
  axis=0 (sublane gather): out[i,j] = x[idx[i,j], j]  -> table height = sublane dim
  axis=1 (lane gather):    out[i,j] = x[i, idx[i,j]]  -> table width = lane dim

Run on the real chip:  python tools/probe_gather.py
"""
import functools
import time
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def kernel_axis0(idx_ref, tab_ref, out_ref, *, M):
    idx = idx_ref[...]          # (R, C) int32
    R, C = idx.shape
    tab = tab_ref[...]          # (M, 1) f32
    Mp = max(M, R)
    x = jnp.broadcast_to(tab, (M, C))
    if Mp > M:
        x = jnp.pad(x, ((0, Mp - M), (0, 0)))
    if Mp > R:
        idx = jnp.pad(idx, ((0, Mp - R), (0, 0)))
    g = jnp.take_along_axis(x, idx, axis=0)
    out_ref[...] = g[:R]


def kernel_axis1(idx_ref, tab_ref, out_ref, *, M):
    idx = idx_ref[...]          # (R, C) int32
    R, C = idx.shape
    tab = tab_ref[...]          # (1, M) f32
    Cp = max(M, C)
    x = jnp.broadcast_to(tab, (R, M))
    if Cp > M:
        x = jnp.pad(x, ((0, 0), (0, Cp - M)))
    if Cp > C:
        idx = jnp.pad(idx, ((0, 0), (0, Cp - C)))
    g = jnp.take_along_axis(x, idx, axis=1)
    out_ref[...] = g[:, :C]


def try_case(name, kern, R, C, M, tab_shape):
    rng = np.random.default_rng(0)
    idx = rng.integers(0, M, size=(R, C)).astype(np.int32)
    tab = rng.standard_normal(tab_shape).astype(np.float32)
    f = pl.pallas_call(
        functools.partial(kern, M=M),
        out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32),
    )
    try:
        out = np.asarray(jax.jit(f)(jnp.asarray(idx), jnp.asarray(tab)))
        ref = tab.reshape(-1)[idx]
        ok = np.array_equal(out, ref)
        print(f"{name} R={R} C={C} M={M}: {'OK' if ok else 'WRONG VALUES'}")
        return ok
    except Exception as e:
        msg = str(e).split("\n")[0][:140]
        print(f"{name} R={R} C={C} M={M}: FAIL {type(e).__name__}: {msg}")
        return False


def main():
    print("devices:", jax.devices())
    # sublane gather (axis=0)
    for (R, C, M) in [(8, 128, 8), (64, 128, 8), (64, 128, 64),
                      (960, 192, 960), (960, 192, 1152), (1152, 192, 1152)]:
        try_case("axis0", kernel_axis0, R, C, M, (M, 1))
    # lane gather (axis=1)
    for (R, C, M) in [(8, 128, 128), (64, 192, 128), (64, 192, 16),
                      (64, 256, 256), (64, 1024, 1024)]:
        try_case("axis1", kernel_axis1, R, C, M, (1, M))

    # --- cost probe: big block, repeated gather vs pure copy ---
    R, C, M = 960, 192, 1152
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, M, size=(R, C)).astype(np.int32))
    tab = jnp.asarray(rng.standard_normal((M, 1)).astype(np.float32))

    REP = 50

    def kern_rep(idx_ref, tab_ref, out_ref):
        idx0 = idx_ref[...]
        tab0 = tab_ref[...]
        x = jnp.broadcast_to(tab0, (M, C))
        acc = jnp.zeros((R, C), jnp.float32)
        for r in range(REP):
            ix = jnp.pad(idx0 + r % 2, ((0, M - R), (0, 0)))
            g = jnp.take_along_axis(x, ix, axis=0)
            acc = acc + g[:R]
        out_ref[...] = acc

    f = jax.jit(pl.pallas_call(
        kern_rep, out_shape=jax.ShapeDtypeStruct((R, C), jnp.float32)))
    out = f(idx, tab)
    np.asarray(out[0, :2])
    t0 = time.perf_counter()
    N = 20
    for _ in range(N):
        out = f(idx, tab)
    np.asarray(out[0, :2])
    dt = (time.perf_counter() - t0) / N
    per_elem = dt / (REP * R * C)
    print(f"gather cost: {dt*1e6:.1f} us per call, {per_elem*1e12:.2f} ps/elem"
          f" -> {1/per_elem/1e9:.1f} Gelem/s")


if __name__ == "__main__":
    main()
