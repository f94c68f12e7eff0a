"""Native (C++) runtime components, loaded via ctypes.

The reference ships its voxel-processing hot ops as native kernels compiled
for four GPU APIs (`GPUFunctions/GPUUtils.py:85-474`). In the TPU build,
device compute goes through XLA/Pallas; host-side irregular work (solid
voxelization, SURVEY.md section 2.3) lives here as OpenMP C++.

Libraries are compiled on first use with g++ into the package directory and
cached; every native entry point has a pure-NumPy fallback so the framework
works without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_LOCK = threading.Lock()
_LIBS: dict = {}


def _build_and_load(name: str):
    """Compile <name>.cpp -> lib<name>.so (cached) and dlopen it."""
    src = os.path.join(_DIR, f"{name}.cpp")
    lib = os.path.join(_DIR, f"lib{name}.so")
    with _LOCK:
        if name in _LIBS:
            return _LIBS[name]
        if (not os.path.exists(lib)) or os.path.getmtime(lib) < os.path.getmtime(src):
            cmd = [
                "g++", "-O3", "-shared", "-fPIC", "-fopenmp",
                "-std=c++17", src, "-o", lib,
            ]
            subprocess.run(cmd, check=True, capture_output=True)
        _LIBS[name] = ctypes.CDLL(lib)
        return _LIBS[name]


def native_available(name: str = "voxelize") -> bool:
    try:
        _build_and_load(name)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def voxelize_solid_native(triangles_vox: np.ndarray, shape) -> np.ndarray:
    """Solid voxelization in voxel coordinates (see ops.voxelize for the
    public API). Raises if the native library cannot be built/loaded."""
    lib = _build_and_load("voxelize")
    fn = lib.voxelize_solid_native
    fn.restype = ctypes.c_int
    tri = np.ascontiguousarray(triangles_vox, np.float64)
    N1, N2, N3 = (int(s) for s in shape)
    out = np.zeros((N1, N2, N3), np.uint8)
    rc = fn(
        tri.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(tri.shape[0]),
        ctypes.c_int64(N1), ctypes.c_int64(N2), ctypes.c_int64(N3),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    if rc != 0:
        raise MemoryError("native voxelizer allocation failed")
    return out.astype(bool)
