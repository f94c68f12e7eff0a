"""Rigid CT<->T1 coregistration (the elastix-subprocess replacement).

The reference shells out to the external elastix binary with a rigid
parameter file (`BabelBrain/CTZTEProcessing.py:111`, `ExternalBin/elastix/
rigid.txt`). TPU-natively this is just an optimization over 6 rigid
parameters with a differentiable resampler: JAX autodiff through
``map_coordinates`` gives exact gradients of the similarity metric, and a
multi-resolution Adam loop converges in a few hundred steps — no external
binaries, runs on any JAX backend.

Metrics: normalized cross-correlation on gradient-magnitude images
(edge alignment, insensitive to the CT<->MR intensity relationship) or
Parzen-window mutual information (``metric='mi'``) — the multi-modal
metric class of the reference's elastix config (Mattes MI,
`ExternalBin/elastix/rigid.txt`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.ndimage import map_coordinates


# Failure-detection thresholds on register_rigid(return_quality=True)'s
# final-level similarity, calibrated by the convergence-radius harness
# (tests/test_registration_robustness.py): on CT<->T1-like phantom pairs
# every converged registration scored well above, and every diverged /
# wrong-anatomy registration well below, these values.
QUALITY_THRESHOLD = {"ncc": 0.55, "mi": 0.25}


def registration_ok(quality: float, metric: str = "ncc") -> bool:
    """True when a registration's quality score clears the calibrated
    failure-detection threshold (the reference has no equivalent — elastix
    failures are silently consumed; SURVEY.md flags this as the one
    correctness-critical Step-1 link needing detection)."""
    return float(quality) >= QUALITY_THRESHOLD[metric]


def euler_matrix(rx, ry, rz):
    cx, sx = jnp.cos(rx), jnp.sin(rx)
    cy, sy = jnp.cos(ry), jnp.sin(ry)
    cz, sz = jnp.cos(rz), jnp.sin(rz)
    Rx = jnp.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = jnp.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = jnp.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def _resample_rigid(moving, params, shape, center):
    """Sample ``moving`` at rigid-transformed coordinates of the fixed grid."""
    R = euler_matrix(params[0], params[1], params[2])
    t = params[3:6]
    ii, jj, kk = jnp.meshgrid(
        jnp.arange(shape[0], dtype=jnp.float32),
        jnp.arange(shape[1], dtype=jnp.float32),
        jnp.arange(shape[2], dtype=jnp.float32),
        indexing="ij",
    )
    pts = jnp.stack([ii.ravel(), jj.ravel(), kk.ravel()]) - center[:, None]
    src = R @ pts + center[:, None] + t[:, None]
    out = map_coordinates(moving, [src[0], src[1], src[2]], order=1, mode="constant")
    return out.reshape(shape)


def _ncc(a, b):
    a = a - a.mean()
    b = b - b.mean()
    return jnp.sum(a * b) / jnp.sqrt(jnp.sum(a * a) * jnp.sum(b * b) + 1e-12)


def _mutual_information(a, b, bins: int = 32):
    """Differentiable Parzen-window (soft-binned) mutual information.

    The multi-modal metric class the reference's elastix config uses
    (Mattes MI, `ExternalBin/elastix/rigid.txt`): invariant to any
    intensity relationship between the modalities, not just affine ones.
    Inputs are min-max normalized into [0, 1]; a Gaussian window one bin
    wide keeps the joint histogram smooth so autodiff gradients exist.
    """
    av = a.ravel()
    bv = b.ravel()
    av = (av - av.min()) / (av.max() - av.min() + 1e-9)
    bv = (bv - bv.min()) / (bv.max() - bv.min() + 1e-9)
    centers = jnp.linspace(0.0, 1.0, bins)
    sig = 1.0 / bins
    wa = jnp.exp(-0.5 * ((av[:, None] - centers[None, :]) / sig) ** 2)
    wb = jnp.exp(-0.5 * ((bv[:, None] - centers[None, :]) / sig) ** 2)
    wa = wa / (wa.sum(axis=1, keepdims=True) + 1e-12)
    wb = wb / (wb.sum(axis=1, keepdims=True) + 1e-12)
    pab = (wa.T @ wb) / av.shape[0]
    pa = pab.sum(axis=1)
    pb = pab.sum(axis=0)
    return jnp.sum(
        pab * (jnp.log(pab + 1e-12) - jnp.log(pa[:, None] * pb[None, :] + 1e-12))
    )


def _grad_mag(v):
    gx = jnp.gradient(v, axis=0)
    gy = jnp.gradient(v, axis=1)
    gz = jnp.gradient(v, axis=2)
    return jnp.sqrt(gx * gx + gy * gy + gz * gz)


def _ngf(a, b, eps):
    """Normalized-gradient-fields similarity (Haber & Modersitzki): the
    mean squared cosine between the two images' gradient directions.
    Pure ORIENTATION alignment — insensitive to the bias-field/contrast
    modulation of gradient magnitudes that biases gradient-NCC by ~2 deg
    on the robustness phantom (measured; the terminal polish below runs
    on this metric for that reason)."""
    ga = jnp.stack([jnp.gradient(a, axis=ax) for ax in range(3)])
    gb = jnp.stack([jnp.gradient(b, axis=ax) for ax in range(3)])
    na = jnp.sqrt((ga * ga).sum(0) + eps * eps)
    nb = jnp.sqrt((gb * gb).sum(0) + eps * eps)
    d = (ga * gb).sum(0) / (na * nb)
    return (d * d).mean()


def _interior(v, frac: float = 0.14):
    """Crop a border fraction before computing the similarity.

    Rotated/translated warps pull zero padding in from the array corners;
    including those regions in the metric penalizes every non-identity
    transform and biases the optimum toward zero (measured on the
    robustness harness: rotations were never recovered without this).
    """
    sl = tuple(
        slice(int(frac * n), n - int(frac * n)) for n in v.shape
    )
    return v[sl]


def _downsample(v, f):
    if f == 1:
        return v
    n = [(s // f) * f for s in v.shape]
    v = v[: n[0], : n[1], : n[2]]
    return v.reshape(
        n[0] // f, f, n[1] // f, f, n[2] // f, f
    ).mean(axis=(1, 3, 5))


def register_rigid(
    fixed: np.ndarray,
    moving: np.ndarray,
    *,
    levels=(4, 2, 1),
    iters_per_level=100,
    lr=0.5,
    use_gradient_images=True,
    init_params=None,
    metric: str = "ncc",
    return_quality: bool = False,
    pre_search: bool = True,
):
    """Estimate the rigid transform aligning ``moving`` to ``fixed``.

    Both volumes must share a voxel grid/spacing (resample first with
    ``imaging.resample_from_to`` if needed). Returns (params[6], matrix4x4)
    where the matrix maps fixed-voxel -> moving-voxel homogeneous
    coordinates (the convention ``imaging.resample_affine`` consumes).

    ``metric``: 'ncc' (on gradient-magnitude images by default — edge
    alignment is modality-insensitive) or 'mi' (Parzen mutual information,
    the multi-modal metric class of the reference's elastix config).
    ``return_quality`` additionally returns the final similarity value at
    the finest level (NCC in [-1, 1] or MI in nats) so callers can DETECT
    a failed registration instead of silently consuming garbage.
    """
    import optax

    fixed = np.asarray(fixed, np.float32)
    moving = np.asarray(moving, np.float32)
    params = jnp.asarray(
        init_params if init_params is not None else np.zeros(6), jnp.float32
    )
    if metric not in ("ncc", "mi"):
        raise ValueError("metric must be 'ncc' or 'mi'")
    quality = None

    if pre_search and init_params is None:
        # coarse exhaustive initialization at the coarsest level: shell-
        # dominated head images have a flat similarity landscape around
        # identity (the skull is nearly rotation-invariant), so gradient
        # ascent alone stalls; seeding from the best of a +/-20 deg /
        # +/-8 vox single-axis candidate grid restores the full capture
        # range (measured in tests/test_registration_robustness.py)
        f0 = levels[0]
        fx0 = jnp.asarray(_downsample(fixed, f0))
        mv0 = jnp.asarray(_downsample(moving, f0))
        if use_gradient_images and metric == "ncc":
            fx0 = _grad_mag(fx0)
            mv0 = _grad_mag(mv0)
        center0 = jnp.asarray(np.array(fx0.shape, np.float32) / 2.0)

        fx0_in = _interior(fx0)

        def score(p):
            pl = jnp.concatenate([p[:3], p[3:] / f0])
            w = _interior(_resample_rigid(mv0, pl, fx0.shape, center0))
            if metric == "mi":
                return float(_mutual_information(w, fx0_in))
            return float(_ncc(w, fx0_in))

        cands = [np.zeros(6)]
        for ax in range(3):
            for deg in (-20, -15, -10, -5, 5, 10, 15, 20):
                c = np.zeros(6)
                c[ax] = np.deg2rad(deg)
                cands.append(c)
        for ax in range(3):
            for vx in (-8, -4, 4, 8):
                c = np.zeros(6)
                c[3 + ax] = vx
                cands.append(c)
        best = max(cands, key=lambda c: score(jnp.asarray(c, jnp.float32)))
        params = jnp.asarray(best, jnp.float32)

    for f in levels:
        fx = jnp.asarray(_downsample(fixed, f))
        mv = jnp.asarray(_downsample(moving, f))
        if use_gradient_images and metric == "ncc":
            fx = _grad_mag(fx)
            mv = _grad_mag(mv)
        fx = (fx - fx.mean()) / (fx.std() + 1e-6)
        mv = (mv - mv.mean()) / (mv.std() + 1e-6)
        center = jnp.asarray(np.array(fx.shape, np.float32) / 2.0)

        fx_in = _interior(fx)

        def loss(p):
            # rotations are scale-free; translations are kept in full-res
            # voxels and divided by the pyramid factor at this level
            p_level = jnp.concatenate([p[:3], p[3:] / f])
            warped = _interior(_resample_rigid(mv, p_level, fx.shape, center))
            if metric == "mi":
                return -_mutual_information(warped, fx_in)
            return -_ncc(warped, fx_in)

        opt = optax.adam(lr * (0.02 if f == 1 else 0.05))
        state = opt.init(params)
        grad_fn = jax.jit(jax.value_and_grad(loss))
        for _ in range(iters_per_level):
            val, g = grad_fn(params)
            updates, state = opt.update(g, state)
            params = optax.apply_updates(params, updates)

        # derivative-free coordinate refinement: shell-dominated head
        # images have a shallow, noisy similarity landscape in rotation,
        # where gradient steps stall or drift; direct per-parameter grid
        # descent on the jitted metric is robust there (elastix-class
        # tools use stochastic/adaptive search for the same reason)
        loss_j = jax.jit(loss)
        p_np = np.asarray(params, np.float64)
        best_val = float(loss_j(jnp.asarray(p_np, jnp.float32)))
        for step_deg, step_vox in ((4.0, 4.0), (2.0, 2.0), (1.0, 1.0),
                                   (0.5, 0.5), (0.25, 0.25)):
            improved = True
            sweeps = 0
            while improved and sweeps < 4:
                improved = False
                sweeps += 1
                for ax in range(6):
                    d = np.deg2rad(step_deg) if ax < 3 else step_vox
                    for sgn in (+1.0, -1.0):
                        cand = p_np.copy()
                        cand[ax] += sgn * d
                        v = float(loss_j(jnp.asarray(cand, jnp.float32)))
                        if v < best_val - 1e-7:
                            best_val = v
                            p_np = cand
                            improved = True
        if f == levels[-1]:
            # terminal sub-step polish (elastix-grade accuracy,
            # `ExternalBin/elastix/rigid.txt`): per-parameter coordinate
            # descent + parabolic line fits at the finest resolution on
            # the NGF metric — gradient-NCC's optimum is measurably
            # biased ~2 deg from truth on bias-field-shaded multi-modal
            # pairs, while NGF (orientation-only) sits within ~0.5 deg;
            # switching the polish metric is what earns the <0.5 deg /
            # <0.5 vox small-angle floor asserted in
            # tests/test_registration_robustness.py.
            fxi = jnp.asarray(_downsample(fixed, f))
            mvi = jnp.asarray(_downsample(moving, f))
            fxi = (fxi - fxi.mean()) / (fxi.std() + 1e-6)
            mvi = (mvi - mvi.mean()) / (mvi.std() + 1e-6)
            fxi_in = _interior(fxi)
            eps_ngf = 0.5 * float(jnp.abs(_grad_mag(fxi)).mean())

            def loss_ngf(p):
                p_level = jnp.concatenate([p[:3], p[3:] / f])
                w = _interior(
                    _resample_rigid(mvi, p_level, fxi.shape, center)
                )
                return -_ngf(w, fxi_in, eps_ngf)

            loss_j = jax.jit(loss_ngf)
            best_val = float(loss_j(jnp.asarray(p_np, jnp.float32)))
            # the opening 2-deg step must clear the primary metric's
            # measured ~2-deg bias basin before the fine sweeps converge
            for step_deg, step_vox in ((2.0, 2.0), (1.0, 1.0), (0.5, 0.5),
                                       (0.25, 0.25)):
                improved = True
                sweeps = 0
                while improved and sweeps < 4:
                    improved = False
                    sweeps += 1
                    for ax in range(6):
                        d = np.deg2rad(step_deg) if ax < 3 else step_vox
                        for sgn in (+1.0, -1.0):
                            cand = p_np.copy()
                            cand[ax] += sgn * d
                            v = float(
                                loss_j(jnp.asarray(cand, jnp.float32))
                            )
                            if v < best_val - 1e-8:
                                best_val = v
                                p_np = cand
                                improved = True
            for step_deg in (0.25, 0.1):
                for _ in range(2):
                    for ax in range(6):
                        d = np.deg2rad(step_deg) if ax < 3 else step_deg * 2
                        cm = p_np.copy()
                        cm[ax] -= d
                        cp = p_np.copy()
                        cp[ax] += d
                        vm = float(loss_j(jnp.asarray(cm, jnp.float32)))
                        vp = float(loss_j(jnp.asarray(cp, jnp.float32)))
                        denom = vm - 2.0 * best_val + vp
                        if denom <= 1e-12:
                            # not locally convex along this axis: fall
                            # back to the better neighbor if it wins
                            if min(vm, vp) < best_val - 1e-9:
                                p_np = cm if vm < vp else cp
                                best_val = min(vm, vp)
                            continue
                        delta = float(
                            np.clip(0.5 * (vm - vp) / denom * d, -d, d)
                        )
                        cand = p_np.copy()
                        cand[ax] += delta
                        v = float(loss_j(jnp.asarray(cand, jnp.float32)))
                        if v < best_val - 1e-9:
                            best_val = v
                            p_np = cand
        params = jnp.asarray(p_np, jnp.float32)
        # quality stays on the PRIMARY metric (the failure-detection
        # thresholds are calibrated on NCC/MI, not on the polish NGF)
        quality = -float(
            jax.jit(loss)(jnp.asarray(p_np, jnp.float32))
        )

    p = np.asarray(params)
    R = np.asarray(euler_matrix(p[0], p[1], p[2]))
    c = np.array(fixed.shape, np.float64) / 2.0
    m = np.eye(4)
    m[:3, :3] = R
    m[:3, 3] = c - R @ c + p[3:6]
    if return_quality:
        return p, m, quality
    return p, m
