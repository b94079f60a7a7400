"""Motion-only pose optimization: 6-DoF Levenberg-Marquardt over masked
reprojection edges — the per-frame hot solve of the tracking front-end.

Role of the reference's ``Optimizer::PoseOptimization``
(orb_slam3/src/Optimizer.cc:816-1060): g2o with one SE3 vertex, monocular
EdgeSE3ProjectXYZOnlyPose edges, Huber(sqrt(5.991)), 4 rounds x 10 LM
iterations with chi2 outlier reclassification between rounds.

TPU-first: the whole solve is one jitted ``lax.fori_loop`` over a fixed
iteration budget; edges live in fixed-capacity arrays with validity
masks; the 6x6 normal equations are built by masked reductions (vmap +
sum) and solved in closed form. No data-dependent shapes.

Pose convention: Tcw (world -> camera), X_c = R X_w + t; the update is
left-multiplicative, T <- exp(delta) * T, with delta = [rho, phi].
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cameras, lie, robust


class PoseOptResult(NamedTuple):
    R: jnp.ndarray  # [3,3] optimized Rcw
    t: jnp.ndarray  # [3]
    inlier: jnp.ndarray  # [N] bool final chi2 classification
    n_inliers: jnp.ndarray  # [] int32
    chi2: jnp.ndarray  # [N] final per-edge chi2 (sigma-normalized)


def _residual_jac(R, t, Xw, uv, cam_params, cam_model: str = "pinhole"):
    """Per-edge reprojection residual [2] and Jacobian [2, 6] wrt the
    left-multiplicative se3 perturbation of Tcw. ``cam_model`` selects
    the projection (pinhole | kb8 — the reference's
    EdgeSE3ProjectXYZOnlyPose calls the camera's virtual projectJac,
    OptimizableTypes.h:31/KannalaBrandt8.cpp)."""
    Xc = R @ Xw + t
    pred = cameras.project_model(cam_params, Xc, cam_model)
    r = pred - uv
    Jproj = cameras.project_jac_model(cam_params, Xc, cam_model)  # [2,3]
    # dXc/d[rho, phi] = [I, -hat(Xc)]
    JX = jnp.concatenate([jnp.eye(3, dtype=Xc.dtype), -lie.hat(Xc)], axis=-1)  # [3,6]
    return r, Jproj @ JX


def pose_optimization(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    rounds: int = 4,
    iters_per_round: int = 10,
    chi2_th: float = robust.CHI2_MONO,
    cam_model: str = "pinhole",
) -> PoseOptResult:
    """Optimize Tcw given fixed 3-D points and their observations.

    Args:
      R0, t0: initial Tcw.
      Xw: [N, 3] world points.
      uv: [N, 2] observed pixels (undistorted).
      inv_sigma2: [N] per-edge information scale (1/sigma^2 by octave,
        reference ``mvInvLevelSigma2``).
      valid: [N] bool — edge exists.
      cam_params: pinhole [9].

    Mirrors the reference's outlier schedule: after each round, edges with
    sigma-normalized chi2 > ``chi2_th`` are excluded from the next round
    (Optimizer.cc:990-1022); they can re-enter if they fall back under the
    threshold, exactly like g2o re-includes level-0 edges.
    """
    dtype = R0.dtype
    _vres = jax.vmap(
        lambda R, t, X, u: _residual_jac(R, t, X, u, cam_params, cam_model),
        in_axes=(None, None, 0, 0),
    )

    def compute_quad(R, t, active):
        r, J = _vres(R, t, Xw, uv)  # [N,2], [N,2,6]
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        w_rob = robust.huber_weight(chi2, chi2_th)
        w = inv_sigma2 * w_rob * active.astype(dtype)
        H = jnp.einsum("nia,n,nib->ab", J, w, J)
        g = -jnp.einsum("nia,n,ni->a", J, w, r)
        cost = jnp.sum(jnp.where(active, jnp.minimum(chi2, chi2_th) , 0.0))
        return H, g, cost, chi2

    def lm_round(carry, _):
        R, t, active, lam = carry

        def lm_step(i, st):
            R, t, lam = st
            H, g, cost, _ = compute_quad(R, t, active)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6, dtype=dtype)
            # Hd is SPD (damped Gauss-Newton); Cholesky beats LU's
            # sequential pivoting on TPU — this solve sits inside the
            # per-frame tracking loop (rounds x iters executions).
            delta = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Hd, lower=True), g
            )
            dR, dt = lie.se3_exp(delta)
            R_new = lie.normalize_rotation(dR @ R)
            t_new = dR @ t + dt
            _, _, cost_new, _ = compute_quad(R_new, t_new, active)
            better = cost_new < cost
            R = jnp.where(better, R_new, R)
            t = jnp.where(better, t_new, t)
            lam = jnp.where(better, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4))
            return (R, t, lam)

        R, t, lam = jax.lax.fori_loop(0, iters_per_round, lm_step, (R, t, lam))
        # Reclassify outliers for the next round.
        _, _, _, chi2 = compute_quad(R, t, valid)
        active = valid & (chi2 <= chi2_th)
        return (R, t, active, lam), None

    init = (R0, t0, valid, jnp.asarray(1e-2, dtype))
    (R, t, active, _), _ = jax.lax.scan(lm_round, init, None, length=rounds)
    _, _, _, chi2 = compute_quad(R, t, valid)
    inlier = valid & (chi2 <= chi2_th)
    return PoseOptResult(
        R=R, t=t, inlier=inlier, n_inliers=jnp.sum(inlier.astype(jnp.int32)), chi2=chi2
    )


def _residual_jac_stereo(R, t, Xw, uv, ur, bf, cam_params):
    """(u, v, u_r) residual [3] and Jacobian [3, 6] — the reference's
    EdgeStereoSE3ProjectXYZOnlyPose (G2oTypes.h:466); the u_r row is
    masked off for monocular edges (ur < 0)."""
    Xc = R @ Xw + t
    pred = cameras.pinhole_project_nodist(cam_params, Xc)
    Jproj = cameras.pinhole_project_jac(cam_params, Xc)  # [2,3]
    has_st = (ur >= 0).astype(Xc.dtype)
    z_safe = jnp.where(jnp.abs(Xc[2]) < 1e-6, 1e-6, Xc[2])
    r = jnp.concatenate(
        [pred - uv, (has_st * (pred[0] - bf / z_safe - ur))[None]]
    )
    Jur = Jproj[0] + jnp.asarray([0.0, 0.0, 1.0], Xc.dtype) * (bf / z_safe**2)
    Jproj3 = jnp.concatenate([Jproj, (has_st * Jur)[None]], axis=0)
    JX = jnp.concatenate([jnp.eye(3, dtype=Xc.dtype), -lie.hat(Xc)], axis=-1)
    return r, Jproj3 @ JX


_vres_st = jax.vmap(
    _residual_jac_stereo, in_axes=(None, None, 0, 0, 0, None, None)
)


def pose_optimization_stereo(
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    Xw: jnp.ndarray,
    uv: jnp.ndarray,
    ur: jnp.ndarray,  # [N] right-x coords, -1 = mono edge
    bf: jnp.ndarray,  # fx * baseline
    inv_sigma2: jnp.ndarray,
    valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    rounds: int = 2,
    iters_per_round: int = 6,
) -> PoseOptResult:
    """Motion-only pose optimization over mixed mono/stereo edges
    (PoseOptimization's stereo branch, Optimizer.cc:816/:900): stereo
    edges add the disparity residual, tightening depth/translation
    observability; chi2 gates are per-DoF (5.991 mono / 7.815 stereo)."""
    dtype = R0.dtype
    delta2 = jnp.where(ur >= 0, robust.CHI2_STEREO, robust.CHI2_MONO)

    def compute_quad(R, t, active):
        r, J = _vres_st(R, t, Xw, uv, ur, bf, cam_params)  # [N,3],[N,3,6]
        chi2 = jnp.sum(r * r, axis=-1) * inv_sigma2
        w_rob = robust.huber_weight(chi2, delta2)
        w = inv_sigma2 * w_rob * active.astype(dtype)
        H = jnp.einsum("nia,n,nib->ab", J, w, J)
        g = -jnp.einsum("nia,n,ni->a", J, w, r)
        cost = jnp.sum(jnp.where(active, jnp.minimum(chi2, delta2), 0.0))
        return H, g, cost, chi2

    def lm_round(carry, _):
        R, t, active, lam = carry

        def lm_step(i, st):
            R, t, lam = st
            H, g, cost, _ = compute_quad(R, t, active)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-8 * jnp.eye(6, dtype=dtype)
            delta = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Hd, lower=True), g
            )
            dR, dt = lie.se3_exp(delta)
            R_new = lie.normalize_rotation(dR @ R)
            t_new = dR @ t + dt
            _, _, cost_new, _ = compute_quad(R_new, t_new, active)
            better = cost_new < cost
            R = jnp.where(better, R_new, R)
            t = jnp.where(better, t_new, t)
            lam = jnp.where(
                better, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4)
            )
            return (R, t, lam)

        R, t, lam = jax.lax.fori_loop(0, iters_per_round, lm_step, (R, t, lam))
        _, _, _, chi2 = compute_quad(R, t, valid)
        active = valid & (chi2 <= delta2)
        return (R, t, active, lam), None

    init = (R0, t0, valid, jnp.asarray(1e-2, dtype))
    (R, t, active, _), _ = jax.lax.scan(lm_round, init, None, length=rounds)
    _, _, _, chi2 = compute_quad(R, t, valid)
    inlier = valid & (chi2 <= delta2)
    return PoseOptResult(
        R=R, t=t, inlier=inlier,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)), chi2=chi2,
    )
