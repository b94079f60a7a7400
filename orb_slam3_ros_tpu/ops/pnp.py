"""Perspective-n-Point RANSAC: camera pose from 2D-3D correspondences.

Role of the reference's ``MLPnPsolver`` (orb_slam3/src/MLPnPsolver.cpp,
used only by ``Tracking::Relocalization``, Tracking.cc:3695-3720: BoW
candidate matches -> RANSAC PnP hypothesis -> guided matching + pose
optimization) and of the minimal-solver half of ``Sim3Solver``'s
iterate/refine contract (Sim3Solver.h:33-100).

TPU-first: the reference's sequential RANSAC (mRansacMaxIts iterations
with early exit, MLPnPsolver.cpp ``iterate``) becomes ``n_hyp`` parallel
hypotheses. Each hypothesis solves a 6-point DLT for the 3x4 projection
[R|t] on *normalized rays* (bearing-vector formulation like MLPnP, so
any camera model's unprojection feeds it), orthonormalizes R by SVD,
fixes cheirality, and scores by reprojection chi2 over all N
correspondences; argmax wins and a short damped Gauss-Newton refit on
the inlier set replaces the reference's final ``Refine()``.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cameras, lie

CHI2_PNP = 5.991  # 2-DoF 95%, the reference's per-level threshold base


class PnPResult(NamedTuple):
    ok: jnp.ndarray  # [] bool
    R: jnp.ndarray  # [3,3] world -> camera
    t: jnp.ndarray  # [3]
    inlier: jnp.ndarray  # [N] bool
    n_inliers: jnp.ndarray  # [] int32


def _dlt_pose(X, xy):
    """6-point DLT for P = [R|t] from world points X [6,3] and normalized
    image coords xy [6,2] (z=1 rays). Returns (R [3,3], t [3])."""
    dtype = X.dtype
    x, y = xy[:, 0], xy[:, 1]
    ones = jnp.ones_like(x)
    zeros = jnp.zeros_like(x)
    Xh = jnp.concatenate([X, ones[:, None]], axis=1)  # [6,4]
    # rows: [X 0 -x*X ; 0 X -y*X] with X homogeneous
    r1 = jnp.concatenate([Xh, jnp.zeros_like(Xh), -x[:, None] * Xh], axis=1)
    r2 = jnp.concatenate([jnp.zeros_like(Xh), Xh, -y[:, None] * Xh], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # [12,12]
    _, _, Vt = jnp.linalg.svd(A)
    p = Vt[-1]
    P = p.reshape(3, 4)
    # Resolve the nullspace sign: M = s*R has det(M) = s^3, so flipping P
    # to make det positive makes the recovered scale positive (points end
    # up in FRONT of the camera; degenerate hypotheses just score low).
    sgn = jnp.sign(jnp.linalg.det(P[:, :3]))
    P = P * jnp.where(sgn == 0, 1.0, sgn)
    M = P[:, :3]
    # Orthonormalize: M = s * R with R in SO(3) (Procrustes).
    U, S, Vt2 = jnp.linalg.svd(M)
    detUV = jnp.linalg.det(U @ Vt2)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0], dtype)).at[2, 2].set(detUV)
    R = U @ D @ Vt2
    s = (S[0] + S[1] + detUV * S[2]) / 3.0
    t = P[:, 3] / jnp.maximum(s, 1e-12)
    return R, t


@partial(jax.jit, static_argnames=("n_hyp", "refine_iters"))
def solve_pnp(
    X: jnp.ndarray,
    uv: jnp.ndarray,
    valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    key: jnp.ndarray,
    inv_sigma2: jnp.ndarray | None = None,
    n_hyp: int = 256,
    chi2_th: float = CHI2_PNP,
    min_inliers: int = 15,
    refine_iters: int = 6,
) -> PnPResult:
    """RANSAC PnP over [N] 2D-3D matches.

    Args:
      X: [N,3] world points. uv: [N,2] pixel observations.
      valid: [N] bool correspondence mask.
      cam_params: pinhole [9] (used to normalize rays and to score).
      inv_sigma2: [N] per-match information (scale-level weighting, the
        reference uses mvLevelSigma2 per keypoint octave); None = 1.
    """
    N = X.shape[0]
    dtype = X.dtype
    if inv_sigma2 is None:
        inv_sigma2 = jnp.ones((N,), dtype)
    rays = cameras.pinhole_unproject(cam_params, uv)  # [N,3], z=1
    xy_n = rays[:, :2]

    # Sample 6 distinct-ish indices per hypothesis from the valid set
    # (weighted choice without replacement via Gumbel top-k on the mask).
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (n_hyp, N), dtype, 1e-9, 1.0 - 1e-9)
    ))
    scores = gumbel + jnp.where(valid, 0.0, -1e9)
    _, samp = jax.lax.top_k(scores, 6)  # [S,6]

    R_h, t_h = jax.vmap(lambda s: _dlt_pose(X[s], xy_n[s]))(samp)

    # Score every hypothesis on all N matches (pixel reprojection chi2).
    def score(R, t):
        Xc = X @ R.T + t
        uvp = cameras.pinhole_project_nodist(cam_params, Xc)
        # compare against undistorted pixel coords
        uvo = cam_params[0] * xy_n[:, 0] + cam_params[2], cam_params[1] * xy_n[:, 1] + cam_params[3]
        du = uvp[:, 0] - uvo[0]
        dv = uvp[:, 1] - uvo[1]
        chi2 = (du * du + dv * dv) * inv_sigma2
        inl = valid & (chi2 < chi2_th) & (Xc[:, 2] > 0)
        return inl, jnp.sum(inl.astype(jnp.int32))

    inl_h, n_h = jax.vmap(score)(R_h, t_h)
    best = jnp.argmax(n_h)
    R0, t0 = R_h[best], t_h[best]
    inl0 = inl_h[best]

    # Damped Gauss-Newton refit on the running inlier set (the
    # reference's MLPnPsolver::Refine + PoseOptimization handoff).
    uv_ud = jnp.stack(
        [
            cam_params[0] * xy_n[:, 0] + cam_params[2],
            cam_params[1] * xy_n[:, 1] + cam_params[3],
        ],
        axis=1,
    )

    def residual(eps, R, t, Xi, uvi):
        dR = lie.so3_exp(eps[:3])
        R2 = dR @ R
        t2 = dR @ t + eps[3:6]
        Xc = R2 @ Xi + t2
        return cameras.pinhole_project_nodist(cam_params, Xc) - uvi

    z6 = jnp.zeros((6,), dtype)

    def gn_step(carry, _):
        R, t, inl = carry
        w = inl.astype(dtype) * inv_sigma2
        r = jax.vmap(lambda Xi, uvi: residual(z6, R, t, Xi, uvi))(X, uv_ud)
        J = jax.vmap(
            lambda Xi, uvi: jax.jacfwd(lambda e: residual(e, R, t, Xi, uvi))(z6)
        )(X, uv_ud)
        JW = J * w[:, None, None]
        H = jnp.einsum("nia,nib->ab", JW, J) + 1e-4 * jnp.eye(6, dtype=dtype)
        g = -jnp.einsum("nia,ni->a", JW, r)
        eps = jnp.linalg.solve(H, g)
        dR = lie.so3_exp(eps[:3])
        R = lie.normalize_rotation(dR @ R)
        t = dR @ t + eps[3:6]
        # re-classify inliers
        Xc = X @ R.T + t
        uvp = cameras.pinhole_project_nodist(cam_params, Xc)
        chi2 = jnp.sum((uvp - uv_ud) ** 2, -1) * inv_sigma2
        inl = valid & (chi2 < chi2_th) & (Xc[:, 2] > 0)
        return (R, t, inl), None

    (R, t, inl), _ = jax.lax.scan(
        gn_step, (R0, t0, inl0), None, length=refine_iters
    )
    n_inl = jnp.sum(inl.astype(jnp.int32))
    return PnPResult(
        ok=n_inl >= min_inliers, R=R, t=t, inlier=inl, n_inliers=n_inl
    )
