"""Sim(3) estimation between keyframes: batched Horn/Umeyama closed form
+ RANSAC with two-way reprojection gating.

Role of the reference's ``Sim3Solver`` (orb_slam3/src/Sim3Solver.cc,
header Sim3Solver.h:33-100): RANSAC over 3-point samples, Horn's
closed-form absolute orientation with scale, inliers by projecting the
matched map points into both keyframes. The reference iterates
sequentially with early exit; here all hypotheses run batched and the
winner is refit on its inliers.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cameras


def umeyama(src: jnp.ndarray, dst: jnp.ndarray, w: jnp.ndarray, fix_scale: bool = False):
    """Weighted least-squares similarity dst ~ s R src + t, batched over
    leading dims. src/dst [..., M, 3], w [..., M] >= 0.

    The closed form of Horn/Umeyama — also the math inside the
    reference's ``ComputeSim3`` (Sim3Solver.cc:180-260).
    """
    wsum = jnp.maximum(jnp.sum(w, -1, keepdims=True), 1e-9)
    wn = w / wsum
    mu_s = jnp.sum(src * wn[..., None], axis=-2)
    mu_d = jnp.sum(dst * wn[..., None], axis=-2)
    xs = src - mu_s[..., None, :]
    xd = dst - mu_d[..., None, :]
    C = jnp.einsum("...m,...mi,...mj->...ij", wn, xd, xs)
    U, D, Vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(U) * jnp.linalg.det(Vt)
    S = jnp.ones_like(D).at[..., 2].set(jnp.sign(det))
    R = (U * S[..., None, :]) @ Vt
    var_s = jnp.einsum("...m,...mi,...mi->...", wn, xs, xs)
    if fix_scale:
        s = jnp.ones_like(var_s)
    else:
        s = jnp.sum(D * S, axis=-1) / jnp.maximum(var_s, 1e-12)
    t = mu_d - s[..., None] * jnp.einsum("...ij,...j->...i", R, mu_s)
    return s, R, t


class Sim3Result(NamedTuple):
    ok: jnp.ndarray
    s: jnp.ndarray  # scale (2 <- 1)
    R: jnp.ndarray  # [3,3]
    t: jnp.ndarray  # [3]
    inlier: jnp.ndarray  # [N]
    n_inliers: jnp.ndarray


def solve_sim3(
    X1: jnp.ndarray,
    X2: jnp.ndarray,
    match_valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    key: jnp.ndarray,
    n_hyp: int = 128,
    fix_scale: bool = False,
    chi2_th: float = 9.21,
    min_inliers: int = 20,
    sigma2_1: jnp.ndarray | None = None,
    sigma2_2: jnp.ndarray | None = None,
) -> Sim3Result:
    """Estimate S21 (X2 ~ s R X1 + t) from matched camera-frame points.

    Args:
      X1: [N,3] points in KF1 camera frame.
      X2: [N,3] corresponding points in KF2 camera frame.
      match_valid: [N] candidate correspondences.
      chi2_th: two-way reprojection gate.
      sigma2_1/sigma2_2: optional per-pair octave variances; the gate in
        image i becomes chi2_th * sigma2_i, the reference's
        ``mvnMaxError1/2 = 9.21 * sigma2(octave)`` (Sim3Solver.cc:85-100).
        Coarse-octave matches carry several-pixel detection noise — a
        flat gate rejects them and starves the consensus.

    Mirrors Sim3Solver::iterate + CheckInliers (Sim3Solver.cc:105-280).
    """
    N = X1.shape[0]
    th1 = chi2_th * (jnp.ones((N,), X1.dtype) if sigma2_1 is None else sigma2_1)
    th2 = chi2_th * (jnp.ones((N,), X1.dtype) if sigma2_2 is None else sigma2_2)
    # information weight per pair (OptimizeSim3's invSigmaSquare edges)
    info = 1.0 / jnp.sqrt((th1 / chi2_th) * (th2 / chi2_th))
    logits = jnp.where(match_valid, 0.0, -jnp.inf)
    idx = jax.random.categorical(key, logits[None, :], shape=(n_hyp, 3))
    s1 = X1[idx]  # [S,3,3]
    s2 = X2[idx]
    w3 = jnp.ones((n_hyp, 3), X1.dtype)
    s, R, t = umeyama(s1, s2, w3, fix_scale=fix_scale)  # batched [S]

    def count_inliers(s, R, t):
        # project X1 through S21 into image 2, X2 through S21^-1 into 1
        X1in2 = s[..., None, None] * jnp.einsum("...ij,nj->...ni", R, X1) + t[..., None, :]
        uv2 = cameras.pinhole_project_nodist(cam_params, X1in2)
        uv2_obs = cameras.pinhole_project_nodist(cam_params, X2)
        e2 = jnp.sum((uv2 - uv2_obs) ** 2, -1)
        Rt = jnp.swapaxes(R, -1, -2)
        X2in1 = jnp.einsum("...ij,...nj->...ni", Rt, X2 - t[..., None, :]) / s[..., None, None]
        uv1 = cameras.pinhole_project_nodist(cam_params, X2in1)
        uv1_obs = cameras.pinhole_project_nodist(cam_params, X1)
        e1 = jnp.sum((uv1 - uv1_obs) ** 2, -1)
        inl = (e1 < th1) & (e2 < th2) & match_valid
        return inl

    inl_all = count_inliers(s, R, t)  # [S, N]
    counts = jnp.sum(inl_all, axis=-1)
    best = jnp.argmax(counts)
    # Refit on the winner's inliers (information-weighted Umeyama).
    w_best = inl_all[best].astype(X1.dtype) * info
    s_f, R_f, t_f = umeyama(X1, X2, w_best, fix_scale=fix_scale)
    inl_f = count_inliers(s_f[None], R_f[None], t_f[None])[0]
    n_inl = jnp.sum(inl_f.astype(jnp.int32))
    ok = n_inl >= min_inliers
    return Sim3Result(ok=ok, s=s_f, R=R_f, t=t_f, inlier=inl_f, n_inliers=n_inl)


def refine_sim3(
    X1: jnp.ndarray,
    X2: jnp.ndarray,
    match_valid: jnp.ndarray,
    cam_params: jnp.ndarray,
    s0: jnp.ndarray,
    R0: jnp.ndarray,
    t0: jnp.ndarray,
    iters: int = 3,
    fix_scale: bool = False,
    chi2_th: float = 9.21,
    min_inliers: int = 20,
    sigma2_1: jnp.ndarray | None = None,
    sigma2_2: jnp.ndarray | None = None,
) -> Sim3Result:
    """IRLS refinement of a Sim3 from an initial estimate over a (grown)
    correspondence set — the role of the reference's ``OptimizeSim3``
    after ``SearchBySim3`` widens the match set (Optimizer.cc:2260,
    ORBmatcher.cc:1457): gate by two-way reprojection under the current
    estimate, refit Umeyama on the inliers, repeat. Gates scale with the
    per-pair octave variances like ``solve_sim3``."""
    N = X1.shape[0]
    th1 = chi2_th * (jnp.ones((N,), X1.dtype) if sigma2_1 is None else sigma2_1)
    th2 = chi2_th * (jnp.ones((N,), X1.dtype) if sigma2_2 is None else sigma2_2)
    info = 1.0 / jnp.sqrt((th1 / chi2_th) * (th2 / chi2_th))

    def gate(s, R, t):
        X1in2 = s * jnp.einsum("ij,nj->ni", R, X1) + t
        uv2 = cameras.pinhole_project_nodist(cam_params, X1in2)
        uv2_obs = cameras.pinhole_project_nodist(cam_params, X2)
        e2 = jnp.sum((uv2 - uv2_obs) ** 2, -1)
        X2in1 = jnp.einsum("ji,nj->ni", R, X2 - t) / s
        uv1 = cameras.pinhole_project_nodist(cam_params, X2in1)
        uv1_obs = cameras.pinhole_project_nodist(cam_params, X1)
        e1 = jnp.sum((uv1 - uv1_obs) ** 2, -1)
        return (e1 < th1) & (e2 < th2) & match_valid

    s, R, t = s0, R0, t0
    inl = gate(s, R, t)
    for _ in range(iters):
        s, R, t = umeyama(
            X1, X2, inl.astype(X1.dtype) * info, fix_scale=fix_scale
        )
        inl = gate(s, R, t)
    n_inl = jnp.sum(inl.astype(jnp.int32))
    return Sim3Result(
        ok=n_inl >= min_inliers, s=s, R=R, t=t, inlier=inl, n_inliers=n_inl
    )
