"""Sim(3) pose-graph optimization (essential graph).

Role of the reference's ``Optimizer::OptimizeEssentialGraph``
(orb_slam3/src/Optimizer.cc:1504-1929: g2o BlockSolver_7_3 over
VertexSim3Expmap with spanning-tree/covisibility/loop EdgeSim3) and its
4-DoF inertial variant (:5437). The fork's standalone Ceres re-solver
(3DCERES/loop_optimization.cpp) replays exactly this problem — the PGO
here is the TPU-native third implementation of that contract.

States: S_iw per keyframe (Sim3 world -> KF). Perturbation is
left-multiplicative, S <- exp(zeta) S, zeta in R^7. Edge (i, j) with
measurement S_ji has residual r = log(S_ji * S_iw * S_wj) which is zero
when the states agree with the measurement. Jacobians by forward-mode AD;
dense [K*7, K*7] normal equations (K <= ~256 keeps this trivial on MXU).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import lie


class PGOProblem(NamedTuple):
    R: jnp.ndarray  # [K,3,3] S_iw rotation
    t: jnp.ndarray  # [K,3]
    s: jnp.ndarray  # [K] scale
    kf_fixed: jnp.ndarray  # [K] bool
    kf_valid: jnp.ndarray  # [K]
    e_i: jnp.ndarray  # [E] int32 edge from-vertex
    e_j: jnp.ndarray  # [E]
    e_R: jnp.ndarray  # [E,3,3] measured S_ji rotation
    e_t: jnp.ndarray  # [E,3]
    e_s: jnp.ndarray  # [E]
    e_valid: jnp.ndarray  # [E]
    e_weight: jnp.ndarray  # [E] information scale


class PGOResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    s: jnp.ndarray
    cost: jnp.ndarray


def _edge_residual(eps_i, eps_j, Ri, ti, si, Rj, tj, sj, Rm, tm, sm):
    """r = log(S_ji_meas * (exp(eps_i) S_iw) * (exp(eps_j) S_jw)^-1)."""
    dRi, dti, dsi = lie.sim3_exp(eps_i)
    dRj, dtj, dsj = lie.sim3_exp(eps_j)
    Ri2, ti2, si2 = lie.sim3_mul(dRi, dti, dsi, Ri, ti, si)
    Rj2, tj2, sj2 = lie.sim3_mul(dRj, dtj, dsj, Rj, tj, sj)
    Rji, tji, sji = lie.sim3_mul(Rm, tm, sm, Ri2, ti2, si2)
    Rjinv, tjinv, sjinv = lie.sim3_inv(Rj2, tj2, sj2)
    Re, te, se = lie.sim3_mul(Rji, tji, sji, Rjinv, tjinv, sjinv)
    return lie.sim3_log(Re, te, se)


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph(prob: PGOProblem, n_iters: int = 20, lam0: float = 1e-4) -> PGOResult:
    K = prob.R.shape[0]
    D = 7
    dtype = prob.R.dtype
    z7 = jnp.zeros((7,), dtype)

    res0 = jax.vmap(
        lambda i, j, Rm, tm, sm, R, t, s: _edge_residual(
            z7, z7, R[i], t[i], s[i], R[j], t[j], s[j], Rm, tm, sm
        ),
        in_axes=(0, 0, 0, 0, 0, None, None, None),
    )
    jac_i = jax.vmap(
        lambda i, j, Rm, tm, sm, R, t, s: jax.jacfwd(
            lambda e: _edge_residual(e, z7, R[i], t[i], s[i], R[j], t[j], s[j], Rm, tm, sm)
        )(z7),
        in_axes=(0, 0, 0, 0, 0, None, None, None),
    )
    jac_j = jax.vmap(
        lambda i, j, Rm, tm, sm, R, t, s: jax.jacfwd(
            lambda e: _edge_residual(z7, e, R[i], t[i], s[i], R[j], t[j], s[j], Rm, tm, sm)
        )(z7),
        in_axes=(0, 0, 0, 0, 0, None, None, None),
    )

    free = (prob.kf_valid & ~prob.kf_fixed).astype(dtype)
    w_e = prob.e_weight * prob.e_valid.astype(dtype)

    def cost_of(R, t, s):
        r = res0(prob.e_i, prob.e_j, prob.e_R, prob.e_t, prob.e_s, R, t, s)
        return jnp.sum(w_e * jnp.sum(r * r, -1))

    def step(carry, _):
        R, t, s, lam, cost = carry
        args = (prob.e_i, prob.e_j, prob.e_R, prob.e_t, prob.e_s, R, t, s)
        r = res0(*args)  # [E,7]
        Ji = jac_i(*args)  # [E,7,7]
        Jj = jac_j(*args)
        JiW = Ji * w_e[:, None, None]
        JjW = Jj * w_e[:, None, None]
        H = jnp.zeros((K, K, D, D), dtype)
        H = H.at[prob.e_i, prob.e_i].add(jnp.einsum("eia,eib->eab", JiW, Ji))
        H = H.at[prob.e_j, prob.e_j].add(jnp.einsum("eia,eib->eab", JjW, Jj))
        H = H.at[prob.e_i, prob.e_j].add(jnp.einsum("eia,eib->eab", JiW, Jj))
        H = H.at[prob.e_j, prob.e_i].add(jnp.einsum("eia,eib->eab", JjW, Ji))
        g = jnp.zeros((K, D), dtype)
        g = g.at[prob.e_i].add(-jnp.einsum("eia,ei->ea", JiW, r))
        g = g.at[prob.e_j].add(-jnp.einsum("eia,ei->ea", JjW, r))

        eye = jnp.eye(D, dtype=dtype)
        diagH = jnp.diagonal(H[jnp.arange(K), jnp.arange(K)], axis1=-2, axis2=-1)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            (lam * diagH + 1e-8)[..., :, None] * eye
        )
        Hm = H * free[:, None, None, None] * free[None, :, None, None]
        Hm = Hm.at[jnp.arange(K), jnp.arange(K)].add((1.0 - free)[:, None, None] * eye)
        g = g * free[:, None]
        delta = jnp.linalg.solve(
            Hm.transpose(0, 2, 1, 3).reshape(K * D, K * D), g.reshape(K * D)
        ).reshape(K, D) * free[:, None]

        dR, dt, ds = lie.sim3_exp(delta)
        R2, t2, s2 = lie.sim3_mul(dR, dt, ds, R, t, s)
        R2 = lie.normalize_rotation(R2)
        fb = free[:, None, None] > 0
        R2 = jnp.where(fb, R2, R)
        t2 = jnp.where(free[:, None] > 0, t2, t)
        s2 = jnp.where(free > 0, s2, s)
        cost_new = cost_of(R2, t2, s2)
        better = cost_new < cost
        R = jnp.where(better, R2, R)
        t = jnp.where(better, t2, t)
        s = jnp.where(better, s2, s)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 5.0, 1e6))
        cost = jnp.where(better, cost_new, cost)
        return (R, t, s, lam, cost), None

    cost0 = cost_of(prob.R, prob.t, prob.s)
    (R, t, s, lam, cost), _ = jax.lax.scan(
        step, (prob.R, prob.t, prob.s, jnp.asarray(lam0, dtype), cost0), None,
        length=n_iters,
    )
    return PGOResult(R=R, t=t, s=s, cost=cost)


# ---------------------------------------------------------------------------
# 4-DoF essential graph (inertial maps: gravity fixes roll/pitch, IMU fixes
# scale) — role of Optimizer::OptimizeEssentialGraph4DoF (Optimizer.cc:5437)
# over VertexPose4DoF/Edge4DoF (G2oTypes.h:155/:817).
# ---------------------------------------------------------------------------


def _apply_pert4(eps, R_iw, t_iw):
    """Perturb a world->KF pose by a WORLD-frame yaw + translation.

    eps = [dt_w (3), dyaw]; the camera pose in world is left-multiplied by
    (Rz(dyaw), dt_w), so the camera's roll/pitch relative to gravity is
    exactly preserved (the reference's VertexPose4DoF update restricts the
    rotation to the yaw axis the same way)."""
    dtype = R_iw.dtype
    dR = lie.so3_exp(jnp.asarray([0.0, 0.0, 1.0], dtype) * eps[3])
    R_wi = R_iw.T
    p = -R_iw.T @ t_iw
    R_wi2 = dR @ R_wi
    p2 = dR @ p + eps[0:3]
    R2 = R_wi2.T
    return R2, -R2 @ p2


def _edge_residual_4dof(eps_i, eps_j, Ri, ti, Rj, tj, Rm, tm):
    """r = log_se3(T_ji_meas * T_iw' * T_wj') — zero when the perturbed
    states agree with the measured relative pose."""
    Ri2, ti2 = _apply_pert4(eps_i, Ri, ti)
    Rj2, tj2 = _apply_pert4(eps_j, Rj, tj)
    Ra, ta = lie.se3_mul(Rm, tm, Ri2, ti2)
    Rjinv, tjinv = lie.se3_inv(Rj2, tj2)
    Re, te = lie.se3_mul(Ra, ta, Rjinv, tjinv)
    return lie.se3_log(Re, te)


@partial(jax.jit, static_argnames=("n_iters",))
def optimize_pose_graph_4dof(
    prob: PGOProblem, n_iters: int = 20, lam0: float = 1e-4
) -> PGOResult:
    """SE3 pose-graph LM with per-keyframe 4-dof (world-yaw + translation)
    updates. Edge scales in ``prob.e_s`` are ignored (inertial maps have
    metric scale); the returned ``s`` is all-ones."""
    K = prob.R.shape[0]
    D = 4
    dtype = prob.R.dtype
    z4 = jnp.zeros((4,), dtype)

    res0 = jax.vmap(
        lambda i, j, Rm, tm, R, t: _edge_residual_4dof(
            z4, z4, R[i], t[i], R[j], t[j], Rm, tm
        ),
        in_axes=(0, 0, 0, 0, None, None),
    )
    jac_i = jax.vmap(
        lambda i, j, Rm, tm, R, t: jax.jacfwd(
            lambda e: _edge_residual_4dof(e, z4, R[i], t[i], R[j], t[j], Rm, tm)
        )(z4),
        in_axes=(0, 0, 0, 0, None, None),
    )
    jac_j = jax.vmap(
        lambda i, j, Rm, tm, R, t: jax.jacfwd(
            lambda e: _edge_residual_4dof(z4, e, R[i], t[i], R[j], t[j], Rm, tm)
        )(z4),
        in_axes=(0, 0, 0, 0, None, None),
    )

    free = (prob.kf_valid & ~prob.kf_fixed).astype(dtype)
    w_e = prob.e_weight * prob.e_valid.astype(dtype)

    def cost_of(R, t):
        r = res0(prob.e_i, prob.e_j, prob.e_R, prob.e_t, R, t)
        return jnp.sum(w_e * jnp.sum(r * r, -1))

    def step(carry, _):
        R, t, lam, cost = carry
        args = (prob.e_i, prob.e_j, prob.e_R, prob.e_t, R, t)
        r = res0(*args)  # [E,6]
        Ji = jac_i(*args)  # [E,6,4]
        Jj = jac_j(*args)
        JiW = Ji * w_e[:, None, None]
        JjW = Jj * w_e[:, None, None]
        H = jnp.zeros((K, K, D, D), dtype)
        H = H.at[prob.e_i, prob.e_i].add(jnp.einsum("eia,eib->eab", JiW, Ji))
        H = H.at[prob.e_j, prob.e_j].add(jnp.einsum("eia,eib->eab", JjW, Jj))
        H = H.at[prob.e_i, prob.e_j].add(jnp.einsum("eia,eib->eab", JiW, Jj))
        H = H.at[prob.e_j, prob.e_i].add(jnp.einsum("eia,eib->eab", JjW, Ji))
        g = jnp.zeros((K, D), dtype)
        g = g.at[prob.e_i].add(-jnp.einsum("eia,ei->ea", JiW, r))
        g = g.at[prob.e_j].add(-jnp.einsum("eia,ei->ea", JjW, r))

        eye = jnp.eye(D, dtype=dtype)
        diagH = jnp.diagonal(H[jnp.arange(K), jnp.arange(K)], axis1=-2, axis2=-1)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            (lam * diagH + 1e-8)[..., :, None] * eye
        )
        Hm = H * free[:, None, None, None] * free[None, :, None, None]
        Hm = Hm.at[jnp.arange(K), jnp.arange(K)].add((1.0 - free)[:, None, None] * eye)
        g = g * free[:, None]
        delta = jnp.linalg.solve(
            Hm.transpose(0, 2, 1, 3).reshape(K * D, K * D), g.reshape(K * D)
        ).reshape(K, D) * free[:, None]

        R2, t2 = jax.vmap(_apply_pert4)(delta, R, t)
        R2 = lie.normalize_rotation(R2)
        fb = free[:, None, None] > 0
        R2 = jnp.where(fb, R2, R)
        t2 = jnp.where(free[:, None] > 0, t2, t)
        cost_new = cost_of(R2, t2)
        better = cost_new < cost
        R = jnp.where(better, R2, R)
        t = jnp.where(better, t2, t)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 5.0, 1e6))
        cost = jnp.where(better, cost_new, cost)
        return (R, t, lam, cost), None

    cost0 = cost_of(prob.R, prob.t)
    (R, t, lam, cost), _ = jax.lax.scan(
        step, (prob.R, prob.t, jnp.asarray(lam0, dtype), cost0), None,
        length=n_iters,
    )
    return PGOResult(R=R, t=t, s=jnp.ones((K,), dtype), cost=cost)


def correct_points(X, pt_ref_kf, R_old, t_old, s_old, R_new, t_new, s_new):
    """Move map points with their reference keyframes after PGO: each
    point transforms by S_new^-1 * S_old of its reference KF (the
    reference's correction loop, Optimizer.cc:1832-1870 /
    LoopClosing.cc:2075-2235).

    Args:
      X: [P,3] world points; pt_ref_kf [P] reference KF id.
      *_old: [K] Sim3 states before PGO (s_old usually ones).
      *_new: [K] after PGO.
    """
    Ro = R_old[pt_ref_kf]
    to = t_old[pt_ref_kf]
    so = s_old[pt_ref_kf]
    Rn, tn, sn = (x[pt_ref_kf] for x in (R_new, t_new, s_new))
    # X in ref-KF frame under old state:
    Xc = so[:, None] * jnp.einsum("pij,pj->pi", Ro, X) + to
    # back to world under new state: S_new^-1
    Rni = jnp.swapaxes(Rn, -1, -2)
    return jnp.einsum("pij,pj->pi", Rni, Xc - tn) / sn[:, None]
