"""Large-map bundle adjustment: matrix-free preconditioned conjugate
gradients on the Schur complement.

Role of the reference's ``Optimizer::GlobalBundleAdjustemnt`` /
``FullInertialBA``'s visual part at map scale (orb_slam3/src/Optimizer.cc:52,
:392) — the reference hands g2o a sparse BlockSolver whose reduced camera
system grows with keyframe count. ``ba.bundle_adjust`` materializes the
dense [K, K, 6, 6] reduced system, which is the right call for the local-BA
window (K <= ~64) but O(K^2 P) in memory/compute for global BA.

Here the reduced system S = Hcc - W Hpp^-1 W^T is never formed. Every
matrix-vector product S @ x is four edge-table contractions plus two
scatter-adds:

    t_e = Jc_e x_{cam(e)}              [E,2]   (gather cameras)
    y_p = sum_e w_e Jp_e^T t_e         [P,3]   (scatter to points)
    z_p = Hpp_p^-1 y_p                 [P,3]   (batched 3x3 solve)
    Sx_k = Hcc_k x_k - sum_e w_e Jc_e^T Jp_e z_{pt(e)}   (scatter to cams)

which is exactly the shape GSPMD partitions cleanly: edges sharded over an
``obs`` mesh axis, points over ``pt``, cameras replicated — the
scatter-adds lower to psum/reduce-scatter over ICI (SURVEY §2.5 "new"
row: distributed BA camera/point blocks reduced via psum). Preconditioner
is block-Jacobi on the exact 6x6 diagonal blocks of S (each (cam, pt)
pair appears in at most one edge, so the per-edge scatter of
W_e Hpp^-1 W_e^T is exact).

The LM loop (damping, gain-ratio accept/reject, Huber IRLS) matches
``ba.bundle_adjust`` so callers can swap solvers by problem size.
Supports pinhole and KannalaBrandt8 residuals natively (``cam_model``),
covering the reference's fisheye BA edges (KannalaBrandt8.cpp projectJac
+ EdgeSE3ProjectXYZ) without rectification.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from . import cameras, lie, robust
from . import ba
from .ba import BAProblem, BAResult


def _proj_and_jac(cam_model: str, cam_params, Xc):
    if cam_model == "kb8":
        pred = cameras.kb8_project(cam_params, Xc)
        Jproj = jax.jacfwd(lambda p: cameras.kb8_project(cam_params, p))(Xc)
    else:
        pred = cameras.pinhole_project_nodist(cam_params, Xc)
        Jproj = cameras.pinhole_project_jac(cam_params, Xc)
    return pred, Jproj


def _edge_res_jac(R, t, X, uv, ur, bf, cam_params, cam_model):
    """(u, v, u_r) residual like ba._edge_res_jac; the stereo row is
    active only for pinhole edges with ur >= 0."""
    Xc = jnp.einsum("ij,j->i", R, X) + t
    pred, Jproj = _proj_and_jac(cam_model, cam_params, Xc)
    has_st = (ur >= 0).astype(X.dtype) if cam_model != "kb8" else jnp.zeros((), X.dtype)
    z = Xc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    ur_pred = pred[0] - bf / z_safe
    r = jnp.concatenate([pred - uv, (has_st * (ur_pred - ur))[None]])
    Jur = Jproj[0] + jnp.asarray([0.0, 0.0, 1.0], X.dtype) * (bf / z_safe**2)
    Jproj3 = jnp.concatenate([Jproj, (has_st * Jur)[None]], axis=0)
    Jc = Jproj3 @ jnp.concatenate([jnp.eye(3, dtype=X.dtype), -lie.hat(Xc)], axis=-1)
    Jp = Jproj3 @ R
    return r, Jc, Jp


@partial(jax.jit, static_argnames=("n_iters", "n_cg", "use_robust", "cam_model"))
def bundle_adjust_pcg(
    prob: BAProblem,
    n_iters: int = 10,
    n_cg: int = 50,
    chi2_th: float = robust.CHI2_MONO,
    use_robust: bool = True,
    lam0: float = 1e-3,
    cam_model: str = "pinhole",
) -> BAResult:
    """LM bundle adjustment with matrix-free Schur-PCG camera solves.

    Same contract as ``ba.bundle_adjust``; use for K beyond the dense
    Schur regime (global BA, map merges) and as the sharded multi-chip
    kernel (see parallel/dist_ba.py).
    """
    K = prob.R.shape[0]
    P = prob.X.shape[0]
    dtype = prob.R.dtype
    # Per-edge threshold: stereo (u, v, u_r) edges get the 3-DoF gate.
    delta2 = jnp.where(prob.ur >= 0, 7.815, chi2_th)

    vedge = jax.vmap(
        lambda R, t, X, uv, ur: _edge_res_jac(
            R, t, X, uv, ur, prob.bf, prob.cam_params, cam_model
        )
    )

    def gather_edges(R, t, X):
        return vedge(
            R[prob.cam_idx], t[prob.cam_idx], X[prob.pt_idx], prob.uv, prob.ur
        )

    def chi2_of(R, t, X):
        r, _, _ = gather_edges(R, t, X)
        return jnp.sum(r * r, axis=-1) * prob.inv_sigma2

    def cost_of(R, t, X):
        chi2 = chi2_of(R, t, X)
        if use_robust:
            rho = jnp.where(
                chi2 <= delta2,
                chi2,
                2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2,
            )
        else:
            rho = chi2
        return jnp.sum(jnp.where(prob.edge_valid, rho, 0.0))

    free = (prob.cam_valid & ~prob.cam_fixed).astype(dtype)  # [K]
    ptm = prob.pt_valid.astype(dtype)  # [P]

    def step(carry, _):
        R, t, X, lam, cost = carry
        r, Jc, Jp = gather_edges(R, t, X)  # [E,2],[E,2,6],[E,2,3]
        chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
        w_rob = robust.huber_weight(chi2, delta2) if use_robust else jnp.ones_like(chi2)
        w = prob.inv_sigma2 * w_rob * prob.edge_valid.astype(dtype)  # [E]

        # Block-diagonal accumulations (no K x P coupling tensor).
        JcW = Jc * w[:, None, None]
        JpW = Jp * w[:, None, None]
        Hcc = jnp.zeros((K, 6, 6), dtype).at[prob.cam_idx].add(
            jnp.einsum("eia,eib->eab", JcW, Jc)
        )
        Hpp = jnp.zeros((P, 3, 3), dtype).at[prob.pt_idx].add(
            jnp.einsum("eia,eib->eab", JpW, Jp)
        )
        gc = jnp.zeros((K, 6), dtype).at[prob.cam_idx].add(
            -jnp.einsum("eia,ei->ea", JcW, r)
        )
        gp = jnp.zeros((P, 3), dtype).at[prob.pt_idx].add(
            -jnp.einsum("eia,ei->ea", JpW, r)
        )

        eye6 = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-6)[
            ..., :, None
        ] * eye6
        Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-6)[
            ..., :, None
        ] * eye3
        Hpp_inv = ba.inv3x3(Hpp_d) * ptm[:, None, None]

        Hpi_e = Hpp_inv[prob.pt_idx]  # [E,3,3]

        # rhs = gc - W Hpp^-1 gp   (matrix-free)
        zg = jnp.einsum("pab,pb->pa", Hpp_inv, gp)  # [P,3]
        v = jnp.einsum("eia,eib,eb->ea", JcW, Jp, zg[prob.pt_idx])  # [E,6]
        rhs = (gc - jnp.zeros((K, 6), dtype).at[prob.cam_idx].add(v)) * free[:, None]

        # Exact 6x6 diagonal blocks of S for the block-Jacobi preconditioner.
        We = jnp.einsum("eia,eib->eab", JcW, Jp)  # [E,6,3] = w Jc^T Jp
        De = jnp.einsum("eab,ebc,edc->ead", We, Hpi_e, We)  # [E,6,6]
        S_diag = Hcc_d - jnp.zeros((K, 6, 6), dtype).at[prob.cam_idx].add(De)
        S_diag = S_diag * free[:, None, None] + (1.0 - free)[:, None, None] * eye6
        Minv = jnp.linalg.inv(S_diag)

        def S_mv(x):  # x [K,6] -> [K,6]
            xm = x * free[:, None]
            te = jnp.einsum("eia,ea->ei", Jc, xm[prob.cam_idx])  # [E,2]
            ue = jnp.einsum("eib,ei->eb", JpW, te)  # [E,3]
            y = jnp.zeros((P, 3), dtype).at[prob.pt_idx].add(ue)
            z = jnp.einsum("pab,pb->pa", Hpp_inv, y)
            se = jnp.einsum("eib,eb->ei", Jp, z[prob.pt_idx])  # [E,2]
            ve = jnp.einsum("eia,ei->ea", JcW, se)  # [E,6]
            WHWx = jnp.zeros((K, 6), dtype).at[prob.cam_idx].add(ve)
            out = jnp.einsum("kab,kb->ka", Hcc_d, xm) - WHWx
            return out * free[:, None]

        # PCG on S delta_c = rhs.
        x0 = jnp.zeros((K, 6), dtype)
        r0 = rhs
        z0 = jnp.einsum("kab,kb->ka", Minv, r0)
        p0 = z0
        rz0 = jnp.sum(r0 * z0)

        def cg_step(_, st):
            x, rr, p, rz = st
            Sp = S_mv(p)
            pSp = jnp.sum(p * Sp)
            alpha = rz / jnp.where(jnp.abs(pSp) < 1e-20, 1e-20, pSp)
            x = x + alpha * p
            rr = rr - alpha * Sp
            z = jnp.einsum("kab,kb->ka", Minv, rr)
            rz_new = jnp.sum(rr * z)
            beta = rz_new / jnp.where(jnp.abs(rz) < 1e-20, 1e-20, rz)
            p = z + beta * p
            return (x, rr, p, rz_new)

        delta_c, _, _, _ = jax.lax.fori_loop(0, n_cg, cg_step, (x0, r0, p0, rz0))
        delta_c = delta_c * free[:, None]

        # Back-substitute points: delta_p = Hpp^-1 (gp - W^T delta_c).
        te = jnp.einsum("eia,ea->ei", Jc, delta_c[prob.cam_idx])
        ue = jnp.einsum("eib,ei->eb", JpW, te)
        Wt_dc = jnp.zeros((P, 3), dtype).at[prob.pt_idx].add(ue)
        delta_p = jnp.einsum("pab,pb->pa", Hpp_inv, gp - Wt_dc) * ptm[:, None]

        dR, dt = lie.se3_exp(delta_c)
        freeb = free[:, None, None] > 0
        R_new = jnp.where(freeb, lie.normalize_rotation(dR @ R), R)
        t_new = jnp.where(free[:, None] > 0, jnp.einsum("kij,kj->ki", dR, t) + dt, t)
        X_new = X + delta_p

        cost_new = cost_of(R_new, t_new, X_new)
        better = cost_new < cost
        R = jnp.where(better, R_new, R)
        t = jnp.where(better, t_new, t)
        X = jnp.where(better, X_new, X)
        lam = jnp.where(better, jnp.maximum(lam * 0.4, 1e-8), jnp.minimum(lam * 5.0, 1e6))
        cost = jnp.where(better, cost_new, cost)
        return (R, t, X, lam, cost), cost

    cost0 = cost_of(prob.R, prob.t, prob.X)
    (R, t, X, lam, cost), _ = jax.lax.scan(
        step,
        (prob.R, prob.t, prob.X, jnp.asarray(lam0, dtype), cost0),
        None,
        length=n_iters,
    )
    chi2 = chi2_of(R, t, X)
    inlier = prob.edge_valid & (chi2 <= delta2)
    return BAResult(
        R=R, t=t, X=X, chi2=chi2, inlier=inlier, cost=cost,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
    )
