"""Bundle adjustment: batched Levenberg-Marquardt with explicit Schur
complement over fixed-capacity edge tables.

Role of the reference's ``Optimizer::LocalBundleAdjustment`` /
``GlobalBundleAdjustemnt`` (orb_slam3/src/Optimizer.cc:1118-1504 and :52-390)
and of the vendored g2o machinery they drive (BlockSolver_6_3 with
Schur-marginalized landmarks + OptimizationAlgorithmLevenberg). The
reference's own explicit-Schur ``Optimizer::Marginalize`` (Optimizer.cc:3105)
documents the math being reproduced here.

TPU-first design:
- **edge tables, not graphs**: every observation is a row
  (cam_idx, pt_idx, uv, inv_sigma2, valid) in a fixed-capacity array;
  per-edge residuals/Jacobians are vmapped, block sums use scatter-adds.
- **dense-masked Schur**: the camera-point coupling W = Jc^T Jp is
  scattered into a dense [K, P, 6, 3] tensor and the reduced camera
  system S = Hcc - W Hpp^-1 W^T becomes two einsums — MXU contractions —
  instead of sparse pointer chasing. For the local-BA regime
  (K <= ~64 cameras, P <= ~16k points) this is well within HBM.
- **robust IRLS**: Huber reweighting per iteration (g2o kernels).
- **abortable**: the iteration loop is chunked by the caller (the
  reference interrupts local BA via mbAbortBA between g2o iterations;
  here the caller simply stops scheduling further chunks).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cameras, lie, robust


class BAProblem(NamedTuple):
    """Fixed-capacity BA problem (the array-of-structs analogue of the
    local-BA subgraph the reference assembles at Optimizer.cc:1120-1210)."""

    R: jnp.ndarray  # [K,3,3] Tcw rotations
    t: jnp.ndarray  # [K,3]
    cam_fixed: jnp.ndarray  # [K] bool — gauge/fixed observers
    cam_valid: jnp.ndarray  # [K] bool — slot in use
    X: jnp.ndarray  # [P,3] world points
    pt_valid: jnp.ndarray  # [P] bool
    cam_idx: jnp.ndarray  # [E] int32
    pt_idx: jnp.ndarray  # [E] int32
    uv: jnp.ndarray  # [E,2]
    inv_sigma2: jnp.ndarray  # [E]
    edge_valid: jnp.ndarray  # [E] bool
    cam_params: jnp.ndarray  # [9] shared pinhole
    # Stereo observations: right-image x-coordinate per edge (-1 = mono)
    # and fx*baseline. Edges with ur >= 0 contribute the 3-dim
    # (u, v, u_r) residual of the reference's EdgeStereo
    # (G2oTypes.h:425, Optimizer.cc:1260) with u_r_pred = u - bf/z.
    ur: jnp.ndarray  # [E]
    bf: jnp.ndarray  # [] scalar


class BAResult(NamedTuple):
    R: jnp.ndarray
    t: jnp.ndarray
    X: jnp.ndarray
    chi2: jnp.ndarray  # [E] final sigma-normalized chi2
    inlier: jnp.ndarray  # [E]
    cost: jnp.ndarray  # [] final robust cost
    n_inliers: jnp.ndarray


def inv3x3(A: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (cofactor) batched 3x3 inverse — ~30 flops per matrix,
    fully vectorized. ``jnp.linalg.inv`` lowers to batched LU whose row
    pivoting serializes on TPU (measured several ms for [2048,3,3])."""
    a, b, c = A[..., 0, 0], A[..., 0, 1], A[..., 0, 2]
    d, e, f = A[..., 1, 0], A[..., 1, 1], A[..., 1, 2]
    g, h, i = A[..., 2, 0], A[..., 2, 1], A[..., 2, 2]
    A11 = e * i - f * h
    A12 = c * h - b * i
    A13 = b * f - c * e
    A21 = f * g - d * i
    A22 = a * i - c * g
    A23 = c * d - a * f
    A31 = d * h - e * g
    A32 = b * g - a * h
    A33 = a * e - b * d
    det = a * A11 + b * A21 + c * A31
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    cof = jnp.stack(
        [
            jnp.stack([A11, A12, A13], axis=-1),
            jnp.stack([A21, A22, A23], axis=-1),
            jnp.stack([A31, A32, A33], axis=-1),
        ],
        axis=-2,
    )
    return cof * inv_det[..., None, None]


def _edge_res_jac(R, t, X, uv, ur, bf, cam_params, cam_model: str = "pinhole"):
    """3-dim (u, v, u_r) residual/Jacobians; the u_r row is zeroed for
    monocular edges (ur < 0), which reduces exactly to the 2-dim case.
    ``cam_model`` selects the projection (pinhole | kb8; stereo rows are
    pinhole-only, like the reference's rectified-stereo EdgeStereo)."""
    Xc = jnp.einsum("ij,j->i", R, X) + t
    pred = cameras.project_model(cam_params, Xc, cam_model)
    Jproj = cameras.project_jac_model(cam_params, Xc, cam_model)  # [2,3]
    has_st = (ur >= 0).astype(X.dtype)
    if cam_model == "kb8":
        has_st = jnp.zeros((), X.dtype)
    z = Xc[2]
    z_safe = jnp.where(jnp.abs(z) < 1e-6, 1e-6, z)
    ur_pred = pred[0] - bf / z_safe
    r = jnp.concatenate([pred - uv, (has_st * (ur_pred - ur))[None]])
    # d(u_r)/dXc = d(u)/dXc + (bf/z^2) e_z
    Jur = Jproj[0] + jnp.asarray([0.0, 0.0, 1.0], X.dtype) * (bf / z_safe**2)
    Jproj3 = jnp.concatenate([Jproj, (has_st * Jur)[None]], axis=0)  # [3,3]
    Jc = Jproj3 @ jnp.concatenate([jnp.eye(3, dtype=X.dtype), -lie.hat(Xc)], axis=-1)
    Jp = Jproj3 @ R
    return r, Jc, Jp


def _gather_edges(prob: BAProblem, R, t, X, cam_model: str = "pinhole"):
    Re = R[prob.cam_idx]
    te = t[prob.cam_idx]
    Xe = X[prob.pt_idx]
    vedge = jax.vmap(
        lambda Re, te, Xe, uv, ur: _edge_res_jac(
            Re, te, Xe, uv, ur, prob.bf, prob.cam_params, cam_model
        ),
        in_axes=(0, 0, 0, 0, 0),
    )
    return vedge(Re, te, Xe, prob.uv, prob.ur)


def _robust_cost(chi2, w_valid, delta2):
    s = chi2
    rho = jnp.where(s <= delta2, s, 2.0 * jnp.sqrt(delta2 * jnp.maximum(s, 1e-12)) - delta2)
    return jnp.sum(jnp.where(w_valid, rho, 0.0))


@partial(jax.jit, static_argnames=("n_iters", "use_robust", "row_n", "rel_tol", "cam_model"))
def bundle_adjust(
    prob: BAProblem,
    n_iters: int = 10,
    chi2_th: float = robust.CHI2_MONO,
    use_robust: bool = True,
    lam0: float = 1e-3,
    row_n: int | None = None,
    rel_tol: float = 0.0,
    cam_model: str = "pinhole",
) -> BAResult:
    """Run ``n_iters`` LM iterations of full BA on the problem.

    ``row_n``: set when the edge table is ROW-STRUCTURED — edge e belongs
    to camera ``e // row_n`` AND each camera row binds each landmark at
    most once (the layout build_local_ba produces: one row of N feature
    slots per keyframe, rows injective in the landmark). The camera
    blocks then reduce along rows and the landmark blocks/camera-point
    couplings become per-(camera, landmark) GATHERS through an inverse
    observation table computed once per call — no scatter-adds, which
    XLA serializes on TPU. Results are numerically identical.

    ``rel_tol``: early termination — stop when an ACCEPTED step improves
    the robust cost by less than ``rel_tol`` of its value (g2o's
    terminate action; the reference's 5-iteration local BA calls rely on
    LM converging in 2-3 iterations on a warm map). 0 = run all
    ``n_iters`` (bit-identical to the fixed scan). Uses a while_loop, so
    converged solves return in a fraction of the fixed-schedule time —
    the local-BA latency lever at keyframe cadence.
    """
    K = prob.R.shape[0]
    P = prob.X.shape[0]
    dtype = prob.R.dtype
    # Per-edge chi2 threshold: 3-DoF stereo edges use the wider gate
    # (Optimizer.cc:1260 thHuberStereo).
    delta2 = jnp.where(prob.ur >= 0, robust.CHI2_STEREO, chi2_th)
    E = prob.cam_idx.shape[0]
    assert row_n is None or E == K * row_n, (
        "row_n layout requires one row of row_n edges per camera"
    )
    if row_n is not None:
        # inv_feat[k, p] = feature slot of landmark p in camera k's row
        # (row_n when unobserved), via fused compare-reduce.
        pt_rows = prob.pt_idx.reshape(K, row_n)
        ev = prob.edge_valid.reshape(K, row_n)
        eqp = (pt_rows[:, :, None] == jnp.arange(P, dtype=prob.pt_idx.dtype)) & ev[
            :, :, None
        ]
        inv_feat = jnp.min(
            jnp.where(eqp, jnp.arange(row_n, dtype=jnp.int32)[None, :, None], row_n),
            axis=1,
        )  # [K, P]
        obs_kp = (inv_feat < row_n)[..., None]  # [K, P, 1]
        fe = jnp.clip(inv_feat, 0, row_n - 1)

    def chi2_of(R, t, X):
        r, _, _ = _gather_edges(prob, R, t, X, cam_model)
        return jnp.sum(r * r, axis=-1) * prob.inv_sigma2

    def cost_of(R, t, X):
        chi2 = chi2_of(R, t, X)
        if use_robust:
            return _robust_cost(chi2, prob.edge_valid, delta2)
        return jnp.sum(jnp.where(prob.edge_valid, chi2, 0.0))

    def step(carry, _):
        R, t, X, lam, cost = carry[:5]
        r, Jc, Jp = _gather_edges(prob, R, t, X, cam_model)  # [E,3],[E,3,6],[E,3,3]
        chi2 = jnp.sum(r * r, axis=-1) * prob.inv_sigma2
        w_rob = robust.huber_weight(chi2, delta2) if use_robust else jnp.ones_like(chi2)
        w = prob.inv_sigma2 * w_rob * prob.edge_valid.astype(dtype)  # [E]

        # Block accumulations.
        JcW = Jc * w[:, None, None]
        JpW = Jp * w[:, None, None]
        if row_n is not None:
            # Row-structured: camera blocks reduce along each row; point
            # blocks and the camera-point coupling are gathered per
            # (camera, landmark) from per-edge outer products through
            # inv_feat (invalid edges carry w = 0 AND obs_kp = False).
            rw = r.reshape(K, row_n, 3)
            Jcw = Jc.reshape(K, row_n, 3, 6)
            Jpw = Jp.reshape(K, row_n, 3, 3)
            JcWw = JcW.reshape(K, row_n, 3, 6)
            JpWw = JpW.reshape(K, row_n, 3, 3)
            Hcc = jnp.einsum("wnia,wnib->wab", JcWw, Jcw)
            gc = -jnp.einsum("wnia,wni->wa", JcWw, rw)
            HppE = jnp.einsum("wnia,wnib->wnab", JpWw, Jpw).reshape(K, row_n, 9)
            gpE = -jnp.einsum("wnia,wni->wna", JpWw, rw)
            WcpE = jnp.einsum("wnia,wnib->wnab", JcWw, Jpw).reshape(K, row_n, 18)
            ga = lambda a: jnp.take_along_axis(  # noqa: E731
                a, fe[:, :, None], axis=1
            )
            Hpp = jnp.sum(ga(HppE) * obs_kp, axis=0).reshape(P, 3, 3)
            gp = jnp.sum(ga(gpE) * obs_kp, axis=0)  # [P,3]
            Wcp = (ga(WcpE) * obs_kp).reshape(K, P, 6, 3)
        else:
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
            Wcp = (
                jnp.zeros((K * P, 6, 3), dtype)
                .at[prob.cam_idx * P + prob.pt_idx]
                .add(jnp.einsum("eia,eib->eab", JcW, Jp))
                .reshape(K, P, 6, 3)
            )

        # Damping (Marquardt: scale diagonals).
        eye6 = jnp.eye(6, dtype=dtype)
        eye3 = jnp.eye(3, dtype=dtype)
        Hcc_d = Hcc + (lam * jnp.diagonal(Hcc, axis1=-2, axis2=-1) + 1e-6)[..., :, None] * eye6
        Hpp_d = Hpp + (lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-6)[..., :, None] * eye3

        Hpp_inv = inv3x3(Hpp_d)  # [P,3,3] batched closed-form

        # Schur reduction onto cameras.
        Y = jnp.einsum("kpab,pbc->kpac", Wcp, Hpp_inv)  # [K,P,6,3]
        S = -jnp.einsum("kpac,lpbc->klab", Y, Wcp)  # [K,K,6,6]
        S = S.at[jnp.arange(K), jnp.arange(K)].add(Hcc_d)
        rhs = gc - jnp.einsum("kpab,pb->ka", Y, gp)  # [K,6]

        # Fixed / invalid cameras: identity rows+cols, zero rhs.
        free = (prob.cam_valid & ~prob.cam_fixed).astype(dtype)  # [K]
        S = S * free[:, None, None, None] * free[None, :, None, None]
        S = S.at[jnp.arange(K), jnp.arange(K)].add(
            (1.0 - free)[:, None, None] * eye6
        )
        rhs = rhs * free[:, None]

        Smat = S.transpose(0, 2, 1, 3).reshape(K * 6, K * 6)
        # S is SPD after damping; Cholesky avoids LU's sequential pivot
        # search on TPU.
        chol = jax.scipy.linalg.cho_factor(Smat, lower=True)
        delta_c = jax.scipy.linalg.cho_solve(chol, rhs.reshape(K * 6)).reshape(K, 6)
        delta_c = delta_c * free[:, None]

        # Back-substitute points.
        rhs_p = gp - jnp.einsum("kpab,ka->pb", Wcp, delta_c)
        delta_p = jnp.einsum("pab,pb->pa", Hpp_inv, rhs_p)
        delta_p = delta_p * prob.pt_valid[:, None].astype(dtype)

        # Candidate update (fixed cameras bypass even the renormalization
        # so they stay bit-identical).
        dR, dt = lie.se3_exp(delta_c)
        freeb = free[:, None, None] > 0
        R_new = jnp.where(freeb, lie.normalize_rotation(dR @ R), R)
        t_new = jnp.where(free[:, None] > 0, jnp.einsum("kij,kj->ki", dR, t) + dt, t)
        X_new = X + delta_p

        cost_new = cost_of(R_new, t_new, X_new)
        better = cost_new < cost
        # converged: the accepted step no longer moves the cost
        done = better & (cost - cost_new <= rel_tol * cost)
        R = jnp.where(better, R_new, R)
        t = jnp.where(better, t_new, t)
        X = jnp.where(better, X_new, X)
        lam = jnp.where(better, jnp.maximum(lam * 0.4, 1e-8), jnp.minimum(lam * 5.0, 1e6))
        cost = jnp.where(better, cost_new, cost)
        return R, t, X, lam, cost, done

    cost0 = cost_of(prob.R, prob.t, prob.X)
    init = (prob.R, prob.t, prob.X, jnp.asarray(lam0, dtype), cost0)
    if rel_tol > 0.0:
        def w_cond(c):
            return (c[5] < n_iters) & ~c[6]

        def w_body(c):
            R, t, X, lam, cost, done = step(c[:5], None)
            return (R, t, X, lam, cost, c[5] + 1, done)

        R, t, X, lam, cost, _, _ = jax.lax.while_loop(
            w_cond, w_body, init + (jnp.asarray(0), jnp.asarray(False)),
        )
    else:
        (R, t, X, lam, cost), _ = jax.lax.scan(
            lambda c, _: (step(c, None)[:5], None), init, None,
            length=n_iters,
        )
    chi2 = chi2_of(R, t, X)
    inlier = prob.edge_valid & (chi2 <= delta2)
    return BAResult(
        R=R, t=t, X=X, chi2=chi2, inlier=inlier, cost=cost,
        n_inliers=jnp.sum(inlier.astype(jnp.int32)),
    )
