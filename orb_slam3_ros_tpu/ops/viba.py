"""Visual-inertial bundle adjustment + IMU initialization solvers.

Role of the reference's inertial optimizers (orb_slam3/src/Optimizer.cc):
``LocalInertialBA`` :2528 (temporal window, 15-dof body states, visual +
preintegration + bias-walk edges), ``FullInertialBA`` :392,
``InertialOptimization`` :3187/:3372 (gravity direction, scale, shared
biases, velocities with poses fixed) — and of the custom g2o factor zoo
they drive (G2oTypes.h: VertexPose/Velocity/GyroBias/AccBias/GDir/Scale,
EdgeInertial/EdgeInertialGS/EdgeGyroRW/EdgeAccRW).

TPU-first: the analytic Jacobians that fill G2oTypes.cc (863 LoC) are
replaced by forward-mode AD of the residual functions at the
linearization point — exact, fused into the same XLA program, and far
harder to get wrong. States are stacked arrays; factors are fixed-
capacity edge tables; the landmark block is Schur-eliminated like ba.py
with 15-dim body blocks.

Body state per keyframe: (R_wb [3,3], p_wb [3], v_w [3], bg [3], ba [3]).
Perturbation (15): [phi, dp, dv, dbg, dba] with R <- R exp(phi^),
p <- p + R dp (body-frame), the rest additive.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import cameras, imu, lie, robust
from .ba import inv3x3


class VIStates(NamedTuple):
    R_wb: jnp.ndarray  # [K,3,3]
    p_wb: jnp.ndarray  # [K,3]
    v_w: jnp.ndarray  # [K,3]
    bg: jnp.ndarray  # [K,3]
    ba: jnp.ndarray  # [K,3]


class VIBAProblem(NamedTuple):
    states: VIStates
    kf_fixed: jnp.ndarray  # [K] bool (pose+vel+bias all fixed)
    kf_valid: jnp.ndarray  # [K]
    X: jnp.ndarray  # [P,3]
    pt_valid: jnp.ndarray  # [P]
    # visual edges
    cam_idx: jnp.ndarray  # [E]
    pt_idx: jnp.ndarray  # [E]
    uv: jnp.ndarray  # [E,2]
    inv_sigma2: jnp.ndarray  # [E]
    edge_valid: jnp.ndarray  # [E]
    # inertial edges (consecutive KF pairs i -> j)
    ie_i: jnp.ndarray  # [Q] int32
    ie_j: jnp.ndarray  # [Q]
    ie_preint: imu.Preintegrated  # stacked [Q, ...]
    ie_valid: jnp.ndarray  # [Q]
    # calibration
    cam_params: jnp.ndarray  # [9]
    R_bc: jnp.ndarray  # [3,3] camera-in-body
    t_bc: jnp.ndarray  # [3]
    # stereo rows: observed right-image u (rectified, u_r = u - bf/z);
    # ur < 0 marks a mono-only edge. The reference's LocalInertialBA adds
    # EdgeStereo factors for these observations (G2oTypes.h:425,
    # Optimizer.cc:2606-2652) — without them stereo-/RGBD-inertial
    # windows lose the disparity observability that pins metric scale.
    ur: jnp.ndarray | None = None  # [E]
    bf: jnp.ndarray | float = 0.0  # fx * baseline


def _apply_pert(R, p, v, bg, ba, eps):
    """15-dim state perturbation."""
    R2 = R @ lie.so3_exp(eps[0:3])
    p2 = p + R @ eps[3:6]
    return R2, p2, v + eps[6:9], bg + eps[9:12], ba + eps[12:15]


def _visual_residual(eps_c, eps_p, R, p, X, uv, cam_params, R_bc, t_bc):
    """Reprojection residual of a world point through the body pose
    (EdgeMono with ImuCamPose projection, G2oTypes.h:342)."""
    R2 = R @ lie.so3_exp(eps_c[0:3])
    p2 = p + R @ eps_c[3:6]
    Xw = X + eps_p
    Xb = R2.T @ (Xw - p2)
    Xc = R_bc.T @ (Xb - t_bc)
    return cameras.pinhole_project_nodist(cam_params, Xc) - uv


def _visual_residual3(eps_c, eps_p, R, p, X, uv, ur, cam_params, R_bc, t_bc, bf):
    """(u, v, u_r) residual through the body pose — EdgeMono rows plus
    the EdgeStereo disparity row (G2oTypes.h:425). The caller masks the
    third row for mono edges (ur < 0)."""
    R2 = R @ lie.so3_exp(eps_c[0:3])
    p2 = p + R @ eps_c[3:6]
    Xw = X + eps_p
    Xb = R2.T @ (Xw - p2)
    Xc = R_bc.T @ (Xb - t_bc)
    uvp = cameras.pinhole_project_nodist(cam_params, Xc)
    z = jnp.maximum(Xc[2], 1e-6)
    return jnp.concatenate([uvp - uv, (uvp[0] - bf / z - ur)[None]])


def _inertial_residual24(eps, Ri, pi, vi, bgi, bai, Rj, pj, vj, preint):
    """9-dim preintegration residual as a function of the 24-dim stacked
    perturbation [state_i(15), pose_j(6), dv_j(3)] (EdgeInertial)."""
    Ri2, pi2, vi2, bgi2, bai2 = _apply_pert(Ri, pi, vi, bgi, bai, eps[0:15])
    Rj2 = Rj @ lie.so3_exp(eps[15:18])
    pj2 = pj + Rj @ eps[18:21]
    vj2 = vj + eps[21:24]
    b1 = jnp.concatenate([bgi2, bai2])
    return imu.inertial_residual(Ri2, pi2, vi2, b1, Rj2, pj2, vj2, preint)


def _info_from_cov(C, dim_slice, eps=1e-8):
    """Robust inverse of a covariance block (the reference takes
    ``.inverse()`` of the 9x9 / 3x3 blocks, G2oTypes.h:509)."""
    Cb = C[dim_slice, dim_slice]
    Cb = 0.5 * (Cb + Cb.T) + eps * jnp.eye(Cb.shape[0], dtype=C.dtype)
    return jnp.linalg.inv(Cb)


class VIBAResult(NamedTuple):
    states: VIStates
    X: jnp.ndarray
    cost: jnp.ndarray
    chi2_visual: jnp.ndarray  # [E]
    inlier: jnp.ndarray  # [E]
    # Final LM damping — lets a chunked caller resume the solve where it
    # left off (pass back as lam0) instead of restarting the trust region.
    lam: jnp.ndarray | None = None


@partial(jax.jit, static_argnames=("n_iters", "use_robust", "row_n"))
def vi_bundle_adjust(
    prob: VIBAProblem,
    n_iters: int = 8,
    chi2_th: float = robust.CHI2_MONO,
    use_robust: bool = True,
    bias_prior_g: float = 0.0,
    bias_prior_a: float = 0.0,
    lam0: float = 1e-3,
    row_n: int | None = None,
) -> VIBAResult:
    """Joint visual-inertial LM with Schur-eliminated landmarks.

    ``bias_prior_*``: zero-mean bias priors (the reference's
    priorG/priorA schedule during IMU init, LocalMapping.cc:184-227 /
    Optimizer.cc:392 FullInertialBA with EdgePriorGyro/Acc).

    ``row_n``: set when the edge table is row-structured (one row of
    row_n feature slots per window keyframe, rows injective in the
    landmark — build_vi_ba's layout): the visual block accumulations
    become row reductions + per-(camera, landmark) gathers instead of
    scatter-adds, which XLA serializes on TPU (the same lesson as
    ba.bundle_adjust's row_n path; measured ~0.6 s/solve at E=12k).
    """
    st0 = prob.states
    K = st0.R_wb.shape[0]
    P = prob.X.shape[0]
    D = 15
    dtype = prob.X.dtype

    # Stereo rows: per-edge (u,v,u_r) with the third row masked for mono
    # edges; stereo edges get the 3-DoF chi2 gate (CHI2_STEREO vs
    # CHI2_MONO scaling of the caller's threshold, Optimizer.cc:2606).
    ur = prob.ur if prob.ur is not None else jnp.full_like(prob.uv[:, 0], -1.0)
    bf = jnp.asarray(prob.bf, dtype)
    has_ur = (ur >= 0.0) & (bf > 0.0)
    rmask = jnp.concatenate(
        [jnp.ones((ur.shape[0], 2), dtype), has_ur[:, None].astype(dtype)], 1
    )  # [E,3]
    delta2 = jnp.where(
        has_ur, chi2_th * (robust.CHI2_STEREO / robust.CHI2_MONO), chi2_th
    )
    ur_s = jnp.where(has_ur, ur, 0.0)

    ie_info = jax.vmap(lambda C: _info_from_cov(C, slice(0, 9)))(prob.ie_preint.C)
    # Bias random-walk info from the walk blocks of the covariance
    # (EdgeGyroRW/EdgeAccRW use C[9:12]/[12:15], G2oTypes.h:635).
    info_bgw = jax.vmap(lambda C: _info_from_cov(C, slice(9, 12)))(prob.ie_preint.C)
    info_baw = jax.vmap(lambda C: _info_from_cov(C, slice(12, 15)))(prob.ie_preint.C)

    vres_fn = jax.vmap(
        lambda R, p, X, uv, u_r: _visual_residual3(
            jnp.zeros(6, dtype), jnp.zeros(3, dtype), R, p, X, uv, u_r,
            prob.cam_params, prob.R_bc, prob.t_bc, bf,
        )
    )
    vjac_fn = jax.vmap(
        lambda R, p, X, uv, u_r: (
            jax.jacfwd(
                lambda e: _visual_residual3(
                    e, jnp.zeros(3, dtype), R, p, X, uv, u_r,
                    prob.cam_params, prob.R_bc, prob.t_bc, bf,
                )
            )(jnp.zeros(6, dtype)),
            jax.jacfwd(
                lambda e: _visual_residual3(
                    jnp.zeros(6, dtype), e, R, p, X, uv, u_r,
                    prob.cam_params, prob.R_bc, prob.t_bc, bf,
                )
            )(jnp.zeros(3, dtype)),
        )
    )
    ires_fn = jax.vmap(
        lambda Ri, pi, vi, bgi, bai, Rj, pj, vj, pre: _inertial_residual24(
            jnp.zeros(24, dtype), Ri, pi, vi, bgi, bai, Rj, pj, vj, pre
        )
    )
    ijac_fn = jax.vmap(
        lambda Ri, pi, vi, bgi, bai, Rj, pj, vj, pre: jax.jacfwd(
            lambda e: _inertial_residual24(e, Ri, pi, vi, bgi, bai, Rj, pj, vj, pre)
        )(jnp.zeros(24, dtype))
    )

    E = prob.cam_idx.shape[0]
    assert row_n is None or E == K * row_n, (
        "row_n layout requires one row of row_n edges per camera"
    )
    if row_n is not None:
        # inv_feat[k, p] = feature slot of landmark p in camera k's row
        # (row_n when unobserved), via fused compare-reduce.
        pt_rows = prob.pt_idx.reshape(K, row_n)
        ev = prob.edge_valid.reshape(K, row_n)
        eqp = (
            pt_rows[:, :, None] == jnp.arange(P, dtype=prob.pt_idx.dtype)
        ) & ev[:, :, None]
        inv_feat = jnp.min(
            jnp.where(
                eqp, jnp.arange(row_n, dtype=jnp.int32)[None, :, None], row_n
            ),
            axis=1,
        )  # [K, P]
        obs_kp = (inv_feat < row_n)[..., None]
        fe = jnp.clip(inv_feat, 0, row_n - 1)

    def gather_visual(st: VIStates, X):
        R = st.R_wb[prob.cam_idx]
        p = st.p_wb[prob.cam_idx]
        Xe = X[prob.pt_idx]
        r = vres_fn(R, p, Xe, prob.uv, ur_s) * rmask
        return r

    def total_cost(st, X):
        r = gather_visual(st, X)
        chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
        if use_robust:
            s = chi2
            rho = jnp.where(
                s <= delta2, s, 2.0 * jnp.sqrt(delta2 * jnp.maximum(s, 1e-12)) - delta2
            )
        else:
            rho = chi2
        c_vis = jnp.sum(jnp.where(prob.edge_valid, rho, 0.0))
        ri = ires_fn(
            st.R_wb[prob.ie_i], st.p_wb[prob.ie_i], st.v_w[prob.ie_i],
            st.bg[prob.ie_i], st.ba[prob.ie_i],
            st.R_wb[prob.ie_j], st.p_wb[prob.ie_j], st.v_w[prob.ie_j],
            prob.ie_preint,
        )
        c_in = jnp.sum(
            jnp.where(
                prob.ie_valid, jnp.einsum("qi,qij,qj->q", ri, ie_info, ri), 0.0
            )
        )
        dbg = st.bg[prob.ie_j] - st.bg[prob.ie_i]
        dba = st.ba[prob.ie_j] - st.ba[prob.ie_i]
        c_rw = jnp.sum(
            jnp.where(
                prob.ie_valid,
                jnp.einsum("qi,qij,qj->q", dbg, info_bgw, dbg)
                + jnp.einsum("qi,qij,qj->q", dba, info_baw, dba),
                0.0,
            )
        )
        c_prior = bias_prior_g * jnp.sum(st.bg * st.bg) + bias_prior_a * jnp.sum(
            st.ba * st.ba
        )
        return c_vis + c_in + c_rw + c_prior

    # ``kf_fixed`` freezes only the 6-dof pose (the reference's fixed KFs
    # get a fixed VertexPose but their velocity/bias vertices stay free,
    # Optimizer.cc FullInertialBA/LocalInertialBA); velocities and biases
    # are free for every valid keyframe.
    free_pose = (prob.kf_valid & ~prob.kf_fixed).astype(dtype)  # [K]
    free_vb = prob.kf_valid.astype(dtype)
    free_d = jnp.concatenate(
        [
            jnp.repeat(free_pose[:, None], 6, axis=1),
            jnp.repeat(free_vb[:, None], 9, axis=1),
        ],
        axis=1,
    )  # [K, 15]
    free = free_pose  # pose gate used for the rotation/position update

    def step(carry, _):
        st, X, lam, cost = carry
        H = jnp.zeros((K, K, D, D), dtype)
        g = jnp.zeros((K, D), dtype)

        # ---- visual edges ----
        Re = st.R_wb[prob.cam_idx]
        pe = st.p_wb[prob.cam_idx]
        Xe = X[prob.pt_idx]
        r = vres_fn(Re, pe, Xe, prob.uv, ur_s) * rmask
        Jc6, Jp = vjac_fn(Re, pe, Xe, prob.uv, ur_s)  # [E,3,6], [E,3,3]
        Jc6 = Jc6 * rmask[:, :, None]
        Jp = Jp * rmask[:, :, None]
        chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
        w_rob = robust.huber_weight(chi2, delta2) if use_robust else jnp.ones_like(chi2)
        w = prob.inv_sigma2 * w_rob * prob.edge_valid.astype(dtype)
        JcW = Jc6 * w[:, None, None]
        JpW = Jp * w[:, None, None]
        if row_n is not None:
            # Scatter-free row-structured accumulation (see docstring).
            rw = r.reshape(K, row_n, 3)
            Jcw = Jc6.reshape(K, row_n, 3, 6)
            Jpw = Jp.reshape(K, row_n, 3, 3)
            JcWw = JcW.reshape(K, row_n, 3, 6)
            JpWw = JpW.reshape(K, row_n, 3, 3)
            Hcc6 = jnp.einsum("wnia,wnib->wab", JcWw, Jcw)
            H = H.at[jnp.arange(K), jnp.arange(K), :6, :6].add(Hcc6)
            g = g.at[:, :6].add(-jnp.einsum("wnia,wni->wa", JcWw, rw))
            HppE = jnp.einsum("wnia,wnib->wnab", JpWw, Jpw).reshape(K, row_n, 9)
            gpE = -jnp.einsum("wnia,wni->wna", JpWw, rw)
            WcpE = jnp.einsum("wnia,wnib->wnab", JcWw, Jpw).reshape(K, row_n, 18)
            ga = lambda a: jnp.take_along_axis(  # noqa: E731
                a, fe[:, :, None], axis=1
            )
            Hpp = jnp.sum(ga(HppE) * obs_kp, axis=0).reshape(P, 3, 3)
            gp = jnp.sum(ga(gpE) * obs_kp, axis=0)
            Wcp = (ga(WcpE) * obs_kp).reshape(K, P, 6, 3)
        else:
            H = H.at[prob.cam_idx, prob.cam_idx, :6, :6].add(
                jnp.einsum("eia,eib->eab", JcW, Jc6)
            )
            g = g.at[prob.cam_idx, :6].add(-jnp.einsum("eia,ei->ea", JcW, r))
            Hpp = jnp.zeros((P, 3, 3), dtype).at[prob.pt_idx].add(
                jnp.einsum("eia,eib->eab", JpW, Jp)
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

        # ---- inertial edges ----
        ri = ires_fn(
            st.R_wb[prob.ie_i], st.p_wb[prob.ie_i], st.v_w[prob.ie_i],
            st.bg[prob.ie_i], st.ba[prob.ie_i],
            st.R_wb[prob.ie_j], st.p_wb[prob.ie_j], st.v_w[prob.ie_j],
            prob.ie_preint,
        )  # [Q,9]
        Ji = ijac_fn(
            st.R_wb[prob.ie_i], st.p_wb[prob.ie_i], st.v_w[prob.ie_i],
            st.bg[prob.ie_i], st.ba[prob.ie_i],
            st.R_wb[prob.ie_j], st.p_wb[prob.ie_j], st.v_w[prob.ie_j],
            prob.ie_preint,
        )  # [Q,9,24]
        wq = prob.ie_valid.astype(dtype)
        InfoW = ie_info * wq[:, None, None]
        JtI = jnp.einsum("qia,qij->qaj", Ji, InfoW)  # [Q,24,9]
        Hq = jnp.einsum("qaj,qjb->qab", JtI, Ji)  # [Q,24,24]
        gq = -jnp.einsum("qaj,qj->qa", JtI, ri)  # [Q,24]
        ii, jj = prob.ie_i, prob.ie_j
        H = H.at[ii, ii].add(Hq[:, 0:15, 0:15])
        H = H.at[jj, jj, 0:6, 0:6].add(Hq[:, 15:21, 15:21])
        H = H.at[jj, jj, 0:6, 6:9].add(Hq[:, 15:21, 21:24])
        H = H.at[jj, jj, 6:9, 0:6].add(Hq[:, 21:24, 15:21])
        H = H.at[jj, jj, 6:9, 6:9].add(Hq[:, 21:24, 21:24])
        H = H.at[ii, jj, :, 0:6].add(Hq[:, 0:15, 15:21])
        H = H.at[ii, jj, :, 6:9].add(Hq[:, 0:15, 21:24])
        H = H.at[jj, ii, 0:6, :].add(Hq[:, 15:21, 0:15])
        H = H.at[jj, ii, 6:9, :].add(Hq[:, 21:24, 0:15])
        g = g.at[ii].add(gq[:, 0:15])
        g = g.at[jj, 0:6].add(gq[:, 15:21])
        g = g.at[jj, 6:9].add(gq[:, 21:24])

        # ---- bias random-walk edges (r = b_j - b_i) ----
        dbg = st.bg[jj] - st.bg[ii]
        dba = st.ba[jj] - st.ba[ii]
        for info, dvec, off in ((info_bgw, dbg, 9), (info_baw, dba, 12)):
            infoW = info * wq[:, None, None]
            H = H.at[ii, ii, off : off + 3, off : off + 3].add(infoW)
            H = H.at[jj, jj, off : off + 3, off : off + 3].add(infoW)
            H = H.at[ii, jj, off : off + 3, off : off + 3].add(-infoW)
            H = H.at[jj, ii, off : off + 3, off : off + 3].add(-infoW)
            gv = jnp.einsum("qij,qj->qi", infoW, dvec)
            g = g.at[ii, off : off + 3].add(gv)
            g = g.at[jj, off : off + 3].add(-gv)

        # ---- bias priors (pull to zero; zero weight is a no-op) ----
        diag_idx = jnp.arange(K)
        pr = jnp.zeros((D,), dtype)
        pr = pr.at[9:12].set(bias_prior_g).at[12:15].set(bias_prior_a)
        H = H.at[diag_idx, diag_idx].add(jnp.diag(pr))
        g = g - jnp.concatenate(
            [
                jnp.zeros((K, 9), dtype),
                bias_prior_g * st.bg,
                bias_prior_a * st.ba,
            ],
            axis=1,
        )

        # ---- damping + fixed masking + Schur ----
        eye = jnp.eye(D, dtype=dtype)
        diagH = jnp.diagonal(H[jnp.arange(K), jnp.arange(K)], axis1=-2, axis2=-1)
        H = H.at[jnp.arange(K), jnp.arange(K)].add(
            (lam * diagH + 1e-6)[..., :, None] * eye
        )
        Hpp_d = Hpp + (
            lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-6
        )[..., :, None] * jnp.eye(3, dtype=dtype)
        # Closed-form 3x3 inverse: batched LU serializes on TPU
        # (same lesson as ba.py inv3x3; measured ~0.5 s at P=4096).
        Hpp_inv = inv3x3(Hpp_d)
        Y = jnp.einsum("kpab,pbc->kpac", Wcp, Hpp_inv)  # [K,P,6,3]
        S_vis = -jnp.einsum("kpac,lpbc->klab", Y, Wcp)  # [K,K,6,6]
        H = H.at[:, :, :6, :6].add(S_vis)
        rhs = g.at[:, :6].add(-jnp.einsum("kpab,pb->ka", Y, gp))

        Hm = H * free_d[:, None, :, None] * free_d[None, :, None, :]
        Hm = Hm.at[jnp.arange(K), jnp.arange(K)].add(
            jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(1.0 - free_d)
        )
        rhs = rhs * free_d
        # Damped+masked Hm is SPD: Cholesky instead of LU (LU's row
        # pivoting serializes on TPU; ~10x at this size).
        Hm_flat = Hm.transpose(0, 2, 1, 3).reshape(K * D, K * D)
        delta = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hm_flat, lower=True),
            rhs.reshape(K * D),
        ).reshape(K, D)
        delta = delta * free_d

        rhs_p = gp - jnp.einsum("kpab,ka->pb", Wcp, delta[:, :6])
        delta_p = jnp.einsum("pab,pb->pa", Hpp_inv, rhs_p) * prob.pt_valid[:, None].astype(dtype)

        # candidate update
        newR = jnp.einsum("kij,kjl->kil", st.R_wb, lie.so3_exp(delta[:, 0:3]))
        newR = lie.normalize_rotation(newR)
        newp = st.p_wb + jnp.einsum("kij,kj->ki", st.R_wb, delta[:, 3:6])
        st_new = VIStates(
            R_wb=jnp.where(free[:, None, None] > 0, newR, st.R_wb),
            p_wb=jnp.where(free[:, None] > 0, newp, st.p_wb),
            v_w=st.v_w + delta[:, 6:9],
            bg=st.bg + delta[:, 9:12],
            ba=st.ba + delta[:, 12:15],
        )
        X_new = X + delta_p
        cost_new = total_cost(st_new, X_new)
        better = cost_new < cost
        st = jax.tree.map(
            lambda a, b: jnp.where(
                jnp.reshape(better, (1,) * a.ndim), b, a
            ),
            st, st_new,
        )
        X = jnp.where(better, X_new, X)
        lam = jnp.where(better, jnp.maximum(lam * 0.4, 1e-8), jnp.minimum(lam * 5.0, 1e6))
        cost = jnp.where(better, cost_new, cost)
        return (st, X, lam, cost), None

    cost0 = total_cost(st0, prob.X)
    (st, X, lam, cost), _ = jax.lax.scan(
        step, (st0, prob.X, jnp.asarray(lam0, dtype), cost0), None, length=n_iters
    )
    r = gather_visual(st, X)
    chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
    inlier = prob.edge_valid & (chi2 <= delta2)
    return VIBAResult(
        states=st, X=X, cost=cost, chi2_visual=chi2, inlier=inlier, lam=lam
    )


# ---------------------------------------------------------------------------
# Full inertial BA with gravity-direction + scale vertices (EdgeInertialGS)
# ---------------------------------------------------------------------------


def _inertial_residual_gs27(eps, Ri, pi, vi, bgi, bai, Rj, pj, vj, preint, Rwg, s):
    """9-dim GS preintegration residual over the 27-dim stacked perturbation
    [state_i(15), pose_j(6), dv_j(3), dtheta_g(2), dlog_s(1)] — the
    reference's EdgeInertialGS multi-edge (G2oTypes.h:548) with its
    VertexGDir (2-dof) and VertexScale vertices."""
    Ri2, pi2, vi2, bgi2, bai2 = _apply_pert(Ri, pi, vi, bgi, bai, eps[0:15])
    Rj2 = Rj @ lie.so3_exp(eps[15:18])
    pj2 = pj + Rj @ eps[18:21]
    vj2 = vj + eps[21:24]
    dth = jnp.concatenate([eps[24:26], jnp.zeros((1,), eps.dtype)])
    Rwg2 = Rwg @ lie.so3_exp(dth)
    s2 = s * jnp.exp(eps[26])
    g_w = Rwg2 @ jnp.asarray([0.0, 0.0, -imu.GRAVITY], eps.dtype)
    b1 = jnp.concatenate([bgi2, bai2])
    return imu.inertial_residual_gs(Ri2, pi2, vi2, b1, Rj2, pj2, vj2, preint, g_w, s2)


class VIBAGSResult(NamedTuple):
    states: VIStates
    X: jnp.ndarray
    Rwg: jnp.ndarray  # [3,3] refined gravity-alignment rotation
    scale: jnp.ndarray  # [] refined metric scale of the visual map
    cost: jnp.ndarray
    chi2_visual: jnp.ndarray
    inlier: jnp.ndarray


@partial(jax.jit, static_argnames=("n_iters", "use_robust", "fix_scale"))
def vi_bundle_adjust_gs(
    prob: VIBAProblem,
    Rwg0: jnp.ndarray,
    n_iters: int = 15,
    chi2_th: float = robust.CHI2_MONO,
    use_robust: bool = True,
    bias_prior_g: float = 0.0,
    bias_prior_a: float = 0.0,
    fix_scale: bool = False,
    lam0: float = 1e-3,
) -> VIBAGSResult:
    """Full inertial BA that co-optimizes gravity direction (2-dof) and a
    global metric scale with all body states + landmarks — the reference's
    ``FullInertialBA(..., bInit=true)`` (Optimizer.cc:392) using
    EdgeInertialGS instead of alternating InertialOptimization with a
    fixed-gravity BA. The visual map stays in its own (visual) scale
    inside the solve; the caller applies the returned (Rwg, scale) to the
    map afterwards (Map::ApplyScaledRotation semantics)."""
    st0 = prob.states
    K = st0.R_wb.shape[0]
    P = prob.X.shape[0]
    D = 15
    G = 3  # [dtheta_gx, dtheta_gy, dlog_s]
    KD = K * D
    dtype = prob.X.dtype
    # Stereo rows (see vi_bundle_adjust): third residual row masked for
    # mono edges, 3-DoF chi2 gate for stereo edges.
    ur = prob.ur if prob.ur is not None else jnp.full_like(prob.uv[:, 0], -1.0)
    bf = jnp.asarray(prob.bf, dtype)
    has_ur = (ur >= 0.0) & (bf > 0.0)
    rmask = jnp.concatenate(
        [jnp.ones((ur.shape[0], 2), dtype), has_ur[:, None].astype(dtype)], 1
    )
    delta2 = jnp.where(
        has_ur, chi2_th * (robust.CHI2_STEREO / robust.CHI2_MONO), chi2_th
    )
    ur_s = jnp.where(has_ur, ur, 0.0)

    ie_info = jax.vmap(lambda C: _info_from_cov(C, slice(0, 9)))(prob.ie_preint.C)
    info_bgw = jax.vmap(lambda C: _info_from_cov(C, slice(9, 12)))(prob.ie_preint.C)
    info_baw = jax.vmap(lambda C: _info_from_cov(C, slice(12, 15)))(prob.ie_preint.C)

    vres_fn = jax.vmap(
        lambda R, p, X, uv, u_r: _visual_residual3(
            jnp.zeros(6, dtype), jnp.zeros(3, dtype), R, p, X, uv, u_r,
            prob.cam_params, prob.R_bc, prob.t_bc, bf,
        )
    )
    vjac_fn = jax.vmap(
        lambda R, p, X, uv, u_r: (
            jax.jacfwd(
                lambda e: _visual_residual3(
                    e, jnp.zeros(3, dtype), R, p, X, uv, u_r,
                    prob.cam_params, prob.R_bc, prob.t_bc, bf,
                )
            )(jnp.zeros(6, dtype)),
            jax.jacfwd(
                lambda e: _visual_residual3(
                    jnp.zeros(6, dtype), e, R, p, X, uv, u_r,
                    prob.cam_params, prob.R_bc, prob.t_bc, bf,
                )
            )(jnp.zeros(3, dtype)),
        )
    )
    ires_fn = jax.vmap(
        lambda Ri, pi, vi, bgi, bai, Rj, pj, vj, pre, Rwg, s: _inertial_residual_gs27(
            jnp.zeros(27, dtype), Ri, pi, vi, bgi, bai, Rj, pj, vj, pre, Rwg, s
        ),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
    )
    ijac_fn = jax.vmap(
        lambda Ri, pi, vi, bgi, bai, Rj, pj, vj, pre, Rwg, s: jax.jacfwd(
            lambda e: _inertial_residual_gs27(
                e, Ri, pi, vi, bgi, bai, Rj, pj, vj, pre, Rwg, s
            )
        )(jnp.zeros(27, dtype)),
        in_axes=(0, 0, 0, 0, 0, 0, 0, 0, 0, None, None),
    )

    def ie_args(st):
        return (
            st.R_wb[prob.ie_i], st.p_wb[prob.ie_i], st.v_w[prob.ie_i],
            st.bg[prob.ie_i], st.ba[prob.ie_i],
            st.R_wb[prob.ie_j], st.p_wb[prob.ie_j], st.v_w[prob.ie_j],
            prob.ie_preint,
        )

    def total_cost(st, X, Rwg, s):
        r = vres_fn(st.R_wb[prob.cam_idx], st.p_wb[prob.cam_idx],
                    X[prob.pt_idx], prob.uv, ur_s) * rmask
        chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
        if use_robust:
            rho = jnp.where(
                chi2 <= delta2,
                chi2,
                2.0 * jnp.sqrt(delta2 * jnp.maximum(chi2, 1e-12)) - delta2,
            )
        else:
            rho = chi2
        c_vis = jnp.sum(jnp.where(prob.edge_valid, rho, 0.0))
        ri = ires_fn(*ie_args(st), Rwg, s)
        c_in = jnp.sum(
            jnp.where(prob.ie_valid, jnp.einsum("qi,qij,qj->q", ri, ie_info, ri), 0.0)
        )
        dbg = st.bg[prob.ie_j] - st.bg[prob.ie_i]
        dba = st.ba[prob.ie_j] - st.ba[prob.ie_i]
        c_rw = jnp.sum(
            jnp.where(
                prob.ie_valid,
                jnp.einsum("qi,qij,qj->q", dbg, info_bgw, dbg)
                + jnp.einsum("qi,qij,qj->q", dba, info_baw, dba),
                0.0,
            )
        )
        c_prior = bias_prior_g * jnp.sum(st.bg * st.bg) + bias_prior_a * jnp.sum(
            st.ba * st.ba
        )
        return c_vis + c_in + c_rw + c_prior

    free_pose = (prob.kf_valid & ~prob.kf_fixed).astype(dtype)
    free_vb = prob.kf_valid.astype(dtype)
    free_d = jnp.concatenate(
        [jnp.repeat(free_pose[:, None], 6, axis=1),
         jnp.repeat(free_vb[:, None], 9, axis=1)],
        axis=1,
    )  # [K,15]
    free_g = jnp.asarray([1.0, 1.0, 0.0 if fix_scale else 1.0], dtype)
    free_full = jnp.concatenate([free_d.reshape(KD), free_g])  # [KD+3]

    def step(carry, _):
        st, X, Rwg, s, lam, cost = carry
        H = jnp.zeros((K, K, D, D), dtype)
        g = jnp.zeros((K, D), dtype)
        Hg = jnp.zeros((K, G, D), dtype)  # gravity/scale <-> body borders
        Hgg = jnp.zeros((G, G), dtype)
        gg = jnp.zeros((G,), dtype)

        # ---- visual edges (identical to vi_bundle_adjust) ----
        Re = st.R_wb[prob.cam_idx]
        pe = st.p_wb[prob.cam_idx]
        Xe = X[prob.pt_idx]
        r = vres_fn(Re, pe, Xe, prob.uv, ur_s) * rmask
        Jc6, Jp = vjac_fn(Re, pe, Xe, prob.uv, ur_s)
        Jc6 = Jc6 * rmask[:, :, None]
        Jp = Jp * rmask[:, :, None]
        chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
        w_rob = robust.huber_weight(chi2, delta2) if use_robust else jnp.ones_like(chi2)
        w = prob.inv_sigma2 * w_rob * prob.edge_valid.astype(dtype)
        JcW = Jc6 * w[:, None, None]
        H = H.at[prob.cam_idx, prob.cam_idx, :6, :6].add(
            jnp.einsum("eia,eib->eab", JcW, Jc6)
        )
        g = g.at[prob.cam_idx, :6].add(-jnp.einsum("eia,ei->ea", JcW, r))
        Hpp = jnp.zeros((P, 3, 3), dtype).at[prob.pt_idx].add(
            jnp.einsum("eia,eib->eab", Jp * w[:, None, None], Jp)
        )
        gp = jnp.zeros((P, 3), dtype).at[prob.pt_idx].add(
            -jnp.einsum("eia,ei->ea", Jp * w[:, None, None], r)
        )
        Wcp = (
            jnp.zeros((K * P, 6, 3), dtype)
            .at[prob.cam_idx * P + prob.pt_idx]
            .add(jnp.einsum("eia,eib->eab", JcW, Jp))
            .reshape(K, P, 6, 3)
        )

        # ---- GS inertial edges ----
        ri = ires_fn(*ie_args(st), Rwg, s)  # [Q,9]
        Ji = ijac_fn(*ie_args(st), Rwg, s)  # [Q,9,27]
        wq = prob.ie_valid.astype(dtype)
        InfoW = ie_info * wq[:, None, None]
        JtI = jnp.einsum("qia,qij->qaj", Ji, InfoW)  # [Q,27,9]
        Hq = jnp.einsum("qaj,qjb->qab", JtI, Ji)  # [Q,27,27]
        gq = -jnp.einsum("qaj,qj->qa", JtI, ri)  # [Q,27]
        ii, jj = prob.ie_i, prob.ie_j
        H = H.at[ii, ii].add(Hq[:, 0:15, 0:15])
        H = H.at[jj, jj, 0:6, 0:6].add(Hq[:, 15:21, 15:21])
        H = H.at[jj, jj, 0:6, 6:9].add(Hq[:, 15:21, 21:24])
        H = H.at[jj, jj, 6:9, 0:6].add(Hq[:, 21:24, 15:21])
        H = H.at[jj, jj, 6:9, 6:9].add(Hq[:, 21:24, 21:24])
        H = H.at[ii, jj, :, 0:6].add(Hq[:, 0:15, 15:21])
        H = H.at[ii, jj, :, 6:9].add(Hq[:, 0:15, 21:24])
        H = H.at[jj, ii, 0:6, :].add(Hq[:, 15:21, 0:15])
        H = H.at[jj, ii, 6:9, :].add(Hq[:, 21:24, 0:15])
        g = g.at[ii].add(gq[:, 0:15])
        g = g.at[jj, 0:6].add(gq[:, 15:21])
        g = g.at[jj, 6:9].add(gq[:, 21:24])
        # global borders
        Hg = Hg.at[ii, :, 0:15].add(Hq[:, 24:27, 0:15])
        Hg = Hg.at[jj, :, 0:6].add(Hq[:, 24:27, 15:21])
        Hg = Hg.at[jj, :, 6:9].add(Hq[:, 24:27, 21:24])
        Hgg = Hgg + jnp.sum(Hq[:, 24:27, 24:27], axis=0)
        gg = gg + jnp.sum(gq[:, 24:27], axis=0)

        # ---- bias random-walk edges ----
        dbg = st.bg[jj] - st.bg[ii]
        dba = st.ba[jj] - st.ba[ii]
        for info, dvec, off in ((info_bgw, dbg, 9), (info_baw, dba, 12)):
            infoW = info * wq[:, None, None]
            H = H.at[ii, ii, off : off + 3, off : off + 3].add(infoW)
            H = H.at[jj, jj, off : off + 3, off : off + 3].add(infoW)
            H = H.at[ii, jj, off : off + 3, off : off + 3].add(-infoW)
            H = H.at[jj, ii, off : off + 3, off : off + 3].add(-infoW)
            gv = jnp.einsum("qij,qj->qi", infoW, dvec)
            g = g.at[ii, off : off + 3].add(gv)
            g = g.at[jj, off : off + 3].add(-gv)

        # ---- bias priors ----
        diag_idx = jnp.arange(K)
        pr = jnp.zeros((D,), dtype)
        pr = pr.at[9:12].set(bias_prior_g).at[12:15].set(bias_prior_a)
        H = H.at[diag_idx, diag_idx].add(jnp.diag(pr))
        g = g - jnp.concatenate(
            [jnp.zeros((K, 9), dtype), bias_prior_g * st.bg, bias_prior_a * st.ba],
            axis=1,
        )

        # ---- damping + landmark Schur (visual part only) ----
        eye = jnp.eye(D, dtype=dtype)
        diagH = jnp.diagonal(H[diag_idx, diag_idx], axis1=-2, axis2=-1)
        H = H.at[diag_idx, diag_idx].add((lam * diagH + 1e-6)[..., :, None] * eye)
        Hgg_d = Hgg + (lam * jnp.diag(Hgg) + 1e-6) * jnp.eye(G, dtype=dtype)
        Hpp_d = Hpp + (
            lam * jnp.diagonal(Hpp, axis1=-2, axis2=-1) + 1e-6
        )[..., :, None] * jnp.eye(3, dtype=dtype)
        # Closed-form 3x3 inverse: batched LU serializes on TPU
        # (same lesson as ba.py inv3x3; measured ~0.5 s at P=4096).
        Hpp_inv = inv3x3(Hpp_d)
        Y = jnp.einsum("kpab,pbc->kpac", Wcp, Hpp_inv)
        S_vis = -jnp.einsum("kpac,lpbc->klab", Y, Wcp)
        H = H.at[:, :, :6, :6].add(S_vis)
        rhs = g.at[:, :6].add(-jnp.einsum("kpab,pb->ka", Y, gp))

        # ---- assemble the bordered full system [KD+3, KD+3] ----
        Hfull = jnp.zeros((KD + G, KD + G), dtype)
        Hfull = Hfull.at[:KD, :KD].set(
            H.transpose(0, 2, 1, 3).reshape(KD, KD)
        )
        Hg_flat = Hg.transpose(1, 0, 2).reshape(G, KD)
        Hfull = Hfull.at[KD:, :KD].set(Hg_flat)
        Hfull = Hfull.at[:KD, KD:].set(Hg_flat.T)
        Hfull = Hfull.at[KD:, KD:].set(Hgg_d)
        rhs_full = jnp.concatenate([rhs.reshape(KD), gg])

        Hm = Hfull * free_full[:, None] * free_full[None, :]
        Hm = Hm + jnp.diag(1.0 - free_full)
        rhs_full = rhs_full * free_full
        delta_full = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hm, lower=True), rhs_full
        ) * free_full
        delta = delta_full[:KD].reshape(K, D)
        dgs = delta_full[KD:]

        rhs_p = gp - jnp.einsum("kpab,ka->pb", Wcp, delta[:, :6])
        delta_p = jnp.einsum("pab,pb->pa", Hpp_inv, rhs_p) * prob.pt_valid[
            :, None
        ].astype(dtype)

        newR = jnp.einsum("kij,kjl->kil", st.R_wb, lie.so3_exp(delta[:, 0:3]))
        newR = lie.normalize_rotation(newR)
        newp = st.p_wb + jnp.einsum("kij,kj->ki", st.R_wb, delta[:, 3:6])
        st_new = VIStates(
            R_wb=jnp.where(free_pose[:, None, None] > 0, newR, st.R_wb),
            p_wb=jnp.where(free_pose[:, None] > 0, newp, st.p_wb),
            v_w=st.v_w + delta[:, 6:9],
            bg=st.bg + delta[:, 9:12],
            ba=st.ba + delta[:, 12:15],
        )
        X_new = X + delta_p
        Rwg_new = lie.normalize_rotation(
            Rwg @ lie.so3_exp(jnp.concatenate([dgs[0:2], jnp.zeros((1,), dtype)]))
        )
        s_new = s * jnp.exp(dgs[2])
        cost_new = total_cost(st_new, X_new, Rwg_new, s_new)
        better = cost_new < cost
        st = jax.tree.map(
            lambda a, b: jnp.where(jnp.reshape(better, (1,) * a.ndim), b, a),
            st, st_new,
        )
        X = jnp.where(better, X_new, X)
        Rwg = jnp.where(better, Rwg_new, Rwg)
        s = jnp.where(better, s_new, s)
        lam = jnp.where(better, jnp.maximum(lam * 0.4, 1e-8), jnp.minimum(lam * 5.0, 1e6))
        cost = jnp.where(better, cost_new, cost)
        return (st, X, Rwg, s, lam, cost), None

    s0 = jnp.asarray(1.0, dtype)
    cost0 = total_cost(st0, prob.X, Rwg0, s0)
    (st, X, Rwg, s, lam, cost), _ = jax.lax.scan(
        step, (st0, prob.X, Rwg0, s0, jnp.asarray(lam0, dtype), cost0),
        None, length=n_iters,
    )
    r = vres_fn(
        st.R_wb[prob.cam_idx], st.p_wb[prob.cam_idx], X[prob.pt_idx],
        prob.uv, ur_s,
    ) * rmask
    chi2 = jnp.sum(r * r, -1) * prob.inv_sigma2
    inlier = prob.edge_valid & (chi2 <= delta2)
    return VIBAGSResult(
        states=st, X=X, Rwg=Rwg, scale=s, cost=cost,
        chi2_visual=chi2, inlier=inlier,
    )


# ---------------------------------------------------------------------------
# IMU initialization: gravity direction + scale + shared biases + velocities
# ---------------------------------------------------------------------------


class InertialInitResult(NamedTuple):
    Rwg: jnp.ndarray  # [3,3] gravity-alignment rotation (g_w = Rwg * g_ref)
    scale: jnp.ndarray  # []
    bg: jnp.ndarray  # [3]
    ba: jnp.ndarray  # [3]
    v_w: jnp.ndarray  # [K,3]
    cost: jnp.ndarray


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def inertial_init(
    R_wb: jnp.ndarray,
    p_wb: jnp.ndarray,
    kf_valid: jnp.ndarray,
    ie_i: jnp.ndarray,
    ie_j: jnp.ndarray,
    ie_preint: imu.Preintegrated,
    ie_valid: jnp.ndarray,
    prior_g: float = 1e2,
    prior_a: float = 1e6,
    n_iters: int = 30,
    fix_scale: bool = False,
    vis_sigma_rot: float = 4e-3,
    vis_sigma_vel: float = 0.03,
    vis_sigma_pos: float = 8e-3,
) -> InertialInitResult:
    """Estimate gravity direction, metric scale, shared biases, and
    per-KF velocities with poses fixed (Optimizer::InertialOptimization,
    Optimizer.cc:3187-3370, driven by LocalMapping::InitializeIMU).

    The residual is the preintegration factor evaluated on *scaled*
    positions and rotated gravity:
      p_i' = s * p_i,  g_w = Rwg @ (0,0,-G).
    States: [dtheta_g(2), dlog_s(1), bg(3), ba(3), v(3K)].
    """
    K = R_wb.shape[0]
    dtype = R_wb.dtype
    # The fixed keyframe poses are *visual* estimates, not ground truth —
    # fold their uncertainty into the factor covariance (a floor added to
    # the preintegration covariance), otherwise the raw IMU information
    # overweights the position channel and the weighted solve can prefer
    # collapsing the scale to shrink visual position noise.
    vis_floor = jnp.concatenate(
        [
            jnp.full((3,), vis_sigma_rot**2, dtype),
            jnp.full((3,), vis_sigma_vel**2, dtype),
            jnp.full((3,), vis_sigma_pos**2, dtype),
        ]
    )
    ie_info = jax.vmap(
        lambda C: jnp.linalg.inv(
            0.5 * (C[:9, :9] + C[:9, :9].T) + jnp.diag(vis_floor)
        )
    )(ie_preint.C)
    g_ref = jnp.asarray([0.0, 0.0, -imu.GRAVITY], dtype)
    nS = 9 + 3 * K

    def unpack(x):
        # gravity perturbation only about x/y (2 dof), scale as log
        dth = jnp.concatenate([x[0:2], jnp.zeros((1,), dtype)])
        return dth, x[2], x[3:6], x[6:9], x[9:].reshape(K, 3)

    def residuals(x, Rwg0, s0):
        dth, dls, bg, ba, v = unpack(x)
        Rwg = Rwg0 @ lie.so3_exp(dth)
        s = s0 * jnp.exp(dls) if not fix_scale else s0
        g_w = Rwg @ g_ref
        b = jnp.concatenate([bg, ba])

        def one(q):
            i, j = ie_i[q], ie_j[q]
            pre = jax.tree.map(lambda a: a[q], ie_preint)
            return imu.inertial_residual(
                R_wb[i], s * p_wb[i], v[i], b,
                R_wb[j], s * p_wb[j], v[j], pre, gravity=g_w,
            )

        return jax.vmap(one)(jnp.arange(ie_i.shape[0]))

    def cost_of(x, Rwg0, s0):
        r = residuals(x, Rwg0, s0)
        c = jnp.sum(
            jnp.where(ie_valid, jnp.einsum("qi,qij,qj->q", r, ie_info, r), 0.0)
        )
        _, _, bg, ba, _ = unpack(x)
        return c + prior_g * jnp.sum(bg * bg) + prior_a * jnp.sum(ba * ba)

    # Seed the gravity direction from the summed preintegrated velocity
    # (the reference's dirG accumulation, LocalMapping.cc:1209-1229):
    # sum_q R_wb_i dV_q ~ (v_N - v_0) - g * T ~ -g * T.
    dV_sum = jnp.sum(
        jnp.einsum("qij,qj->qi", R_wb[ie_i], ie_preint.dV)
        * ie_valid[:, None].astype(dtype),
        axis=0,
    )
    g_dir = -dV_sum / jnp.maximum(jnp.linalg.norm(dV_sum), 1e-9)
    g_ref_dir = jnp.asarray([0.0, 0.0, -1.0], dtype)
    axis = jnp.cross(g_ref_dir, g_dir)
    sin_a = jnp.linalg.norm(axis)
    cos_a = jnp.dot(g_ref_dir, g_dir)
    angle = jnp.arctan2(sin_a, cos_a)
    axis = axis / jnp.maximum(sin_a, 1e-9)
    Rwg0 = lie.so3_exp(axis * angle)
    s0 = jnp.asarray(1.0, dtype)
    x0 = jnp.zeros((nS,), dtype)

    def lm_step(carry, _):
        x, lam, cost = carry
        J = jax.jacfwd(lambda xx: residuals(xx, Rwg0, s0))(x)  # [Q,9,nS]
        r = residuals(x, Rwg0, s0)
        wq = ie_valid.astype(dtype)
        JtI = jnp.einsum("qia,qij->qaj", J, ie_info * wq[:, None, None])
        H = jnp.einsum("qaj,qjb->ab", JtI, J)
        g = -jnp.einsum("qaj,qj->a", JtI, r)
        # priors
        pr = jnp.zeros((nS,), dtype).at[3:6].set(prior_g).at[6:9].set(prior_a)
        H = H + jnp.diag(pr)
        g = g - pr * x
        Hd = H + (lam * jnp.diag(H).clip(1e-8) + 1e-8) * jnp.eye(nS, dtype=dtype)
        dx = jax.scipy.linalg.cho_solve(
            jax.scipy.linalg.cho_factor(Hd, lower=True), g
        )
        x_new = x + dx
        cost_new = cost_of(x_new, Rwg0, s0)
        better = cost_new < cost
        x = jnp.where(better, x_new, x)
        lam = jnp.where(better, jnp.maximum(lam * 0.3, 1e-9), jnp.minimum(lam * 6.0, 1e8))
        cost = jnp.where(better, cost_new, cost)
        return (x, lam, cost), None

    cost0 = cost_of(x0, Rwg0, s0)
    (x, lam, cost), _ = jax.lax.scan(
        lm_step, (x0, jnp.asarray(1e-2, dtype), cost0), None, length=n_iters
    )
    dth, dls, bg, ba, v = unpack(x)
    return InertialInitResult(
        Rwg=Rwg0 @ lie.so3_exp(dth),
        scale=s0 * jnp.exp(dls) if not fix_scale else s0,
        bg=bg,
        ba=ba,
        v_w=v,
        cost=cost,
    )


# ---------------------------------------------------------------------------
# Camera <-> body pose conversion (role of g2o ImuCamPose, G2oTypes.h:96)
# ---------------------------------------------------------------------------


def body_from_cam(R_cw, t_cw, R_bc, t_bc):
    """Tcw (camera) -> (R_wb, p_wb): X_b = R_bc X_c + t_bc."""
    R_bw = jnp.einsum("ij,...jk->...ik", R_bc, R_cw)
    t_bw = jnp.einsum("ij,...j->...i", R_bc, t_cw) + t_bc
    R_wb = jnp.swapaxes(R_bw, -1, -2)
    p_wb = -jnp.einsum("...ij,...j->...i", R_wb, t_bw)
    return R_wb, p_wb


def cam_from_body(R_wb, p_wb, R_bc, t_bc):
    """(R_wb, p_wb) -> Tcw."""
    R_bw = jnp.swapaxes(R_wb, -1, -2)
    t_bw = -jnp.einsum("...ij,...j->...i", R_bw, p_wb)
    R_cw = jnp.einsum("ji,...jk->...ik", R_bc, R_bw)
    t_cw = jnp.einsum("ji,...j->...i", R_bc, t_bw - t_bc)
    return R_cw, t_cw


# ---------------------------------------------------------------------------
# VI motion-only pose optimization with anchor-uncertainty propagation —
# the roles of Optimizer::PoseInertialOptimizationLastKeyFrame
# (Optimizer.cc:4636) and PoseInertialOptimizationLastFrame (:5020) with
# ConstraintPoseImu / EdgePriorPoseImu (G2oTypes.h:706-767). One 15-dof
# state (frame body pose + velocity + biases) optimized against masked
# mono reprojection edges, the 9-dim preintegration factor to the anchor
# state (last keyframe or last frame), and 6-dim bias random-walk edges.
#
# The reference keeps TWO vertices (last frame with its marginal prior +
# current frame) and marginalizes; here the anchor is algebraically
# eliminated instead: its posterior covariance ``anc_Sigma`` INFLATES
# the edge covariances (W' = (W^-1 + A Sigma A^T)^-1 with A the residual
# Jacobian wrt the anchor) — the Schur-complement-exact single-vertex
# form, which keeps the solve 15-dof (TPU-friendly small dense algebra).
# Applying the previous posterior directly as a prior ON the current
# state (the pre-round-4 formulation) is inconsistent: information
# compounds with no process noise, the solve grows overconfident, and
# measured visual inlier support decays ~220 -> ~40 between keyframes.
# Returns the posterior information H and covariance Sigma at the
# optimum; the caller carries Sigma as the next frame's anchor
# uncertainty (zeros = treat the anchor as exact, e.g. right after a
# BA-refined keyframe).
# ---------------------------------------------------------------------------


class PoseInertialResult(NamedTuple):
    R_wb: jnp.ndarray  # [3,3] optimized body pose
    p_wb: jnp.ndarray  # [3]
    v_w: jnp.ndarray  # [3]
    bg: jnp.ndarray  # [3]
    ba: jnp.ndarray  # [3]
    inlier: jnp.ndarray  # [N] visual edges' final chi2 classification
    n_inliers: jnp.ndarray  # [] int32
    H: jnp.ndarray  # [15,15] recovered information at the optimum
    Sigma: jnp.ndarray  # [15,15] posterior covariance (next anchor unc.)
    cost: jnp.ndarray


@partial(jax.jit, static_argnames=("rounds", "iters_per_round"))
def pose_inertial_optimization(
    R_wb0: jnp.ndarray,
    p_wb0: jnp.ndarray,
    v0: jnp.ndarray,
    bg0: jnp.ndarray,
    ba0: jnp.ndarray,
    Xw: jnp.ndarray,  # [N,3] matched landmark positions
    uv: jnp.ndarray,  # [N,2] observations
    inv_sigma2: jnp.ndarray,  # [N]
    valid: jnp.ndarray,  # [N]
    R_anc: jnp.ndarray,  # anchor (last KF / last frame) body state
    p_anc: jnp.ndarray,
    v_anc: jnp.ndarray,
    bg_anc: jnp.ndarray,
    ba_anc: jnp.ndarray,
    preint: imu.Preintegrated,  # anchor -> frame
    anc_Sigma: jnp.ndarray,  # [15,15] anchor posterior cov (zeros = exact)
    cam_params: jnp.ndarray,
    R_bc: jnp.ndarray,
    t_bc: jnp.ndarray,
    rounds: int = 3,
    iters_per_round: int = 4,
    chi2_th: float = 5.991,
) -> PoseInertialResult:
    dtype = R_wb0.dtype
    N = Xw.shape[0]
    z15 = jnp.zeros((15,), dtype)

    # Edge covariance blocks of the preintegration
    # (EdgeInertial/EdgeGyroRW/EdgeAccRW blocks, G2oTypes.h:509).
    def _sym(M):
        return 0.5 * (M + M.T)

    C_i = _sym(preint.C[0:9, 0:9])
    C_b = _sym(jax.scipy.linalg.block_diag(
        preint.C[9:12, 9:12], preint.C[12:15, 12:15]
    ))

    # --- Anchor elimination: inflate the edge covariances by the anchor
    # posterior mapped through the residual's anchor Jacobian (computed
    # once at the linearization point) — the Schur-exact replacement for
    # the reference's two-vertex graph + ConstraintPoseImu marginal. ---
    def _ri_of_anchor(eps_a):
        Ra, pa, va, bga, baa = _apply_pert(
            R_anc, p_anc, v_anc, bg_anc, ba_anc, eps_a
        )
        b_f = jnp.concatenate([bg0, ba0])
        return imu.inertial_residual(Ra, pa, va, b_f, R_wb0, p_wb0, v0, preint)

    A_i = jax.jacfwd(_ri_of_anchor)(z15)  # [9,15]
    # Bias-walk residual rb = b_frame - b_anchor: Jacobian wrt anchor is
    # -I on the bias block.
    A_b = jnp.concatenate(
        [jnp.zeros((6, 9), dtype), -jnp.eye(6, dtype=dtype)], axis=1
    )  # [6,15]
    eye9 = jnp.eye(9, dtype=dtype)
    eye6 = jnp.eye(6, dtype=dtype)
    info_i = _sym(jnp.linalg.inv(
        C_i + A_i @ anc_Sigma @ A_i.T + 1e-12 * eye9
    ))
    info_b = _sym(jnp.linalg.inv(
        C_b + A_b @ anc_Sigma @ A_b.T + 1e-12 * eye6
    ))

    vres = jax.vmap(
        _visual_residual,
        in_axes=(None, None, None, None, 0, 0, None, None, None),
    )

    def residuals(eps, R, p, v, bg, ba):
        R2, p2, v2, bg2, ba2 = _apply_pert(R, p, v, bg, ba, eps)
        rv = vres(
            eps[0:6], jnp.zeros((3,), dtype), R, p, Xw, uv,
            cam_params, R_bc, t_bc,
        )  # [N,2]
        b_f = jnp.concatenate([bg2, ba2])
        ri = imu.inertial_residual(
            R_anc, p_anc, v_anc, b_f, R2, p2, v2, preint
        )
        rb = jnp.concatenate([bg2 - bg_anc, ba2 - ba_anc])
        return rv, ri, rb

    def costf(R, p, v, bg, ba, active):
        """Residual-only cost (no Jacobians — the cheap accept check)."""
        rv, ri, rb = residuals(z15, R, p, v, bg, ba)
        chi2 = jnp.sum(rv * rv, axis=-1) * inv_sigma2
        cost = (
            jnp.sum(jnp.where(active, jnp.minimum(chi2, chi2_th), 0.0))
            + ri @ info_i @ ri
            + rb @ info_b @ rb
        )
        return cost, chi2

    def quad(R, p, v, bg, ba, active):
        rv, ri, rb = residuals(z15, R, p, v, bg, ba)
        Jv, Ji, Jb = jax.jacfwd(
            lambda e: residuals(e, R, p, v, bg, ba)
        )(z15)
        chi2 = jnp.sum(rv * rv, axis=-1) * inv_sigma2
        w_rob = robust.huber_weight(chi2, chi2_th)
        w = inv_sigma2 * w_rob * active.astype(dtype)
        H = jnp.einsum("nia,n,nib->ab", Jv, w, Jv)
        g = -jnp.einsum("nia,n,ni->a", Jv, w, rv)
        H = H + Ji.T @ info_i @ Ji
        g = g - Ji.T @ info_i @ ri
        H = H + Jb.T @ info_b @ Jb
        g = g - Jb.T @ info_b @ rb
        cost = (
            jnp.sum(jnp.where(active, jnp.minimum(chi2, chi2_th), 0.0))
            + ri @ info_i @ ri
            + rb @ info_b @ rb
        )
        return H, g, cost, chi2

    def lm_round(carry, _):
        R, p, v, bg, ba, active, lam = carry

        def lm_step(i, st):
            R, p, v, bg, ba, lam = st
            H, g, cost, _ = quad(R, p, v, bg, ba, active)
            Hd = H + lam * jnp.diag(jnp.diag(H)) + 1e-6 * jnp.eye(15, dtype=dtype)
            delta = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(Hd, lower=True), g
            )
            R2, p2, v2, bg2, ba2 = _apply_pert(R, p, v, bg, ba, delta)
            R2 = lie.normalize_rotation(R2)
            cost_new, _ = costf(R2, p2, v2, bg2, ba2, active)
            better = cost_new < cost
            R = jnp.where(better, R2, R)
            p = jnp.where(better, p2, p)
            v = jnp.where(better, v2, v)
            bg = jnp.where(better, bg2, bg)
            ba = jnp.where(better, ba2, ba)
            lam = jnp.where(
                better, jnp.maximum(lam * 0.5, 1e-6), jnp.minimum(lam * 4.0, 1e4)
            )
            return (R, p, v, bg, ba, lam)

        R, p, v, bg, ba, lam = jax.lax.fori_loop(
            0, iters_per_round, lm_step, (R, p, v, bg, ba, lam)
        )
        _, chi2 = costf(R, p, v, bg, ba, valid)
        active = valid & (chi2 <= chi2_th)
        return (R, p, v, bg, ba, active, lam), None

    init = (R_wb0, p_wb0, v0, bg0, ba0, valid, jnp.asarray(1e-2, dtype))
    (R, p, v, bg, ba, active, _), _ = jax.lax.scan(
        lm_round, init, None, length=rounds
    )
    H, _, cost, chi2 = quad(R, p, v, bg, ba, active)
    H = _sym(H)
    inlier = valid & (chi2 <= chi2_th)
    Sigma = _sym(jnp.linalg.inv(H + 1e-6 * jnp.eye(15, dtype=dtype)))
    return PoseInertialResult(
        R_wb=R, p_wb=p, v_w=v, bg=bg, ba=ba,
        inlier=inlier, n_inliers=jnp.sum(inlier.astype(jnp.int32)),
        H=H, Sigma=Sigma, cost=cost,
    )
