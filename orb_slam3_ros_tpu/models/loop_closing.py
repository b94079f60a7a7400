"""Loop closing: place recognition -> Sim3 verification -> essential-graph
correction.

Role of the reference's ``LoopClosing`` thread (orb_slam3/src/
LoopClosing.cc: NewDetectCommonRegions :1342, DetectCommonRegionsFromBoW
:1596, CorrectLoop :1987) reduced to its single-map loop path: candidate
retrieval (retrieval.py replaces DBoW2+KeyFrameDatabase), descriptor
matching between the two keyframes, Sim3 RANSAC on the matched map
points, pose-graph optimization over the keyframe chain with the loop
edge, and point correction via reference keyframes. Map-merge
(MergeLocal) and the async GBA thread remain host-orchestration
extensions of the same stages.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import lie, matching, pgo, retrieval, sim3solver
from ..ops.orb import Features
from . import map_state as ms
from . import map_updates


class LoopCandidate(NamedTuple):
    cand_kf: int
    s: float
    R: np.ndarray
    t: np.ndarray
    n_inliers: int


def _kf_features(m: ms.MapState, kf: int) -> Features:
    return Features(
        xy=m.kf_xy[kf], level=m.kf_level[kf], angle=m.kf_angle[kf],
        response=jnp.zeros_like(m.kf_angle[kf]),
        desc_packed=jnp.zeros((m.N, 8), jnp.uint32),
        desc_sign=m.kf_desc_sign[kf], valid=m.kf_feat_valid[kf],
    )


@jax.jit
def _match_points_between(m: ms.MapState, kf1: jnp.ndarray, kf2: jnp.ndarray):
    """Match features of kf1 vs kf2 and pair up their bound map points in
    each camera frame (inputs to Sim3, reference SearchByBoW +
    Sim3Solver setup, LoopClosing.cc:1650-1720).

    Returns (X1 [N,3], X2 [N,3], pair_valid [N], pt1 [N], pt2 [N],
    sigma2_1 [N], sigma2_2 [N]) — the last two are the octave variances
    of the matched keypoints for chi2 gate scaling (Sim3Solver.cc:85-100).
    """
    f1 = _kf_features(m, kf1)
    f2 = _kf_features(m, kf2)
    idx, dist = matching.search_frame_frame(f1, f2, max_dist=64, ratio=0.85)
    fidx2 = jnp.clip(idx, 0, m.N - 1)
    pt1 = m.kf_obs[kf1]
    pt2 = m.kf_obs[kf2][fidx2]
    ok = (
        (idx >= 0)
        & (pt1 >= 0)
        & (pt2 >= 0)
        & m.pt_valid[jnp.clip(pt1, 0, m.P - 1)]
        & m.pt_valid[jnp.clip(pt2, 0, m.P - 1)]
    )
    X1w = m.pt_X[jnp.clip(pt1, 0, m.P - 1)]
    X2w = m.pt_X[jnp.clip(pt2, 0, m.P - 1)]
    X1 = jnp.einsum("ij,nj->ni", m.kf_R[kf1], X1w) + m.kf_t[kf1]
    X2 = jnp.einsum("ij,nj->ni", m.kf_R[kf2], X2w) + m.kf_t[kf2]
    sig1 = 1.2 ** (2.0 * m.kf_level[kf1].astype(X1.dtype))
    sig2 = 1.2 ** (2.0 * m.kf_level[kf2][fidx2].astype(X1.dtype))
    return X1, X2, ok, pt1, pt2, sig1, sig2


@partial(jax.jit, static_argnames=("width", "height"))
def _grow_matches_by_sim3(
    m: ms.MapState,
    kf1: jnp.ndarray,
    kf2: jnp.ndarray,
    s21: jnp.ndarray,
    R21: jnp.ndarray,
    t21: jnp.ndarray,
    cam_params: jnp.ndarray,
    width: int,
    height: int,
    radius: float = 8.0,
):
    """Widen the correspondence set under a Sim3 hypothesis — the role of
    ``ORBmatcher::SearchBySim3`` (ORBmatcher.cc:1457): project kf1's
    bound landmarks through S21 into kf2's image and re-match against
    kf2's bound features by descriptor within ``radius``. Returns the
    same tuple shape as ``_match_points_between``."""
    from ..ops import cameras, hamming

    P, N = m.P, m.N
    pt1 = m.kf_obs[kf1]
    p1c = jnp.clip(pt1, 0, P - 1)
    X1w = m.pt_X[p1c]
    X1 = jnp.einsum("ij,nj->ni", m.kf_R[kf1], X1w) + m.kf_t[kf1]
    X1in2 = s21 * jnp.einsum("ij,nj->ni", R21, X1) + t21
    uv2 = cameras.pinhole_project_nodist(cam_params, X1in2)
    src_ok = (
        (pt1 >= 0)
        & m.kf_feat_valid[kf1]
        & m.pt_valid[p1c]
        & (X1in2[:, 2] > 0.05)
        & cameras.in_image(uv2, width, height, 2.0)
    )
    f2 = _kf_features(m, kf2)
    # only features of kf2 that are bound to landmarks can pair
    f2 = f2._replace(valid=f2.valid & (m.kf_obs[kf2] >= 0))
    idx, _ = matching.search_by_projection(
        uv2, src_ok, m.pt_level[p1c], m.pt_desc_sign[p1c], f2,
        radius=radius, max_dist=hamming.TH_HIGH, ratio=1.0,
    )
    fidx2 = jnp.clip(idx, 0, N - 1)
    pt2 = m.kf_obs[kf2][fidx2]
    ok = (
        src_ok
        & (idx >= 0)
        & (pt2 >= 0)
        & m.pt_valid[jnp.clip(pt2, 0, P - 1)]
    )
    X2w = m.pt_X[jnp.clip(pt2, 0, P - 1)]
    X2 = jnp.einsum("ij,nj->ni", m.kf_R[kf2], X2w) + m.kf_t[kf2]
    sig1 = 1.2 ** (2.0 * m.kf_level[kf1].astype(X1.dtype))
    sig2 = 1.2 ** (2.0 * m.kf_level[kf2][fidx2].astype(X1.dtype))
    return X1, X2, ok, pt1, pt2, sig1, sig2


@partial(jax.jit, static_argnames=("n_iters", "four_dof", "cov_min"))
def _essential_graph_pgo(
    m: ms.MapState,
    new_kf: jnp.ndarray,
    cand_kf: jnp.ndarray,
    loop_R: jnp.ndarray,
    loop_t: jnp.ndarray,
    loop_s: jnp.ndarray,
    n_kf: jnp.ndarray,
    past_i: jnp.ndarray,  # [L] persistent loop/merge edges (or -1)
    past_j: jnp.ndarray,
    past_R: jnp.ndarray,  # [L,3,3] stored S_ji measurements
    past_t: jnp.ndarray,
    past_s: jnp.ndarray,
    past_valid: jnp.ndarray,
    n_iters: int = 24,
    four_dof: bool = False,
    cov_min: int = 100,
):
    """True essential-graph optimization (Optimizer::OptimizeEssentialGraph,
    orb_slam3/src/Optimizer.cc:1504-1929): spanning-tree edges +
    strong-covisibility edges (w >= 100, Optimizer.cc:1711 minFeat) +
    accumulated past loop/merge edges + the new loop edge, with ONLY the
    loop-candidate keyframe fixed (Optimizer.cc:1550-1560) and the Sim3
    correction pre-propagated through the current keyframe's covisible
    neighborhood as initial values (LoopClosing.cc:2075-2235
    CorrectedSim3).

    The spanning tree is derived on device: each keyframe's parent is its
    strongest-covisibility OLDER keyframe (falling back to its temporal
    predecessor), which reproduces the reference's tree structure (a
    keyframe's parent is the covisible KF with most shared points,
    KeyFrame::ChangeParent semantics) without pointer bookkeeping.

    Edge measurements are all computed from the CURRENT (pre-correction)
    poses — the reference's NonCorrectedSim3 (LoopClosing.cc:2093) —
    while the optimizer starts from the corrected window so the loop
    discrepancy is distributed through the whole graph rather than the
    single chain path.

    Note: point correction composes so that pre-propagating point
    positions is unnecessary — X_final = S_pgo^-1(S_old(X)) regardless of
    the window pre-correction, since the pre-correction cancels between
    the point move and the initial value (both are S_corr^-1 S_old).
    """
    K = m.K
    dtype = m.kf_t.dtype
    ids = jnp.arange(K)
    valid = m.kf_valid & (ids < n_kf)
    ones = jnp.ones((K,), dtype)
    cov = ms.covisibility(m)

    def rel_of(i, j):
        """S_ji = S_jw * S_iw^-1 from current poses (scale 1)."""
        oi = jnp.ones(jnp.shape(i), dtype)
        Rinv, tinv, sinv = lie.sim3_inv(m.kf_R[i], m.kf_t[i], oi)
        return lie.sim3_mul(m.kf_R[j], m.kf_t[j], oi, Rinv, tinv, sinv)

    # --- spanning tree: parent = strongest-covisibility older KF ---
    older = (ids[None, :] < ids[:, None]) & valid[None, :]
    w_par = jnp.where(older, cov, -1)
    parent = jnp.argmax(w_par, axis=1).astype(jnp.int32)
    parent = jnp.where(jnp.max(w_par, axis=1) > 0, parent,
                       jnp.maximum(ids - 1, 0).astype(jnp.int32))
    st_i, st_j = ids.astype(jnp.int32), parent
    st_R, st_t, st_s = rel_of(st_i, st_j)
    st_valid = valid & valid[parent] & (ids >= 1)

    # --- strong covisibility edges: per-KF top-k by weight instead of
    # the full upper triangle — O(K*k) edges instead of O(K^2), which is
    # what keeps PGO assembly linear at K_cap >= 512. The reference takes
    # ALL w >= minFeat neighbors (Optimizer.cc:1711); with minFeat = 100
    # a keyframe essentially never has more than EDGE_TOPK of them, so
    # top-k at the same threshold keeps the same edge set. ---
    EDGE_TOPK = min(12, K - 1)
    covm = jnp.where(
        (ids[None, :] > ids[:, None]) & valid[None, :] & valid[:, None],
        cov, -1,
    )
    wv, jv = jax.lax.top_k(covm, EDGE_TOPK)  # [K, topk], j > i only
    iu = jnp.repeat(ids.astype(jnp.int32), EDGE_TOPK)
    ju = jv.reshape(-1).astype(jnp.int32)
    cv_R, cv_t, cv_s = rel_of(iu, ju)
    not_tree = (parent[ju] != iu) & (parent[iu] != ju)
    not_loop = ~(
        ((iu == cand_kf) & (ju == new_kf)) | ((iu == new_kf) & (ju == cand_kf))
    )
    cv_valid = (
        (wv.reshape(-1) >= cov_min) & valid[iu] & valid[ju] & not_tree & not_loop
    )

    # --- loop measurement (i=new, j=cand): S_ji = S21 ---
    if four_dof:
        # Metric map: fold the Sim3 scale into the translation, pin s=1
        # (current AND stored past loop edges).
        loop_t_e = loop_t / jnp.maximum(loop_s, 1e-6)
        loop_s_e = jnp.ones((), dtype)
        past_t = past_t / jnp.maximum(past_s, 1e-6)[:, None]
    else:
        loop_t_e = loop_t
        loop_s_e = loop_s

    e_i = jnp.concatenate([st_i, iu, past_i.astype(jnp.int32), new_kf[None].astype(jnp.int32)])
    e_j = jnp.concatenate([st_j, ju, past_j.astype(jnp.int32), cand_kf[None].astype(jnp.int32)])
    e_R = jnp.concatenate([st_R, cv_R, past_R, loop_R[None]])
    e_t = jnp.concatenate([st_t, cv_t, past_t, loop_t_e[None]])
    e_s = jnp.concatenate([st_s, cv_s, past_s, loop_s_e[None]])
    if four_dof:
        e_s = jnp.ones_like(e_s)
    pv = (
        past_valid
        & (past_i >= 0)
        & valid[jnp.clip(past_i, 0, K - 1)]
        & valid[jnp.clip(past_j, 0, K - 1)]
    )
    e_valid = jnp.concatenate([st_valid, cv_valid, pv, jnp.asarray([True])])
    e_w = jnp.ones((e_i.shape[0],), dtype)

    # --- Sim3 correction pre-propagation (CorrectedSim3 initial values):
    # corrected S_neww = S21^-1 * S_candw; each covisible neighbor i gets
    # S_iw_corr = (S_iw * S_neww^-1) * S_neww_corr ---
    one = jnp.ones((), dtype)
    Ri21, ti21, si21 = lie.sim3_inv(loop_R, loop_t_e, loop_s_e)
    Rn_c, tn_c, sn_c = lie.sim3_mul(
        Ri21, ti21, si21, m.kf_R[cand_kf], m.kf_t[cand_kf], one
    )
    Rni, tni, sni = lie.sim3_inv(m.kf_R[new_kf], m.kf_t[new_kf], one)
    Ri_n, ti_n, si_n = lie.sim3_mul(
        m.kf_R, m.kf_t, ones, Rni[None], tni[None], sni[None]
    )
    Ri_c, ti_c, si_c = lie.sim3_mul(Ri_n, ti_n, si_n, Rn_c, tn_c, sn_c)
    window = ((cov[new_kf] >= 15) | (ids == new_kf)) & valid & (ids != cand_kf)
    R1 = jnp.where(window[:, None, None], Ri_c, m.kf_R)
    t1 = jnp.where(window[:, None], ti_c, m.kf_t)
    s1 = jnp.where(window, si_c, ones)

    prob = pgo.PGOProblem(
        R=R1, t=t1, s=s1,
        kf_fixed=(ids == cand_kf) | ~valid,
        kf_valid=valid,
        e_i=e_i, e_j=e_j, e_R=e_R, e_t=e_t, e_s=e_s,
        e_valid=e_valid, e_weight=e_w,
    )
    if four_dof:
        res = pgo.optimize_pose_graph_4dof(prob, n_iters=n_iters)
    else:
        res = pgo.optimize_pose_graph(prob, n_iters=n_iters)

    s_safe = jnp.maximum(res.s, 1e-6)
    new_t = res.t / s_safe[:, None]
    X_new = pgo.correct_points(
        m.pt_X, jnp.clip(m.pt_first_kf, 0, K - 1),
        m.kf_R, m.kf_t, ones, res.R, res.t, res.s,
    )
    # Rotate world-frame KF velocities by each KF's rotation correction
    # (Rcor = Rwc_corrected @ Rcw_old), the reference's
    # pKFi->SetVelocity(Rcor * Vw) in CorrectLoop — without it an
    # inertial closure leaves velocities in the pre-correction world.
    Rcor = jnp.einsum("kji,kjl->kil", res.R, m.kf_R)
    v_new = jnp.einsum("kij,kj->ki", Rcor, m.kf_v)
    m2 = m._replace(
        kf_R=jnp.where(valid[:, None, None], res.R, m.kf_R),
        kf_t=jnp.where(valid[:, None], new_t, m.kf_t),
        pt_X=jnp.where(m.pt_valid[:, None], X_new, m.pt_X),
        kf_v=jnp.where(valid[:, None], v_new, m.kf_v),
    )
    return m2, res.cost


@partial(jax.jit, static_argnames=("n_iters", "four_dof"))
def _pgo_over_chain(
    m: ms.MapState,
    new_kf: jnp.ndarray,
    cand_kf: jnp.ndarray,
    loop_R: jnp.ndarray,
    loop_t: jnp.ndarray,
    loop_s: jnp.ndarray,
    n_kf: jnp.ndarray,
    n_iters: int = 20,
    four_dof: bool = False,
):
    """Essential-graph optimization: sequential odometry edges + the loop
    edge, candidate + origin fixed (OptimizeEssentialGraph contract).

    ``four_dof``: inertial maps optimize only world-yaw + translation per
    keyframe with the loop scale pinned to 1 (the reference switches to
    OptimizeEssentialGraph4DoF when the map has IMU, LoopClosing.cc:2370)."""
    K = m.K
    ids = jnp.arange(K)
    valid = m.kf_valid & (ids < n_kf)
    ones = jnp.ones((K,), m.kf_t.dtype)

    # Sequential edges k -> k+1 with measured relative SE3 (scale 1).
    i_seq = ids[:-1]
    j_seq = ids[1:]
    Ri, ti = m.kf_R[i_seq], m.kf_t[i_seq]
    Rj, tj = m.kf_R[j_seq], m.kf_t[j_seq]
    Rinv, tinv, sinv = lie.sim3_inv(Ri, ti, ones[:-1])
    Rm, tm, sm = lie.sim3_mul(Rj, tj, ones[:-1], Rinv, tinv, sinv)
    seq_valid = valid[i_seq] & valid[j_seq]

    # Loop edge cand -> new with the Sim3 measurement S_{new<-cand}:
    # solver gives S21: X_cand = S21 X_new, so S_{cand<-new} = S21 and the
    # edge (i=new, j=cand) measurement S_ji = S21.
    e_i = jnp.concatenate([i_seq, new_kf[None]])
    e_j = jnp.concatenate([j_seq, cand_kf[None]])
    e_R = jnp.concatenate([Rm, loop_R[None]])
    e_t = jnp.concatenate([tm, loop_t[None]])
    e_s = jnp.concatenate([sm, loop_s[None]])
    e_valid = jnp.concatenate([seq_valid, jnp.asarray([True])])
    e_w = jnp.concatenate([jnp.ones_like(sm), jnp.asarray([5.0], sm.dtype)])

    if four_dof:
        # Metric map: rescale the loop translation by its Sim3 scale so the
        # SE3 measurement is consistent, then pin scale to 1.
        e_t = e_t.at[-1].set(loop_t / jnp.maximum(loop_s, 1e-6))
        e_s = jnp.ones_like(e_s)

    prob = pgo.PGOProblem(
        R=m.kf_R, t=m.kf_t, s=ones,
        kf_fixed=(ids == cand_kf) | (ids == 0) | ~valid,
        kf_valid=valid,
        e_i=e_i, e_j=e_j, e_R=e_R, e_t=e_t, e_s=e_s,
        e_valid=e_valid, e_weight=e_w,
    )
    if four_dof:
        res = pgo.optimize_pose_graph_4dof(prob, n_iters=n_iters)
    else:
        res = pgo.optimize_pose_graph(prob, n_iters=n_iters)

    # Scatter back: SE3 pose = (R, t/s); move points with their first KF.
    s_safe = jnp.maximum(res.s, 1e-6)
    new_R = res.R
    new_t = res.t / s_safe[:, None]
    X_new = pgo.correct_points(
        m.pt_X, jnp.clip(m.pt_first_kf, 0, K - 1),
        m.kf_R, m.kf_t, ones, res.R, res.t, res.s,
    )
    # Velocity rotation correction (see _essential_graph_pgo).
    Rcor = jnp.einsum("kji,kjl->kil", res.R, m.kf_R)
    v_new = jnp.einsum("kij,kj->ki", Rcor, m.kf_v)
    m2 = m._replace(
        kf_R=jnp.where(valid[:, None, None], new_R, m.kf_R),
        kf_t=jnp.where(valid[:, None], new_t, m.kf_t),
        pt_X=jnp.where(m.pt_valid[:, None], X_new, m.pt_X),
        kf_v=jnp.where(valid[:, None], v_new, m.kf_v),
    )
    return m2, res.cost


@jax.jit
def _fuse_duplicates(m: ms.MapState, pt1, pt2, pair_ok):
    """Merge duplicate landmark instances after a closure: redirect every
    observation of pt1 to pt2 and invalidate pt1 (the role of
    ``LoopClosing::SearchAndFuse`` / ``MapPoint::Replace``,
    LoopClosing.cc:3446, restricted to the Sim3-inlier pairs)."""
    P = m.P
    src = jnp.clip(pt1, 0, P - 1)
    dst = jnp.clip(pt2, 0, P - 1)
    ok = pair_ok & (src != dst)
    remap = jnp.arange(P, dtype=jnp.int32).at[src].set(
        jnp.where(ok, dst, src).astype(jnp.int32)
    )
    vr = jnp.clip(m.kf_obs, 0, P - 1)
    tgt = remap[vr]
    # MapPoint::Replace (orb_slam3/src/MapPoint.cc:120-145), enforced
    # exactly: one binding per (keyframe, landmark) after the remap —
    # unchanged bindings win, duplicate remapped ones are erased
    # (map_updates.dedup_obs_rows).
    new_obs = map_updates.dedup_obs_rows(
        jnp.where(m.kf_obs >= 0, tgt, m.kf_obs),
        (m.kf_obs >= 0) & (tgt != vr), P,
    )
    killed = jnp.zeros((P,), bool).at[src].max(ok)
    return m._replace(kf_obs=new_obs, pt_valid=m.pt_valid & ~killed)


@partial(jax.jit,
         static_argnames=("width", "height", "min_inliers", "fix_scale"))
def _verify_pending_fused(
    m: ms.MapState,
    new_kf: jnp.ndarray,
    cand: jnp.ndarray,
    S_cw,
    cam_params: jnp.ndarray,
    width: int,
    height: int,
    min_inliers: int,
    fix_scale: bool = False,
):
    """Fused pending-hypothesis verification: propagate the stored
    world->candidate Sim3 through the new keyframe's pose, grow matches
    by guided projection, IRLS-refine the Sim3
    (DetectAndReffineSim3FromLastKF, LoopClosing.cc:1553). Returns the
    refined result, the re-propagated S_cw, the match tables, and a
    packed [2] (ok, n_inliers) fetch vector."""
    one = jnp.ones((), m.kf_t.dtype)
    R_cw, t_cw, s_cw = S_cw
    Rji, tji, sji = lie.sim3_inv(m.kf_R[new_kf], m.kf_t[new_kf], one)
    Rcj, tcj, scj = lie.sim3_mul(R_cw, t_cw, s_cw, Rji, tji, sji)
    X1, X2, okg, pt1, pt2, sig1, sig2 = _grow_matches_by_sim3(
        m, new_kf, cand, scj, Rcj, tcj, cam_params, width, height,
    )
    res = sim3solver.refine_sim3(
        X1, X2, okg, cam_params, scj, Rcj, tcj,
        min_inliers=min_inliers, sigma2_1=sig1, sigma2_2=sig2,
        fix_scale=fix_scale,
    )
    S_cw_new = lie.sim3_mul(
        res.R, res.t, res.s, m.kf_R[new_kf], m.kf_t[new_kf], one
    )
    packed = jnp.stack([
        res.ok.astype(jnp.float32), res.n_inliers.astype(jnp.float32),
    ])
    return res, S_cw_new, pt1, pt2, okg, packed


@partial(jax.jit, static_argnames=("use_covisibility",))
def _detect_candidates_fused(
    m: ms.MapState,
    new_kf: jnp.ndarray,
    n_kf: jnp.ndarray,
    vocab,
    min_gap: jnp.ndarray,
    min_score: jnp.ndarray,
    use_covisibility: bool = True,
):
    """Fused loop-candidate detection: KF signatures, covisibility,
    grouped accumulation (DetectNBestCandidates) AND the plain
    individual ranking in one program; returns their concatenated id
    lists [2*n_best]. The plain ranking covers self-similar scenes where
    group accumulation crowds out the true revisit.

    The score floor is ADAPTIVE, exactly the reference's contract
    (LoopClosing: minScore = lowest similarity between the current KF
    and its covisible neighbors, then
    KeyFrameDatabase::DetectLoopCandidates rejects anything below it,
    KeyFrameDatabase.cc:604-680): a fixed threshold cannot survive a
    vocabulary change — under the shipped generic vocabulary the
    false-place ceiling measured ABOVE any usable fixed gate, while a
    true revisit always scores like the query's own neighborhood."""
    sigs = retrieval.kf_signatures(m.kf_desc_sign, m.kf_feat_valid, vocab)
    q = sigs[new_kf]
    ids = jnp.arange(m.K)
    exclude = (ids > new_kf - min_gap) | (ids >= n_kf)
    cov = ms.covisibility(m)
    if use_covisibility:
        exclude = exclude | (cov[new_kf] > 10)
    thr = _adaptive_min_score(q, sigs, cov[new_kf], m.kf_valid, ids, n_kf,
                              new_kf, min_score)
    cand_g, _ = retrieval.detect_candidates_grouped(
        q, sigs, cov, m.kf_valid, exclude, min_common_score=thr
    )
    cand_f, _ = retrieval.detect_candidates(
        q, sigs, m.kf_valid, exclude, min_common_score=thr
    )
    return jnp.concatenate([cand_g, cand_f])


def _adaptive_min_score(q, sigs, cov_row, kf_valid, ids, n_kf, new_kf,
                        min_score):
    """minScore role (LoopClosing.cc:1360-1380 via
    KeyFrameDatabase::DetectLoopCandidates): the floor a candidate must
    clear is the LOWEST similarity between the query keyframe and its
    strongly-covisible neighbors — self-calibrating under any
    vocabulary. Falls back to the fixed ``min_score`` when the query has
    no covisible neighbors yet."""
    neigh = (cov_row >= 15) & kf_valid & (ids < n_kf) & (ids != new_kf)
    s = retrieval.score_against(q, sigs)
    s_n = jnp.where(neigh, s, jnp.inf)
    min_cov = jnp.min(s_n)
    has = jnp.isfinite(min_cov)
    return jnp.maximum(min_score, jnp.where(has, min_cov, min_score))


@partial(jax.jit, static_argnames=("use_covisibility",))
def _detect_candidates_batch(
    m: ms.MapState,
    new_kfs: jnp.ndarray,  # [B] padded with -1
    n_kf: jnp.ndarray,
    vocab,
    min_gap: jnp.ndarray,
    min_score: jnp.ndarray,
    use_covisibility: bool = True,
):
    """Batched ``_detect_candidates_fused`` over every keyframe a chunk
    inserted: keyframe signatures and the covisibility matrix are
    computed ONCE and shared across the batch, so the whole per-chunk
    candidate detection is ONE dispatch + ONE fetch instead of one
    round trip per keyframe (the reference's loop thread consumes its
    keyframe queue without per-item synchronization with tracking,
    LoopClosing.cc:1108-1342). Rows for padding entries (-1) are -1."""
    sigs = retrieval.kf_signatures(m.kf_desc_sign, m.kf_feat_valid, vocab)
    cov = ms.covisibility(m)
    ids = jnp.arange(m.K)

    def one(nk):
        nkc = jnp.clip(nk, 0, m.K - 1)
        q = sigs[nkc]
        exclude = (ids > nkc - min_gap) | (ids >= n_kf)
        if use_covisibility:
            exclude = exclude | (cov[nkc] > 10)
        thr = _adaptive_min_score(q, sigs, cov[nkc], m.kf_valid, ids,
                                  n_kf, nkc, min_score)
        cand_g, _ = retrieval.detect_candidates_grouped(
            q, sigs, cov, m.kf_valid, exclude, min_common_score=thr
        )
        cand_f, _ = retrieval.detect_candidates(
            q, sigs, m.kf_valid, exclude, min_common_score=thr
        )
        out = jnp.concatenate([cand_g, cand_f])
        return jnp.where(nk >= 0, out, -1)

    return jax.vmap(one)(new_kfs)


@partial(jax.jit,
         static_argnames=("width", "height", "min_inliers", "fix_scale"))
def _verify_pending_scan(
    m: ms.MapState,
    kfs: jnp.ndarray,  # [B] new keyframes, padded with -1
    cand: jnp.ndarray,
    S_cw,
    cam_params: jnp.ndarray,
    width: int,
    height: int,
    min_inliers: int,
    count0: jnp.ndarray,
    miss0: jnp.ndarray,
    required: jnp.ndarray,
    fix_scale: bool = False,
):
    """ALL pending-hypothesis verification rounds for a chunk's new
    keyframes in ONE dispatch (``lax.scan`` over the rounds) + ONE
    packed fetch. Each round is exactly ``_verify_pending_fused``'s flow
    (DetectAndReffineSim3FromLastKF, LoopClosing.cc:1553); the carry
    propagates (S_cw, count, miss) and freezes once the closure fires
    (count reaches ``required``) or the hypothesis dies (2 misses).
    Per-round dispatch/fetch cycles over the TPU tunnel were the
    dominant share of the measured ~520 ms/closure orchestration cost.

    Packed layout: [B*4 status rows (run, ok, fire, die)] + [state,
    count, miss] + S_cw(13) + fire payload R(9) t(3) s n_inl + pt1(N)
    pt2(N) fuse(N).
    """
    one = jnp.ones((), m.kf_t.dtype)
    N = m.N
    f32 = jnp.float32

    def round_fn(carry, kf):
        R_cw, t_cw, s_cw, count, miss, state, pay = carry
        kfc = jnp.clip(kf, 0, m.K - 1)
        run = (state == 0) & (kf >= 0)
        Rji, tji, sji = lie.sim3_inv(m.kf_R[kfc], m.kf_t[kfc], one)
        Rcj, tcj, scj = lie.sim3_mul(R_cw, t_cw, s_cw, Rji, tji, sji)
        X1, X2, okg, pt1, pt2, sig1, sig2 = _grow_matches_by_sim3(
            m, kfc, cand, scj, Rcj, tcj, cam_params, width, height,
        )
        res = sim3solver.refine_sim3(
            X1, X2, okg, cam_params, scj, Rcj, tcj,
            min_inliers=min_inliers, sigma2_1=sig1, sigma2_2=sig2,
            fix_scale=fix_scale,
        )
        hit = run & res.ok
        count2 = jnp.where(hit, count + 1, count)
        miss2 = jnp.where(run & ~res.ok, miss + 1, miss)
        Rn, tn, sn = lie.sim3_mul(
            res.R, res.t, res.s, m.kf_R[kfc], m.kf_t[kfc], one
        )
        R2 = jnp.where(hit, Rn, R_cw)
        t2 = jnp.where(hit, tn, t_cw)
        s2 = jnp.where(hit, sn, s_cw)
        fire = hit & (count2 >= required)
        die = run & ~res.ok & (miss2 > 1)
        new_pay = (
            res.R, res.t, res.s, res.n_inliers.astype(jnp.int32),
            pt1, pt2, okg & res.inlier,
        )
        pay2 = jax.tree.map(
            lambda new, old: jnp.where(fire, new, old), new_pay, pay
        )
        state2 = jnp.where(fire, 1, jnp.where(die, 2, state))
        status = jnp.stack([
            run.astype(f32), (run & res.ok).astype(f32),
            fire.astype(f32), die.astype(f32),
        ])
        return (R2, t2, s2, count2, miss2, state2, pay2), status

    pay0 = (
        jnp.eye(3, dtype=f32), jnp.zeros((3,), f32), jnp.ones((), f32),
        jnp.zeros((), jnp.int32),
        jnp.full((N,), -1, jnp.int32), jnp.full((N,), -1, jnp.int32),
        jnp.zeros((N,), bool),
    )
    R_cw, t_cw, s_cw = S_cw
    init = (R_cw, t_cw, s_cw, count0, miss0, jnp.zeros((), jnp.int32), pay0)
    carry, status = jax.lax.scan(round_fn, init, kfs)
    R_cw, t_cw, s_cw, count, miss, state, pay = carry
    fR, ft, fs, fn, fpt1, fpt2, fok = pay
    packed = jnp.concatenate([
        status.reshape(-1),
        jnp.stack([state.astype(f32), count.astype(f32), miss.astype(f32)]),
        R_cw.reshape(-1).astype(f32), t_cw.astype(f32),
        s_cw.reshape(1).astype(f32),
        fR.reshape(-1).astype(f32), ft.astype(f32), fs.reshape(1).astype(f32),
        fn.reshape(1).astype(f32),
        fpt1.astype(f32), fpt2.astype(f32), fok.astype(f32),
    ])
    return packed


def _pad_bucket(xs):
    """Pad an int list to the next power-of-two length with -1 (bounds
    the number of compiled batch shapes to log2(max chunk KFs))."""
    B = 1 << max(0, (len(xs) - 1).bit_length())
    out = np.full((B,), -1, np.int32)
    out[: len(xs)] = xs
    return out


class LoopCloser:
    """Host-side loop detection/correction orchestrator."""

    def __init__(self, min_gap: int = 10, min_score: float = 0.30,
                 min_sim3_inliers: int = 20, use_covisibility: bool = True,
                 four_dof: bool = False, dump_dir: str | None = None,
                 run_gba: bool = True, gba_iters: int = 8,
                 required_consistency: int = 3, auto_train_vocab: bool = True):
        self.min_gap = min_gap
        self.min_score = min_score
        self.min_sim3_inliers = min_sim3_inliers
        # Temporal-consistency verification: a candidate Sim3 must be
        # re-confirmed by guided projection on ``required_consistency``
        # consecutive keyframes before any correction fires (the
        # reference's mnLoopNumCoincidences >= 3 gate,
        # LoopClosing.cc:1342-1595). 1 = correct immediately.
        self.required_consistency = required_consistency
        self._pending = None  # {'cand', 'count', 'miss', 'S_cw': (R,t,s)}
        # Train the k-medians retrieval vocabulary from observed
        # descriptors once the map is big enough (the reference loads an
        # offline-trained ORB vocabulary at startup, System.cc:114; here
        # the session's own descriptors are the training set).
        self.auto_train_vocab = auto_train_vocab
        self._vocab_trained_at = -1
        # Global BA after loop correction (the reference spawns a
        # RunGlobalBundleAdjustment thread from CorrectLoop,
        # LoopClosing.cc:2529-2537; here it's one Schur-PCG solve whose
        # dispatch is async on device).
        self.run_gba = run_gba
        self.gba_iters = gba_iters
        # Inertial maps: 4-dof essential graph (yaw+translation), scale
        # pinned — the reference's inertial branch (LoopClosing.cc:2370).
        self.four_dof = four_dof
        # Optimization-problem dump on each closure (the fork's
        # SetSaveLoopData subsystem, LoopClosing.cc:987; enabled here via
        # constructor or ORB_TPU_LOOP_DUMP_DIR).
        import os

        self.dump_dir = dump_dir or os.environ.get("ORB_TPU_LOOP_DUMP_DIR")
        # Exclude covisible candidates (the reference's connected-KF
        # exclusion). Note that with full-map projection tracking, a
        # revisit is usually re-acquired by the tracker itself (implicit
        # closure), which makes the revisited KFs covisible — explicit
        # closure then only fires after genuine drift/lost episodes.
        self.use_covisibility = use_covisibility
        self.last_closed_kf = -100
        self.closures = []  # (new_kf, cand_kf, n_inliers)
        # Optional trained vocabulary ([A,256] +-1; None = seeded
        # anchors). Set via MonoSlam.set_vocabulary.
        self.vocab = None
        # Persistent loop/merge edges (KeyFrame::mspLoopEdges role,
        # KeyFrame.h:466-482): every accepted closure's Sim3 constraint
        # stays in ALL later essential-graph optimizations — the
        # reference never drops a loop edge. Capacity DOUBLES when full
        # (the jitted PGO recompiles once per doubling, log2-bounded)
        # instead of ring-evicting old constraints.
        self.max_loop_edges = 16
        self._edge_i = np.full((self.max_loop_edges,), -1, np.int32)
        self._edge_j = np.full((self.max_loop_edges,), -1, np.int32)
        self._edge_R = np.tile(np.eye(3, dtype=np.float32),
                               (self.max_loop_edges, 1, 1))
        self._edge_t = np.zeros((self.max_loop_edges, 3), np.float32)
        self._edge_s = np.ones((self.max_loop_edges,), np.float32)
        self._n_edges = 0

    def _grow_edges(self):
        cap = self.max_loop_edges * 2
        pad = cap - self.max_loop_edges
        self._edge_i = np.concatenate([self._edge_i, np.full((pad,), -1, np.int32)])
        self._edge_j = np.concatenate([self._edge_j, np.full((pad,), -1, np.int32)])
        self._edge_R = np.concatenate(
            [self._edge_R, np.tile(np.eye(3, dtype=np.float32), (pad, 1, 1))]
        )
        self._edge_t = np.concatenate([self._edge_t, np.zeros((pad, 3), np.float32)])
        self._edge_s = np.concatenate([self._edge_s, np.ones((pad,), np.float32)])
        self.max_loop_edges = cap

    def _record_loop_edge(self, i, j, R, t, s):
        # Reuse a slot freed by compaction before growing.
        free = np.nonzero(self._edge_i < 0)[0]
        if len(free) == 0:
            self._grow_edges()
            free = np.nonzero(self._edge_i < 0)[0]
        k = int(free[0])
        self._edge_i[k] = i
        self._edge_j[k] = j
        self._edge_R[k] = np.asarray(R)
        self._edge_t[k] = np.asarray(t)
        self._edge_s[k] = float(s)
        self._n_edges += 1

    def remap_slots(self, new_of_old: np.ndarray) -> None:
        """Reindex persistent loop edges after keyframe-slot compaction;
        edges with a culled endpoint are dropped, the pending hypothesis
        (slot-addressed) is discarded."""
        self._pending = None
        for k in range(self.max_loop_edges):
            if self._edge_i[k] < 0:
                continue
            a = new_of_old[self._edge_i[k]]
            b = new_of_old[self._edge_j[k]]
            if a < 0 or b < 0:
                self._edge_i[k] = -1
                self._edge_j[k] = -1
            else:
                self._edge_i[k] = a
                self._edge_j[k] = b
        if 0 <= self.last_closed_kf < len(new_of_old):
            nb = new_of_old[self.last_closed_kf]
            self.last_closed_kf = int(nb) if nb >= 0 else -100

    def _past_edges(self):
        valid = self._edge_i >= 0
        return (
            jnp.asarray(self._edge_i), jnp.asarray(self._edge_j),
            jnp.asarray(self._edge_R), jnp.asarray(self._edge_t),
            jnp.asarray(self._edge_s), jnp.asarray(valid),
        )

    def _dump_problem(self, slam, m, new_kf, cand_kf, res, tag):
        """Write the complete pre/post optimization problem (the fork's
        SaveOptimizationData pre/post dirs, LoopClosing.cc:2006-2365)."""
        import os

        from ..utils import optdump

        d = optdump.dump_from_map(
            m, slam.n_kf,
            loop_edges=[(
                new_kf, cand_kf,
                np.asarray(jax.device_get(res.R)),
                np.asarray(jax.device_get(res.t)),
                float(jax.device_get(res.s)),
            )],
        )
        optdump.save_optimization_data(
            os.path.join(self.dump_dir, f"closure_{new_kf}_{tag}"), **d
        )

    def _poll_vocab_training(self, slam) -> None:
        """Vocabulary training OFF the critical path: first training once
        the map can support a vocabulary, then periodic RE-training
        whenever the keyframe set has doubled — a vocabulary trained on
        the first corridor does not discriminate the tenth room. The
        k-medians runs on a background thread (the reference's
        vocabulary is trained offline and merely LOADED at startup,
        System.cc:114 — training must never stall tracking); the result
        installs at a later closure check."""
        fut = getattr(self, "_vocab_future", None)
        if fut is not None:
            if fut.done():
                try:
                    vocab, n_at = fut.result()
                    slam.set_vocabulary(vocab)
                    self._vocab_trained_at = n_at
                finally:
                    self._vocab_future = None
            return
        need = (
            (self.vocab is None and self._vocab_trained_at < 0
             and slam.n_kf >= 12)
            or (self._vocab_trained_at > 0
                and slam.n_kf >= 2 * self._vocab_trained_at)
        )
        if not need:
            return
        from concurrent.futures import ThreadPoolExecutor

        from ..ops import retrieval

        if getattr(self, "_vocab_exec", None) is None:
            self._vocab_exec = ThreadPoolExecutor(max_workers=1)
        import jax as _jax

        n_at = slam.n_kf
        desc = np.asarray(
            _jax.device_get(slam.map.kf_desc_sign[:n_at])
        ).reshape(-1, 256)
        valid = np.asarray(
            _jax.device_get(slam.map.kf_feat_valid[:n_at])
        ).reshape(-1)
        train = desc[valid]
        # Power-of-two vocabulary sizes: retrieval programs specialize on
        # the vocab SHAPE, so a continuously growing size would recompile
        # on every retrain; pow2 bounds recompiles to log-many.
        n_words = int(np.clip(len(train) // 16, 32, retrieval.MAX_WORDS))
        n_words = 1 << (n_words.bit_length() - 1)

        def _train():
            if n_words >= 1024:
                v = retrieval.train_vocabulary_hier(train, n_words=n_words)
            else:
                v = retrieval.train_vocabulary(train, n_words=n_words)
            return v, n_at

        self._vocab_future = self._vocab_exec.submit(_train)

    def try_close(self, slam, new_kf: int, key) -> bool:
        """Attempt loop closure on keyframe ``new_kf``. A fresh candidate
        must survive guided-projection verification on
        ``required_consistency`` consecutive keyframes before the
        correction fires (NewDetectCommonRegions' mnLoopNumCoincidences
        flow, LoopClosing.cc:1342-1595). Mutates ``slam.map`` on success.
        Returns True if a loop was closed."""
        m = slam.map
        if self.auto_train_vocab:
            self._poll_vocab_training(slam)
        if self._pending is not None:
            fired = self._advance_pending(slam, new_kf)
            if fired is not None:
                return fired
        if new_kf - self.last_closed_kf < self.min_gap:
            return False
        # ONE fused dispatch + ONE fetch for the whole candidate
        # detection (signatures + covisibility + grouped AND plain
        # ranking) — over the TPU tunnel each separate dispatch/fetch
        # costs a ~20-55 ms round trip, which at keyframe cadence was the
        # single largest throughput cost of an attached LoopCloser.
        cand_ids = np.asarray(jax.device_get(_detect_candidates_fused(
            m, jnp.asarray(new_kf, jnp.int32),
            jnp.asarray(slam.n_kf, jnp.int32),
            self.vocab,
            jnp.asarray(self.min_gap, jnp.int32),
            jnp.asarray(self.min_score, jnp.float32),
            use_covisibility=self.use_covisibility,
        )))
        return self._try_candidates(slam, new_kf, cand_ids, key)

    def _try_candidates(self, slam, new_kf: int, cand_ids, key) -> bool:
        """Sim3-verify precomputed retrieval candidates for ``new_kf``
        (the RANSAC -> SearchBySim3 -> OptimizeSim3 ladder of
        DetectCommonRegionsFromBoW, LoopClosing.cc:1596-1720); fires or
        stashes a pending hypothesis exactly like ``try_close``."""
        m = slam.map
        # Inertial maps have METRIC scale: fix s=1 in the Sim3 solve
        # (the reference's bFixedScale for IMU maps, LoopClosing.cc:1671
        # Sim3Solver with mbFixScale / OptimizeSim3 bFixScale) — a
        # scale-free fit on a metric map is the classic source of
        # geometrically-wrong accepted closures.
        fs = bool(getattr(slam, "imu_initialized", False))
        tried = set()
        for c in cand_ids:
            if c < 0 or int(c) in tried:
                continue
            tried.add(int(c))
            X1, X2, ok, pt1, pt2, sig1, sig2 = _match_points_between(
                m, jnp.asarray(new_kf), jnp.asarray(int(c))
            )
            if int(jax.device_get(ok.sum())) < 20:
                continue
            res = sim3solver.solve_sim3(
                X1, X2, ok, slam.cam_params, key,
                min_inliers=self.min_sim3_inliers,
                sigma2_1=sig1, sigma2_2=sig2, fix_scale=fs,
            )
            if not bool(jax.device_get(res.ok)):
                # RANSAC found a plausible but under-supported Sim3: grow
                # the correspondence set by projecting through it and
                # re-optimize (the reference's SearchBySim3 ->
                # OptimizeSim3 stage, LoopClosing.cc:1689-1720). Without
                # this, drift accumulated before the revisit starves the
                # initial descriptor-match set.
                if int(jax.device_get(res.n_inliers)) < max(
                    5, self.min_sim3_inliers // 3
                ):
                    continue
                X1g, X2g, okg, pt1, pt2, sig1g, sig2g = _grow_matches_by_sim3(
                    m, jnp.asarray(new_kf), jnp.asarray(int(c)),
                    res.s, res.R, res.t, slam.cam_params,
                    slam.width, slam.height,
                )
                res = sim3solver.refine_sim3(
                    X1g, X2g, okg, slam.cam_params, res.s, res.R, res.t,
                    min_inliers=self.min_sim3_inliers,
                    sigma2_1=sig1g, sigma2_2=sig2g, fix_scale=fs,
                )
                if not bool(jax.device_get(res.ok)):
                    continue
                ok = okg
            if self.required_consistency <= 1:
                return self._apply_closure(
                    slam, new_kf, int(c), res.R, res.t, res.s,
                    int(jax.device_get(res.n_inliers)),
                    pt1, pt2, ok & res.inlier,
                )
            # Stash the hypothesis as world -> candidate-camera Sim3
            # (g2oScw role): S_cw = S21 * S_neww.
            one = jnp.ones((), m.kf_t.dtype)
            S_cw = lie.sim3_mul(
                res.R, res.t, res.s, m.kf_R[new_kf], m.kf_t[new_kf], one
            )
            self._pending = {
                "cand": int(c), "count": 1, "miss": 0, "S_cw": S_cw,
            }
            return False
        return False

    def try_close_batch(self, slam, new_kfs, key) -> bool:
        """Loop-closure processing for ALL keyframes a chunk inserted in
        (at most) two device dispatches on the common path: one
        ``lax.scan`` over every pending-verification round and one
        batched candidate detection — versus one ``try_close`` (itself
        several dispatch+fetch cycles over the TPU tunnel) PER keyframe.
        This is the round-5 fix for the measured ~520 ms/closure host
        orchestration that held vi+lc below reference camera rate.

        Semantics match calling ``try_close`` per keyframe in order; the
        one (rare) divergence is that candidate detection for keyframes
        AFTER a mid-batch fired closure sees the pre-PGO map — harmless,
        because every candidate is still Sim3-verified against the
        current map, and ``min_gap`` gates those keyframes anyway.
        Returns True if any closure fired."""
        new_kfs = [int(k) for k in new_kfs]
        if not new_kfs:
            return False
        if self.auto_train_vocab:
            self._poll_vocab_training(slam)
        fired_any = False
        start = 0
        if self._pending is not None:
            fired, start = self._advance_pending_batch(slam, new_kfs)
            fired_any |= fired
        rem = [
            k for k in new_kfs[start:]
            if k - self.last_closed_kf >= self.min_gap
        ]
        if not rem:
            return fired_any
        kfs_pad = _pad_bucket(rem)
        cand_rows = np.asarray(jax.device_get(_detect_candidates_batch(
            slam.map, jnp.asarray(kfs_pad),
            jnp.asarray(slam.n_kf, jnp.int32), self.vocab,
            jnp.asarray(self.min_gap, jnp.int32),
            jnp.asarray(self.min_score, jnp.float32),
            use_covisibility=self.use_covisibility,
        )))
        for r, k in enumerate(rem):
            key, sub = jax.random.split(key)
            if self._pending is not None:
                # A hypothesis stashed earlier in this batch: verify it
                # on this keyframe (sequential path — rare, bounded by
                # the handful of keyframes one chunk inserts).
                out = self._advance_pending(slam, k)
                if out is not None:
                    fired_any |= bool(out)
                    continue
                # None: hypothesis discarded — fall through to fresh
                # detection for this same keyframe (precomputed row).
            if k - self.last_closed_kf < self.min_gap:
                continue
            if (cand_rows[r] < 0).all():
                continue
            fired_any |= self._try_candidates(slam, k, cand_rows[r], sub)
        return fired_any

    def _advance_pending_batch(self, slam, new_kfs):
        """Run every pending-verification round for this batch in ONE
        dispatch + ONE packed fetch (``_verify_pending_scan``). Returns
        ``(fired, consumed)`` where ``consumed`` is the number of leading
        keyframes fully handled by the pending hypothesis — keyframes
        from index ``consumed`` on still need fresh detection."""
        p = self._pending
        kfs_pad = _pad_bucket(new_kfs)
        B = len(kfs_pad)
        N = slam.map.N
        packed = _verify_pending_scan(
            slam.map, jnp.asarray(kfs_pad), jnp.asarray(p["cand"]),
            p["S_cw"], slam.cam_params, slam.width, slam.height,
            self.min_sim3_inliers,
            jnp.asarray(p["count"], jnp.int32),
            jnp.asarray(p["miss"], jnp.int32),
            jnp.asarray(self.required_consistency, jnp.int32),
            fix_scale=bool(getattr(slam, "imu_initialized", False)),
        )
        buf = np.asarray(jax.device_get(packed))
        status = buf[: 4 * B].reshape(B, 4)
        o = 4 * B
        state, count, miss = (int(v) for v in buf[o : o + 3])
        o += 3
        S_R = buf[o : o + 9].reshape(3, 3); o += 9
        S_t = buf[o : o + 3]; o += 3
        S_s = buf[o]; o += 1
        fR = buf[o : o + 9].reshape(3, 3); o += 9
        ft = buf[o : o + 3]; o += 3
        fs = buf[o]; o += 1
        fn = int(buf[o]); o += 1
        fpt1 = buf[o : o + N].astype(np.int32); o += N
        fpt2 = buf[o : o + N].astype(np.int32); o += N
        fok = buf[o : o + N] > 0.5
        if state == 1:  # fired at round j
            j = int(np.nonzero(status[:, 2] > 0.5)[0][0])
            cand = p["cand"]
            self._pending = None
            self._apply_closure(
                slam, new_kfs[j], cand,
                jnp.asarray(fR, jnp.float32), jnp.asarray(ft, jnp.float32),
                jnp.asarray(fs, jnp.float32), fn,
                jnp.asarray(fpt1), jnp.asarray(fpt2), jnp.asarray(fok),
            )
            return True, j + 1
        if state == 2:  # hypothesis died at round j (2 misses)
            j = int(np.nonzero(status[:, 3] > 0.5)[0][0])
            self._pending = None
            return False, j  # keyframe j falls through to detection
        p["count"], p["miss"] = count, miss
        p["S_cw"] = (
            jnp.asarray(S_R, jnp.float32), jnp.asarray(S_t, jnp.float32),
            jnp.asarray(S_s, jnp.float32),
        )
        return False, len(new_kfs)

    def _advance_pending(self, slam, new_kf: int):
        """Verify the pending hypothesis against keyframe ``new_kf`` by
        guided projection through the propagated Sim3
        (DetectAndReffineSim3FromLastKF, LoopClosing.cc:1553). Returns
        True/False if this keyframe's processing is finished, or None to
        fall through to fresh detection (hypothesis discarded)."""
        m = slam.map
        p = self._pending
        # ONE fused dispatch + ONE packed fetch for the whole guided
        # verification (Sim3 propagation -> grow -> refine): the unfused
        # flow made ~6 tunnel round trips per pending keyframe.
        res, S_cw_new, pt1, pt2, okg, packed = _verify_pending_fused(
            m, jnp.asarray(new_kf), jnp.asarray(p["cand"]), p["S_cw"],
            slam.cam_params, slam.width, slam.height,
            self.min_sim3_inliers,
            fix_scale=bool(getattr(slam, "imu_initialized", False)),
        )
        buf = np.asarray(jax.device_get(packed))
        if bool(buf[0] > 0.5):
            p["count"] += 1
            p["miss"] = 0
            p["S_cw"] = S_cw_new
            if p["count"] >= self.required_consistency:
                self._pending = None
                return self._apply_closure(
                    slam, new_kf, p["cand"], res.R, res.t, res.s,
                    int(buf[1]),
                    pt1, pt2, okg & res.inlier,
                )
            return False
        p["miss"] += 1
        if p["miss"] > 1:  # mnLoopNumNotFound < 2 tolerance
            self._pending = None
            return None
        return False

    def _apply_closure(
        self, slam, new_kf: int, cand: int, loop_R, loop_t, loop_s,
        n_inliers: int, pt1, pt2, fuse_ok,
    ) -> bool:
        """Correct the map through the essential graph, weld duplicate
        landmarks, and (optionally) run global BA — the CorrectLoop stage
        (LoopClosing.cc:1987-2537)."""
        m = slam.map

        class _Res(NamedTuple):
            R: jnp.ndarray
            t: jnp.ndarray
            s: jnp.ndarray

        res = _Res(R=loop_R, t=loop_t, s=loop_s)
        # A previous closure's global BA still in flight would stomp the
        # poses this PGO is about to write — ABORT it (mbStopGBA,
        # LoopClosing.cc:2512: a new closure stops the running GBA
        # rather than waiting it out) and fold in the partial result.
        if getattr(slam, "_gba", None) is not None:
            slam.abort_gba()
            while slam._gba is not None:
                slam._poll_gba(force=True)
            m = slam.map
        # Inertial maps use the 4-dof essential graph (pMap->IsInertial()
        # branch in CorrectLoop, LoopClosing.cc:2370-2375).
        four_dof = self.four_dof or bool(
            getattr(slam, "imu_initialized", False)
        )
        if self.dump_dir:
            self._dump_problem(slam, m, new_kf, cand, res, "pre")
        pi, pj, pR, pt, ps, pv = self._past_edges()
        slam.map, cost = _essential_graph_pgo(
            m, jnp.asarray(new_kf), jnp.asarray(cand),
            loop_R, loop_t, loop_s, jnp.asarray(slam.n_kf),
            pi, pj, pR, pt, ps, pv,
            four_dof=four_dof,
        )
        # ONE packed fetch for everything the host needs (loop edge +
        # corrected tracker pose): each separate device_get costs a full
        # ~20-55 ms round trip over the TPU tunnel, and this path held
        # 5 of them per closure.
        buf = np.asarray(jax.device_get(jnp.concatenate([
            jnp.asarray(loop_R).reshape(-1), jnp.asarray(loop_t),
            jnp.asarray(loop_s).reshape(1),
            slam.map.kf_R[new_kf].reshape(-1), slam.map.kf_t[new_kf],
        ])))
        self._record_loop_edge(
            new_kf, cand, buf[0:9].reshape(3, 3), buf[9:12], float(buf[12]),
        )
        if self.dump_dir:
            self._dump_problem(slam, slam.map, new_kf, cand, res, "post")
        slam.map = _fuse_duplicates(slam.map, pt1, pt2, fuse_ok)
        if self.run_gba:
            # Chunked async GBA (the reference launches
            # RunGlobalBundleAdjustment on its own thread,
            # LoopClosing.cc:2520): chunks interleave with tracking on
            # the device queue; a new keyframe aborts remaining chunks.
            # InertialSlam overrides _start_async_gba to run the FULL
            # INERTIAL BA in the same chunked/abortable fashion — a
            # visual-only GBA has a free scale gauge that drifts the
            # metric map out from under the IMU (the reference's
            # RunGlobalBundleAdjustment calls FullInertialBA when
            # pActiveMap->IsInertial(), LoopClosing.cc:3611-3620).
            slam._start_async_gba(self.gba_iters)
        # Landmark geometry moved wholesale: recompute viewing
        # normals / depth bands / representative descriptors now
        # rather than waiting for the next keyframe cadence.
        slam.map = map_updates.refresh_point_stats(
            slam.map, n_levels=slam.config.n_levels
        )
        self.last_closed_kf = new_kf
        self.closures.append((new_kf, cand, n_inliers))
        # Refresh the tracker's current pose from the corrected KF
        # (already in the packed fetch — welds/stat refresh/GBA snapshot
        # do not move keyframe poses).
        slam.R_cur = np.asarray(buf[13:22].reshape(3, 3), np.float32)
        slam.t_cur = np.asarray(buf[22:25], np.float32)
        slam.vel_R = np.eye(3, dtype=np.float32)
        slam.vel_t = np.zeros(3, np.float32)
        return True
