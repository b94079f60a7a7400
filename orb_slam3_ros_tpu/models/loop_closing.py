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
    m2 = m._replace(
        kf_R=jnp.where(valid[:, None, None], new_R, m.kf_R),
        kf_t=jnp.where(valid[:, None], new_t, m.kf_t),
        pt_X=jnp.where(m.pt_valid[:, None], X_new, m.pt_X),
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
    new_obs = jnp.where(
        m.kf_obs >= 0, remap[jnp.clip(m.kf_obs, 0, P - 1)], m.kf_obs
    )
    killed = jnp.zeros((P,), bool).at[src].max(ok)
    return m._replace(kf_obs=new_obs, pt_valid=m.pt_valid & ~killed)


class LoopCloser:
    """Host-side loop detection/correction orchestrator."""

    def __init__(self, min_gap: int = 10, min_score: float = 0.15,
                 min_sim3_inliers: int = 20, use_covisibility: bool = True,
                 four_dof: bool = False, dump_dir: str | None = None,
                 run_gba: bool = True, gba_iters: int = 8):
        self.min_gap = min_gap
        self.min_score = min_score
        self.min_sim3_inliers = min_sim3_inliers
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

    def try_close(self, slam, new_kf: int, key) -> bool:
        """Attempt loop closure on keyframe ``new_kf``. Mutates
        ``slam.map`` on success. Returns True if a loop was closed."""
        m = slam.map
        if new_kf - self.last_closed_kf < self.min_gap:
            return False
        sigs = retrieval.kf_signatures(m.kf_desc_sign, m.kf_feat_valid, self.vocab)
        q = sigs[new_kf]
        # Exclude temporally adjacent + covisible keyframes.
        ids = np.arange(m.K)
        exclude = jnp.asarray(
            (ids > new_kf - self.min_gap) | (ids >= slam.n_kf)
        )
        if self.use_covisibility:
            cov = ms.covisibility(m)[new_kf]
            exclude = exclude | (cov > 10)
        cand_ids, scores = retrieval.detect_candidates(
            q, sigs, m.kf_valid, exclude, min_common_score=self.min_score
        )
        cand_ids = np.asarray(jax.device_get(cand_ids))
        for c in cand_ids:
            if c < 0:
                continue
            X1, X2, ok, pt1, pt2, sig1, sig2 = _match_points_between(
                m, jnp.asarray(new_kf), jnp.asarray(int(c))
            )
            if int(jax.device_get(ok.sum())) < 20:
                continue
            res = sim3solver.solve_sim3(
                X1, X2, ok, slam.cam_params, key,
                min_inliers=self.min_sim3_inliers,
                sigma2_1=sig1, sigma2_2=sig2,
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
                    sigma2_1=sig1g, sigma2_2=sig2g,
                )
                if not bool(jax.device_get(res.ok)):
                    continue
            # Correct the map, then merge the duplicate landmarks the
            # drifted revisit created. Inertial maps use the 4-dof
            # essential graph (pMap->IsInertial() branch in the
            # reference's CorrectLoop, LoopClosing.cc:2370-2375).
            four_dof = self.four_dof or bool(
                getattr(slam, "imu_initialized", False)
            )
            if self.dump_dir:
                self._dump_problem(slam, m, new_kf, int(c), res, "pre")
            slam.map, cost = _pgo_over_chain(
                m, jnp.asarray(new_kf), jnp.asarray(int(c)),
                res.R, res.t, res.s, jnp.asarray(slam.n_kf),
                four_dof=four_dof,
            )
            if self.dump_dir:
                self._dump_problem(slam, slam.map, new_kf, int(c), res, "post")
            slam.map = _fuse_duplicates(slam.map, pt1, pt2, ok & res.inlier)
            if self.run_gba:
                from ..ops import ba_pcg
                from . import local_mapping

                prob = local_mapping.build_global_ba(
                    slam.map, jnp.asarray(slam.n_kf), slam.cam_params
                )
                gres = ba_pcg.bundle_adjust_pcg(
                    prob, n_iters=self.gba_iters, n_cg=50
                )
                slam.map = local_mapping.apply_global_ba(slam.map, gres)
            # Landmark geometry moved wholesale: recompute viewing
            # normals / depth bands / representative descriptors now
            # rather than waiting for the next keyframe cadence.
            slam.map = map_updates.refresh_point_stats(
                slam.map, n_levels=slam.config.n_levels
            )
            self.last_closed_kf = new_kf
            self.closures.append((new_kf, int(c), int(res.n_inliers)))
            # Refresh the tracker's current pose from the corrected KF.
            slam.R_cur = np.asarray(jax.device_get(slam.map.kf_R[new_kf]))
            slam.t_cur = np.asarray(jax.device_get(slam.map.kf_t[new_kf]))
            slam.vel_R = np.eye(3, dtype=np.float32)
            slam.vel_t = np.zeros(3, np.float32)
            return True
        return False
