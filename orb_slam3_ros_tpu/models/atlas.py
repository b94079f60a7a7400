"""Atlas: multi-map management — create-on-loss, archived-map
relocalization, and Sim3 map merging.

Role of the reference's ``Atlas`` (orb_slam3/src/Atlas.cc: CreateNewMap
:58, set of Maps with one active) together with the tracking-loss policy
(``Tracking::CreateMapInAtlas`` / reset decision, Tracking.cc:2050-2068:
reset a map with <10 KFs, else archive it and start fresh) and the
map-merge entry of ``LoopClosing`` (place recognition across maps ->
MergeLocal, LoopClosing.cc:1140-1211/2546).

TPU-native shape: an archived map is just the (host-pinned) ``MapState``
pytree + counters + precomputed retrieval signatures; merging transforms
the younger map's arrays by the verified Sim3 and bulk-copies them into
free slots of the older map's fixed-capacity arrays (id remap = one
vectorized offset).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import retrieval, sim3solver
from . import map_state as ms
from .loop_closing import _match_points_between


@dataclass
class ArchivedMap:
    m: ms.MapState
    n_kf: int
    n_pts: int
    sigs: jnp.ndarray  # [K, A] retrieval signatures
    # Inertial side-state (None for visual maps): per-KF IMU blocks,
    # initialization flags, chain-break set (see InertialSlam).
    imu: Optional[dict] = None


@dataclass
class Atlas:
    """Host-side multi-map registry attached to a SLAM system."""

    min_kf_keep: int = 8  # maps smaller than this are discarded on loss
    maps: list = field(default_factory=list)
    # Optional trained vocabulary (shared with the loop closer); set it
    # BEFORE mapping starts — archived signatures are not recomputed.
    vocab: Optional[jnp.ndarray] = None

    def archive_current(self, slam) -> bool:
        """Archive the active map if it is worth keeping (>= min_kf_keep
        keyframes), then reset the system to a fresh empty map. Returns
        True if archived, False if discarded (reference resets small maps
        in place, Tracking.cc:2050-2068)."""
        from . import map_state

        keep = slam.n_kf >= self.min_kf_keep
        inertial = hasattr(slam, "kf_imu_acc")
        # Fold in any in-flight global BA before the map is frozen.
        while getattr(slam, "_gba", None) is not None:
            slam._poll_gba(force=True)
        if keep:
            sigs = retrieval.kf_signatures(
                slam.map.kf_desc_sign, slam.map.kf_feat_valid, self.vocab
            )
            imu = None
            if inertial:
                imu = dict(
                    acc=slam.kf_imu_acc.copy(), gyro=slam.kf_imu_gyro.copy(),
                    dts=slam.kf_imu_dts.copy(),
                    initialized=slam.imu_initialized, stage=slam.imu_stage,
                    chain_breaks=set(slam.chain_breaks),
                )
            self.maps.append(
                ArchivedMap(
                    m=jax.tree.map(jnp.asarray, slam.map),
                    n_kf=slam.n_kf, n_pts=slam.n_pts,
                    sigs=sigs, imu=imu,
                )
            )
        if inertial:
            # A fresh map starts un-initialized on a fresh IMU chain; the
            # sensor history (_imu_history) carries over — the reference's
            # CreateMapInAtlas likewise keeps grabbing IMU
            # (Tracking.cc:2701).
            slam.kf_imu_acc[:] = 0
            slam.kf_imu_gyro[:] = 0
            slam.kf_imu_dts[:] = 0
            slam.imu_initialized = False
            slam.imu_stage = 0
            slam.chain_breaks = set()
            slam.v_cur = np.zeros(3, np.float32)
            slam.bg_cur = np.zeros(3, np.float32)
            slam.ba_cur = np.zeros(3, np.float32)
        slam.map = map_state.empty_map(slam.K_cap, slam.N, slam.P_cap)
        if getattr(slam, "map_dev", None) is not None:
            slam.map = jax.device_put(slam.map, slam.map_dev)
            slam._sync_replica()
        slam.n_kf = 0
        slam.n_pts = 0
        slam.init_feats = None
        slam.R_cur = np.eye(3, dtype=np.float32)
        slam.t_cur = np.zeros(3, np.float32)
        slam.vel_R = np.eye(3, dtype=np.float32)
        slam.vel_t = np.zeros(3, np.float32)
        from .system import NOT_INITIALIZED

        slam.state = NOT_INITIALIZED
        slam._ref_cache = None
        return keep

    # ------------------------------------------------------------------
    def try_relocalize_in_archived(self, slam, feats) -> bool:
        """Try to continue in an archived map (re-encounter of an old map,
        the trigger for the reference's map-merge path). On success the
        archived map becomes active; the (young) current map is dropped —
        if the current map is substantial the caller should run
        ``merge_current_into`` instead."""
        from . import tracking
        from .system import OK

        for k, am in enumerate(self.maps):
            q = retrieval.signature(feats.desc_sign, feats.valid, self.vocab)
            cand_ids, scores = retrieval.detect_candidates(
                q, am.sigs, am.m.kf_valid, jnp.zeros((am.m.K,), bool),
                min_common_score=0.3,
            )
            for c in np.asarray(jax.device_get(cand_ids)):
                if c < 0:
                    continue
                res = tracking.track_against_map(
                    am.m, feats, am.m.kf_R[int(c)], am.m.kf_t[int(c)],
                    slam.cam_params, slam.width, slam.height,
                )
                if int(jax.device_get(res.n_inliers)) >= 30:
                    # switch active map
                    slam.map = am.m
                    if getattr(slam, "map_dev", None) is not None:
                        slam.map = jax.device_put(slam.map, slam.map_dev)
                        slam._sync_replica()
                    slam.n_kf = am.n_kf
                    slam.n_pts = am.n_pts
                    if am.imu is not None:
                        slam.kf_imu_acc = am.imu["acc"].copy()
                        slam.kf_imu_gyro = am.imu["gyro"].copy()
                        slam.kf_imu_dts = am.imu["dts"].copy()
                        slam.imu_initialized = am.imu["initialized"]
                        slam.imu_stage = am.imu["stage"]
                        slam.chain_breaks = set(am.imu["chain_breaks"])
                        # The next keyframe starts a fresh IMU chain (the
                        # archived map was recorded earlier; no
                        # preintegration spans the time gap).
                        slam.chain_breaks.add(am.n_kf)
                        if am.imu["initialized"]:
                            bg, ba = jax.device_get(
                                (am.m.kf_bg[am.n_kf - 1],
                                 am.m.kf_ba[am.n_kf - 1])
                            )
                            slam.bg_cur = np.asarray(bg)
                            slam.ba_cur = np.asarray(ba)
                            slam.v_cur = np.zeros(3, np.float32)
                    R_new, t_new = jax.device_get((res.R, res.t))
                    slam.R_cur = np.asarray(R_new)
                    slam.t_cur = np.asarray(t_new)
                    slam.vel_R = np.eye(3, dtype=np.float32)
                    slam.vel_t = np.zeros(3, np.float32)
                    slam.state = OK
                    slam._ref_cache = None
                    del self.maps[k]
                    return True
        return False

    # ------------------------------------------------------------------
    def merge_current_into(self, slam, archived_idx: int, key) -> bool:
        """Weld the active map into an archived one (MergeLocal role,
        LoopClosing.cc:2546): find a Sim3 between a current keyframe and
        an archived keyframe via matched landmarks, transform the current
        map into the archived frame, and bulk-copy the archived content
        into the active arrays (capacities permitting).

        Inertial maps (MergeLocal2 role, LoopClosing.cc:3114): when both
        maps are IMU-initialized their scales are metric, so the weld is
        rigid (fix_scale); velocities rotate with the world transform,
        the per-KF IMU blocks are re-indexed alongside the keyframes, the
        seam is recorded as a chain break (no preintegration spans two
        separately-recorded chains), and a visual-inertial welding BA
        runs over the seam window (MergeInertialBA role,
        Optimizer.cc:4093)."""
        while getattr(slam, "_gba", None) is not None:
            slam._poll_gba(force=True)
        am = self.maps[archived_idx]
        cur = slam.map
        inertial = hasattr(slam, "kf_imu_acc")
        both_metric = bool(
            inertial
            and am.imu is not None
            and am.imu["initialized"]
            and slam.imu_initialized
        )
        # Rank cross-map KF pairs by signature score and try the best few
        # (the reference evaluates several merge candidates,
        # LoopClosing.cc:1596; a single argmax pair is fragile when the
        # revisit overlap is partial).
        cur_sigs = retrieval.kf_signatures(cur.kf_desc_sign, cur.kf_feat_valid, self.vocab)
        S = np.array(jax.device_get(cur_sigs @ am.sigs.T))  # [Kc, Ka] (writable copy)
        S[slam.n_kf:, :] = -1
        S[:, am.n_kf:] = -1
        order = np.argsort(S.reshape(-1))[::-1][:5]
        res = None
        for flat_idx in order:
            kc, ka = np.unravel_index(int(flat_idx), S.shape)
            if S[kc, ka] < 0.2:
                break
            # Matched landmark pairs between the two keyframes (cross-map).
            # Descriptor-only seeds across independently-built maps are
            # sparse, so the RANSAC bar is low; the Sim3-guided grow +
            # IRLS refit below (SearchBySim3 -> OptimizeSim3,
            # LoopClosing.cc:1596-1690) must reach the real support bar.
            X1, X2, ok, pt1, pt2 = _cross_map_pairs(cur, am.m, int(kc), int(ka))
            if int(jax.device_get(ok.sum())) < 8:
                continue
            cand = sim3solver.solve_sim3(
                X1, X2, ok, slam.cam_params, key, min_inliers=8,
                fix_scale=both_metric,
            )
            if not bool(jax.device_get(cand.ok)):
                continue
            X1g, X2g, okg, pt1, pt2, sig1g, sig2g = _cross_map_grow(
                cur, am.m, int(kc), int(ka), cand.s, cand.R, cand.t,
                slam.cam_params, slam.width, slam.height,
            )
            ref = sim3solver.refine_sim3(
                X1g, X2g, okg, slam.cam_params, cand.s, cand.R, cand.t,
                fix_scale=both_metric, min_inliers=15,
                sigma2_1=sig1g, sigma2_2=sig2g,
            )
            if bool(jax.device_get(ref.ok)):
                res = ref
                break
        if res is None:
            return False
        # S21: X_in_ka_cam = s R X_in_kc_cam + t. World-to-world:
        # S_wa<-wc = T_ka_w^-1 * S21 * T_kc_w  (poses cam<-world).
        R_kc, t_kc = cur.kf_R[int(kc)], cur.kf_t[int(kc)]
        R_ka, t_ka = am.m.kf_R[int(ka)], am.m.kf_t[int(ka)]
        from ..ops import lie

        s21, R21, t21 = res.s, res.R, res.t
        # world_c -> cam_kc -> cam_ka -> world_a
        R1, t1, s1 = R_kc, t_kc, jnp.asarray(1.0)
        Rm, tm, sm = lie.sim3_mul(R21, t21, s21, R1, t1, s1)
        Rai, tai, sai = lie.sim3_inv(R_ka, t_ka, jnp.asarray(1.0))
        Rw, tw, sw = lie.sim3_mul(Rai, tai, sai, Rm, tm, sm)
        # Transform current map into archived world frame.
        cur_t = _transform_map(cur, Rw, tw, sw)
        merged, n_kf, n_pts = _concat_maps(am.m, am.n_kf, am.n_pts, cur_t,
                                           slam.n_kf, slam.n_pts)
        if merged is None:
            return False
        base_kf = am.n_kf
        slam.map = merged
        if getattr(slam, "map_dev", None) is not None:
            slam.map = jax.device_put(slam.map, slam.map_dev)
            slam._sync_replica()
        if inertial:
            # Re-index the per-KF IMU blocks: archived blocks keep ids
            # [0, base_kf), current blocks shift to [base_kf, ...).
            acc = np.zeros_like(slam.kf_imu_acc)
            gyro = np.zeros_like(slam.kf_imu_gyro)
            dts = np.zeros_like(slam.kf_imu_dts)
            if am.imu is not None:
                acc[:base_kf] = am.imu["acc"][:base_kf]
                gyro[:base_kf] = am.imu["gyro"][:base_kf]
                dts[:base_kf] = am.imu["dts"][:base_kf]
            acc[base_kf : base_kf + slam.n_kf] = slam.kf_imu_acc[: slam.n_kf]
            gyro[base_kf : base_kf + slam.n_kf] = slam.kf_imu_gyro[: slam.n_kf]
            dts[base_kf : base_kf + slam.n_kf] = slam.kf_imu_dts[: slam.n_kf]
            slam.kf_imu_acc, slam.kf_imu_gyro, slam.kf_imu_dts = acc, gyro, dts
            old_breaks = am.imu["chain_breaks"] if am.imu else set()
            slam.chain_breaks = (
                set(old_breaks)
                | {base_kf + b for b in slam.chain_breaks}
                | {base_kf}  # the weld seam itself
            )
            slam.imu_initialized = both_metric
            if not both_metric:
                slam.imu_stage = 0
        slam.n_kf = n_kf
        slam.n_pts = n_pts
        # Current frame pose moves with the map transform (same formula
        # as _transform_map applied to a single Tcw): R' = R Rw^T,
        # t' = s t - R Rw^T tw — no snap to the last keyframe, so the
        # first post-weld frame has no pose glitch.
        Rwn = np.asarray(jax.device_get(Rw))
        twn = np.asarray(jax.device_get(tw))
        swn = float(jax.device_get(sw))
        R_old, t_old = np.asarray(slam.R_cur), np.asarray(slam.t_cur)
        slam.R_cur = (R_old @ Rwn.T).astype(np.float32)
        slam.t_cur = (swn * t_old - R_old @ Rwn.T @ twn).astype(np.float32)
        slam.vel_R = np.eye(3, dtype=np.float32)
        slam.vel_t = np.zeros(3, np.float32)
        if inertial:
            # Body velocity rotates/scales with the world frame.
            slam.v_cur = (swn * Rwn @ np.asarray(slam.v_cur)).astype(
                np.float32
            )
        slam._ref_cache = None
        del self.maps[archived_idx]
        if both_metric:
            # Welding VI-BA over the seam window (MergeInertialBA role):
            # the chain-break mask drops the nonexistent cross-chain
            # preintegration edge; reprojection edges tie the two sides.
            slam._run_vi_ba(window=slam.W, n_iters=6)
        return True


def _cross_map_grow(
    m1: ms.MapState, m2: ms.MapState, kf1, kf2, s21, R21, t21,
    cam_params, width: int, height: int, radius: float = 10.0,
):
    """Widen a cross-map correspondence set under a Sim3 hypothesis —
    the merge-side ``ORBmatcher::SearchBySim3`` (ORBmatcher.cc:1457,
    driven by LoopClosing's merge path): project map-1 keyframe kf1's
    bound landmarks through S21 into map-2 keyframe kf2's image and
    re-match by descriptor within ``radius``. The descriptor-only seed
    pairs are typically few (two viewpoints, independent maps); the
    projection-guided set is what makes the weld well-conditioned."""
    from functools import partial as _p

    from ..ops import cameras, hamming, matching
    from .loop_closing import _kf_features

    P1, P2, N = m1.P, m2.P, m1.N
    pt1 = m1.kf_obs[kf1]
    p1c = jnp.clip(pt1, 0, P1 - 1)
    X1w = m1.pt_X[p1c]
    X1 = jnp.einsum("ij,nj->ni", m1.kf_R[kf1], X1w) + m1.kf_t[kf1]
    X1in2 = s21 * jnp.einsum("ij,nj->ni", R21, X1) + t21
    uv2 = cameras.pinhole_project_nodist(cam_params, X1in2)
    src_ok = (
        (pt1 >= 0)
        & m1.kf_feat_valid[kf1]
        & m1.pt_valid[p1c]
        & (X1in2[:, 2] > 0.05)
        & cameras.in_image(uv2, width, height, 2.0)
    )
    f2 = _kf_features(m2, jnp.asarray(kf2))
    f2 = f2._replace(valid=f2.valid & (m2.kf_obs[kf2] >= 0))
    idx, _ = matching.search_by_projection(
        uv2, src_ok, m1.pt_level[p1c], m1.pt_desc_sign[p1c], f2,
        radius=radius, max_dist=hamming.TH_HIGH, ratio=1.0,
    )
    fidx2 = jnp.clip(idx, 0, m2.N - 1)
    pt2 = m2.kf_obs[kf2][fidx2]
    ok = (
        src_ok
        & (idx >= 0)
        & (pt2 >= 0)
        & m2.pt_valid[jnp.clip(pt2, 0, P2 - 1)]
    )
    X2w = m2.pt_X[jnp.clip(pt2, 0, P2 - 1)]
    X2 = jnp.einsum("ij,nj->ni", m2.kf_R[kf2], X2w) + m2.kf_t[kf2]
    sig1 = 1.2 ** (2.0 * m1.kf_level[kf1].astype(X1.dtype))
    sig2 = 1.2 ** (2.0 * m2.kf_level[kf2][fidx2].astype(X1.dtype))
    return X1, X2, ok, pt1, pt2, sig1, sig2


def _cross_map_pairs(m1: ms.MapState, m2: ms.MapState, kf1: int, kf2: int):
    """Landmark pairs between keyframes of two different maps (the
    cross-map variant of loop_closing._match_points_between)."""
    from ..ops import hamming, matching
    from .loop_closing import _kf_features

    f1 = _kf_features(m1, jnp.asarray(kf1))
    f2 = _kf_features(m2, jnp.asarray(kf2))
    idx, dist = matching.search_frame_frame(f1, f2, max_dist=64, ratio=0.85)
    fidx2 = jnp.clip(idx, 0, m2.N - 1)
    pt1 = m1.kf_obs[kf1]
    pt2 = m2.kf_obs[kf2][fidx2]
    ok = (
        (idx >= 0)
        & (pt1 >= 0)
        & (pt2 >= 0)
        & m1.pt_valid[jnp.clip(pt1, 0, m1.P - 1)]
        & m2.pt_valid[jnp.clip(pt2, 0, m2.P - 1)]
    )
    X1w = m1.pt_X[jnp.clip(pt1, 0, m1.P - 1)]
    X2w = m2.pt_X[jnp.clip(pt2, 0, m2.P - 1)]
    X1 = jnp.einsum("ij,nj->ni", m1.kf_R[kf1], X1w) + m1.kf_t[kf1]
    X2 = jnp.einsum("ij,nj->ni", m2.kf_R[kf2], X2w) + m2.kf_t[kf2]
    return X1, X2, ok, pt1, pt2


@jax.jit
def _transform_map(m: ms.MapState, Rw, tw, sw):
    """Apply a world-to-world Sim3 to every pose/point (the welding
    transform applied to the younger map). Body velocities rotate and
    scale with the world frame (v' = s Rw v)."""
    X = sw * m.pt_X @ Rw.T + tw
    # Tcw' : X_cam = R_cw' X' + t_cw' must equal old cam coords / scale-adj.
    Rwi, twi, swi = (jnp.swapaxes(Rw, -1, -2), -jnp.einsum("ji,j->i", Rw, tw) / sw, 1.0 / sw)
    new_R = jnp.einsum("kij,jl->kil", m.kf_R, Rwi)
    new_t = sw * m.kf_t  # scale like ApplyScaledRotation
    # translation also needs the rotation/offset part:
    # X_cam = R_cw (Rwi (X' - tw)/sw)... full: R_cw' = R_cw Rwi, t_cw' =
    # s^-1... derive: X = Rwi (X' - tw) / sw ; X_cam = R_cw X + t_cw
    # = R_cw Rwi/sw X' - R_cw Rwi tw / sw + t_cw. Up to global scale sw
    # (projection-invariant), multiply by sw:
    new_t = -jnp.einsum("kij,jl,l->ki", m.kf_R, Rwi, tw) + sw * m.kf_t
    new_v = sw * m.kf_v @ Rw.T
    return m._replace(pt_X=X, kf_R=new_R, kf_t=new_t, kf_v=new_v)


def _concat_maps(base: ms.MapState, base_kf: int, base_pts: int,
                 other: ms.MapState, other_kf: int, other_pts: int):
    """Copy `other`'s live content into `base`'s free slots (id remap =
    offset). Returns (merged, n_kf, n_pts) or (None, 0, 0) on capacity
    overflow."""
    K, P = base.K, base.P
    if base_kf + other_kf > K or base_pts + other_pts > P:
        return None, 0, 0
    kf_slice = jnp.arange(other_kf)
    pt_off = base_pts
    m = base
    obs_other = other.kf_obs[kf_slice]
    obs_shift = jnp.where(obs_other >= 0, obs_other + pt_off, -1)
    m = m._replace(
        kf_valid=m.kf_valid.at[base_kf : base_kf + other_kf].set(other.kf_valid[kf_slice]),
        kf_R=m.kf_R.at[base_kf : base_kf + other_kf].set(other.kf_R[kf_slice]),
        kf_t=m.kf_t.at[base_kf : base_kf + other_kf].set(other.kf_t[kf_slice]),
        kf_xy=m.kf_xy.at[base_kf : base_kf + other_kf].set(other.kf_xy[kf_slice]),
        kf_level=m.kf_level.at[base_kf : base_kf + other_kf].set(other.kf_level[kf_slice]),
        kf_angle=m.kf_angle.at[base_kf : base_kf + other_kf].set(other.kf_angle[kf_slice]),
        kf_desc_sign=m.kf_desc_sign.at[base_kf : base_kf + other_kf].set(other.kf_desc_sign[kf_slice]),
        kf_feat_valid=m.kf_feat_valid.at[base_kf : base_kf + other_kf].set(other.kf_feat_valid[kf_slice]),
        kf_obs=m.kf_obs.at[base_kf : base_kf + other_kf].set(obs_shift),
        kf_ts=m.kf_ts.at[base_kf : base_kf + other_kf].set(other.kf_ts[kf_slice]),
        kf_ur=m.kf_ur.at[base_kf : base_kf + other_kf].set(other.kf_ur[kf_slice]),
        kf_v=m.kf_v.at[base_kf : base_kf + other_kf].set(other.kf_v[kf_slice]),
        kf_bg=m.kf_bg.at[base_kf : base_kf + other_kf].set(other.kf_bg[kf_slice]),
        kf_ba=m.kf_ba.at[base_kf : base_kf + other_kf].set(other.kf_ba[kf_slice]),
        pt_valid=m.pt_valid.at[pt_off : pt_off + other_pts].set(other.pt_valid[:other_pts]),
        pt_X=m.pt_X.at[pt_off : pt_off + other_pts].set(other.pt_X[:other_pts]),
        pt_desc_sign=m.pt_desc_sign.at[pt_off : pt_off + other_pts].set(other.pt_desc_sign[:other_pts]),
        pt_level=m.pt_level.at[pt_off : pt_off + other_pts].set(other.pt_level[:other_pts]),
        pt_found=m.pt_found.at[pt_off : pt_off + other_pts].set(other.pt_found[:other_pts]),
        pt_visible=m.pt_visible.at[pt_off : pt_off + other_pts].set(other.pt_visible[:other_pts]),
        pt_first_kf=m.pt_first_kf.at[pt_off : pt_off + other_pts].set(
            other.pt_first_kf[:other_pts] + base_kf
        ),
    )
    return m, base_kf + other_kf, base_pts + other_pts
