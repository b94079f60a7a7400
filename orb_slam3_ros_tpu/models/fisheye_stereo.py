"""Two-camera (non-rectified, fisheye) stereo pipelines.

Role of the reference's two-camera machinery: the ``Frame`` two-camera
constructor with left->right extrinsic ``Tlr``
(orb_slam3/include/Frame.h:346), ``ComputeStereoFishEyeMatches``
(orb_slam3/src/Frame.cc:1126-1227: brute-force descriptor match between
the fisheye views + DLT triangulation + reprojection gating — no
rectified row search), and the ``EdgeSE3ProjectXYZToBody`` factor
(orb_slam3/include/OptimizableTypes.h:118-196) that lets right-camera
observations constrain the left-camera pose through the fixed Tlr —
the TUM-VI stereo(-inertial) configuration
(config/Stereo-Inertial/TUM-VI.yaml).

TPU shape: extraction of both views + cross-camera match/triangulation
fuse into one jitted dispatch per frame; the per-frame refinement runs
``ops.twocam.pose_optimization_two_cam`` over a mixed left/right edge
table (per-edge camera-selection mask, one program). Metric scale
enters through cross-camera triangulation (instant metric init +
metric landmark creation at every keyframe); local BA refines the
metric map over the left-view observation rows.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import twocam
from . import map_updates
from .inertial_system import InertialSlam
from .system import NOT_INITIALIZED, OK, RECENTLY_LOST, MonoSlam


@partial(jax.jit, static_argnames=("cam_model",))
def _twocam_refine(
    m, feats, feat_pt, cross_ok, right_feat, uv_right,
    R0, t0, R_rl, t_rl, cam_params, cam_model,
):
    """Mixed left/right motion-only refinement: every tracked landmark
    contributes its LEFT reprojection edge; landmarks whose left feature
    also cross-matched contribute the RIGHT view's edge through Tlr
    (EdgeSE3ProjectXYZToBody role). One fused program, 2N edge rows."""
    P = m.P
    N = feats.xy.shape[0]
    pt = jnp.clip(feat_pt, 0, P - 1)
    bound = (feat_pt >= 0) & m.pt_valid[pt] & feats.valid
    Xw = m.pt_X[pt]
    inv_sigma2_l = 1.2 ** (-2.0 * feats.level.astype(jnp.float32))
    # Right-view rows reuse the right feature's pyramid level.
    Xw2 = jnp.concatenate([Xw, Xw])
    uv2 = jnp.concatenate([feats.xy, uv_right])
    is_right = jnp.concatenate(
        [jnp.zeros((N,), bool), jnp.ones((N,), bool)]
    )
    valid2 = jnp.concatenate([bound, bound & cross_ok])
    inv_s2 = jnp.concatenate([inv_sigma2_l, inv_sigma2_l])
    res = twocam.pose_optimization_two_cam(
        R0, t0, Xw2, uv2, is_right, R_rl, t_rl, inv_s2, valid2,
        cam_params, cam_model=cam_model,
    )
    return res


class FisheyeStereoSlam(MonoSlam):
    """Non-rectified two-camera pipeline (both views fisheye KB8 or
    pinhole; intrinsics shared — the synthetic rig and TUM-VI's two
    near-identical cameras)."""

    def __init__(self, *args, R_rl=None, t_rl=None, **kw):
        kw.setdefault("cam_model", "kb8")
        kw.setdefault("pipelined", False)
        super().__init__(*args, **kw)
        # Left->right extrinsic (the reference's Tlr inverse pair):
        # X_r = R_rl X_l + t_rl.
        self.R_rl = jnp.asarray(
            np.eye(3, dtype=np.float32) if R_rl is None else R_rl
        )
        self.t_rl = jnp.asarray(
            np.zeros(3, np.float32) if t_rl is None else t_rl
        )
        self.baseline = float(np.linalg.norm(np.asarray(self.t_rl)))
        # Gross-outlier depth gate. NOT the rectified path's tight
        # 40*baseline close-point rule: a cap inside the scene's depth
        # range TRUNCATES the (noisy, ~15%-sigma) triangulated depth
        # distribution — only under-estimates survive near the cap and
        # the map converges 15-25% too shallow (measured per-KF landmark
        # z / GT z medians 0.75-0.93 with a 40x cap). 80x baseline sits
        # beyond the room, so it only rejects clear mismatches.
        self.max_depth = 80.0 * max(self.baseline, 1e-6)
        # Metric depth from the cross-camera match ALSO feeds BA as
        # virtual (u, v, u_r) stereo rows, u_r = u - bf/z — the RGB-D
        # virtual-disparity mechanism (Frame::ComputeStereoFromRGBD,
        # Frame.cc:984). The per-frame refinement uses the exact ToBody
        # edges; BA's virtual rows carry the same baseline geometry and
        # anchor the map scale (pure left-view rows leave scale to
        # drift with tracking noise — measured 24% over 28 frames).
        self.bf = float(np.asarray(self.cam_params)[0]) * self.baseline
        self._last_cross = None  # (cross, uv_right) of the current frame
        self._frame_prog = None

    # -- fused per-frame front end: extract both views + cross-match ----
    def _frame_program(self):
        prog = self._frame_prog
        if prog is not None:
            return prog
        from ..ops import orb as orb_mod

        def _prog(il, ir):
            fl = orb_mod.extract(il, self.config)
            fr = orb_mod.extract(ir, self.config)
            cross = twocam.triangulate_cross_camera(
                fl, fr, self.R_rl, self.t_rl,
                self.cam_params, self.cam_params,
                cam_model=self.cam_model,
            )
            uv_right = fr.xy[cross.right_feat]
            return fl, cross, uv_right

        prog = jax.jit(_prog)
        self._frame_prog = prog
        return prog

    def process_frame(self, img_left, img_right, ts: float):
        import time

        self._check_ts_jump(ts)
        t0 = time.time()
        feats, cross, uv_right = self._frame_program()(
            jnp.asarray(img_left, jnp.float32),
            jnp.asarray(img_right, jnp.float32),
        )
        self._last_cross = (cross, uv_right)
        # Standard depth-frame view of the cross match (StereoMatch with
        # the virtual disparity): lets the shared stereo/VI keyframe
        # machinery (_vi_kf_work ur/depth path, stereo refine) consume
        # two-camera frames unchanged.
        from ..ops import stereo as stereo_ops

        z = cross.X_l[:, 2]
        candd = cross.ok & (z > 0.05) & (z < self.max_depth)
        z_safe = jnp.maximum(z, 1e-3)
        self._last_depth = stereo_ops.StereoMatch(
            u_right=jnp.where(candd, feats.xy[:, 0] - self.bf / z_safe, -1.0),
            depth=jnp.where(candd, z, -1.0),
            valid=candd,
        )
        t0 = self._tic("extract+cross", t0)
        if self.state == NOT_INITIALIZED:
            out = self._fisheye_initialize(feats, cross, ts)
        elif self.state in (OK, RECENTLY_LOST):
            self._predict_motion(ts)
            out = self._track(feats, ts)
        else:
            out = self._try_relocalize(feats, ts)
        self._tic("track", t0)
        self.frame_id += 1
        return out

    def _virtual_ur(self, feats, cross, cand):
        z = jnp.maximum(cross.X_l[:, 2], 1e-3)
        return jnp.where(
            cand, feats.xy[:, 0] - self.bf / z, -1.0
        )

    # -- instant metric init from the cross-camera triangulation --------
    def _fisheye_initialize(self, feats, cross, ts):
        if int(jax.device_get(cross.n_new)) < 60:
            return None
        kf_id = 0
        self.map = map_updates.insert_keyframe(
            self.map, jnp.asarray(kf_id), jnp.eye(3), jnp.zeros(3),
            jnp.asarray(ts, jnp.float32), feats,
            jnp.full((self.N,), -1, jnp.int32),
        )
        cand = cross.ok & (cross.X_l[:, 2] < self.max_depth)
        ur = self._virtual_ur(feats, cross, cand)
        self.map = self.map._replace(
            kf_ur=self.map.kf_ur.at[kf_id].set(ur)
        )
        self.map, n_new = map_updates.admit_depth_points(
            self.map, jnp.asarray(kf_id), cross.X_l, cand,
            jnp.asarray(0), jnp.asarray(self.P_cap),
        )
        self.map = map_updates.refresh_point_stats(
            self.map, n_levels=self.config.n_levels
        )
        self.n_kf = 1
        self.n_pts = int(jax.device_get(n_new))
        self.last_kf_frame = self.frame_id
        self.R_cur = np.eye(3, dtype=np.float32)
        self.t_cur = np.zeros(3, np.float32)
        self.state = OK
        self._warm_schedules()
        self._log_pose(ts)
        return self._pose_mat()

    # -- two-camera refinement after visual tracking --------------------
    def _track_post(self, feats, res, ts, fetched=None):
        lc = self._last_cross
        if lc is not None:
            cross, uv_right = lc
            r2 = _twocam_refine(
                self.map, feats, res.feat_pt, cross.ok, cross.right_feat,
                uv_right, res.R, res.t, self.R_rl, self.t_rl,
                self.cam_params, self.cam_model,
            )
            res = res._replace(R=r2.R, t=r2.t, n_inliers=r2.n_inliers)
            fetched = None  # pose changed: refetch in the base handler
        return super()._track_post(feats, res, ts, fetched=fetched)

    # -- keyframes: metric landmark creation from the cross match -------
    def _insert_keyframe(self, feats, ts, track_res):
        self._apply_kf_async(force=True)
        self.abort_gba()
        kf_id = self.n_kf
        self.map = map_updates.insert_keyframe(
            self.map, jnp.asarray(kf_id), jnp.asarray(self.R_cur),
            jnp.asarray(self.t_cur), jnp.asarray(ts, jnp.float32),
            feats, track_res.feat_pt,
        )
        self.n_kf += 1
        self.last_kf_frame = self.frame_id
        cross, _ = self._last_cross
        # X_l are LEFT-camera-frame metric points: to world via T_wl.
        X_w = (cross.X_l - jnp.asarray(self.t_cur)) @ jnp.asarray(self.R_cur)
        cand = cross.ok & (cross.X_l[:, 2] < self.max_depth)
        ur = self._virtual_ur(feats, cross, cand)
        self.map = self.map._replace(
            kf_ur=self.map.kf_ur.at[kf_id].set(ur)
        )
        self.map, n_new = map_updates.admit_depth_points(
            self.map, jnp.asarray(kf_id), X_w, cand,
            jnp.asarray(self.n_pts), jnp.asarray(self.P_cap - self.n_pts),
        )
        self._run_local_ba(n_iters=self.local_ba_iters)
        self.map = map_updates.cull_points(self.map, jnp.asarray(self.n_kf))
        self.map = map_updates.refresh_point_stats(
            self.map, n_levels=self.config.n_levels
        )
        n_new, R_cur, t_cur = jax.device_get(
            (n_new, self.map.kf_R[kf_id], self.map.kf_t[kf_id])
        )
        self.n_pts += int(n_new)
        self.R_cur = np.asarray(R_cur)
        self.t_cur = np.asarray(t_cur)
        if self.loop_closer is not None:
            self.key, sub = jax.random.split(self.key)
            self.loop_closer.try_close(self, kf_id, sub)
        self._set_ref_cache(self.n_kf - 1, self.R_cur, self.t_cur)


class FisheyeStereoInertialSlam(InertialSlam, FisheyeStereoSlam):
    """Two-camera fisheye + IMU — the TUM-VI stereo-inertial
    configuration (config/Stereo-Inertial/TUM-VI.yaml). Cooperative MRO
    like StereoInertialSlam: InertialSlam supplies IMU ingestion,
    prediction, the staged init (with ``fix_scale`` — the cross-camera
    triangulation observes metric scale) and VI keyframe BA;
    FisheyeStereoSlam supplies the two-camera frame construction,
    instant metric init, and cross-camera landmark creation."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.imu_fix_scale = True

    def process_frame(self, img_left, img_right, ts, acc=None, gyro=None,
                      dts=None):
        self._drain_vi_chunk()
        self._vi_dev_state = None
        if acc is not None and len(acc):
            self._imu_history.append(
                (ts, np.asarray(acc, np.float32),
                 np.asarray(gyro, np.float32),
                 np.asarray(dts, np.float32))
            )
            if len(self._imu_history) > 200:
                self._imu_history.pop(0)
        self._frame_imu = (acc, gyro, dts)
        return FisheyeStereoSlam.process_frame(self, img_left, img_right, ts)
