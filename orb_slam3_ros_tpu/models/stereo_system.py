"""Stereo and RGB-D pipelines on top of the monocular system.

Role of the reference's ``System(..., STEREO / RGBD)`` paths:
``Tracking::GrabImageStereo/GrabImageRGBD`` (Tracking.cc:1480/1553),
``StereoInitialization`` (instant metric init from depth, Tracking.cc:
2371), and the depth-based point creation in ``CreateNewKeyFrame``
(Tracking.cc:3255). Tracking/BA/loop stages are shared with the mono
pipeline — only frame construction and landmark sourcing differ, and
scale is observable (fix_scale Sim3, metric map).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import pose_opt as pose_opt_ops
from ..ops import stereo as stereo_ops
from . import map_updates, tracking
from .inertial_system import InertialSlam
from .system import LOST, NOT_INITIALIZED, OK, RECENTLY_LOST, MonoSlam


@jax.jit
def _stereo_refine(m, feats, feat_pt, ur, R0, t0, cam_params, bf):
    """Re-optimize the tracked pose over mixed mono/stereo (u, v, u_r)
    edges gathered from the tracker's per-feature landmark bindings (the
    stereo branch of PoseOptimization, Optimizer.cc:816)."""
    P = m.P
    pt = jnp.clip(feat_pt, 0, P - 1)
    valid = (feat_pt >= 0) & m.pt_valid[pt] & feats.valid
    inv_sigma2 = 1.2 ** (-2.0 * feats.level.astype(jnp.float32))
    return pose_opt_ops.pose_optimization_stereo(
        R0, t0, m.pt_X[pt], feats.xy, ur, bf, inv_sigma2, valid, cam_params,
    )


class StereoSlam(MonoSlam):
    """Rectified stereo pipeline."""

    def __init__(self, *args, baseline: float = 0.1, depth_factor_far: float = 40.0, **kw):
        kw.setdefault("pipelined", False)  # custom per-frame flow below
        super().__init__(*args, **kw)
        self.baseline = baseline
        # fx * baseline — the disparity scale of the (u, v, u_r) stereo
        # residuals (the reference's mbf).
        self.bf = float(np.asarray(self.cam_params)[0]) * baseline
        # points farther than depth_factor_far * baseline are "far" and
        # not created from single-view depth (reference mThDepth,
        # Tracking.cc:3255 close-point rule).
        self.max_depth = depth_factor_far * baseline
        self._match_stereo = jax.jit(
            lambda fl, fr, il, ir: stereo_ops.match_stereo(
                fl, fr, il, ir,
                fx=float(np.asarray(self.cam_params)[0]),
                baseline=self.baseline,
            )
        )
        self._last_depth = None

    def _track_post(self, feats, res, ts):
        """Stereo refinement of the visually tracked pose before the
        standard bookkeeping."""
        sm = self._last_depth
        if sm is not None:
            ur = jnp.where(sm.valid, sm.u_right, -1.0)
            r2 = _stereo_refine(
                self.map, feats, res.feat_pt, ur, res.R, res.t,
                self.cam_params, jnp.asarray(self.bf, jnp.float32),
            )
            res = res._replace(R=r2.R, t=r2.t, n_inliers=r2.n_inliers)
        return super()._track_post(feats, res, ts)

    # ------------------------------------------------------------------
    def process_frame(self, img_left, img_right, ts: float):
        import time

        self._check_ts_jump(ts)
        t0 = time.time()
        il = jnp.asarray(img_left, jnp.float32)
        ir = jnp.asarray(img_right, jnp.float32)
        feats = self._extract(il)
        feats_r = self._extract(ir)
        sm = self._match_stereo(feats, feats_r, il, ir)
        self._last_depth = sm
        t0 = self._tic("extract+stereo", t0)

        if self.state == NOT_INITIALIZED:
            out = self._stereo_initialize(feats, sm, ts)
        elif self.state in (OK, RECENTLY_LOST):
            self._predict_motion(ts)
            out = self._track(feats, ts)
        else:
            out = self._try_relocalize(feats, ts)
        self._tic("track", t0)
        self.frame_id += 1
        return out

    # ------------------------------------------------------------------
    def _depth_candidates(self, sm):
        return sm.valid & (sm.depth > 0) & (sm.depth < self.max_depth)

    def _stereo_initialize(self, feats, sm, ts):
        """Instant metric initialization from the first adequately-deep
        frame (StereoInitialization, Tracking.cc:2371-2480)."""
        cand = self._depth_candidates(sm)
        if int(jax.device_get(cand.sum())) < 100:
            return None
        kf_id = 0
        self.map = map_updates.insert_keyframe(
            self.map, jnp.asarray(kf_id), jnp.eye(3), jnp.zeros(3),
            jnp.asarray(ts, jnp.float32), feats,
            jnp.full((self.N,), -1, jnp.int32),
            ur=jnp.where(sm.valid, sm.u_right, -1.0),
        )
        X_c = stereo_ops.backproject(self.cam_params, feats.xy, sm.depth)
        self.map, n_new = map_updates.admit_depth_points(
            self.map, jnp.asarray(kf_id), X_c, cand,
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

    # ------------------------------------------------------------------
    def _insert_keyframe(self, feats, ts, track_res):
        kf_id = self.n_kf
        sm0 = self._last_depth
        ur = jnp.where(sm0.valid, sm0.u_right, -1.0) if sm0 is not None else None
        self.map = map_updates.insert_keyframe(
            self.map, jnp.asarray(kf_id), jnp.asarray(self.R_cur),
            jnp.asarray(self.t_cur), jnp.asarray(ts, jnp.float32),
            feats, track_res.feat_pt, ur=ur,
        )
        self.n_kf += 1
        self.last_kf_frame = self.frame_id

        # New landmarks from stereo depth (world frame via current pose).
        sm = self._last_depth
        cand = self._depth_candidates(sm)
        X_c = stereo_ops.backproject(self.cam_params, feats.xy, sm.depth)
        X_w = (X_c - jnp.asarray(self.t_cur)) @ jnp.asarray(self.R_cur)
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

    # NOTE: no _run_local_ba override — stereo reuses the mono window
    # logic verbatim (metric gauge needs >= 1 fixed KF, which it always
    # has), and the chunk gate's identity check
    # (`type(self)._run_local_ba is MonoSlam._run_local_ba`) must hold
    # for the stereo chunk loop to engage.

    # ------------------------------------------------------------------
    # Device-resident stereo chunk loop: [2,H,W] pairs ride the frame
    # stack; the chunk step extracts both views, stereo-matches, and
    # builds (u, v, u_r) BA rows (device_loop.make_chunk_runner with
    # stereo=True). Fallback/replay frames split the pair back into the
    # per-frame path.
    def _chunk_stereo(self) -> bool:
        return True

    def _fallback_frame(self, img, ts: float):
        import numpy as _np

        if isinstance(img, (tuple, list)):
            il, ir = img
        else:
            arr = _np.asarray(img)
            il, ir = arr[0], arr[1]
        return self.process_frame(il, ir, ts)

    def process_frames(self, imgs, tss, imgs_right=None) -> None:
        """Chunked stereo tracking. ``imgs`` is either the mono-protocol
        ``(stack [N,2,H,W], offset)`` device tuple, or a host list of
        left frames with ``imgs_right`` the matching right frames."""
        if imgs_right is not None:
            import numpy as _np

            pairs = _np.stack(
                [_np.stack([l, r]) for l, r in zip(imgs, imgs_right)]
            )
            return super().process_frames(pairs, tss)
        return super().process_frames(imgs, tss)


class StereoInertialSlam(InertialSlam, StereoSlam):
    """Stereo-inertial pipeline (the reference's IMU_STEREO mode).

    Cooperative MRO: InertialSlam supplies IMU ingestion, prediction,
    staged initialization (with ``fix_scale=True`` — stereo observes
    metric scale, like the reference's stereo IMU init,
    LocalMapping.cc:1181 ``mbMonocular`` branch) and VI keyframe BA;
    StereoSlam supplies frame construction, instant metric init, and
    depth-based landmark creation. ``InertialSlam._insert_keyframe``'s
    ``super()`` resolves to the stereo keyframe path.
    """

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.imu_fix_scale = True

    def process_frame(self, img_left, img_right, ts, acc=None, gyro=None,
                      dts=None):
        import numpy as _np

        self._drain_vi_chunk()
        self._vi_dev_state = None
        if acc is not None and len(acc):
            self._imu_history.append(
                (ts, _np.asarray(acc, _np.float32),
                 _np.asarray(gyro, _np.float32),
                 _np.asarray(dts, _np.float32))
            )
            if len(self._imu_history) > 200:
                self._imu_history.pop(0)
        self._frame_imu = (acc, gyro, dts)
        return StereoSlam.process_frame(self, img_left, img_right, ts)

    def _fallback_frame_imu(self, img, ts, acc, gyro, dts):
        import numpy as _np

        if isinstance(img, (tuple, list)):
            il, ir = img
        else:
            arr = _np.asarray(img)
            il, ir = arr[0], arr[1]
        return self.process_frame(il, ir, ts, acc=acc, gyro=gyro, dts=dts)


class RgbdSlam(StereoSlam):
    """RGB-D pipeline: depth sampled from the sensor depth map at feature
    locations (GrabImageRGBD converts depth to virtual right coords,
    Tracking.cc:1553 + Frame.cc:984; backprojection here skips the
    virtual-disparity detour)."""

    def __init__(self, *args, max_depth: float = 8.0, **kw):
        kw.pop("baseline", None)
        super().__init__(*args, baseline=0.05, **kw)
        self.max_depth = max_depth

    def _depth_to_match(self, feats, dm):
        """Sample depth at feature locations and derive the VIRTUAL right
        coordinate u_r = u - bf/d (Frame::ComputeStereoFromRGBD,
        Frame.cc:984) so RGB-D observations feed the same (u, v, u_r)
        stereo residuals as true stereo."""
        xi = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 0, dm.shape[1] - 1)
        yi = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 0, dm.shape[0] - 1)
        d = dm[yi, xi]
        valid = feats.valid & (d > 0.05)
        d_safe = jnp.maximum(d, 0.05)
        u_r = feats.xy[:, 0] - self.bf / d_safe
        return stereo_ops.StereoMatch(
            u_right=jnp.where(valid, u_r, -1.0),
            depth=d,
            valid=valid,
        )

    def process_frame(self, img, depth_map, ts: float):
        import time

        self._check_ts_jump(ts)
        t0 = time.time()
        il = jnp.asarray(img, jnp.float32)
        feats = self._extract(il)
        sm = self._depth_to_match(feats, jnp.asarray(depth_map, jnp.float32))
        self._last_depth = sm
        t0 = self._tic("extract+depth", t0)

        if self.state == NOT_INITIALIZED:
            out = self._stereo_initialize(feats, sm, ts)
        elif self.state in (OK, RECENTLY_LOST):
            out = self._track(feats, ts)
        else:
            out = self._try_relocalize(feats, ts)
        self._tic("track", t0)
        self.frame_id += 1
        return out


class RgbdInertialSlam(InertialSlam, RgbdSlam):
    """RGB-D-inertial pipeline — the reference's 6th sensor mode
    (``System(..., IMU_RGBD)``, src/ros_rgbd_inertial.cc:1-195).

    Cooperative MRO like StereoInertialSlam: InertialSlam supplies IMU
    ingestion/prediction/staged init (fix_scale — depth observes metric
    scale) and VI keyframe BA; RgbdSlam supplies depth-based frame
    construction, instant metric init, and landmark creation."""

    def __init__(self, *args, **kw):
        super().__init__(*args, **kw)
        self.imu_fix_scale = True

    def process_frame(self, img, depth_map, ts, acc=None, gyro=None,
                      dts=None):
        if acc is not None and len(acc):
            self._imu_history.append(
                (ts, np.asarray(acc, np.float32),
                 np.asarray(gyro, np.float32),
                 np.asarray(dts, np.float32))
            )
            if len(self._imu_history) > 200:
                self._imu_history.pop(0)
        self._frame_imu = (acc, gyro, dts)
        return RgbdSlam.process_frame(self, img, depth_map, ts)
