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

from ..ops import stereo as stereo_ops
from . import map_updates, tracking
from .system import LOST, NOT_INITIALIZED, OK, MonoSlam


class StereoSlam(MonoSlam):
    """Rectified stereo pipeline."""

    def __init__(self, *args, baseline: float = 0.1, depth_factor_far: float = 40.0, **kw):
        kw.setdefault("pipelined", False)  # custom per-frame flow below
        super().__init__(*args, **kw)
        self.baseline = baseline
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

    # ------------------------------------------------------------------
    def process_frame(self, img_left, img_right, ts: float):
        import time

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
        elif self.state == OK:
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
        self.map = map_updates.insert_keyframe(
            self.map, jnp.asarray(kf_id), jnp.asarray(self.R_cur),
            jnp.asarray(self.t_cur), jnp.asarray(ts, jnp.float32),
            feats, track_res.feat_pt,
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

    def _run_local_ba(self, n_iters):
        # Stereo gauge: metric scale is observable, one fixed KF suffices;
        # reuse the mono window logic (it always fixes >= 1).
        super()._run_local_ba(n_iters)


class StereoInertialSlam(__import__("orb_slam3_ros_tpu.models.inertial_system",
                                     fromlist=["InertialSlam"]).InertialSlam,
                         StereoSlam):
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


class RgbdSlam(StereoSlam):
    """RGB-D pipeline: depth sampled from the sensor depth map at feature
    locations (GrabImageRGBD converts depth to virtual right coords,
    Tracking.cc:1553 + Frame.cc:984; backprojection here skips the
    virtual-disparity detour)."""

    def __init__(self, *args, max_depth: float = 8.0, **kw):
        kw.pop("baseline", None)
        super().__init__(*args, baseline=0.05, **kw)
        self.max_depth = max_depth

    def process_frame(self, img, depth_map, ts: float):
        import time

        t0 = time.time()
        il = jnp.asarray(img, jnp.float32)
        feats = self._extract(il)
        dm = jnp.asarray(depth_map, jnp.float32)
        xi = jnp.clip(feats.xy[:, 0].astype(jnp.int32), 0, dm.shape[1] - 1)
        yi = jnp.clip(feats.xy[:, 1].astype(jnp.int32), 0, dm.shape[0] - 1)
        d = dm[yi, xi]
        sm = stereo_ops.StereoMatch(
            u_right=jnp.full_like(d, -1.0),
            depth=d,
            valid=feats.valid & (d > 0.05),
        )
        self._last_depth = sm
        t0 = self._tic("extract+depth", t0)

        if self.state == NOT_INITIALIZED:
            out = self._stereo_initialize(feats, sm, ts)
        elif self.state == OK:
            out = self._track(feats, ts)
        else:
            out = self._try_relocalize(feats, ts)
        self._tic("track", t0)
        self.frame_id += 1
        return out
