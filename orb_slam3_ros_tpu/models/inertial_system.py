"""Monocular-inertial pipeline.

Role of the reference's ``System(..., IMU_MONOCULAR)`` path:
``Tracking::GrabImuData/PreintegrateIMU`` (Tracking.cc:1654/1660),
``PredictStateIMU`` (:1774), the staged IMU initialization driven by
``LocalMapping::InitializeIMU`` (LocalMapping.cc:1173: gravity+scale
solve -> ``Map::ApplyScaledRotation`` -> full inertial BA with strong
bias priors), and ``LocalInertialBA`` for per-KF refinement.

Flow here: run visually until ``init_after_kf`` keyframes accumulate,
then solve gravity/scale/bias/velocities over the keyframe chain
(ops.viba.inertial_init), gravity-align + rescale the map, and from then
on seed tracking with IMU prediction and refine keyframes with joint
visual-inertial BA (re-preintegrating windows at current biases).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import imu as imu_ops
from ..ops import lie, viba
from . import local_mapping, map_updates, tracking
from .system import LOST, NOT_INITIALIZED, OK, MonoSlam


class InertialSlam(MonoSlam):
    def __init__(
        self,
        *args,
        calib: imu_ops.ImuCalib,
        imu_cap_frame: int = 32,
        imu_cap_kf: int = 256,
        init_after_kf: int = 6,
        **kw,
    ):
        kw.setdefault("pipelined", False)  # IMU prediction is host-driven
        super().__init__(*args, **kw)
        self.calib = calib
        self.imu_cap_frame = imu_cap_frame
        self.imu_cap_kf = imu_cap_kf
        self.init_after_kf = init_after_kf
        self.imu_initialized = False
        self.imu_fix_scale = False  # stereo/RGB-D: scale observable
        self.imu_stage = 0  # staged init refinements (VIBA1 at init,
        # VIBA2 re-solve later, LocalMapping.cc:181-228 schedule)
        # per-KF IMU blocks: block k integrates KF k-1 -> KF k
        self.kf_imu_acc = np.zeros((self.K_cap, imu_cap_kf, 3), np.float32)
        self.kf_imu_gyro = np.zeros((self.K_cap, imu_cap_kf, 3), np.float32)
        self.kf_imu_dts = np.zeros((self.K_cap, imu_cap_kf), np.float32)
        # per-frame IMU history: (frame_ts, acc, gyro, dts); a frame's
        # block covers (prev_frame_ts, frame_ts]. KF blocks are assembled
        # from this history so keyframes created retroactively (the mono
        # two-view init) get correct integration intervals.
        self._imu_history = []
        # current body state (world frame)
        self.v_cur = np.zeros(3, np.float32)
        self.bg_cur = np.zeros(3, np.float32)
        self.ba_cur = np.zeros(3, np.float32)
        # Keyframe ids whose temporal IMU chain to the previous keyframe
        # is BROKEN (first keyframe after a map merge/weld: the two maps
        # were recorded on separate chains, so no preintegration spans
        # the seam — the reference's mPrevKF stays within the original
        # map after MergeLocal2, LoopClosing.cc:3114). VI-BA windows mask
        # the inertial edge into these keyframes.
        self.chain_breaks: set = set()
        self._jit_preint = jax.jit(
            lambda a, g, d, b: imu_ops.preintegrate(a, g, d, b, self.calib)
        )
        self._jit_predict = jax.jit(imu_ops.predict_state)

    # ------------------------------------------------------------------
    def process_frame(self, img, ts: float, acc=None, gyro=None, dts=None):
        """Track one frame with its IMU block (samples since previous
        frame; arrays [M, 3]/[M])."""
        if acc is not None and len(acc):
            self._imu_history.append(
                (ts, np.asarray(acc, np.float32), np.asarray(gyro, np.float32),
                 np.asarray(dts, np.float32))
            )
            if len(self._imu_history) > 200:
                self._imu_history.pop(0)
        self._frame_imu = (acc, gyro, dts)
        return super().process_frame(img, ts)

    def _collect_block(self, t0: float, t1: float):
        """Concatenate IMU samples of frames with ts in (t0, t1] into a
        fixed-capacity block."""
        a = np.zeros((self.imu_cap_kf, 3), np.float32)
        g = np.zeros((self.imu_cap_kf, 3), np.float32)
        d = np.zeros((self.imu_cap_kf,), np.float32)
        n = 0
        for fts, fa, fg, fd in self._imu_history:
            if t0 < fts <= t1 + 1e-9:
                m = min(len(fa), self.imu_cap_kf - n)
                if m <= 0:
                    break
                a[n : n + m] = fa[:m]
                g[n : n + m] = fg[:m]
                d[n : n + m] = fd[:m]
                n += m
        return a, g, d

    # ------------------------------------------------------------------
    def _predict_motion(self, ts):
        if self.imu_initialized:
            acc, gyro, dts = self._frame_imu
            if acc is not None and len(acc):
                M = self.imu_cap_frame
                a = np.zeros((M, 3), np.float32)
                g = np.zeros((M, 3), np.float32)
                d = np.zeros((M,), np.float32)
                n = min(len(acc), M)
                a[:n], g[:n], d[:n] = acc[:n], gyro[:n], dts[:n]
                b = jnp.asarray(np.concatenate([self.bg_cur, self.ba_cur]))
                pre = self._jit_preint(
                    jnp.asarray(a), jnp.asarray(g), jnp.asarray(d), b
                )
                # current body state from camera pose
                R_wb, p_wb = viba.body_from_cam(
                    jnp.asarray(self.R_cur), jnp.asarray(self.t_cur),
                    self.calib.R_bc, self.calib.t_bc,
                )
                R2, p2, v2 = self._jit_predict(
                    R_wb, p_wb, jnp.asarray(self.v_cur), b, pre
                )
                R_cw, t_cw = viba.cam_from_body(
                    R2, p2, self.calib.R_bc, self.calib.t_bc
                )
                # Seed the motion model with the IMU prediction
                # (PredictStateIMU replaces constant velocity). These stay
                # DEVICE handles — the tracker consumes them in its own
                # jitted program, so no tunnel round trip per frame; the
                # host-side copies are refreshed by _track_post /
                # _run_vi_ba's existing fetches.
                self.vel_R = R_cw @ jnp.asarray(self.R_cur).T
                self.vel_t = t_cw - self.vel_R @ jnp.asarray(self.t_cur)
                self.v_cur = v2

    # ------------------------------------------------------------------
    def _create_initial_map(self, feats, ts, idx, res):
        super()._create_initial_map(feats, ts, idx, res)
        # KF0 (at self.init_ts) and KF1 (at ts) were just created; stash
        # the block integrating KF0 -> KF1.
        a, g, d = self._collect_block(self.init_ts, ts)
        self.kf_imu_acc[1], self.kf_imu_gyro[1], self.kf_imu_dts[1] = a, g, d
        self._last_kf_ts = ts

    def _insert_keyframe(self, feats, ts, track_res):
        kf_id = self.n_kf
        prev_ts = getattr(self, "_last_kf_ts", None)
        if prev_ts is None:
            prev_ts = float(jax.device_get(self.map.kf_ts[max(kf_id - 1, 0)]))
        a, g, d = self._collect_block(prev_ts, ts)
        self.kf_imu_acc[kf_id], self.kf_imu_gyro[kf_id], self.kf_imu_dts[kf_id] = a, g, d
        self._last_kf_ts = ts

        super()._insert_keyframe(feats, ts, track_res)

        # Record current velocity/bias on the new KF slot.
        m = self.map
        self.map = m._replace(
            kf_v=m.kf_v.at[kf_id].set(jnp.asarray(self.v_cur)),
            kf_bg=m.kf_bg.at[kf_id].set(jnp.asarray(self.bg_cur)),
            kf_ba=m.kf_ba.at[kf_id].set(jnp.asarray(self.ba_cur)),
        )
        if not self.imu_initialized and self.n_kf >= self.init_after_kf:
            self._initialize_imu()
            self.imu_stage = 1
        elif self.imu_initialized and self.imu_stage == 1 and (
            self.n_kf >= self.init_after_kf + 6
        ):
            # Stage-2 refinement: re-solve gravity/scale on the (now
            # roughly metric) map and re-run the full inertial BA.
            self._initialize_imu()
            self.imu_stage = 2

    # ------------------------------------------------------------------
    def _initialize_imu(self, rounds: int = 1):
        """Gravity/scale/bias initialization + map alignment
        (LocalMapping::InitializeIMU stage 1): closed-form-seeded
        InertialOptimization, map alignment, then FullInertialBA with
        gravity+scale vertices (EdgeInertialGS) — one round suffices
        because the final BA re-solves gravity/scale jointly."""
        for _ in range(rounds):
            self._imu_init_round()

    def _imu_init_round(self):
        n = self.n_kf
        ids = np.arange(n, dtype=np.int32)
        m = self.map
        R_wb, p_wb = viba.body_from_cam(
            m.kf_R[jnp.asarray(ids)], m.kf_t[jnp.asarray(ids)],
            self.calib.R_bc, self.calib.t_bc,
        )
        b_lin = jnp.asarray(np.concatenate([self.bg_cur, self.ba_cur]))
        pre = jax.vmap(
            lambda a, g, d: imu_ops.preintegrate(a, g, d, b_lin, self.calib)
        )(
            jnp.asarray(self.kf_imu_acc[1:n]),
            jnp.asarray(self.kf_imu_gyro[1:n]),
            jnp.asarray(self.kf_imu_dts[1:n]),
        )
        edge_ok = np.asarray(
            [(i + 1) not in self.chain_breaks for i in range(n - 1)]
        )
        res = viba.inertial_init(
            R_wb, p_wb, jnp.ones(n, bool),
            jnp.arange(n - 1, dtype=jnp.int32),
            jnp.arange(1, n, dtype=jnp.int32),
            pre, jnp.asarray(edge_ok),
            n_iters=40, fix_scale=self.imu_fix_scale,
        )
        s, Rwg, bg, ba, v = jax.device_get(
            (res.scale, res.Rwg, res.bg, res.ba, res.v_w)
        )
        # res.bg/ba are absolute biases (the preintegration linearization
        # point is handled inside the residual via delta_with_bias).
        if not np.isfinite(s) or s < 1e-3:
            return
        # Align world to gravity and rescale to metric.
        R_gw = jnp.asarray(np.asarray(Rwg).T)
        self.map = map_updates.apply_scaled_rotation(
            self.map, R_gw, jnp.asarray(float(s))
        )
        # Relative frame logs carry old-scale translations
        # (Tracking::UpdateFrameIMU rescales mlRelativeFramePoses too).
        self.rel_traj = [
            (ts, ref, R_cr, t_cr * float(s))
            for ts, ref, R_cr, t_cr in self.rel_traj
        ]
        # Velocities from the init solve (visual axes, metric) -> rotate.
        v_new = np.asarray(v) @ np.asarray(Rwg)  # R_gw @ v_i
        mm = self.map
        self.map = mm._replace(
            kf_v=mm.kf_v.at[jnp.asarray(ids)].set(jnp.asarray(v_new[:n])),
            kf_bg=mm.kf_bg.at[jnp.asarray(ids)].set(jnp.asarray(np.tile(bg, (n, 1)))),
            kf_ba=mm.kf_ba.at[jnp.asarray(ids)].set(jnp.asarray(np.tile(ba, (n, 1)))),
        )
        self.bg_cur = np.asarray(bg, np.float32)
        self.ba_cur = np.asarray(ba, np.float32)
        self.v_cur = np.asarray(v_new[n - 1], np.float32)
        # Update the tracker's current pose (last KF's corrected pose).
        self.R_cur, self.t_cur = (
            np.asarray(a)
            for a in jax.device_get((self.map.kf_R[n - 1], self.map.kf_t[n - 1]))
        )
        self._set_ref_cache(n - 1, self.R_cur, self.t_cur)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self.imu_initialized = True
        # Full inertial BA over the WHOLE map with bias priors AND free
        # gravity-direction/scale vertices — the reference's
        # FullInertialBA(..., bInit=true) with EdgeInertialGS
        # (Optimizer.cc:392, called from LocalMapping::InitializeIMU).
        self._run_vi_ba_gs(n_iters=25, bias_prior_g=1e2, bias_prior_a=1e6)

    # ------------------------------------------------------------------
    def _run_local_ba(self, n_iters):
        if self.imu_initialized:
            self._run_vi_ba(window=self.W, n_iters=n_iters)
        else:
            super()._run_local_ba(n_iters)

    def _build_full_vi_problem(self):
        """Assemble the all-keyframe VI problem (only KF0's pose fixed)."""
        n = self.n_kf
        ids = list(range(n))
        fixed = [i == 0 for i in ids]
        W_eff = max(self.W, n)
        pad = W_eff - n
        edge_ok = [ids[i + 1] not in self.chain_breaks for i in range(n - 1)]
        if pad > 0:
            ids = ids + [self.K_cap - 1] * pad
            fixed = fixed + [True] * pad
            edge_ok = edge_ok + [False] * pad
        ids = ids[:W_eff]
        fixed = fixed[:W_eff]
        edge_ok = edge_ok[: W_eff - 1]
        window_ids = jnp.asarray(np.asarray(ids, np.int32))
        blk_ids = [ids[i + 1] for i in range(len(ids) - 1)]
        prob = local_mapping.build_vi_ba(
            self.map, window_ids, jnp.asarray(np.asarray(fixed, bool)),
            jnp.asarray(self.kf_imu_acc[blk_ids]),
            jnp.asarray(self.kf_imu_gyro[blk_ids]),
            jnp.asarray(self.kf_imu_dts[blk_ids]),
            jnp.asarray(np.asarray(edge_ok, bool)),
            self.calib, self.cam_params,
        )
        return prob, window_ids

    def _run_vi_ba_gs(self, n_iters, bias_prior_g=0.0, bias_prior_a=0.0):
        """Full inertial BA with EdgeInertialGS gravity/scale vertices,
        then apply the recovered (Rwg, s) to the whole map — the joint
        replacement for alternating InertialOptimization with a
        fixed-gravity full BA."""
        if self.n_kf < 3:
            return
        prob, window_ids = self._build_full_vi_problem()
        res = viba.vi_bundle_adjust_gs(
            prob, jnp.eye(3, dtype=jnp.float32), n_iters=n_iters,
            bias_prior_g=bias_prior_g, bias_prior_a=bias_prior_a,
            fix_scale=self.imu_fix_scale,
        )
        self.map = local_mapping.apply_vi_ba(self.map, window_ids, res, self.calib)
        s, Rwg = jax.device_get((res.scale, res.Rwg))
        s = float(s)
        if np.isfinite(s) and s > 1e-3:
            # The GS residual measured the visual map as s-times-too-small:
            # scale/rotate the map like Map::ApplyScaledRotation and put
            # the velocity vertices (visual units in the GS factor) into
            # metric units too.
            R_gw = jnp.asarray(np.asarray(Rwg).T)
            self.map = map_updates.apply_scaled_rotation(
                self.map, R_gw, jnp.asarray(s)
            )
            self.map = self.map._replace(kf_v=self.map.kf_v * s)
            self.rel_traj = [
                (ts, ref, R_cr, t_cr * s)
                for ts, ref, R_cr, t_cr in self.rel_traj
            ]
        self._sync_host_state()

    def _sync_host_state(self):
        """Refresh host-side bias/velocity/ref-pose from the newest KF —
        one tunnel fetch."""
        kf_last = self.n_kf - 1
        v, bg, ba, R_ref, t_ref = jax.device_get(
            (self.map.kf_v[kf_last], self.map.kf_bg[kf_last],
             self.map.kf_ba[kf_last], self.map.kf_R[kf_last],
             self.map.kf_t[kf_last])
        )
        self.v_cur = np.asarray(v)
        self.bg_cur = np.asarray(bg)
        self.ba_cur = np.asarray(ba)
        self.R_cur = np.asarray(R_ref)
        self.t_cur = np.asarray(t_ref)
        self._set_ref_cache(kf_last, R_ref, t_ref)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)

    def _run_vi_ba(self, window, n_iters, bias_prior_g=0.0, bias_prior_a=0.0):
        if self.n_kf < 2:
            return
        last = self.n_kf
        lo = max(0, last - window)
        ids = list(range(lo, last))
        if window >= last:
            fixed = [i == 0 for i in ids]  # full BA: only the origin fixed
        else:
            fixed = [i == 0 or i < last - self.ba_window for i in ids]
        if all(fixed):
            return
        W_eff = max(self.W, len(ids))
        pad = W_eff - len(ids)
        edge_ok = [
            ids[i + 1] not in self.chain_breaks for i in range(len(ids) - 1)
        ]
        if pad > 0:
            ids = ids + [self.K_cap - 1] * pad
            fixed = fixed + [True] * pad
            edge_ok = edge_ok + [False] * pad
        ids = ids[:W_eff]
        fixed = fixed[:W_eff]
        edge_ok = edge_ok[: W_eff - 1]
        window_ids = jnp.asarray(np.asarray(ids, np.int32))
        # IMU block k integrates KF k-1 -> k, so edge (ids[i] -> ids[i+1])
        # uses block ids[i+1] (padded edges are masked by edge_ok).
        blk_ids = [ids[i + 1] for i in range(len(ids) - 1)]
        acc_w = jnp.asarray(self.kf_imu_acc[blk_ids])
        gyro_w = jnp.asarray(self.kf_imu_gyro[blk_ids])
        dts_w = jnp.asarray(self.kf_imu_dts[blk_ids])
        prob = local_mapping.build_vi_ba(
            self.map, window_ids, jnp.asarray(np.asarray(fixed, bool)),
            acc_w, gyro_w, dts_w, jnp.asarray(np.asarray(edge_ok, bool)),
            self.calib, self.cam_params,
        )
        res = viba.vi_bundle_adjust(
            prob, n_iters=n_iters,
            bias_prior_g=bias_prior_g, bias_prior_a=bias_prior_a,
        )
        self.map = local_mapping.apply_vi_ba(self.map, window_ids, res, self.calib)
        # sync host bias/velocity (and the ref-pose cache) with the newest
        # KF estimates — ONE tunnel fetch.
        kf_last = self.n_kf - 1
        v, bg, ba, R_ref, t_ref = jax.device_get(
            (self.map.kf_v[kf_last], self.map.kf_bg[kf_last],
             self.map.kf_ba[kf_last], self.map.kf_R[kf_last],
             self.map.kf_t[kf_last])
        )
        self.v_cur = np.asarray(v)
        self.bg_cur = np.asarray(bg)
        self.ba_cur = np.asarray(ba)
        self._set_ref_cache(kf_last, R_ref, t_ref)
