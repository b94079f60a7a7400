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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import imu as imu_ops
from ..ops import lie, viba
from ..utils import obslog
from . import local_mapping, map_updates, tracking
from .system import LOST, NOT_INITIALIZED, OK, RECENTLY_LOST, MonoSlam


@partial(jax.jit, static_argnames=(
    "width", "height", "fuse_neighbors", "do_fuse", "do_stats", "do_cull",
    "n_iters", "n_levels", "cam_model",
))
def _vi_kf_work(
    m, kf_id, R, t, ts, feats, feat_pt, n_pts, free_cap,
    v_new, bg_new, ba_new, big, small, calib, cam_params, bf,
    width, height, fuse_neighbors, do_fuse, do_stats, do_cull,
    n_iters, n_levels, cam_model, ur=None, depth=None, max_depth=0.0,
):
    """Fused per-keyframe VI program: insert -> record body state ->
    triangulate -> admit -> fuse -> temporal-window VI-BA -> culls, as
    ONE jitted dispatch returning ONE packed fetch — the inertial
    counterpart of kf_work.keyframe_work (LocalMapping::Run with
    LocalInertialBA, LocalMapping.cc:64-282 / Optimizer.cc:2528). The
    unfused path cost ~775 ms/keyframe in tunnel dispatch latency alone.

    ``big`` [W-1, S, 7]: per-edge IMU blocks (acc | gyro | dt);
    ``small`` [3W-1]: window ids | fixed mask | edge_ok, f32-packed.
    ``ur``/``depth``: stereo-inertial keyframes carry right-image
    coordinates and create close landmarks from depth (Tracking.cc:3255)
    before far-point triangulation.
    """
    m = map_updates.insert_keyframe(m, kf_id, R, t, ts, feats, feat_pt,
                                    ur=ur)
    m = m._replace(
        kf_v=m.kf_v.at[kf_id].set(v_new),
        kf_bg=m.kf_bg.at[kf_id].set(bg_new),
        kf_ba=m.kf_ba.at[kf_id].set(ba_new),
    )
    base = n_pts
    n_new = jnp.asarray(0, jnp.int32)
    if depth is not None:
        from ..ops import stereo as stereo_ops

        cand = (depth > 0) & (depth < max_depth) & feats.valid
        X_c = stereo_ops.backproject(cam_params, feats.xy, depth)
        X_w = jnp.einsum("ji,nj->ni", R, X_c - t)
        m, n_depth = map_updates.admit_depth_points(
            m, kf_id, X_w, cand, base, free_cap
        )
        base = base + n_depth
        n_new = n_new + n_depth
    tri = tracking.triangulate_with_ref(
        m, kf_id, kf_id - 1, cam_params, cam_model=cam_model
    )
    m, n_tri = map_updates.admit_new_points(
        m, kf_id, kf_id - 1, tri, base, free_cap - n_new
    )
    n_new = n_new + n_tri
    if do_fuse:
        m, _ = map_updates.fuse_in_neighbors(
            m, kf_id, cam_params, width, height,
            n_neighbors=fuse_neighbors, cam_model=cam_model,
        )
    W_eff = (small.shape[0] + 1) // 3
    window_ids = small[:W_eff].astype(jnp.int32)
    fixed = small[W_eff : 2 * W_eff] > 0.5
    edge_ok = small[2 * W_eff :] > 0.5
    prob = local_mapping.build_vi_ba(
        m, window_ids, fixed, big[..., 0:3], big[..., 3:6], big[..., 6],
        edge_ok, calib, cam_params, bf=bf,
    )
    res = viba.vi_bundle_adjust(prob, n_iters=n_iters, row_n=m.N)
    m = local_mapping.apply_vi_ba(m, window_ids, res, calib)
    m = map_updates.cull_points(m, kf_id + 1)
    if do_stats:
        m = map_updates.refresh_point_stats(m, n_levels=n_levels)
    if do_cull:
        m, _ = map_updates.cull_keyframes(m, kf_id + 1, n_levels=n_levels)
    packed = jnp.concatenate(
        [n_new.astype(jnp.float32)[None], _pack_kf_state(m, kf_id)]
    )
    return m, packed


@jax.jit
def _pack_kf_state(m, kf):
    """[21] f32: (v, bg, ba, R(9), t) of keyframe ``kf`` in one fetch."""
    return jnp.concatenate([
        m.kf_v[kf], m.kf_bg[kf], m.kf_ba[kf],
        m.kf_R[kf].reshape(9), m.kf_t[kf],
    ])


@jax.jit
def _vi_refine(
    m, feats, feat_pt, R_cw0, t_cw0, v0, bg0, ba0,
    R_anc, p_anc, v_anc, bg_anc, ba_anc, pre,
    anc_Sigma, cam_params, R_bc, t_bc,
):
    """Gather the tracker's per-feature landmark bindings into visual
    edges and run the 15-dof VI motion-only solve (the per-frame
    PoseInertialOptimizationLast* stage). ``anc_Sigma`` is the anchor
    state's posterior covariance (zeros = exact anchor), propagated into
    the edge covariances inside the solve."""
    P = m.P
    pt = jnp.clip(feat_pt, 0, P - 1)
    valid = (feat_pt >= 0) & m.pt_valid[pt] & feats.valid
    Xw = m.pt_X[pt]
    inv_sigma2 = 1.2 ** (-2.0 * feats.level.astype(jnp.float32))
    R_wb0, p_wb0 = viba.body_from_cam(R_cw0, t_cw0, R_bc, t_bc)
    res = viba.pose_inertial_optimization(
        R_wb0, p_wb0, v0, bg0, ba0,
        Xw, feats.xy, inv_sigma2, valid,
        R_anc, p_anc, v_anc, bg_anc, ba_anc, pre,
        anc_Sigma, cam_params, R_bc, t_bc,
    )
    R_cw, t_cw = viba.cam_from_body(res.R_wb, res.p_wb, R_bc, t_bc)
    return res, R_cw, t_cw


class InertialSlam(MonoSlam):
    def __init__(
        self,
        *args,
        calib: imu_ops.ImuCalib,
        imu_cap_frame: int = 32,
        imu_cap_kf: int = 256,
        init_after_kf: int = 6,
        time_recently_lost: float = 5.0,
        vi_tracking: bool = True,
        **kw,
    ):
        kw.setdefault("pipelined", False)  # IMU prediction is host-driven
        super().__init__(*args, **kw)
        # Per-frame VI motion-only optimization once the IMU is
        # initialized (PoseInertialOptimizationLastFrame role) and the
        # RECENTLY_LOST dead-reckoning window it enables.
        self.vi_tracking = vi_tracking
        self.time_recently_lost = time_recently_lost
        self._lost_since_ts = None
        self._vi_anchor = None  # (R_wb, p_wb, v, bg, ba) device handles
        self._vi_prior = None  # [15,15] anchor posterior cov device handle
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
        # Bad-IMU bailout (mbBadImu -> ResetActiveMap,
        # LocalMapping.cc:138-146 / Tracking.cc:1841-1846): a divergent
        # IMU solve resets the active map instead of corrupting it.
        self.bad_imu_resets = 0
        # Device-resident VI chunk loop (vi_device_loop.py): inertial
        # side-state threaded between chunks as device handles, one
        # jitted runner per (schedule, cam_model).
        self._vi_dev_state = None
        self._vi_chunk_pending = None
        self._vi_runner_cache = {}

    # ------------------------------------------------------------------
    def _check_bad_imu(self) -> bool:
        """Detect a divergent inertial solve from the freshly fetched host
        state (non-finite, or physically impossible velocity/bias) and
        reset the active map — the reference's ``mbBadImu`` path. Returns
        True if a reset happened."""
        bad = (
            not np.all(np.isfinite(self.v_cur))
            or not np.all(np.isfinite(self.bg_cur))
            or not np.all(np.isfinite(self.ba_cur))
            or not np.all(np.isfinite(self.t_cur))
            or float(np.linalg.norm(self.v_cur)) > 50.0
            or float(np.linalg.norm(self.bg_cur)) > 2.0
            or float(np.linalg.norm(self.ba_cur)) > 20.0
        )
        if not bad:
            return False
        self.bad_imu_resets += 1
        obslog.log(
            f"bad IMU solve (v={self.v_cur}, bg={self.bg_cur}, "
            f"ba={self.ba_cur}) — resetting active map", obslog.NORMAL,
        )
        self._reset_active_map()
        return True

    def _reset_active_map(self):
        """ResetActiveMap (System/Tracking reset path): fresh empty map,
        cleared IMU side-state; archived Atlas maps are untouched."""
        from . import map_state
        from .system import NOT_INITIALIZED

        self._vi_dev_state = None
        self._vi_chunk_pending = None

        self.kf_imu_acc[:] = 0
        self.kf_imu_gyro[:] = 0
        self.kf_imu_dts[:] = 0
        self.imu_initialized = False
        self.imu_stage = 0
        self.chain_breaks = set()
        self.v_cur = np.zeros(3, np.float32)
        self.bg_cur = np.zeros(3, np.float32)
        self.ba_cur = np.zeros(3, np.float32)
        self._vi_anchor = None
        self._vi_prior = None
        self.map = map_state.empty_map(self.K_cap, self.N, self.P_cap)
        if getattr(self, "map_dev", None) is not None:
            self.map = jax.device_put(self.map, self.map_dev)
            self._sync_replica()
        self.n_kf = 0
        self.n_pts = 0
        self.init_feats = None
        self.R_cur = np.eye(3, dtype=np.float32)
        self.t_cur = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self.state = NOT_INITIALIZED
        self._ref_cache = None

    # ------------------------------------------------------------------
    def _fallback_frame_imu(self, img, ts, acc, gyro, dts):
        """Route one frame+IMU block from a chunk fallback/replay
        through the per-frame path (stereo-inertial overrides to split
        the [2,H,W] pair)."""
        return self.process_frame(img, ts, acc=acc, gyro=gyro, dts=dts)

    # ------------------------------------------------------------------
    def process_frame(self, img, ts: float, acc=None, gyro=None, dts=None):
        """Track one frame with its IMU block (samples since previous
        frame; arrays [M, 3]/[M])."""
        # Any per-frame processing mutates host-side VI state the
        # device chunk state does not see — rebuild it at next chunk.
        self._drain_vi_chunk()
        self._vi_dev_state = None
        if acc is not None and len(acc):
            self._imu_history.append(
                (ts, np.asarray(acc, np.float32), np.asarray(gyro, np.float32),
                 np.asarray(dts, np.float32))
            )
            if len(self._imu_history) > 200:
                self._imu_history.pop(0)
        self._frame_imu = (acc, gyro, dts)
        if (
            self.imu_initialized
            and self.vi_tracking
            and acc is not None and len(acc)
            and self.state in (OK, RECENTLY_LOST)
        ):
            self._drain_chunk()
            self._check_ts_jump(ts)
            if self.state in (OK, RECENTLY_LOST):
                return self._process_frame_vi(img, ts)
        self._drain_vi_pending()
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
    def _body_state_from_host(self):
        """Anchor body state derived from the host-side camera pose +
        velocity/bias (used when no per-frame anchor exists yet)."""
        R_wb, p_wb = viba.body_from_cam(
            jnp.asarray(self.R_cur), jnp.asarray(self.t_cur),
            self.calib.R_bc, self.calib.t_bc,
        )
        return (
            R_wb, p_wb, jnp.asarray(self.v_cur),
            jnp.asarray(self.bg_cur), jnp.asarray(self.ba_cur),
        )

    # ------------------------------------------------------------------
    # Fused per-frame VI program: preintegration -> IMU state prediction
    # -> extraction -> visual tracking -> 15-dof VI refinement in ONE
    # jitted dispatch, returning ONE packed [13] f32 fetch (n_inliers,
    # R_cw, t_cw) — over the TPU tunnel each separate dispatch/fetch
    # leaf costs a ~20-55 ms round trip, and the unfused path made ~10
    # of them per frame (~3 fps at 752x480 regardless of kernel speed).
    def _vi_fused_program(self):
        prog = getattr(self, "_vi_fused", None)
        if prog is not None:
            return prog
        from ..ops import orb as orb_mod

        def _prog(img, m, anchor, anc_Sigma, a, g, d, schedule):
            R_anc, p_anc, v_anc, bg_anc, ba_anc = anchor
            b = jnp.concatenate([bg_anc, ba_anc])
            pre = imu_ops.preintegrate(a, g, d, b, self.calib)
            # PredictStateIMU from the previous frame's body state.
            R2, p2, v2 = imu_ops.predict_state(R_anc, p_anc, v_anc, b, pre)
            R_pred, t_pred = viba.cam_from_body(
                R2, p2, self.calib.R_bc, self.calib.t_bc
            )
            feats = orb_mod.extract(img.astype(jnp.float32), self.config)
            res = tracking.track_against_map(
                m, feats, R_pred, t_pred, self.cam_params,
                self.width, self.height, schedule=schedule,
                track_cap=self.track_cap, cam_model=self.cam_model,
            )
            vires, R_cw, t_cw = _vi_refine(
                m, feats, res.feat_pt, res.R, res.t,
                v_anc, bg_anc, ba_anc,
                R_anc, p_anc, v_anc, bg_anc, ba_anc, pre,
                anc_Sigma, self.cam_params,
                self.calib.R_bc, self.calib.t_bc,
            )
            packed = jnp.concatenate([
                vires.n_inliers[None].astype(jnp.float32),
                R_cw.reshape(9), t_cw,
            ])
            return feats, res, vires, R_cw, t_cw, packed

        prog = jax.jit(_prog, static_argnames=("schedule",))
        self._vi_fused = prog
        return prog

    def _drain_vi_pending(self):
        """Absorb the previous frame's (IO-thread-prefetched) VI result:
        state ladder, pose log, keyframe decision — the lag-1 drain of
        the pipelined VI loop."""
        p = getattr(self, "_vi_pending", None)
        if p is None:
            return None
        self._vi_pending = None
        buf = np.asarray(p["fut"].result())
        n_vis = int(buf[0])
        R_new = buf[1:10].reshape(3, 3)
        t_new = buf[10:13]
        saved = self.frame_id
        self.frame_id = p["idx"]
        try:
            out = self._vi_post(
                p["feats"], p["res"], p["vires"], p["ts"], n_vis,
                R_new, t_new, p["state_tuple"],
            )
        finally:
            self.frame_id = max(saved, self.frame_id)
        return out

    def _process_frame_vi(self, img, ts):
        """OK/RECENTLY_LOST frame through the fused VI program — ONE
        dispatch; the packed result is fetched on the IO thread and
        drained one frame later (lag-1, like the mono pipelined mode:
        the tunnel fetch hides behind the next frame's compute)."""
        # Drain the previous frame first: its keyframe insertion /
        # state transitions must land before this frame's result is
        # interpreted (the dispatch below already ran against the
        # pre-keyframe map — one keyframe of staleness, the same bound
        # the reference's tracking thread tolerates).
        out = self._drain_vi_pending()
        if self.state not in (OK, RECENTLY_LOST):
            # The drained frame dropped tracking: route this frame
            # through the recovery paths.
            return super().process_frame(img, ts)
        acc, gyro, dts = self._frame_imu
        M = self.imu_cap_frame
        a = np.zeros((M, 3), np.float32)
        g = np.zeros((M, 3), np.float32)
        d = np.zeros((M,), np.float32)
        nn = min(len(acc), M)
        a[:nn], g[:nn], d[:nn] = acc[:nn], gyro[:nn], dts[:nn]
        anchor = self._vi_anchor or self._body_state_from_host()
        anc_Sigma = (
            self._vi_prior if self._vi_prior is not None
            else jnp.zeros((15, 15))
        )
        feats, res, vires, R_cw, t_cw, packed = self._vi_fused_program()(
            jnp.asarray(img, jnp.float32), self._tmap(), anchor,
            anc_Sigma,
            jnp.asarray(a), jnp.asarray(g), jnp.asarray(d),
            schedule=self._current_schedule(),
        )
        state_tuple = (vires.R_wb, vires.p_wb, vires.v_w, vires.bg, vires.ba)
        self._vi_pending = dict(
            feats=feats, res=res, vires=vires, ts=ts, idx=self.frame_id,
            state_tuple=state_tuple,
            fut=self._io.submit(jax.device_get, packed),
        )
        self.frame_id += 1
        return out

    def flush(self):
        self._drain_vi_chunk()
        out = self._drain_vi_pending()
        out2 = super().flush()
        return out2 if out2 is not None else out

    # ------------------------------------------------------------------
    # Device-resident VI chunk loop (vi_device_loop.py): the inertial
    # steady state — preintegrate/predict/extract/track/VI-refine per
    # frame, the full VI keyframe program under lax.cond — in ONE
    # dispatch + ONE packed fetch per chunk of frames.
    def _vi_chunkable(self) -> bool:
        # A LoopCloser/Atlas no longer blocks chunking: closure checks
        # and archived-map merging run at CHUNK BOUNDARIES on the
        # keyframes the chunk inserted (_drain_vi_chunk), mirroring the
        # mono chunk's composition and the reference's loop thread
        # consuming a KF queue without blocking tracking
        # (LoopClosing.cc:1108). An in-flight chunked GBA coexists too:
        # chunks poll it at their boundaries (_poll_gba) and the partial
        # apply folds in keyframes created meanwhile.
        return (
            self.imu_initialized
            and self.vi_tracking
            and self.imu_stage >= 3  # all IMU-init ladder stages done
            and self.state == OK
            and self.track_dev is None
            and self.track_window is None
            # Mono VI chunks build bf=0 rows; the stereo VI chunk builds
            # (u,v,u_r) rows and lifts the restriction.
            and (self.bf == 0.0 or self._chunk_stereo())
            # The in-chunk temporal window assumes it is always full.
            and self.n_kf > self.W
        )

    def _vi_chunk_runner(self):
        key = (self._current_schedule(), self.cam_model)
        r = self._vi_runner_cache.get(key)
        if r is None:
            from .vi_device_loop import make_vi_chunk_runner

            r = make_vi_chunk_runner(
                self.config, self.cam_params, self.calib,
                width=self.width, height=self.height,
                kf_every=self.kf_every,
                kf_min_inliers=self.kf_min_inliers,
                kf_ref_ratio=self.kf_ref_ratio,
                W=self.W, ba_window=self.ba_window,
                local_ba_iters=self.local_ba_iters,
                fuse_neighbors=self.fuse_neighbors,
                fuse_every=self.fuse_every, stats_every=self.stats_every,
                cull_every=self.cull_every, kf_culling=self.kf_culling,
                schedule=key[0], K_cap=self.K_cap,
                imu_cap_frame=self.imu_cap_frame,
                imu_cap_kf=self.imu_cap_kf,
                track_cap=self.track_cap, cam_model=self.cam_model,
                bf=float(self.bf),
                baseline=float(getattr(self, "baseline", 0.0)),
                max_depth=float(getattr(self, "max_depth", 0.0)),
                stereo=self._chunk_stereo(),
            )
            self._vi_runner_cache[key] = r
        return r

    def _fresh_vi_dev_state(self):
        """Build the device-side VI chunk state from host bookkeeping
        (chunk-mode entry, or re-entry after any host-path processing).
        The per-KF block upload (~K_cap*S*7 f32) happens only here —
        in steady chunking the state round-trips device-to-device."""
        from .vi_device_loop import VIDevState, unpack_vi_dev_state

        t0 = getattr(self, "_last_kf_ts", None)
        a, g, d = self._collect_block(-1e18 if t0 is None else t0, 1e18)
        blk = np.concatenate([a, g, d[:, None]], axis=-1).astype(np.float32)
        kf_blk = np.concatenate(
            [self.kf_imu_acc, self.kf_imu_gyro, self.kf_imu_dts[..., None]],
            axis=-1,
        ).astype(np.float32)
        if self._vi_anchor is None and self._vi_prior is None:
            # The common rebuild case (after a closure / GBA fold-in /
            # host-path processing dropped the anchors): everything
            # comes from HOST values — ONE packed upload instead of 11
            # per-leaf tunnel round trips; camera->body on device.
            edge_ok = np.ones(self.K_cap, np.float32)
            for k in self.chain_breaks:
                edge_ok[k] = 0.0
            buf = np.concatenate([
                np.asarray(self.R_cur, np.float32).reshape(-1),
                np.asarray(self.t_cur, np.float32).reshape(-1),
                np.asarray(self.v_cur, np.float32).reshape(-1),
                np.asarray(self.bg_cur, np.float32).reshape(-1),
                np.asarray(self.ba_cur, np.float32).reshape(-1),
                np.zeros(225, np.float32),
                blk.reshape(-1),
                np.asarray([float((d > 0).sum()), 1.0], np.float32),
                kf_blk.reshape(-1),
                edge_ok,
            ])
            return unpack_vi_dev_state(
                jnp.asarray(buf), self.calib.R_bc, self.calib.t_bc,
                self.K_cap, self.imu_cap_kf,
            )
        anchor = self._vi_anchor or self._body_state_from_host()
        R_anc, p_anc, v_anc, bg_anc, ba_anc = anchor
        if self._vi_prior is not None:
            Sigma = self._vi_prior
        else:
            Sigma = jnp.zeros((15, 15))
        edge_ok = np.ones(self.K_cap, bool)
        for k in self.chain_breaks:
            edge_ok[k] = False
        return VIDevState(
            R_wb=jnp.asarray(R_anc), p_wb=jnp.asarray(p_anc),
            v=jnp.asarray(v_anc), bg=jnp.asarray(bg_anc),
            ba=jnp.asarray(ba_anc), Sigma=jnp.asarray(Sigma),
            blk=jnp.asarray(blk),
            blk_n=jnp.asarray(int((d > 0).sum()), jnp.int32),
            blk_ok=jnp.asarray(True),
            kf_blk=jnp.asarray(kf_blk),
            kf_edge_ok=jnp.asarray(edge_ok),
        )

    def process_frames(self, imgs, tss, acc=None, gyro=None, dts=None):
        """Track a batch of frames with their per-frame IMU blocks
        through the device-resident VI chunk loop (ONE dispatch + ONE
        packed fetch; results drain on the NEXT call or flush). Falls
        back to per-frame processing whenever the inertial fast path
        does not apply (init ladder, loss states, loop closer/Atlas
        attached, ts jumps)."""
        from .system import _ChunkReplayView

        if acc is None:
            return super().process_frames(imgs, tss)
        self._drain_vi_chunk()
        self._poll_gba()  # advance an in-flight global BA between chunks
        C = len(tss)
        fallback_imgs = (
            _ChunkReplayView(imgs[0], int(imgs[1]))
            if isinstance(imgs, tuple) else imgs
        )
        # Drain the lag-1 per-frame pending BEFORE evaluating the chunk
        # gate: the drained result can transition state to
        # RECENTLY_LOST/LOST or insert a keyframe, and the gate must see
        # the post-drain state (a stale gate could dispatch the
        # steady-state loop while the system is actually lost).
        self._drain_vi_pending()
        self._drain_pending()
        ok_chunk = isinstance(imgs, tuple) and self._vi_chunkable()
        tss_np = np.asarray(tss, np.float64)
        if ok_chunk:
            last = getattr(self, "_last_frame_ts", None)
            gaps = np.diff(np.concatenate(
                [[last if last is not None else tss_np[0]], tss_np]
            ))
            if np.any(gaps > self.ts_jump_threshold):
                ok_chunk = False
        if (ok_chunk and not self.localization_only
                and self.n_kf >= self.K_cap - 1 - (C + 1) // 2):
            self._make_room()
        if not ok_chunk:
            for i, ts in enumerate(tss):
                self._fallback_frame_imu(
                    fallback_imgs[i], float(ts), acc[i], gyro[i], dts[i]
                )
            return
        self._apply_kf_async(force=True)
        # Build the device state BEFORE recording the chunk's IMU in the
        # host history: _collect_block gathers everything after the last
        # keyframe, and the chunk appends its own frames' samples on
        # device — appending first would double-count them.
        st = self._vi_dev_state
        if st is None:
            st = self._fresh_vi_dev_state()
        # Record the chunk frames' IMU in the host history so a later
        # host-path block assembly (_collect_block) stays correct.
        for i in range(C):
            if acc[i] is not None and len(acc[i]):
                self._imu_history.append((
                    float(tss_np[i]),
                    np.asarray(acc[i], np.float32),
                    np.asarray(gyro[i], np.float32),
                    np.asarray(dts[i], np.float32),
                ))
        while len(self._imu_history) > 200:
            self._imu_history.pop(0)
        stack, off = imgs
        M = self.imu_cap_frame
        imu_arr = np.zeros((C, M, 7), np.float32)
        for i in range(C):
            n = min(len(acc[i]), M)
            imu_arr[i, :n, 0:3] = acc[i][:n]
            imu_arr[i, :n, 3:6] = gyro[i][:n]
            imu_arr[i, :n, 6] = dts[i][:n]
        # Localization-only: sentinel last_kf_fid disables in-chunk
        # keyframe insertion without recompiling (see system.py).
        lkf = (self.frame_id + (1 << 22) if self.localization_only
               else self.last_kf_frame)
        pk = np.concatenate([
            np.asarray(
                [self.n_kf, self.n_pts, lkf, 1.0,
                 -1,  # ref_inl: reseed from the chunk's first frame
                 self.frame_id, off], np.float32,
            ),
            np.asarray(tss_np, np.float32),
            imu_arr.reshape(-1),
        ])
        m2, st2, packed = self._vi_chunk_runner()(
            self.map, st, stack, jnp.asarray(pk), chunk=C
        )
        self.map = m2
        self._vi_dev_state = st2
        self._last_frame_ts = float(tss_np[-1])
        self._vi_chunk_pending = dict(
            fut=self._io.submit(jax.device_get, packed),
            tss=tss_np, imgs=fallback_imgs, imu=(acc, gyro, dts),
            fid0=self.frame_id, n_kf0=self.n_kf,
        )
        self.frame_id += C

    def _drain_vi_chunk(self):
        """Absorb the previous VI chunk's (prefetched) packed results:
        trajectory logs, body state, the host mirror of the chunk's new
        keyframe IMU blocks, and the loss-ladder handoff."""
        p = getattr(self, "_vi_chunk_pending", None)
        if p is None:
            return
        self._vi_chunk_pending = None
        from .vi_device_loop import unpack_vi_chunk_result

        C = len(p["tss"])
        # Worst-case in-chunk KF density is one per 2 frames (the
        # weak-tracking branch of need_kf): ceil(C/2) for odd chunks.
        kmax = (C + 1) // 2
        outs, sc, new_blk, new_ok = unpack_vi_chunk_result(
            p["fut"].result(), C, kmax, self.imu_cap_kf
        )
        n_kf0 = p["n_kf0"]
        self.n_kf = sc["n_kf"]
        self._n_pts = sc["n_pts"]
        if not self.localization_only:  # else: sentinel, not a real fid
            self.last_kf_frame = sc["last_kf_fid"]
        self._ref_kf_inl = max(0, sc["ref_inl"])
        self.R_cur = np.asarray(sc["R"], np.float32)
        self.t_cur = np.asarray(sc["t"], np.float32)
        self.v_cur = sc["v"].astype(np.float32).copy()
        self.bg_cur = sc["bg"].astype(np.float32).copy()
        self.ba_cur = sc["ba"].astype(np.float32).copy()
        self._ref_cache = None
        # Host anchors are rebuilt from host pose on the next per-frame
        # call; the device state (still valid) carries the exact ones.
        self._vi_anchor = None
        self._vi_prior = None
        # Mirror the chunk's new per-KF IMU blocks (consecutive slots
        # from n_kf0) into the host arrays.
        for j in range(min(self.n_kf - n_kf0, kmax)):
            k = n_kf0 + j
            self.kf_imu_acc[k] = new_blk[j, :, 0:3]
            self.kf_imu_gyro[k] = new_blk[j, :, 3:6]
            self.kf_imu_dts[k] = new_blk[j, :, 6]
            if not new_ok[j]:
                self.chain_breaks.add(k)
        # Constant-velocity model for any non-VI fallback path, from the
        # last two tracked frames of the chunk.
        alive_idx = np.nonzero(outs["alive"])[0]
        if len(alive_idx) >= 2:
            i0, i1 = alive_idx[-2], alive_idx[-1]
            R0, t0_ = outs["R"][i0], outs["t"][i0]
            R1, t1_ = outs["R"][i1], outs["t"][i1]
            self.vel_R = np.asarray(R1 @ R0.T, np.float32)
            self.vel_t = np.asarray(t1_ - (R1 @ R0.T) @ t0_, np.float32)
        n_dead = 0
        for i in range(C):
            if not bool(outs["alive"][i]):
                n_dead += 1
                continue
            ts = float(p["tss"][i])
            Rcw = np.asarray(outs["R"][i])
            tcw = np.asarray(outs["t"][i])
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Rcw.T
            T[:3, 3] = -Rcw.T @ tcw
            self.trajectory.append((ts, T))
            self.rel_traj.append(
                (ts, int(outs["ref"][i]), np.asarray(outs["R_cr"][i]),
                 np.asarray(outs["t_cr"][i]))
            )
            if bool(outs["is_kf"][i]):
                self._last_kf_ts = ts
            if self.on_frame is not None:
                self.on_frame(dict(
                    event="frame", ts=ts, Twc=T,
                    n_inliers=int(outs["n_inliers"][i]), state=OK,
                    n_kf=int(outs["ref"][i]) + 1,
                ))
                if bool(outs["is_kf"][i]):
                    self.on_frame(dict(
                        event="keyframe", ts=ts, kf_id=int(outs["ref"][i])
                    ))
        if self.on_frame is not None and C:
            self._maybe_publish_points(float(p["tss"][-1]))
        if self._check_bad_imu():
            return
        # Loop closing / Atlas merging over the chunk's new keyframes at
        # the chunk boundary (the reference's asynchronous loop thread
        # consuming a KF queue, LoopClosing.cc:1108) — the same
        # composition as the mono chunk (_drain_chunk). A fired closure
        # rewrites poses/velocities (4-dof PGO + velocity rotation), so
        # the device chunk state and host anchors must be rebuilt.
        new_kf_slots = [
            int(outs["ref"][i]) for i in range(C)
            if bool(outs["is_kf"][i]) and bool(outs["alive"][i])
        ]
        moved = False
        last_slot = self.n_kf - 1
        if self.loop_closer is not None and new_kf_slots:
            # Snapshot the newest KF's pre-correction pose: on a fired
            # closure the whole map moves, and the end-of-chunk tracker
            # pose (several frames PAST that KF) must be re-anchored
            # through it — snapping to the KF pose itself would hand the
            # next chunk a stale IMU-prediction anchor.
            R_kf_old, t_kf_old = (
                np.asarray(a) for a in jax.device_get(
                    (self.map.kf_R[last_slot], self.map.kf_t[last_slot])
                )
            )
            import os as _os
            if _os.environ.get("ORB_TPU_SEQ_CLOSE"):
                for kf_id in new_kf_slots:  # A/B: sequential reference
                    self.key, sub = jax.random.split(self.key)
                    if self.loop_closer.try_close(self, kf_id, sub):
                        moved = True
            else:
                self.key, sub = jax.random.split(self.key)
                if self.loop_closer.try_close_batch(self, new_kf_slots, sub):
                    moved = True
        if (
            getattr(self, "atlas", None) is not None
            and self.atlas.maps
            and any(k % 4 == 0 for k in new_kf_slots)
        ):
            self.key, sub = jax.random.split(self.key)
            self._freeze_rel_traj()
            if self.atlas.merge_current_into(self, 0, sub):
                moved = True
                R_kf_old = t_kf_old = None  # weld may remap slots
        if moved:
            self._vi_dev_state = None
            self._vi_anchor = None
            self._vi_prior = None
            buf = np.asarray(jax.device_get(
                _pack_kf_state(self.map, self.n_kf - 1)
            ))
            self.bg_cur = buf[3:6].copy()
            self.ba_cur = buf[6:9].copy()
            R_kf_new = buf[9:18].reshape(3, 3)
            t_kf_new = buf[18:21]
            if R_kf_old is not None and self.n_kf - 1 == last_slot:
                # Re-anchor the end-of-chunk pose through the corrected
                # keyframe: T_cur' = (T_cur o T_kf_old^-1) o T_kf_new,
                # and rotate the world-frame velocity by the same
                # correction (CorrectLoop's velocity update).
                R_rel = self.R_cur @ R_kf_old.T
                t_rel = self.t_cur - R_rel @ t_kf_old
                self.R_cur = np.asarray(R_rel @ R_kf_new, np.float32)
                self.t_cur = np.asarray(R_rel @ t_kf_new + t_rel, np.float32)
                Rcor = R_kf_new.T @ R_kf_old
                self.v_cur = np.asarray(Rcor @ self.v_cur, np.float32)
            else:
                self.R_cur = np.asarray(R_kf_new, np.float32)
                self.t_cur = np.asarray(t_kf_new, np.float32)
                self.v_cur = buf[0:3].copy()
                self._set_ref_cache(self.n_kf - 1, R_kf_new, t_kf_new)
            self.vel_R = np.eye(3, dtype=np.float32)
            self.vel_t = np.zeros(3, np.float32)
            if self._check_bad_imu():
                return
        if not sc["alive"]:
            # Visual support collapsed mid-chunk: hand off to the
            # per-frame RECENTLY_LOST ladder (IMU dead-reckoning /
            # relocalization live there) and replay the dead tail.
            self._vi_dev_state = None
            k = C - n_dead
            self.state = RECENTLY_LOST
            self._lost_since_ts = float(p["tss"][k]) if k < C else None
            acc, gyro, dts = p["imu"]
            # The whole chunk's IMU was already appended to _imu_history
            # by process_frames; the replay below re-appends the tail
            # frames' samples via process_frame — drop them first so the
            # next _collect_block does not double-integrate the tail
            # into the post-recovery keyframe's preintegration block.
            if k < C:
                cut = float(p["tss"][k]) - 1e-9
                self._imu_history = [
                    e for e in self._imu_history if e[0] < cut
                ]
            saved = self.frame_id
            self.frame_id = p["fid0"] + k
            try:
                for i in range(k, C):
                    self._fallback_frame_imu(
                        p["imgs"][i], float(p["tss"][i]),
                        acc[i], gyro[i], dts[i],
                    )
            finally:
                self.frame_id = max(saved, self.frame_id)

    def _track_post(self, feats, res, ts):
        """Per-frame VI pose refinement + the RECENTLY_LOST ladder.

        Once the IMU is initialized, the visual tracking result is
        re-optimized jointly with the preintegration factor to the
        previous frame and the 15-dim marginal prior carried from the
        previous solve (PoseInertialOptimizationLastFrame,
        Optimizer.cc:5020 + ConstraintPoseImu, G2oTypes.h:706). When
        visual support collapses, the state dead-reckons on IMU for up to
        ``time_recently_lost`` seconds (Tracking.cc:2017-2068) — KFs keep
        being inserted so the preintegration chain stays intact."""
        if not (self.imu_initialized and self.vi_tracking):
            return super()._track_post(feats, res, ts)
        acc, gyro, dts = self._frame_imu
        if acc is None or not len(acc):
            return super()._track_post(feats, res, ts)
        M = self.imu_cap_frame
        a = np.zeros((M, 3), np.float32)
        g = np.zeros((M, 3), np.float32)
        d = np.zeros((M,), np.float32)
        nn = min(len(acc), M)
        a[:nn], g[:nn], d[:nn] = acc[:nn], gyro[:nn], dts[:nn]
        anchor = self._vi_anchor or self._body_state_from_host()
        R_anc, p_anc, v_anc, bg_anc, ba_anc = anchor
        b = jnp.concatenate([jnp.asarray(bg_anc), jnp.asarray(ba_anc)])
        pre = self._jit_preint(jnp.asarray(a), jnp.asarray(g), jnp.asarray(d), b)
        anc_Sigma = (
            self._vi_prior if self._vi_prior is not None
            else jnp.zeros((15, 15))
        )
        vires, R_cw, t_cw = _vi_refine(
            self.map, feats, res.feat_pt, res.R, res.t,
            jnp.asarray(self.v_cur), jnp.asarray(bg_anc), jnp.asarray(ba_anc),
            R_anc, p_anc, v_anc, bg_anc, ba_anc, pre,
            anc_Sigma, self.cam_params,
            self.calib.R_bc, self.calib.t_bc,
        )
        n_vis, R_new, t_new = jax.device_get(
            (vires.n_inliers, R_cw, t_cw)
        )
        n_vis = int(n_vis)
        state_tuple = (vires.R_wb, vires.p_wb, vires.v_w, vires.bg, vires.ba)
        return self._vi_post(
            feats, res, vires, ts, n_vis, np.asarray(R_new),
            np.asarray(t_new), state_tuple
        )

    def _vi_post(self, feats, res, vires, ts, n_vis, R_new, t_new,
                 state_tuple):
        if n_vis < 15:
            if self.state == OK or self._lost_since_ts is None:
                self._lost_since_ts = ts
            if ts - self._lost_since_ts <= self.time_recently_lost:
                self.state = RECENTLY_LOST
                self.R_cur = np.asarray(R_new)
                self.t_cur = np.asarray(t_new)
                self.v_cur = vires.v_w
                self._vi_anchor = state_tuple
                self._vi_prior = None  # no visual info to marginalize
                self._log_pose(ts)
                if self._need_keyframe(n_vis):
                    self._ref_kf_inl = n_vis
                    self._insert_keyframe(feats, ts, res)
                return self._pose_mat()
            self.state = LOST
            self._vi_prior = None
            self._vi_anchor = None
            return None
        if self.state == RECENTLY_LOST:
            self.state = OK
            self.lost_count = 0
        self._lost_since_ts = None
        self.R_cur = np.asarray(R_new)
        self.t_cur = np.asarray(t_new)
        self.v_cur = vires.v_w
        self.bg_cur = vires.bg
        self.ba_cur = vires.ba
        self._vi_anchor = state_tuple
        # Next frame's anchor uncertainty = this solve's posterior cov.
        self._vi_prior = vires.Sigma
        self.map = map_updates.update_track_counters(
            self.map, res.visible_mask, res.found_mask
        )
        self._log_pose(ts)
        if self.on_frame is not None:
            self.on_frame(dict(
                event="frame", ts=ts, Twc=self._pose_mat(),
                n_inliers=n_vis, state=self.state, n_kf=self.n_kf,
            ))
        if self._need_keyframe(n_vis):
            self._ref_kf_inl = n_vis
            self._insert_keyframe(feats, ts, res)
        return self._pose_mat()

    # ------------------------------------------------------------------
    def _create_initial_map(self, feats, ts, idx, res):
        super()._create_initial_map(feats, ts, idx, res)
        # KF0 (at self.init_ts) and KF1 (at ts) were just created; stash
        # the block integrating KF0 -> KF1.
        a, g, d = self._collect_block(self.init_ts, ts)
        self.kf_imu_acc[1], self.kf_imu_gyro[1], self.kf_imu_dts[1] = a, g, d
        self._last_kf_ts = ts

    def _insert_keyframe(self, feats, ts, track_res):
        self._vi_dev_state = None  # host-path KF: device chunk state stale
        kf_id = self.n_kf
        prev_ts = getattr(self, "_last_kf_ts", None)
        if prev_ts is None:
            prev_ts = float(jax.device_get(self.map.kf_ts[max(kf_id - 1, 0)]))
        a, g, d = self._collect_block(prev_ts, ts)
        self.kf_imu_acc[kf_id], self.kf_imu_gyro[kf_id], self.kf_imu_dts[kf_id] = a, g, d
        self._last_kf_ts = ts

        if self.imu_initialized and kf_id >= 2:
            self._insert_keyframe_vi_fused(feats, ts, track_res, kf_id)
        else:
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
            self.n_kf >= self.init_after_kf + 4
        ):
            # Stage-2 refinement (the reference's VIBA1 ladder step,
            # LocalMapping.cc:184-227: priors drop 1e2->1): re-solve
            # gravity/scale on the (now roughly metric) map and re-run
            # the full inertial BA with weaker bias priors.
            self._initialize_imu(bias_prior_g=1.0, bias_prior_a=1e4)
            self.imu_stage = 2
        elif self.imu_initialized and self.imu_stage == 2 and (
            self.n_kf >= self.init_after_kf + 8
        ):
            # Stage-3: free-prior full inertial BA with gravity/scale
            # vertices (VIBA2 at 15 s uses priors 0/0 + ScaleRefinement,
            # LocalMapping.cc:1431) — closes the last few % of scale.
            self._run_vi_ba_gs(n_iters=40, bias_prior_g=0.0,
                               bias_prior_a=0.0)
            self.imu_stage = 3

    def _insert_keyframe_vi_fused(self, feats, ts, track_res, kf_id):
        """Whole VI keyframe iteration in one dispatch + one packed
        fetch (see _vi_kf_work)."""
        self._apply_kf_async(force=True)
        # Snapshot-staleness bound — see MonoSlam._insert_keyframe for
        # why the ADVICE-r4 "closure-only abort" semantics was reverted.
        self.abort_gba()
        if self.on_frame is not None:
            self.on_frame(dict(event="keyframe", ts=ts, kf_id=kf_id))
        feats_d, feat_pt = self._to_map_dev((feats, track_res.feat_pt))
        # Temporal VI-BA window over the last W keyframes INCLUDING the
        # new one (LocalInertialBA's mPrevKF chain, Optimizer.cc:2532).
        last = kf_id + 1
        lo = max(0, last - self.W)
        ids = list(range(lo, last))
        if last <= self.W:
            # Window covers the whole map: full VI-BA, only KF0 fixed
            # (matches _run_vi_ba's young-map branch — fixing more this
            # early measurably slows scale convergence).
            fixed = [i == 0 for i in ids]
        else:
            fixed = [i == 0 or i < last - self.ba_window for i in ids]
        W_eff = self.W
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
        blk_ids = [ids[i + 1] for i in range(len(ids) - 1)]
        big = np.concatenate(
            [
                self.kf_imu_acc[blk_ids], self.kf_imu_gyro[blk_ids],
                self.kf_imu_dts[blk_ids][..., None],
            ],
            axis=-1,
        ).astype(np.float32)
        small = np.concatenate([
            np.asarray(ids, np.float32), np.asarray(fixed, np.float32),
            np.asarray(edge_ok, np.float32),
        ])
        do_fuse = (
            self.fuse_neighbors > 0 and kf_id >= 2
            and kf_id % self.fuse_every == 0
        )
        do_stats = kf_id % self.stats_every == 0
        do_cull = (
            self.kf_culling and kf_id >= 4 and kf_id % self.cull_every == 0
        )
        sm = getattr(self, "_last_depth", None)
        if sm is not None and self.bf > 0:
            ur = jnp.where(sm.valid, sm.u_right, -1.0)
            depth = jnp.where(sm.valid, sm.depth, -1.0)
        else:
            ur = depth = None
        self.map, packed = _vi_kf_work(
            self.map, jnp.asarray(kf_id, jnp.int32),
            jnp.asarray(self.R_cur), jnp.asarray(self.t_cur),
            jnp.asarray(ts, jnp.float32), feats_d, feat_pt,
            jnp.asarray(self.n_pts, jnp.int32),
            jnp.asarray(self.P_cap - self.n_pts, jnp.int32),
            jnp.asarray(self.v_cur), jnp.asarray(self.bg_cur),
            jnp.asarray(self.ba_cur),
            jnp.asarray(big), jnp.asarray(small),
            self.calib, self.cam_params,
            jnp.asarray(self.bf, jnp.float32),
            self.width, self.height, self.fuse_neighbors,
            do_fuse, do_stats, do_cull,
            self.local_ba_iters, self.config.n_levels, self.cam_model,
            ur=ur, depth=depth,
            max_depth=jnp.asarray(
                float(getattr(self, "max_depth", 0.0)), jnp.float32
            ),
        )
        self.n_kf += 1
        self.last_kf_frame = self.frame_id
        buf = np.asarray(jax.device_get(packed))
        self.n_pts += int(buf[0])
        self.v_cur = buf[1:4].copy()
        self.bg_cur = buf[4:7].copy()
        self.ba_cur = buf[7:10].copy()
        R_ref = buf[10:19].reshape(3, 3)
        t_ref = buf[19:22]
        self.R_cur = R_ref.copy()
        self.t_cur = t_ref.copy()
        self._set_ref_cache(kf_id, R_ref, t_ref)
        # BA moved keyframe poses: the per-frame anchor/prior are stale.
        self._vi_anchor = None
        self._vi_prior = None
        if self._check_bad_imu():
            return
        if self.loop_closer is not None:
            self.key, sub = jax.random.split(self.key)
            self.loop_closer.try_close(self, kf_id, sub)
        self._start_replica_copy()

    # ------------------------------------------------------------------
    def _compact_hook(self, order, new_of_old, n_valid):
        """Reorder per-slot IMU blocks after keyframe compaction. When
        keyframes between two survivors were culled, their measurement
        blocks are concatenated into the successor's block (the
        reference's Preintegrated::MergePrevious, ImuTypes.cc:237);
        overflow past the block capacity breaks the chain at that seam
        (VI-BA masks the inertial edge there)."""
        self._vi_dev_state = None  # slot layout changed
        old_acc, old_gyro, old_dts = (
            self.kf_imu_acc, self.kf_imu_gyro, self.kf_imu_dts,
        )
        acc = np.zeros_like(old_acc)
        gyro = np.zeros_like(old_gyro)
        dts = np.zeros_like(old_dts)
        old_breaks = set(self.chain_breaks)
        breaks = set()
        for r in range(n_valid):
            co = int(order[r])
            if r == 0:
                acc[0], gyro[0], dts[0] = old_acc[co], old_gyro[co], old_dts[co]
                continue
            po = int(order[r - 1])
            n = 0
            ok = True
            for j in range(po + 1, co + 1):
                if j in old_breaks:
                    ok = False
                    break
                m_j = int((old_dts[j] > 0).sum())
                if n + m_j > self.imu_cap_kf:
                    ok = False
                    break
                acc[r, n : n + m_j] = old_acc[j, :m_j]
                gyro[r, n : n + m_j] = old_gyro[j, :m_j]
                dts[r, n : n + m_j] = old_dts[j, :m_j]
                n += m_j
            if not ok:
                breaks.add(r)
        self.kf_imu_acc, self.kf_imu_gyro, self.kf_imu_dts = acc, gyro, dts
        self.chain_breaks = breaks
        self._vi_anchor = None
        self._vi_prior = None

    # ------------------------------------------------------------------
    def _initialize_imu(self, rounds: int = 1, bias_prior_g: float = 1e2,
                        bias_prior_a: float = 1e6):
        """Gravity/scale/bias initialization + map alignment
        (LocalMapping::InitializeIMU stage 1): closed-form-seeded
        InertialOptimization, map alignment, then FullInertialBA with
        gravity+scale vertices (EdgeInertialGS) — one round suffices
        because the final BA re-solves gravity/scale jointly. The bias
        priors follow the reference's decreasing ladder across re-runs
        (priorG 1e2 -> 1 -> 0, LocalMapping.cc:184-227)."""
        for _ in range(rounds):
            self._imu_init_round(bias_prior_g, bias_prior_a)

    def _imu_init_round(self, bias_prior_g: float = 1e2,
                        bias_prior_a: float = 1e6):
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
        self._run_vi_ba_gs(n_iters=25, bias_prior_g=bias_prior_g,
                           bias_prior_a=bias_prior_a)

    # ------------------------------------------------------------------
    def _run_local_ba(self, n_iters):
        if self.imu_initialized:
            self._run_vi_ba(window=self.W, n_iters=n_iters)
        else:
            super()._run_local_ba(n_iters)

    def _build_full_vi_problem(self):
        """Assemble the all-keyframe VI problem (only KF0's pose fixed).

        Exact-n shape: callers are the IMU-init ladder's gravity/scale
        solves, which run at a BOUNDED set of keyframe counts
        (init_after_kf + fixed offsets), so compile count stays small —
        and the GS solver's gravity/scale estimate measurably shifts
        (~4% scale on the e2e) under heavy padded duplication, unlike
        the plain VI-BA. The repeated post-closure full inertial BA
        (unbounded n) instead pads to K_cap in _run_vi_ba."""
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
            self.calib, self.cam_params, bf=self.bf,
        )
        return prob, window_ids

    def _run_vi_ba_gs(self, n_iters, bias_prior_g=0.0, bias_prior_a=0.0):
        """Full inertial BA with EdgeInertialGS gravity/scale vertices,
        then apply the recovered (Rwg, s) to the whole map — the joint
        replacement for alternating InertialOptimization with a
        fixed-gravity full BA."""
        self._vi_dev_state = None  # host-side VI solve: chunk state stale
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

    # ------------------------------------------------------------------
    # Chunked, abortable FULL INERTIAL BA (the reference's background
    # RunGlobalBundleAdjustment thread calls FullInertialBA when
    # pActiveMap->IsInertial(), LoopClosing.cc:3611-3620, with the same
    # mbStopGBA abort flag). Each chunk is a few LM iterations of the
    # K_cap-padded full VI problem (one compiled shape); the LM damping
    # carries across chunks (VIBAResult.lam), so the chunked solve walks
    # the same trust-region path as the synchronous one. Frame/chunk
    # dispatches interleave with GBA chunks on the device queue, so a
    # post-closure inertial GBA no longer stalls tracking.
    def _start_async_gba(self, n_iters: int, n_cg: int = 50, chunk: int = 2):
        if not self.imu_initialized:
            return super()._start_async_gba(n_iters, n_cg=n_cg, chunk=chunk)
        if self._gba is not None:
            self.abort_gba()  # mbStopGBA: don't wait out the old solve
            while self._gba is not None:
                self._poll_gba(force=True)  # fold in its partial result
        built = self._build_vi_window_problem(self.n_kf)
        if built is None:
            return
        prob, window_ids = built
        self._gba = dict(
            kind="vi", prob=prob, window_ids=window_ids, done=0,
            target=n_iters, chunk=chunk,
            lam=jnp.asarray(1e-3, jnp.float32),
            n_kf0=self.n_kf, res=None, abort=False, obs0=self.map.kf_obs,
        )
        self._dispatch_gba_chunk()

    def _dispatch_gba_chunk(self):
        g = self._gba
        if g.get("kind") != "vi":
            return super()._dispatch_gba_chunk()
        it = min(g["chunk"], g["target"] - g["done"])
        res = viba.vi_bundle_adjust(
            g["prob"], n_iters=it, row_n=self.N, lam0=g["lam"]
        )
        g["prob"] = g["prob"]._replace(states=res.states, X=res.X)
        g["lam"] = res.lam
        g["res"] = res
        g["done"] += it
        # Pacing signal only: a scalar fetch on the IO thread resolves
        # when the chunk has executed (the big arrays stay on device).
        g["fut"] = self._io.submit(jax.device_get, res.cost)

    def _finish_gba(self):
        """A folded-in global BA moved keyframe poses: the device chunk
        anchors and the per-frame marginal prior are stale (rebuilt from
        host state on the next frame/chunk)."""
        g = self._gba
        if g is None or g.get("kind") != "vi":
            super()._finish_gba()
            self._vi_dev_state = None
            self._vi_anchor = None
            self._vi_prior = None
            return
        # The handle is cleared BEFORE the fold-in: the fold-in path can
        # re-enter _poll_gba (map reset on a bad IMU check, replica
        # sync), and a still-set self._gba would re-apply the correction
        # — a double fold-in silently corrupts every pose. The advisor's
        # dropped-solve concern (r4 #4) is handled by RESTORING the
        # handle if the fold-in raises, so `while self._gba` callers
        # still see the pending solve instead of a silent abandon.
        self._gba = None
        try:
            # Anchor keyframe r = last keyframe the solve saw: its
            # pre/post poses define the world correction applied to
            # everything created during the solve (and to the tracker's
            # current pose below).
            r = g["n_kf0"] - 1
            pre = np.asarray(jax.device_get(jnp.concatenate(
                [self.map.kf_R[r].reshape(-1), self.map.kf_t[r]]
            )))
            self.map = local_mapping.apply_vi_gba_partial(
                self.map, g["window_ids"], g["res"], self.calib,
                jnp.asarray(g["n_kf0"], jnp.int32), kf_obs0=g["obs0"],
            )
            self.map = map_updates.refresh_point_stats(
                self.map, n_levels=self.config.n_levels
            )
            post = np.asarray(jax.device_get(jnp.concatenate(
                [self.map.kf_R[r].reshape(-1), self.map.kf_t[r]]
            )))
        except Exception:
            self._gba = g  # keep the solve visible; caller may retry
            raise
        Rr_o, tr_o = pre[:9].reshape(3, 3), pre[9:]
        Rr_n, tr_n = post[:9].reshape(3, 3), post[9:]
        # Tcw_cur' = (Tcw_cur * Twc_r_old) * Tcw_r_new — the tracker rides
        # the same correction as the keyframes inserted during the solve;
        # without this the next chunk anchor teleports across the fold-in.
        R_cr = self.R_cur @ Rr_o.T
        t_cr = self.t_cur - R_cr @ tr_o
        self.R_cur = (R_cr @ Rr_n).astype(np.float32)
        self.t_cur = (R_cr @ tr_n + t_cr).astype(np.float32)
        self.v_cur = ((Rr_n.T @ Rr_o) @ self.v_cur).astype(np.float32)
        self._ref_cache = None
        self._sync_replica()
        self._vi_dev_state = None
        self._vi_anchor = None
        self._vi_prior = None
        self._check_bad_imu()

    def _sync_host_state(self):
        """Refresh host-side bias/velocity/ref-pose from the newest KF —
        one tunnel fetch."""
        kf_last = self.n_kf - 1
        buf = np.asarray(jax.device_get(_pack_kf_state(self.map, kf_last)))
        self.v_cur = buf[0:3].copy()
        self.bg_cur = buf[3:6].copy()
        self.ba_cur = buf[6:9].copy()
        R_ref = buf[9:18].reshape(3, 3)
        t_ref = buf[18:21]
        self.R_cur = np.asarray(R_ref)
        self.t_cur = np.asarray(t_ref)
        self._set_ref_cache(kf_last, R_ref, t_ref)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        # Map state moved under the per-frame VI tracker: drop the stale
        # anchor/prior (re-derived from host state next frame).
        self._vi_anchor = None
        self._vi_prior = None
        self._check_bad_imu()

    def _build_vi_window_problem(self, window):
        """Assemble the (padded) VI-BA window problem over the last
        ``window`` keyframes — two packed uploads. Returns
        ``(prob, window_ids)`` or None when there is nothing to solve."""
        if self.n_kf < 2:
            return None
        last = self.n_kf
        lo = max(0, last - window)
        ids = list(range(lo, last))
        if window >= last:
            fixed = [i == 0 for i in ids]  # full BA: only the origin fixed
        else:
            fixed = [i == 0 or i < last - self.ba_window for i in ids]
        if all(fixed):
            return None
        # Beyond-window solves (the post-closure full inertial BA) pad
        # to K_cap — ONE compiled shape; see _build_full_vi_problem.
        W_eff = max(self.W, len(ids))
        if W_eff > self.W:
            W_eff = self.K_cap
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
        # IMU block k integrates KF k-1 -> k, so edge (ids[i] -> ids[i+1])
        # uses block ids[i+1] (padded edges are masked by edge_ok).
        blk_ids = [ids[i + 1] for i in range(len(ids) - 1)]
        # TWO packed uploads (big IMU blocks; small window masks) instead
        # of six — per-leaf transfer round trips over the TPU tunnel.
        big = np.concatenate(
            [
                self.kf_imu_acc[blk_ids], self.kf_imu_gyro[blk_ids],
                self.kf_imu_dts[blk_ids][..., None],
            ],
            axis=-1,
        ).astype(np.float32)  # [W-1, S, 7]
        W_eff_ = len(ids)
        small = np.concatenate([
            np.asarray(ids, np.float32),
            np.asarray(fixed, np.float32),
            np.asarray(edge_ok, np.float32),
        ])  # [W + W + W-1]
        big_d = jnp.asarray(big)
        small_d = jnp.asarray(small)
        window_ids = small_d[:W_eff_].astype(jnp.int32)
        fixed_d = small_d[W_eff_ : 2 * W_eff_] > 0.5
        edge_ok_d = small_d[2 * W_eff_ :] > 0.5
        prob = local_mapping.build_vi_ba(
            self.map, window_ids, fixed_d,
            big_d[..., 0:3], big_d[..., 3:6], big_d[..., 6],
            edge_ok_d, self.calib, self.cam_params, bf=self.bf,
        )
        return prob, window_ids

    def _run_vi_ba(self, window, n_iters, bias_prior_g=0.0, bias_prior_a=0.0):
        self._vi_dev_state = None  # host-side VI solve: chunk state stale
        built = self._build_vi_window_problem(window)
        if built is None:
            return
        prob, window_ids = built
        res = viba.vi_bundle_adjust(
            prob, n_iters=n_iters,
            bias_prior_g=bias_prior_g, bias_prior_a=bias_prior_a,
            row_n=self.N,
        )
        self.map = local_mapping.apply_vi_ba(self.map, window_ids, res, self.calib)
        # sync host bias/velocity (and the ref-pose cache) with the
        # newest KF estimates — ONE PACKED tunnel fetch (a device_get
        # round-trips per pytree leaf over the tunnel).
        kf_last = self.n_kf - 1
        buf = np.asarray(jax.device_get(_pack_kf_state(self.map, kf_last)))
        self.v_cur = buf[0:3].copy()
        self.bg_cur = buf[3:6].copy()
        self.ba_cur = buf[6:9].copy()
        R_ref = buf[9:18].reshape(3, 3)
        t_ref = buf[18:21]
        self._set_ref_cache(kf_last, R_ref, t_ref)
        if self._check_bad_imu():
            return
        # BA moved keyframe poses: the per-frame VI anchor/prior are stale.
        self._vi_anchor = None
        self._vi_prior = None
