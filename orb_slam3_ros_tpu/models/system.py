"""Monocular SLAM system facade: host-orchestrated state machine over the
jitted device stages.

Role of the reference's ``System`` + ``Tracking`` state machine + the
synchronous parts of ``LocalMapping`` (orb_slam3/src/System.cc:41-222,
Tracking.cc:1830-2368 Track(), LocalMapping.cc:64-282 Run()). The
reference runs 3 pthreads over a shared mutable map; round-1 here runs
the same stage sequence synchronously per keyframe (the stages are pure
functions over ``MapState``, so pipelining them asynchronously is an
orchestration change, not a data-model change).

State machine: NOT_INITIALIZED -> (two-view init) -> OK -> (track loss)
-> LOST (reinit not yet wired to a multi-map Atlas).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ba, cameras, hamming, lie, matching, orb, ransac
from . import local_mapping, map_state, map_updates, tracking

NOT_INITIALIZED = 0
OK = 1
LOST = 2
# Inertial pipelines: visual tracking starved but IMU dead-reckoning is
# still trusted (Tracking::RECENTLY_LOST, Tracking.cc:2017-2068); decays
# to LOST after ``time_recently_lost`` seconds without visual recovery.
RECENTLY_LOST = 3


class _ChunkReplayView:
    """Per-frame indexing into a device-resident frame stack at an
    offset — the dead-tail replay / fallback view of a ``(stack,
    offset)`` chunk input."""

    def __init__(self, stack, offset: int):
        self._stack = stack
        self._off = offset

    def __getitem__(self, i):
        return self._stack[self._off + i]


@jax.jit
def _reloc_pnp_inputs(m, kf, feats):
    """2D-3D correspondences for relocalization PnP: match the query
    frame's descriptors against keyframe ``kf``'s features and pair the
    keyframe's bound landmarks (world X) with the query pixels (the
    reference's SearchByBoW(pKF, frame) -> MLPnP setup)."""
    kf_feats = orb.Features(
        xy=m.kf_xy[kf], level=m.kf_level[kf], angle=m.kf_angle[kf],
        response=jnp.zeros_like(m.kf_angle[kf]),
        desc_packed=jnp.zeros((m.N, 8), jnp.uint32),
        desc_sign=m.kf_desc_sign[kf], valid=m.kf_feat_valid[kf],
    )
    idx, _ = matching.search_frame_frame(kf_feats, feats, max_dist=64, ratio=0.8)
    pt = m.kf_obs[kf]
    ok = (idx >= 0) & (pt >= 0) & m.pt_valid[jnp.clip(pt, 0, m.P - 1)]
    X = m.pt_X[jnp.clip(pt, 0, m.P - 1)]
    uv = feats.xy[jnp.clip(idx, 0, m.N - 1)]
    return X, uv, ok


@jax.jit
def _reloc_detect_fused(m, desc_sign, valid, vocab):
    """Fused relocalization candidate detection — signatures, query
    signature, covisibility, and the grouped ranking
    (DetectRelocalizationCandidates, KeyFrameDatabase.cc:733-856) in ONE
    dispatch. The previous eager op-by-op flow cost seconds per lost
    frame over the TPU tunnel (each op a round trip), which turned every
    loss episode into a multi-second stall."""
    from . import map_state as _ms
    from ..ops import retrieval as _retrieval

    sigs = _retrieval.kf_signatures(m.kf_desc_sign, m.kf_feat_valid, vocab)
    q = _retrieval.signature(desc_sign, valid, vocab)
    cov = _ms.covisibility(m)
    cand, _ = _retrieval.detect_candidates_grouped(
        q, sigs, cov, m.kf_valid, jnp.zeros((m.K,), bool),
        min_common_score=0.0,
    )
    return cand


@partial(jax.jit, static_argnames=("width", "height", "cam_model"))
def _reloc_attempt_fused(m, cand, feats, key, cam_params, width, height,
                         cam_model="pinhole"):
    """One relocalization attempt against candidate ``cand`` in ONE
    dispatch: SearchByBoW-style 2D-3D matching, PnP RANSAC seed (falling
    back to the candidate's own pose when under-supported), and
    projection tracking against the map (Tracking::Relocalization,
    Tracking.cc:3648-3760). Returns (R, t, packed[13]) — one fetch."""
    from ..ops import pnp as _pnp

    R0 = m.kf_R[cand]
    t0 = m.kf_t[cand]
    X, uv, ok = _reloc_pnp_inputs(m, cand, feats)
    if cam_model == "kb8":
        fx = cam_params[0]
        uv = cameras.kb8_unproject(cam_params, uv)[:, :2] * fx
        pnp_cam = jnp.zeros((9,), cam_params.dtype).at[0].set(fx).at[1].set(fx)
    else:
        pnp_cam = cam_params
    pres = _pnp.solve_pnp(X, uv, ok, pnp_cam, key)
    use = pres.ok & (ok.sum() >= 15)
    R0 = jnp.where(use, pres.R, R0)
    t0 = jnp.where(use, pres.t, t0)
    res = tracking.track_against_map(
        m, feats, R0, t0, cam_params, width, height, cam_model=cam_model,
    )
    packed = jnp.concatenate([
        res.R.reshape(-1), res.t,
        res.n_inliers.reshape(1).astype(res.t.dtype),
    ])
    return packed


class MonoSlam:
    """Monocular pipeline (the reference's ``System(..., MONOCULAR)``)."""

    def __init__(
        self,
        height: int,
        width: int,
        cam_params: np.ndarray,
        n_features: int = 600,
        max_keyframes: int = 64,
        max_points: int = 8192,
        ba_window: int = 8,
        ba_fixed: int = 4,
        kf_every: int = 5,
        kf_min_inliers: int = 60,
        kf_ref_ratio: float = 0.5,
        local_ba_iters: int = 6,
        enable_loop_closing: bool = False,
        enable_atlas: bool = False,
        lost_patience: int = 10,
        track_window: Optional[int] = None,
        pipelined: bool = True,
        fuse_neighbors: int = 1,
        kf_culling: bool = True,
        fuse_every: int = 1,
        stats_every: int = 1,
        cull_every: int = 1,
        track_schedule: Optional[tuple] = None,
        lean_after_kf: int = 12,
        ts_jump_threshold: float = 1.0,
        covis_ba: bool = True,
        devices: Optional[tuple] = None,
        track_cap: Optional[int] = None,
        transfer_uint8: bool = False,
        points_every: int = 0,
        cam_model: str = "pinhole",
        seed: int = 0,
    ):
        # ``track_cap``: bound per-frame matching to the top-N candidate
        # points under the predicted pose (local-map tracking, see
        # tracking.track_against_map) — the match matrices and pose-opt
        # edge tables shrink by P_cap/track_cap.
        self.track_cap = track_cap
        # Camera model of the observation factors (pinhole | kb8): every
        # jitted pipeline program specializes on it (the GeometricCamera
        # virtual dispatch of the reference, resolved at trace time).
        # kb8 = NATIVE fisheye tracking on raw fisheye pixels — no
        # virtual-pinhole rectification crop (ops/rectify.py remains as
        # the alternative path).
        self.cam_model = cam_model
        # ``transfer_uint8``: upload chunk frames as uint8 (the real
        # camera format; EuRoC images ARE 8-bit) — 1/4 the link bytes of
        # f32; extraction converts on device.
        self.transfer_uint8 = transfer_uint8
        # ``covis_ba``: select the local-BA window by covisibility with
        # the newest keyframe (the reference's local window) instead of
        # the temporal last-W keyframes — matters on revisits, where the
        # covisible neighbors are OLD keyframes.
        self.covis_ba = covis_ba
        # ``devices``: (track_device, map_device) — the 2-chip shape of
        # the reference's Tracking/LocalMapping thread split
        # (System.cc:178). Per-frame extraction+tracking runs on the
        # track chip against a read-only map REPLICA; keyframe work
        # (triangulation, fusion, local BA, culling, GBA chunks) runs on
        # the map chip against the canonical map, and the refreshed map
        # is copied chip-to-chip asynchronously after each keyframe —
        # tracking tolerates a keyframe of staleness exactly like the
        # reference's tracking thread reads the in-flux shared map.
        # None = single-device (default).
        self.track_dev = self.map_dev = None
        if devices is not None:
            self.track_dev, self.map_dev = devices
        self._map_replica = None  # track-chip copy of the map
        self._replica_copy = None  # in-flight device-to-device transfer
        # Input-gap limit before the map is segmented (the reference's
        # 1.0 s check, Tracking.cc:1861).
        self.ts_jump_threshold = ts_jump_threshold
        # Tracking pass schedule (see tracking.SCHEDULE_DENSE/LEAN).
        # Default (None) is ADAPTIVE: the dense schedule while the map is
        # young (< lean_after_kf keyframes) or right after recovery — the
        # phases where a cold motion model and sparse map need the extra
        # LM budget — then the lean schedule at ~half the sequential-LM
        # latency. An explicit tuple pins one schedule for all frames.
        self._sched_dense = track_schedule or tracking.SCHEDULE_DENSE
        self._sched_lean = track_schedule or tracking.SCHEDULE_LEAN
        self.lean_after_kf = lean_after_kf
        # ``fuse_neighbors``: number of top-covisible keyframes to fuse
        # duplicate landmarks with at each keyframe insertion (the
        # reference's SearchInNeighbors, LocalMapping.cc:714); 0 disables.
        # ``kf_culling``: discard redundant keyframes (KeyFrameCulling,
        # LocalMapping.cc:902).
        self.fuse_neighbors = fuse_neighbors
        self.kf_culling = kf_culling
        # Keyframe-work cadence control: duplicate fusion, point-stats
        # refresh, and KF culling run every Nth keyframe. The reference's
        # LocalMapping likewise skips work under load (KF queue pressure
        # aborts BA, culling runs opportunistically); on the TPU these
        # stages are the bulk of per-KF device time, so thinning them is
        # the main throughput lever after tracking itself.
        self.fuse_every = max(1, fuse_every)
        self.stats_every = max(1, stats_every)
        self.cull_every = max(1, cull_every)
        # ``pipelined``: one-frame-lag tracking. Frame i's track is
        # dispatched speculatively (pose prediction computed ON DEVICE
        # from frame i-1's still-in-flight result), its outputs are
        # queued for async host transfer, and frame i-1's already-arrived
        # result is processed — hiding the ~36 ms tunnel fetch behind the
        # next frame's compute. This is the TPU shape of the reference's
        # tracking/mapping thread overlap (System.cc:178: stages run
        # concurrently, each on the freshest state available).
        self.pipelined = pipelined
        # Result-prefetch thread: device_get over the TPU tunnel costs a
        # full ~25 ms round trip and copy_to_host_async does NOT prefetch
        # on this backend (measured) — so every result fetch is handed to
        # one IO thread at dispatch time and collected a frame later,
        # hiding the round trip behind the next frame's compute.
        self._io = ThreadPoolExecutor(max_workers=1)
        self._pending = None  # in-flight frame: dict(feats, res, ts, idx)
        self._last2 = None  # (R, t) device handles of frame i-2
        self._kf_async = None  # deferred keyframe-work results
        # Chunked global BA in flight (mbStopGBA semantics): the solve
        # runs on a SNAPSHOT of the map a few LM iterations per dispatch,
        # interleaved with per-frame tracking on the device queue; a new
        # keyframe sets abort and the partial result is folded in with
        # relative-pose propagation (apply_global_ba_partial).
        self._gba = None
        # ``track_window``: only project points created by the last W
        # keyframes (the reference's local-map tracking; None = whole
        # map, which makes revisits re-acquire old landmarks and close
        # small loops implicitly).
        self.track_window = track_window
        self.height, self.width = height, width
        self.cam_params = jnp.asarray(cam_params)
        self.config = orb.default_config(height, width, n_features=n_features)
        self.K_cap = max_keyframes
        self.P_cap = max_points
        self.N = self.config.total_cap
        self.W = ba_window + ba_fixed
        self.ba_window = ba_window
        self.ba_fixed = ba_fixed
        self.kf_every = kf_every
        self.kf_min_inliers = kf_min_inliers
        self.kf_ref_ratio = kf_ref_ratio
        self._ref_kf_inl = 0  # inliers at the last keyframe insertion
        # Localization-only (mbOnlyTracking): track against a frozen
        # map, no keyframe insertion / mapping; relocalization stays on.
        self.localization_only = False
        self.local_ba_iters = local_ba_iters

        self.state = NOT_INITIALIZED
        # ``points_every``: emit map-point-cloud + keyframe-marker events
        # through ``on_frame`` every N frames (the reference publishes
        # tracked/all point clouds, KF markers and TF per frame,
        # src/common.cc:273-369; here a cadence bounds the device->host
        # fetch cost). 0 disables.
        self.points_every = points_every
        self._last_points_pub = -1
        # fx*baseline for stereo/RGB-D residuals (0 = mono, no stereo rows)
        self.bf = 0.0
        self.map = map_state.empty_map(self.K_cap, self.N, self.P_cap)
        if self.map_dev is not None:
            self.map = jax.device_put(self.map, self.map_dev)
            self._map_replica = jax.device_put(self.map, self.track_dev)
        self.n_kf = 0
        self._n_pts = 0
        self.frame_id = 0
        self.last_kf_frame = 0
        self.key = jax.random.PRNGKey(seed)

        # Motion model (velocity = T_cur * T_last^-1).
        self.R_cur = np.eye(3, dtype=np.float32)
        self.t_cur = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)

        self._ref_cache = None  # (ref_kf_id, R_ref, t_ref) host copy
        self.init_feats: Optional[orb.Features] = None
        self.init_ts = 0.0
        self.trajectory = []  # (ts, Twc 4x4) frozen at track time
        # Relative log (ts, ref_kf, R_cr, t_cr): frame pose relative to
        # its reference keyframe, so the final trajectory reflects all
        # later corrections (the reference's mlRelativeFramePoses,
        # Tracking.cc:2336-2356 + SaveTrajectoryEuRoC reconstruction).
        self.rel_traj = []
        self.timing = {}
        # Observability hook: called with an event dict per tracked frame
        # / keyframe insertion (the pose/marker publisher surface of
        # src/common.cc:65-118; see utils/obslog.FrameStreamer).
        self.on_frame = None

        self._extract = jax.jit(lambda im: orb.extract(im, self.config))
        # Optional trained retrieval vocabulary ([A,256] +-1; None =
        # seeded anchors) — the role of the reference's offline-trained
        # ORBvoc (System.cc:114). Train with train_vocabulary_from_map or
        # retrieval.train_vocabulary, install with set_vocabulary.
        self.vocab = None
        self.atlas = None
        self.lost_count = 0
        self.lost_patience = lost_patience
        self.frozen_traj = []  # absolute poses flushed at map switches
        if enable_atlas:
            from .atlas import Atlas

            self.atlas = Atlas()

        # Fused per-frame hot path: extraction + coarse-to-fine tracking
        # in ONE compiled program (each separate dispatch costs a full
        # host->device round trip; fusing them nearly halves steady-state
        # frame latency on the TPU link).
        def _fused(img, m, R_pred, t_pred, n_kf, schedule):
            feats = orb.extract(img, self.config)
            pt_mask = None
            if self.track_window is not None:
                pt_mask = m.pt_first_kf >= (n_kf - self.track_window)
            res = tracking.track_against_map(
                m, feats, R_pred, t_pred, self.cam_params,
                self.width, self.height, pt_mask=pt_mask,
                schedule=schedule, track_cap=self.track_cap,
                cam_model=self.cam_model,
            )
            return feats, res

        self._fused_track = jax.jit(_fused, static_argnames=("schedule",))

        # Pipelined variant: constant-velocity prediction computed on
        # device from the previous two (possibly still in-flight) poses —
        # no host sync on the critical path.
        def _fused_dev(img, m, R_prev, t_prev, R_prev2, t_prev2, n_kf,
                       schedule):
            vel_R = R_prev @ R_prev2.T
            vel_t = t_prev - vel_R @ t_prev2
            R_pred = vel_R @ R_prev
            t_pred = vel_R @ t_prev + vel_t
            return _fused(img, m, R_pred, t_pred, n_kf, schedule)

        self._fused_track_dev = jax.jit(
            _fused_dev, static_argnames=("schedule",)
        )
        self.loop_closer = None
        if enable_loop_closing:
            from .loop_closing import LoopCloser

            self.loop_closer = LoopCloser()
        # Install the shipped pretrained vocabulary (ORBvoc role,
        # System.cc:114) so retrieval/reloc discriminate from keyframe 1;
        # the online retrain (auto_train_vocab) refines it per-session.
        from ..ops import retrieval as _retrieval

        _dv = _retrieval.default_vocabulary()
        if _dv is not None:
            self.set_vocabulary(_dv)

    # ------------------------------------------------------------------
    @property
    def n_pts(self):
        """Live landmark count. Forces absorption of any deferred
        keyframe-work results so external readers always see the settled
        value."""
        if self._kf_async is not None:
            self._apply_kf_async(force=True)
        return self._n_pts

    @n_pts.setter
    def n_pts(self, v):
        self._n_pts = v

    # ------------------------------------------------------------------
    # 2-chip front-end/back-end split helpers (no-ops single-device).
    def _tmap(self):
        """The map per-frame tracking reads: the track-chip replica when
        running split across two chips, else the canonical map."""
        if self.track_dev is None:
            return self.map
        return self._map_replica

    def _to_map_dev(self, x):
        """Move tracking outputs to the map chip before canonical-map
        updates (jit requires consistent input placement)."""
        if self.map_dev is None:
            return x
        return jax.device_put(x, self.map_dev)

    def _sync_replica(self):
        """Refresh the track-chip replica NOW — for map changes outside
        the keyframe cadence (init, loop/GBA correction, compaction,
        atlas switches)."""
        if self.track_dev is None:
            return
        self._replica_copy = None
        self._map_replica = jax.device_put(self.map, self.track_dev)

    def _start_replica_copy(self):
        """Kick off the async chip-to-chip map refresh after keyframe
        work; tracking keeps using the old replica until it lands. A
        still-pending previous copy is adopted (blocking) first, so the
        replica is never more than one keyframe cycle stale — the same
        bound the reference's tracking thread gets from taking the map
        mutex at each keyframe decision."""
        if self.track_dev is None:
            return
        self._poll_replica(force=True)
        self._replica_copy = jax.device_put(self.map, self.track_dev)

    def _poll_replica(self, force: bool = False):
        if self._replica_copy is None:
            return
        c = self._replica_copy
        if not force:
            try:
                if not all(leaf.is_ready() for leaf in jax.tree.leaves(c)):
                    return
            except AttributeError:
                pass
        self._map_replica, self._replica_copy = c, None

    # ------------------------------------------------------------------
    def _set_ref_cache(self, ref_id, R_ref, t_ref):
        """Host-side copy of the reference keyframe's current pose. A
        device_get over the TPU tunnel costs ~36 ms; the ref KF pose only
        changes at keyframe events (BA / loop / rescale), so every such
        site refreshes or invalidates this cache and the per-frame
        trajectory log never touches the device."""
        self._ref_cache = (int(ref_id), np.asarray(R_ref), np.asarray(t_ref))

    def _log_pose(self, ts):
        Rcw, tcw = self.R_cur, self.t_cur
        Rwc = Rcw.T
        twc = -Rcw.T @ tcw
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc
        T[:3, 3] = twc
        self.trajectory.append((ts, T))
        if self.n_kf > 0:
            ref = self.n_kf - 1
            if self._ref_cache is None or self._ref_cache[0] != ref:
                R_ref, t_ref = jax.device_get(
                    (self.map.kf_R[ref], self.map.kf_t[ref])
                )
                self._set_ref_cache(ref, R_ref, t_ref)
            _, R_ref, t_ref = self._ref_cache
            # T_cr = Tcw_frame * Twc_ref
            R_cr = Rcw @ R_ref.T
            t_cr = tcw - R_cr @ t_ref
            self.rel_traj.append((ts, ref, R_cr, t_cr))

    def _compose_rel(self):
        kf_R = np.asarray(jax.device_get(self.map.kf_R))
        kf_t = np.asarray(jax.device_get(self.map.kf_t))
        out = []
        for ts, ref, R_cr, t_cr in self.rel_traj:
            Rcw = R_cr @ kf_R[ref]
            tcw = R_cr @ kf_t[ref] + t_cr
            T = np.eye(4, dtype=np.float32)
            T[:3, :3] = Rcw.T
            T[:3, 3] = -Rcw.T @ tcw
            out.append((ts, T))
        return out

    def _freeze_rel_traj(self):
        """Flush relative frame logs into absolute poses (called before a
        map switch — their reference keyframes are about to vanish)."""
        self.frozen_traj.extend(self._compose_rel())
        self.rel_traj = []

    def get_trajectory(self):
        """Frame trajectory recomposed against the CURRENT keyframe poses
        (reference SaveTrajectoryEuRoC semantics, System.cc:646): all
        loop/BA/IMU-init corrections applied retroactively."""
        self.flush()
        if not self.rel_traj and not self.frozen_traj:
            return list(self.trajectory)
        return list(self.frozen_traj) + self._compose_rel()

    def _tic(self, name, t0):
        dt = time.time() - t0
        self.timing.setdefault(name, []).append(dt)
        return time.time()

    def set_vocabulary(self, vocab) -> None:
        """Install a retrieval vocabulary ([A,256] +-1 int8; e.g. from
        ``retrieval.train_vocabulary``). Call BEFORE mapping starts —
        signatures already stored in the Atlas are not recomputed."""
        v = jnp.asarray(vocab, jnp.int8)
        self.vocab = v
        if self.loop_closer is not None:
            self.loop_closer.vocab = v
        if self.atlas is not None:
            self.atlas.vocab = v

    def train_vocabulary_from_map(self, n_words: int | None = None,
                                  iters: int = 12):
        """Train a vocabulary on the descriptors observed so far and
        install it (the online counterpart of DBoW2's offline training;
        useful when a session revisits the same environment). Default
        vocabulary size scales with the sample count — more words than
        ~1/16th of the samples stops generalizing (each descriptor gets
        a private word and co-located frames share none)."""
        from ..ops import retrieval

        desc = np.asarray(
            jax.device_get(self.map.kf_desc_sign[: self.n_kf])
        ).reshape(-1, 256)
        valid = np.asarray(
            jax.device_get(self.map.kf_feat_valid[: self.n_kf])
        ).reshape(-1)
        n = int(valid.sum())
        if n_words is None:
            n_words = int(np.clip(n // 16, 32, retrieval.MAX_WORDS))
        if n_words >= 1024:
            # Large vocabularies train hierarchically (two-level
            # k-medians, the DBoW2-tree counterpart); lookup stays the
            # exact flat argmax on the MXU.
            vocab = retrieval.train_vocabulary_hier(
                desc[valid], n_words=n_words, iters=iters
            )
        else:
            vocab = retrieval.train_vocabulary(
                desc[valid], n_words=n_words, iters=iters
            )
        self.set_vocabulary(vocab)
        return vocab

    def _warm_schedules(self):
        """Compile every tracking-schedule variant NOW (right after map
        initialization) so the adaptive dense->lean switch never triggers
        an XLA compile mid-run — over the TPU tunnel a compile costs
        10-100+ s, which would stall live tracking for seconds of frames."""
        if getattr(self, "_scheds_warmed", False):
            return
        self._scheds_warmed = True
        img = jnp.zeros((self.height, self.width), jnp.float32)
        R = jnp.eye(3)
        t = jnp.zeros(3)
        n_kf = jnp.asarray(self.n_kf)
        dummy = orb.Features(
            xy=self.map.kf_xy[0], level=self.map.kf_level[0],
            angle=self.map.kf_angle[0],
            response=jnp.zeros_like(self.map.kf_angle[0]),
            desc_packed=jnp.zeros((self.N, 8), jnp.uint32),
            desc_sign=self.map.kf_desc_sign[0], valid=self.map.kf_feat_valid[0],
        )
        pt_mask = None
        if self.track_window is not None:
            pt_mask = self.map.pt_first_kf >= 0
        for sched in dict.fromkeys((self._sched_dense, self._sched_lean)):
            if self.pipelined:
                _, r = self._fused_track(
                    img, self.map, R, t, n_kf, schedule=sched
                )
                self._fused_track_dev(
                    img, self.map, r.R, r.t, r.R, r.t, n_kf, schedule=sched
                )
            else:
                self._fused_track(img, self.map, R, t, n_kf, schedule=sched)
            # the standalone program used by pipelines that pre-compute
            # features (stereo/RGB-D _track path)
            tracking.track_against_map(
                self.map, dummy, R, t, self.cam_params,
                self.width, self.height, pt_mask=pt_mask, schedule=sched,
                cam_model=self.cam_model,
            )

    def _current_schedule(self) -> tuple:
        """Dense passes while the map is young or tracking just
        recovered; lean passes on a mature map (the reference likewise
        spends more search/optimization effort when tracking is weak —
        wider th in SearchByProjection, TrackReferenceKeyFrame fallback,
        Tracking.cc:2893-2988)."""
        if self.n_kf < self.lean_after_kf or self.lost_count > 0:
            return self._sched_dense
        return self._sched_lean

    # ------------------------------------------------------------------
    def _fallback_frame(self, img, ts: float):
        """Route one frame from a chunk fallback/replay through the
        per-frame path. Stereo pipelines override to split the [2,H,W]
        image pair the stereo chunk stacks ship."""
        return self.process_frame(img, ts)

    # ------------------------------------------------------------------
    def process_frame(self, img: np.ndarray, ts: float):
        """Track one grayscale frame. Returns Twc [4,4] or None.

        In pipelined mode the returned pose is the PREVIOUS frame's (one
        frame of latency); call ``flush()`` (or ``get_trajectory``, which
        flushes) to drain the last in-flight frame."""
        self._drain_chunk()
        self._check_ts_jump(ts)
        if self.pipelined:
            return self._process_frame_pipelined(img, ts)
        t0 = time.time()
        if self.state in (OK, RECENTLY_LOST):
            self._predict_motion(ts)
            R_pred = self.vel_R @ self.R_cur
            t_pred = self.vel_R @ self.t_cur + self.vel_t
            feats, res = self._fused_track(
                jnp.asarray(img, jnp.float32), self._tmap(),
                jnp.asarray(R_pred), jnp.asarray(t_pred),
                jnp.asarray(self.n_kf), schedule=self._current_schedule(),
            )
            t0 = self._tic("extract+track", t0)
            out = self._track_post(feats, res, ts)
        else:
            feats = self._extract(jnp.asarray(img, jnp.float32))
            jax.block_until_ready(feats.xy)
            t0 = self._tic("extract", t0)
            if self.state == NOT_INITIALIZED:
                out = self._try_initialize(feats, ts)
            else:
                out = self._try_relocalize(feats, ts)
        self._tic("frame", t0)
        self.frame_id += 1
        return out

    def _check_ts_jump(self, ts: float):
        """Timestamp-jump map segmentation (Tracking.cc:1856-1891): an
        input gap longer than ``ts_jump_threshold`` seconds invalidates
        the motion model / IMU preintegration chain, so the current map
        is archived and a fresh one started (CreateMapInAtlas role), or
        tracking drops to relocalization without an Atlas."""
        last = getattr(self, "_last_frame_ts", None)
        self._last_frame_ts = ts
        if (
            last is None
            or self.state not in (OK, RECENTLY_LOST)
            or ts - last <= self.ts_jump_threshold
        ):
            return
        self.flush()
        if self.atlas is not None:
            self._freeze_rel_traj()
            self.atlas.archive_current(self)  # state -> NOT_INITIALIZED
        else:
            self.state = LOST

    def _process_frame_pipelined(self, img: np.ndarray, ts: float):
        t0 = time.time()
        dispatched = None
        if self.state == OK:
            img_d = jnp.asarray(img, jnp.float32)
            if self._pending is not None:
                res_p = self._pending["res"]
                R2, t2 = self._last2
                feats, res = self._fused_track_dev(
                    img_d, self._tmap(), res_p.R, res_p.t, R2, t2,
                    jnp.asarray(self.n_kf), schedule=self._current_schedule(),
                )
                self._last2 = (res_p.R, res_p.t)
            else:
                self._predict_motion(ts)
                R_pred = self.vel_R @ self.R_cur
                t_pred = self.vel_R @ self.t_cur + self.vel_t
                feats, res = self._fused_track(
                    img_d, self._tmap(), jnp.asarray(R_pred),
                    jnp.asarray(t_pred), jnp.asarray(self.n_kf),
                    schedule=self._current_schedule(),
                )
                self._last2 = (jnp.asarray(self.R_cur), jnp.asarray(self.t_cur))
            # Hand the device->host fetch to the IO thread now; it
            # completes while the next frame computes.
            fut = self._io.submit(
                jax.device_get, (res.n_inliers, res.R, res.t)
            )
            dispatched = {"feats": feats, "res": res, "ts": ts,
                          "idx": self.frame_id, "fut": fut}
            t0 = self._tic("dispatch", t0)
            out = self._drain_pending()
        else:
            self._drain_pending()  # may recover state via reloc
            if self.state == OK:
                # Just recovered: track this frame synchronously.
                self._predict_motion(ts)
                R_pred = self.vel_R @ self.R_cur
                t_pred = self.vel_R @ self.t_cur + self.vel_t
                feats, res = self._fused_track(
                    jnp.asarray(img, jnp.float32), self._tmap(),
                    jnp.asarray(R_pred), jnp.asarray(t_pred),
                    jnp.asarray(self.n_kf), schedule=self._sched_dense,
                )
                out = self._track_post(feats, res, ts)
            else:
                feats = self._extract(jnp.asarray(img, jnp.float32))
                jax.block_until_ready(feats.xy)
                t0 = self._tic("extract", t0)
                if self.state == NOT_INITIALIZED:
                    out = self._try_initialize(feats, ts)
                else:
                    out = self._try_relocalize(feats, ts)
        self._pending = dispatched
        self._tic("frame", t0)
        self.frame_id += 1
        return out

    # ------------------------------------------------------------------
    # Device-resident chunked frame loop (see models/device_loop.py):
    # the steady-state OK path processes `chunk` frames per dispatch with
    # ONE result fetch, hiding the TPU-link round trip that bounds the
    # per-frame host loop. Falls back to process_frame for every
    # non-steady situation (init, loss, reloc, loop closing, Atlas,
    # capacity, timestamp jumps).
    def _chunk_runner(self):
        r = getattr(self, "_chunk_run", None)
        if r is None:
            from . import device_loop

            r = device_loop.make_chunk_runner(
                self.config, self.cam_params,
                width=self.width, height=self.height,
                kf_every=self.kf_every, kf_min_inliers=self.kf_min_inliers,
                kf_ref_ratio=self.kf_ref_ratio,
                ba_window=self.ba_window, ba_fixed=self.ba_fixed,
                local_ba_iters=self.local_ba_iters,
                fuse_neighbors=self.fuse_neighbors,
                fuse_every=self.fuse_every, stats_every=self.stats_every,
                cull_every=self.cull_every, kf_culling=self.kf_culling,
                schedule=self._sched_lean, K_cap=self.K_cap,
                track_cap=self.track_cap, cam_model=self.cam_model,
                bf=float(self.bf),
                baseline=float(getattr(self, "baseline", 0.0)),
                max_depth=float(getattr(self, "max_depth", 0.0)),
                stereo=self._chunk_stereo(),
                track_window=self.track_window,
            )
            self._chunk_run = r
        return r

    def _chunk_stereo(self) -> bool:
        """Whether the chunk loop processes [2,H,W] stereo pairs.
        StereoSlam overrides (RGB-D stays per-frame: its depth maps are
        float and don't ride the uint8 frame stack)."""
        return False

    def _chunkable(self) -> bool:
        # A LoopCloser/Atlas no longer blocks chunking: closure detection
        # and archived-map merging run at CHUNK BOUNDARIES on the
        # keyframes the chunk inserted (_drain_chunk), the way the
        # reference's loop thread consumes a keyframe queue without ever
        # blocking tracking (LoopClosing.cc:1108).
        return (
            self.state == OK
            and self.covis_ba
            # An in-flight chunked GBA does NOT block chunking: the solve
            # runs on a snapshot, keyframes the chunks insert meanwhile
            # fold in via apply_global_ba_partial's relative-pose
            # propagation (exactly the reference's GBA-vs-tracking
            # concurrency, LoopClosing.cc:3660-3780); chunks poll the
            # solve at their boundaries.
            # track_window no longer blocks chunking: the chunk step
            # derives the sliding-window point mask on device.
            and self.track_dev is None  # chunk fuses track+map: no 2-chip split
            # Mono KF bodies build bf=0 BA rows; the stereo chunk builds
            # (u,v,u_r) rows and lifts the restriction.
            and (self.bf == 0.0 or self._chunk_stereo())
            and type(self)._run_local_ba is MonoSlam._run_local_ba
            # Match the per-frame path's dense warm-up on a young map.
            and self.n_kf >= max(2, self.lean_after_kf)
        )

    def process_frames(self, imgs, tss) -> None:
        """Track a batch of frames through the device-resident loop
        (poses appear in the trajectory after the NEXT call or flush —
        chunk results are prefetched one chunk behind). Falls back to
        per-frame processing whenever the chunked fast path does not
        apply.

        ``imgs`` may be a list of host frames, an already-uploaded
        [C,H,W] device stack, or ``(stack [N,H,W], offset)`` — a window
        into a preloaded device-resident sequence (fastest: the chunk is
        sliced on device, nothing crosses the host link but one packed
        scalar vector each way)."""
        import numpy as _np

        self._drain_chunk()
        self._poll_gba()  # advance an in-flight global BA between chunks
        if isinstance(imgs, tuple):
            fallback_imgs = _ChunkReplayView(imgs[0], int(imgs[1]))
        else:
            fallback_imgs = imgs
        # Settle the single-frame pipeline's lag-1 result BEFORE the
        # chunk gate: the drain can change state (loss, reloc, keyframe)
        # and the gate must see the post-drain state. (Do NOT
        # force-drain an in-flight GBA — chunks coexist with it.)
        self._drain_pending()
        if not self._chunkable():
            for i, ts in enumerate(tss):
                self._fallback_frame(fallback_imgs[i], float(ts))
            return
        self._apply_kf_async(force=True)
        # Worst-case keyframe density inside a chunk is one every 2 frames
        # (the weak-tracking branch of need_kf), not 1/kf_every — reserve
        # for that so the in-chunk K_cap guard can never silently drop
        # keyframes mid-chunk.
        if (not self.localization_only
                and self.n_kf >= self.K_cap - 1 - (len(tss) + 1) // 2):
            self._make_room()
        tss = _np.asarray(tss, _np.float64)
        last = getattr(self, "_last_frame_ts", None)
        gaps = _np.diff(_np.concatenate([[last if last is not None else tss[0]], tss]))
        if _np.any(gaps > self.ts_jump_threshold):
            for i, ts in enumerate(tss):
                self._fallback_frame(fallback_imgs[i], float(ts))
            return
        self._last_frame_ts = float(tss[-1])
        if isinstance(imgs, tuple):
            # (device-resident stack [N,H,W], offset): the fastest path —
            # a dataset window preloaded in one bulk transfer (the replay
            # equivalent of the reference reading RAM-cached images). The
            # whole chunk input (carry scalars + timestamps) ships as ONE
            # packed f32 vector and frames are sliced on device: over
            # the TPU tunnel every separate transfer leaf costs a ~20 ms
            # round trip, which otherwise dominates the 11 ms/frame
            # chunk compute.
            stack, off = imgs
            C = len(tss)
            # Localization-only: push last_kf_fid far past the chunk's
            # frame ids so `since = fid - last_kf_fid` is hugely negative
            # and no in-chunk need_kf branch can fire — the frozen-map
            # mode rides the SAME compiled chunk program (no recompile).
            lkf = (self.frame_id + (1 << 22) if self.localization_only
                   else self.last_kf_frame)
            pk = _np.concatenate([
                self.R_cur.reshape(-1), self.t_cur.reshape(-1),
                self.vel_R.reshape(-1), self.vel_t.reshape(-1),
                # ref_inl -1: the thRefRatio bar reseeds from the
                # chunk's first frame (same decision as the VI pack —
                # the carried bar ratchets high and densifies keyframes
                # into weak-parallax windows; measured destabilizing).
                _np.asarray([self.n_kf, self.n_pts, lkf,
                             1.0, -1,
                             self.frame_id, off], _np.float32),
                _np.asarray(tss, _np.float32),
            ]).astype(_np.float32)
            self.map, packed = self._chunk_runner().packed(
                self.map, stack, jnp.asarray(pk), chunk=C,
            )
            replay_imgs = fallback_imgs
        else:
            from .device_loop import LoopCarry

            carry = LoopCarry(
                m=self.map,
                R=jnp.asarray(self.R_cur), t=jnp.asarray(self.t_cur),
                vel_R=jnp.asarray(self.vel_R), vel_t=jnp.asarray(self.vel_t),
                n_kf=jnp.asarray(self.n_kf, jnp.int32),
                n_pts=jnp.asarray(self.n_pts, jnp.int32),
                last_kf_fid=jnp.asarray(
                    self.frame_id + (1 << 22) if self.localization_only
                    else self.last_kf_frame, jnp.int32),
                alive=jnp.asarray(True),
                # reseed from the chunk's first frame (see packed path)
                ref_inl=jnp.full((), -1, jnp.int32),
            )
            fids = jnp.arange(len(tss), dtype=jnp.int32) + self.frame_id
            if isinstance(imgs, jnp.ndarray):
                imgs_dev = imgs
            else:
                imgs_dev = jnp.asarray(
                    _np.clip(_np.stack(imgs), 0, 255).astype(_np.uint8)
                    if self.transfer_uint8 else
                    _np.stack(imgs).astype(_np.float32)
                )
            carry2, outs = self._chunk_runner()(
                carry, imgs_dev, jnp.asarray(tss, jnp.float32), fids,
            )
            self.map = carry2.m
            # ONE packed f32 fetch: over the TPU tunnel a device_get
            # costs a round trip per array leaf, so fetching the raw
            # pytree (~17 leaves) costs ~5x the chunk's compute.
            from .device_loop import pack_chunk_result

            packed = pack_chunk_result(outs, carry2)
            replay_imgs = imgs
        self._chunk_pending = {
            "fut": self._io.submit(jax.device_get, packed),
            "tss": tss, "imgs": replay_imgs, "fid0": self.frame_id,
        }
        self.frame_id += len(tss)

    def _drain_chunk(self):
        """Absorb the previous chunk's (prefetched) results into host
        bookkeeping: trajectory logs, counters, state transitions."""
        p = getattr(self, "_chunk_pending", None)
        if p is None:
            return
        self._chunk_pending = None
        from .device_loop import unpack_chunk_result

        outs, sc = unpack_chunk_result(p["fut"].result(), len(p["tss"]))
        self.n_kf = sc["n_kf"]
        self._n_pts = sc["n_pts"]
        if not self.localization_only:  # else: sentinel, not a real fid
            self.last_kf_frame = sc["last_kf_fid"]
        self._ref_kf_inl = max(0, sc["ref_inl"])
        self.R_cur = np.asarray(sc["R"])
        self.t_cur = np.asarray(sc["t"])
        self.vel_R = np.asarray(sc["vel_R"])
        self.vel_t = np.asarray(sc["vel_t"])
        alive = sc["alive"]
        self._ref_cache = None
        n_dead = 0
        for i in range(len(p["tss"])):
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
            if self.on_frame is not None:
                # outs.ref is the reference KF slot AFTER this frame's
                # keyframe decision (= n_kf-1 at that frame), so per-frame
                # counters/ids are exact even mid-chunk.
                self.on_frame(dict(
                    event="frame", ts=ts, Twc=T,
                    n_inliers=int(outs["n_inliers"][i]), state=OK,
                    n_kf=int(outs["ref"][i]) + 1,
                ))
                if bool(outs["is_kf"][i]):
                    self.on_frame(dict(
                        event="keyframe", ts=ts, kf_id=int(outs["ref"][i])
                    ))
        if self.on_frame is not None and len(p["tss"]):
            self._maybe_publish_points(float(p["tss"][-1]))
        # Loop closing / Atlas merging over the chunk's new keyframes —
        # the boundary-interleaved shape of the reference's asynchronous
        # loop thread (it consumes KFs from a queue; here the "queue" is
        # the chunk's is_kf list).
        new_kf_slots = [
            int(outs["ref"][i]) for i in range(len(p["tss"]))
            if bool(outs["is_kf"][i]) and bool(outs["alive"][i])
        ]
        if self.loop_closer is not None and new_kf_slots:
            self.key, sub = jax.random.split(self.key)
            self.loop_closer.try_close_batch(self, new_kf_slots, sub)
        if self.atlas is not None and self.atlas.maps:
            for kf_id in new_kf_slots:
                if kf_id % 4 == 0:
                    self.key, sub = jax.random.split(self.key)
                    self._freeze_rel_traj()
                    self.atlas.merge_current_into(self, 0, sub)
                    break
        if not bool(alive):
            # Tracking failed at some frame: mark LOST and replay the
            # dead tail through the single-frame path (relocalization,
            # Atlas policies live there).
            self.state = LOST
            k = len(p["tss"]) - n_dead
            saved = self.frame_id
            self.frame_id = p["fid0"] + k
            try:
                for i in range(k, len(p["tss"])):
                    self._fallback_frame(p["imgs"][i], float(p["tss"][i]))
            finally:
                self.frame_id = max(saved, self.frame_id)

    def _drain_pending(self):
        """Process the previous frame's (already host-bound) result."""
        self._apply_kf_async()
        self._poll_gba()
        self._poll_replica()
        if self._pending is None:
            return None
        p, self._pending = self._pending, None
        if self.state != OK:
            # State changed since this frame was dispatched (shouldn't
            # happen: dispatch only occurs in OK) — route to recovery.
            if self.state == LOST:
                return self._try_relocalize(p["feats"], p["ts"])
            return None
        saved = self.frame_id
        self.frame_id = p["idx"]  # KF cadence decisions use frame index
        try:
            out = self._track_post(
                p["feats"], p["res"], p["ts"], fetched=p.get("fut")
            )
        finally:
            self.frame_id = saved
        return out

    def flush(self):
        """Drain the in-flight frame, deferred keyframe results, any
        in-flight chunk, and any in-flight global BA (end of sequence /
        before bulk map reads)."""
        self._drain_chunk()
        out = self._drain_pending()
        self._apply_kf_async(force=True)
        while self._gba is not None:
            self._poll_gba(force=True)
        return out

    # ------------------------------------------------------------------
    # Chunked, abortable global BA (the reference's background GBA thread
    # + mbStopGBA flag, LoopClosing.cc:3609-3780). Each chunk is a short
    # bundle_adjust_pcg dispatch; per-frame tracking programs interleave
    # with chunks on the device queue, so the frame loop never waits a
    # full GBA. A keyframe arriving mid-solve calls abort_gba(): no
    # further chunks are issued and the partial result is applied with
    # relative-pose propagation for everything created during the solve.
    def _start_async_gba(self, n_iters: int, n_cg: int = 50, chunk: int = 2):
        from . import local_mapping as lm

        if self._gba is not None:
            self._poll_gba(force=True)  # fold in the previous solve first
        prob = lm.build_global_ba(
            self.map, jnp.asarray(self.n_kf), self.cam_params,
            bf=jnp.asarray(self.bf, jnp.float32),
        )
        self._gba = dict(
            prob=prob, done=0, target=n_iters, chunk=chunk, n_cg=n_cg,
            n_kf0=self.n_kf, res=None, abort=False,
            # Snapshot of the observation table: the solve classifies
            # inliers against THESE bindings, so only rows still bound the
            # same way may be cleared when the partial result folds in.
            obs0=self.map.kf_obs,
        )
        self._dispatch_gba_chunk()

    def abort_gba(self):
        """Stop issuing further GBA chunks (mbStopGBA); the chunk already
        on the device still completes and its result is folded in."""
        if self._gba is not None:
            self._gba["abort"] = True

    def _dispatch_gba_chunk(self):
        from ..ops import ba_pcg

        g = self._gba
        it = min(g["chunk"], g["target"] - g["done"])
        res = ba_pcg.bundle_adjust_pcg(
            g["prob"], n_iters=it, n_cg=g["n_cg"], cam_model=self.cam_model
        )
        g["prob"] = g["prob"]._replace(R=res.R, t=res.t, X=res.X)
        g["res"] = res
        g["done"] += it
        # Pacing signal only: a scalar fetch on the IO thread resolves
        # when the chunk has executed (the big arrays stay on device).
        g["fut"] = self._io.submit(jax.device_get, res.cost)

    def _poll_gba(self, force: bool = False):
        if self._gba is None:
            return
        g = self._gba
        if not force and not g["fut"].done():
            return
        if g["abort"] or g["done"] >= g["target"]:
            self._finish_gba()
        else:
            self._dispatch_gba_chunk()

    def _finish_gba(self):
        from . import local_mapping as lm

        g, self._gba = self._gba, None
        self.map = lm.apply_global_ba_partial(
            self.map, g["res"], jnp.asarray(g["n_kf0"], jnp.int32),
            kf_obs0=g["obs0"],
        )
        self.map = map_updates.refresh_point_stats(
            self.map, n_levels=self.config.n_levels
        )
        self._ref_cache = None
        self._sync_replica()

    def _predict_motion(self, ts):
        """Hook: update vel_R/vel_t before tracking (constant-velocity by
        default; the inertial pipeline overrides with IMU prediction)."""

    # ------------------------------------------------------------------
    # Localization-only mode (System::ActivateLocalizationMode /
    # DeactivateLocalizationMode, System.cc:399-437, and the
    # mbOnlyTracking branch of Tracking::Track, Tracking.cc:1999-2124):
    # track — at full chunked throughput — against a frozen map. The
    # natural consumer of a loaded checkpoint (multi-session replay).
    def activate_localization_mode(self):
        """Freeze the map: flush pending keyframe/GBA work (the
        reference waits for LocalMapping::Stop), then disable keyframe
        insertion on both the host and in-chunk paths. Relocalization
        after loss stays active (tracking-only reloc, Tracking.cc:2034)."""
        self.flush()
        self.localization_only = True

    def deactivate_localization_mode(self):
        """Resume full SLAM (LocalMapping 'Release'): keyframe cadence
        re-arms from the current frame."""
        self.localization_only = False
        self.last_kf_frame = self.frame_id
        self._ref_kf_inl = 0

    def _try_relocalize(self, feats, ts):
        """Relocalization after tracking loss (role of
        ``Tracking::Relocalization``, Tracking.cc:3648: BoW candidates ->
        PnP RANSAC (MLPnPsolver) -> guided matching + pose optimization).
        Here: retrieval candidates, descriptor matches against the
        candidate keyframe's bound landmarks feed a batched PnP RANSAC
        whose pose seeds the coarse-to-fine projection tracker; if PnP
        finds no support the candidate's own pose is the fallback seed."""
        from ..ops import retrieval

        self._apply_kf_async(force=True)
        if self.n_kf < 2:
            return None
        feats = self._to_map_dev(feats)
        # Covisibility-boosted candidate ranking — the contract of
        # KeyFrameDatabase::DetectRelocalizationCandidates
        # (KeyFrameDatabase.cc:733-856) — as ONE fused dispatch + fetch.
        vocab = (self.vocab if self.vocab is not None
                 else jnp.asarray(retrieval.ANCHORS))
        cand_ids = np.asarray(jax.device_get(_reloc_detect_fused(
            self.map, feats.desc_sign, feats.valid, vocab
        )))
        for c in cand_ids:
            if c < 0:
                continue
            # Whole attempt (match -> PnP seed -> projection tracking)
            # as ONE dispatch + ONE 13-float fetch.
            self.key, sub = jax.random.split(self.key)
            buf = np.asarray(jax.device_get(_reloc_attempt_fused(
                self.map, jnp.asarray(int(c)), feats, sub,
                self.cam_params, self.width, self.height,
                cam_model=self.cam_model,
            )))
            R_new, t_new, n_inl = buf[:9].reshape(3, 3), buf[9:12], buf[12]
            if int(n_inl) >= 30:
                self.R_cur = np.asarray(R_new, np.float32)
                self.t_cur = np.asarray(t_new, np.float32)
                self.vel_R = np.eye(3, dtype=np.float32)
                self.vel_t = np.zeros(3, np.float32)
                self.state = OK
                self.lost_count = 0
                self._log_pose(ts)
                return self._pose_mat()
        # Atlas: try to continue in an archived map (re-encounter), else
        # after enough failed frames archive this map and start fresh
        # (Tracking::CreateMapInAtlas decision, Tracking.cc:2050-2068).
        if self.atlas is not None:
            self._freeze_rel_traj()
            if self.atlas.try_relocalize_in_archived(self, feats):
                self.lost_count = 0
                self._log_pose(ts)
                return self._pose_mat()
            self.lost_count += 1
            if self.lost_count >= self.lost_patience:
                self.atlas.archive_current(self)
                self.lost_count = 0
        return None

    # ------------------------------------------------------------------
    def _try_initialize(self, feats, ts):
        if self.init_feats is None:
            if int(jax.device_get(feats.valid.sum())) > 100:
                self.init_feats = feats
                self.init_ts = ts
            return None
        idx, dist = matching.search_for_initialization(
            self.init_feats, feats, window=100.0
        )
        idx = np.asarray(idx)
        matched = idx >= 0
        if matched.sum() < 60:
            # Too few matches: make this frame the new reference
            # (reference resets mpInitializer likewise, Tracking.cc:2512).
            self.init_feats = feats
            self.init_ts = ts
            return None
        xy1 = np.asarray(self.init_feats.xy)
        xy2 = np.asarray(feats.xy)[np.clip(idx, 0, None)]
        self.key, sub = jax.random.split(self.key)
        init_cam = self.cam_params
        if self.cam_model == "kb8":
            # Fisheye init: H/F RANSAC runs on fx-scaled BEARINGS (a
            # centered virtual pinhole) — the pixel-space epipolar
            # geometry of a fisheye image is not linear. Thresholds keep
            # their pixel meaning near the image center.
            fx = float(np.asarray(self.cam_params)[0])
            b1 = cameras.kb8_unproject(self.cam_params, jnp.asarray(xy1))
            b2 = cameras.kb8_unproject(self.cam_params, jnp.asarray(xy2))
            xy1 = np.asarray(b1[:, :2]) * fx
            xy2 = np.asarray(b2[:, :2]) * fx
            init_cam = jnp.asarray(
                [fx, fx, 0.0, 0.0, 0, 0, 0, 0, 0], jnp.float32
            )
        res = ransac.two_view_init(
            jnp.asarray(xy1), jnp.asarray(xy2), jnp.asarray(matched),
            init_cam, sub,
        )
        if not bool(res.ok) or int(res.n_good) < 50:
            # Degenerate-pair guard: a reference frame staring at a
            # planar/low-parallax view can keep >=60 matches against
            # every later frame while H/F reconstruction keeps failing —
            # the initializer would stay stuck on it forever. After 3
            # consecutive reconstruction failures the CURRENT frame
            # becomes the new reference (the reference implementation
            # only rotates on low match count, Tracking.cc:2512, and can
            # stall the same way on such views).
            self._init_fail_count = getattr(self, "_init_fail_count", 0) + 1
            if self._init_fail_count >= 3:
                self.init_feats = feats
                self.init_ts = ts
                self._init_fail_count = 0
            return None
        self._init_fail_count = 0
        self._create_initial_map(feats, ts, idx, res)
        self.state = OK
        self._warm_schedules()
        self._log_pose(ts)
        return self._pose_mat()

    def _pose_mat(self):
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = self.R_cur.T
        T[:3, 3] = -self.R_cur.T @ self.t_cur
        return T

    def _create_initial_map(self, feats, ts, idx, res):
        """Two keyframes + triangulated points, scale-normalized to median
        depth 1 (Tracking::CreateInitialMapMonocular, Tracking.cc:2562-2700),
        then full BA over the initial map."""
        good = np.asarray(res.good)
        X1 = np.asarray(res.X1)  # points in cam-1 (first KF) frame
        depths = X1[good][:, 2]
        med = float(np.median(depths))
        s = 1.0 / max(med, 1e-6)
        X1 = X1 * s
        R21 = np.asarray(res.R21)
        t21 = np.asarray(res.t21) * s

        m = self.map
        f1, f2 = self._to_map_dev((self.init_feats, feats))
        n_new = int(good.sum())
        pts_ids = np.arange(n_new, dtype=np.int32)
        src_feat1 = np.where(good)[0].astype(np.int32)  # feature idx in KF0
        src_feat2 = np.asarray(idx)[src_feat1].astype(np.int32)

        # KF0 at identity (world = first camera frame), KF1 at (R21, t21).
        kf_xy = np.asarray(m.kf_xy)
        obs0 = np.full((self.N,), -1, np.int32)
        obs1 = np.full((self.N,), -1, np.int32)
        obs0[src_feat1] = pts_ids
        obs1[src_feat2] = pts_ids

        upd = {
            "kf_valid": m.kf_valid.at[0].set(True).at[1].set(True),
            "kf_R": m.kf_R.at[1].set(jnp.asarray(R21)),
            "kf_t": m.kf_t.at[1].set(jnp.asarray(t21)),
            "kf_xy": m.kf_xy.at[0].set(f1.xy).at[1].set(f2.xy),
            "kf_level": m.kf_level.at[0].set(f1.level).at[1].set(f2.level),
            "kf_angle": m.kf_angle.at[0].set(f1.angle).at[1].set(f2.angle),
            "kf_desc_sign": m.kf_desc_sign.at[0].set(f1.desc_sign).at[1].set(f2.desc_sign),
            "kf_feat_valid": m.kf_feat_valid.at[0].set(f1.valid).at[1].set(f2.valid),
            "kf_obs": m.kf_obs.at[0].set(jnp.asarray(obs0)).at[1].set(jnp.asarray(obs1)),
            "kf_ts": m.kf_ts.at[0].set(self.init_ts).at[1].set(ts),
            "pt_valid": m.pt_valid.at[pts_ids].set(True),
            "pt_X": m.pt_X.at[pts_ids].set(jnp.asarray(X1[good])),
            "pt_desc_sign": m.pt_desc_sign.at[pts_ids].set(f1.desc_sign[jnp.asarray(src_feat1)]),
            "pt_level": m.pt_level.at[pts_ids].set(f1.level[jnp.asarray(src_feat1)]),
            "pt_first_kf": m.pt_first_kf.at[pts_ids].set(0),
        }
        self.map = m._replace(**upd)
        self.n_kf = 2
        self.n_pts = n_new
        self.last_kf_frame = self.frame_id

        # Full BA on the initial map (GlobalBundleAdjustemnt(20), ref
        # Tracking.cc:2587) — KF0 fixed, scale anchored by unit-ish t21
        # staying free (gauge handled by KF0 + re-normalization below).
        self._run_local_ba(n_iters=20)
        self.map = map_updates.refresh_point_stats(
            self.map, n_levels=self.config.n_levels
        )

        self.R_cur, self.t_cur = (
            np.asarray(a)
            for a in jax.device_get((self.map.kf_R[1], self.map.kf_t[1]))
        )
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)
        self._set_ref_cache(1, self.R_cur, self.t_cur)
        self._sync_replica()

    # ------------------------------------------------------------------
    def _track(self, feats, ts):
        """Non-fused tracking (used by pipelines that pre-compute feats,
        e.g. stereo)."""
        R_pred = self.vel_R @ self.R_cur
        t_pred = self.vel_R @ self.t_cur + self.vel_t
        tm = self._tmap()
        pt_mask = None
        if self.track_window is not None:
            pt_mask = tm.pt_first_kf >= (self.n_kf - self.track_window)
        res = tracking.track_against_map(
            tm, feats, jnp.asarray(R_pred), jnp.asarray(t_pred),
            self.cam_params, self.width, self.height, pt_mask=pt_mask,
            schedule=self._current_schedule(), cam_model=self.cam_model,
        )
        return self._track_post(feats, res, ts)

    def _track_post(self, feats, res, ts, fetched=None):
        # One host sync per frame: pose + inlier count together
        # (prefetched on the IO thread in pipelined mode).
        if fetched is not None:
            n_inl, R_new, t_new = fetched.result()
        else:
            n_inl, R_new, t_new = jax.device_get((res.n_inliers, res.R, res.t))
        n_inl = int(n_inl)
        if n_inl < 15:
            self.state = LOST
            return None
        R_new = np.asarray(R_new)
        t_new = np.asarray(t_new)
        # Motion model update: vel = T_new * T_old^-1.
        self.vel_R = R_new @ self.R_cur.T
        self.vel_t = t_new - self.vel_R @ self.t_cur
        self.R_cur, self.t_cur = R_new, t_new
        # Found/visible counters (single fused dispatch).
        vis, fnd = self._to_map_dev((res.visible_mask, res.found_mask))
        self.map = map_updates.update_track_counters(self.map, vis, fnd)
        self._log_pose(ts)
        if self.on_frame is not None:
            self.on_frame(dict(
                event="frame", ts=ts, Twc=self._pose_mat(),
                n_inliers=n_inl, state=self.state, n_kf=self.n_kf,
            ))
            self._maybe_publish_points(ts, found_mask=res.found_mask)

        if self._need_keyframe(n_inl):
            self._ref_kf_inl = n_inl
            self._insert_keyframe(feats, ts, res)
        return self._pose_mat()

    def _maybe_publish_points(self, ts, found_mask=None):
        """Point-cloud / keyframe-marker observability events at the
        ``points_every`` cadence — the headless shape of the reference's
        tracked-points / all-points / kf_markers publishers
        (src/common.cc:273-369). Emits through ``on_frame``:
          tracked_points: world positions of landmarks tracked this frame
          map_points:     all live landmark positions
          kf_markers:     camera centers of all live keyframes
        """
        if self.on_frame is None or self.points_every <= 0:
            return
        if self.frame_id - self._last_points_pub < self.points_every:
            return
        self._last_points_pub = self.frame_id
        m = self.map
        fetch = [m.pt_X, m.pt_valid, m.kf_R, m.kf_t, m.kf_valid]
        if found_mask is not None:
            fetch.append(found_mask)
        got = jax.device_get(tuple(fetch))
        X, pv, kR, kt, kv = got[:5]
        X, pv = np.asarray(X), np.asarray(pv)
        self.on_frame(dict(
            event="map_points", ts=ts, n=int(pv.sum()),
            points=X[pv].astype(np.float32),
        ))
        kv = np.asarray(kv).copy()
        kv[self.n_kf:] = False
        centers = -np.einsum("kji,kj->ki", np.asarray(kR)[kv], np.asarray(kt)[kv])
        self.on_frame(dict(
            event="kf_markers", ts=ts, n=int(kv.sum()),
            centers=centers.astype(np.float32),
        ))
        if found_mask is not None:
            fm = np.asarray(got[5]) & pv
            self.on_frame(dict(
                event="tracked_points", ts=ts, n=int(fm.sum()),
                points=X[fm].astype(np.float32),
            ))

    def _need_keyframe(self, n_inl):
        """Simplified NeedNewKeyFrame (Tracking.cc:3103): periodic + weak
        tracking; at capacity, culled slots are recycled by compaction so
        K_cap bounds the LIVE keyframe set, not the sequence length."""
        if self.localization_only:
            # mbOnlyTracking: never insert (Tracking.cc:3105 returns
            # false immediately) — and never force-cull a frozen map.
            return False
        if self.n_kf >= self.K_cap and not self._make_room():
            return False
        since = self.frame_id - self.last_kf_frame
        # mnMatchesInliers>15 guard (Tracking.cc c2): never insert from a
        # nearly-lost pose — an unreliable keyframe poisons the map.
        if n_inl <= 15:
            return False
        weak = n_inl < self.kf_min_inliers or (
            # thRefRatio densification (NeedNewKeyFrame's c2 ratio,
            # Tracking.cc:3103): tracked support sagged relative to the
            # reference keyframe — insert before tracking limps to loss.
            self.kf_ref_ratio > 0.0
            and self._ref_kf_inl > 0
            and n_inl < self.kf_ref_ratio * self._ref_kf_inl
        )
        return since >= self.kf_every or (weak and since >= 2)

    def _make_room(self) -> bool:
        """Recycle culled keyframe slots (compaction); if the live map
        genuinely fills capacity, force-cull the most redundant keyframe
        at a relaxed redundancy bar first. Returns True if a slot is
        free. Failed attempts back off for 10 frames (each attempt costs
        a device fetch)."""
        if self.frame_id - getattr(self, "_cap_retry_frame", -999) < 10:
            return False
        self._apply_kf_async(force=True)
        self._drain_pending()
        # Compaction remaps slots — fold in any in-flight GBA first (its
        # snapshot indexes the current layout).
        while self._gba is not None:
            self._poll_gba(force=True)
        n_valid = int(jax.device_get(jnp.sum(self.map.kf_valid)))
        if n_valid >= self.K_cap:
            self.map, n_c = map_updates.cull_keyframes(
                self.map, jnp.asarray(self.n_kf), redundancy=0.5,
                n_levels=self.config.n_levels,
            )
            if int(jax.device_get(n_c)) == 0:
                # Nothing redundant: evict the keyframe least covisible
                # with the recent window rather than stalling mapping
                # (sliding-window degradation over old territory).
                self.map, n_c = map_updates.evict_one_keyframe(
                    self.map, jnp.asarray(self.n_kf)
                )
                if int(jax.device_get(n_c)) == 0:
                    self._cap_retry_frame = self.frame_id
                    return False
        self._compact_kf_slots()
        ok = self.n_kf < self.K_cap
        if not ok:
            self._cap_retry_frame = self.frame_id
        return ok

    def _compact_kf_slots(self):
        """Squeeze culled keyframe holes out of the map arrays and remap
        every host-side slot reference (relative trajectory, loop edges,
        subclass hooks)."""
        valid = np.asarray(jax.device_get(self.map.kf_valid))
        kf_R = np.asarray(jax.device_get(self.map.kf_R))
        kf_t = np.asarray(jax.device_get(self.map.kf_t))
        m2, n_valid, order = map_updates.compact_keyframes(self.map)
        order = np.asarray(jax.device_get(order))
        n_valid = int(jax.device_get(n_valid))
        new_of_old = np.full((self.K_cap,), -1, np.int32)
        new_of_old[order[:n_valid]] = np.arange(n_valid, dtype=np.int32)
        # Relative-trajectory log: remap surviving references; entries
        # whose reference keyframe was culled freeze at its final pose.
        new_rel = []
        for ts, ref, R_cr, t_cr in self.rel_traj:
            if 0 <= ref < self.K_cap and valid[ref]:
                new_rel.append((ts, int(new_of_old[ref]), R_cr, t_cr))
            else:
                Rcw = R_cr @ kf_R[ref]
                tcw = R_cr @ kf_t[ref] + t_cr
                T = np.eye(4, dtype=np.float32)
                T[:3, :3] = Rcw.T
                T[:3, 3] = -Rcw.T @ tcw
                self.frozen_traj.append((ts, T))
        self.rel_traj = new_rel
        self.map = m2
        self.n_kf = n_valid
        self._ref_cache = None
        self._sync_replica()
        if self.loop_closer is not None:
            self.loop_closer.remap_slots(new_of_old)
        self._compact_hook(order, new_of_old, n_valid)

    def _compact_hook(self, order, new_of_old, n_valid):
        """Subclass hook: reindex per-slot host state after compaction
        (the inertial pipeline reorders/merges IMU blocks here)."""

    def _insert_keyframe(self, feats, ts, track_res):
        self._apply_kf_async(force=True)
        # A new keyframe stops the in-flight global BA after its current
        # chunk. The reference's mbStopGBA is a closure-only signal
        # (LoopClosing.cc:2512) and ADVICE r4 asked for that semantics —
        # it was implemented and MEASURED WORSE: our chunked GBA solves a
        # SNAPSHOT, so every keyframe inserted while it runs rides
        # relative-pose propagation at fold-in; letting the solve span
        # many insertions folds a stale correction under a much-moved
        # map (vi+lc bench: post-closure tracking loss, 16.4 -> 6.7 fps;
        # soak: drift-correcting closures 2 -> 1). Bounding staleness at
        # one insertion is the stable point of THIS architecture.
        self.abort_gba()
        kf_id = self.n_kf
        if self.on_frame is not None:
            self.on_frame(dict(event="keyframe", ts=ts, kf_id=kf_id))
        feats, feat_pt = self._to_map_dev((feats, track_res.feat_pt))
        do_fuse = (
            self.fuse_neighbors > 0 and kf_id >= 2
            and kf_id % self.fuse_every == 0
        )
        do_stats = kf_id % self.stats_every == 0
        do_cull = (
            self.kf_culling and kf_id >= 4 and kf_id % self.cull_every == 0
        )
        # Fused path: the whole LocalMapping iteration as ONE device
        # program (kf_work.keyframe_work) — a single tunnel dispatch per
        # keyframe. Only valid when this class uses the base covisibility
        # local BA; pipelines with their own BA flavor (VI-BA, stereo
        # subclass hooks) take the step-by-step path below.
        fused = (
            self.covis_ba
            and kf_id >= 2
            and type(self)._run_local_ba is MonoSlam._run_local_ba
        )
        if fused:
            from . import kf_work

            self.map, n_new = kf_work.keyframe_work(
                self.map, jnp.asarray(kf_id), jnp.asarray(self.R_cur),
                jnp.asarray(self.t_cur), jnp.asarray(ts, jnp.float32),
                feats, feat_pt, jnp.asarray(self.n_pts),
                jnp.asarray(self.P_cap - self.n_pts), self.cam_params,
                jnp.asarray(self.bf, jnp.float32),
                w_free=self.ba_window, w_fixed=self.ba_fixed,
                n_iters=self.local_ba_iters, row_n=self.N,
                n_levels=self.config.n_levels,
                fuse_neighbors=self.fuse_neighbors,
                do_fuse=do_fuse, do_stats=do_stats, do_cull=do_cull,
                width=self.width, height=self.height,
            )
            self.n_kf += 1
            self.last_kf_frame = self.frame_id
        else:
            self.map = map_updates.insert_keyframe(
                self.map, jnp.asarray(kf_id), jnp.asarray(self.R_cur),
                jnp.asarray(self.t_cur), jnp.asarray(ts, jnp.float32),
                feats, feat_pt,
            )
            self.n_kf += 1
            self.last_kf_frame = self.frame_id

            # Triangulate new points against the previous keyframe and
            # admit them into free slots, all on device.
            tri = tracking.triangulate_with_ref(
                self.map, jnp.asarray(kf_id), jnp.asarray(kf_id - 1),
                self.cam_params, cam_model=self.cam_model,
            )
            self.map, n_new = map_updates.admit_new_points(
                self.map, jnp.asarray(kf_id), jnp.asarray(kf_id - 1), tri,
                jnp.asarray(self.n_pts), jnp.asarray(self.P_cap - self.n_pts),
            )
            if do_fuse:
                self.map, _ = map_updates.fuse_in_neighbors(
                    self.map, jnp.asarray(kf_id), self.cam_params,
                    self.width, self.height, n_neighbors=self.fuse_neighbors,
                    cam_model=self.cam_model,
                )
            self._run_local_ba(n_iters=self.local_ba_iters)
            self.map = map_updates.cull_points(self.map, jnp.asarray(self.n_kf))
            if do_stats:
                self.map = map_updates.refresh_point_stats(
                    self.map, n_levels=self.config.n_levels
                )
            if do_cull:
                self.map, _ = map_updates.cull_keyframes(
                    self.map, jnp.asarray(self.n_kf),
                    n_levels=self.config.n_levels,
                )
        if (
            self.pipelined
            and self.atlas is None
        ):
            # Fully async keyframe work: nothing here blocks on the
            # device (the reference's LocalMapping thread likewise never
            # stalls Tracking, LocalMapping.cc:64). The admitted-point
            # count and the BA-refined pose are fetched at a later drain
            # once the copies have landed; until then the tracked
            # (pre-BA) pose serves as the provisional ref-cache entry.
            # A LoopCloser defers too: the closure attempt runs when the
            # keyframe result drains (_apply_kf_async), exactly the
            # reference's KF-queue handoff to the loop thread.
            handles = (n_new, self.map.kf_R[kf_id], self.map.kf_t[kf_id])
            self._kf_async = (kf_id, self._io.submit(jax.device_get, handles))
            self._set_ref_cache(kf_id, self.R_cur, self.t_cur)
            self._start_replica_copy()
            return
        # One sync: admitted count + BA-refined pose, PACKED into a
        # single fetch (per-leaf round trips over the tunnel).
        buf = np.asarray(jax.device_get(jnp.concatenate([
            jnp.asarray(n_new, jnp.float32)[None],
            self.map.kf_R[kf_id].reshape(9), self.map.kf_t[kf_id],
        ])))
        self.n_pts += int(buf[0])
        self.R_cur = buf[1:10].reshape(3, 3).copy()
        self.t_cur = buf[10:13].copy()
        if self.loop_closer is not None:
            self.key, sub = jax.random.split(self.key)
            self.loop_closer.try_close(self, kf_id, sub)
        # Atlas: periodically try welding this map into an archived one
        # (cross-map place recognition -> MergeLocal role).
        if self.atlas is not None and self.atlas.maps and kf_id % 4 == 0:
            self.key, sub = jax.random.split(self.key)
            self._freeze_rel_traj()
            self.atlas.merge_current_into(self, 0, sub)
        # R_cur/t_cur hold the (possibly loop/merge-corrected) pose of the
        # newest keyframe at this point.
        self._set_ref_cache(self.n_kf - 1, self.R_cur, self.t_cur)
        self._start_replica_copy()

    def _apply_kf_async(self, force: bool = False):
        """Absorb deferred keyframe-work results (point count, refined
        ref pose). Non-forced calls skip if the copies haven't landed —
        never blocking the frame loop on the tunnel."""
        if self._kf_async is None:
            return
        kf_id, fut = self._kf_async
        if not force and not fut.done():
            return
        self._kf_async = None
        n_new, R_ref, t_ref = fut.result()
        self.n_pts += int(n_new)
        if self.n_kf - 1 == kf_id and (
            self._ref_cache is None or self._ref_cache[0] == kf_id
        ):
            self._set_ref_cache(kf_id, R_ref, t_ref)
        # Deferred loop-closure attempt for the drained keyframe (the
        # reference's Tracking->LoopClosing KF queue): runs only now, so
        # keyframe work never blocks the frame loop on closure checks.
        if self.loop_closer is not None:
            self.key, sub = jax.random.split(self.key)
            if self.loop_closer.try_close(self, kf_id, sub):
                self._sync_replica()

    def _run_local_ba(self, n_iters):
        if self.n_kf < 2:
            return
        entry_valid = None
        if self.covis_ba:
            # Covisibility window (Optimizer.cc:1120-1210): free set =
            # newest KF + top covisible neighbors, fixed set = outside
            # observers of the local points — selected ON DEVICE, so no
            # host sync enters the keyframe hot path.
            window_ids, fixed_mask, entry_valid = (
                local_mapping.select_covis_window(
                    self.map, jnp.asarray(self.n_kf - 1, jnp.int32),
                    self.ba_window, self.ba_fixed,
                )
            )
        else:
            last = self.n_kf
            free_lo = max(0, last - self.ba_window)
            fix_lo = max(0, free_lo - self.ba_fixed)
            ids = list(range(fix_lo, last))
            fixed = [i < free_lo or i == 0 for i in ids]
            # Mono gauge: when everything is free except KF0, additionally
            # fix the second-oldest in-window KF to anchor scale.
            if sum(fixed) == (1 if 0 in ids else 0):
                fixed[0] = True
            pad = self.W - len(ids)
            if pad > 0:
                ids = ids + [self.K_cap - 1] * pad  # empty slot (kf_valid False)
                fixed = fixed + [True] * pad
            window_ids = jnp.asarray(np.asarray(ids[: self.W], np.int32))
            fixed_mask = jnp.asarray(np.asarray(fixed[: self.W], bool))
        prob, sel = local_mapping.build_local_ba(
            self.map, window_ids, fixed_mask, self.cam_params,
            bf=jnp.asarray(self.bf, jnp.float32), entry_valid=entry_valid,
        )
        res = ba.bundle_adjust(
            prob, n_iters=n_iters, row_n=self.N, rel_tol=1e-3,
            cam_model=self.cam_model,
        )
        self.map = local_mapping.apply_local_ba(
            self.map, window_ids, sel, res, entry_valid
        )
        self.map = local_mapping.drop_ba_outlier_obs(
            self.map, window_ids, res, entry_valid
        )

    # ------------------------------------------------------------------
    def timing_summary(self):
        return {
            k: (float(np.mean(v)), float(np.std(v)), len(v))
            for k, v in self.timing.items()
        }

    def print_time_stats(self, file=None):
        """Per-stage wall-clock stats, mean +- std per stage — the
        reference's REGISTER_TIMES taxonomy dump
        (``Tracking::PrintTimeStats``, Tracking.cc:299; stage vectors
        declared in Tracking.h:185-199 / LocalMapping.h:114-131 /
        LoopClosing.h:95-123). Host timers wrap the same stage
        boundaries; device-fused stages (extract+track, keyframe work)
        appear as their fused program names."""
        import sys

        out = file or sys.stderr
        print("*** orb-tpu time stats (ms, mean +- std [n]) ***", file=out)
        for name, (mean, std, n) in sorted(
            self.timing_summary().items(), key=lambda kv: -kv[1][0]
        ):
            print(
                f"  {name:24s} {mean * 1e3:9.2f} +- {std * 1e3:7.2f}  [{n}]",
                file=out,
            )
