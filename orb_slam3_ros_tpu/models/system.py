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
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ba, hamming, lie, matching, orb, ransac
from . import local_mapping, map_state, tracking

NOT_INITIALIZED = 0
OK = 1
LOST = 2


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
        local_ba_iters: int = 6,
        seed: int = 0,
    ):
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
        self.local_ba_iters = local_ba_iters

        self.state = NOT_INITIALIZED
        self.map = map_state.empty_map(self.K_cap, self.N, self.P_cap)
        self.n_kf = 0
        self.n_pts = 0
        self.frame_id = 0
        self.last_kf_frame = 0
        self.key = jax.random.PRNGKey(seed)

        # Motion model (velocity = T_cur * T_last^-1).
        self.R_cur = np.eye(3, dtype=np.float32)
        self.t_cur = np.zeros(3, np.float32)
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)

        self.init_feats: Optional[orb.Features] = None
        self.init_ts = 0.0
        self.trajectory = []  # (ts, Twc 4x4) per tracked frame
        self.timing = {}

        self._extract = jax.jit(lambda im: orb.extract(im, self.config))
        self._ba = local_mapping  # namespace alias

    # ------------------------------------------------------------------
    def _log_pose(self, ts):
        Rcw, tcw = self.R_cur, self.t_cur
        Rwc = Rcw.T
        twc = -Rcw.T @ tcw
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = Rwc
        T[:3, 3] = twc
        self.trajectory.append((ts, T))

    def _tic(self, name, t0):
        dt = time.time() - t0
        self.timing.setdefault(name, []).append(dt)
        return time.time()

    # ------------------------------------------------------------------
    def process_frame(self, img: np.ndarray, ts: float):
        """Track one grayscale frame. Returns Twc [4,4] or None."""
        t0 = time.time()
        feats = self._extract(jnp.asarray(img, jnp.float32))
        jax.block_until_ready(feats.xy)
        t0 = self._tic("extract", t0)

        if self.state == NOT_INITIALIZED:
            out = self._try_initialize(feats, ts)
        elif self.state == OK:
            out = self._track(feats, ts)
        else:
            out = None
        self._tic("track", t0)
        self.frame_id += 1
        return out

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
        res = ransac.two_view_init(
            jnp.asarray(xy1), jnp.asarray(xy2), jnp.asarray(matched),
            self.cam_params, sub,
        )
        if not bool(res.ok) or int(res.n_good) < 50:
            return None
        self._create_initial_map(feats, ts, idx, res)
        self.state = OK
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
        f1, f2 = self.init_feats, feats
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

        self.R_cur = np.asarray(jax.device_get(self.map.kf_R[1]))
        self.t_cur = np.asarray(jax.device_get(self.map.kf_t[1]))
        self.vel_R = np.eye(3, dtype=np.float32)
        self.vel_t = np.zeros(3, np.float32)

    # ------------------------------------------------------------------
    def _track(self, feats, ts):
        R_pred = self.vel_R @ self.R_cur
        t_pred = self.vel_R @ self.t_cur + self.vel_t
        res = tracking.track_against_map(
            self.map, feats, jnp.asarray(R_pred), jnp.asarray(t_pred),
            self.cam_params, self.width, self.height,
        )
        n_inl = int(jax.device_get(res.n_inliers))
        if n_inl < 15:
            self.state = LOST
            return None
        R_new = np.asarray(jax.device_get(res.R))
        t_new = np.asarray(jax.device_get(res.t))
        # Motion model update: vel = T_new * T_old^-1.
        self.vel_R = R_new @ self.R_cur.T
        self.vel_t = t_new - self.vel_R @ self.t_cur
        self.R_cur, self.t_cur = R_new, t_new
        # Found/visible counters.
        self.map = self.map._replace(
            pt_visible=self.map.pt_visible + res.visible_mask.astype(jnp.int32),
            pt_found=self.map.pt_found + res.found_mask.astype(jnp.int32),
        )
        self._log_pose(ts)

        if self._need_keyframe(n_inl):
            self._insert_keyframe(feats, ts, res)
        return self._pose_mat()

    def _need_keyframe(self, n_inl):
        """Simplified NeedNewKeyFrame (Tracking.cc:3103): periodic + weak
        tracking + capacity guard."""
        if self.n_kf >= self.K_cap:
            return False
        since = self.frame_id - self.last_kf_frame
        return since >= self.kf_every or (n_inl < self.kf_min_inliers and since >= 2)

    def _insert_keyframe(self, feats, ts, track_res):
        kf_id = self.n_kf
        m = self.map
        upd = {
            "kf_valid": m.kf_valid.at[kf_id].set(True),
            "kf_R": m.kf_R.at[kf_id].set(jnp.asarray(self.R_cur)),
            "kf_t": m.kf_t.at[kf_id].set(jnp.asarray(self.t_cur)),
            "kf_xy": m.kf_xy.at[kf_id].set(feats.xy),
            "kf_level": m.kf_level.at[kf_id].set(feats.level),
            "kf_angle": m.kf_angle.at[kf_id].set(feats.angle),
            "kf_desc_sign": m.kf_desc_sign.at[kf_id].set(feats.desc_sign),
            "kf_feat_valid": m.kf_feat_valid.at[kf_id].set(feats.valid),
            "kf_obs": m.kf_obs.at[kf_id].set(track_res.feat_pt),
            "kf_ts": m.kf_ts.at[kf_id].set(ts),
        }
        self.map = m._replace(**upd)
        self.n_kf += 1
        self.last_kf_frame = self.frame_id

        # Triangulate new points against the previous keyframe.
        tri = tracking.triangulate_with_ref(
            self.map, jnp.asarray(kf_id), jnp.asarray(kf_id - 1),
            self.cam_params,
        )
        self._admit_new_points(kf_id, tri, feats)
        self._run_local_ba(n_iters=self.local_ba_iters)
        self._cull_points()
        # Keep current pose in sync with BA result.
        self.R_cur = np.asarray(jax.device_get(self.map.kf_R[kf_id]))
        self.t_cur = np.asarray(jax.device_get(self.map.kf_t[kf_id]))

    def _admit_new_points(self, kf_id, tri, feats):
        ok = np.asarray(jax.device_get(tri.ok))
        n_new = int(ok.sum())
        if n_new == 0:
            return
        room = self.P_cap - self.n_pts
        take = min(n_new, room)
        if take <= 0:
            return
        feat_new = np.where(ok)[0][:take].astype(np.int32)
        feat_ref = np.asarray(jax.device_get(tri.ref_feat))[feat_new]
        X_w = np.asarray(jax.device_get(tri.X_w))[feat_new]
        ids = np.arange(self.n_pts, self.n_pts + take, dtype=np.int32)
        m = self.map
        self.map = m._replace(
            pt_valid=m.pt_valid.at[ids].set(True),
            pt_X=m.pt_X.at[ids].set(jnp.asarray(X_w)),
            pt_desc_sign=m.pt_desc_sign.at[ids].set(m.kf_desc_sign[kf_id][jnp.asarray(feat_new)]),
            pt_level=m.pt_level.at[ids].set(m.kf_level[kf_id][jnp.asarray(feat_new)]),
            pt_first_kf=m.pt_first_kf.at[ids].set(kf_id),
            kf_obs=m.kf_obs.at[kf_id, jnp.asarray(feat_new)].set(jnp.asarray(ids))
            .at[kf_id - 1, jnp.asarray(feat_ref)].set(jnp.asarray(ids)),
        )
        self.n_pts += take

    def _run_local_ba(self, n_iters):
        if self.n_kf < 2:
            return
        last = self.n_kf
        free_lo = max(0, last - self.ba_window)
        fix_lo = max(0, free_lo - self.ba_fixed)
        ids = list(range(fix_lo, last))
        fixed = [i < free_lo or i == 0 for i in ids]
        # Mono gauge: when everything is free except KF0, additionally fix
        # the second-oldest in-window KF to anchor scale.
        if sum(fixed) == (1 if 0 in ids else 0):
            fixed[0] = True
        pad = self.W - len(ids)
        if pad > 0:
            ids = ids + [self.K_cap - 1] * pad  # empty slot (kf_valid False)
            fixed = fixed + [True] * pad
        window_ids = jnp.asarray(np.asarray(ids[: self.W], np.int32))
        fixed_mask = jnp.asarray(np.asarray(fixed[: self.W], bool))
        prob = local_mapping.build_local_ba(
            self.map, window_ids, fixed_mask, self.cam_params
        )
        res = ba.bundle_adjust(prob, n_iters=n_iters)
        self.map = local_mapping.apply_local_ba(self.map, window_ids, res)
        self.map = local_mapping.drop_ba_outlier_obs(self.map, window_ids, res)

    def _cull_points(self):
        """MapPointCulling (LocalMapping.cc:346): kill points with a bad
        found/visible ratio or too few observations after a grace period."""
        m = self.map
        obs_count = map_state.point_obs_count(m)
        ratio_bad = (m.pt_visible >= 8) & (
            m.pt_found.astype(jnp.float32)
            < 0.25 * m.pt_visible.astype(jnp.float32)
        )
        lonely = (obs_count < 2) & ((self.n_kf - m.pt_first_kf) >= 3)
        kill = m.pt_valid & (ratio_bad | lonely)
        self.map = m._replace(pt_valid=m.pt_valid & ~kill)

    # ------------------------------------------------------------------
    def timing_summary(self):
        return {
            k: (float(np.mean(v)), float(np.std(v)), len(v))
            for k, v in self.timing.items()
        }
