"""Immutable fixed-capacity map state — the array-of-structs replacement
for the reference's pointer graph (Atlas/Map/KeyFrame/MapPoint,
orb_slam3/include/{Atlas,Map,KeyFrame,MapPoint}.h).

The reference guards a shared mutable graph with per-object mutexes and a
global map-update lock (Map.h:141, KeyFrame.h:504-508). Here the whole map
is one pytree of fixed-capacity arrays with validity masks; every update
is a pure function old state -> new state, so pipeline stages can run on
device without locks and snapshots are free.

Key structural translation:
- ``MapPoint::mObservations`` (point -> {KF, idx}) is inverted into
  ``kf_obs [K, N]``: per keyframe-feature slot, the map-point id (or -1).
  The forward direction is recovered by masked reductions; the
  covisibility graph (KeyFrame::GetVectorCovisibleKeyFrames) is one
  boolean matmul away: obs[K, P] @ obs[K, P]^T.
- MapPoint bookkeeping (distinctive descriptor, normal, scale-invariance
  band, found/visible ratios, MapPoint.h:106-204) lives in flat arrays.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class MapState(NamedTuple):
    # --- keyframes ---
    kf_valid: jnp.ndarray  # [K] bool
    kf_R: jnp.ndarray  # [K,3,3] Tcw rotation
    kf_t: jnp.ndarray  # [K,3] Tcw translation
    kf_xy: jnp.ndarray  # [K,N,2] undistorted level-0 keypoint coords
    kf_level: jnp.ndarray  # [K,N] int32
    kf_angle: jnp.ndarray  # [K,N]
    kf_desc_sign: jnp.ndarray  # [K,N,256] int8
    kf_feat_valid: jnp.ndarray  # [K,N] bool
    kf_obs: jnp.ndarray  # [K,N] int32 map-point id or -1
    kf_ts: jnp.ndarray  # [K] timestamps
    # Right-image x-coordinate of each keypoint's stereo match (-1 =
    # monocular observation) — feeds the 3-dim (u, v, u_r) stereo
    # residuals (Frame::mvuRight, orb_slam3/include/Frame.h:271;
    # EdgeStereo, G2oTypes.h:425). RGB-D fills the virtual right coord
    # u_r = u - fx*b/z like Frame::ComputeStereoFromRGBD (Frame.cc:984).
    kf_ur: jnp.ndarray  # [K,N]
    # --- map points ---
    pt_valid: jnp.ndarray  # [P] bool
    pt_X: jnp.ndarray  # [P,3] world position
    pt_desc_sign: jnp.ndarray  # [P,256] int8 representative descriptor
    pt_level: jnp.ndarray  # [P] int32 reference octave (scale prediction)
    pt_found: jnp.ndarray  # [P] int32 found counter (tracking inlier)
    pt_visible: jnp.ndarray  # [P] int32 visible counter (in frustum)
    pt_first_kf: jnp.ndarray  # [P] int32 creating keyframe
    # --- MapPoint viewing statistics (MapPoint::UpdateNormalAndDepth,
    # MapPoint.h:145-154): mean viewing direction + the scale-invariance
    # distance band that drives PredictScale ---
    pt_normal: jnp.ndarray  # [P,3] mean unit view direction (world)
    pt_min_dist: jnp.ndarray  # [P] scale-invariance band lower edge
    pt_max_dist: jnp.ndarray  # [P] scale-invariance band upper edge (0 = unset)
    # --- inertial body state per keyframe (KeyFrame's mVw/mImuBias,
    # KeyFrame.h:414-419; zeros until IMU initialization) ---
    kf_v: jnp.ndarray  # [K,3] world-frame velocity
    kf_bg: jnp.ndarray  # [K,3] gyro bias
    kf_ba: jnp.ndarray  # [K,3] accel bias

    @property
    def K(self) -> int:
        return self.kf_valid.shape[0]

    @property
    def P(self) -> int:
        return self.pt_valid.shape[0]

    @property
    def N(self) -> int:
        return self.kf_obs.shape[1]


def empty_map(K: int, N: int, P: int, dtype=jnp.float32) -> MapState:
    return MapState(
        kf_valid=jnp.zeros((K,), bool),
        kf_R=jnp.tile(jnp.eye(3, dtype=dtype), (K, 1, 1)),
        kf_t=jnp.zeros((K, 3), dtype),
        kf_xy=jnp.zeros((K, N, 2), dtype),
        kf_level=jnp.zeros((K, N), jnp.int32),
        kf_angle=jnp.zeros((K, N), dtype),
        kf_desc_sign=jnp.zeros((K, N, 256), jnp.int8),
        kf_feat_valid=jnp.zeros((K, N), bool),
        kf_obs=jnp.full((K, N), -1, jnp.int32),
        kf_ts=jnp.zeros((K,), dtype),
        kf_ur=jnp.full((K, N), -1.0, dtype),
        pt_valid=jnp.zeros((P,), bool),
        pt_X=jnp.zeros((P, 3), dtype),
        pt_desc_sign=jnp.zeros((P, 256), jnp.int8),
        pt_level=jnp.zeros((P,), jnp.int32),
        pt_found=jnp.zeros((P,), jnp.int32),
        pt_visible=jnp.zeros((P,), jnp.int32),
        pt_first_kf=jnp.zeros((P,), jnp.int32),
        pt_normal=jnp.zeros((P, 3), dtype),
        pt_min_dist=jnp.zeros((P,), dtype),
        pt_max_dist=jnp.zeros((P,), dtype),
        kf_v=jnp.zeros((K, 3), dtype),
        kf_bg=jnp.zeros((K, 3), dtype),
        kf_ba=jnp.zeros((K, 3), dtype),
    )


def use_dense_gathers(dense: bool | None = None) -> bool:
    """Choose between scatter-based index ops (fast on CPU) and fused
    broadcast-compare + reduce formulations (fast on TPU, where XLA
    serializes scatters but streams virtual [K, N, P] comparisons through
    the VPU). ``None`` = auto by backend; tests pass both explicitly."""
    if dense is None:
        return jax.default_backend() == "tpu"
    return dense


def obs_matrix(m: MapState, dense: bool | None = None) -> jnp.ndarray:
    """[K, P] bool: keyframe k observes point p (the forward direction of
    MapPoint::mObservations)."""
    K, N, P = m.K, m.N, m.P
    mask = m.kf_feat_valid & (m.kf_obs >= 0) & m.kf_valid[:, None]
    if use_dense_gathers(dense):
        eq = m.kf_obs[:, :, None] == jnp.arange(P, dtype=m.kf_obs.dtype)
        return jnp.any(eq & mask[:, :, None], axis=1)
    flat_kf = jnp.repeat(jnp.arange(K), N)
    flat_pt = m.kf_obs.reshape(-1)
    out = jnp.zeros((K, P), bool)
    return out.at[flat_kf, jnp.clip(flat_pt, 0, P - 1)].max(mask.reshape(-1))


def covisibility(m: MapState) -> jnp.ndarray:
    """[K, K] int32 shared-point counts (KeyFrame::UpdateConnections
    weights, KeyFrame.cc) — one MXU matmul over the observation matrix."""
    obs = obs_matrix(m).astype(jnp.float32)
    cov = obs @ obs.T
    cov = cov * (1.0 - jnp.eye(m.K, dtype=cov.dtype))
    return cov.astype(jnp.int32)


def point_obs_count(m: MapState) -> jnp.ndarray:
    """[P] number of keyframes observing each point."""
    return jnp.sum(obs_matrix(m).astype(jnp.int32), axis=0)
