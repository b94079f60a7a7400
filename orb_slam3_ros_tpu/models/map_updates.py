"""Jitted map-mutation kernels for the host orchestrator.

Every eager ``.at[].set`` chain in the pipeline costs a full dispatch
round-trip over the TPU link; these fuse each logical map update
(keyframe insertion, new-point admission, culling, counter updates) into
ONE compiled program so a tracked frame costs a handful of dispatches.
(The reference's equivalents are pointer writes under mutexes —
KeyFrame::AddMapPoint, Map::AddMapPoint etc.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops.orb import Features
from .map_state import MapState, obs_matrix
from .tracking import TrackResult, TriangulationResult


@jax.jit
def update_track_counters(m: MapState, visible_mask, found_mask) -> MapState:
    """Found/visible ratios (MapPoint::IncreaseVisible/Found)."""
    return m._replace(
        pt_visible=m.pt_visible + visible_mask.astype(jnp.int32),
        pt_found=m.pt_found + found_mask.astype(jnp.int32),
    )


@jax.jit
def insert_keyframe(
    m: MapState,
    kf_id: jnp.ndarray,
    R: jnp.ndarray,
    t: jnp.ndarray,
    ts: jnp.ndarray,
    feats: Features,
    feat_pt: jnp.ndarray,
) -> MapState:
    """Write a new keyframe slot (KeyFrame ctor + LocalMapping::
    ProcessNewKeyFrame observation binding)."""
    return m._replace(
        kf_valid=m.kf_valid.at[kf_id].set(True),
        kf_R=m.kf_R.at[kf_id].set(R),
        kf_t=m.kf_t.at[kf_id].set(t),
        kf_xy=m.kf_xy.at[kf_id].set(feats.xy),
        kf_level=m.kf_level.at[kf_id].set(feats.level),
        kf_angle=m.kf_angle.at[kf_id].set(feats.angle),
        kf_desc_sign=m.kf_desc_sign.at[kf_id].set(feats.desc_sign),
        kf_feat_valid=m.kf_feat_valid.at[kf_id].set(feats.valid),
        kf_obs=m.kf_obs.at[kf_id].set(feat_pt),
        kf_ts=m.kf_ts.at[kf_id].set(ts),
    )


@jax.jit
def admit_new_points(
    m: MapState,
    kf_id: jnp.ndarray,
    ref_kf: jnp.ndarray,
    tri: TriangulationResult,
    base_id: jnp.ndarray,
    room: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """Allocate accepted triangulations into point slots [base, base+n)
    entirely on device (replaces host-side compaction). Returns
    (new map, n_admitted)."""
    N = m.N
    P = m.P
    ok = tri.ok
    rank = jnp.cumsum(ok.astype(jnp.int32)) - 1  # position among accepted
    take = ok & (rank < room)
    # Non-taken rows share clipped slot indices with taken ones, and the
    # order of duplicate-index scatter-`set` is undefined — so every
    # write is a scatter-ADD of a masked delta (duplicates add 0).
    slot = jnp.clip(base_id + rank, 0, P - 1)
    n_new = jnp.sum(take.astype(jnp.int32))
    tf = take.astype(m.pt_X.dtype)

    pt_valid = m.pt_valid.at[slot].max(take)
    pt_X = m.pt_X.at[slot].add(tf[:, None] * (tri.X_w - m.pt_X[slot]))
    desc = m.kf_desc_sign[kf_id]
    lvl = m.kf_level[kf_id]
    ti = take.astype(jnp.int32)
    pt_desc = m.pt_desc_sign.at[slot].add(
        (take[:, None] * (desc.astype(jnp.int32) - m.pt_desc_sign[slot].astype(jnp.int32))).astype(jnp.int8)
    )
    pt_level = m.pt_level.at[slot].add(ti * (lvl - m.pt_level[slot]))
    pt_first = m.pt_first_kf.at[slot].add(ti * (kf_id - m.pt_first_kf[slot]))
    # Bind observations in both keyframes. The new KF's obs row is a
    # direct (duplicate-free) where; the ref KF's row uses scatter-add.
    new_obs_kf = jnp.where(take, slot, m.kf_obs[kf_id])
    obs_ref = m.kf_obs[ref_kf]
    new_obs_ref = obs_ref.at[tri.ref_feat].add(
        ti * (slot - obs_ref[tri.ref_feat])
    )
    kf_obs = m.kf_obs.at[kf_id].set(new_obs_kf).at[ref_kf].set(new_obs_ref)
    return (
        m._replace(
            pt_valid=pt_valid, pt_X=pt_X, pt_desc_sign=pt_desc,
            pt_level=pt_level, pt_first_kf=pt_first, kf_obs=kf_obs,
        ),
        n_new,
    )


@jax.jit
def cull_points(m: MapState, n_kf: jnp.ndarray) -> MapState:
    """MapPointCulling (LocalMapping.cc:346): bad found/visible ratio or
    too few observers after a grace period."""
    obs_count = jnp.sum(obs_matrix(m).astype(jnp.int32), axis=0)
    ratio_bad = (m.pt_visible >= 8) & (
        m.pt_found.astype(jnp.float32) < 0.25 * m.pt_visible.astype(jnp.float32)
    )
    lonely = (obs_count < 2) & ((n_kf - m.pt_first_kf) >= 3)
    kill = m.pt_valid & (ratio_bad | lonely)
    return m._replace(pt_valid=m.pt_valid & ~kill)


@jax.jit
def admit_depth_points(
    m: MapState,
    kf_id: jnp.ndarray,
    X_w: jnp.ndarray,  # [N,3] backprojected candidates (world)
    cand: jnp.ndarray,  # [N] candidate mask (valid depth, unbound feature)
    base_id: jnp.ndarray,
    room: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray]:
    """Create landmarks directly from per-feature depth (the stereo/RGB-D
    point creation of ``Tracking::StereoInitialization`` /
    ``CreateNewKeyFrame``, Tracking.cc:2371/3255). Same slot-allocation
    discipline as ``admit_new_points``."""
    P = m.P
    ok = cand & m.kf_feat_valid[kf_id] & (m.kf_obs[kf_id] < 0)
    rank = jnp.cumsum(ok.astype(jnp.int32)) - 1
    take = ok & (rank < room)
    slot = jnp.clip(base_id + rank, 0, P - 1)
    n_new = jnp.sum(take.astype(jnp.int32))
    tf = take.astype(m.pt_X.dtype)
    ti = take.astype(jnp.int32)

    pt_valid = m.pt_valid.at[slot].max(take)
    pt_X = m.pt_X.at[slot].add(tf[:, None] * (X_w - m.pt_X[slot]))
    desc = m.kf_desc_sign[kf_id]
    pt_desc = m.pt_desc_sign.at[slot].add(
        (take[:, None] * (desc.astype(jnp.int32) - m.pt_desc_sign[slot].astype(jnp.int32))).astype(jnp.int8)
    )
    pt_level = m.pt_level.at[slot].add(ti * (m.kf_level[kf_id] - m.pt_level[slot]))
    pt_first = m.pt_first_kf.at[slot].add(ti * (kf_id - m.pt_first_kf[slot]))
    new_obs = jnp.where(take, slot, m.kf_obs[kf_id])
    return (
        m._replace(
            pt_valid=pt_valid, pt_X=pt_X, pt_desc_sign=pt_desc,
            pt_level=pt_level, pt_first_kf=pt_first,
            kf_obs=m.kf_obs.at[kf_id].set(new_obs),
        ),
        n_new,
    )


@jax.jit
def apply_scaled_rotation(m: MapState, R_gw: jnp.ndarray, s: jnp.ndarray) -> MapState:
    """Gravity-align + metrically rescale the whole map after IMU
    initialization (``Map::ApplyScaledRotation``, orb_slam3/src/Map.cc:
    252): X' = s R_gw X, camera poses R_cw' = R_cw R_gw^T, t_cw' = s t_cw
    (reprojection-invariant), world velocities v' = R_gw v (already
    metric after the init solve)."""
    return m._replace(
        pt_X=s * m.pt_X @ R_gw.T,
        kf_R=jnp.einsum("kij,lj->kil", m.kf_R, R_gw),
        kf_t=s * m.kf_t,
        kf_v=m.kf_v @ R_gw.T,
    )
