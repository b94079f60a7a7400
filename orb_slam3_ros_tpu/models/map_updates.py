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
    metric after the init solve). Viewing normals rotate and the
    scale-invariance band rescales with the map."""
    return m._replace(
        pt_X=s * m.pt_X @ R_gw.T,
        kf_R=jnp.einsum("kij,lj->kil", m.kf_R, R_gw),
        kf_t=s * m.kf_t,
        kf_v=m.kf_v @ R_gw.T,
        pt_normal=m.pt_normal @ R_gw.T,
        pt_min_dist=s * m.pt_min_dist,
        pt_max_dist=s * m.pt_max_dist,
    )


@partial(jax.jit, static_argnames=("max_obs", "scale", "n_levels"))
def refresh_point_stats(
    m: MapState, max_obs: int = 8, scale: float = 1.2, n_levels: int = 8
) -> MapState:
    """Recompute per-landmark bookkeeping from current geometry in ONE
    program — the roles of ``MapPoint::ComputeDistinctiveDescriptors``
    (representative descriptor = minimum median Hamming distance to the
    other observations, MapPoint.cc) and ``MapPoint::UpdateNormalAndDepth``
    (mean viewing direction + scale-invariance distances from the first
    observing keyframe, MapPoint.h:145-154).

    The reference walks each point's observation list under a mutex on
    every observation change; here the whole table refreshes at keyframe
    cadence. Observations are capped at ``max_obs`` per point (kf-id
    order, so the creating keyframe is always included — it is the
    reference's mpRefKF for the depth band)."""
    K, N, P = m.K, m.N, m.P
    S = K * N
    dtype = m.pt_X.dtype
    flat_pt = m.kf_obs.reshape(-1)
    flat_kf = jnp.arange(S, dtype=jnp.int32) // N
    has = (flat_pt >= 0) & m.kf_feat_valid.reshape(-1) & m.kf_valid[flat_kf]
    q = jnp.where(has, flat_pt, P)  # invalid slots sort to the end
    order = jnp.argsort(q, stable=True).astype(jnp.int32)
    qs = q[order]
    # rank of each observation within its point's group
    start = jnp.searchsorted(qs, qs, side="left")
    rank = jnp.arange(S, dtype=jnp.int32) - start.astype(jnp.int32)
    keep = (qs < P) & (rank < max_obs)
    obs_slot = jnp.full((P, max_obs), -1, jnp.int32)
    obs_slot = obs_slot.at[
        jnp.clip(qs, 0, P - 1), jnp.clip(rank, 0, max_obs - 1)
    ].max(jnp.where(keep, order, -1))
    valid_obs = obs_slot >= 0  # [P,O]
    oi = jnp.clip(obs_slot, 0, S - 1)
    kf_of = oi // N  # [P,O]

    # --- distinctive descriptor: min median pairwise Hamming ---
    D = m.kf_desc_sign.reshape(S, 256)[oi].astype(jnp.float32)  # [P,O,256]
    dot = jnp.einsum("poc,pqc->poq", D, D)
    dist = 0.5 * (256.0 - dot)  # Hamming between sign descriptors
    pair_ok = valid_obs[:, :, None] & valid_obs[:, None, :]
    BIG = jnp.asarray(512.0, dtype)
    dist = jnp.where(pair_ok, dist, BIG)
    dist_sorted = jnp.sort(dist, axis=-1)  # valid entries first per row
    n_valid = jnp.sum(valid_obs.astype(jnp.int32), axis=-1)  # [P]
    med_idx = jnp.clip((n_valid - 1) // 2, 0, max_obs - 1)
    median = jnp.take_along_axis(
        dist_sorted, med_idx[:, None, None].repeat(max_obs, 1), axis=-1
    )[..., 0]  # [P,O]
    median = jnp.where(valid_obs, median, BIG)
    best_row = jnp.argmin(median, axis=-1)  # [P]
    winner = jnp.take_along_axis(
        m.kf_desc_sign.reshape(S, 256)[oi], best_row[:, None, None], axis=1
    )[:, 0]  # [P,256] int8
    touched = n_valid > 0
    pt_desc = jnp.where(touched[:, None], winner, m.pt_desc_sign)

    # --- normal + scale-invariance band ---
    C_w = -jnp.einsum("kij,ki->kj", m.kf_R, m.kf_t)  # [K,3] camera centers
    vec = m.pt_X[:, None, :] - C_w[kf_of]  # [P,O,3]
    vlen = jnp.linalg.norm(vec, axis=-1)
    unit = vec / jnp.maximum(vlen, 1e-12)[..., None]
    nsum = jnp.sum(jnp.where(valid_obs[..., None], unit, 0.0), axis=1)
    normal = nsum / jnp.maximum(jnp.linalg.norm(nsum, axis=-1), 1e-12)[..., None]
    pt_normal = jnp.where(touched[:, None], normal, m.pt_normal)
    # first observation (lowest kf id) = reference keyframe for the band
    ref_level = m.kf_level.reshape(S)[oi[:, 0]].astype(dtype)
    dist_ref = vlen[:, 0]
    max_d = dist_ref * scale**ref_level
    min_d = max_d / scale ** (n_levels - 1.0)
    return m._replace(
        pt_desc_sign=pt_desc,
        pt_normal=pt_normal,
        pt_min_dist=jnp.where(touched, min_d, m.pt_min_dist),
        pt_max_dist=jnp.where(touched, max_d, m.pt_max_dist),
    )
