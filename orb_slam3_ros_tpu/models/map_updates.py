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

from ..ops import cameras, hamming, matching
from ..ops.orb import Features
from .map_state import MapState, covisibility, obs_matrix, use_dense_gathers
from .tracking import TrackResult, TriangulationResult


def dedup_obs_rows(kf_obs: jnp.ndarray, changed: jnp.ndarray, P: int):
    """Enforce one observation per (keyframe, landmark) row: among row
    entries holding the same landmark id, keep the preferred one
    (entries NOT rewritten by a remap first — MapPoint::Replace erases
    the replaced binding when the keyframe already observes the winner,
    MapPoint.cc:120-145 — then lowest feature slot) and erase the rest.

    This makes the row-structured BA/VI-BA accumulation (one observation
    per (keyframe, landmark) row, ``viba.py`` row_n path) EXACT after
    fusion: without it, two losers of one keyframe both remapping to a
    common winner would leave two features bound to one landmark and the
    min-slot gather would silently drop one (measured: mono-inertial
    scale error 2.7% -> 5.4%).

    Two formulations (map_state.use_dense_gathers): a [K,P] scatter-min
    (fast on CPU) and a fused [K,N,N] broadcast-compare + reduce (TPU —
    XLA serializes the ~80k-element scatter, which cost the mono chunk
    ~45% of its throughput when this ran scatter-formulated).
    """
    K, N = kf_obs.shape
    cols = jnp.broadcast_to(jnp.arange(N, dtype=jnp.int32), (K, N))
    prio = cols + N * changed.astype(jnp.int32)
    if use_dense_gathers():
        valid = kf_obs >= 0
        same = (
            (kf_obs[:, :, None] == kf_obs[:, None, :])
            & valid[:, :, None] & valid[:, None, :]
        )  # [K,N,N]
        better = same & (prio[:, None, :] < prio[:, :, None])
        keep = ~jnp.any(better, axis=-1)
        return jnp.where(keep | ~valid, kf_obs, -1)
    rows = jnp.broadcast_to(jnp.arange(K, dtype=jnp.int32)[:, None], (K, N))
    val = jnp.where(kf_obs >= 0, kf_obs, P)  # invalid -> spill slot
    best = jnp.full((K, P + 1), 2 * N, jnp.int32).at[rows, val].min(prio)
    keep = (kf_obs < 0) | (prio == best[rows, jnp.minimum(val, P)])
    return jnp.where(keep, kf_obs, -1)


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
    ur: jnp.ndarray | None = None,
) -> MapState:
    """Write a new keyframe slot (KeyFrame ctor + LocalMapping::
    ProcessNewKeyFrame observation binding). ``ur`` carries the stereo
    right-image x-coordinates per feature (-1 = monocular)."""
    if ur is None:
        ur = jnp.full((m.N,), -1.0, m.kf_ur.dtype)
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
        kf_ur=m.kf_ur.at[kf_id].set(ur),
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


def _kf_feats(m: MapState, kf: jnp.ndarray) -> Features:
    return Features(
        xy=m.kf_xy[kf], level=m.kf_level[kf], angle=m.kf_angle[kf],
        response=jnp.zeros_like(m.kf_angle[kf]),
        desc_packed=jnp.zeros((m.N, 8), jnp.uint32),
        desc_sign=m.kf_desc_sign[kf], valid=m.kf_feat_valid[kf],
    )


def _fuse_into_kf(
    m: MapState, src_pts: jnp.ndarray, dst_kf: jnp.ndarray, active: jnp.ndarray,
    cam_params: jnp.ndarray, width: int, height: int, radius: float,
    cam_model: str = "pinhole",
) -> tuple[MapState, jnp.ndarray]:
    """Project the landmark set ``src_pts`` [P] into keyframe ``dst_kf``
    and fuse with its features: a free feature gains the observation; a
    feature already bound to a different landmark triggers a merge that
    keeps the better-observed landmark and redirects every observation of
    the loser (ORBmatcher::Fuse + MapPoint::Replace semantics)."""
    P, N = m.P, m.N
    R, t = m.kf_R[dst_kf], m.kf_t[dst_kf]
    Xc = jnp.einsum("ij,pj->pi", R, m.pt_X) + t
    uv = cameras.project_model(cam_params, Xc, cam_model)
    dst_row = m.kf_obs[dst_kf]
    in_dst = jnp.zeros((P,), bool).at[jnp.clip(dst_row, 0, P - 1)].max(
        (dst_row >= 0) & m.kf_feat_valid[dst_kf]
    )  # pMP->IsInKeyFrame(pKFi) skip (ORBmatcher::Fuse)
    # Geometric gates of ORBmatcher::Fuse (ORBmatcher.cc:1148-1240):
    # depth within the landmark's scale-invariance band and viewing
    # direction within 60 deg of its mean normal. Without these,
    # self-similar texture produces wrong merges that poison BA.
    O_w = -R.T @ t
    po = m.pt_X - O_w
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * m.pt_normal, axis=-1) / jnp.maximum(dist, 1e-12)
    banded = m.pt_max_dist > 0
    geom_ok = (~banded) | (
        (dist >= 0.8 * m.pt_min_dist)
        & (dist <= 1.2 * m.pt_max_dist)
        & (view_cos > 0.5)
    )
    ok = (
        active
        & src_pts
        & m.pt_valid
        & ~in_dst
        & geom_ok
        & (Xc[:, 2] > 0.05)
        & cameras.in_image(uv, width, height, 2.0)
    )
    feats = _kf_feats(m, dst_kf)
    idx, _ = matching.search_by_projection(
        uv, ok, m.pt_level, m.pt_desc_sign, feats,
        radius=radius, max_dist=35, ratio=1.0,
    )
    matched = idx >= 0
    j = jnp.clip(idx, 0, N - 1)
    # One winner per destination feature (scatter-max on point id).
    col = jnp.full((N,), -1, jnp.int32).at[j].max(
        jnp.where(matched, jnp.arange(P, dtype=jnp.int32), -1)
    )
    is_winner = matched & (col[j] == jnp.arange(P))
    bound_pt = m.kf_obs[dst_kf][j]  # [P] landmark currently at the feature
    obs_cnt = jnp.sum(obs_matrix(m).astype(jnp.int32), axis=0)

    # Case 1: free feature -> bind the observation.
    bind = is_winner & (bound_pt < 0)
    new_row = m.kf_obs[dst_kf].at[j].max(
        jnp.where(bind, jnp.arange(P, dtype=jnp.int32), -1)
    )
    kf_obs = m.kf_obs.at[dst_kf].set(new_row)

    # Case 2: feature bound to another landmark -> merge (keep the one
    # with more observations, redirect the loser everywhere).
    other = jnp.clip(bound_pt, 0, P - 1)
    # 3D consistency: the two landmarks must coincide in space (within a
    # fraction of their depth) — a merge rewires observations permanently,
    # so a wrong one is far more destructive than a missed one. (The
    # reference relies on its BoW-quality descriptors for this; the
    # synthetic-texture regime needs the explicit geometric check.)
    # 2% of depth: SearchInNeighbors partners live in the same local
    # window where relative drift is tiny; larger separations are either
    # distinct points or unclosed-loop drift, which the reference welds
    # only AFTER Sim3 correction (SearchAndFuse), never here.
    sep = jnp.linalg.norm(m.pt_X - m.pt_X[other], axis=-1)
    depth = jnp.maximum(Xc[:, 2], 1e-6)
    coincide = sep < 0.02 * depth
    merge = (
        is_winner
        & (bound_pt >= 0)
        & (other != jnp.arange(P))
        & m.pt_valid[other]
        & coincide
    )
    keep_other = obs_cnt[other] >= obs_cnt[jnp.arange(P)]
    winner = jnp.where(keep_other, other, jnp.arange(P))
    loser = jnp.where(keep_other, jnp.arange(P), other)
    # Losers are distinct across merge rows (each was bound to a distinct
    # destination feature, and injectivity of kf_obs rows is maintained by
    # the winner-per-feature scatter), so a plain scatter-set is safe.
    remap = jnp.arange(P, dtype=jnp.int32)
    remap = remap.at[jnp.clip(loser, 0, P - 1)].set(
        jnp.where(merge, winner, remap[jnp.clip(loser, 0, P - 1)]).astype(jnp.int32),
        mode="drop",
    )
    v = kf_obs
    vr = jnp.clip(v, 0, P - 1)
    tgt = remap[vr]
    # MapPoint::Replace semantics (orb_slam3/src/MapPoint.cc:120-145),
    # enforced exactly: after the remap, every keyframe row keeps at most
    # ONE binding per landmark (unchanged bindings win over remapped
    # ones; two losers remapping to a common winner collapse to one).
    kf_obs = dedup_obs_rows(
        jnp.where(v >= 0, tgt, v), (v >= 0) & (tgt != vr), P
    )
    lm = jnp.clip(loser, 0, P - 1)
    dead = jnp.zeros((P,), bool).at[lm].max(merge)
    add_found = jnp.zeros((P,), jnp.int32).at[jnp.clip(winner, 0, P - 1)].add(
        jnp.where(merge, m.pt_found[lm], 0)
    )
    add_vis = jnp.zeros((P,), jnp.int32).at[jnp.clip(winner, 0, P - 1)].add(
        jnp.where(merge, m.pt_visible[lm], 0)
    )
    n_fused = jnp.sum(merge.astype(jnp.int32)) + jnp.sum(bind.astype(jnp.int32))
    return (
        m._replace(
            kf_obs=kf_obs,
            pt_valid=m.pt_valid & ~dead,
            pt_found=m.pt_found + add_found,
            pt_visible=m.pt_visible + add_vis,
        ),
        n_fused,
    )


@partial(jax.jit, static_argnames=("width", "height", "n_neighbors", "radius", "cam_model"))
def fuse_in_neighbors(
    m: MapState,
    kf_id: jnp.ndarray,
    cam_params: jnp.ndarray,
    width: int,
    height: int,
    n_neighbors: int = 1,
    radius: float = 3.0,
    cam_model: str = "pinhole",
) -> tuple[MapState, jnp.ndarray]:
    """``LocalMapping::SearchInNeighbors`` (orb_slam3/src/LocalMapping.cc
    :714): fuse duplicated landmarks between the newest keyframe and its
    top-covisible neighbors, both directions. The reference walks ~20
    neighbor KFs with pointer surgery under mutexes; here each direction
    is one batched projection search + a landmark remap over the whole
    observation table, and the neighbor choice (covisibility top-k) is
    computed on device from the observation matrix."""
    obs = obs_matrix(m)
    new_row = obs[kf_id]
    w = obs.astype(jnp.float32) @ new_row.astype(jnp.float32)  # [K]
    w = w.at[kf_id].set(-1.0)
    w = jnp.where(m.kf_valid, w, -1.0)
    top_w, top_ids = jax.lax.top_k(w, n_neighbors)
    n_fused = jnp.zeros((), jnp.int32)
    for i in range(n_neighbors):
        nk = top_ids[i]
        active = top_w[i] > 0
        # forward: new KF's landmarks into the neighbor
        m, f1 = _fuse_into_kf(
            m, obs_matrix(m)[kf_id], nk, active, cam_params, width, height,
            radius, cam_model,
        )
        # reverse: neighbor's landmarks into the new KF
        m, f2 = _fuse_into_kf(
            m, obs_matrix(m)[nk], kf_id, active, cam_params, width, height,
            radius, cam_model,
        )
        n_fused = n_fused + f1 + f2
    return m, n_fused


@partial(jax.jit, static_argnames=("n_levels", "dense"))
def cull_keyframes(
    m: MapState,
    n_kf: jnp.ndarray,
    protect_last: int = 2,
    redundancy: float = 0.9,
    n_levels: int = 8,
    dense: bool | None = None,
) -> tuple[MapState, jnp.ndarray]:
    """``LocalMapping::KeyFrameCulling`` (orb_slam3/src/LocalMapping.cc
    :902): discard a keyframe when >=90% of its landmarks are observed by
    at least 3 other keyframes at the same or finer scale. The per-point
    'observed at level <= l by others' counts come from a cumulative
    one-hot over octaves reduced across keyframes — no per-observation
    loops. Culled keyframes drop their observations (SetBadFlag)."""
    K, N, P = m.K, m.N, m.P
    bound = obs_matrix(m, dense)  # [K,P]
    if use_dense_gathers(dense):
        eq = (
            m.kf_obs[:, :, None] == jnp.arange(P, dtype=m.kf_obs.dtype)
        ) & m.kf_feat_valid[:, :, None]
        lvl = jnp.min(
            jnp.where(eq, m.kf_level[:, :, None], n_levels), axis=1
        )  # [K,P] observation octave, n_levels if unobserved
    else:
        flat_kf = jnp.repeat(jnp.arange(K, dtype=jnp.int32), N)
        flat_pt = jnp.clip(m.kf_obs.reshape(-1), 0, P - 1)
        has = (
            (m.kf_obs.reshape(-1) >= 0)
            & m.kf_feat_valid.reshape(-1)
            & m.kf_valid[flat_kf]
        )
        lvl = jnp.full((K, P), n_levels, jnp.int32).at[flat_kf, flat_pt].min(
            jnp.where(has, m.kf_level.reshape(-1), n_levels)
        )
    # cum[k,p,l] = bound[k,p] and lvl[k,p] <= l
    ls = jnp.arange(n_levels, dtype=jnp.int32)
    cum = bound[:, :, None] & (lvl[:, :, None] <= ls[None, None, :])
    S = jnp.sum(cum.astype(jnp.int32), axis=0)  # [P, L]
    thr = jnp.clip(lvl + 1, 0, n_levels - 1)  # same-or-finer (+1 octave slack)
    S_g = jnp.take_along_axis(S[None].repeat(K, 0), thr[:, :, None], axis=2)[..., 0]
    cnt_others = S_g - bound.astype(jnp.int32)  # exclude self
    red = bound & (cnt_others >= 3)
    nb = jnp.sum(bound.astype(jnp.int32), axis=1)
    nr = jnp.sum(red.astype(jnp.int32), axis=1)
    ids = jnp.arange(K, dtype=jnp.int32)
    frac = nr.astype(jnp.float32) / jnp.maximum(nb.astype(jnp.float32), 1.0)
    qualifies = (
        m.kf_valid
        & (ids > 0)
        & (ids < n_kf - protect_last)
        & (nb > 0)
        & (frac >= redundancy)
    )
    # Cull at most ONE keyframe per call (the most redundant). The
    # reference loops with sequential rechecks after each removal
    # (observations drop as KFs die); culling the whole qualifying set at
    # once could strip a landmark below 3 observers. One per keyframe
    # cadence converges to the same fixpoint.
    best = jnp.argmax(jnp.where(qualifies, frac, -1.0))
    cull = qualifies & (ids == best)
    return (
        m._replace(
            kf_valid=m.kf_valid & ~cull,
            kf_obs=jnp.where(cull[:, None], -1, m.kf_obs),
        ),
        jnp.sum(cull.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("protect_last",))
def evict_one_keyframe(
    m: MapState, n_kf: jnp.ndarray, protect_last: int = 4
) -> tuple[MapState, jnp.ndarray]:
    """Last-resort slot recycling at capacity. No reference counterpart:
    reference maps grow without bound (KeyFrameCulling only removes
    REDUNDANT keyframes, LocalMapping.cc:902); fixed-capacity arrays
    need a second policy when the live window genuinely fills K_cap.
    Evict the keyframe least covisible with the recent window (weakest
    link to where mapping is happening), never slot 0 (gauge root) or
    the last ``protect_last`` keyframes — degrading to sliding-window
    odometry over the old territory instead of stalling mapping."""
    cov = covisibility(m).astype(jnp.float32)  # [K, K]
    ids = jnp.arange(m.K, dtype=jnp.int32)
    recent = (m.kf_valid & (ids >= n_kf - protect_last)).astype(jnp.float32)
    link = jnp.sum(cov * recent[None, :], axis=1)  # [K]
    cand = m.kf_valid & (ids > 0) & (ids < n_kf - protect_last)
    # tie-break toward the oldest keyframe
    score = jnp.where(
        cand, link + 1e-3 * ids.astype(jnp.float32), jnp.inf
    )
    best = jnp.argmin(score)
    cull = cand & (ids == best)
    return (
        m._replace(
            kf_valid=m.kf_valid & ~cull,
            kf_obs=jnp.where(cull[:, None], -1, m.kf_obs),
        ),
        jnp.sum(cull.astype(jnp.int32)),
    )


@partial(jax.jit, static_argnames=("max_obs", "scale", "n_levels", "dense"))
def refresh_point_stats(
    m: MapState, max_obs: int = 8, scale: float = 1.2, n_levels: int = 8,
    dense: bool | None = None,
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
    if use_dense_gathers(dense):
        # Dense path: rank observers by keyframe id with a cumsum over
        # the [K, P] observation matrix and recover each observation's
        # feature slot by a fused compare-reduce — no sort, no scatter
        # (both serialize on TPU).
        B = obs_matrix(m)  # [K,P]
        rank = jnp.cumsum(B.astype(jnp.int32), axis=0) - 1
        sel = B & (rank < max_obs)
        oh_r = sel[:, :, None] & (
            rank[:, :, None] == jnp.arange(max_obs, dtype=jnp.int32)
        )  # [K,P,O]
        ks = jnp.arange(K, dtype=jnp.int32)[:, None, None]
        k_of0 = jnp.sum(ks * oh_r.astype(jnp.int32), axis=0)  # [P,O]
        valid_obs = jnp.any(oh_r, axis=0)
        eqn = (
            m.kf_obs[:, :, None] == jnp.arange(P, dtype=m.kf_obs.dtype)
        ) & m.kf_feat_valid[:, :, None]
        F = jnp.min(
            jnp.where(eqn, jnp.arange(N, dtype=jnp.int32)[None, :, None], N),
            axis=1,
        )  # [K,P] feature index of (k, p), N if none
        Fp = jnp.take_along_axis(F.T, jnp.clip(k_of0, 0, K - 1), axis=1)
        obs_slot = jnp.where(
            valid_obs, k_of0 * N + jnp.clip(Fp, 0, N - 1), -1
        )
    else:
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


@jax.jit
def compact_keyframes(m: MapState):
    """Compact valid keyframe slots to the front of the arrays,
    preserving temporal order — the slot-recycling mechanism that lets a
    fixed-capacity map run unbounded sequences (the reference's maps are
    pointer-based and unbounded; here culled keyframes leave holes that
    insertion-by-count cannot reuse, so the holes are squeezed out at
    capacity pressure).

    Returns (new_map, n_valid, old_of [K]) where ``old_of[r]`` is the old
    slot index now living at slot r (for host-side bookkeeping: IMU
    blocks, loop edges, relative-trajectory references). ``pt_first_kf``
    is remapped on device; a point whose creating keyframe was culled
    inherits the nearest EARLIER surviving keyframe (its pose correction
    reference stays temporally adjacent).
    """
    K = m.K
    valid = m.kf_valid
    order = jnp.argsort(~valid, stable=True).astype(jnp.int32)  # valid first
    n_valid = jnp.sum(valid.astype(jnp.int32))
    # new index of old slot k (for remapping references INTO the table):
    # rank among valid slots; invalid slots map to the nearest earlier
    # valid slot's new index (clipped at 0).
    rank = jnp.cumsum(valid.astype(jnp.int32)) - 1
    new_of_old = jnp.clip(rank, 0, K - 1)

    def take_kf(a):
        return a[order]

    pt_first = new_of_old[jnp.clip(m.pt_first_kf, 0, K - 1)]
    new_obs = take_kf(m.kf_obs)
    m2 = m._replace(
        kf_valid=take_kf(m.kf_valid),
        kf_R=take_kf(m.kf_R),
        kf_t=take_kf(m.kf_t),
        kf_xy=take_kf(m.kf_xy),
        kf_level=take_kf(m.kf_level),
        kf_angle=take_kf(m.kf_angle),
        kf_desc_sign=take_kf(m.kf_desc_sign),
        kf_feat_valid=take_kf(m.kf_feat_valid),
        kf_obs=new_obs,
        kf_ts=take_kf(m.kf_ts),
        kf_ur=take_kf(m.kf_ur),
        kf_v=take_kf(m.kf_v),
        kf_bg=take_kf(m.kf_bg),
        kf_ba=take_kf(m.kf_ba),
        pt_first_kf=pt_first,
    )
    return m2, n_valid, order
