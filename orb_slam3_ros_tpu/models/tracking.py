"""Jitted tracking-stage functions: project-and-match against the map,
motion-only pose optimization, new-point triangulation, local BA assembly.

Role of the reference's ``Tracking`` per-frame pipeline
(orb_slam3/src/Tracking.cc: TrackWithMotionModel :2893, TrackLocalMap
:2988, SearchLocalPoints :3382) and parts of ``LocalMapping``
(CreateNewMapPoints :388). The reference splits coarse tracking (vs last
frame) from local-map tracking; here both collapse into two
project-search-optimize passes against the *whole* point table — masks do
the work of its local-point bookkeeping, and the MXU eats the larger
distance matrix without needing the covisibility-pruned candidate sets.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import cameras, hamming, lie, matching, pose_opt, triangulate
from ..ops.orb import Features
from .map_state import MapState


# Coarse-to-fine pass schedules: (radius_px, LM rounds, LM iters) per
# pass. DENSE is the robust setting for fragile phases (young map, cold
# motion model, just relocalized); LEAN matches its accuracy on mature
# maps at ~half the sequential-LM latency (measured on the synthetic
# suites; fisheye init diverges below ~15 LM iterations per pass).
SCHEDULE_DENSE = ((60.0, 2, 8), (12.0, 2, 8), (4.0, 3, 8))
SCHEDULE_LEAN = ((60.0, 3, 5), (4.0, 3, 5))


class TrackResult(NamedTuple):
    R: jnp.ndarray  # [3,3] optimized Tcw
    t: jnp.ndarray  # [3]
    feat_pt: jnp.ndarray  # [N] int32: map-point id tracked by each feature (-1)
    n_inliers: jnp.ndarray  # [] int32
    visible_mask: jnp.ndarray  # [P] point was in frustum this frame
    found_mask: jnp.ndarray  # [P] point was tracked as inlier


def _project_points(
    m: MapState, R, t, cam_params, width, height, margin=2.0, scale=1.2,
    n_levels=8, band_lo=0.8, band_hi=1.2, view_min=0.5, predict_scale=False,
    cam_model="pinhole",
):
    """Frustum + viewing-statistics gate and scale prediction — the
    reference's ``Frame::isInFrustum`` (Frame.cc:512: distance within the
    scale-invariance band, viewing angle < 60 deg vs the point normal)
    plus ``MapPoint::PredictScale``. Points whose band was never set
    (pt_max_dist == 0, e.g. freshly admitted) skip the gate and search at
    their creation octave.

    ``band_lo/band_hi/view_min``: gate slack. The strict reference values
    (0.8/1.2/0.5) suit refinement passes; the wide first tracking pass
    relaxes them because here it doubles as the re-acquisition search on
    drifted revisits (the role the reference delegates to its separate
    relocalization/loop projection searches with looser thresholds).

    ``predict_scale``: search at the PredictScale octave instead of the
    creation octave. Off by default: the prediction model assumes the
    detection octave tracks apparent feature size, which holds for real
    ORB imagery but not for the synthetic fractal textures used in the
    in-repo datasets (measured: ~45% of points re-detect 1-2 octaves off
    the prediction there, which starves the level-windowed matcher)."""
    Xc = jnp.einsum("ij,pj->pi", R, m.pt_X) + t
    uv = cameras.project_model(cam_params, Xc, cam_model)
    O_w = -R.T @ t
    po = m.pt_X - O_w
    dist = jnp.linalg.norm(po, axis=-1)
    view_cos = jnp.sum(po * m.pt_normal, axis=-1) / jnp.maximum(dist, 1e-12)
    banded = m.pt_max_dist > 0
    band_ok = (~banded) | (
        (dist >= band_lo * m.pt_min_dist)
        & (dist <= band_hi * m.pt_max_dist)
        & (view_cos > view_min)
    )
    if predict_scale:
        pred_level = jnp.ceil(
            jnp.log(jnp.maximum(m.pt_max_dist, 1e-12) / jnp.maximum(dist, 1e-12))
            / jnp.log(scale)
        ).astype(jnp.int32)
        pred_level = jnp.where(
            banded, jnp.clip(pred_level, 0, n_levels - 1), m.pt_level
        )
    else:
        pred_level = m.pt_level
    ok = (
        m.pt_valid
        & (Xc[:, 2] > 0.05)
        & cameras.in_image(uv, width, height, margin)
        & band_ok
    )
    return uv, ok, pred_level


def _match_and_pose(
    m: MapState, feats: Features, R, t, cam_params, width, height, radius,
    scale, rounds, iters, band_lo=0.8, band_hi=1.2, view_min=0.5,
    predict_scale=False, cam_model="pinhole",
):
    uv_proj, proj_ok, pred_level = _project_points(
        m, R, t, cam_params, width, height, scale=scale,
        band_lo=band_lo, band_hi=band_hi, view_min=view_min,
        predict_scale=predict_scale, cam_model=cam_model,
    )
    idx, dist = matching.search_by_projection(
        uv_proj, proj_ok, pred_level, m.pt_desc_sign, feats,
        radius=radius, scale=scale, max_dist=hamming.TH_HIGH, ratio=0.9,
    )  # per-point best feature
    matched = idx >= 0
    fidx = jnp.clip(idx, 0, feats.xy.shape[0] - 1)
    obs_uv = feats.xy[fidx]
    inv_sigma2 = (1.0 / scale ** (2.0 * feats.level[fidx].astype(jnp.float32)))
    res = pose_opt.pose_optimization(
        R, t, m.pt_X, obs_uv, inv_sigma2, matched, cam_params,
        rounds=rounds, iters_per_round=iters, cam_model=cam_model,
    )
    return res, idx, proj_ok


@partial(
    jax.jit,
    static_argnames=(
        "width", "height", "scale", "predict_scale", "schedule",
        "track_cap", "cam_model",
    ),
)
def track_against_map(
    m: MapState,
    feats: Features,
    R_pred: jnp.ndarray,
    t_pred: jnp.ndarray,
    cam_params: jnp.ndarray,
    width: int,
    height: int,
    scale: float = 1.2,
    pt_mask: jnp.ndarray | None = None,
    predict_scale: bool = False,
    schedule: tuple = None,
    track_cap: int | None = None,
    cam_model: str = "pinhole",
) -> TrackResult:
    """Coarse-to-fine project/match/optimize against the full point table.

    ``schedule``: per-pass (radius_px, LM rounds, LM iters/round). The
    first pass uses relaxed frustum gates and plays the reference's
    TrackWithMotionModel role (radius th=7..15 on last-frame points);
    later passes are the TrackLocalMap refinement (th=1..3).

    ``track_cap``: compact the candidate set to the top-``track_cap``
    points by frustum visibility under the predicted pose (ties broken
    toward recent points) before matching — the role of the reference's
    LOCAL-map tracking (Tracking::UpdateLocalPoints builds mvpLocalMapPoints
    from the covisible keyframes, Tracking.cc:3302), which bounds the
    match cost by the local map size instead of the whole-map capacity.
    Every [cap, N] distance matrix and every pose-opt edge table shrinks
    by P/track_cap. None = whole table (small maps / relocalization).
    """
    # Unlike the reference's grid-bucket search (whose cost grows with
    # the window, hence th=7..15 and the separate TrackReferenceKeyFrame
    # fallback), the dense masked distance matrix costs the same at any
    # radius — so pass 1 is wide enough to survive a cold motion model
    # (e.g. the first frames after initialization).
    if schedule is None:
        schedule = SCHEDULE_DENSE
    if pt_mask is not None:
        m = m._replace(pt_valid=m.pt_valid & pt_mask)
    P_full = m.P
    sel = None
    if track_cap is not None and track_cap < P_full:
        # Visibility under the predicted pose ranks candidates; recency
        # breaks ties so a full frustum prefers the freshest points.
        _, vis, _ = _project_points(
            m, R_pred, t_pred, cam_params, width, height, scale=scale,
            margin=20.0, band_lo=0.4, band_hi=2.5, view_min=0.0,
            cam_model=cam_model,
        )
        P32 = jnp.float32(P_full)
        score = (
            vis.astype(jnp.float32) * 2.0
            + m.pt_valid.astype(jnp.float32)
            + m.pt_first_kf.astype(jnp.float32) / (P32 * 4.0)
        )
        _, sel = jax.lax.top_k(score, track_cap)
        sub = m._replace(
            pt_valid=m.pt_valid[sel],
            pt_X=m.pt_X[sel],
            pt_desc_sign=m.pt_desc_sign[sel],
            pt_level=m.pt_level[sel],
            pt_found=m.pt_found[sel],
            pt_visible=m.pt_visible[sel],
            pt_first_kf=m.pt_first_kf[sel],
            pt_normal=m.pt_normal[sel],
            pt_min_dist=m.pt_min_dist[sel],
            pt_max_dist=m.pt_max_dist[sel],
        )
        m = sub
    radius0, rounds0, iters0 = schedule[0]
    res, _, _ = _match_and_pose(
        m, feats, R_pred, t_pred, cam_params, width, height,
        radius=radius0, scale=scale, rounds=rounds0, iters=iters0,
        band_lo=0.4, band_hi=2.5, view_min=0.0, cam_model=cam_model,
    )
    for radius_i, rounds_i, iters_i in schedule[1:]:
        res, idx2, proj_ok = _match_and_pose(
            m, feats, res.R, res.t, cam_params, width, height,
            radius=radius_i, scale=scale, rounds=rounds_i, iters=iters_i,
            cam_model=cam_model,
        )
    res2 = res
    # Invert point->feature map into per-feature point ids (inliers only).
    P = m.P
    N = feats.xy.shape[0]
    keep = (idx2 >= 0) & res2.inlier
    fidx = jnp.clip(idx2, 0, N - 1)
    pt_ids = jnp.arange(P, dtype=jnp.int32) if sel is None else sel
    feat_pt = jnp.full((N,), -1, jnp.int32)
    feat_pt = feat_pt.at[fidx].max(jnp.where(keep, pt_ids, -1))
    if sel is None:
        visible_mask, found_mask = proj_ok, keep
    else:
        visible_mask = jnp.zeros((P_full,), bool).at[sel].max(proj_ok)
        found_mask = jnp.zeros((P_full,), bool).at[sel].max(keep)
    return TrackResult(
        R=res2.R,
        t=res2.t,
        feat_pt=feat_pt,
        n_inliers=res2.n_inliers,
        visible_mask=visible_mask,
        found_mask=found_mask,
    )


class TriangulationResult(NamedTuple):
    X_w: jnp.ndarray  # [N,3] candidate world points (per new-KF feature)
    ref_feat: jnp.ndarray  # [N] matched feature idx in ref KF
    ok: jnp.ndarray  # [N] passed all checks
    n_new: jnp.ndarray


@partial(jax.jit, static_argnames=("scale", "cam_model"))
def triangulate_with_ref(
    m: MapState,
    new_kf: jnp.ndarray,
    ref_kf: jnp.ndarray,
    cam_params: jnp.ndarray,
    scale: float = 1.2,
    cam_model: str = "pinhole",
) -> TriangulationResult:
    """Epipolar-search + DLT new-landmark creation between the newest
    keyframe and a covisible reference (LocalMapping::CreateNewMapPoints,
    orb_slam3/src/LocalMapping.cc:388-713, reduced to the best neighbor)."""
    f_new = Features(
        xy=m.kf_xy[new_kf], level=m.kf_level[new_kf], angle=m.kf_angle[new_kf],
        response=jnp.zeros_like(m.kf_angle[new_kf]),
        desc_packed=jnp.zeros((m.N, 8), jnp.uint32),
        desc_sign=m.kf_desc_sign[new_kf], valid=m.kf_feat_valid[new_kf],
    )
    f_ref = Features(
        xy=m.kf_xy[ref_kf], level=m.kf_level[ref_kf], angle=m.kf_angle[ref_kf],
        response=jnp.zeros_like(m.kf_angle[ref_kf]),
        desc_packed=jnp.zeros((m.N, 8), jnp.uint32),
        desc_sign=m.kf_desc_sign[ref_kf], valid=m.kf_feat_valid[ref_kf],
    )
    R1, t1 = m.kf_R[new_kf], m.kf_t[new_kf]  # Tcw of new
    R2, t2 = m.kf_R[ref_kf], m.kf_t[ref_kf]
    # relative: x_ref = R21 x_new + t21 with 1=new, 2=ref
    R21 = R2 @ R1.T
    t21 = t2 - R21 @ t1
    R12 = R21.T
    t12 = -R21.T @ t21
    if cam_model == "kb8":
        # KB8: the epipolar gate runs on unprojected BEARINGS with the
        # essential matrix (the reference's GeometricCamera::
        # epipolarConstrain path for fisheye, KannalaBrandt8.cpp) — the
        # pixel-space epipolar "line" of a fisheye camera is a curve.
        # Bearings are scaled by fx (a centered virtual pinhole) so the
        # Sampson tolerance keeps its pixel-unit meaning.
        fx = cam_params[0]
        bear1 = cameras.kb8_unproject(cam_params, f_new.xy)[..., :2] * fx
        bear2 = cameras.kb8_unproject(cam_params, f_ref.xy)[..., :2] * fx
        Kv = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]], t21.dtype
        ).at[0, 0].set(fx).at[1, 1].set(fx)
        F12 = triangulate.fundamental_from_poses(Kv, Kv, R12, t12)
        idx, dist = matching.search_for_triangulation(
            f_new._replace(xy=bear1), f_ref._replace(xy=bear2), F12,
            already_matched1=m.kf_obs[new_kf] >= 0,
            already_matched2=m.kf_obs[ref_kf] >= 0,
            scale=scale,
        )
    else:
        K = triangulate.K_matrix(cam_params)
        F12 = triangulate.fundamental_from_poses(K, K, R12, t12)
        idx, dist = matching.search_for_triangulation(
            f_new, f_ref, F12,
            already_matched1=m.kf_obs[new_kf] >= 0,
            already_matched2=m.kf_obs[ref_kf] >= 0,
            scale=scale,
        )
    matched = idx >= 0
    ridx = jnp.clip(idx, 0, m.N - 1)
    rays1 = cameras.unproject_model(cam_params, f_new.xy, cam_model)
    rays2 = cameras.unproject_model(cam_params, f_ref.xy[ridx], cam_model)
    X1 = triangulate.triangulate_dlt(rays1, rays2, R21, t21)
    X2 = X1 @ R21.T + t21
    # Checks (mirroring CreateNewMapPoints): cheirality, parallax,
    # reprojection both views.
    C2_in_1 = -R21.T @ t21
    cospar = triangulate.parallax_cos(X1, C2_in_1)
    e1 = jnp.sum(
        (cameras.project_model(cam_params, X1, cam_model) - f_new.xy) ** 2, -1
    )
    e2 = jnp.sum(
        (cameras.project_model(cam_params, X2, cam_model) - f_ref.xy[ridx]) ** 2, -1
    )
    sig2_1 = scale ** (2.0 * f_new.level.astype(jnp.float32))
    sig2_2 = scale ** (2.0 * f_ref.level[ridx].astype(jnp.float32))
    ok = (
        matched
        & jnp.all(jnp.isfinite(X1), axis=-1)
        & (X1[:, 2] > 0.02)
        & (X2[:, 2] > 0.02)
        & (cospar < 0.9998)
        & (e1 < 5.991 * sig2_1)
        & (e2 < 5.991 * sig2_2)
    )
    # world coords: X_w = R1^T (X1 - t1)
    X_w = (X1 - t1) @ R1
    return TriangulationResult(
        X_w=X_w, ref_feat=ridx, ok=ok, n_new=jnp.sum(ok.astype(jnp.int32))
    )
