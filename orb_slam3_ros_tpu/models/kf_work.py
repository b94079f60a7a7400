"""Fused per-keyframe device program: the ENTIRE LocalMapping iteration
(insert → triangulate → admit → fuse → covisibility local BA → culling →
stats, LocalMapping::Run's per-KF body, orb_slam3/src/LocalMapping.cc:
64-282) as ONE jitted computation.

Why: over the TPU tunnel each program dispatch costs host latency that
scales with the argument pytree (the MapState is ~25 arrays); the
round-1 pipeline issued ~9 separate programs per keyframe. Fusing them
into one program cuts the per-keyframe host overhead to a single
dispatch and lets XLA overlap stage boundaries it could never see
across dispatches. The stages are the same pure functions used by the
unfused path (subclass pipelines with their own BA flavors keep calling
them individually)."""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import ba
from . import local_mapping, map_updates, tracking
from .map_state import MapState


def keyframe_work_impl(
    m: MapState,
    kf_id: jnp.ndarray,  # [] int32
    R_cur: jnp.ndarray,
    t_cur: jnp.ndarray,
    ts: jnp.ndarray,
    feats,
    feat_pt: jnp.ndarray,
    n_pts: jnp.ndarray,  # [] live landmark count
    free_cap: jnp.ndarray,  # [] free point slots
    cam_params: jnp.ndarray,
    bf: jnp.ndarray,
    *,
    w_free: int,
    w_fixed: int,
    n_iters: int,
    row_n: int,
    n_levels: int,
    fuse_neighbors: int,
    do_fuse: bool,
    do_stats: bool,
    do_cull: bool,
    width: int,
    height: int,
):
    """One keyframe's full mapping work. Returns (map, n_new_points)."""
    m = map_updates.insert_keyframe(m, kf_id, R_cur, t_cur, ts, feats, feat_pt)
    tri = tracking.triangulate_with_ref(m, kf_id, kf_id - 1, cam_params)
    m, n_new = map_updates.admit_new_points(
        m, kf_id, kf_id - 1, tri, n_pts, free_cap
    )
    if do_fuse:
        m, _ = map_updates.fuse_in_neighbors(
            m, kf_id, cam_params, width, height, n_neighbors=fuse_neighbors
        )
    window_ids, fixed_mask, entry_valid = local_mapping.select_covis_window(
        m, kf_id, w_free, w_fixed
    )
    prob, sel = local_mapping.build_local_ba(
        m, window_ids, fixed_mask, cam_params, bf=bf, entry_valid=entry_valid
    )
    res = ba.bundle_adjust(prob, n_iters=n_iters, row_n=row_n, rel_tol=1e-3)
    m = local_mapping.apply_local_ba(m, window_ids, sel, res, entry_valid)
    m = local_mapping.drop_ba_outlier_obs(m, window_ids, res, entry_valid)
    m = map_updates.cull_points(m, kf_id + 1)
    if do_stats:
        m = map_updates.refresh_point_stats(m, n_levels=n_levels)
    if do_cull:
        m, _ = map_updates.cull_keyframes(m, kf_id + 1, n_levels=n_levels)
    return m, n_new


keyframe_work = jax.jit(
    keyframe_work_impl,
    static_argnames=(
        "w_free", "w_fixed", "n_iters", "row_n", "n_levels",
        "fuse_neighbors", "do_fuse", "do_stats", "do_cull",
        "width", "height",
    ),
)
