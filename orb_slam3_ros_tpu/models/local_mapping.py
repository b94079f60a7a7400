"""Local-mapping stage: local-BA problem assembly from the map state and
point maintenance (culling counters).

Role of the reference's ``LocalMapping`` thread body
(orb_slam3/src/LocalMapping.cc: local BA dispatch :149-179, MapPointCulling
:346, KeyFrameCulling :902). Triangulation lives in tracking.py; this
module owns the window gather -> ``BAProblem`` -> scatter-back cycle.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..ops import ba
from .map_state import MapState, covisibility, obs_matrix


P_BA = 2048  # compacted landmark capacity of a local-BA window


@partial(jax.jit, static_argnames=("w_free", "w_fixed"))
def select_covis_window(
    m: MapState,
    last: jnp.ndarray,  # [] int32 newest keyframe slot
    w_free: int,
    w_fixed: int,
):
    """Covisibility local-BA window around keyframe ``last``.

    The reference's local BA optimizes the current KF + its covisible
    neighbors, holding fixed every OTHER keyframe that observes one of
    the local map points (Optimizer.cc:1120-1210: lLocalKeyFrames from
    GetVectorCovisibleKeyFrames, lFixedCameras from the local points'
    observations). The round-1 temporal last-W window loses exactly this
    on revisits: old keyframes seeing the same scene neither join nor
    anchor the solve. Here: free set = ``last`` + top-(w_free-1) by
    covisibility weight; fixed set = top-w_fixed outside observers by
    shared-point count; slot 0 (the gauge root) is always fixed and the
    weakest free entries are demoted until >=2 anchors hold the mono
    gauge (scale observability on young maps).

    Returns (window_ids [w_free+w_fixed], fixed_mask, entry_valid);
    dead entries (no such neighbor exists) have entry_valid False and
    must be masked by the consumers — top_k emits arbitrary indices for
    -inf scores, so the ids may duplicate live entries.
    """
    K = m.K
    valid = m.kf_valid
    row = covisibility(m)[last].astype(jnp.float32)
    row = jnp.where(valid, row, -jnp.inf)
    row = row.at[last].set(jnp.inf)  # current KF always leads the window
    fv, fids = jax.lax.top_k(row, w_free)
    f_ok = fv > 0.0  # self, or shares >=1 point
    obsM = obs_matrix(m)  # [K, P]
    free_k = jnp.zeros((K,), bool).at[fids].max(f_ok)
    local_pts = jnp.any(obsM & free_k[:, None], axis=0)  # [P]
    fx_score = jnp.sum(obsM & local_pts[None, :], axis=-1).astype(jnp.float32)
    fx_score = jnp.where(valid & ~free_k, fx_score, -jnp.inf)
    xv, xids = jax.lax.top_k(fx_score, w_fixed)
    x_ok = xv > 0.0
    # Gauge anchoring: slot 0 fixed whenever it is in the free window,
    # and demote the weakest-covisibility free entries (never the
    # current KF at position 0) until >=2 valid cameras are fixed.
    fixed_free0 = (fids == 0) & f_ok
    n_anchor = jnp.sum(x_ok.astype(jnp.int32)) + jnp.sum(
        fixed_free0.astype(jnp.int32)
    )
    n_free = jnp.sum(f_ok.astype(jnp.int32))
    need = jnp.clip(2 - n_anchor, 0, None)
    pos = jnp.arange(w_free)
    demote = f_ok & ~fixed_free0 & (pos > 0) & (pos >= n_free - need)
    window_ids = jnp.concatenate([fids, xids]).astype(jnp.int32)
    fixed_mask = jnp.concatenate(
        [fixed_free0 | demote, jnp.ones((w_fixed,), bool)]
    )
    entry_valid = jnp.concatenate([f_ok, x_ok])
    return window_ids, fixed_mask, entry_valid


@partial(jax.jit, static_argnames=("scale",))
def build_local_ba(
    m: MapState,
    window_ids: jnp.ndarray,  # [W] int32 keyframe ids (free + fixed)
    fixed_mask: jnp.ndarray,  # [W] bool
    cam_params: jnp.ndarray,
    scale: float = 1.2,
    bf: jnp.ndarray | float = 0.0,
    entry_valid: jnp.ndarray | None = None,
):
    """Gather the covisible window into a fixed-capacity BA problem.

    Edge table = every (window KF, feature) slot with a bound map point —
    the dense equivalent of the lLocalMapPoints/lLocalKeyFrames lists the
    reference builds at Optimizer.cc:1120-1210. Landmarks are COMPACTED
    into P_BA slots (only window-observed points participate), which
    shrinks the Schur tensors [K, P, 6, 3] by P/P_BA; overflow edges
    beyond P_BA are masked out (logged by the solver as fewer edges).

    Returns (BAProblem, sel) where ``sel`` maps compact slots back to
    global point ids for the scatter-back.
    """
    W = window_ids.shape[0]
    N = m.N
    P = m.P
    cam_ok = m.kf_valid[window_ids]
    if entry_valid is not None:
        # Dead window slots (select_covis_window padding) contribute no
        # cameras and no edges — their ids may alias live entries.
        cam_ok = cam_ok & entry_valid
    obs = m.kf_obs[window_ids]  # [W,N]
    pt_idx = jnp.clip(obs.reshape(-1), 0, P - 1)
    edge_valid = (
        (obs.reshape(-1) >= 0)
        & m.kf_feat_valid[window_ids].reshape(-1)
        & cam_ok.repeat(N)
        & m.pt_valid[pt_idx]
    )
    inv_sigma2 = 1.0 / scale ** (
        2.0 * m.kf_level[window_ids].reshape(-1).astype(jnp.float32)
    )
    # Compact the observed-point set into P_BA slots.
    mark = jnp.zeros((P,), bool).at[pt_idx].max(edge_valid)
    sel = jnp.nonzero(mark, size=P_BA, fill_value=P)[0]  # P = pad sentinel
    n_obs = jnp.sum(mark.astype(jnp.int32))
    slot_valid = jnp.arange(P_BA) < n_obs
    inv = jnp.full((P + 1,), -1, jnp.int32).at[sel].set(
        jnp.where(slot_valid, jnp.arange(P_BA, dtype=jnp.int32), -1),
        mode="drop",
    )
    pt_c = inv[pt_idx]  # [-1 for unobserved/overflow]
    edge_valid = edge_valid & (pt_c >= 0)
    sel_c = jnp.clip(sel, 0, P - 1)
    prob = ba.BAProblem(
        R=m.kf_R[window_ids],
        t=m.kf_t[window_ids],
        cam_fixed=fixed_mask,
        cam_valid=cam_ok,
        X=m.pt_X[sel_c],
        pt_valid=slot_valid,
        cam_idx=jnp.repeat(jnp.arange(W, dtype=jnp.int32), N),
        pt_idx=jnp.clip(pt_c, 0, P_BA - 1).astype(jnp.int32),
        uv=m.kf_xy[window_ids].reshape(-1, 2),
        inv_sigma2=inv_sigma2,
        edge_valid=edge_valid,
        cam_params=cam_params,
        ur=m.kf_ur[window_ids].reshape(-1),
        bf=jnp.asarray(bf, m.kf_t.dtype),
    )
    return prob, sel


@jax.jit
def apply_local_ba(
    m: MapState,
    window_ids: jnp.ndarray,
    sel: jnp.ndarray,
    res: ba.BAResult,
    entry_valid: jnp.ndarray | None = None,
) -> MapState:
    """Scatter optimized poses + compacted points back into the map
    (pad slots carry sentinel index P and are dropped; dead window
    entries are routed out of bounds and dropped likewise)."""
    ids = window_ids
    if entry_valid is not None:
        ids = jnp.where(entry_valid, window_ids, m.K)
    return m._replace(
        kf_R=m.kf_R.at[ids].set(res.R, mode="drop"),
        kf_t=m.kf_t.at[ids].set(res.t, mode="drop"),
        pt_X=m.pt_X.at[sel].set(res.X, mode="drop"),
    )


@jax.jit
def drop_ba_outlier_obs(
    m: MapState,
    window_ids: jnp.ndarray,
    res: ba.BAResult,
    entry_valid: jnp.ndarray | None = None,
) -> MapState:
    """Unbind observations whose BA edge ended as a chi2 outlier (the
    reference erases those observations after local BA,
    Optimizer.cc:1438-1460)."""
    W = window_ids.shape[0]
    N = m.N
    ids = window_ids
    if entry_valid is not None:
        ids = jnp.where(entry_valid, window_ids, m.K)
    obs_w = m.kf_obs[jnp.clip(ids, 0, m.K - 1)]
    had_pt = obs_w.reshape(-1) >= 0
    # res.inlier = edge_valid & chi2-ok, so for a bound observation
    # ~inlier means either chi2 outlier or a dead point — clear both.
    clear = (had_pt & ~res.inlier).reshape(W, N)
    new_obs_w = jnp.where(clear, -1, obs_w)
    return m._replace(kf_obs=m.kf_obs.at[ids].set(new_obs_w, mode="drop"))


@partial(jax.jit, static_argnames=("scale",))
def build_global_ba(m: MapState, n_kf: jnp.ndarray, cam_params: jnp.ndarray,
                    scale: float = 1.2, bf: jnp.ndarray | float = 0.0):
    """All-keyframe, all-landmark BA problem — the input of the reference's
    ``GlobalBundleAdjustemnt`` (Optimizer.cc:52: every KF vertex, KF 0
    fixed, every MapPoint vertex). No compaction: solve it with the
    matrix-free Schur-PCG solver (ops/ba_pcg.py), which never materializes
    the [K, K] reduced system."""
    K, N, P = m.K, m.N, m.P
    ids = jnp.arange(K)
    valid = m.kf_valid & (ids < n_kf)
    cam_idx = jnp.repeat(ids.astype(jnp.int32), N)
    flat_obs = m.kf_obs.reshape(-1)
    pt_idx = jnp.clip(flat_obs, 0, P - 1)
    edge_valid = (
        (flat_obs >= 0)
        & m.kf_feat_valid.reshape(-1)
        & valid[cam_idx]
        & m.pt_valid[pt_idx]
    )
    inv_sigma2 = 1.0 / scale ** (2.0 * m.kf_level.reshape(-1).astype(jnp.float32))
    return ba.BAProblem(
        R=m.kf_R,
        t=m.kf_t,
        cam_fixed=(ids == 0) | ~valid,
        cam_valid=valid,
        X=m.pt_X,
        pt_valid=m.pt_valid,
        cam_idx=cam_idx,
        pt_idx=pt_idx.astype(jnp.int32),
        uv=m.kf_xy.reshape(-1, 2),
        inv_sigma2=inv_sigma2,
        edge_valid=edge_valid,
        cam_params=cam_params,
        ur=m.kf_ur.reshape(-1),
        bf=jnp.asarray(bf, m.kf_t.dtype),
    )


@jax.jit
def apply_global_ba_partial(
    m: MapState, res: ba.BAResult, n_kf0: jnp.ndarray,
    kf_obs0: jnp.ndarray | None = None,
) -> MapState:
    """Fold in a global-BA result computed on a SNAPSHOT of the map while
    tracking kept inserting keyframes — the reference's post-GBA map
    update (LoopClosing::RunGlobalBundleAdjustment, LoopClosing.cc:
    3660-3780): keyframes that were in the problem (slot < ``n_kf0``)
    take their optimized poses; keyframes inserted during the solve keep
    their pose RELATIVE to the last optimized keyframe (the spanning-tree
    propagation, collapsed to the temporal parent); points created during
    the solve move with that same correction.
    """
    K, N, P = m.K, m.N, m.P
    ids = jnp.arange(K)
    old_kf = ids < n_kf0
    r = jnp.clip(n_kf0 - 1, 0, K - 1)
    Rr_o, tr_o = m.kf_R[r], m.kf_t[r]  # reference KF, pre-GBA
    Rr_n, tr_n = res.R[r], res.t[r]  # reference KF, optimized
    # T_k<-r (fixed): Tcw_k * Twc_r(old); then Tcw_k' = T_k<-r * Tcw_r'.
    Rk_r = jnp.einsum("kij,lj->kil", m.kf_R, Rr_o)
    tk_r = m.kf_t - jnp.einsum("kij,j->ki", Rk_r, tr_o)
    Rk_new = jnp.einsum("kij,jl->kil", Rk_r, Rr_n)
    tk_new = jnp.einsum("kij,j->ki", Rk_r, tr_n) + tk_r
    kf_R = jnp.where(old_kf[:, None, None], res.R, Rk_new)
    kf_t = jnp.where(old_kf[:, None], res.t, tk_new)
    # Points born during the solve: world -> cam_r(old) -> world(new).
    old_pt = m.pt_first_kf < n_kf0
    Xc_r = m.pt_X @ Rr_o.T + tr_o
    X_prop = (Xc_r - tr_n) @ Rr_n
    pt_X = jnp.where(
        (old_pt & m.pt_valid)[:, None], res.X,
        jnp.where(m.pt_valid[:, None], X_prop, m.pt_X),
    )
    # Outlier-observation clearing only applies to rows the solve saw,
    # AND (when the pre-solve snapshot is given) only to rows whose
    # binding is unchanged since the snapshot — observations (re)bound
    # during the solve had inlier=False trivially and must not be wiped.
    flat_obs = m.kf_obs.reshape(-1)
    clear = ((flat_obs >= 0) & ~res.inlier).reshape(K, N) & old_kf[:, None]
    if kf_obs0 is not None:
        clear = clear & (m.kf_obs == kf_obs0)
    return m._replace(
        kf_R=kf_R, kf_t=kf_t, pt_X=pt_X,
        kf_obs=jnp.where(clear, -1, m.kf_obs),
    )


@jax.jit
def apply_global_ba(m: MapState, res: ba.BAResult) -> MapState:
    """Scatter a global-BA result back (fixed/invalid slots come back
    unchanged from the solver) and unbind chi2-outlier observations, the
    reference's post-GBA update phase (LoopClosing.cc:3660-3780 without
    the spanning-tree propagation: every KF was in the problem)."""
    flat_obs = m.kf_obs.reshape(-1)
    clear = ((flat_obs >= 0) & ~res.inlier).reshape(m.K, m.N)
    return m._replace(
        kf_R=res.R,
        kf_t=res.t,
        pt_X=jnp.where(m.pt_valid[:, None], res.X, m.pt_X),
        kf_obs=jnp.where(clear, -1, m.kf_obs),
    )


@partial(jax.jit, static_argnames=("scale",))
def build_vi_ba(
    m: MapState,
    window_ids: jnp.ndarray,  # [W]
    fixed_mask: jnp.ndarray,  # [W]
    acc_w: jnp.ndarray,  # [W-1, S, 3] IMU blocks integrating id[i] -> id[i+1]
    gyro_w: jnp.ndarray,  # [W-1, S, 3]
    dts_w: jnp.ndarray,  # [W-1, S]
    edge_ok: jnp.ndarray,  # [W-1] bool (consecutive-in-time pairs)
    calib,
    cam_params: jnp.ndarray,
    scale: float = 1.2,
    bf: jnp.ndarray | float = 0.0,
):
    """Assemble a visual-inertial local BA window (LocalInertialBA's
    temporal-window graph, Optimizer.cc:2528): visual edges like
    build_local_ba plus preintegration edges between consecutive window
    keyframes, re-integrated at each KF's current gyro/acc bias estimate
    (the reference calls Reintegrate on bias updates, ImuTypes.cc:168)."""
    from ..ops import imu as imu_ops
    from ..ops import viba as viba_ops

    W = window_ids.shape[0]
    N = m.N
    P = m.P
    obs = m.kf_obs[window_ids]
    pt_idx = jnp.clip(obs.reshape(-1), 0, P - 1)
    edge_valid = (
        (obs.reshape(-1) >= 0)
        & m.kf_feat_valid[window_ids].reshape(-1)
        & m.kf_valid[window_ids].repeat(N)
        & m.pt_valid[pt_idx]
    )
    inv_sigma2 = 1.0 / scale ** (
        2.0 * m.kf_level[window_ids].reshape(-1).astype(jnp.float32)
    )
    R_wb, p_wb = viba_ops.body_from_cam(
        m.kf_R[window_ids], m.kf_t[window_ids], calib.R_bc, calib.t_bc
    )
    states = viba_ops.VIStates(
        R_wb=R_wb,
        p_wb=p_wb,
        v_w=m.kf_v[window_ids],
        bg=m.kf_bg[window_ids],
        ba=m.kf_ba[window_ids],
    )
    b_lin = jnp.concatenate(
        [m.kf_bg[window_ids][:-1], m.kf_ba[window_ids][:-1]], axis=1
    )  # [W-1, 6] linearize each edge at the earlier KF's bias
    pre = jax.vmap(
        lambda a, w, d, b: imu_ops.preintegrate(a, w, d, b, calib)
    )(acc_w, gyro_w, dts_w, b_lin)
    ie_valid = (
        edge_ok
        & m.kf_valid[window_ids][:-1]
        & m.kf_valid[window_ids][1:]
        & (pre.dT > 1e-6)
    )
    return viba_ops.VIBAProblem(
        states=states,
        kf_fixed=fixed_mask,
        kf_valid=m.kf_valid[window_ids],
        X=m.pt_X,
        pt_valid=m.pt_valid,
        cam_idx=jnp.repeat(jnp.arange(W, dtype=jnp.int32), N),
        pt_idx=pt_idx.astype(jnp.int32),
        uv=m.kf_xy[window_ids].reshape(-1, 2),
        inv_sigma2=inv_sigma2,
        edge_valid=edge_valid,
        ie_i=jnp.arange(W - 1, dtype=jnp.int32),
        ie_j=jnp.arange(1, W, dtype=jnp.int32),
        ie_preint=pre,
        ie_valid=ie_valid,
        cam_params=cam_params,
        R_bc=calib.R_bc,
        t_bc=calib.t_bc,
        # Stereo disparity rows (EdgeStereo in LocalInertialBA,
        # Optimizer.cc:2606-2652); kf_ur < 0 marks mono observations.
        ur=m.kf_ur[window_ids].reshape(-1),
        bf=jnp.asarray(bf, m.kf_t.dtype),
    )


@jax.jit
def apply_vi_ba(m: MapState, window_ids: jnp.ndarray, res, calib) -> MapState:
    """Scatter VI-BA results (poses converted back to Tcw, velocities,
    biases, landmarks) into the map."""
    from ..ops import viba as viba_ops

    R_cw, t_cw = viba_ops.cam_from_body(
        res.states.R_wb, res.states.p_wb, calib.R_bc, calib.t_bc
    )
    return m._replace(
        kf_R=m.kf_R.at[window_ids].set(R_cw),
        kf_t=m.kf_t.at[window_ids].set(t_cw),
        kf_v=m.kf_v.at[window_ids].set(res.states.v_w),
        kf_bg=m.kf_bg.at[window_ids].set(res.states.bg),
        kf_ba=m.kf_ba.at[window_ids].set(res.states.ba),
        pt_X=res.X,
    )


@jax.jit
def apply_vi_gba_partial(
    m: MapState, window_ids: jnp.ndarray, res, calib,
    n_kf0: jnp.ndarray, kf_obs0: jnp.ndarray | None = None,
) -> MapState:
    """Fold in a FULL-INERTIAL-BA result computed on a SNAPSHOT of the
    map while tracking kept inserting keyframes — the inertial twin of
    ``apply_global_ba_partial`` (the reference's RunGlobalBundleAdjustment
    FullInertialBA branch + post-GBA spanning-tree update,
    LoopClosing.cc:3611-3780): keyframes the solve saw (slot < ``n_kf0``)
    take optimized pose/velocity/bias; keyframes inserted during the
    solve keep their pose RELATIVE to the last optimized keyframe, with
    their world velocity rotated by the same correction; points created
    during the solve move with that correction too."""
    from ..ops import viba as viba_ops

    K, N = m.K, m.N
    R_cw, t_cw = viba_ops.cam_from_body(
        res.states.R_wb, res.states.p_wb, calib.R_bc, calib.t_bc
    )
    # Scatter solved states into full-K arrays (padding rows re-write the
    # fixed pad slot with its own unchanged state; non-window slots are
    # selected away via old_kf below).
    kf_R_s = m.kf_R.at[window_ids].set(R_cw)
    kf_t_s = m.kf_t.at[window_ids].set(t_cw)
    kf_v_s = m.kf_v.at[window_ids].set(res.states.v_w)
    kf_bg_s = m.kf_bg.at[window_ids].set(res.states.bg)
    kf_ba_s = m.kf_ba.at[window_ids].set(res.states.ba)
    ids = jnp.arange(K)
    old_kf = ids < n_kf0
    r = jnp.clip(n_kf0 - 1, 0, K - 1)
    Rr_o, tr_o = m.kf_R[r], m.kf_t[r]  # reference KF, pre-apply
    Rr_n, tr_n = kf_R_s[r], kf_t_s[r]  # reference KF, optimized
    # T_k<-r (held fixed): Tcw_k * Twc_r(old); then Tcw_k' = T_k<-r * Tcw_r'.
    Rk_r = jnp.einsum("kij,lj->kil", m.kf_R, Rr_o)
    tk_r = m.kf_t - jnp.einsum("kij,j->ki", Rk_r, tr_o)
    Rk_new = jnp.einsum("kij,jl->kil", Rk_r, Rr_n)
    tk_new = jnp.einsum("kij,j->ki", Rk_r, tr_n) + tk_r
    kf_R = jnp.where(old_kf[:, None, None], kf_R_s, Rk_new)
    kf_t = jnp.where(old_kf[:, None], kf_t_s, tk_new)
    # World-frame correction rotation (new world <- old world) for
    # velocities of keyframes born during the solve; biases are body
    # quantities and carry over unchanged.
    R_corr = Rr_n.T @ Rr_o
    kf_v = jnp.where(old_kf[:, None], kf_v_s, m.kf_v @ R_corr.T)
    kf_bg = jnp.where(old_kf[:, None], kf_bg_s, m.kf_bg)
    kf_ba = jnp.where(old_kf[:, None], kf_ba_s, m.kf_ba)
    # Points born during the solve: world -> cam_r(old) -> world(new).
    old_pt = m.pt_first_kf < n_kf0
    Xc_r = m.pt_X @ Rr_o.T + tr_o
    X_prop = (Xc_r - tr_n) @ Rr_n
    pt_X = jnp.where(
        (old_pt & m.pt_valid)[:, None], res.X,
        jnp.where(m.pt_valid[:, None], X_prop, m.pt_X),
    )
    # Outlier clearing: only rows the solve saw (scattered from the
    # window layout), only on pre-solve keyframes, and only where the
    # binding is unchanged since the snapshot.
    W = window_ids.shape[0]
    inl = jnp.ones((K, N), bool).at[window_ids].set(res.inlier.reshape(W, N))
    clear = (m.kf_obs >= 0) & ~inl & old_kf[:, None]
    if kf_obs0 is not None:
        clear = clear & (m.kf_obs == kf_obs0)
    return m._replace(
        kf_R=kf_R, kf_t=kf_t, kf_v=kf_v, kf_bg=kf_bg, kf_ba=kf_ba,
        pt_X=pt_X, kf_obs=jnp.where(clear, -1, m.kf_obs),
    )
