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
from .map_state import MapState


P_BA = 2048  # compacted landmark capacity of a local-BA window


@partial(jax.jit, static_argnames=("scale",))
def build_local_ba(
    m: MapState,
    window_ids: jnp.ndarray,  # [W] int32 keyframe ids (free + fixed)
    fixed_mask: jnp.ndarray,  # [W] bool
    cam_params: jnp.ndarray,
    scale: float = 1.2,
    bf: jnp.ndarray | float = 0.0,
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
    obs = m.kf_obs[window_ids]  # [W,N]
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
        cam_valid=m.kf_valid[window_ids],
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
    m: MapState, window_ids: jnp.ndarray, sel: jnp.ndarray, res: ba.BAResult
) -> MapState:
    """Scatter optimized poses + compacted points back into the map
    (pad slots carry sentinel index P and are dropped)."""
    return m._replace(
        kf_R=m.kf_R.at[window_ids].set(res.R),
        kf_t=m.kf_t.at[window_ids].set(res.t),
        pt_X=m.pt_X.at[sel].set(res.X, mode="drop"),
    )


@jax.jit
def drop_ba_outlier_obs(
    m: MapState, window_ids: jnp.ndarray, res: ba.BAResult
) -> MapState:
    """Unbind observations whose BA edge ended as a chi2 outlier (the
    reference erases those observations after local BA,
    Optimizer.cc:1438-1460)."""
    W = window_ids.shape[0]
    N = m.N
    obs_w = m.kf_obs[window_ids]
    had_pt = obs_w.reshape(-1) >= 0
    # res.inlier = edge_valid & chi2-ok, so for a bound observation
    # ~inlier means either chi2 outlier or a dead point — clear both.
    clear = (had_pt & ~res.inlier).reshape(W, N)
    new_obs_w = jnp.where(clear, -1, obs_w)
    return m._replace(kf_obs=m.kf_obs.at[window_ids].set(new_obs_w))


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
