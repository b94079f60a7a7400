"""Device-resident visual-INERTIAL chunk loop: `lax.scan` over a chunk
of frames with per-frame preintegration -> IMU state prediction ->
extraction -> tracking -> 15-dof VI refinement, and the full inertial
keyframe program (insert -> triangulate -> fuse -> temporal-window
VI-BA -> culls) under `lax.cond` — ONE dispatch and ONE packed fetch
per chunk.

Why: the per-frame VI path (`InertialSlam._process_frame_vi`) already
fuses each frame into one dispatch, but over the TPU tunnel every
dispatch/fetch round trip costs ~20-55 ms, so a per-frame host loop is
capped at ~8-10 fps no matter how fast the kernels are (measured:
8.5 fps at 752x480 vs 66.8 fps for the chunked mono loop). This is the
inertial counterpart of `device_loop.py`: the steady-state OK loop runs
entirely on device, the host cost is O(1/chunk).

The role split mirrors the reference's threads (Tracking::Track with
PredictStateIMU + PoseInertialOptimizationLastFrame per frame,
LocalMapping::Run with LocalInertialBA per keyframe — Tracking.cc:1774,
Optimizer.cc:5020, LocalMapping.cc:64-282) but is shaped for XLA:
static shapes, `lax.scan` over frames, `lax.cond` for the keyframe
work, no host branching.

Device-side IMU bookkeeping (the part the mono chunk does not have):

- `blk [S,7]` accumulates (acc|gyro|dt) samples since the last keyframe
  (the reference's growing `mpImuPreintegratedFromLastKF`); each frame
  appends its samples, a keyframe insert snapshots it into `kf_blk`
  and resets it.
- `kf_blk [K,S,7]` holds per-keyframe edge blocks (block k integrates
  KF k-1 -> KF k) so the in-chunk VI-BA window can gather its
  preintegration measurements without any host transfer. The host's
  `kf_imu_*` arrays are re-synced from the packed chunk result (the
  chunk's new keyframe slots are consecutive, so the result reserves
  `chunk//2` rows — the worst-case in-chunk keyframe density).
- `kf_edge_ok [K]` marks keyframes whose temporal chain to the
  previous keyframe is intact (False = chain break: block overflow or
  a host-side map weld seam).

Only the steady state runs here: the host gates chunking on
`imu_stage >= 3` (all three IMU-init ladder stages done), a full
temporal window (`n_kf > W`), and no loop-closer/Atlas attachment;
everything else (init ladder, relocalization, RECENTLY_LOST
dead-reckoning, resets) stays on the single-frame path, entered by the
chunk bailing out with `alive=False`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import imu as imu_ops
from ..ops import orb, viba
from . import local_mapping, map_updates, tracking


class VIDevState(NamedTuple):
    """Device-resident inertial side-state threaded between chunks
    (never fetched in the steady state — handles round-trip
    device-to-device)."""

    R_wb: jnp.ndarray  # [3,3] previous-frame body rotation (anchor)
    p_wb: jnp.ndarray  # [3]
    v: jnp.ndarray  # [3]
    bg: jnp.ndarray  # [3]
    ba: jnp.ndarray  # [3]
    Sigma: jnp.ndarray  # [15,15] anchor posterior cov (zeros = exact)
    blk: jnp.ndarray  # [S,7] IMU samples since the last keyframe
    blk_n: jnp.ndarray  # [] int32 fill count
    blk_ok: jnp.ndarray  # [] bool — False after overflow (chain break)
    kf_blk: jnp.ndarray  # [K,S,7] per-KF edge blocks
    kf_edge_ok: jnp.ndarray  # [K] bool


@partial(jax.jit, static_argnames=("K", "S"))
def unpack_vi_dev_state(buf: jnp.ndarray, R_bc, t_bc, K: int, S: int
                        ) -> VIDevState:
    """Rebuild VIDevState from ONE packed f32 vector of HOST values
    (camera pose; converted to the body frame here). The state is
    rebuilt from host bookkeeping after every closure / GBA fold-in;
    uploading its 11 leaves separately costs ~11 tunnel round trips
    (~20-50 ms each), so the host concatenates once and this slices on
    device."""
    o = 0

    def take(n):
        nonlocal o
        v = buf[o : o + n]
        o += n
        return v

    R_cw = take(9).reshape(3, 3)
    t_cw = take(3)
    v_w = take(3)
    bg = take(3)
    ba = take(3)
    Sigma = take(225).reshape(15, 15)
    blk = take(S * 7).reshape(S, 7)
    blk_n = take(1)[0].astype(jnp.int32)
    blk_ok = take(1)[0] > 0.5
    kf_blk = take(K * S * 7).reshape(K, S, 7)
    kf_edge_ok = take(K) > 0.5
    R_wb, p_wb = viba.body_from_cam(R_cw, t_cw, R_bc, t_bc)
    return VIDevState(
        R_wb=R_wb, p_wb=p_wb, v=v_w, bg=bg, ba=ba, Sigma=Sigma,
        blk=blk, blk_n=blk_n, blk_ok=blk_ok,
        kf_blk=kf_blk, kf_edge_ok=kf_edge_ok,
    )


class VICarry(NamedTuple):
    m: object  # MapState
    st: VIDevState
    n_kf: jnp.ndarray
    n_pts: jnp.ndarray
    last_kf_fid: jnp.ndarray
    alive: jnp.ndarray
    # Inlier count at the reference keyframe for the thRefRatio
    # densification rule (-1 = unseeded: adopts the first frame's count).
    ref_inl: jnp.ndarray = None


class VIChunkOut(NamedTuple):
    """Per-frame outputs (leading axis = chunk)."""

    R: jnp.ndarray  # [C,3,3] camera Tcw
    t: jnp.ndarray  # [C,3]
    ref: jnp.ndarray  # [C] reference keyframe slot
    R_cr: jnp.ndarray  # [C,3,3] pose relative to ref KF (rel-traj log)
    t_cr: jnp.ndarray  # [C,3]
    n_inliers: jnp.ndarray  # [C]
    is_kf: jnp.ndarray  # [C] bool
    alive: jnp.ndarray  # [C] bool


def make_vi_chunk_runner(
    config: orb.ExtractorConfig,
    cam_params,
    calib,
    *,
    width: int,
    height: int,
    kf_every: int,
    kf_min_inliers: int,
    kf_ref_ratio: float = 0.0,
    W: int,
    ba_window: int,
    local_ba_iters: int,
    fuse_neighbors: int,
    fuse_every: int,
    stats_every: int,
    cull_every: int,
    kf_culling: bool,
    schedule: tuple,
    K_cap: int,
    imu_cap_frame: int,
    imu_cap_kf: int,
    track_cap: int | None = None,
    cam_model: str = "pinhole",
    bf: float = 0.0,
    baseline: float = 0.0,
    max_depth: float = 0.0,
    stereo: bool = False,
):
    """Build the jitted VI chunk program for one pipeline geometry.

    ``stereo``: frames are [2,H,W] rectified pairs — each step extracts
    both views and runs the stereo correspondence; keyframes carry u_r,
    create close landmarks from depth (Tracking.cc:3255), and the
    in-chunk VI-BA builds (u,v,u_r) rows via ``bf``. The 15-dof VI
    refine stays mono (the host stereo-inertial path does the same once
    the IMU provides metric scale)."""
    import numpy as _np

    from ..ops import stereo as stereo_ops
    from .inertial_system import _vi_refine

    n_levels = config.n_levels
    M = imu_cap_frame
    S = imu_cap_kf
    fx = float(_np.asarray(cam_params)[0])

    def _kf_body(m, st, kf_id, R, t, v_new, bg_new, ba_new, ts, feats,
                 feat_pt, n_pts, ur, depth):
        """The fused VI keyframe iteration (_vi_kf_work's body) with the
        temporal window/fixed masks and IMU blocks assembled ON DEVICE
        from the carried per-KF block store."""
        S_idx = jnp.arange(S)
        row = jnp.where((S_idx < st.blk_n)[:, None], st.blk, 0.0)
        kf_blk = st.kf_blk.at[kf_id].set(row)
        kf_edge_ok = st.kf_edge_ok.at[kf_id].set(st.blk_ok)
        m = map_updates.insert_keyframe(
            m, kf_id, R, t, ts, feats, feat_pt,
            ur=ur if stereo else None,
        )
        m = m._replace(
            kf_v=m.kf_v.at[kf_id].set(v_new),
            kf_bg=m.kf_bg.at[kf_id].set(bg_new),
            kf_ba=m.kf_ba.at[kf_id].set(ba_new),
        )
        base = n_pts
        n_new = jnp.asarray(0, jnp.int32)
        if stereo:
            cand = (depth > 0) & (depth < max_depth) & feats.valid
            X_c = stereo_ops.backproject(cam_params, feats.xy, depth)
            X_w = jnp.einsum("ji,nj->ni", R, X_c - t)
            m, n_depth = map_updates.admit_depth_points(
                m, kf_id, X_w, cand, base,
                jnp.asarray(m.P, jnp.int32) - base,
            )
            base = base + n_depth
            n_new = n_new + n_depth
        tri = tracking.triangulate_with_ref(
            m, kf_id, kf_id - 1, cam_params, cam_model=cam_model
        )
        m, n_tri = map_updates.admit_new_points(
            m, kf_id, kf_id - 1, tri, base,
            jnp.asarray(m.P, jnp.int32) - base,
        )
        n_new = n_new + n_tri
        if fuse_neighbors > 0:
            m = jax.lax.cond(
                (kf_id >= 2) & (kf_id % fuse_every == 0),
                lambda mm: map_updates.fuse_in_neighbors(
                    mm, kf_id, cam_params, width, height,
                    n_neighbors=fuse_neighbors, cam_model=cam_model,
                )[0],
                lambda mm: mm,
                m,
            )
        # Temporal window over the last W keyframes including the new
        # one (LocalInertialBA's mPrevKF chain, Optimizer.cc:2532). The
        # host gates chunking on n_kf > W, so the window is always full.
        last = kf_id + 1
        ids = last - W + jnp.arange(W, dtype=jnp.int32)
        fixed = (ids == 0) | (ids < last - ba_window)
        edge_ids = ids[1:]
        edge_ok = kf_edge_ok[edge_ids]
        big = kf_blk[edge_ids]  # [W-1, S, 7]
        prob = local_mapping.build_vi_ba(
            m, ids, fixed, big[..., 0:3], big[..., 3:6], big[..., 6],
            edge_ok, calib, cam_params, bf=jnp.asarray(bf, jnp.float32),
        )
        res = viba.vi_bundle_adjust(prob, n_iters=local_ba_iters, row_n=m.N)
        m = local_mapping.apply_vi_ba(m, ids, res, calib)
        m = map_updates.cull_points(m, kf_id + 1)
        m = jax.lax.cond(
            kf_id % stats_every == 0,
            lambda mm: map_updates.refresh_point_stats(mm, n_levels=n_levels),
            lambda mm: mm,
            m,
        )
        if kf_culling:
            m = jax.lax.cond(
                (kf_id >= 4) & (kf_id % cull_every == 0),
                lambda mm: map_updates.cull_keyframes(
                    mm, kf_id + 1, n_levels=n_levels
                )[0],
                lambda mm: mm,
                m,
            )
        # Fresh anchor from the BA-refined keyframe state, treated as
        # exact (Sigma=0) — same as the host path's
        # `_vi_anchor = None; _vi_prior = None`.
        R_wb, p_wb = viba.body_from_cam(
            m.kf_R[kf_id], m.kf_t[kf_id], calib.R_bc, calib.t_bc
        )
        st2 = VIDevState(
            R_wb=R_wb, p_wb=p_wb, v=m.kf_v[kf_id], bg=m.kf_bg[kf_id],
            ba=m.kf_ba[kf_id], Sigma=jnp.zeros((15, 15)),
            blk=jnp.zeros_like(st.blk),
            blk_n=jnp.zeros((), jnp.int32),
            blk_ok=jnp.ones((), bool),
            kf_blk=kf_blk, kf_edge_ok=kf_edge_ok,
        )
        return m, st2, n_new

    import os as _os

    # In-step extraction by default — the vmapped whole-chunk
    # pre-extraction measures ~25% slower end to end (batched pyramid /
    # patch gathers spill VMEM; see device_loop.py).
    batch_extract = _os.environ.get("ORB_BATCH_EXTRACT", "0") != "0"

    def _prep_one(img):
        if stereo:
            il = img[0].astype(jnp.float32)
            ir = img[1].astype(jnp.float32)
            fl = orb.extract(il, config)
            fr = orb.extract(ir, config)
            sm = stereo_ops.match_stereo(
                fl, fr, il, ir, fx=fx, baseline=baseline
            )
            return (fl, jnp.where(sm.valid, sm.u_right, -1.0),
                    jnp.where(sm.valid, sm.depth, -1.0))
        return orb.extract(img.astype(jnp.float32), config)

    def step(c: VICarry, x):
        if not batch_extract:
            img, ts, fid, imu = x
            if stereo:
                feats, ur, depth = _prep_one(img)
            else:
                feats = _prep_one(img)
                ur = depth = None
        elif stereo:
            feats, ur, depth, ts, fid, imu = x
        else:
            feats, ts, fid, imu = x
            ur = depth = None
        a, g, d = imu[:, 0:3], imu[:, 3:6], imu[:, 6]
        st = c.st
        # Append this frame's samples to the since-last-KF block.
        idx = st.blk_n + jnp.arange(M)
        blk = st.blk.at[jnp.where(d > 0, idx, S)].set(imu, mode="drop")
        n_valid = jnp.sum(d > 0).astype(jnp.int32)
        blk_ok = st.blk_ok & (st.blk_n + n_valid <= S)
        blk_n = jnp.minimum(st.blk_n + n_valid, S)
        # Preintegrate the frame block and predict the pose seed
        # (PredictStateIMU, Tracking.cc:1774).
        b = jnp.concatenate([st.bg, st.ba])
        pre = imu_ops.preintegrate(a, g, d, b, calib)
        R2, p2, v2 = imu_ops.predict_state(st.R_wb, st.p_wb, st.v, b, pre)
        R_pred, t_pred = viba.cam_from_body(R2, p2, calib.R_bc, calib.t_bc)
        res = tracking.track_against_map(
            c.m, feats, R_pred, t_pred, cam_params, width, height,
            schedule=schedule, track_cap=track_cap, cam_model=cam_model,
        )
        vires, R_cw, t_cw = _vi_refine(
            c.m, feats, res.feat_pt, res.R, res.t,
            st.v, st.bg, st.ba,
            st.R_wb, st.p_wb, st.v, st.bg, st.ba, pre,
            st.Sigma, cam_params,
            calib.R_bc, calib.t_bc,
        )
        n_vis = vires.n_inliers
        ok = c.alive & (n_vis >= 15)
        # Body anchor advances to the refined frame state with its
        # posterior covariance (the per-frame path's
        # `_vi_anchor = state_tuple; _vi_prior = vires.Sigma`).
        st = VIDevState(
            R_wb=jnp.where(ok, vires.R_wb, R2),
            p_wb=jnp.where(ok, vires.p_wb, p2),
            v=jnp.where(ok, vires.v_w, v2),
            bg=jnp.where(ok, vires.bg, st.bg),
            ba=jnp.where(ok, vires.ba, st.ba),
            Sigma=vires.Sigma,
            blk=blk, blk_n=blk_n, blk_ok=blk_ok,
            kf_blk=st.kf_blk, kf_edge_ok=st.kf_edge_ok,
        )
        m = map_updates.update_track_counters(
            c.m, res.visible_mask & ok, res.found_mask & ok
        )
        since = fid - c.last_kf_fid
        ref_inl = jnp.where(c.ref_inl < 0, n_vis, c.ref_inl)
        weak = (n_vis < kf_min_inliers) & (since >= 2)
        if kf_ref_ratio > 0.0:
            # thRefRatio densification (NeedNewKeyFrame's c2 ratio,
            # Tracking.cc:3103) — see device_loop.py.
            weak = weak | (
                (n_vis.astype(jnp.float32)
                 < kf_ref_ratio * ref_inl.astype(jnp.float32))
                & (since >= 2)
            )
        need_kf = (
            ok
            & (c.n_kf < K_cap)
            & ((since >= kf_every) | weak)
        )

        def do_kf(args):
            m, st, n_pts = args
            m2, st2, n_new = _kf_body(
                m, st, c.n_kf, jnp.where(ok, R_cw, R_pred),
                jnp.where(ok, t_cw, t_pred),
                st.v, st.bg, st.ba, ts, feats, res.feat_pt, n_pts,
                ur, depth,
            )
            return m2, st2, n_pts + n_new

        m, st, n_pts = jax.lax.cond(
            need_kf, do_kf, lambda a: a, (m, st, c.n_pts)
        )
        n_kf = jnp.where(need_kf, c.n_kf + 1, c.n_kf)
        last_kf = jnp.where(need_kf, fid, c.last_kf_fid)
        ref = n_kf - 1
        # After a keyframe, the logged pose is its BA-refined pose.
        R_cur = jnp.where(need_kf, m.kf_R[ref], R_cw)
        t_cur = jnp.where(need_kf, m.kf_t[ref], t_cw)
        R_cr = R_cur @ m.kf_R[ref].transpose()
        t_cr = t_cur - R_cr @ m.kf_t[ref]
        out = VIChunkOut(
            R=R_cur, t=t_cur, ref=ref, R_cr=R_cr, t_cr=t_cr,
            n_inliers=jnp.where(c.alive, n_vis, 0),
            is_kf=need_kf, alive=ok,
        )
        return (
            VICarry(m=m, st=st, n_kf=n_kf, n_pts=n_pts,
                    last_kf_fid=last_kf, alive=ok,
                    ref_inl=jnp.where(need_kf, n_vis, ref_inl)),
            out,
        )

    @partial(jax.jit, static_argnames=("chunk",))
    def run_vi_chunk(m, st: VIDevState, frames, pk, chunk: int):
        """Single-upload chunk entry. ``pk`` = [n_kf, n_pts,
        last_kf_fid, alive, ref_inl, fid0, frame-offset, tss(chunk),
        imu(chunk*M*7)] in ONE f32 vector; ``frames`` a device-resident
        [N,H,W] stack sliced on device; ``st`` device handles threaded
        from the previous chunk (no transfer). Returns
        (map, state, packed result) — ONE fetch."""
        n_kf0 = pk[0].astype(jnp.int32)
        carry = VICarry(
            m=m, st=st,
            n_kf=n_kf0,
            n_pts=pk[1].astype(jnp.int32),
            last_kf_fid=pk[2].astype(jnp.int32),
            alive=pk[3] > 0.5,
            # Cross-chunk reference-KF inlier count (-1 = seed from the
            # chunk's first frame) — keeps the thRefRatio bar anchored
            # to the true reference keyframe across chunk boundaries.
            ref_inl=pk[4].astype(jnp.int32),
        )
        fid0 = pk[5].astype(jnp.int32)
        off = pk[6].astype(jnp.int32)
        tss = pk[7 : 7 + chunk]
        imu = pk[7 + chunk : 7 + chunk + chunk * M * 7].reshape(chunk, M, 7)
        imgs = jax.lax.dynamic_slice_in_dim(frames, off, chunk)
        fids = fid0 + jnp.arange(chunk, dtype=jnp.int32)
        if not batch_extract:
            xs = (imgs, tss, fids, imu)
        elif stereo:
            feats_all, ur_all, depth_all = jax.vmap(_prep_one)(imgs)
            xs = (feats_all, ur_all, depth_all, tss, fids, imu)
        else:
            feats_all = jax.vmap(_prep_one)(imgs)
            xs = (feats_all, tss, fids, imu)
        carry2, outs = jax.lax.scan(step, carry, xs)
        # Scalar pose from the carried body state, not the last frame's
        # visual result: on a mid-chunk collapse the dead tail's failed
        # refine would otherwise seed the host RECENTLY_LOST anchor.
        R_sc, t_sc = viba.cam_from_body(
            carry2.st.R_wb, carry2.st.p_wb, calib.R_bc, calib.t_bc
        )
        return carry2.m, carry2.st, pack_vi_chunk_result(
            outs, carry2, n_kf0, (chunk + 1) // 2, R_sc, t_sc
        )

    return run_vi_chunk


# Packed one-fetch result layout (per-leaf tunnel round trips, see
# device_loop.py): per-frame rows, end-carry scalars, and the chunk's
# new keyframe IMU blocks (consecutive slots from n_kf0, worst case
# chunk//2 of them — the weak-tracking KF density) so the host-side
# kf_imu_* mirror stays exact without a second fetch.

_VI_PF_COLS = 28  # R(9) t(3) R_cr(9) t_cr(3) ref n_inl is_kf alive
_VI_SC_LEN = 26  # R(9) t(3) v bg ba n_kf n_pts last_kf alive ref_inl


def pack_vi_chunk_result(outs: VIChunkOut, c: VICarry, n_kf0, kmax: int,
                         R_sc, t_sc):
    """``R_sc``/``t_sc``: the end-of-chunk camera pose derived from the
    CARRIED body state (consistent with v/bg/ba even when the last
    frames of the chunk died)."""
    C = outs.ref.shape[0]
    f32 = jnp.float32
    per_frame = jnp.concatenate(
        [
            outs.R.reshape(C, 9),
            outs.t,
            outs.R_cr.reshape(C, 9),
            outs.t_cr,
            outs.ref[:, None].astype(f32),
            outs.n_inliers[:, None].astype(f32),
            outs.is_kf[:, None].astype(f32),
            outs.alive[:, None].astype(f32),
        ],
        axis=1,
    )  # [C, _VI_PF_COLS]
    scal = jnp.concatenate([
        R_sc.reshape(9),
        t_sc,
        c.st.v, c.st.bg, c.st.ba,
        jnp.stack([
            c.n_kf.astype(f32), c.n_pts.astype(f32),
            c.last_kf_fid.astype(f32), c.alive.astype(f32),
            c.ref_inl.astype(f32),
        ]),
    ])  # [_VI_SC_LEN]
    slots = n_kf0 + jnp.arange(kmax, dtype=jnp.int32)
    slots_c = jnp.clip(slots, 0, c.st.kf_blk.shape[0] - 1)
    new_blk = c.st.kf_blk[slots_c].reshape(-1)  # [kmax*S*7]
    new_ok = c.st.kf_edge_ok[slots_c].astype(f32)  # [kmax]
    return jnp.concatenate(
        [per_frame.reshape(-1), scal, new_blk, new_ok]
    )


def unpack_vi_chunk_result(buf, C: int, kmax: int, S: int):
    """Inverse of pack_vi_chunk_result on the host."""
    import numpy as np

    buf = np.asarray(buf)
    pf = buf[: C * _VI_PF_COLS].reshape(C, _VI_PF_COLS)
    o = C * _VI_PF_COLS
    sc = buf[o : o + _VI_SC_LEN]
    o += _VI_SC_LEN
    new_blk = buf[o : o + kmax * S * 7].reshape(kmax, S, 7)
    o += kmax * S * 7
    new_ok = buf[o : o + kmax] > 0.5
    per_frame = dict(
        R=pf[:, 0:9].reshape(C, 3, 3),
        t=pf[:, 9:12],
        R_cr=pf[:, 12:21].reshape(C, 3, 3),
        t_cr=pf[:, 21:24],
        ref=pf[:, 24].astype(np.int64),
        n_inliers=pf[:, 25].astype(np.int64),
        is_kf=pf[:, 26] > 0.5,
        alive=pf[:, 27] > 0.5,
    )
    scalars = dict(
        R=sc[0:9].reshape(3, 3),
        t=sc[9:12],
        v=sc[12:15], bg=sc[15:18], ba=sc[18:21],
        n_kf=int(sc[21]), n_pts=int(sc[22]),
        last_kf_fid=int(sc[23]), alive=sc[24] > 0.5,
        ref_inl=int(sc[25]),
    )
    return per_frame, scalars, new_blk, new_ok
