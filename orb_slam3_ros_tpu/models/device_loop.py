"""Device-resident multi-frame tracking loop: `lax.scan` over a chunk of
frames with the keyframe decision and the full keyframe work under
`lax.cond` — ONE dispatch and ONE result fetch per chunk.

Why this exists: the reference's per-frame hot path is a function call
(Tracking::Track, ~0 dispatch cost); here every host->device dispatch
and device->host fetch crosses the TPU link (measured ~25 ms round trip
over the tunnel), so a per-frame host loop is latency-bound no matter
how fast the kernels are. Keeping the steady-state OK loop — predict,
extract, track, keyframe-decide, map-update — entirely on device makes
the host cost O(1/chunk) and is the idiomatic XLA shape for the loop
(static shapes, `lax.scan`, `lax.cond` instead of Python branching).

Host-side rails (initialization, relocalization, loop closing, Atlas,
capacity management, timestamp-jump segmentation) stay on the host: the
chunk bails out by flag (`alive`) and the host replays the affected
frames through the single-frame path.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops import ba, orb
from . import local_mapping, map_updates, tracking
from .map_state import MapState


class LoopCarry(NamedTuple):
    m: MapState
    R: jnp.ndarray  # [3,3] current Tcw
    t: jnp.ndarray  # [3]
    vel_R: jnp.ndarray
    vel_t: jnp.ndarray
    n_kf: jnp.ndarray  # [] int32
    n_pts: jnp.ndarray  # [] int32
    last_kf_fid: jnp.ndarray  # [] int32
    alive: jnp.ndarray  # [] bool — False after a tracking failure
    # Inlier count at the reference keyframe for the thRefRatio
    # densification rule (-1 = unseeded: adopts the first frame's count).
    ref_inl: jnp.ndarray = None  # [] int32


class ChunkOut(NamedTuple):
    """Per-frame outputs (leading axis = chunk)."""

    R: jnp.ndarray  # [C,3,3] Tcw
    t: jnp.ndarray  # [C,3]
    ref: jnp.ndarray  # [C] reference keyframe slot at log time
    R_cr: jnp.ndarray  # [C,3,3] pose relative to ref KF (rel-traj log)
    t_cr: jnp.ndarray  # [C,3]
    n_inliers: jnp.ndarray  # [C]
    is_kf: jnp.ndarray  # [C] bool
    alive: jnp.ndarray  # [C] bool — frame was tracked on device


def make_chunk_runner(
    config: orb.ExtractorConfig,
    cam_params,
    *,
    width: int,
    height: int,
    kf_every: int,
    kf_min_inliers: int,
    kf_ref_ratio: float = 0.0,
    ba_window: int,
    ba_fixed: int,
    local_ba_iters: int,
    fuse_neighbors: int,
    fuse_every: int,
    stats_every: int,
    cull_every: int,
    kf_culling: bool,
    schedule: tuple,
    K_cap: int,
    track_cap: int | None = None,
    cam_model: str = "pinhole",
    bf: float = 0.0,
    baseline: float = 0.0,
    max_depth: float = 0.0,
    stereo: bool = False,
    track_window: int | None = None,
):
    """Build the jitted chunk program for one pipeline geometry.

    ``stereo``: frames are [2,H,W] rectified pairs; each step extracts
    both views, runs the per-feature stereo correspondence
    (Frame::ComputeStereoMatches role), refines the tracked pose over
    mixed (u, v, u_r) edges (the stereo branch of PoseOptimization,
    Optimizer.cc:816), and the keyframe body creates close landmarks
    from depth (Tracking::CreateNewKeyFrame, Tracking.cc:3255) before
    triangulating far ones; local-BA rows carry u_r with ``bf``."""
    import numpy as _np

    from ..ops import pose_opt as pose_opt_ops
    from ..ops import stereo as stereo_ops

    n_levels = config.n_levels
    row_n = config.total_cap
    fx = float(_np.asarray(cam_params)[0])
    bf_d = jnp.asarray(bf, jnp.float32)

    def _kf_body(m, kf_id, R, t, ts, feats, feat_pt, n_pts, ur, depth):
        """keyframe_work with cadence gates as device conds (the chunk
        cannot specialize per-keyframe static flags)."""
        m = map_updates.insert_keyframe(
            m, kf_id, R, t, ts, feats, feat_pt,
            ur=ur if stereo else None,
        )
        base = n_pts
        n_new = jnp.asarray(0, jnp.int32)
        if stereo:
            # Close points from stereo depth first (metric), ...
            cand = (depth > 0) & (depth < max_depth) & feats.valid
            X_c = stereo_ops.backproject(cam_params, feats.xy, depth)
            X_w = jnp.einsum("ji,nj->ni", R, X_c - t)
            m, n_depth = map_updates.admit_depth_points(
                m, kf_id, X_w, cand, base,
                jnp.asarray(m.P, jnp.int32) - base,
            )
            base = base + n_depth
            n_new = n_new + n_depth
        # ... then epipolar triangulation binds what remains unbound
        # (far stereo points / all mono points).
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
        window_ids, fixed_mask, entry_valid = (
            local_mapping.select_covis_window(m, kf_id, ba_window, ba_fixed)
        )
        prob, sel = local_mapping.build_local_ba(
            m, window_ids, fixed_mask, cam_params,
            bf=bf_d, entry_valid=entry_valid,
        )
        res = ba.bundle_adjust(
            prob, n_iters=local_ba_iters, row_n=row_n, rel_tol=1e-3,
            cam_model=cam_model,
        )
        m = local_mapping.apply_local_ba(m, window_ids, sel, res, entry_valid)
        m = local_mapping.drop_ba_outlier_obs(m, window_ids, res, entry_valid)
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
        return m, n_new

    def _prep_stereo(pair):
        """Per-frame extraction + stereo correspondence (vmapped over
        the chunk before the scan — batched kernels use the MXU far
        better than sequential per-frame extracts)."""
        il = pair[0].astype(jnp.float32)
        ir = pair[1].astype(jnp.float32)
        fl = orb.extract(il, config)
        fr = orb.extract(ir, config)
        sm = stereo_ops.match_stereo(
            fl, fr, il, ir, fx=fx, baseline=baseline
        )
        return (fl, jnp.where(sm.valid, sm.u_right, -1.0),
                jnp.where(sm.valid, sm.depth, -1.0))

    import os as _os

    # Extraction INSIDE the scan step by default: the vmapped
    # whole-chunk pre-extraction looked like a batching win but measures
    # 25% SLOWER end to end on the v5e (51 vs 67 fps plain mono at
    # 752x480x15 — the batched pyramid/patch gathers overflow VMEM and
    # spill to HBM, while the per-frame extract tiles cleanly).
    batch_extract = _os.environ.get("ORB_BATCH_EXTRACT", "0") != "0"

    def _prep_xs(imgs, tss, fids):
        """Batched pre-extraction for a chunk: scan xs from raw frames
        (uint8 frames upload at 1/4 the f32 bytes; math is f32).
        ``ORB_BATCH_EXTRACT=1`` hoists extraction out of the scan as one
        vmapped program (A/B knob; measured slower, see above)."""
        if not batch_extract:
            return (imgs, tss, fids)
        if stereo:
            feats_all, ur_all, depth_all = jax.vmap(_prep_stereo)(imgs)
            return (feats_all, ur_all, depth_all, tss, fids)
        feats_all = jax.vmap(
            lambda im: orb.extract(im.astype(jnp.float32), config)
        )(imgs)
        return (feats_all, tss, fids)

    def step(c: LoopCarry, x):
        if not batch_extract:
            img, ts, fid = x
            if stereo:
                feats, ur, depth = _prep_stereo(img)
            else:
                feats = orb.extract(img.astype(jnp.float32), config)
                ur = depth = None
        elif stereo:
            feats, ur, depth, ts, fid = x
        else:
            feats, ts, fid = x
            ur = depth = None
        R_pred = c.vel_R @ c.R
        t_pred = c.vel_R @ c.t + c.vel_t
        # Sliding-window tracking (only recent keyframes' landmarks)
        # computed on device — lets window-limited sessions (genuine
        # odometry drift + real loop closures) ride the chunk loop.
        pt_mask = None
        if track_window is not None:
            pt_mask = c.m.pt_first_kf >= (c.n_kf - track_window)
        res = tracking.track_against_map(
            c.m, feats, R_pred, t_pred, cam_params, width, height,
            schedule=schedule, track_cap=track_cap, cam_model=cam_model,
            pt_mask=pt_mask,
        )
        if stereo:
            # Stereo refinement over mixed (u, v, u_r) edges — the
            # host path's _stereo_refine.
            P = c.m.P
            pt = jnp.clip(res.feat_pt, 0, P - 1)
            svalid = (res.feat_pt >= 0) & c.m.pt_valid[pt] & feats.valid
            inv_s2 = 1.2 ** (-2.0 * feats.level.astype(jnp.float32))
            r2 = pose_opt_ops.pose_optimization_stereo(
                res.R, res.t, c.m.pt_X[pt], feats.xy, ur, bf_d,
                inv_s2, svalid, cam_params,
            )
            res = res._replace(R=r2.R, t=r2.t, n_inliers=r2.n_inliers)
        ok = c.alive & (res.n_inliers >= 15)
        R_new = jnp.where(ok, res.R, c.R)
        t_new = jnp.where(ok, res.t, c.t)
        vel_R = jnp.where(ok, res.R @ c.R.T, c.vel_R)
        vel_t = jnp.where(ok, res.t - (res.R @ c.R.T) @ c.t, c.vel_t)
        m = map_updates.update_track_counters(
            c.m, res.visible_mask & ok, res.found_mask & ok
        )
        since = fid - c.last_kf_fid
        ref_inl = jnp.where(c.ref_inl < 0, res.n_inliers, c.ref_inl)
        weak = (res.n_inliers < kf_min_inliers) & (since >= 2)
        if kf_ref_ratio > 0.0:
            # thRefRatio densification (NeedNewKeyFrame's c2 ratio,
            # Tracking.cc:3103): insert when tracked support sags
            # RELATIVE to the reference keyframe, before the absolute
            # weak-tracking floor — keeps a map reserve through
            # weak-texture viewing angles instead of limping to loss.
            weak = weak | (
                (res.n_inliers.astype(jnp.float32)
                 < kf_ref_ratio * ref_inl.astype(jnp.float32))
                & (since >= 2)
            )
        need_kf = (
            ok
            & (c.n_kf >= 2)
            & (c.n_kf < K_cap)
            & ((since >= kf_every) | weak)
        )

        def do_kf(args):
            m, n_pts = args
            m2, n_new = _kf_body(
                m, c.n_kf, R_new, t_new, ts, feats, res.feat_pt, n_pts,
                ur, depth,
            )
            return m2, n_pts + n_new

        m, n_pts = jax.lax.cond(
            need_kf, do_kf, lambda a: a, (m, c.n_pts)
        )
        n_kf = jnp.where(need_kf, c.n_kf + 1, c.n_kf)
        last_kf = jnp.where(need_kf, fid, c.last_kf_fid)
        # After a keyframe, adopt its BA-refined pose (the sync host path
        # does the same via the ref-cache update).
        ref = n_kf - 1
        R_cur = jnp.where(need_kf, m.kf_R[ref], R_new)
        t_cur = jnp.where(need_kf, m.kf_t[ref], t_new)
        R_cr = R_cur @ m.kf_R[ref].transpose()
        t_cr = t_cur - R_cr @ m.kf_t[ref]
        out = ChunkOut(
            R=R_cur, t=t_cur, ref=ref, R_cr=R_cr, t_cr=t_cr,
            n_inliers=jnp.where(c.alive, res.n_inliers, 0),
            is_kf=need_kf, alive=ok,
        )
        return (
            LoopCarry(
                m=m, R=R_cur, t=t_cur, vel_R=vel_R, vel_t=vel_t,
                n_kf=n_kf, n_pts=n_pts, last_kf_fid=last_kf, alive=ok,
                ref_inl=jnp.where(need_kf, res.n_inliers, ref_inl),
            ),
            out,
        )

    @jax.jit
    def run_chunk(carry: LoopCarry, imgs, tss, fids):
        return jax.lax.scan(step, carry, _prep_xs(imgs, tss, fids))

    def _carry_from_packed(m, pk):
        return LoopCarry(
            m=m,
            R=pk[0:9].reshape(3, 3), t=pk[9:12],
            vel_R=pk[12:21].reshape(3, 3), vel_t=pk[21:24],
            n_kf=pk[24].astype(jnp.int32),
            n_pts=pk[25].astype(jnp.int32),
            last_kf_fid=pk[26].astype(jnp.int32),
            alive=pk[27] > 0.5,
            # Reference-KF inlier count carried ACROSS chunks (-1 =
            # unknown, seed from the chunk's first frame) — without it
            # the thRefRatio bar re-bases to a possibly-sagging chunk
            # entry frame instead of the true reference keyframe.
            ref_inl=pk[28].astype(jnp.int32),
        )

    @partial(jax.jit, static_argnames=("chunk",))
    def run_chunk_packed(m, frames, pk, chunk: int):
        """Single-upload chunk entry: ``pk`` = [29 carry scalars,
        frame-id0, frame-offset, tss(chunk)] in ONE f32 vector, frames a
        (device-resident) [N,H,W] stack sliced on device — host->device
        transfers per chunk drop from ~10 small round trips (~20 ms each
        over the TPU tunnel) to one. Returns (new map, packed result)."""
        carry = _carry_from_packed(m, pk)
        fid0 = pk[29].astype(jnp.int32)
        off = pk[30].astype(jnp.int32)
        tss = pk[31 : 31 + chunk]
        imgs = jax.lax.dynamic_slice_in_dim(frames, off, chunk)
        fids = fid0 + jnp.arange(chunk, dtype=jnp.int32)
        carry2, outs = jax.lax.scan(step, carry, _prep_xs(imgs, tss, fids))
        return carry2.m, pack_chunk_result(outs, carry2)

    run_chunk.packed = run_chunk_packed
    return run_chunk


# Host-fetch packing: a device_get over the TPU tunnel costs a full
# round trip PER ARRAY LEAF (~50 ms each, measured), so fetching the
# 17-leaf (ChunkOut, LoopCarry-scalars) pytree costs ~850 ms/chunk —
# 5x the chunk's compute. Pack everything into ONE f32 vector on device
# (ints < 2^24 are exact in f32) and unpack on the host.

_PF_COLS = 28  # per-frame: R(9) t(3) R_cr(9) t_cr(3) ref n_inl is_kf alive
_SC_LEN = 29  # R(9) t(3) vel_R(9) vel_t(3) n_kf n_pts last_kf alive ref_inl


@jax.jit
def pack_chunk_result(outs: ChunkOut, c: LoopCarry) -> jnp.ndarray:
    """[C*26 + 28] f32: one-fetch encoding of (per-frame outs, end carry)."""
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
    )  # [C, _PF_COLS]
    scal = jnp.concatenate(
        [
            c.R.reshape(9), c.t, c.vel_R.reshape(9), c.vel_t,
            jnp.stack([
                c.n_kf.astype(f32), c.n_pts.astype(f32),
                c.last_kf_fid.astype(f32), c.alive.astype(f32),
                c.ref_inl.astype(f32),
            ]),
        ]
    )  # [_SC_LEN]
    return jnp.concatenate([per_frame.reshape(-1), scal])


def unpack_chunk_result(buf, C: int):
    """Inverse of pack_chunk_result on the host. Returns
    (per_frame dict, scalars dict) of numpy values."""
    import numpy as np

    buf = np.asarray(buf)
    pf = buf[: C * _PF_COLS].reshape(C, _PF_COLS)
    sc = buf[C * _PF_COLS:]
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
        vel_R=sc[12:21].reshape(3, 3),
        vel_t=sc[21:24],
        n_kf=int(sc[24]),
        n_pts=int(sc[25]),
        last_kf_fid=int(sc[26]),
        alive=sc[27] > 0.5,
        ref_inl=int(sc[28]),
    )
    return per_frame, scalars
