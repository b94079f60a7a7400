"""Fine-grained timing of the per-frame hot path (extract + track).

Run SOLO on the TPU. Times each stage of ORB extraction and each
tracking pass separately to direct per-frame optimization (the
pipeline's fps ceiling is per-frame device time + amortized KF work).
"""

from __future__ import annotations

import sys
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from orb_slam3_ros_tpu.utils import tpucache as _tpucache
_tpucache.enable_on_tpu()

from orb_slam3_ros_tpu.models.system import MonoSlam
from orb_slam3_ros_tpu.models import tracking
from orb_slam3_ros_tpu.ops import fast as fast_mod
from orb_slam3_ros_tpu.ops import orb, pose_opt
from orb_slam3_ros_tpu.ops import pyramid as pyr_mod
from orb_slam3_ros_tpu.utils import synth


def timeit(name, fn, *args, n=20, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return out


def main():
    H, W = 240, 376
    seq = synth.make_sequence(n_frames=40, height=H, width=W, dt=0.1, seed=3)
    slam = MonoSlam(
        height=H, width=W, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=64, max_points=4096, pipelined=False,
    )
    for i in range(40):
        slam.process_frame(seq.images[i], float(seq.timestamps[i]))
    m = slam.map
    img = jnp.asarray(seq.images[20])
    cam = slam.cam_params
    config = slam.config
    L = config.n_levels
    H0, W0 = config.height, config.width
    M = orb.PATCH_RAW - 19 + 2

    # --- extraction stages ---
    @jax.jit
    def stage_pyramid(img):
        levels = pyr_mod.build_pyramid(img, L, config.scale)
        return jnp.stack(
            [
                jnp.pad(
                    lv,
                    ((M, H0 + M - lv.shape[0]), (M, W0 + M - lv.shape[1])),
                    mode="edge",
                )
                for lv in levels
            ]
        )

    stack = timeit("pyramid+pad", stage_pyramid, img)

    @jax.jit
    def stage_fast(stack):
        return fast_mod.score_map_combined(
            stack, config.ini_threshold, config.min_threshold
        )

    score = timeit("FAST score map", stage_fast, stack)

    @jax.jit
    def stage_select(score):
        outs = []
        border = 19
        for l in range(L):
            h, w = config.level_shape(l)
            sc = jax.lax.slice(score, (l, M, M), (l + 1, M + h, M + w))[0]
            ys = jnp.arange(h)[:, None]
            xs = jnp.arange(w)[None, :]
            inb = (
                (ys >= border) & (ys < h - border)
                & (xs >= border) & (xs < w - border)
            )
            outs.append(fast_mod.select_grid(sc, inb, config.caps[l], config.cell_size(l)))
        return outs

    timeit("grid top-K select (8 levels)", stage_select, score)

    feats = slam._extract(img)
    N = config.total_cap

    @jax.jit
    def stage_patches(stack, xy, lvl):
        S = 2 * orb.PATCH_RAW + 1
        y0 = xy[:, 1].astype(jnp.int32) + M - orb.PATCH_RAW
        x0 = xy[:, 0].astype(jnp.int32) + M - orb.PATCH_RAW
        return jax.vmap(
            lambda li, yy, xx: jax.lax.dynamic_slice(stack, (li, yy, xx), (1, S, S))[0]
        )(lvl, y0, x0)

    scale_l = jnp.asarray([config.scale**l for l in range(L)], jnp.float32)
    xy_lv = feats.xy / scale_l[feats.level][:, None]
    patches = timeit("patch gather [N,43,43]", stage_patches, stack, xy_lv, feats.level)

    @jax.jit
    def stage_blur_desc(patches, ang):
        return orb._descriptors_from_patches(orb._patch_blur(patches), ang)

    timeit("blur + descriptors", stage_blur_desc, patches, feats.angle)
    timeit("extract (all fused)", slam._extract, img)

    # --- tracking pieces ---
    R = jnp.asarray(slam.R_cur); t = jnp.asarray(slam.t_cur)

    @partial(jax.jit, static_argnames=())
    def one_pass(m, feats, R, t):
        res, idx, ok = tracking._match_and_pose(
            m, feats, R, t, cam, W, H, radius=12.0, scale=1.2, rounds=2, iters=8
        )
        return res.R, res.t

    timeit("track single pass (match+pose 2x8)", one_pass, m, feats, R, t)

    @jax.jit
    def match_only(m, feats, R, t):
        uv, ok, lvl = tracking._project_points(m, R, t, cam, W, H)
        from orb_slam3_ros_tpu.ops import matching, hamming
        idx, dist = matching.search_by_projection(
            uv, ok, lvl, m.pt_desc_sign, feats, radius=12.0,
            max_dist=hamming.TH_HIGH, ratio=0.9,
        )
        return idx

    timeit("match only (project+search)", match_only, m, feats, R, t)

    @jax.jit
    def pose_only(m, feats, R, t):
        matched = m.pt_valid
        uv = jnp.zeros((m.P, 2))
        res = pose_opt.pose_optimization(
            R, t, m.pt_X, uv, jnp.ones((m.P,)), matched, cam,
            rounds=2, iters_per_round=8,
        )
        return res.R

    timeit("pose opt only (2x8)", pose_only, m, feats, R, t)
    timeit("full track (3 passes)", tracking.track_against_map,
           m, feats, R, t, cam, W, H)
    timeit("fused extract+track", slam._fused_track, img, m, R, t, slam.n_kf)


if __name__ == "__main__":
    main()
