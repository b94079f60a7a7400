"""Time each jitted device program of the mono pipeline in isolation.

Run SOLO (no concurrent jobs — host contention corrupts timings).
Prints per-program ms after warmup, the direct guide for optimization:
the pipeline's steady-state fps is bounded by the per-frame programs
plus amortized per-keyframe programs / kf_every.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from orb_slam3_ros_tpu.utils import tpucache as _tpucache
_tpucache.enable_on_tpu()

from orb_slam3_ros_tpu.models.system import MonoSlam
from orb_slam3_ros_tpu.models import local_mapping, map_updates, tracking
from orb_slam3_ros_tpu.ops import ba
from orb_slam3_ros_tpu.utils import synth


def timeit(name, fn, *args, n=10, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / n * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
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
    print(f"map: kf={slam.n_kf} pts={slam.n_pts}", file=sys.stderr)
    m = slam.map
    img = jnp.asarray(seq.images[20])
    cam = slam.cam_params
    kf_id = jnp.asarray(slam.n_kf - 1)

    timeit("extract (pyramid+FAST+orient+desc)", slam._extract, img)
    R = jnp.asarray(slam.R_cur); t = jnp.asarray(slam.t_cur)
    feats, res = timeit(
        "fused extract+track (dense)", slam._fused_track, img, m, R, t,
        slam.n_kf, schedule=tracking.SCHEDULE_DENSE,
    )
    timeit(
        "track only (3-pass match+pose)", tracking.track_against_map,
        m, feats, R, t, cam, W, H,
    )
    timeit(
        "fused extract+track (lean)", slam._fused_track, img, m, R, t,
        slam.n_kf, schedule=tracking.SCHEDULE_LEAN,
    )
    timeit(
        "select_covis_window", local_mapping.select_covis_window,
        m, jnp.asarray(slam.n_kf - 1), slam.ba_window, slam.ba_fixed,
    )
    timeit(
        "triangulate_with_ref", tracking.triangulate_with_ref,
        m, kf_id, kf_id - 1, cam,
    )
    tri = tracking.triangulate_with_ref(m, kf_id, kf_id - 1, cam)
    timeit(
        "admit_new_points", map_updates.admit_new_points,
        m, kf_id, kf_id - 1, tri, jnp.asarray(slam.n_pts),
        jnp.asarray(slam.P_cap - slam.n_pts),
    )
    timeit(
        "fuse_in_neighbors (1 nb, 2 dirs)", map_updates.fuse_in_neighbors,
        m, kf_id, cam, W, H,
    )
    W_ids = jnp.arange(slam.W, dtype=jnp.int32) + (slam.n_kf - slam.W)
    fixed = jnp.zeros((slam.W,), bool).at[0].set(True).at[1].set(True)
    prob, sel = timeit(
        "build_local_ba", local_mapping.build_local_ba, m, W_ids, fixed, cam
    )
    timeit("local BA solve (6 it, scatter)", ba.bundle_adjust, prob, n_iters=6)
    timeit(
        "local BA solve (6 it, row-MXU)", ba.bundle_adjust, prob, n_iters=6,
        row_n=slam.N,
    )
    res_ba = ba.bundle_adjust(prob, n_iters=6, row_n=slam.N)
    timeit(
        "apply+drop_outliers", lambda: local_mapping.drop_ba_outlier_obs(
            local_mapping.apply_local_ba(m, W_ids, sel, res_ba), W_ids, res_ba
        ),
    )
    timeit("cull_points", map_updates.cull_points, m, jnp.asarray(slam.n_kf))
    timeit(
        "refresh_point_stats",
        lambda: map_updates.refresh_point_stats(m, n_levels=slam.config.n_levels),
    )
    timeit(
        "cull_keyframes",
        lambda: map_updates.cull_keyframes(
            m, jnp.asarray(slam.n_kf), n_levels=slam.config.n_levels
        ),
    )


if __name__ == "__main__":
    main()
