"""Throughput/ATE matrix over pipeline configs on the current backend.

Runs the bench workload (60 frames 376x240, 1200 features) under several
config variants in one process and prints fps + ATE per variant — the
tuning harness for the 60 fps target (BASELINE.md).
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import sys
import time

import numpy as np

from orb_slam3_ros_tpu.models.system import MonoSlam, OK
from orb_slam3_ros_tpu.utils import synth
from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse


def run(seq, n_frames, warm, lean=None, timing=False, **kw):
    slam = MonoSlam(
        height=240, width=376, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=64, max_points=4096, **kw,
    )
    if lean is not None:
        slam._sched_lean = lean
    for i in range(warm):
        slam.process_frame(seq.images[i], float(seq.timestamps[i]))
    slam.timing = {}
    t0 = time.time()
    for i in range(warm, n_frames):
        slam.process_frame(seq.images[i], float(seq.timestamps[i]))
    dt = time.time() - t0
    fps = (n_frames - warm) / dt
    if timing:
        for name, (mean, std, n) in sorted(
            slam.timing_summary().items(), key=lambda kv: -kv[1][0] * kv[1][2]
        ):
            print(
                f"    {name:24s} {mean*1e3:8.2f} ms +- {std*1e3:6.2f} "
                f"(n={n}, total {mean*n*1e3:7.1f} ms)", flush=True,
            )
    ts = np.asarray([t for t, _ in slam.trajectory])
    est = np.stack([T[:3, 3] for _, T in slam.trajectory])
    rmse, n_m, _ = ate_rmse(ts, est, seq.timestamps.astype(np.float64), seq.t_wc)
    return fps, rmse, n_m, slam.state == OK


def main():
    H, W = 240, 376
    n_frames, warm = 60, 30
    seq = synth.make_sequence(n_frames=n_frames, height=H, width=W, dt=0.1, seed=3)
    LEAN_FAST = ((60.0, 2, 5), (4.0, 2, 5))
    LEAN_MIN = ((40.0, 2, 4), (4.0, 2, 4))
    CAD = dict(fuse_every=2, stats_every=2, cull_every=2, kf_every=6)
    configs = [
        ("default", dict()),
        ("cad+lean@4", dict(lean_after_kf=4, **CAD)),
        ("cad+lean@4+min", dict(lean_after_kf=4, **CAD), LEAN_MIN),
        ("cad+lean@4+min+ba4", dict(lean_after_kf=4, local_ba_iters=4,
                                    **CAD), LEAN_MIN),
        ("cad8+min+ba4", dict(lean_after_kf=4, local_ba_iters=4,
                              fuse_every=3, stats_every=3, cull_every=3,
                              kf_every=8), LEAN_MIN),
    ]
    only = sys.argv[1:] or None
    for entry in configs:
        name, kw = entry[0], entry[1]
        if only and name not in only:
            continue
        lean = entry[2] if len(entry) > 2 else None
        t0 = time.time()
        fps, rmse, n_m, ok = run(seq, n_frames, warm, lean=lean,
                                 timing=True, **kw)
        print(
            f"{name:24s} fps={fps:7.2f} ate={rmse:.4f} tracked={n_m} "
            f"ok={ok} (wall {time.time()-t0:.0f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
