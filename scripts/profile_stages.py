"""Per-stage timing of the mono pipeline on the current backend.

Runs the same workload as bench.py and prints slam.timing_summary():
mean/std/count per stage, to pick the next optimization target.
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from orb_slam3_ros_tpu.utils import tpucache as _tpucache
_tpucache.enable_on_tpu()

import sys
import time

import numpy as np

from orb_slam3_ros_tpu.models.system import MonoSlam, OK
from orb_slam3_ros_tpu.utils import synth


def main():
    H, W = 240, 376
    n_frames = 60
    warm = 30
    seq = synth.make_sequence(n_frames=n_frames, height=H, width=W, dt=0.1, seed=3)
    slam = MonoSlam(
        height=H, width=W, cam_params=seq.cam_params, n_features=1200,
        max_keyframes=64, max_points=4096,
    )
    for i in range(warm):
        slam.process_frame(seq.images[i], float(seq.timestamps[i]))
    slam.timing = {}
    t0 = time.time()
    for i in range(warm, n_frames):
        slam.process_frame(seq.images[i], float(seq.timestamps[i]))
    dt = time.time() - t0
    print(f"steady: {(n_frames - warm) / dt:.2f} frames/s", file=sys.stderr)
    for name, (mean, std, n) in sorted(
        slam.timing_summary().items(), key=lambda kv: -kv[1][0] * kv[1][2]
    ):
        print(f"{name:30s} {mean * 1e3:8.2f} ms +- {std * 1e3:6.2f} (n={n}, total {mean * n * 1e3:8.1f} ms)")


if __name__ == "__main__":
    main()
