"""Dataset-replay driver on the synthetic sequence.

Role of the reference's non-ROS example drivers
(orb_slam3/Examples/mono_euroc.cc:40-120: load images, loop TrackMonocular,
save + evaluate trajectory) with the synthetic ray-traced room standing in
for EuRoC (dataset blobs are unavailable in this environment).

Usage:
    python -m orb_slam3_ros_tpu.run_synth --frames 40 [--platform cpu]
        [--height 240 --width 376] [--features 1200] [--save-traj out.txt]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--height", type=int, default=240)
    ap.add_argument("--width", type=int, default=376)
    ap.add_argument("--features", type=int, default=1200)
    ap.add_argument("--dt", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--trajectory", default="orbit", choices=["orbit", "loop"])
    ap.add_argument("--loop-closing", action="store_true")
    ap.add_argument("--track-window", type=int, default=None)
    ap.add_argument("--platform", default=None, help="cpu to force CPU backend")
    ap.add_argument("--chunk", type=int, default=0,
                    help="process frames through the device-resident "
                    "chunked loop, N frames per dispatch (0 = per-frame)")
    ap.add_argument("--native-feed", action="store_true",
                    help="feed frames through the C++ measurement-sync "
                         "runtime from a producer thread (the reference's "
                         "ROS callback-thread topology)")
    ap.add_argument("--save-traj", default=None, help="write TUM-format trajectory")
    ap.add_argument("--save-map", default=None,
                    help="write a whole-session checkpoint (npz + json "
                    "manifest; the save_map service role, srv/SaveMap.srv)")
    ap.add_argument("--json", action="store_true", help="print one summary JSON line")
    ap.add_argument("--stream", default=None,
                    help="write per-frame pose/state events to this JSONL "
                         "file (headless counterpart of the ROS pose/"
                         "marker publishers)")
    ap.add_argument("--verbose", type=int, default=0,
                    help="log verbosity 0-3 (Verbose::PrintMess role)")
    args = ap.parse_args(argv)

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import numpy as np

    from orb_slam3_ros_tpu.models.system import MonoSlam, OK
    from orb_slam3_ros_tpu.utils import synth
    from orb_slam3_ros_tpu.utils.evaluate_ate import ate_rmse

    print(f"rendering {args.frames} frames...", file=sys.stderr, flush=True)
    seq = synth.make_sequence(
        n_frames=args.frames, height=args.height, width=args.width,
        dt=args.dt, seed=args.seed, trajectory=args.trajectory,
    )
    slam = MonoSlam(
        height=args.height, width=args.width, cam_params=seq.cam_params,
        n_features=args.features, max_keyframes=64, max_points=8192,
        enable_loop_closing=args.loop_closing, track_window=args.track_window,
    )
    streamer = None
    if args.verbose:
        from orb_slam3_ros_tpu.utils import obslog

        obslog.set_level(args.verbose)
    if args.stream:
        from orb_slam3_ros_tpu.utils.obslog import FrameStreamer

        streamer = FrameStreamer(args.stream)
        slam.on_frame = streamer
    t_start = time.time()
    tracked = 0
    if args.native_feed:
        import threading

        from orb_slam3_ros_tpu.native import MeasurementSync

        ms = MeasurementSync(height=args.height, width=args.width)

        def produce():
            import numpy as _np
            for i in range(args.frames):
                ms.push_imu(float(seq.timestamps[i]), _np.zeros(3), _np.zeros(3))
                while not ms.push_frame(float(seq.timestamps[i]), seq.images[i]):
                    time.sleep(0.0005)

        th = threading.Thread(target=produce)
        th.start()
        done = 0
        while done < args.frames:
            b = ms.pop_bundle()
            if b is None:
                time.sleep(0.0002)
                continue
            ts_b, gray, *_ = b
            T = slam.process_frame(gray, ts_b)
            tracked += T is not None
            done += 1
        th.join()
    elif args.chunk > 0:
        i = 0
        from orb_slam3_ros_tpu.models.system import OK as _OK

        while slam.state != _OK and i < args.frames:
            T = slam.process_frame(seq.images[i], float(seq.timestamps[i]))
            tracked += T is not None
            i += 1
        while i < args.frames:
            j = min(i + args.chunk, args.frames)
            slam.process_frames(
                [seq.images[k] for k in range(i, j)], seq.timestamps[i:j]
            )
            i = j
        slam.flush()
        tracked = len(slam.trajectory)
    else:
        for i in range(args.frames):
            T = slam.process_frame(seq.images[i], float(seq.timestamps[i]))
            tracked += T is not None
    if streamer is not None:
        slam.flush()
        streamer.close()
    wall = time.time() - t_start

    ts = np.asarray([t for t, _ in slam.trajectory])
    est = (
        np.stack([T[:3, 3] for _, T in slam.trajectory])
        if slam.trajectory
        else np.zeros((0, 3))
    )
    rmse, n, scale = (
        ate_rmse(ts, est, seq.timestamps.astype(np.float64), seq.t_wc)
        if len(est) >= 3
        else (float("inf"), 0, 1.0)
    )

    if args.save_map:
        from orb_slam3_ros_tpu.utils import checkpoint

        digest = checkpoint.save_atlas(args.save_map, slam)
        print(f"map checkpoint: {args.save_map}.npz md5={digest}",
              file=sys.stderr, flush=True)
    if args.save_traj:
        from orb_slam3_ros_tpu.utils.trajectory import save_tum

        save_tum(args.save_traj, slam.trajectory)

    summary = {
        "frames": args.frames,
        "tracked": tracked,
        "state_ok": slam.state == OK,
        "n_keyframes": slam.n_kf,
        "n_points": slam.n_pts,
        "ate_rmse_m": round(rmse, 4),
        "ate_scale": round(scale, 4),
        "fps": round(args.frames / wall, 2),
        "wall_s": round(wall, 2),
        "per_stage_ms": {
            k: round(1000 * v[0], 1) for k, v in slam.timing_summary().items()
        },
        "loop_closures": (
            slam.loop_closer.closures if slam.loop_closer is not None else []
        ),
    }
    if args.json:
        print(json.dumps(summary))
    else:
        for k, v in summary.items():
            print(f"{k}: {v}")
    return 0 if (slam.state == OK and rmse < 0.2) else 1


if __name__ == "__main__":
    sys.exit(main())
